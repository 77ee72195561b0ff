"""Scene graph, OBJ/MTL loading, material derivation, light extraction."""
import numpy as np

from cuda_pathtracer_tpu.scene.scene import (Scene, Material, GameObject,
                                             Plane, PointLight)
from cuda_pathtracer_tpu.scene import objloader


def test_load_cube(reference_assets):
    mesh = objloader.load_obj(f'{reference_assets}/cube.obj')
    assert len(mesh.tri_v) == 12
    assert mesh.vertices.shape == (8, 3) or len(mesh.vertices) >= 8


def test_add_model_and_bake(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.4, 0.4, 0.4)))
    mid = scene.add_model('cube.obj', 2.0, (0, 0, 0), (1, 2, 3), white)
    assert mid == 0
    m = scene.models[0]
    assert m.nr_triangles == 12
    # baked verts: cube [-1,1]^3 scaled by 2 then offset (1,2,3)
    allv = np.concatenate([scene._v0, scene._v1, scene._v2])
    assert abs(allv[:, 0].min() - (-1.0)) < 1e-5   # 1 - 2
    assert abs(allv[:, 1].max() - 4.0) < 1e-5      # 2 + 2


def test_mtl_material_derivation(tmp_path, reference_assets):
    obj = tmp_path / 'tri.obj'
    mtl = tmp_path / 'tri.mtl'
    mtl.write_text('newmtl glassy\nKd 0.5 0.6 0.7\nKs 0.3 0.3 0.3\n'
                   'd 0.25\nNs 400\nNi 1.5\n')
    obj.write_text('mtllib tri.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n'
                   'usemtl glassy\nf 1 2 3\n')
    scene = Scene(asset_dirs=[str(tmp_path), reference_assets])
    scene.add_model(str(obj), 1.0, (0, 0, 0), (0, 0, 0), 0, use_mtl=True)
    m = scene.materials[0]
    # transmit = 1 - dissolve = 0.75, reflect = mean(Ks) = 0.3; the sum 1.05
    # exceeds 1 so both are normalized by 1/1.05 (scene.h:195-201)
    assert abs(m.transmit - 0.75 / 1.05) < 1e-6
    assert abs(m.reflect - 0.3 / 1.05) < 1e-6
    assert abs(m.glossy - 0.1) < 1e-6
    assert m.refractive_index == 1.5
    # glass forced white (scene.h:206-209)
    assert m.diffuse_color == (1.0, 1.0, 1.0)


def test_mtl_normalization(tmp_path, reference_assets):
    mtl = tmp_path / 'n.mtl'
    mtl.write_text('newmtl shiny\nKd 1 1 1\nKs 0.9 0.9 0.9\nd 0.5\n')
    obj = tmp_path / 'n.obj'
    obj.write_text('mtllib n.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n'
                   'usemtl shiny\nf 1 2 3\n')
    scene = Scene(asset_dirs=[str(tmp_path), reference_assets])
    scene.add_model(str(obj), use_mtl=True)
    m = scene.materials[0]
    assert m.transmit + m.reflect <= 1.0 + 1e-6


def test_emissive_light_extraction(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.4,) * 3))
    glow = Material.DIFFUSE((1, 1, 1))
    glow.emission = (10.0, 10.0, 10.0)
    glow_id = scene.add_material(glow)
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(cube))                       # dark cube
    scene.add_object(GameObject(cube, material_id=glow_id))  # emissive override
    scene.finalize()
    _, _, overrides = scene.instances()
    tris, insts = scene.extract_triangle_lights(overrides)
    assert len(tris) == 12
    assert (insts == 1).all()


def test_scene_update_handlers(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.4,) * 3))
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(cube))
    calls = []
    scene.add_handler(lambda s, kb, t: calls.append(t))
    scene.finalize()
    scene.update(None, 1.5)
    assert calls == [1.5]


def test_dynamic_arrays_cache(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.4,) * 3))
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(cube))
    scene.finalize()
    d1 = scene.dynamic_arrays()
    d2 = scene.dynamic_arrays()
    assert d1 is d2  # cached
    scene.objects[0].position[0] = 5.0
    scene.invalidate()
    d3 = scene.dynamic_arrays()
    assert d3 is not d1


def test_to_device_shapes(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.4,) * 3))
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(cube))
    scene.add_plane(Plane((0, -1, 0), -3, white))
    scene.add_point_light(PointLight((-8, 5, 1), (50, 50, 50)))
    scene.finalize()
    arrays = scene.to_device()
    assert arrays.tri_normal.shape == (12, 3)
    assert arrays.plane_normal.shape == (1, 3)
    assert arrays.point_light_pos.shape == (1, 3)
    assert arrays.sky_img.ndim == 3


def test_obj_mixed_corner_arity(tmp_path):
    # tinyobjloader (the reference's parser) accepts OBJ files mixing "v",
    # "v/t" and "v//n" corners in one file; so must we (objloader.py)
    from cuda_pathtracer_tpu.scene.objloader import load_obj
    p = tmp_path / 'mixed.obj'
    p.write_text('\n'.join([
        'v 0 0 0', 'v 1 0 0', 'v 0 1 0', 'v 1 1 0',
        'vt 0 0', 'vt 1 0', 'vt 0 1',
        'vn 0 0 1',
        'f 1 2 3',          # plain
        'f 1/1 2/2 3/3',    # v/t
        'f 1//1 2//1 4//1',  # v//n
    ]) + '\n')
    mesh = load_obj(str(p))
    assert mesh.tri_v.shape == (3, 3)
    assert (mesh.tri_vt[0] == -1).all()
    assert (mesh.tri_vt[1] == [0, 1, 2]).all()
    assert (mesh.tri_vn[2] == [0, 0, 0]).all()
    assert (mesh.tri_vn[0] == -1).all()


def test_texture_atlas_dedups_on_full_path(tmp_path):
    from cuda_pathtracer_tpu.scene.textures import TextureAtlas
    import numpy as np
    try:
        from PIL import Image
    except ImportError:
        import pytest
        pytest.skip('PIL not available')
    a_dir = tmp_path / 'a'
    b_dir = tmp_path / 'b'
    a_dir.mkdir()
    b_dir.mkdir()
    Image.fromarray(np.zeros((2, 2, 3), np.uint8)).save(a_dir / 't.png')
    Image.fromarray(np.full((2, 2, 3), 255, np.uint8)).save(b_dir / 't.png')
    atlas = TextureAtlas()
    i = atlas.add_path(str(a_dir / 't.png'))
    j = atlas.add_path(str(b_dir / 't.png'))
    assert i != j                      # same basename, different textures
    assert atlas.add_path(str(a_dir / 't.png')) == i   # true dedup
