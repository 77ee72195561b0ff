"""Multi-chip sharding on the virtual 8-device CPU mesh: the sharded render
must be bit-identical to the single-chip render (pixel-seeded RNG)."""
import jax
import numpy as np
import pytest

from cuda_pathtracer_tpu.parallel.mesh import make_mesh, ShardedPathtracer
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.scene.scene import Scene, Material, GameObject, Plane

W, H = 64, 48


def scene_for(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.4,) * 3))
    glow = Material.DIFFUSE((1, 1, 1))
    glow.emission = (8.0, 8.0, 8.0)
    glow_id = scene.add_material(glow)
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(cube))
    light = GameObject(cube, material_id=glow_id)
    light.position[:] = [0, 6, 0]
    scene.add_object(light)
    scene.add_plane(Plane((0, -1, 0), -3, white))
    scene.interactive_depth = 2
    scene.finalize()
    return scene


def cam():
    return cam_mod.Camera.create([0, 2, -6], [0, -0.1, 1], 1.5, 6, 0.0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_sharded_matches_single_chip(reference_assets):
    scene = scene_for(reference_assets)

    single = Pathtracer(scene, W, H)
    single.render(cam(), should_clear=True)
    for _ in range(2):
        single.render(cam(), should_clear=False)

    mesh = make_mesh(jax.devices()[:8])
    sharded = ShardedPathtracer(scene, W, H, mesh=mesh)
    sharded.render(cam(), should_clear=True)
    for _ in range(2):
        sharded.render(cam(), should_clear=False)

    a = np.asarray(single.accumulators_pixel_order()[0])
    b = np.asarray(sharded.lum)   # the sharded engine keeps pixel order
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # the guiding cache is all-reduced and must agree too
    np.testing.assert_allclose(np.asarray(single.radiance.cache),
                               np.asarray(sharded.radiance.cache),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason='needs multiple devices')
def test_sharded_runs_on_two_devices(reference_assets):
    scene = scene_for(reference_assets)
    mesh = make_mesh(jax.devices()[:2])
    pt = ShardedPathtracer(scene, W, H, mesh=mesh)
    pt.render(cam(), should_clear=True)
    pt.finish()
    assert np.isfinite(np.asarray(pt.lum)).all()
