"""Golden locks for all five BASELINE.json configs (VERDICT round-1 item 6).

Each config renders a small frame on the CPU backend with its characteristic
feature set and is locked pixel-for-pixel (relMSE) against a stored golden.
Regenerate with tools/make_goldens.py when a deliberate behavior change is
made, and say so in the commit message.

  1 outside   — raytracer (Whitted) mode, NEE off, point lights
  2 sibenik   — interior area light, NEE on, progressive pathtracer
  3 sponza    — chai-scripted scene, bokeh DoF camera
  4 minecraft — path guiding on (radiance cache) + luminance blur display
  5 2mtris    — high-poly statue stress (scaled to 50k tris for CI; the same
                generator code path as the 2M build), Whitted raytracer +
                point light like the reference's 2mtris setup
"""
import os

import numpy as np
import pytest

from cuda_pathtracer_tpu.utils.image import rel_mse

pytestmark = pytest.mark.slow  # 5-config golden sweep, ~100 s total

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')


def render_config(name, reference_assets):
    """Shared by the tests and tools/make_goldens.py."""
    import jax.numpy as jnp
    from cuda_pathtracer_tpu.scene.builder import get_scene
    from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
    from cuda_pathtracer_tpu.models.raytracer import Raytracer
    from cuda_pathtracer_tpu.core.camera import Camera

    if name == 'outside_ray':
        scene = get_scene('outside', asset_dirs=[reference_assets])
        cam = Camera.create([0, 4, -10], [0, -0.2, 1], 1.5, 8, 0.0)
        rt = Raytracer(scene, 64, 40)
        rt.render(cam, should_clear=False)      # converged depth 7
        return np.asarray(rt.frame)
    if name == 'sibenik_nee':
        scene = get_scene('sibenik', asset_dirs=[reference_assets, '.'])
        cam = Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
        pt = Pathtracer(scene, 64, 48)
        pt.nee = True
        pt.render(cam, should_clear=True)
        for _ in range(4):
            pt.render(cam, should_clear=False)
        pt.finish()
        return np.asarray(pt.accumulators_pixel_order()[0])
    if name == 'sponza_chai':
        scene = get_scene(f'{reference_assets}/sponza.chai',
                          asset_dirs=[reference_assets])
        cam = Camera.create([0, 4, -10], [0, -0.1, 1], 1.5, 8.0, 0.35)  # bokeh
        pt = Pathtracer(scene, 64, 48)
        pt.render(cam, should_clear=True)
        for _ in range(2):
            pt.render(cam, should_clear=False)
        pt.finish()
        return np.asarray(pt.accumulators_pixel_order()[0])
    if name == 'minecraft_guided':
        scene = get_scene('minecraft', asset_dirs=[reference_assets])
        cam = Camera.create([0, 6, -14], [0, -0.15, 1], 1.5, 10.0, 0.0)
        pt = Pathtracer(scene, 64, 48)
        pt.cache = True
        pt.render(cam, should_clear=True)
        for _ in range(4):
            pt.render(cam, should_clear=False)   # guided after 100-gate rules
        pt.finish()
        from cuda_pathtracer_tpu.models import film
        lum, alb = pt.accumulators_pixel_order()
        blurred = np.asarray(film.display(lum, alb, float(pt.sample_idx),
                                          64, 48, blur=True))
        return np.concatenate([np.asarray(lum),
                               blurred.reshape(-1, 3)], axis=1)
    if name == 'stress_statue':
        from cuda_pathtracer_tpu.scene.scene import (Scene, Material,
                                                     GameObject, PointLight)
        from cuda_pathtracer_tpu.scene import procedural
        scene = Scene(asset_dirs=[reference_assets])
        white = scene.add_material(Material.DIFFUSE((0.4,) * 3))
        model = procedural.add_high_poly_statue(scene, white,
                                                target_tris=50_000)
        obj = GameObject(model)
        obj.rotation[0] = -3.1415926535 / 2
        scene.add_object(obj)
        # the statue (a ~2.6-radius, 12-tall body of revolution built along
        # +z) stands upright along +y after the rotation: frame it
        scene.add_point_light(PointLight((-6, 14, -10), (900, 900, 900)))
        scene.finalize()
        cam = Camera.create([0, 6, -14], [0, -0.05, 1], 1.5, 14.0, 0.0)
        # point lights are the raytracer's domain (the GPU pathtracer only
        # samples area lights, matching the reference)
        rt = Raytracer(scene, 48, 32)
        rt.render(cam, should_clear=False)
        return np.asarray(rt.frame)
    raise KeyError(name)


CONFIGS = ['outside_ray', 'sibenik_nee', 'sponza_chai', 'minecraft_guided',
           'stress_statue']


@pytest.mark.parametrize('name', CONFIGS)
def test_config_matches_golden(name, reference_assets):
    path = os.path.join(GOLDEN_DIR, f'config_{name}.npz')
    if not os.path.exists(path):
        pytest.skip(f'golden for {name} not generated yet '
                    '(tools/make_goldens.py)')
    got = render_config(name, reference_assets)
    want = np.load(path)['data']
    assert got.shape == want.shape
    err = rel_mse(got.reshape(-1, got.shape[-1])[:, :3],
                  want.reshape(-1, want.shape[-1])[:, :3])
    assert err < 1e-6, f'{name}: relMSE vs golden = {err}'