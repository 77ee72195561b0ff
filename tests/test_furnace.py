"""White-furnace energy-conservation test (VERDICT round-1 item 6).

A LOSSLESS (albedo 1) diffuse surface inside a uniform environment of
radiance L must render to exactly L at every pixel: with cosine sampling the
per-bounce throughput is albedo = 1 and Russian roulette's 1/p compensation
makes the estimator's expectation telescope to L regardless of how many
bounces a path takes. Any bias in the sampling weights, the RR compensation
or the sky evaluation shows up as a deviation. (For albedo < 1 the surface
is correctly DARKER than the environment — that is physics, not bias.)
This is the DEBUG_ENERGY audit (src/main.cpp:342-366) turned into a
quantitative unbiasedness check.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cuda_pathtracer_tpu.scene.scene import Scene, Material, GameObject
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.core.camera import Camera


@pytest.mark.parametrize('albedo', [1.0])
def test_white_furnace(reference_assets, albedo):
    scene = Scene(asset_dirs=[reference_assets])
    m = scene.add_material(Material.DIFFUSE((albedo,) * 3))
    mid = scene.add_model('teapot.obj', 1.0, (0, 0, 0), (0, 0, 0), m)
    scene.add_object(GameObject(mid))
    scene.finalize()

    pt = Pathtracer(scene, 48, 32)
    # uniform environment: L = 1 everywhere (replace the loaded skydome —
    # both the raw image and the pair table the shader actually samples)
    from cuda_pathtracer_tpu.models.sky import build_sky_pairs
    uniform = np.ones((8, 16, 3), np.float32)
    pt.arrays = pt.arrays._replace(
        sky_img=jnp.asarray(uniform),
        sky_pairs=jnp.asarray(build_sky_pairs(uniform)))
    pt.nee = False          # no lights; pure hemisphere transport
    pt.cache = False
    cam = Camera.create([0, 1.5, -6], [0, 0, 1], 1.5, 6, 0.0)

    spp = 64
    pt.render(cam, should_clear=True)
    # should_clear renders interactive_depth-bounce samples; reset and use
    # full-depth converge samples only
    from cuda_pathtracer_tpu.models import film
    pt.lum, pt.alb = film.clear_accumulators(48 * 32)
    pt.sample_idx = 0
    while pt.sample_idx < spp:
        pt.render(cam, should_clear=False)
    pt.finish()

    lum = np.asarray(pt.accumulators_pixel_order()[0])
    img = lum[:, :3] / np.maximum(lum[:, 3:4], 1e-9)
    assert np.isfinite(img).all()
    mean = img.mean()
    # every path eventually escapes to L=1; with RR compensation the
    # estimator is unbiased, so the mean converges to 1 for ANY albedo
    assert abs(mean - 1.0) < 0.02, f'furnace mean {mean} (albedo {albedo})'
    # and per-pixel values should be tightly distributed around 1
    assert np.percentile(np.abs(img.mean(axis=1) - 1.0), 95) < 0.15
