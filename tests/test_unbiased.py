"""Estimator-unbiasedness property tests (VERDICT round-2 weak item 8).

The config goldens lock today's behavior; these tests check CORRECTNESS
properties instead: two estimators of the same integral must converge to the
same mean.

  * NEE on vs off: next-event estimation splits direct light into an
    explicit light sample (and must then EXCLUDE emissive hits on
    subsequent bounce rays, src/kernels.h:670-707) — any double-count or
    lost term shows up as a mean shift between the two estimators.
  * guided vs unguided: the radiance-cache CDF walk changes the sampling
    pdf and compensates with inverse-probability weights
    (src/kernels.h:600-660, models/sampling.py) — any weight bias shows up
    as a mean shift once both have converged.

Renders are deterministic (seeded RNG), so the tolerances are locks on a
converged A/B, not flaky statistical bounds (measured: NEE 0.57%, guided
0.16% at 32 spp).
"""
import numpy as np
import pytest

from cuda_pathtracer_tpu.scene.scene import (Scene, Material, GameObject,
                                             Plane)
from cuda_pathtracer_tpu.models import pathtracer as ptmod
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.core import camera as cam_mod

W, H = 48, 32
SPP = 32


def _scene(reference_assets):
    """Diffuse cube + ground plane lit by one emissive cube: every light
    path has both an NEE estimator and a BRDF-hit estimator."""
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.5,) * 3))
    glow = Material.DIFFUSE((1, 1, 1))
    glow.emission = (6.0, 6.0, 6.0)
    gid = scene.add_material(glow)
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(cube))
    light = GameObject(cube, material_id=gid)
    light.position[:] = [0, 5, 0]
    light.scale[:] = 1.2
    scene.add_object(light)
    scene.add_plane(Plane((0, -1, 0), -3, white))
    scene.finalize()
    return scene


def _converged(reference_assets, *, nee, cache):
    scene = _scene(reference_assets)
    pt = Pathtracer(scene, W, H)
    pt.nee = nee
    pt.cache = cache
    cam = cam_mod.Camera.create([0, 2, -6], [0, -0.1, 1], 1.5, 6, 0.0)
    pt.render(cam, should_clear=True)   # compile the interactive program
    pt.lum, pt.alb = film.clear_accumulators(W * H)
    pt.sample_idx = 0
    while pt.sample_idx < SPP:
        pt.render(cam, should_clear=False)
    pt.finish()
    lum = np.asarray(pt.accumulators_pixel_order()[0])
    img = lum[:, :3] / np.maximum(lum[:, 3:4], 1e-9)
    assert np.isfinite(img).all()
    return img


@pytest.mark.slow
def test_nee_on_off_converge_to_same_mean(reference_assets):
    on = _converged(reference_assets, nee=True, cache=False)
    off = _converged(reference_assets, nee=False, cache=False)
    rel = abs(on.mean() - off.mean()) / on.mean()
    assert rel < 0.015, f'NEE on/off mean mismatch: {on.mean()} vs ' \
                        f'{off.mean()} (rel {rel:.4f})'


@pytest.mark.slow
def test_guided_unguided_converge_to_same_mean(reference_assets,
                                               monkeypatch):
    # shrink the 100-sample training window so guiding actually steers
    # samples inside a CI-sized run
    monkeypatch.setattr(ptmod, 'GUIDE_TRAIN_SAMPLES', 8)
    guided = _converged(reference_assets, nee=True, cache=True)
    plain = _converged(reference_assets, nee=True, cache=False)
    rel = abs(guided.mean() - plain.mean()) / plain.mean()
    assert rel < 0.01, f'guided/unguided mean mismatch: {guided.mean()} ' \
                       f'vs {plain.mean()} (rel {rel:.4f})'
