"""Tail narrowing must be invisible in the rendered result: the compacted
continuation produces bit-identical output to the full-width loop when one
round suffices (pixel-seeded RNG makes both paths draw the same numbers)."""
import numpy as np
import jax.numpy as jnp
import pytest

import cuda_pathtracer_tpu.models.pathtracer as ptm
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.scene.scene import Scene, Material, GameObject, Plane
from cuda_pathtracer_tpu.core import camera as cam_mod

W, H = 64, 48  # 3072 lanes


def scene_for(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.7,) * 3))
    glow = Material.DIFFUSE((1, 1, 1))
    glow.emission = (8.0, 8.0, 8.0)
    gid = scene.add_material(glow)
    mirror = Material.DIFFUSE((0.9, 0.9, 0.9))
    mirror.reflect = 1.0
    mid = scene.add_material(mirror)
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(cube))
    m = GameObject(cube, material_id=mid)
    m.position[:] = [3, 0, 0]
    scene.add_object(m)
    light = GameObject(cube, material_id=gid)
    light.position[:] = [0, 6, 0]
    scene.add_object(light)
    scene.add_plane(Plane((0, -1, 0), -3, white))
    scene.interactive_depth = 2
    scene.finalize()
    return scene


def _render(reference_assets, samples=3):
    scene = scene_for(reference_assets)
    pt = Pathtracer(scene, W, H)
    cam = cam_mod.Camera.create([0, 2, -6], [0, -0.1, 1], 1.5, 6, 0.0)
    pt.render(cam, should_clear=True)
    for _ in range(samples):
        pt.render(cam, should_clear=False)
    pt.finish()
    return np.asarray(pt.lum), np.asarray(pt.alb)


def test_tail_matches_full_width(reference_assets, monkeypatch):
    lum_full, alb_full = _render(reference_assets)
    # force the tail path on for this tiny frame. TAIL_DIV=1 keeps the
    # first-level buffer full-width so every pending lane fits one round —
    # the documented bit-identity regime (multi-round tails draw different
    # rand_idx values; unbiased but not bit-identical, see PARITY.md) —
    # while still exercising compaction, scatter-back and the cache carry.
    monkeypatch.setattr(ptm, 'TAIL_MIN_LANES', 1024)
    monkeypatch.setattr(ptm, 'TAIL_DIV', 1)
    ptm.render_sample.clear_cache()
    try:
        lum_tail, alb_tail = _render(reference_assets)
    finally:
        ptm.render_sample.clear_cache()
    np.testing.assert_allclose(lum_tail, lum_full, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(alb_tail, alb_full, rtol=1e-5, atol=1e-5)
