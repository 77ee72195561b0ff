"""Device-side refit (accel/refit.py) vs full host rebuild — the cheap
per-frame dynamics of VERDICT round-1 item 4 (reference behavior:
src/pathtracer.h:245-246, scene.h:400)."""
import time

import numpy as np
import pytest

from cuda_pathtracer_tpu.scene.builder import get_scene


def _compare_dyns(a, b, atol=2e-4):
    """Geometry must match the full rebuild. NOTE: the full rebuild re-runs
    the agglomerative pairing, which renumbers the world-triangle layout; the
    refit keeps its frozen numbering (both are internally consistent). So
    world tris compare in canonical (inst, gid) order, and the packet tables
    (spliced in stable instance order) compare on their geometry lanes."""
    def canon(d):
        key = np.lexsort((np.asarray(d.tri_meta[:, 0]),
                          np.asarray(d.tri_meta[:, 1])))
        return np.asarray(d.world.tris)[key]

    np.testing.assert_allclose(canon(a), canon(b), atol=atol)
    np.testing.assert_allclose(np.asarray(a.packet_leaf)[:, :108],
                               np.asarray(b.packet_leaf)[:, :108], atol=atol)
    pi_a = np.asarray(a.packet_inner)[:, :96]
    pi_b = np.asarray(b.packet_inner)[:, :96]
    np.testing.assert_array_equal(np.isnan(pi_a), np.isnan(pi_b))
    m = ~np.isnan(pi_a)
    np.testing.assert_allclose(pi_a[m], pi_b[m], atol=atol)
    np.testing.assert_allclose(np.asarray(a.light_packed),
                               np.asarray(b.light_packed), atol=atol)
    # the v2 merged table must ride through the refit too (device-derived
    # from the refitted split tables via static maps)
    pm_a = np.asarray(a.packet_merged)
    pm_b = np.asarray(b.packet_merged)
    assert pm_a.shape == pm_b.shape and pm_a.shape[0] > 1
    np.testing.assert_array_equal(np.isnan(pm_a), np.isnan(pm_b))
    mm = ~np.isnan(pm_a)
    np.testing.assert_allclose(pm_a[mm], pm_b[mm], atol=atol)


def test_refit_matches_full_rebuild(reference_assets):
    scene = get_scene('outside', asset_dirs=[reference_assets])
    scene.dynamic_arrays()          # full build + template capture
    scene.update(None, 3.0)         # animation handler moves the cubes
    assert scene.invalid
    dyn_refit = scene.dynamic_arrays()
    assert scene._refit_templates is not None

    # force a full rebuild of the same state for comparison
    scene._refit_templates = None
    scene._refit_key = None
    scene._dyn_cache = None
    dyn_full = scene.dynamic_arrays()
    _compare_dyns(dyn_refit, dyn_full)


def test_refit_render_parity(reference_assets):
    """An animated frame rendered off the refit path must match the full
    rebuild's image (the wide-table geometry agrees to float tolerance)."""
    import jax.numpy as jnp
    from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
    from cuda_pathtracer_tpu.core.camera import Camera
    scene = get_scene('outside', asset_dirs=[reference_assets])
    cam = Camera.create([0, 4, -10], [0, -0.2, 1], 1.5, 8, 0.0)

    scene.dynamic_arrays()
    scene.update(None, 2.0)
    pt = Pathtracer(scene, 32, 24)
    pt.render(cam, should_clear=True)
    pt.finish()
    got = np.asarray(pt.accumulators_pixel_order()[0])

    scene._refit_templates = None
    scene._dyn_cache = None
    pt2 = Pathtracer(scene, 32, 24)
    pt2.render(cam, should_clear=True)
    pt2.finish()
    want = np.asarray(pt2.accumulators_pixel_order()[0])
    # tiny fp differences in box corners can flip a ray at silhouettes;
    # demand near-exact agreement
    close = np.isclose(got[:, :3], want[:, :3], rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.995


@pytest.mark.slow
def test_refit_is_cheap(reference_assets):
    """Host-side work per refit must be orders below the full rebuild."""
    scene = get_scene('sibenik', asset_dirs=[reference_assets, '.'])
    scene.dynamic_arrays()
    scene.objects[0].position[0] += 0.01
    scene.invalidate()
    scene.dynamic_arrays()          # warm-up: compiles the refit kernels
    results = []
    for _attempt in range(3):       # retry: CI CPUs are noisy under load
        refit_t = 1e9
        for _ in range(3):
            scene.objects[0].position[0] += 0.01
            scene.invalidate()
            t0 = time.perf_counter()
            d = scene.dynamic_arrays()
            d.packet_leaf.block_until_ready()
            d.world.tris.block_until_ready()
            refit_t = min(refit_t, time.perf_counter() - t0)

        scene.objects[0].position[0] += 0.01
        scene.invalidate()
        scene._refit_templates = None
        scene._refit_key = None
        t0 = time.perf_counter()
        scene.dynamic_arrays()
        full_t = time.perf_counter() - t0
        results.append((refit_t, full_t))
        if refit_t < full_t / 2:
            return
    raise AssertionError(results)
