"""Packet-traversal kernel (ops/traverse_packet.py) vs the XLA wide path.

Runs the Pallas kernel in interpreter mode on the CPU mesh (SURVEY.md §4's
"fake backend" strategy); on TPU the same kernel compiles via Mosaic.
Parity note: the kernel's slab test uses the FMA form (lo*iv - o*iv) while
the wide path computes (lo - o)*iv, so box-BOUNDARY rays may cull
differently by last-ulp margins in either mode (a measure-zero set of
grazing rays, absent from these fixtures); everywhere else hits, prim ids
and t agree exactly.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cuda_pathtracer_tpu.scene.scene import Scene, Material, GameObject
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide
from cuda_pathtracer_tpu.ops import traverse_packet as tpk


@pytest.fixture(scope='module')
def teapot_scene(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    m = scene.add_material(Material.DIFFUSE((0.4,) * 3))
    scene.add_object(GameObject(
        scene.add_model('teapot.obj', 1.0, (0, 0, 0), (0, 0, 0), m)))
    g2 = GameObject(scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), m))
    g2.position[:] = [2.5, 0.5, 1.0]
    scene.add_object(g2)
    scene.finalize()
    arrays, dyn = scene.to_device(), scene.dynamic_arrays()
    tables = tpk.split_packet_tables(np.asarray(dyn.wide_rows),
                                     scene.wide_depth)
    return scene, arrays, dyn, tables


def _rays(n=64 * 48):
    cam = cam_mod.Camera.create([0, 1.5, -6], [0, 0, 1], 1.5, 6, 0.0)
    W, H = 64, n // 64
    ys, xs = np.mgrid[0:H, 0:W]
    return cam_mod.generate_rays_simple(
        cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, H)


@pytest.mark.slow
def test_packet_closest_hit_parity(teapot_scene):
    scene, arrays, dyn, tables = teapot_scene
    ro, rd = _rays()
    hw = traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd)
    hp = tpk.traverse_packet(arrays, tables, ro, rd, interpret=True)
    assert (np.asarray(hw.intersected) == np.asarray(hp.intersected)).all()
    both = np.asarray(hw.intersected)
    assert np.allclose(np.asarray(hw.t)[both], np.asarray(hp.t)[both],
                       rtol=1e-5, atol=1e-5)
    assert (np.asarray(hw.prim_id)[both] == np.asarray(hp.prim_id)[both]).all()
    assert 0.05 < both.mean() < 0.6


def test_packet_any_hit_parity(teapot_scene):
    scene, arrays, dyn, tables = teapot_scene
    ro, rd = _rays()
    hw = traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd,
                       any_hit=True)
    hp = tpk.traverse_packet(arrays, tables, ro, rd, any_hit=True,
                             interpret=True)
    assert (np.asarray(hw.intersected) == np.asarray(hp.intersected)).all()


def test_packet_mixed_stop_on_hit(teapot_scene):
    """Fused extend+shadow semantics: per-lane stop_on_hit halts individual
    lanes at their first hit while others find the closest."""
    scene, arrays, dyn, tables = teapot_scene
    ro, rd = _rays()
    B = ro.shape[0]
    soh = jnp.asarray((np.arange(B) % 2) == 0)
    hw = traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd,
                       stop_on_hit=soh)
    hp = tpk.traverse_packet(arrays, tables, ro, rd, stop_on_hit=soh,
                             interpret=True)
    assert (np.asarray(hw.intersected) == np.asarray(hp.intersected)).all()
    # non-stop lanes must agree exactly on the closest hit
    closest = np.asarray(hw.intersected) & ~np.asarray(soh)
    assert np.allclose(np.asarray(hw.t)[closest], np.asarray(hp.t)[closest],
                       rtol=1e-5, atol=1e-5)


def test_packet_inactive_and_tmax(teapot_scene):
    scene, arrays, dyn, tables = teapot_scene
    ro, rd = _rays()
    B = ro.shape[0]
    active = jnp.asarray(np.arange(B) % 3 != 0)
    tm = jnp.full((B,), 4.5, jnp.float32)
    hw = traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd,
                       t_max=tm, active=active)
    hp = tpk.traverse_packet(arrays, tables, ro, rd, t_max=tm, active=active,
                             interpret=True)
    assert (np.asarray(hw.intersected) == np.asarray(hp.intersected)).all()
    assert not np.asarray(hp.intersected)[~np.asarray(active)].any()


def test_split_tables_structure(teapot_scene):
    scene, arrays, dyn, tables = teapot_scene
    wide = np.asarray(dyn.wide_rows)
    n_inner = int((wide[:, 0] > 0).sum())
    n_leaf = int((wide[:, 0] < 0).sum())
    assert tables.inner.shape == (n_inner, 128)
    assert tables.leaf.shape == (n_leaf, 128)
    refs = np.asarray(tables.inner)[:, tpk.PREFS:tpk.PREFS + 16].view(np.int32)
    boxes = np.asarray(tables.inner)[:, :96].reshape(-1, 6, 16)
    empty = np.isnan(boxes[:, 0, :])
    # every non-empty ref addresses a valid row of its table
    inner_refs = refs[(~empty) & (refs >= 0)]
    leaf_refs = refs[(~empty) & (refs < 0)]
    assert (inner_refs < n_inner).all()
    assert ((~leaf_refs) < n_leaf).all()


def test_engine_renders_via_packet_path(reference_assets, monkeypatch):
    """Full render_sample with the packet kernel forced on (interpret mode):
    the engine's tile-ordered, morton-sorted dispatch must produce the same
    image as the XLA wide path."""
    from cuda_pathtracer_tpu.ops import dispatch
    from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
    from cuda_pathtracer_tpu.scene.builder import get_scene
    from cuda_pathtracer_tpu.core.camera import Camera

    scene = get_scene('outside', asset_dirs=[reference_assets])
    cam = Camera.create([0, 4, -10], [0, -0.2, 1], 1.5, 8, 0.0)
    W, H = 32, 24

    pt = Pathtracer(scene, W, H)
    pt.render(cam, should_clear=True)
    pt.render(cam, should_clear=False)
    pt.finish()
    want = np.asarray(pt.accumulators_pixel_order()[0])

    monkeypatch.setattr(dispatch, 'PACKET_MODE', 'on')
    pt2 = Pathtracer(scene, W, H)
    pt2.render(cam, should_clear=True)
    pt2.render(cam, should_clear=False)
    pt2.finish()
    got = np.asarray(pt2.accumulators_pixel_order()[0])

    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got[:, 3], want[:, 3])
    # interpret-mode kernel is float-exact vs the XLA path on CPU
    assert np.allclose(got[:, :3], want[:, :3], rtol=1e-4, atol=1e-4), \
        float(np.abs(got[:, :3] - want[:, :3]).max())


# ---- v2 multi-push kernel (ops/traverse_packet2.py) ----

from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2  # noqa: E402


@pytest.fixture(scope='module')
def merged_table(teapot_scene):
    scene, arrays, dyn, tables = teapot_scene
    return tpk2.build_merged_table(np.asarray(dyn.wide_rows),
                                   scene.wide_depth)


@pytest.mark.slow
def test_packet2_closest_hit_parity(teapot_scene, merged_table):
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    hw = traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd)
    hp = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True)
    assert (np.asarray(hw.intersected) == np.asarray(hp.intersected)).all()
    both = np.asarray(hw.intersected)
    tw, tp = np.asarray(hw.t)[both], np.asarray(hp.t)[both]
    np.testing.assert_allclose(tw, tp, rtol=1e-5, atol=1e-5)
    # exact-t ties across coincident triangles resolve by visit order (a
    # documented measure-zero edge): pid may differ only where t is tied
    pw, pp = np.asarray(hw.prim_id)[both], np.asarray(hp.prim_id)[both]
    diff = pw != pp
    assert (tw[diff] == tp[diff]).all(), 'pid differs on a non-tied hit'
    assert diff.mean() < 0.01


def test_packet2_any_hit_parity(teapot_scene, merged_table):
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    hw = traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd,
                       any_hit=True)
    hp = tpk2.traverse_packet2(arrays, merged_table, ro, rd, any_hit=True,
                               interpret=True)
    # occlusion agreement is the any-hit contract (which primitive was found
    # first is visit-order dependent by design)
    assert (np.asarray(hw.intersected) == np.asarray(hp.intersected)).all()


def test_packet2_ordered_rays(teapot_scene, merged_table):
    """Results must be grouping-independent up to the documented boundary
    class: a ray whose own FMA slab test grazes a box plane can be RESCUED
    by a packet-mate visiting the leaf (union traversal), finding a real hit
    the solo grouping culls — brute-force-verified measure-zero behavior
    shared by every packet traversal, not a defect."""
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    B = ro.shape[0]
    order = jnp.asarray(np.random.RandomState(3).permutation(B))
    h0 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True)
    h1 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, order=order,
                               interpret=True)
    i0, i1 = np.asarray(h0.intersected), np.asarray(h1.intersected)
    assert (i0 != i1).mean() < 0.005
    both = i0 & i1
    t0_, t1_ = np.asarray(h0.t)[both], np.asarray(h1.t)[both]
    # a rescued visit may also find a NEARER hit than the solo grouping on
    # the same boundary class, so a few dual-hit lanes may disagree too
    close = np.isclose(t0_, t1_, rtol=1e-6, atol=1e-6)
    assert (~close).mean() < 0.005, (~close).sum()


def test_merged_table_structure(teapot_scene):
    """Every wide row lands exactly once; children are contiguous; metas are
    consistent."""
    scene, arrays, dyn, _ = teapot_scene
    wide = np.asarray(dyn.wide_rows)
    table, aux = tpk2.build_merged_table(wide, scene.wide_depth,
                                         with_aux=True)
    rows = np.asarray(table.rows)
    assert sorted(aux.row_map.tolist()) == list(range(len(rows)))
    metas = rows[~aux.is_leaf][:, tpk2.PMETA].view(np.int32)
    bases = metas & ((1 << tpk2.META_BASE_BITS) - 1)
    assert (bases > 0).all() and (bases < len(rows)).all()


@pytest.mark.slow
def test_packet2_hbm_dma_parity(teapot_scene, merged_table):
    """The HBM-resident DMA path (large scenes) must agree with the
    VMEM-resident path exactly: same kernel logic, only the row fetch
    differs."""
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    h0 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               share=0)
    # share=0 pins the SEQUENTIAL DMA path: the share-hbm default would
    # otherwise reroute this test onto the share-8 path (covered by its own
    # parity tests) and leave the sequential path untested.
    h1 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               hbm=True, share=0)
    np.testing.assert_array_equal(np.asarray(h0.intersected),
                                  np.asarray(h1.intersected))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
    np.testing.assert_array_equal(np.asarray(h0.prim_id),
                                  np.asarray(h1.prim_id))


@pytest.mark.slow
def test_packet2_hybrid_split_parity(teapot_scene, merged_table):
    """The hybrid VMEM-top/HBM-DMA path (split > 0) must agree with the
    VMEM-resident path exactly, for splits that land both fetch paths on
    real visits (tiny split -> almost every visit DMAs; mid split -> the
    top of the tree is resident, leaves DMA)."""
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    h0 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               share=0)
    n_rows = int(merged_table.rows.shape[0])
    for split in (8, max(8, (n_rows // 2) & ~7), n_rows):
        # share=0: keep exercising the sequential hybrid fetch (see
        # test_packet2_hbm_dma_parity).
        h1 = tpk2.traverse_packet2(arrays, merged_table, ro, rd,
                                   interpret=True, hbm=True, split=split,
                                   share=0)
        np.testing.assert_array_equal(np.asarray(h0.intersected),
                                      np.asarray(h1.intersected), err_msg=f'split={split}')
        np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t),
                                      err_msg=f'split={split}')
        np.testing.assert_array_equal(np.asarray(h0.prim_id),
                                      np.asarray(h1.prim_id), err_msg=f'split={split}')


@pytest.mark.slow
def test_packet2_batched_parity(teapot_scene, merged_table):
    """The batched shared-reduce variant (CPT_V2B) computes the same
    hitmask/meta decisions as the sequential path, so outputs must be
    bit-exact — including through the hybrid split fetch."""
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    h0 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               share=0)
    # share=0 everywhere here: share!=0 selects the share-step runner and
    # silently ignores batched=True, which would leave V2B untested.
    h1 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               batched=True, share=0)
    np.testing.assert_array_equal(np.asarray(h0.intersected),
                                  np.asarray(h1.intersected))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
    np.testing.assert_array_equal(np.asarray(h0.prim_id),
                                  np.asarray(h1.prim_id))
    h2 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               batched=True, hbm=True, split=8, share=0)
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h2.t))
    np.testing.assert_array_equal(np.asarray(h0.prim_id),
                                  np.asarray(h2.prim_id))


def test_packet2_share_closest_parity(teapot_scene, merged_table):
    """The share-8 batched-step path (CPT_SHARE, the TPU default) must agree
    with the sequential v2 steps on closest hits: identical occlusion,
    identical t (the slab/Möller arithmetic is bit-identical; only the
    VISIT ORDER changes), pid differing only on exact-t ties (across-leaf
    ties in one batch resolve to the lowest gid — the documented
    measure-zero tie class)."""
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    h0 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               share=0)
    h1 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               share=8)
    np.testing.assert_array_equal(np.asarray(h0.intersected),
                                  np.asarray(h1.intersected))
    both = np.asarray(h0.intersected)
    t0_, t1_ = np.asarray(h0.t)[both], np.asarray(h1.t)[both]
    np.testing.assert_array_equal(t0_, t1_)
    p0, p1 = np.asarray(h0.prim_id)[both], np.asarray(h1.prim_id)[both]
    diff = p0 != p1
    assert (t0_[diff] == t1_[diff]).all(), 'pid differs on a non-tied hit'


def test_packet2_share_any_hit(teapot_scene, merged_table):
    """Any-hit: the found flag (the engine's occlusion contract,
    models/pathtracer.py connect) must agree; WHICH hit is reported is
    visit-order dependent by design."""
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    h0 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               share=0, any_hit=True)
    h1 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               share=8, any_hit=True)
    np.testing.assert_array_equal(np.asarray(h0.intersected),
                                  np.asarray(h1.intersected))


def test_packet2_share_tmax_active(teapot_scene, merged_table):
    """share path honors t_max clipping and inactive lanes like the
    sequential path."""
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    B = ro.shape[0]
    rng = np.random.RandomState(11)
    t_max = jnp.asarray(
        rng.uniform(0.5, 50.0, size=B).astype(np.float32))
    active = jnp.asarray(rng.rand(B) > 0.3)
    h0 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, t_max=t_max,
                               active=active, interpret=True, share=0)
    h1 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, t_max=t_max,
                               active=active, interpret=True, share=8)
    np.testing.assert_array_equal(np.asarray(h0.intersected),
                                  np.asarray(h1.intersected))
    both = np.asarray(h0.intersected)
    np.testing.assert_array_equal(np.asarray(h0.t)[both],
                                  np.asarray(h1.t)[both])


@pytest.mark.slow
def test_packet2_share_hbm_parity(teapot_scene, merged_table):
    """share-8 over the HBM-DMA path (large scenes) must be BIT-identical to
    share-8 over the VMEM-resident table: the software pipeline only delays
    each batch's visit by one loop iteration — batch composition and visit
    order are unchanged — so t, pid AND intersected must all match exactly,
    across pure-DMA (split=0), hybrid, and all-resident splits."""
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    h0 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               share=8)
    n_rows = int(merged_table.rows.shape[0])
    for split in (0, 8, max(8, (n_rows // 2) & ~7), n_rows):
        h1 = tpk2.traverse_packet2(arrays, merged_table, ro, rd,
                                   interpret=True, hbm=True, split=split,
                                   share=8)
        np.testing.assert_array_equal(
            np.asarray(h0.intersected), np.asarray(h1.intersected),
            err_msg=f'split={split}')
        np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t),
                                      err_msg=f'split={split}')
        np.testing.assert_array_equal(np.asarray(h0.prim_id),
                                      np.asarray(h1.prim_id),
                                      err_msg=f'split={split}')


def test_packet2_share_hbm_any_hit(teapot_scene, merged_table):
    """share-8 HBM any-hit: found flags bit-identical to share-8 VMEM."""
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    h0 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               share=8, any_hit=True)
    h1 = tpk2.traverse_packet2(arrays, merged_table, ro, rd, interpret=True,
                               share=8, any_hit=True, hbm=True, split=8)
    np.testing.assert_array_equal(np.asarray(h0.intersected),
                                  np.asarray(h1.intersected))


def test_packet2_want_uv_matches_reintersect(teapot_scene, merged_table):
    """Kernel-emitted barycentrics == the shade-side re-intersection they
    replace (src/kernels.h:585-619): same Möller arithmetic on the same f32
    inputs, selected for the SAME winning triangle the t/gid update chose.
    Covers share-K and sequential step modes."""
    from cuda_pathtracer_tpu.ops import intersect as isect
    scene, arrays, dyn, _ = teapot_scene
    ro, rd = _rays()
    tm = np.asarray(dyn.tri_meta)
    for share in (8, 0):
        h = tpk2.traverse_packet2(arrays, merged_table, ro, rd,
                                  interpret=True, share=share, want_uv=True)
        assert h.u is not None and h.v is not None
        tri = np.asarray(h.intersected) & (np.asarray(h.prim_id) >= 0)
        pid = np.asarray(h.prim_id)[tri]
        v0 = jnp.asarray(tm[pid, 2:5])
        v1 = jnp.asarray(tm[pid, 5:8])
        v2 = jnp.asarray(tm[pid, 8:11])
        _, _, tu, tv = isect.ray_triangle(ro[tri], rd[tri], v0, v1, v2)
        # tolerance: the kernel expands the Möller dot/cross products as
        # explicit scalar FMAs while isect.ray_triangle uses vector forms —
        # different f32 summation order. On small-determinant (grazing)
        # hits the 1/det amplifies last-ulp differences to ~5e-6 absolute
        # (measured: 6/497 teapot lanes beyond 2e-6). Far below a texel of
        # UV error; everything else matches to float noise.
        np.testing.assert_allclose(np.asarray(h.u)[tri], np.asarray(tu),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f'share={share}')
        np.testing.assert_allclose(np.asarray(h.v)[tri], np.asarray(tv),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f'share={share}')
        tight = np.isclose(np.asarray(h.u)[tri], np.asarray(tu),
                           rtol=2e-5, atol=2e-6)
        assert tight.mean() > 0.95, f'share={share}: {tight.mean():.3f}'
        # valid barycentric range on every triangle hit
        assert (np.asarray(h.u)[tri] >= 0).all()
        assert (np.asarray(h.v)[tri] >= 0).all()
        assert (np.asarray(h.u)[tri] + np.asarray(h.v)[tri] <= 1 + 1e-5).all()
