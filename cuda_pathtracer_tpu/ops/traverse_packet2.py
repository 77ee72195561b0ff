"""Multi-push packet BVH traversal — generation 2 of the Pallas TPU kernel.

The shipped kernel (ops/traverse_packet.py) spends ~430 ns of its ~0.55-1.1 us
node visit in the nearest-first child-selection reduction chain: pc_min lane
reduction, kmin, iota-min, and THREE full masked-sum scalar extractions per
visit (selref/selbit/nhits), all serialized cross-lane work (measured,
tools/kernel_lab*.py and PERF.md "Where the per-visit microsecond goes").

This kernel removes nearly all of it with three structural changes:

  * MERGED node table with CONTIGUOUS children: each inner node's children
    occupy one contiguous id block [base, base+n), inner children first in
    slot order, leaves after. The per-visit decision the scalar core needs is
    just (hitmask, base|n_inner) — child ids are base+slot, leafness is
    slot >= n_inner. No per-child refs cross the vector->scalar boundary.
  * MULTI-PUSH, no re-prune: a visit pushes ONE stack entry (hitmask, meta)
    and the scalar core unspools children from it bit by bit (lowest slot
    first), clearing bits in place. No parent refetch, no visited masks, no
    per-pop re-pruning slab pass.
  * SUBLANE-space extraction: the only cross-LANE reduction left is one
    any() over rays (chit -> anyc[16,1]); the two decision words are then
    reductions over the 16-element sublane axis, which the VPU does cheaply.

Descent order is lowest-slot-first (no nearest-first ordering): the
CHEAP_ALL ablation measured +12% visits for unordered descent, which this
design buys back several times over in per-visit cost. Exact-t ties across
different leaves may resolve differently than the v1 kernel (visit order
decides that measure-zero edge; within one leaf lowest-gid still wins).

The bit-index-of-lowest-set-bit trick on the scalar core: float-convert the
isolated bit (exact, single bit) and read its exponent — no LUT, no loops.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import Hit, PRIM_TRIANGLE, _primitives_prepass
from ..constants import T_MAX
from ..accel.wide import (ARITY, LEAF_MAX, INNER_BOX0, INNER_REFS,
                          LEAF_TRIS, LEAF_GIDS, LEAF_GID_MAX)
from .traverse_packet import (PACKET, RAY_ROWS, BIG, DONE, MT_DET_EPS,
                              PBOX0, PREFS, PTRIS, PGIDS)

NPK = int(__import__('os').environ.get('CPT_NPK2', '2'))
PPC = int(__import__('os').environ.get('CPT_PPC2', '8'))
# sort-permute A/B knobs (PERF.md round 5, second session): compact 8-col
# trace-input permute, and the scatter form of the hit unpermute
_M8_PERMUTE = __import__('os').environ.get('CPT_M8', '1') != '0'
_UNPERM_SCATTER = __import__('os').environ.get(
    'CPT_UNPERM_SCATTER', '0') != '0'

# merged-row lane layout: inner rows keep boxes at [0:96] and carry ONE meta
# word; leaf rows keep the v1 leaf layout (tris at [0:108], gids [108:120])
PMETA = 96            # meta int32 bitcast: base | (n_inner << 20)
PMETA2 = 97           # mask_inner int32 bitcast: (1 << n_inner) - 1 — the
#                       share-K scalar path splits hitmasks without the
#                       dynamic shifts Mosaic's scalar core lacks
META_BASE_BITS = 20


class MergedTable(NamedTuple):
    rows: jnp.ndarray    # f32[N, 128]
    depth: int


class MergedAux(NamedTuple):
    """Static topology info for refit (accel/refit.py): where each wide row
    landed and how inner slots were permuted."""
    row_map: np.ndarray      # i32[N_wide] old wide row -> merged row (-1 root
                             #   of empty scenes)
    is_leaf: np.ndarray      # bool[N_merged]
    slot_order: np.ndarray   # i32[N_merged, 16] new slot -> old slot (inner
                             #   rows; identity elsewhere)


def build_merged_table(wide_rows: np.ndarray, depth: int,
                       with_aux: bool = False,
                       slot_order: str | None = None):
    """Derive the merged contiguous-children table from the unified wide
    table (accel/wide.py layout). BFS order guarantees every node's children
    are contiguous; slots are permuted inner-first (box fields permuted
    identically, so the slab test is unchanged up to slot order).

    slot_order: secondary ordering WITHIN the inner and leaf blocks (the
    kernel descends lowest slot first, so this is a free build-time knob).
    MEASURED NEGATIVE (tools/slot_order_study.py, sibenik bounce
    wavefronts): 'area' (big children first) +4.6% union visits,
    'area_asc' +5.2% — the stable wide-slot order ('default') inherits the
    SAH collapse's spatial coherence and wins; keep it. Env override:
    CPT_SLOT_ORDER."""
    if slot_order is None:
        slot_order = __import__('os').environ.get('CPT_SLOT_ORDER', 'default')
    src = np.asarray(wide_rows, np.float32)
    tag = src[:, 0]
    n = len(src)
    if n == 0 or (tag > 0).sum() == 0:
        # single-leaf or empty scene: synthesize an inner root over one leaf
        rows = np.zeros((2, 128), np.float32)
        box = np.full((6, ARITY), np.nan, np.float32)
        if n:
            box[0:3, 0] = -BIG
            box[3:6, 0] = BIG
        rows[0, PBOX0:PBOX0 + 96] = box.reshape(-1)
        meta = np.int32(1 | (0 << META_BASE_BITS))   # base=1, n_inner=0
        rows[0, PMETA] = meta.view(np.float32)
        if n and tag[0] < 0:
            rows[1, PTRIS:PTRIS + 9 * LEAF_MAX] = _leaf_payload(src[0])
            rows[1, PGIDS:PGIDS + LEAF_MAX] = src[0, LEAF_GIDS:LEAF_GID_MAX]
        table = MergedTable(jnp.asarray(rows), depth)
        if not with_aux:
            return table
        row_map = np.full(max(n, 1), -1, np.int32)
        if n:
            row_map[0] = 1
        aux = MergedAux(row_map,
                        np.array([False, True]),
                        np.tile(np.arange(ARITY, dtype=np.int32), (2, 1)))
        return table, aux

    assert tag[0] > 0, 'wide root must be an inner row'
    refs_all = src[:, INNER_REFS:INNER_REFS + ARITY].view(np.int32)
    nch_all = src[:, 0].astype(np.int32)

    # Level-synchronous BFS, fully vectorized (every non-root wide row is
    # someone's child exactly once, so the merged table has exactly n rows).
    rows = np.zeros((n, 128), np.float32)
    row_map = np.full(n, -1, np.int32)
    is_leaf_m = np.zeros(n, bool)
    slot_order_m = np.tile(np.arange(ARITY, dtype=np.int32), (n, 1))

    iota = np.arange(ARITY, dtype=np.int32)
    frontier_old = np.array([0], np.int32)       # old ids, new-id order
    frontier_new = np.array([0], np.int32)
    row_map[0] = 0
    next_free = 1
    while len(frontier_old):
        refs = refs_all[frontier_old]                        # [F, 16]
        nch = nch_all[frontier_old]                          # [F]
        valid = iota[None, :] < nch[:, None]
        ctag = tag[np.clip(refs, 0, n - 1)]
        inner_c = valid & (ctag > 0)
        # slot order: inner children first (stable), then leaves, then empty
        key = np.where(inner_c, 0, np.where(valid, 1, 2))
        if slot_order in ('area', 'area_asc'):
            # within each class, order by child surface area (the kernel
            # descends lowest slot first)
            pbox = src[frontier_old, INNER_BOX0:INNER_BOX0 + 96].reshape(
                -1, 6, ARITY).astype(np.float64)
            ext = np.maximum(pbox[:, 3:6] - pbox[:, 0:3], 0.0)
            area = (ext[:, 0] * ext[:, 1] + ext[:, 0] * ext[:, 2]
                    + ext[:, 1] * ext[:, 2])
            area = np.nan_to_num(area, nan=0.0, posinf=0.0, neginf=0.0)
            sec = -area if slot_order == 'area' else area
            order = np.lexsort((sec, key), axis=1).astype(np.int32)
        else:
            order = np.argsort(key, axis=1, kind='stable').astype(np.int32)
        n_inner = inner_c.sum(1).astype(np.int32)
        sizes = nch.astype(np.int64)
        bases = next_free + np.concatenate(
            [[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
        next_free = int(next_free + sizes.sum())
        assert next_free <= (1 << META_BASE_BITS), \
            'merged table exceeds the 20-bit child base (scene too large ' \
            'for the packet path)'
        ordered_refs = np.take_along_axis(refs, order, axis=1)
        ordered_valid = np.take_along_axis(valid, order, axis=1)
        # parent rows: permuted boxes (empty slots NaN) + meta
        box = src[frontier_old, INNER_BOX0:INNER_BOX0 + 96].reshape(
            -1, 6, ARITY)
        newbox = np.take_along_axis(box, order[:, None, :], axis=2).copy()
        newbox[np.broadcast_to((~ordered_valid)[:, None, :],
                               newbox.shape)] = np.nan
        rows[frontier_new, PBOX0:PBOX0 + 96] = newbox.reshape(-1, 96)
        metas = (bases.astype(np.int32)
                 | (n_inner << META_BASE_BITS)).view(np.float32)
        rows[frontier_new, PMETA] = metas
        rows[frontier_new, PMETA2] = ((np.int32(1) << n_inner)
                                      - 1).astype(np.int32).view(np.float32)
        slot_order_m[frontier_new] = order
        # children: new ids in row-major (f, slot) order == allocation order
        child_old = ordered_refs[ordered_valid]
        child_new = (bases[:, None] + iota[None, :].astype(np.int64))[
            ordered_valid].astype(np.int32)
        row_map[child_old] = child_new
        child_is_inner = tag[child_old] > 0
        # leaf children rows (vectorized payload)
        lo = child_old[~child_is_inner]
        ln = child_new[~child_is_inner]
        if len(lo):
            fm = src[lo, LEAF_TRIS:LEAF_TRIS + 9 * LEAF_MAX].reshape(
                -1, 3, 3, LEAF_MAX)
            pk = np.concatenate([fm[:, 0], fm[:, 1] - fm[:, 0],
                                 fm[:, 2] - fm[:, 0]], axis=1)
            rows[ln, PTRIS:PTRIS + 9 * LEAF_MAX] = pk.reshape(len(lo), -1)
            rows[ln, PGIDS:PGIDS + LEAF_MAX] = src[lo,
                                                   LEAF_GIDS:LEAF_GID_MAX]
            is_leaf_m[ln] = True
        frontier_old = child_old[child_is_inner]
        frontier_new = child_new[child_is_inner]
    assert next_free == n, (next_free, n)
    table = MergedTable(jnp.asarray(rows), depth)
    if not with_aux:
        return table
    return table, MergedAux(row_map, is_leaf_m, slot_order_m)


class MergedRefitMaps(NamedTuple):
    """Static per-topology maps for deriving the merged table from the
    refitted v1 split tables on device (accel/refit integration)."""
    from_inner: jnp.ndarray   # i32[NM] v1 inner row (clamped junk if leaf)
    from_leaf: jnp.ndarray    # i32[NM] v1 leaf row (clamped junk if inner)
    is_leaf: jnp.ndarray      # bool[NM]
    slot_order: jnp.ndarray   # i32[NM, 16]
    meta: jnp.ndarray         # f32[NM] static meta word (bitcast int)
    meta2: jnp.ndarray        # f32[NM] static mask_inner word (bitcast int)


def build_refit_maps(wide_rows: np.ndarray, depth: int) -> MergedRefitMaps:
    """Compose the merged BFS mapping with the v1 split-table mapping."""
    src = np.asarray(wide_rows, np.float32)
    tag = src[:, 0]
    inner_ids = np.flatnonzero(tag > 0)
    leaf_ids = np.flatnonzero(tag < 0)
    inner_pos = np.full(len(src), 0, np.int32)
    inner_pos[inner_ids] = np.arange(len(inner_ids), dtype=np.int32)
    leaf_pos = np.full(len(src), 0, np.int32)
    leaf_pos[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)

    table, aux = build_merged_table(src, depth, with_aux=True)
    nm = int(table.rows.shape[0])
    old_of = np.zeros(nm, np.int32)
    old_of[aux.row_map] = np.arange(len(aux.row_map), dtype=np.int32)
    meta = np.asarray(table.rows)[:, PMETA].copy()
    meta2 = np.asarray(table.rows)[:, PMETA2].copy()
    return MergedRefitMaps(
        from_inner=jnp.asarray(inner_pos[old_of]),
        from_leaf=jnp.asarray(leaf_pos[old_of]),
        is_leaf=jnp.asarray(aux.is_leaf),
        slot_order=jnp.asarray(aux.slot_order),
        meta=jnp.asarray(meta),
        meta2=jnp.asarray(meta2))


@jax.jit
def derive_merged(inner_rows, leaf_rows, maps: MergedRefitMaps):
    """Rebuild the merged table from refitted v1 split tables (pure device
    gathers + a static column permutation; topology is frozen)."""
    nm = maps.is_leaf.shape[0]
    gi = inner_rows[jnp.clip(maps.from_inner, 0, inner_rows.shape[0] - 1)]
    boxes = gi[:, :96].reshape(nm, 6, ARITY)
    boxes = jnp.take_along_axis(
        boxes, maps.slot_order[:, None, :], axis=2).reshape(nm, 96)
    pad = jnp.zeros((nm, 128 - 98), jnp.float32)
    inner_m = jnp.concatenate([boxes, maps.meta[:, None],
                               maps.meta2[:, None], pad], axis=1)
    gl = leaf_rows[jnp.clip(maps.from_leaf, 0, leaf_rows.shape[0] - 1)]
    return jnp.where(maps.is_leaf[:, None], gl, inner_m)


def _leaf_payload(leaf_row: np.ndarray) -> np.ndarray:
    """(v0, e1, e2) field-major payload, same precompute as v1's split
    tables (bit-identical f32 subtraction)."""
    fm = leaf_row[LEAF_TRIS:LEAF_TRIS + 9 * LEAF_MAX].reshape(3, 3, LEAF_MAX)
    pk = np.concatenate([fm[0], fm[1] - fm[0], fm[2] - fm[0]], axis=0)
    return pk.reshape(-1)


V2B = bool(int(__import__('os').environ.get('CPT_V2B', '0')))

# share-K batched steps (the kernel_lab3 `share8` design, priced 140.7 vs
# 433 ns/visit scripted; 1.89x bounce / 1.97x any-hit on real wavefronts,
# tools/multipush_lab.py v2 v2s): the default. 0 = sequential v2 steps.
SHARE = int(__import__('os').environ.get('CPT_SHARE', '8'))

# share-K on the HBM-DMA large-scene path: the batch unspooled at step i is
# VISITED at step i+1, so its up-to-`share` row DMAs are in flight across the
# other interleaved packets' step (the same one-rotation latency budget the
# sequential hbm path uses). 0 falls back to sequential v2 steps there.
SHARE_HBM = int(__import__('os').environ.get('CPT_SHARE_HBM', '1'))


def _kernel(npk: int, d: int, ppc: int, hbm: bool = False, split: int = 0,
            batched: bool = False, share: int = 0, want_uv: bool = False):
    """hbm=False: the whole merged table is VMEM-resident, rows sliced
    directly. hbm=True: the table stays in HBM (scenes beyond the VMEM cap,
    e.g. the 2M-triangle stress scene) and each packet's next row is DMA'd
    into a per-packet VMEM slot — the copy is issued right after the scalar
    decision and waited one loop iteration later, so the other interleaved
    packets' vector work hides part of the ~1 us HBM latency.

    split > 0 (hbm only) is the HYBRID scheme: the first `split` merged rows
    — the TOP of the tree, because build_merged_table allocates rows in BFS
    order — ride along as a VMEM-resident operand, and only visits past the
    split DMA from HBM. Top rows are the most frequently visited, so for a
    table just over the VMEM cap nearly every visit skips the DMA latency.

    batched (CPT_V2B): all npk packets' slabs feed ONE shared cross-lane
    any-reduce per step instead of one per visit (see visit_batch); meant
    for npk >= 4 where amortizing the serialized reduction beats the extra
    always-on slab blocks. Bit-exact vs the sequential path."""
    S = d + 3

    OUT = 5 if want_uv else 4

    def kernel(tab_ref, *rest):
        if hbm and split > 0:
            (top_ref, rays_ref, t_out, stk_b, stk_m, t_s, gid_s, fnd_s,
             uv_s, dec_s, row_s, sem) = rest
        elif hbm:
            (rays_ref, t_out, stk_b, stk_m, t_s, gid_s, fnd_s,
             uv_s, dec_s, row_s, sem) = rest
            top_ref = None
        else:
            (rays_ref, t_out, stk_b, stk_m, t_s, gid_s, fnd_s,
             uv_s, dec_s) = rest
            top_ref = row_s = sem = None
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (ARITY, 1), 0)
        bits16 = (1 << iota16)
        iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        rays = rays_ref[:]

        def row_index(cur):
            return jnp.where(cur == DONE, 0,
                             jnp.where(cur < 0, ~cur, cur))

        def start_fetch(p, cur):
            def issue():
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(row_index(cur), 1)],
                    row_s.at[pl.ds(p, 1)],
                    sem.at[p]).start()
            if split > 0:
                pl.when(row_index(cur) >= split)(issue)
            else:
                issue()

        def wait_fetch(p, cur=None):
            def drain():
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(0, 1)],
                    row_s.at[pl.ds(p, 1)],
                    sem.at[p]).wait()
            if split > 0:
                # same predicate the matching start_fetch used for this cur
                pl.when(row_index(cur) >= split)(drain)
            else:
                drain()

        def fetch_row(p, cur):
            """The (1,128) node row for packet p at cur: VMEM slice when
            resident, the packet's DMA slot otherwise."""
            idx = row_index(cur)
            if not hbm:
                return tab_ref[pl.ds(idx, 1), :]
            if split == 0:
                return row_s[pl.ds(p, 1), :]
            top = top_ref[pl.ds(jnp.minimum(idx, split - 1), 1), :]
            # vector-predicate select (scalar-pred selects over vectors are
            # shakier in Mosaic; a broadcast int compare always lowers)
            idxv = jnp.full((1, 128), idx, jnp.int32)
            return jnp.where(idxv < split, top, row_s[pl.ds(p, 1), :])

        def ray_fields(b):
            return dict(
                o=(rays[b + 0:b + 1], rays[b + 1:b + 2], rays[b + 2:b + 3]),
                d=(rays[b + 3:b + 4], rays[b + 4:b + 5], rays[b + 5:b + 6]),
                iv=(rays[b + 6:b + 7], rays[b + 7:b + 8], rays[b + 8:b + 9]),
                livep=rays[b + 10:b + 11] != 0.0,
                sohp=rays[b + 11:b + 12] != 0.0,
                oiv=(rays[b + 12:b + 13], rays[b + 13:b + 14],
                     rays[b + 14:b + 15]))

        def t_scan_of(rf, p):
            t = t_s[p:p + 1, :]
            found = fnd_s[p:p + 1, :] != 0
            return t, found, jnp.where(rf['livep'] & ~(rf['sohp'] & found),
                                       t, -BIG)

        def leaf_body(rf, p, row):
            rowL = jnp.transpose(row)                              # (128,1)
            t, found, t_scan = t_scan_of(rf, p)
            best = gid_s[p:p + 1, :]
            ox, oy, oz = rf['o']
            dx, dy, dz = rf['d']

            def f12(j):
                return jnp.broadcast_to(
                    rowL[PTRIS + j * 12:PTRIS + (j + 1) * 12],
                    (LEAF_MAX, 128))
            v0x, v0y, v0z = f12(0), f12(1), f12(2)
            e1x, e1y, e1z = f12(3), f12(4), f12(5)
            e2x, e2y, e2z = f12(6), f12(7), f12(8)
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / jnp.where(jnp.abs(a) < MT_DET_EPS, 1.0, a)
            sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = f * (dx * qx + dy * qy + dz * qz)
            tt = f * (e2x * qx + e2y * qy + e2z * qz)
            okm = ((jnp.abs(a) >= MT_DET_EPS) & (u >= 0.0) & (u <= 1.0)
                   & (vv >= 0.0) & (u + vv <= 1.0)
                   & (tt > 0.0) & (tt < t_scan))
            ttm = jnp.where(okm, tt, BIG)
            leaf_t = jnp.min(ttm, axis=0, keepdims=True)
            gids = jnp.broadcast_to(jax.lax.bitcast_convert_type(
                rowL[PGIDS:PGIDS + LEAF_MAX], jnp.int32), (LEAF_MAX, 128))
            leaf_gid = jnp.min(jnp.where(ttm == leaf_t, gids,
                                         jnp.int32(2 ** 30)),
                               axis=0, keepdims=True)
            take = jnp.any(okm, axis=0, keepdims=True)
            t_s[p:p + 1, :] = jnp.where(take, leaf_t, t)
            gid_s[p:p + 1, :] = jnp.where(take, leaf_gid, best)
            fnd_s[p:p + 1, :] = ((fnd_s[p:p + 1, :] != 0)
                                 | take).astype(jnp.int32)
            if want_uv:
                # barycentrics of the SAME winner the t/gid update chose
                # (ties at exact t resolve to the lowest gid, and duplicate
                # (t, gid) rows are the same triangle, so the min-select is
                # unambiguous)
                win = okm & (ttm == leaf_t) & (gids == leaf_gid)
                u_new = jnp.min(jnp.where(win, u, BIG), axis=0, keepdims=True)
                v_new = jnp.min(jnp.where(win, vv, BIG), axis=0, keepdims=True)
                uv_s[p:p + 1, :] = jnp.where(take, u_new, uv_s[p:p + 1, :])
                uv_s[npk + p:npk + p + 1, :] = jnp.where(
                    take, v_new, uv_s[npk + p:npk + p + 1, :])

        def inner_chit(rf, p, row):
            """chit (16,128) + transposed row as VALUES (no reduction)."""
            rowT = jnp.transpose(row)                              # (128,1)
            _, _, t_scan = t_scan_of(rf, p)
            ivx, ivy, ivz = rf['iv']
            oivx, oivy, oivz = rf['oiv']

            def f16(k):
                return jnp.broadcast_to(
                    rowT[PBOX0 + k * 16:PBOX0 + (k + 1) * 16],
                    (ARITY, 128))
            lox, loy, loz = f16(0), f16(1), f16(2)
            hix, hiy, hiz = f16(3), f16(4), f16(5)
            t0x = lox * ivx - oivx; t1x = hix * ivx - oivx
            t0y = loy * ivy - oivy; t1y = hiy * ivy - oivy
            t0z = loz * ivz - oivz; t1z = hiz * ivz - oivz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            chit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_scan)
            return chit, rowT

        def meta_word(rowT):
            rowTi = jax.lax.bitcast_convert_type(rowT, jnp.int32)
            return jnp.sum(jnp.where(iota128 == PMETA, rowTi, 0))

        def visit(rb, p, cur):
            """Vector work for packet p at node cur (>=0 inner, <0 leaf via
            ~cur, DONE idle). Leaves (hitmask, meta) for inner visits in
            dec_s."""
            is_leaf = cur < 0
            alive = cur != DONE
            rf = ray_fields(rb)
            row = fetch_row(p, cur)

            @pl.when(alive & is_leaf)
            def _leaf():
                leaf_body(rf, p, row)

            @pl.when(alive & ~is_leaf)
            def _inner():
                chit, rowT = inner_chit(rf, p, row)
                # ONE cross-lane reduction (any over rays), then everything
                # else lives in cheap sublane space
                anyc = jnp.any(chit, axis=1, keepdims=True)        # (16,1)
                dec_s[p, 0] = jnp.sum(jnp.where(anyc, bits16, 0))  # hitmask
                dec_s[p, 1] = meta_word(rowT)

        def visit_batch(curs, base):
            """Batched variant (CPT_V2B): every packet's leaf work and slab
            run per packet, but the cross-lane any-reduce is ONE (16*npk,
            128) -> (16*npk, 1) reduction serving all npk packets; hitmasks
            come out of sublane-space group sums. A packet at a leaf (or
            DONE) still contributes a slab block of don't-care values —
            scalar_packet discards its hitmask via was_inner, identical to
            the sequential path (bit-exact outputs)."""
            chits = []
            metas = []
            for p in range(npk):
                cur = curs[p]
                rf = ray_fields((base + p) * RAY_ROWS)
                row = fetch_row(p, cur)

                @pl.when((cur != DONE) & (cur < 0))
                def _leaf(rf=rf, p=p, row=row):
                    leaf_body(rf, p, row)
                chit, rowT = inner_chit(rf, p, row)
                chits.append(chit)
                metas.append(meta_word(rowT))
            big = jnp.concatenate(chits, axis=0)        # (16*npk, 128)
            anyc = jnp.any(big, axis=1, keepdims=True)  # ONE reduce
            iota_g = jax.lax.broadcasted_iota(jnp.int32, (ARITY * npk, 1), 0)
            bit_g = 1 << (iota_g % ARITY)
            for p in range(npk):
                grp = (iota_g >= p * ARITY) & (iota_g < (p + 1) * ARITY)
                dec_s[p, 0] = jnp.sum(jnp.where(anyc & grp, bit_g, 0))
                dec_s[p, 1] = metas[p]

        def scalar_packet(p, cur, sp):
            """Advance packet p: consume a fresh inner decision from
            registers, or pull the next child from the stack top
            (bit-unspooling). No same-step SMEM read-after-write: the fresh
            path never touches the stack before deciding, and stack reads
            only see entries written in earlier steps. (Design note, not a
            Mosaic hazard: body_h intentionally stages after push_share —
            same-iteration SMEM store-then-load — and is validated on real
            hardware, tools/hw_share_hbm_parity.py.)"""
            was_inner = (cur != DONE) & (cur >= 0)
            bits_new = jnp.where(was_inner, dec_s[p, 0], 0)
            meta_new = dec_s[p, 1]
            fresh = bits_new != 0

            top = jnp.where(sp > 0, sp - 1, 0)
            bits_old = stk_b[p, top]
            meta_old = stk_m[p, top]
            use_old = (~fresh) & (sp > 0)
            bits = jnp.where(fresh, bits_new,
                             jnp.where(use_old, bits_old, 0))
            meta = jnp.where(fresh, meta_new, meta_old)
            low = bits & (-bits)
            # index of the isolated bit: 4 mask tests (scalar bitcast does
            # not lower in Mosaic, so no f32-exponent trick)
            j = (jnp.where((low & 0xAAAA) != 0, 1, 0)
                 + jnp.where((low & 0xCCCC) != 0, 2, 0)
                 + jnp.where((low & 0xF0F0) != 0, 4, 0)
                 + jnp.where((low & 0xFF00) != 0, 8, 0))
            base = meta & ((1 << META_BASE_BITS) - 1)
            n_inner = meta >> META_BASE_BITS
            child = base + j
            child_leaf = j >= n_inner
            nxt = jnp.where(low != 0,
                            jnp.where(child_leaf, ~child, child), DONE)
            bits2 = bits ^ low

            push_rest = fresh & (bits2 != 0) & (sp < S)

            @pl.when(push_rest)
            def _():
                stk_b[p, sp] = bits2
                stk_m[p, sp] = meta_new

            @pl.when(use_old)
            def _():
                stk_b[p, top] = bits2
            sp2 = jnp.where(push_rest, sp + 1,
                            jnp.where(use_old & (bits2 == 0), top, sp))
            return nxt.astype(jnp.int32), sp2.astype(jnp.int32)

        def run_set(c):
            base = c * npk

            def cond(carry):
                curs = carry[0]
                aliv = None
                for p in range(npk):
                    a = curs[p] != DONE
                    aliv = a if aliv is None else (aliv | a)
                return aliv

            def body(carry):
                curs, sps = carry
                out = []
                if batched:
                    if hbm:
                        for p in range(npk):
                            wait_fetch(p, curs[p])
                    visit_batch(curs, base)
                    for p in range(npk):
                        r = scalar_packet(p, curs[p], sps[p])
                        if hbm:
                            start_fetch(p, r[0])
                        out.append(r)
                else:
                    for p in range(npk):
                        if hbm:
                            wait_fetch(p, curs[p])
                        visit((base + p) * RAY_ROWS, p, curs[p])
                        r = scalar_packet(p, curs[p], sps[p])
                        if hbm:
                            start_fetch(p, r[0])
                        out.append(r)
                return (tuple(r[0] for r in out), tuple(r[1] for r in out))

            for p in range(npk):
                b = (base + p) * RAY_ROWS
                t_s[p:p + 1, :] = rays[b + 9:b + 10]
            gid_s[:, :] = jnp.full((npk, PACKET), -1, jnp.int32)
            fnd_s[:, :] = jnp.zeros((npk, PACKET), jnp.int32)
            if want_uv:
                uv_s[:, :] = jnp.zeros((2 * npk, PACKET), jnp.float32)
            starts = []
            for p in range(npk):
                b = (base + p) * RAY_ROWS
                any_live = jnp.sum((rays[b + 10:b + 11] != 0.0)
                                   .astype(jnp.int32))
                starts.append(jnp.where(any_live > 0, jnp.int32(0), DONE))
            if hbm:
                for p in range(npk):
                    start_fetch(p, starts[p])
            init = (tuple(starts), tuple(jnp.int32(0) for _ in range(npk)))
            fin = jax.lax.while_loop(cond, body, init)
            del fin
            if hbm and split == 0:
                # drain the copies issued by the final iteration (or the
                # init issues when the loop ran zero times). With split > 0
                # the loop exits only when every cur is DONE, whose
                # row_index (0) is below the split — so no fetch was issued
                # for it and there is nothing outstanding.
                for p in range(npk):
                    wait_fetch(p)
            for p in range(npk):
                o = OUT * (base + p)
                t_out[o + 0:o + 1, :] = t_s[p:p + 1, :]
                t_out[o + 1:o + 2, :] = jax.lax.bitcast_convert_type(
                    gid_s[p:p + 1, :], jnp.float32)
                t_out[o + 2:o + 3, :] = fnd_s[p:p + 1, :].astype(jnp.float32)
                if want_uv:
                    t_out[o + 3:o + 4, :] = uv_s[p:p + 1, :]
                    t_out[o + 4:o + 5, :] = uv_s[npk + p:npk + p + 1, :]
                else:
                    t_out[o + 3:o + 4, :] = jnp.zeros((1, PACKET),
                                                      jnp.float32)

        # ---- share-K batched steps (CPT_SHARE) -------------------------
        # kernel_lab3 measured the (16,128) slab ops as ISSUE-bound (2
        # native sublane registers deep); stacking `share` visits' blocks
        # into one (16*share,128) tile makes every op share*2 registers
        # deep and amortizes the loop + the one cross-lane any-reduce
        # share x: 140.7 vs 433.2 ns/visit scripted. tools/sharek_sim.py
        # prices the real schedule at 2.09x on sorted bounce wavefronts
        # (visit inflation 1.07/1.12, fill 0.88/0.97, leaf-full policy).
        #
        # Entries are TYPED at push time — children are contiguous
        # inner-first, so a hitmask splits into (hm & mask_inner) and the
        # rest, both in SLOT space with the same base (child = base + j; no
        # dynamic shifts, Mosaic scalar core has no variable shl). The two
        # typed stacks share one SMEM array: inner entries grow UP from 0,
        # leaf entries grow DOWN from CAPT-1.
        CAPT = 8 * S

        # -- share-K row sourcing: VMEM slice, or per-slot DMA (hbm). Each
        # packet owns `share` row slots; a batch's DMAs are issued when the
        # batch is UNSPOOLED (end of step i) and waited when it is VISITED
        # (start of step i+1) — the other npk-1 packets' step work plus the
        # loop backedge is the latency budget, the same one-rotation scheme
        # the sequential hbm path uses. Slots with idx < split read the
        # VMEM-resident top of the tree instead (no DMA issued or waited;
        # identical predicates on both sides).
        def start_slot(p, s, idx, val):
            def issue():
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(idx, 1)],
                    row_s.at[pl.ds(p * share + s, 1)],
                    sem.at[p, s]).start()
            pl.when(val & (idx >= split))(issue)

        def wait_slot(p, s, idx, val):
            def drain():
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(0, 1)],
                    row_s.at[pl.ds(p * share + s, 1)],
                    sem.at[p, s]).wait()
            pl.when(val & (idx >= split))(drain)

        def share_rows(p, idxs):
            """The `share` (1,128) node rows for packet p's current batch."""
            if not hbm:
                return [tab_ref[pl.ds(idxs[s], 1), :] for s in range(share)]
            out = []
            for s in range(share):
                slot = row_s[pl.ds(p * share + s, 1), :]
                if split == 0:
                    out.append(slot)
                    continue
                top = top_ref[pl.ds(jnp.minimum(idxs[s], split - 1), 1), :]
                idxv = jnp.full((1, PACKET), idxs[s], jnp.int32)
                out.append(jnp.where(idxv < split, top, slot))
            return out

        def bit_index(low):
            """Index of an isolated bit: 4 constant-mask tests (scalar)."""
            return (jnp.where((low & 0xAAAA) != 0, 1, 0)
                    + jnp.where((low & 0xCCCC) != 0, 2, 0)
                    + jnp.where((low & 0xF0F0) != 0, 4, 0)
                    + jnp.where((low & 0xFF00) != 0, 8, 0))

        def popcount16(v):
            b = v - ((v >> 1) & 0x5555)
            b = (b & 0x3333) + ((b >> 2) & 0x3333)
            b = (b + (b >> 4)) & 0x0F0F
            return (b + (b >> 8)) & 0x1F

        def unspool_slots(p, do_leaf, spi, spl):
            """Pop up to `share` child indices of the chosen type off the
            packet's typed stack (remainder of the last entry written
            back). Returns (idxs, vals, spi2, spl2, n_popped)."""
            dirn = jnp.where(do_leaf, 1, -1)
            rd = jnp.where(do_leaf, CAPT - spl, spi - 1)
            sp = jnp.where(do_leaf, spl, spi)
            bits = jnp.int32(0)
            eb = jnp.int32(0)
            idxs, vals = [], []
            nval = jnp.int32(0)
            for _ in range(share):
                need = (bits == 0) & (sp > 0)
                rdc = jnp.clip(rd, 0, CAPT - 1)
                nb = stk_b[p, rdc]
                nm = stk_m[p, rdc]
                bits = jnp.where(need, nb, bits)
                eb = jnp.where(need, nm, eb)
                sp = jnp.where(need, sp - 1, sp)
                rd = jnp.where(need, rd + dirn, rd)
                low = bits & (-bits)
                val = low != 0
                idxs.append(jnp.where(val, eb + bit_index(low), 0))
                vals.append(val)
                nval = nval + val.astype(jnp.int32)
                bits = bits ^ low
            rem = bits != 0
            wr = jnp.clip(jnp.where(do_leaf, CAPT - sp - 1, sp),
                          0, CAPT - 1)

            @pl.when(rem)
            def _():
                stk_b[p, wr] = bits
                stk_m[p, wr] = eb
            sp = sp + rem.astype(jnp.int32)
            spi2 = jnp.where(do_leaf, spi, sp)
            spl2 = jnp.where(do_leaf, sp, spl)
            return idxs, vals, spi2, spl2, nval

        def inner_share(rf, p, idxs):
            """`share` slab blocks under ONE cross-lane any-reduce; the
            (hitmask, meta, mask_inner) words land in dec_s sublane-space.
            All `share` rows go through ONE (share,128)->(128,share)
            transpose (kernel_lab3 share8t/share16t: 141 -> 91/65 ns/visit
            vs per-visit transposes); per-visit plane broadcasts slice
            columns, and both meta words come off sublane rows PMETA/PMETA2
            with tiny (1,share) lane-masked sums."""
            rows = share_rows(p, idxs)
            bigT = jnp.transpose(jnp.concatenate(rows, axis=0))
            _, _, t_scan = t_scan_of(rf, p)
            ivx, ivy, ivz = rf['iv']
            oivx, oivy, oivz = rf['oiv']
            chits = []
            for s in range(share):
                colT = bigT[:, s:s + 1]

                def f16(k, colT=colT):
                    return jnp.broadcast_to(
                        colT[PBOX0 + k * 16:PBOX0 + (k + 1) * 16],
                        (ARITY, PACKET))
                lox, loy, loz = f16(0), f16(1), f16(2)
                hix, hiy, hiz = f16(3), f16(4), f16(5)
                t0x = lox * ivx - oivx; t1x = hix * ivx - oivx
                t0y = loy * ivy - oivy; t1y = hiy * ivy - oivy
                t0z = loz * ivz - oivz; t1z = hiz * ivz - oivz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                               jnp.minimum(t0y, t1y)),
                                   jnp.minimum(t0z, t1z))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.maximum(t0z, t1z))
                chits.append((tmax >= jnp.maximum(tmin, 0.0))
                             & (tmin < t_scan))
            big = jnp.concatenate(chits, axis=0)       # (16*share, 128)
            anyc = jnp.any(big, axis=1, keepdims=True)  # the ONE reduce
            iota_g = jax.lax.broadcasted_iota(
                jnp.int32, (ARITY * share, 1), 0)
            bit_g = 1 << (iota_g % ARITY)
            metas = jax.lax.bitcast_convert_type(
                bigT[PMETA:PMETA + 1, :], jnp.int32)
            metas2 = jax.lax.bitcast_convert_type(
                bigT[PMETA2:PMETA2 + 1, :], jnp.int32)
            iota_ls = jax.lax.broadcasted_iota(jnp.int32, (1, share), 1)
            for s in range(share):
                grp = ((iota_g >= s * ARITY) & (iota_g < (s + 1) * ARITY))
                dec_s[p, 3 * s] = jnp.sum(jnp.where(anyc & grp, bit_g, 0))
                dec_s[p, 3 * s + 1] = jnp.sum(
                    jnp.where(iota_ls == s, metas, 0))
                dec_s[p, 3 * s + 2] = jnp.sum(
                    jnp.where(iota_ls == s, metas2, 0))

        def leaf_share(rf, p, idxs, vals):
            """`share` leaf visits in one (12*share,128) Möller pass; one
            batched t/gid/found update. Exact-t ties ACROSS leaves in a
            batch resolve to the lowest gid (same measure-zero tie class
            the multi-push design already documents)."""
            t, found, t_scan = t_scan_of(rf, p)
            best = gid_s[p:p + 1, :]
            ox, oy, oz = rf['o']
            dx, dy, dz = rf['d']
            rows = share_rows(p, idxs)
            bigT = jnp.transpose(jnp.concatenate(rows, axis=0))
            blocks = []
            gidbl = []
            valbl = []
            for s in range(share):
                rowL = bigT[:, s:s + 1]   # ONE batched transpose above
                                          # (kernel_lab3 leaf8t: 109 -> 80)

                def f12(j, rowL=rowL):
                    return jnp.broadcast_to(
                        rowL[PTRIS + j * 12:PTRIS + (j + 1) * 12],
                        (LEAF_MAX, PACKET))
                blocks.append([f12(j) for j in range(9)])
                gidbl.append(jnp.broadcast_to(jax.lax.bitcast_convert_type(
                    rowL[PGIDS:PGIDS + LEAF_MAX], jnp.int32),
                    (LEAF_MAX, PACKET)))
                valbl.append(jnp.full((LEAF_MAX, PACKET),
                                      vals[s].astype(jnp.int32)))
            cat = [jnp.concatenate([b[j] for b in blocks], axis=0)
                   for j in range(9)]
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = cat
            gids = jnp.concatenate(gidbl, axis=0)
            valm = jnp.concatenate(valbl, axis=0) != 0
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            a = e1x * hx + e1y * hy + e1z * hz
            f = 1.0 / jnp.where(jnp.abs(a) < MT_DET_EPS, 1.0, a)
            sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = f * (dx * qx + dy * qy + dz * qz)
            tt = f * (e2x * qx + e2y * qy + e2z * qz)
            okm = (valm & (jnp.abs(a) >= MT_DET_EPS) & (u >= 0.0)
                   & (u <= 1.0) & (vv >= 0.0) & (u + vv <= 1.0)
                   & (tt > 0.0) & (tt < t_scan))
            ttm = jnp.where(okm, tt, BIG)
            leaf_t = jnp.min(ttm, axis=0, keepdims=True)
            leaf_gid = jnp.min(jnp.where(ttm == leaf_t, gids,
                                         jnp.int32(2 ** 30)),
                               axis=0, keepdims=True)
            take = jnp.any(okm, axis=0, keepdims=True)
            t_s[p:p + 1, :] = jnp.where(take, leaf_t, t)
            gid_s[p:p + 1, :] = jnp.where(take, leaf_gid, best)
            fnd_s[p:p + 1, :] = ((fnd_s[p:p + 1, :] != 0)
                                 | take).astype(jnp.int32)
            if want_uv:
                win = okm & (ttm == leaf_t) & (gids == leaf_gid)
                u_new = jnp.min(jnp.where(win, u, BIG), axis=0, keepdims=True)
                v_new = jnp.min(jnp.where(win, vv, BIG), axis=0, keepdims=True)
                uv_s[p:p + 1, :] = jnp.where(take, u_new, uv_s[p:p + 1, :])
                uv_s[npk + p:npk + p + 1, :] = jnp.where(
                    take, v_new, uv_s[npk + p:npk + p + 1, :])

        def push_share(p, gate, vals, spi, spl, cnt):
            """Split each fresh hitmask into typed entries (slot space,
            shared base) and push. `gate` (False on leaf/dead steps) keeps
            stale dec_s content from pushing. Overflow drops children, like
            the sequential path's sp < S guard (never reached: sim max
            depth 15+15 vs CAPT)."""
            for s in range(share):
                hm = dec_s[p, 3 * s]
                mt = dec_s[p, 3 * s + 1]
                mi = dec_s[p, 3 * s + 2]
                eb = mt & ((1 << META_BASE_BITS) - 1)
                bi = hm & mi
                bl = hm ^ bi
                room = (spi + spl) < CAPT
                pushi = gate & vals[s] & (bi != 0) & room
                wri = jnp.clip(spi, 0, CAPT - 1)

                @pl.when(pushi)
                def _():
                    stk_b[p, wri] = bi
                    stk_m[p, wri] = eb
                spi = spi + pushi.astype(jnp.int32)
                room = (spi + spl) < CAPT
                pushl = gate & vals[s] & (bl != 0) & room
                wrl = jnp.clip(CAPT - spl - 1, 0, CAPT - 1)

                @pl.when(pushl)
                def _():
                    stk_b[p, wrl] = bl
                    stk_m[p, wrl] = eb
                spl = spl + pushl.astype(jnp.int32)
                cnt = cnt + jnp.where(pushl, popcount16(bl), 0)
            return spi, spl, cnt

        def run_set_share(c):
            base = c * npk

            def cond(carry):
                aliv = None
                for p in range(npk):
                    a = (carry[p][0] > 0) | (carry[p][1] > 0)
                    aliv = a if aliv is None else (aliv | a)
                return aliv

            def body(carry):
                out = []
                for p in range(npk):
                    spi, spl, cnt = carry[p]
                    alive = (spi > 0) | (spl > 0)
                    # leaf-full policy: drain leaves as soon as a full
                    # batch is pending (early t-tightening at full fill)
                    do_leaf = ((cnt >= share) | (spi == 0)) & (spl > 0)
                    idxs, vals, spi, spl, nval = unspool_slots(
                        p, do_leaf, spi, spl)
                    cnt = cnt - jnp.where(do_leaf, nval, 0)
                    rf = ray_fields((base + p) * RAY_ROWS)

                    @pl.when(alive & do_leaf)
                    def _leafs(rf=rf, p=p, idxs=idxs, vals=vals):
                        leaf_share(rf, p, idxs, vals)

                    @pl.when(alive & ~do_leaf)
                    def _inners(rf=rf, p=p, idxs=idxs):
                        inner_share(rf, p, idxs)
                    spi, spl, cnt = push_share(p, alive & ~do_leaf, vals,
                                               spi, spl, cnt)
                    out.append((spi.astype(jnp.int32),
                                spl.astype(jnp.int32),
                                cnt.astype(jnp.int32)))
                return tuple(out)

            # -- hbm: same batch composition/order as above (bit-identical
            # traversal), but the batch unspooled at step i is visited at
            # step i+1, with its DMAs in flight across the other packets'
            # step i work. Carry per packet: (spi, spl, cnt, do_leaf, nval,
            # idx*share, val*share) — all scalars.
            def cond_h(carry):
                aliv = None
                for p in range(npk):
                    spi, spl, _, _, nv = carry[p][:5]
                    a = (spi > 0) | (spl > 0) | (nv > 0)
                    aliv = a if aliv is None else (aliv | a)
                return aliv

            def stage(p, spi, spl, cnt):
                """Unspool the next batch and issue its DMAs; returns the
                carry tail (do_leaf, nval, idxs, vals as int32)."""
                do_leaf = ((cnt >= share) | (spi == 0)) & (spl > 0)
                idxs, vals, spi, spl, nval = unspool_slots(
                    p, do_leaf, spi, spl)
                cnt = cnt - jnp.where(do_leaf, nval, 0)
                for s in range(share):
                    start_slot(p, s, idxs[s], vals[s])
                tail = ((jnp.asarray(do_leaf).astype(jnp.int32),
                         nval.astype(jnp.int32))
                        + tuple(i.astype(jnp.int32) for i in idxs)
                        + tuple(v.astype(jnp.int32) for v in vals))
                return spi, spl, cnt, tail

            def body_h(carry):
                out = []
                for p in range(npk):
                    spi, spl, cnt, dl, nv = carry[p][:5]
                    st_idxs = carry[p][5:5 + share]
                    st_vals = [v != 0
                               for v in carry[p][5 + share:5 + 2 * share]]
                    staged = nv > 0
                    for s in range(share):
                        wait_slot(p, s, st_idxs[s], st_vals[s])
                    rf = ray_fields((base + p) * RAY_ROWS)
                    dlb = dl != 0

                    @pl.when(staged & dlb)
                    def _leafs(rf=rf, p=p, st_idxs=st_idxs,
                               st_vals=st_vals):
                        leaf_share(rf, p, st_idxs, st_vals)

                    @pl.when(staged & ~dlb)
                    def _inners(rf=rf, p=p, st_idxs=st_idxs):
                        inner_share(rf, p, st_idxs)
                    spi, spl, cnt = push_share(p, staged & ~dlb, st_vals,
                                               spi, spl, cnt)
                    spi, spl, cnt, tail = stage(p, spi, spl, cnt)
                    out.append((spi.astype(jnp.int32),
                                spl.astype(jnp.int32),
                                cnt.astype(jnp.int32)) + tail)
                return tuple(out)

            for p in range(npk):
                b = (base + p) * RAY_ROWS
                t_s[p:p + 1, :] = rays[b + 9:b + 10]
            gid_s[:, :] = jnp.full((npk, PACKET), -1, jnp.int32)
            fnd_s[:, :] = jnp.zeros((npk, PACKET), jnp.int32)
            if want_uv:
                uv_s[:, :] = jnp.zeros((2 * npk, PACKET), jnp.float32)
            init = []
            for p in range(npk):
                b = (base + p) * RAY_ROWS
                any_live = jnp.sum((rays[b + 10:b + 11] != 0.0)
                                   .astype(jnp.int32))
                live = any_live > 0
                # root pseudo-entry: child 0 (= the inner root row)
                stk_b[p, 0] = jnp.int32(1)
                stk_m[p, 0] = jnp.int32(0)
                spi0 = jnp.where(live, 1, 0).astype(jnp.int32)
                if not hbm:
                    init.append((spi0, jnp.int32(0), jnp.int32(0)))
                else:
                    # pre-stage the root batch so the first body iteration
                    # has a visit whose DMA is already in flight
                    spi0, spl0, cnt0, tail = stage(
                        p, spi0, jnp.int32(0), jnp.int32(0))
                    init.append((spi0.astype(jnp.int32),
                                 spl0.astype(jnp.int32),
                                 cnt0.astype(jnp.int32)) + tail)
            fin = jax.lax.while_loop(cond_h if hbm else cond,
                                     body_h if hbm else body, tuple(init))
            del fin
            for p in range(npk):
                o = OUT * (base + p)
                t_out[o + 0:o + 1, :] = t_s[p:p + 1, :]
                t_out[o + 1:o + 2, :] = jax.lax.bitcast_convert_type(
                    gid_s[p:p + 1, :], jnp.float32)
                t_out[o + 2:o + 3, :] = fnd_s[p:p + 1, :].astype(jnp.float32)
                if want_uv:
                    t_out[o + 3:o + 4, :] = uv_s[p:p + 1, :]
                    t_out[o + 4:o + 5, :] = uv_s[npk + p:npk + p + 1, :]
                else:
                    t_out[o + 3:o + 4, :] = jnp.zeros((1, PACKET),
                                                      jnp.float32)

        for c in range(ppc):
            if share:
                run_set_share(c)
            else:
                run_set(c)
    return kernel


@partial(jax.jit, static_argnames=('depth', 'interpret', 'hbm', 'split',
                                   'batched', 'share', 'want_uv'))
def _run_packets2(tab, rays, *, depth: int, interpret: bool,
                  hbm: bool = False, split: int = 0,
                  batched: bool = False, share: int = 0,
                  want_uv: bool = False):
    gn = rays.shape[0] // (PPC * NPK * RAY_ROWS)
    d = depth + 2
    S = d + 3
    OUT = 5 if want_uv else 4
    rayspec = pl.BlockSpec((PPC * NPK * RAY_ROWS, PACKET), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((PPC * NPK * OUT, PACKET), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)
    tabspec = pl.BlockSpec(
        memory_space=pltpu.ANY if hbm else pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((gn * PPC * NPK * OUT, PACKET),
                                     jnp.float32)
    uv_scratch = [pltpu.VMEM((2 * NPK, PACKET), jnp.float32)]
    if share:
        scratch = [pltpu.SMEM((NPK, 8 * S), jnp.int32),
                   pltpu.SMEM((NPK, 8 * S), jnp.int32),
                   pltpu.VMEM((NPK, PACKET), jnp.float32),
                   pltpu.VMEM((NPK, PACKET), jnp.int32),
                   pltpu.VMEM((NPK, PACKET), jnp.int32)] + uv_scratch + [
                   pltpu.SMEM((NPK, 3 * share), jnp.int32)]
        if hbm:
            # one row slot + DMA semaphore per (packet, batch slot)
            scratch += [pltpu.VMEM((NPK * share, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((NPK, share))]
    else:
        scratch = [pltpu.SMEM((NPK, S + 1), jnp.int32),
                   pltpu.SMEM((NPK, S + 1), jnp.int32),
                   pltpu.VMEM((NPK, PACKET), jnp.float32),
                   pltpu.VMEM((NPK, PACKET), jnp.int32),
                   pltpu.VMEM((NPK, PACKET), jnp.int32)] + uv_scratch + [
                   pltpu.SMEM((NPK, 2), jnp.int32)]
        if hbm:
            scratch += [pltpu.VMEM((NPK, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((NPK,))]
    split = 0 if not hbm else min(split, int(tab.shape[0]))
    in_specs = [tabspec, rayspec]
    operands = [tab, rays]
    if hbm and split > 0:
        # BFS row order == top of the tree; keep it VMEM-resident
        in_specs = [tabspec, pl.BlockSpec(memory_space=pltpu.VMEM), rayspec]
        operands = [tab, tab[:split], rays]
    return pl.pallas_call(
        _kernel(NPK, d, PPC, hbm, split, batched, share, want_uv),
        grid=(gn,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=outspec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def traverse_packet2(scene, table: MergedTable, ro, rd, t_max=None,
                     active=None, any_hit: bool = False, stop_on_hit=None,
                     order=None, interpret: bool = False,
                     hbm: bool = False, split: int = 0,
                     batched: bool | None = None,
                     share: int | None = None,
                     want_uv: bool = False) -> Hit:
    """Contract-compatible with traverse_packet (same Hit, same prepass).
    hbm=True keeps the node table HBM-resident with per-visit DMA — the
    large-scene path; split>0 additionally keeps the top `split` BFS rows
    VMEM-resident so only deep visits pay the DMA (see _kernel)."""
    from . import intersect as isect
    B = ro.shape[0]
    if t_max is None:
        t_max = jnp.full((B,), T_MAX, jnp.float32)
    if active is None:
        active = jnp.ones((B,), bool)
    t0, ptype0, pid0, found0 = _primitives_prepass(scene, ro, rd, t_max,
                                                   any_hit)
    if stop_on_hit is None:
        stop_on_hit = jnp.full((B,), bool(any_hit))
    live = active & ~(stop_on_hit & found0)

    if order is not None and _M8_PERMUTE:
        # Permute the COMPACT 8-col ray record (ro, rd, t0, live+2*stop) and
        # derive inv / ro*inv AFTER the permute: the sort permute is a
        # row-priced semi-coherent HBM gather, so halving the gathered row
        # from 64 B ([L,16]) to 32 B and rebuilding the derived columns with
        # elementwise ops (which fuse into the rays-layout copy) cuts the
        # permute's memory traffic in half. Bit-identical: safe_inv_dir and
        # ro*inv run on the same f32 bits either side of the permute, and
        # the live+2*stop flag packing round-trips {0,1,2,3} exactly.
        flags = (live.astype(jnp.float32)
                 + 2.0 * stop_on_hit.astype(jnp.float32))
        M8 = jnp.concatenate([ro, rd, t0[:, None], flags[:, None]], axis=1)
        M8 = M8[order]
        ro_s, rd_s, t0_s = M8[:, 0:3], M8[:, 3:6], M8[:, 6]
        stop_f = (M8[:, 7] >= 2.0).astype(jnp.float32)
        live_f = M8[:, 7] - 2.0 * stop_f
        inv_s = isect.safe_inv_dir(rd_s)
        M = jnp.concatenate([
            ro_s, rd_s, inv_s, t0_s[:, None], live_f[:, None],
            stop_f[:, None], ro_s * inv_s,
            jnp.zeros_like(t0_s)[:, None]], axis=1)
    else:
        inv = isect.safe_inv_dir(rd)
        M = jnp.concatenate([
            ro, rd, inv, t0[:, None],
            live.astype(jnp.float32)[:, None],
            stop_on_hit.astype(jnp.float32)[:, None],
            ro * inv, jnp.zeros_like(t0)[:, None]], axis=1)
        if order is not None:
            M = M[order]

    lanes_per_g = PACKET * NPK * PPC
    Bp = -(-B // lanes_per_g) * lanes_per_g
    M = jnp.pad(M, ((0, Bp - B), (0, 0)))
    rays = jnp.swapaxes(M.reshape(-1, PACKET, RAY_ROWS), -1, -2)
    rays = rays.reshape(-1, PACKET)

    if share is None:
        share = SHARE
        if hbm and not SHARE_HBM:
            share = 0
    OUT = 5 if want_uv else 4
    outk = _run_packets2(table.rows, rays, depth=table.depth,
                         interpret=interpret, hbm=hbm, split=split,
                         batched=V2B if batched is None else batched,
                         share=share, want_uv=want_uv)
    outk = outk.reshape(-1, OUT, PACKET)
    O = jnp.swapaxes(outk, -1, -2).reshape(-1, OUT)[:B]
    if order is not None:
        if _UNPERM_SCATTER:
            # Inverse-permute by SCATTER (int32-bitcast so the gid bit
            # patterns — denormal f32 for every gid < 2^23 — can't be
            # flushed by a float emitter). MEASURED SLOWER than the
            # argsort+gather form in the engine (XLA TPU scatter at 829k
            # random rows is the same pathology ops/guiding_scatter.py was
            # built to avoid); kept only as an A/B knob.
            Oi = jax.lax.bitcast_convert_type(O, jnp.int32)
            Oi = jnp.zeros_like(Oi).at[order].set(Oi)
            O = jax.lax.bitcast_convert_type(Oi, jnp.float32)
        else:
            O = O[jnp.argsort(order)]
    tk = O[:, 0]
    gidk = jax.lax.bitcast_convert_type(O[:, 1], jnp.int32)
    hitk = O[:, 2] != 0
    ptype = jnp.where(hitk, PRIM_TRIANGLE, ptype0)
    pid = jnp.where(hitk, gidk, pid0)
    intersected = active & (hitk | found0)
    uk = vk = None
    if want_uv:
        # valid only where the kernel found the triangle hit (analytic
        # prepass hits keep prim_type != TRIANGLE and never consume them)
        uk = jnp.where(hitk, O[:, 3], 0.0)
        vk = jnp.where(hitk, O[:, 4], 0.0)
    return Hit(t=tk, prim_type=ptype, prim_id=pid, intersected=intersected,
               u=uk, v=vk)
