"""Packet BVH traversal — the Pallas TPU kernel (the performance path).

Replaces the XLA-gather lockstep walk (ops/traverse_wide.py) for scenes whose
node tables fit in VMEM. Measured motivation (tools/pallas_probe_r2*.py, TPU
v5lite): XLA's gather engine moves ~150-400 M rows/s, capping any
gather-per-iteration design at single-digit Mrays/s; inside a Mosaic kernel a
data-dependent row read from a VMEM-resident table costs ~7-14 ns and the
vector->scalar traversal decision ~10-35 ns when a few independent packets
are interleaved — two orders of magnitude below the XLA per-row cost.

Design (all constraints are measured Mosaic lowering rules, see the probes):
  * A PACKET of 128 rays shares one traversal: the packet visits the union of
    the nodes its rays want. Rays live on VPU lanes; per-node child boxes /
    leaf triangles live on sublanes, sliced as [16,1]/[12,1] columns from the
    TRANSPOSED node row ((1,128) -> (128,1) transpose is one relayout; general
    reshapes do not lower).
  * The node table is split in two (inner boxes / leaf triangles) so the
    leaf-vs-inner decision is the SIGN of the child ref — a pure scalar — and
    no per-step tag extraction from vector land is needed (Mosaic cannot
    broadcast a (1,1) slice across both sublanes and lanes).
  * Empty child slots carry NaN boxes: the slab test rejects them for free.
    Empty triangle slots are degenerate (all-zero): Möller-Trumbore's
    determinant cutoff rejects them for free.
  * The per-packet stack is (node, visited-mask) pairs in SMEM, exactly the
    masked short-stack of the XLA path: a pop re-fetches the parent row and
    re-prunes against the improved t.
  * NPK packets are interleaved in one loop so the vector->scalar latency of
    one packet hides behind the vector work of the others.

Semantics match traverse_wide (same visited-mask policy, same nearest-first
descent, same lowest-gid tie rule inside a leaf), so the two paths can be
diff-tested; the reference semantics are kernels.h:202-387.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import intersect as isect
from .traverse import Hit, PRIM_TRIANGLE, _primitives_prepass
from ..constants import T_MAX
from ..accel.wide import (ARITY, LEAF_MAX, INNER_BOX0, INNER_REFS,
                          LEAF_TRIS, LEAF_GIDS, LEAF_GID_MAX)

PACKET = 128          # rays per packet = VPU lane count
NPK = int(__import__('os').environ.get('CPT_NPK', '2'))  # interleaved packets per grid step. The step is
                      # VPU-bound (~170 ns of vector work); large NPK causes
                      # vector-register spills and straggler waste, so 2 is
                      # the sweet spot (tools/pallas_probe_r2h/i.py).
PPC = int(__import__('os').environ.get('CPT_PPC', '8'))
                      # packet SETS per grid cell, run sequentially inside
                      # the kernel: amortizes the fixed per-cell cost
                      # (pipeline ramp + while setup) over ppc x the rays.
                      # Measured ~4% on coherent wavefronts
                      # (tools/tpu_front_sweep.py NF=1 PPC=1 vs 8)
NF = int(__import__('os').environ.get('CPT_PKF', '1'))
                      # traversal FRONTS per packet: nodes visited per
                      # while-step, kept disjoint through a shared
                      # continuation stack. Hypothesis was that the
                      # vector->scalar drain is per-STEP, so NF>1 would
                      # amortize it over NF node visits; measured on real
                      # sibenik wavefronts (tools/tpu_front_sweep.py) NF=2/4
                      # is NEUTRAL-to-slightly-slower — the sync cost scales
                      # with the dec_s traffic, not the step count. Default 1.
SKIP_LIVE_CHECK = bool(int(__import__('os').environ.get('CPT_SKIP_LIVE', '0')))
                      # experiment knob: start every packet at the root
                      # without the per-set any-live reduction (dead packets
                      # then traverse pointlessly; audit-only)
CHEAP_ALL = bool(int(__import__('os').environ.get('CPT_CHEAP_ALL', '0')))
                      # experiment knob: lowest-index (unordered) descent for
                      # CLOSEST-hit traversals too. Results are visit-order
                      # independent except for exact-t ties across DIFFERENT
                      # leaves (a measure-zero geometric edge where the
                      # first-visited leaf's gid wins); the visit count and
                      # the per-visit reduction chain change. Measured -8%
                      # on bounce wavefronts — kept off.
RAY_ROWS = 16         # fused ray-block rows per packet:
                      # ox oy oz dx dy dz ivx ivy ivz t0 live soh
                      # oivx oivy oivz pad  (oiv = o*inv_dir, precomputed so
                      # the slab test is pure FMA: lo*iv - oiv)
BIG = 3.0e38
DONE = 2 ** 30          # plain python int: kernels must not capture traced constants
MT_DET_EPS = 1e-4   # kernels.h:134 parity (ops/intersect.py:27)

# packet-table lane layout (inner rows)
PBOX0 = 0             # [0:96]  six 16-wide field blocks (NaN for empty slots)
PREFS = 96            # [96:112] signed child refs (int32 bitcast):
                      #          >=0 inner row, <0 leaf row (~ref)
# packet-table lane layout (leaf rows)
PTRIS = 0             # [0:108] field-major 9 x 12 triangle fields, in
                      #         (v0, e1=v1-v0, e2=v2-v0) order
PGIDS = 108           # [108:120] world-triangle ids (int32 bitcast)


class PacketTables(NamedTuple):
    inner: jnp.ndarray   # f32[Ni, 128]
    leaf: jnp.ndarray    # f32[Nl, 128]
    depth: int


def split_packet_tables(wide_rows: np.ndarray, depth: int) -> PacketTables:
    """Derive the two VMEM packet tables from the unified wide table
    (accel/wide.py layout). Pure numpy, runs once per scene upload."""
    rows = np.asarray(wide_rows, np.float32)
    tag = rows[:, 0]
    inner_ids = np.flatnonzero(tag > 0)
    leaf_ids = np.flatnonzero(tag < 0)
    remap = np.zeros(len(rows), np.int32)
    remap[inner_ids] = np.arange(len(inner_ids), dtype=np.int32)
    remap[leaf_ids] = ~np.arange(len(leaf_ids), dtype=np.int32)  # <0 => leaf

    if len(inner_ids) == 0:
        # single-leaf scene: synthesize an always-hit inner root
        inner = np.zeros((1, 128), np.float32)
        box = np.full((6, ARITY), np.nan, np.float32)
        box[0:3, 0] = -BIG
        box[3:6, 0] = BIG
        inner[0, PBOX0:PBOX0 + 96] = box.reshape(-1)
        refs = np.zeros(ARITY, np.int32)
        refs[0] = -1 if len(leaf_ids) else 0   # ~0 == -1 -> leaf row 0
        inner[0, PREFS:PREFS + ARITY] = refs.view(np.float32)
    else:
        assert tag[0] > 0, 'wide root must be an inner row'
        src = rows[inner_ids]
        inner = np.zeros((len(inner_ids), 128), np.float32)
        box = src[:, INNER_BOX0:INNER_BOX0 + 96].reshape(-1, 6, ARITY).copy()
        n_child = src[:, 0].astype(np.int32)
        empty = np.arange(ARITY)[None, :] >= n_child[:, None]
        box[:, :, :] = np.where(empty[:, None, :], np.nan, box)
        # NOTE on the FMA slab form (lo*iv - oiv): it carries rounding error
        # ~2^-23 * |iv| * (|lo| + |o|) that the classic (lo - o) * iv form
        # avoids (Sterbenz-exact subtraction), so box-BOUNDARY rays may cull
        # differently from the wide/narrow paths by last-ulp margins.
        # The divergence widens on near-parallel axes: safe_inv_dir clamps
        # |dir| at 1e-20, so |iv| can reach ~1e20 and o*iv ~1e20-scale, where
        # the cancellation error is ~1e15 ABSOLUTE — rays whose origin lies
        # within ~1e-5 of a box plane on a parallel axis may cull differently
        # (both slab bounds then sit at +/-huge, so the practical effect is
        # confined to origins essentially ON the plane).
        # A conservative 2-ulp plane pad was tried and reverted: it exposes
        # the mirror-image boundary lanes of the UNPADDED reference paths
        # (real grazing hits those paths cull), breaking strict-equality
        # parity in the other direction — the divergence is inherent to
        # mixing slab formulations and is measure-zero either way.
        inner[:, PBOX0:PBOX0 + 96] = box.reshape(-1, 96)
        refs = src[:, INNER_REFS:INNER_REFS + ARITY].view(np.int32)
        refs = np.where(empty, 0, remap[np.clip(refs, 0, len(rows) - 1)])
        inner[:, PREFS:PREFS + ARITY] = refs.astype(np.int32).view(np.float32)

    if len(leaf_ids) == 0:
        leaf = np.zeros((1, 128), np.float32)
    else:
        src = rows[leaf_ids]
        leaf = np.zeros((len(leaf_ids), 128), np.float32)
        fm = src[:, LEAF_TRIS:LEAF_TRIS + 9 * LEAF_MAX].reshape(-1, 3, 3,
                                                                LEAF_MAX)
        # store (v0, e1=v1-v0, e2=v2-v0): Moller-Trumbore never needs the raw
        # v1/v2, so the kernel saves six [12,128] subtractions per leaf step.
        # f32 subtraction here is bit-identical to doing it in-kernel.
        pk = np.concatenate([fm[:, 0], fm[:, 1] - fm[:, 0],
                             fm[:, 2] - fm[:, 0]], axis=1)  # [R, 9, 12]
        leaf[:, PTRIS:PTRIS + 9 * LEAF_MAX] = pk.reshape(len(leaf_ids), -1)
        leaf[:, PGIDS:PGIDS + LEAF_MAX] = src[:, LEAF_GIDS:LEAF_GID_MAX]
        # zero the gid of empty slots (harmless; they are never selected)
    return PacketTables(jnp.asarray(inner), jnp.asarray(leaf), depth)


def _stack_cap(nf: int, d: int) -> int:
    """Shared-stack capacity for nf fronts of one packet: each front owns at
    most one continuation per tree level plus slack for same-step churn."""
    return nf * (d + 2) + 4


def _kernel(npk: int, nf: int, d: int, ppc: int, cheap: bool,
            interpret: bool):
    def kernel(itab_ref, ltab_ref, rays_ref, t_out, stk_n, stk_m,
               t_s, gid_s, fnd_s, dec_s):
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (ARITY, 1), 0)
        bits16 = (1 << iota16)
        rays = rays_ref[:]   # [ppc*npk*RAY_ROWS, 128]: 16 rows/packet
        S = _stack_cap(nf, d)

        def vector_front(rb, p, i, cur, curmask):
            """Vector work for front i of packet p: fetch node `cur`, run the
            leaf or inner test against the packet's rays, leave the inner
            branch's traversal decision in the SMEM `dec_s` scratch. All
            fronts of a packet share the ray registers and the per-ray
            (t, gid, found) scratch. Measured cost anatomy (tools/kernel_lab
            .py, kernel_lab2.py): the slab/leaf math is ~25-90 ns; the
            child-selection reduction chain below is the ~430 ns per-visit
            wall (serialized cross-lane reductions), while the SMEM round
            trip and the scalar dependence are fully hidden."""
            is_leaf = cur < 0
            alive = cur != DONE

            b = rb
            ox, oy, oz = rays[b + 0:b + 1], rays[b + 1:b + 2], rays[b + 2:b + 3]
            dx, dy, dz = rays[b + 3:b + 4], rays[b + 4:b + 5], rays[b + 5:b + 6]
            ivx, ivy, ivz = (rays[b + 6:b + 7], rays[b + 7:b + 8],
                             rays[b + 8:b + 9])
            livep = rays[b + 10:b + 11] != 0.0
            sohp = rays[b + 11:b + 12] != 0.0
            oivx, oivy, oivz = (rays[b + 12:b + 13], rays[b + 13:b + 14],
                                rays[b + 14:b + 15])

            # ---- leaf branch: 12 field-major Moller-Trumbore tests ----
            @pl.when(alive & is_leaf)
            def _leaf():
                rowL = jnp.transpose(ltab_ref[pl.ds(~cur, 1), :])  # (128,1)
                t = t_s[p:p + 1, :]
                best = gid_s[p:p + 1, :]
                found = fnd_s[p:p + 1, :] != 0
                # dead or satisfied stop-on-hit lanes contribute nothing
                t_scan = jnp.where(livep & ~(sohp & found), t, -BIG)

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
                # determinant cutoff as isect.ray_triangle (kernels.h:134)
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
                leaf_t = jnp.min(ttm, axis=0, keepdims=True)       # [1,128]
                gids = jnp.broadcast_to(jax.lax.bitcast_convert_type(
                    rowL[PGIDS:PGIDS + LEAF_MAX], jnp.int32), (LEAF_MAX, 128))
                leaf_gid = jnp.min(jnp.where(ttm == leaf_t, gids,
                                             jnp.int32(2 ** 30)),
                                   axis=0, keepdims=True)
                take = jnp.any(okm, axis=0, keepdims=True)
                # okm requires tt < t_scan STRICTLY, so a taken leaf is
                # always closer than the carried t — no cross-leaf equal-t
                # tie is possible here (an exact-t tie across leaves keeps
                # the FIRST visited leaf's gid, i.e. visit order decides
                # that measure-zero edge case; within one leaf the lowest
                # gid wins via the leaf_gid min above)
                t_s[p:p + 1, :] = jnp.where(take, leaf_t, t)
                gid_s[p:p + 1, :] = jnp.where(take, leaf_gid, best)
                fnd_s[p:p + 1, :] = (found | take).astype(jnp.int32)

            # ---- inner branch: 16 slab tests (NaN boxes reject empties) ----
            @pl.when(alive & ~is_leaf)
            def _inner():
                rowI = jnp.transpose(itab_ref[pl.ds(cur, 1), :])   # (128,1)
                t = t_s[p:p + 1, :]
                found = fnd_s[p:p + 1, :] != 0
                t_scan = jnp.where(livep & ~(sohp & found), t, -BIG)

                def f16(k):
                    return jnp.broadcast_to(
                        rowI[PBOX0 + k * 16:PBOX0 + (k + 1) * 16],
                        (ARITY, 128))
                lox, loy, loz = f16(0), f16(1), f16(2)
                hix, hiy, hiz = f16(3), f16(4), f16(5)
                # FMA form: one fused op per bound instead of sub+mul
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
                # visited mask varies only per child: compute at (ARITY, 1)
                vis = jnp.bitwise_and(jnp.right_shift(
                    jnp.full((ARITY, 1), 1, jnp.int32) * curmask, iota16), 1)
                chit = chit & (vis == 0)
                anyc = jnp.any(chit, axis=1, keepdims=True)
                if cheap:
                    # any-hit wavefronts don't benefit from nearest-first
                    # ordering: take the lowest-indexed unvisited hit child
                    # and skip the per-child tmin reduction chain
                    iota_sel = jnp.where(anyc, iota16, ARITY)
                else:
                    tsel = jnp.where(chit, tmin, BIG)
                    pc_min = jnp.min(tsel, axis=1, keepdims=True)  # [16,1]
                    key = jnp.where(anyc, pc_min, BIG)
                    kmin = jnp.min(key, axis=0, keepdims=True)
                    iota_sel = jnp.where((key == kmin) & anyc, iota16, ARITY)
                selc = jnp.min(iota_sel)                           # scalar
                sel_onehot = (iota_sel == jnp.broadcast_to(
                    jnp.full((1, 1), 1, jnp.int32) * selc, (ARITY, 1))) & anyc
                refs = jax.lax.bitcast_convert_type(
                    rowI[PREFS:PREFS + ARITY], jnp.int32)
                dec_s[p, 3 * i + 0] = jnp.sum(
                    jnp.where(sel_onehot, refs, 0))                 # selref
                dec_s[p, 3 * i + 1] = jnp.sum(
                    jnp.where(sel_onehot, bits16, 0))               # selbit
                dec_s[p, 3 * i + 2] = jnp.sum(anyc.astype(jnp.int32))  # nhits

        def scalar_packet(p, curs_p, masks_p, sp):
            """One scalar pass over packet p's fronts: descends, pushes, and
            pops against the shared continuation stack. Fronts with no work
            (DONE) pop a pending continuation, which is how the traversal
            fans out from 1 front to nf and how idle fronts steal work."""
            new_cur, new_mask = [], []
            for i in range(nf):
                cur, cmask = curs_p[i], masks_p[i]
                is_leaf = cur < 0
                alive = cur != DONE
                selref = dec_s[p, 3 * i + 0]
                selbit = dec_s[p, 3 * i + 1]
                nhits = dec_s[p, 3 * i + 2]
                descend = alive & ~is_leaf & (nhits > 0)
                do_push = descend & (nhits > 1) & (sp < S)

                @pl.when(do_push)
                def _(cur=cur, cmask=cmask, selbit=selbit, sp=sp):
                    stk_n[p, sp] = cur
                    stk_m[p, sp] = cmask | selbit
                sp = jnp.where(do_push, sp + 1, sp)
                can_pop = ~descend & (sp > 0)
                spr = jnp.where(can_pop, sp - 1, sp)
                pn = stk_n[p, spr]
                pm = stk_m[p, spr]
                nxt = jnp.where(descend, selref,
                                jnp.where(can_pop, pn, DONE))
                nmask = jnp.where(descend, 0, jnp.where(can_pop, pm, 0))
                sp = jnp.where(can_pop, spr, sp)
                new_cur.append(nxt.astype(jnp.int32))
                new_mask.append(nmask.astype(jnp.int32))
            return tuple(new_cur), tuple(new_mask), sp.astype(jnp.int32)

        def run_pair(c):
            """Traverse packet set c (npk packets) to completion. ppc sets
            run sequentially per grid cell: the TPU grid is a sequential loop
            anyway, but fusing ppc sets into one cell amortizes the measured
            ~10+ us per-cell fixed overhead (pipeline ramp + loop setup,
            tools/tpu_step_audit.py) over ppc x the rays — the difference
            between 3 us and 1.1 us per iteration on coherent wavefronts."""
            base = c * npk

            def cond(carry):
                curs = carry[0]
                aliv = None
                for p in range(npk):
                    for i in range(nf):
                        a = curs[p][i] != DONE
                        aliv = a if aliv is None else (aliv | a)
                return aliv

            def body(carry):
                curs, masks, sps, nst = carry
                for p in range(npk):
                    for i in range(nf):
                        vector_front((base + p) * RAY_ROWS, p, i,
                                     curs[p][i], masks[p][i])
                out = [scalar_packet(p, curs[p], masks[p], sps[p])
                       for p in range(npk)]
                return (tuple(r[0] for r in out), tuple(r[1] for r in out),
                        tuple(r[2] for r in out), nst + 1)

            # a packet starts at the root iff any of its lanes participates;
            # front 0 holds the root, the rest fan out through the stack
            for p in range(npk):
                b = (base + p) * RAY_ROWS
                t_s[p:p + 1, :] = rays[b + 9:b + 10]
            gid_s[:, :] = jnp.full((npk, PACKET), -1, jnp.int32)
            fnd_s[:, :] = jnp.zeros((npk, PACKET), jnp.int32)
            starts = []
            for p in range(npk):
                b = (base + p) * RAY_ROWS
                stk_n[p, 0] = 0
                stk_m[p, 0] = 0
                if SKIP_LIVE_CHECK:
                    root = jnp.int32(0)
                else:
                    any_live = jnp.sum((rays[b + 10:b + 11] != 0.0)
                                       .astype(jnp.int32))
                    root = jnp.where(any_live > 0, jnp.int32(0), DONE)
                starts.append(tuple(
                    [root] + [jnp.int32(DONE)] * (nf - 1)))
            init = (tuple(starts),
                    tuple(tuple(jnp.int32(0) for _ in range(nf))
                          for _ in range(npk)),
                    tuple(jnp.int32(0) for _ in range(npk)),
                    jnp.int32(0))
            fin = jax.lax.while_loop(cond, body, init)
            nsteps = fin[3]
            for p in range(npk):
                o = 4 * (base + p)
                t_out[o + 0:o + 1, :] = t_s[p:p + 1, :]
                t_out[o + 1:o + 2, :] = jax.lax.bitcast_convert_type(
                    gid_s[p:p + 1, :], jnp.float32)
                t_out[o + 2:o + 3, :] = fnd_s[p:p + 1, :].astype(jnp.float32)
                # pad slot = while-iteration count for this packet set
                # (step-count diagnostics; engine callers ignore it)
                t_out[o + 3:o + 4, :] = jnp.full(
                    (1, PACKET), 1.0, jnp.float32) * nsteps.astype(jnp.float32)

        for c in range(ppc):
            run_pair(c)
    return kernel


@partial(jax.jit, static_argnames=('depth', 'cheap', 'interpret'))
def _run_packets(itab, ltab, rays, *, depth: int, cheap: bool = False,
                 interpret: bool):
    """rays: f32[G*NPK*RAY_ROWS, 128] fused ray blocks (see RAY_ROWS layout).
    Returns out f32[G*NPK*4, 128]: per packet rows (t, gid bitcast, found,
    pad)."""
    gn = rays.shape[0] // (PPC * NPK * RAY_ROWS)
    grid = (gn,)
    d = depth + 2
    S = _stack_cap(NF, d)
    rayspec = pl.BlockSpec((PPC * NPK * RAY_ROWS, PACKET), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((PPC * NPK * 4, PACKET), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)
    tabspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((gn * PPC * NPK * 4, PACKET),
                                     jnp.float32)
    kern = _kernel(NPK, NF, d, PPC, cheap, interpret)
    scratch = [pltpu.SMEM((NPK, S + 1), jnp.int32),
               pltpu.SMEM((NPK, S + 1), jnp.int32),
               pltpu.VMEM((NPK, PACKET), jnp.float32),
               pltpu.VMEM((NPK, PACKET), jnp.int32),
               pltpu.VMEM((NPK, PACKET), jnp.int32),
               pltpu.SMEM((NPK, 3 * NF + 1), jnp.int32)]
    return pl.pallas_call(
        kern,
        grid=grid,
        out_shape=out_shape,
        in_specs=[tabspec, tabspec, rayspec],
        out_specs=outspec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(itab, ltab, rays)


def traverse_packet(scene, tables: PacketTables, ro, rd, t_max=None,
                    active=None, any_hit: bool = False, stop_on_hit=None,
                    order=None, interpret: bool = False) -> Hit:
    """Contract-compatible with traverse/traverse_wide (same Hit, same
    sphere/plane prepass); triangles via the packet kernel.

    `order` (i32[B] permutation, optional): rays are traversed in this order
    so the caller can group them into coherent 128-ray packets (morton +
    octant sort for bounce wavefronts); results return in original order.
    The permutation costs one 48-byte-row gather in and one scatter out —
    cheap next to the traversal it accelerates."""
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

    inv = isect.safe_inv_dir(rd)
    # ray-major field matrix [B, 16]:
    # (ox oy oz dx dy dz ivx ivy ivz t0 live soh oivx oivy oivz pad)
    M = jnp.concatenate([
        ro, rd, inv, t0[:, None],
        live.astype(jnp.float32)[:, None],
        stop_on_hit.astype(jnp.float32)[:, None],
        ro * inv, jnp.zeros_like(t0)[:, None]], axis=1)
    if order is not None:
        M = M[order]

    lanes_per_g = PACKET * NPK * PPC
    Bp = -(-B // lanes_per_g) * lanes_per_g
    M = jnp.pad(M, ((0, Bp - B), (0, 0)))     # padded rays: live=0 -> inert
    # block-pack: [G*PPC*NPK, 128 rays, 16 fields] -> [., 16, 128]
    rays = jnp.swapaxes(M.reshape(-1, PACKET, RAY_ROWS), -1, -2)
    rays = rays.reshape(-1, PACKET)

    outk = _run_packets(tables.inner, tables.leaf, rays,
                        depth=tables.depth,
                        cheap=bool(any_hit) or CHEAP_ALL,
                        interpret=interpret)
    outk = outk.reshape(-1, 4, PACKET)
    O = jnp.swapaxes(outk, -1, -2).reshape(-1, 4)[:B]    # [B, 4] ray-major
    if order is not None:
        # un-permute with an inverse-order GATHER (argsort + row gather);
        # a scatter costs ~5x more than a gather on TPU
        O = O[jnp.argsort(order)]
    tk = O[:, 0]
    gidk = jax.lax.bitcast_convert_type(O[:, 1], jnp.int32)
    hitk = O[:, 2] != 0

    ptype = jnp.where(hitk, PRIM_TRIANGLE, ptype0)
    pid = jnp.where(hitk, gidk, pid0)
    intersected = active & (hitk | found0)
    return Hit(t=tk, prim_type=ptype, prim_id=pid, intersected=intersected)
