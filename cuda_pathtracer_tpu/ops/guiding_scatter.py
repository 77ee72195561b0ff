"""Pallas segmented-sum kernel for the guiding bucket update.

The guiding update (kernel_update_buckets, /root/reference/src/kernels.h:863-882)
is a scatter-add of L = MAX_CACHE_DEPTH * n_lanes (energy, weight) pairs into
S = n_tris * 8 + 1 segments. XLA lowers `segment_sum` to a per-update serial
scatter (~40-60 ns per update row regardless of masking or sorting — measured
in tools/guiding_scatter_bench.py), which at 1.24 M updates costs ~50 ms per
band-sample: the single largest op in the converge profile.

This kernel replaces it with a sort + dense-window accumulation that runs at
VPU/MXU rate instead of per-row scatter rate:

  1. XLA sorts (seg, energy, weight) by seg.
  2. The sorted stream is processed in tiles of 1024 updates. For each tile a
     while-loop makes one PASS per 2048-segment aligned window: the pass
     builds a dense (16, 256) accumulation block for segments
     [window, window + 2048) via one-hot compare + MXU matmuls, then adds it
     into the output table with a single dynamic row-slice RMW. Entries past
     the window (possible when the tile's segment span exceeds 2048 — sparse
     regions of the table) are picked up by the next pass, whose window
     starts at the first unconsumed entry. Total passes across all tiles is
     bounded by n_tiles + table_span / 2048, so cost scales with the table,
     never with pathological update distributions.

The table is stored packed as (rows, 256): segment s lives at
[s // 128, s % 128] (energy) and [s // 128, 128 + s % 128] (weight) — a
natively-tileable layout; the (S, 2) layout XLA uses would pad each 2-float
row to a full (8, 128) VMEM tile (~650 MB).

Addition order differs from XLA's serial scatter, so results match
segment_sum to float tolerance, not bit-exactly (tests/test_guiding_scatter.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024          # updates consumed per kernel tile (8 x 128 rows)
WIN = 2048           # segment window per pass (16 output rows of 128)
WROWS = WIN // 128   # output rows RMW'd per pass


def _kernel(n_tiles: int, s_rows: int):
    # named so device traces attribute guiding cost distinctly (bench.py
    # reports its share vs the reference's 2.3% figure, README.md:119-124)
    def _guide_scatter(seg_ref, ve_ref, vw_ref, out_ref, sc):
        out_ref[...] = jnp.zeros((s_rows, 256), jnp.float32)
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (128, 16), 1)
        iota256 = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 1)
        col256 = iota256 & 127                      # lane % 128 pattern
        is_e = (iota256 < 128)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

        def tile_body(t, _):
            r0 = t * 8
            # hoisted per-row transposes: entry (r, c) of the tile is sorted
            # position r*128 + c; transposed columns put the 128 entries of
            # one row on sublanes so one-hot matmuls can contract over them
            segT = [jnp.transpose(seg_ref[pl.ds(r0 + r, 1), :])
                    for r in range(8)]              # 8 x (128, 1) i32
            veT = [jnp.transpose(ve_ref[pl.ds(r0 + r, 1), :])
                   for r in range(8)]
            vwT = [jnp.transpose(vw_ref[pl.ds(r0 + r, 1), :])
                   for r in range(8)]

            def cond(carry):
                return carry < TILE

            def body(cut):
                # lo = seg[cut]: masked-sum extraction routed through SMEM
                lo_acc = jnp.zeros((128, 1), jnp.int32)
                for r in range(8):
                    linT = lane128 + r * 128
                    lo_acc = lo_acc + jnp.where(linT == cut, segT[r], 0)
                sc[0, 0] = jnp.sum(lo_acc)
                lo = sc[0, 0]
                base = (lo // WIN) * WIN            # aligned window start
                row0 = (lo // WIN) * WROWS

                acc = jnp.zeros((16, 256), jnp.float32)
                cnt_acc = jnp.zeros((128, 1), jnp.int32)
                for r in range(8):
                    linT = lane128 + r * 128
                    relT = segT[r] - base
                    inrT = (linT >= cut) & (relT < WIN)
                    cnt_acc = cnt_acc + inrT.astype(jnp.int32)
                    roh = jnp.where((relT >> 7) == iota16,
                                    inrT.astype(jnp.float32), 0.0)
                    scale = jnp.where(is_e, veT[r], vwT[r])
                    cohv = jnp.where(((relT & 127) == col256) & inrT,
                                     scale, 0.0)
                    # HIGHEST: the default TPU matmul rounds operands to
                    # bf16 (8-bit mantissa -> ~4e-3 relative error on the
                    # accumulated energies); the 3-pass f32 decomposition is
                    # exact for the one-hot side and full f32 for values
                    acc = acc + jax.lax.dot_general(
                        roh, cohv, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                sc[0, 1] = jnp.sum(cnt_acc)
                cur = out_ref[pl.ds(row0, WROWS), :]
                out_ref[pl.ds(row0, WROWS), :] = cur + acc
                return cut + sc[0, 1]

            jax.lax.while_loop(cond, body, jnp.int32(0))
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)
    return _guide_scatter


@partial(jax.jit, static_argnames=('num_segments', 'interpret'))
def segment_sum_pairs(val_e, val_w, seg, *, num_segments: int,
                      interpret: bool = False):
    """segment_sum of two f32 streams keyed by `seg`, via the Pallas dense
    window kernel. Equivalent (to float tolerance) to

        jax.ops.segment_sum(stack([val_e, val_w], -1), seg,
                            num_segments=num_segments)

    seg values must be in [0, num_segments). Returns (sum_e, sum_w), each
    f32[num_segments].
    """
    L = seg.shape[0]
    n_tiles = -(-L // TILE)
    pad = n_tiles * TILE - L
    if pad:
        # pad with the max segment id and zero values: sorts to the end,
        # accumulates nothing
        seg = jnp.concatenate(
            [seg, jnp.full((pad,), num_segments - 1, seg.dtype)])
        zero = jnp.zeros((pad,), jnp.float32)
        val_e = jnp.concatenate([val_e, zero])
        val_w = jnp.concatenate([val_w, zero])
    seg_s, e_s, w_s = jax.lax.sort(
        (seg.astype(jnp.int32), val_e, val_w), num_keys=1)

    s_rows = -(-num_segments // 128) + WROWS   # slack so the last window fits
    out = pl.pallas_call(
        _kernel(n_tiles, s_rows),
        name='_guide_scatter',
        out_shape=jax.ShapeDtypeStruct((s_rows, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 8), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(seg_s.reshape(n_tiles * 8, 128),
      e_s.reshape(n_tiles * 8, 128),
      w_s.reshape(n_tiles * 8, 128))
    sum_e = out[:, :128].reshape(-1)[:num_segments]
    sum_w = out[:, 128:].reshape(-1)[:num_segments]
    return sum_e, sum_w
