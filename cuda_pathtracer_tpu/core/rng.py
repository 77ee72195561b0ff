"""Counter-based RNG with exact parity to the reference's hash/xorshift chain.

Reference semantics (src/use_cuda.h:61-101, src/kernels.h:20-29, src/types.h:679-687):
  * per-(x, y, frame) seed: ``wang_hash(wang_hash(x + W*y) + randIdx)``
  * stream: xorshift32, each draw maps the new seed to [0,1) via * 2^-32
  * quasirandom override: on the very first sample (sampleIdx < 1) draws come
    from ``fmod(blueNoiseSample + PI * randIdx++, 1)`` where blueNoiseSample is a
    per-pixel blue-noise texture read.

Everything is functional: a draw returns (value, new_state). All lanes of a
wavefront draw in lockstep, so one draw is one VPU op over the whole batch.
Because seeds derive from pixel coordinates only, a pixel-sharded multi-chip
render produces bit-identical streams to the single-chip render.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import PI

_U32 = jnp.uint32


def wang_hash(seed):
    """src/use_cuda.h:61-69."""
    seed = jnp.asarray(seed, _U32)
    seed = (seed ^ _U32(61)) ^ (seed >> _U32(16))
    seed = seed * _U32(9)
    seed = seed ^ (seed >> _U32(4))
    seed = seed * _U32(0x27d4eb2d)
    seed = seed ^ (seed >> _U32(15))
    return seed


def xorshift(seed):
    """George Marsaglia xorshift32 (src/use_cuda.h:71-78)."""
    seed = jnp.asarray(seed, _U32)
    seed = seed ^ (seed << _U32(13))
    seed = seed ^ (seed >> _U32(17))
    seed = seed ^ (seed << _U32(5))
    return seed


def rand_uniform(seed):
    """Advance the xorshift stream; returns (value in [0,1), new_seed).

    Uses the same 2.3283064365387e-10 (= 2^-32) scaling as src/use_cuda.h:80-85.
    """
    seed = xorshift(seed)
    return seed.astype(jnp.float32) * jnp.float32(2.3283064365387e-10), seed


def get_seed(x, y, rand_idx, width):
    """Per-pixel per-frame seed (src/use_cuda.h:98-101)."""
    x = jnp.asarray(x, _U32)
    y = jnp.asarray(y, _U32)
    return wang_hash(wang_hash(x + _U32(width) * y) + jnp.asarray(rand_idx, _U32))


class RandState(NamedTuple):
    """Per-lane RNG state carried through a shade pass.

    Mirrors the reference RandState (src/types.h:679-687): an xorshift seed plus
    the blue-noise quasirandom channel used for the first sample of a frame.
    ``sample_idx`` is a scalar (traced) sample counter; ``bn_sample`` is the
    per-pixel blue-noise texture value, ``bn_idx`` the per-lane draw counter.
    """
    seed: jnp.ndarray       # u32[...]
    bn_sample: jnp.ndarray  # f32[...] blue-noise texture sample for this pixel
    bn_idx: jnp.ndarray     # u32[...] quasirandom draw counter
    sample_idx: jnp.ndarray  # u32 scalar — frame sample index


def rand(state: RandState):
    """One draw per lane with the reference's blue-noise gating
    (src/kernels.h:20-29): sampleIdx < 1 -> quasirandom, else xorshift."""
    qr = jnp.mod(state.bn_sample + jnp.float32(PI) * state.bn_idx.astype(jnp.float32),
                 jnp.float32(1.0))
    ur, new_seed = rand_uniform(state.seed)
    use_qr = state.sample_idx < _U32(1)
    val = jnp.where(use_qr, qr, ur)
    return val, RandState(new_seed, state.bn_sample,
                          state.bn_idx + _U32(1), state.sample_idx)


def make_state(seed, bn_sample=None, sample_idx=0):
    seed = jnp.asarray(seed, _U32)
    if bn_sample is None:
        bn_sample = jnp.zeros(seed.shape, jnp.float32)
        # force the xorshift path when no blue noise is wired up
        sample_idx = 1 if sample_idx == 0 else sample_idx
    return RandState(seed, jnp.asarray(bn_sample, jnp.float32),
                     jnp.zeros(seed.shape, _U32),
                     jnp.asarray(sample_idx, _U32))
