"""Pallas TPU kernel for the luminance Gaussian filter.

The reference runs the filter as two GL compute shaders over the accumulation
textures (gauss_horz 7-tap / gauss_vert 8-tap with the sample-count-dependent
spread, src/main.cpp:111-171), bouncing an intermediate texture
(luminanceHorz) through memory between them. Here both passes and the albedo
modulation fuse into ONE Pallas kernel with the whole frame resident in VMEM:
one HBM read of the two accumulators, one HBM write of the filtered result,
no intermediate traffic at all.

This is the natural Pallas fit in this renderer — a dense static-shape
stencil with zero gathers (the traversal's random-access patterns don't lower
to Mosaic; see PERF.md). The pure-XLA implementation in models/film.py is the
semantics reference and the fallback for frames that exceed the VMEM budget
(film.blur_luminance dispatches automatically).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PI

H_TAPS = tuple(range(-3, 4))   # gauss_horz: i = -3..3  (main.cpp:128)
V_TAPS = tuple(range(-4, 4))   # gauss_vert: i = -4..3  (main.cpp:159)

# input (2 frames) + output + temporaries must fit VMEM (~16 MB)
VMEM_BUDGET_PIXELS = 640 * 640


def _weights(taps, spread):
    return [jnp.exp(-(i * i) * 0.5 * spread) / jnp.sqrt(2.0 * PI)
            for i in taps]


def _blur_kernel(lum_ref, alb_ref, n_ref, out_ref, *, width: int,
                 height: int):
    # planes-first [3, H, W] layout: H x W land on the (sublane, lane) tile
    # grid; a channels-last layout would get its 3-wide minor dim padded to
    # 128 lanes by Mosaic (42x VMEM)
    n = n_ref[0]
    spread = jnp.maximum(0.7, n / 200.0)

    c = (lum_ref[...] / jnp.maximum(alb_ref[...], 0.001)) * n  # [3, H, W]

    # horizontal pass with the reference's edge renormalization
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2)
    hsum = jnp.zeros_like(c)
    hw = jnp.zeros((1, 1, width), jnp.float32)
    for i, w in zip(H_TAPS, _weights(H_TAPS, spread)):
        shifted = pltpu.roll(c, (-i) % width, 2)  # roll needs shift >= 0
        valid = ((col + i >= 0) & (col + i < width)).astype(jnp.float32)
        hsum = hsum + shifted * valid * w
        hw = hw + valid * w
    h = hsum / hw

    # vertical pass
    row = jax.lax.broadcasted_iota(jnp.int32, (1, height, 1), 1)
    vsum = jnp.zeros_like(h)
    vw = jnp.zeros((1, height, 1), jnp.float32)
    for i, w in zip(V_TAPS, _weights(V_TAPS, spread)):
        shifted = pltpu.roll(h, (-i) % height, 1)
        valid = ((row + i >= 0) & (row + i < height)).astype(jnp.float32)
        vsum = vsum + shifted * valid * w
        vw = vw + valid * w
    out_ref[...] = vsum / vw


def fits_vmem(width: int, height: int) -> bool:
    return width * height <= VMEM_BUDGET_PIXELS


@partial(jax.jit, static_argnames=('width', 'height', 'interpret'))
def blur_luminance_pallas(lum, alb, n_samples, *, width: int, height: int,
                          interpret: bool = False):
    """Drop-in for film.blur_luminance: [H*W, >=3] accumulators in, blurred
    luminance [H*W, 3] out (implicit w = n_samples)."""
    img_l = lum[:, :3].reshape(height, width, 3).transpose(2, 0, 1)
    img_a = alb[:, :3].reshape(height, width, 3).transpose(2, 0, 1)
    n = jnp.asarray(n_samples, jnp.float32).reshape(1)

    # one grid step per color plane keeps live VMEM ~6x one plane
    out = pl.pallas_call(
        partial(_blur_kernel, width=width, height=height),
        grid=(3,),
        in_specs=[
            pl.BlockSpec((1, height, width), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, height, width), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, height, width), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, height, width), jnp.float32),
        interpret=interpret,
    )(img_l, img_a, n)
    return out.transpose(1, 2, 0).reshape(-1, 3)
