"""Primitive intersection library, vectorized over ray batches.

Behavioral mirror of the HYBRID intersection functions (src/kernels.h:120-200):
Möller–Trumbore triangles with the same 1e-4 determinant cutoff, quadratic
spheres, plane tests with the same EPS guard, and the slab test with the
t-early-out of `boxtest`. Every function broadcasts over leading batch axes so
one call covers the whole wavefront on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm
from ..constants import EPS


def ray_triangle(ro, rd, v0, v1, v2):
    """Möller–Trumbore (src/kernels.h:169-188).

    Shapes: ro/rd [..., 3]; v0/v1/v2 [..., 3] broadcastable to the ray shape.
    Returns (hit bool[...], t, u, v).
    """
    v0v1 = v1 - v0
    v0v2 = v2 - v0
    pvec = vm.cross(rd, v0v2)
    det = vm.dot(v0v1, pvec)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-4, 1.0, det)
    tvec = ro - v0
    u = vm.dot(tvec, pvec) * inv_det
    qvec = vm.cross(tvec, v0v1)
    v = vm.dot(rd, qvec) * inv_det
    t = vm.dot(v0v2, qvec) * inv_det
    hit = ((jnp.abs(det) >= 1e-4)
           & (u >= 0.0) & (u <= 1.0)
           & (v >= 0.0) & (u + v <= 1.0)
           & (t > 0.0))
    return hit, t, u, v


def ray_sphere(ro, rd, center, radius):
    """src/kernels.h:120-135. Returns (hit, t)."""
    oc = ro - center
    a = vm.dot(rd, rd)
    b = 2.0 * vm.dot(rd, oc)
    c = vm.dot(oc, oc) - radius * radius
    det = b * b - 4.0 * a * c
    sdet = jnp.sqrt(jnp.maximum(det, 0.0))
    denom = 2.0 * jnp.where(jnp.abs(a) < 0.001, 1.0, a)
    tmin = (-b - sdet) / denom
    tmax = (-b + sdet) / denom
    t = jnp.where(tmin < 0.0, tmax, tmin)
    hit = (jnp.abs(a) >= 0.001) & (det >= 0.0) & (tmax > 0.0)
    return hit, t


def ray_plane(ro, rd, normal, d):
    """src/kernels.h:137-143. Returns (hit, t). `rd` must be normalized (the
    reference normalizes defensively; wavefront directions already are)."""
    q = vm.dot(vm.normalize(rd), normal)
    qq = jnp.where(jnp.abs(q) < EPS, 1.0, q)
    t = -(vm.dot(ro, normal) + d) / qq
    hit = (jnp.abs(q) >= EPS) & (t > 0.0)
    return hit, t


def safe_inv_dir(rd):
    """Reciprocal direction with tiny-component clamping so the slab test
    never produces 0*inf NaNs (the reference relies on IEEE inf semantics)."""
    tiny = 1e-20
    sign = jnp.where(rd >= 0.0, 1.0, -1.0)
    denom = jnp.where(jnp.abs(rd) < tiny, sign * tiny, rd)
    return 1.0 / denom


def slab_test(ro, inv_rd, vmin, vmax, t_best):
    """Box slab test with t-early-out (boxtest, src/kernels.h:145-200).
    Returns (hit bool, tmin)."""
    t0 = (vmin - ro) * inv_rd
    t1 = (vmax - ro) * inv_rd
    tmin = vm.max_comp(jnp.minimum(t0, t1))
    tmax = vm.min_comp(jnp.maximum(t0, t1))
    hit = (tmax >= jnp.maximum(0.0, tmin)) & (tmin < t_best)
    return hit, tmin
