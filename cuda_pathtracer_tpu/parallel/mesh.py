"""Multi-chip rendering: pixel-row sharding over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md §2: no NCCL/MPI anywhere); frames are
embarrassingly parallel over pixels, so the TPU scaling axis is pure data
parallelism: the pixel dimension is sharded across the mesh, the scene arrays
are replicated, and no collective is needed during a sample — only the display
gather at frame end rides ICI (jnp arrays assembled from shards by jax).

Because the RNG seeds derive from pixel coordinates (core/rng.py), a sharded
render is bit-identical to the single-chip render AT THE SAME BAND GEOMETRY
(tested in tests/test_parallel.py). Caveat: tail narrowing compacts survivors
per shard, so a configuration whose shard width crosses the TAIL_MIN_LANES
gate, or whose survivors need a different number of tail rounds than the
single-chip run, draws rand_idx values in a different order — unbiased and
converging to the same image, but not bit-equal sample by sample.

`shard_render_sample` wraps models.pathtracer.render_sample with shard_map;
lane counts must divide the mesh size (pad the height if needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.pathtracer import render_sample as _render_sample
from ..models import film


def make_mesh(devices=None, axis_name: str = 'px') -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_render_sample(mesh: Mesh, *, nee: bool, cache_on: bool,
                        max_bounces: int, width: int, height: int,
                        wide_depth: int = 0):
    """Build a pjit-ted sharded sample function.

    Shards the pixel axis of the accumulators across `mesh`; scene/dyn/camera
    and the radiance cache are replicated. The guiding segment-sum runs per
    shard and is all-reduced (psum) so every chip holds the same cache — the
    only collective in the frame.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert height % n_dev == 0, \
        f'height {height} must divide the mesh size {n_dev}'
    shard_h = height // n_dev

    def per_shard(scene, dyn, camera, radiance, lum, alb,
                  sample_idx, rand_idx, guide_enabled, row0):
        # render this shard's pixel rows with globally-correct pixel coords:
        # the sub-render uses a local lane space; we rebuild global x/y by
        # offsetting the row index, which the pixel-seeded RNG turns into
        # exactly the same streams as the single-chip render. The guiding
        # bucket sums are psum'd over the mesh BEFORE the EMA (guide_axis),
        # so every chip applies the identical cache update.
        lum2, alb2, rad2, ridx, rays = _render_sample(
            scene, dyn, camera, radiance, lum, alb,
            sample_idx, rand_idx, guide_enabled,
            nee=nee, cache_on=cache_on, max_bounces=max_bounces,
            width=width, height=shard_h, row_offset=row0[0],
            full_height=height, guide_axis=axis, wide_depth=wide_depth)
        # shards may exit their bounce loop at different depths; the global
        # stream counter is the max (matching the single-chip global any())
        ridx = jax.lax.pmax(ridx, axis)
        rays = jax.lax.psum(rays, axis)
        return lum2, alb2, rad2, ridx, rays

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(), P(), P(), P(axis)),
        out_specs=(P(axis), P(axis), P(), P(), P()),
        check_vma=False)

    row0 = jnp.arange(n_dev, dtype=jnp.int32) * shard_h

    @jax.jit
    def run(scene, dyn, camera, radiance, lum, alb,
            sample_idx, rand_idx, guide_enabled):
        return sharded(scene, dyn, camera, radiance, lum, alb,
                       sample_idx, rand_idx, guide_enabled, row0)

    return run


class ShardedPathtracer:
    """Multi-chip progressive renderer: same host API as models.Pathtracer
    but with the pixel rows sharded over every device in the mesh."""

    def __init__(self, scene, width: int = 640, height: int = 480,
                 mesh: Mesh | None = None, skydome: str | None = None):
        from ..constants import MAX_RAY_DEPTH
        self.scene = scene
        self.width = width
        self.height = height
        self.mesh = mesh if mesh is not None else make_mesh()
        self.nee = True
        self.cache = True
        self.arrays = scene.to_device(skydome=skydome)
        self.dyn = scene.dynamic_arrays()
        n_tris = int(self.arrays.tri_mat.shape[0])
        from ..models.guiding import init_radiance_state
        self.radiance = init_radiance_state(n_tris)
        self.lum, self.alb = film.clear_accumulators(width * height)
        self.sample_idx = 0
        self.rand_idx = 0
        self.rays_traced = 0.0
        self._fns = {}
        self._max_ray_depth = MAX_RAY_DEPTH

    def _fn(self, max_bounces):
        wd = -(-self.scene.wide_depth // 4) * 4 if self.scene.wide_depth else 0
        key = (self.nee, self.cache, max_bounces, wd)
        if key not in self._fns:
            self._fns[key] = shard_render_sample(
                self.mesh, nee=self.nee, cache_on=self.cache,
                max_bounces=max_bounces, width=self.width, height=self.height,
                wide_depth=wd)
        return self._fns[key]

    def render(self, camera, current_time: float = 0.0,
               frame_time: float = 0.0, should_clear: bool = False):
        if should_clear:
            self.dyn = self.scene.dynamic_arrays()
            self.lum, self.alb = film.clear_accumulators(self.width * self.height)
            self.sample_idx = 0
            self.rand_idx = 0
        n_samples = self.scene.interactive_depth if should_clear else 1
        max_bounces = (self.scene.interactive_depth if should_clear
                       else self._max_ray_depth)
        if not self.nee and should_clear:
            max_bounces += 1
        fn = self._fn(max_bounces)
        for _ in range(n_samples):
            guide = jnp.asarray((not should_clear) and self.cache
                                and self.sample_idx < 100)
            self.lum, self.alb, self.radiance, ridx, rays = fn(
                self.arrays, self.dyn, camera, self.radiance,
                self.lum, self.alb,
                jnp.asarray(self.sample_idx, jnp.uint32),
                jnp.asarray(self.rand_idx, jnp.uint32), guide)
            # keep counters as device scalars: no host sync per sample, so
            # samples pipeline asynchronously like the reference's stream
            self.rand_idx = ridx
            self.sample_idx += 1
            self.rays_traced = self.rays_traced + rays

    def finish(self):
        self.lum.block_until_ready()

    def image(self, blur: bool = False):
        return film.display(self.lum, self.alb, float(self.sample_idx),
                            self.width, self.height, blur=blur)

    def energy(self):
        total, has_nan, has_neg = film.energy_audit(self.lum)
        return float(total), bool(has_nan), bool(has_neg)
