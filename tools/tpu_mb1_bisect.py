"""Bisect the mb=1 sample cost at 1080p-band scale: the phase probes account
for ~60 ms (extend 35 + shadow 16 + shade 7) of the measured 180 ms — find
the rest by timing progressively larger slices of the bounce-0 pipeline.

PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_mb1_bisect.py
"""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.core import rng as _rng
from cuda_pathtracer_tpu.models.pathtracer import (render_sample, _sort_order,
                                                   _tile_coords)
from cuda_pathtracer_tpu.models.shading import shade, TraceState
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.models.guiding import (init_radiance_state,
                                                update_radiance_state,
                                                SampleCache)
from cuda_pathtracer_tpu.ops.dispatch import trace

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 216
B = W * H
wd = -(-scene.wide_depth // 4) * 4
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
lum, alb = film.clear_accumulators(B)
lanes = jnp.arange(B, dtype=jnp.int32)
xs, ys = _tile_coords(lanes, W)


def timeit(name, makef, *args, K=3):
    f = jax.jit(makef)
    out = f(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    best = 1e9
    for _ in range(K):
        s = time.perf_counter()
        out = f(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - s)
    print(f'{name}: {(best)*1e3:8.1f} ms', flush=True)
    return out


def gen(rand_idx):
    seeds = _rng.get_seed(xs, ys, rand_idx, W)
    ro, rd, _ = cam_mod.generate_rays(cam, xs, ys, seeds, W, 1080)
    return ro, rd


def stage_gen(r):
    return gen(r)[0]


def stage_trace(r):
    ro, rd = gen(r)
    alive = jnp.ones(B, bool)
    order = _sort_order(ro, rd, dyn.bounds, alive, direction_major=True)
    return trace(arrays, dyn, ro, rd, active=alive, wide_depth=wd,
                 order=order).t


def stage_shade(r):
    ro, rd = gen(r)
    alive = jnp.ones(B, bool)
    order = _sort_order(ro, rd, dyn.bounds, alive, direction_major=True)
    hit = trace(arrays, dyn, ro, rd, active=alive, wide_depth=wd, order=order)
    st = TraceState.clear(B)
    out = shade(arrays, dyn, ro, rd, hit, st, alive, xs, ys, r,
                jnp.uint32(1), jnp.int32(0), True, True, radiance, W)
    return out.ray_o


def stage_nee(r):
    ro, rd = gen(r)
    alive = jnp.ones(B, bool)
    order = _sort_order(ro, rd, dyn.bounds, alive, direction_major=True)
    hit = trace(arrays, dyn, ro, rd, active=alive, wide_depth=wd, order=order)
    st = TraceState.clear(B)
    out = shade(arrays, dyn, ro, rd, hit, st, alive, xs, ys, r,
                jnp.uint32(1), jnp.int32(0), True, True, radiance, W)
    sdest = out.shadow_o + out.shadow_d * out.shadow_tmax[:, None]
    sorder = _sort_order(sdest, out.shadow_d, dyn.bounds, out.shadow_active)
    sh = trace(arrays, dyn, out.shadow_o, out.shadow_d,
               t_max=out.shadow_tmax, active=out.shadow_active,
               any_hit=True, wide_depth=wd, order=sorder)
    add = out.shadow_active & ~sh.intersected
    return out.state.accucolor + jnp.where(add[..., None], out.state.light, 0)


def stage_full(r):
    return render_sample(arrays, dyn, cam, radiance, lum, alb,
                         jnp.uint32(1), r, jnp.asarray(True),
                         nee=True, cache_on=True, max_bounces=1,
                         width=W, height=H, full_height=1080,
                         wide_depth=wd, tile_order=True)[0]


def stage_guide_only(r):
    # the post-loop work alone: guiding segment-sum + EMA over a synthetic
    # full-width cache + film accumulate
    acc = jnp.full((B, 3), 0.1, jnp.float32) * (1.0 + r.astype(jnp.float32)
                                                * 1e-9)
    cache = SampleCache(
        stype=jnp.zeros((3, B), jnp.int32),
        tri=jnp.zeros((3, B), jnp.int32) + (lanes % 1000)[None, :],
        bucket=jnp.zeros((3, B), jnp.int32),
        cum_mask=jnp.ones((3, B, 3), jnp.float32))
    r2 = update_radiance_state(radiance, cache, acc, jnp.asarray(True))
    l2 = film.accumulate(lum, acc, n_samples=1.0)
    return l2.sum() + r2.cache.sum()


r0 = jnp.uint32(7)
timeit('generate         ', stage_gen, r0)
timeit('+sort+trace      ', stage_trace, r0)
timeit('+shade           ', stage_shade, r0)
timeit('+nee trace       ', stage_nee, r0)
timeit('full mb=1 sample ', stage_full, r0)
timeit('guiding+film only', stage_guide_only, r0)
