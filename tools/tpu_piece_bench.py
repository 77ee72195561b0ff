import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.ops.traverse import traverse
from cuda_pathtracer_tpu.models.shading import shade, connect, TraceState
from cuda_pathtracer_tpu.models.guiding import init_radiance_state
from cuda_pathtracer_tpu.core.camera import Camera, generate_rays
from cuda_pathtracer_tpu.core import rng as _rng

print("imports done", flush=True)
scene = get_scene('sibenik', asset_dirs=['/root/reference'])
print("scene ok", flush=True)
arrays = scene.to_device(); dyn = scene.dynamic_arrays()
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
W,H = 640,480; B = W*H
lanes = jnp.arange(B, dtype=jnp.int32); xs = lanes % W; ys = lanes // W
seeds = _rng.get_seed(xs, ys, 0, W)
ro, rd, _ = generate_rays(cam, xs, ys, seeds, W, H)
print("rays ok", flush=True)
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))

def t_it(name, f, *args, n=3):
    out = f(*args); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1e3:.1f} ms", flush=True)

f_trav = jax.jit(lambda ro, rd: traverse(arrays, dyn.world, ro, rd))
t_it("traverse closest 307k", f_trav, ro, rd)

hit = f_trav(ro, rd)
st = TraceState.clear(B)
f_shade = jax.jit(lambda ro, rd, hit, st: shade(
    arrays, dyn, ro, rd, hit, st, jnp.ones(B, bool), xs, ys,
    jnp.uint32(1), jnp.uint32(1), jnp.int32(0), True, True, radiance, W))
t_it("shade 307k", f_shade, ro, rd, hit, st)

out = f_shade(ro, rd, hit, st)
f_conn = jax.jit(lambda out: connect(arrays, dyn, out))
t_it("connect (any-hit shadow)", f_conn, out)

from cuda_pathtracer_tpu.models.guiding import update_radiance_state, SampleCache
sc = SampleCache.empty(B)
f_guide = jax.jit(lambda rad, sc, e: update_radiance_state(rad, sc, e, jnp.asarray(True)))
t_it("guiding update", f_guide, radiance, sc, st.accucolor)
