"""Phase breakdown of one converge sample at 1080p band scale (414k lanes):
extend trace / shadow trace / shade / argsort / full bounce. Each phase loops
K times inside one jit (the ~30 ms per-call tunnel RTT is subtracted by the
loop)."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from functools import partial
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.models.pathtracer import _sort_order
from cuda_pathtracer_tpu.models.shading import shade, TraceState
from cuda_pathtracer_tpu.models.guiding import init_radiance_state
from cuda_pathtracer_tpu.ops.dispatch import trace

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 216
B = W * H
ys, xs = np.mgrid[0:H, 0:W]
xsj = jnp.asarray(xs.ravel()); ysj = jnp.asarray(ys.ravel())
ro, rd = cam_mod.generate_rays_simple(cam, xsj, ysj, W, 1080)
wd = -(-scene.wide_depth // 4) * 4
radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))

rng = np.random.default_rng(1)
# fake bounce wavefront: random hemisphere dirs from primary hits
hit0 = jax.jit(lambda a, b: trace(arrays, dyn, a, b, wide_depth=wd))(ro, rd)
hp = np.asarray(ro) + np.asarray(rd) * (np.asarray(hit0.t)[:, None] - 1e-3)
d2 = rng.normal(size=(B, 3)).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
flip = (d2 * np.asarray(rd)).sum(1) > 0
d2[flip] = -d2[flip]
ro2, rd2 = jnp.asarray(hp), jnp.asarray(d2)
alive = jnp.ones(B, bool)

K = 12
def timeit(name, makef, *args):
    f = jax.jit(makef)
    out = f(*args); jax.tree.leaves(out)[0].block_until_ready()
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = 1e9
    for _ in range(3):
        s = time.perf_counter()
        out = f(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - s)
    per = (best - 0.030) / K * 1e3
    print(f'{name}: {per:8.2f} ms/iter   ({best*1e3:.0f} ms for {K})')

def loop(fn):
    def run(*args):
        def body(i, acc):
            r = fn(*args, i)
            return acc + jax.tree.leaves(r)[0].ravel()[:1].astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return run

def vary(a, i):
    # loop-variant perturbation (prevents XLA from hoisting the body)
    return a + (i.astype(jnp.float32) % 7) * 1e-6

timeit('extend primary   ', loop(lambda a, b, i: trace(
    arrays, dyn, vary(a, i), b, wide_depth=wd,
    order=_sort_order(vary(a, i), b, dyn.bounds)).t), ro, rd)
timeit('extend bounce sort', loop(lambda a, b, i: trace(
    arrays, dyn, vary(a, i), b, wide_depth=wd,
    order=_sort_order(vary(a, i), b, dyn.bounds)).t), ro2, rd2)
timeit('extend bounce raw ', loop(lambda a, b, i: trace(
    arrays, dyn, vary(a, i), b, wide_depth=wd).t), ro2, rd2)
timeit('argsort keys      ', loop(lambda a, b, i: _sort_order(
    vary(a, i), b, dyn.bounds)), ro2, rd2)
# shadow rays as shade emits them: origin ON the light, direction to surface
light_p = np.array([-4.0, 8.0, 0.0], np.float32)
sd = hp - light_p[None, :]
dist = np.linalg.norm(sd, axis=1, keepdims=True)
sdn = (sd / dist).astype(np.float32)
so = jnp.asarray(np.broadcast_to(light_p, (B, 3)).copy() + sdn * 0.01)
sdj = jnp.asarray(sdn)
stm = jnp.asarray(dist[:, 0].astype(np.float32) - 0.02)
timeit('shadow org-sort   ', loop(lambda a, b, i: trace(
    arrays, dyn, vary(a, i), b, t_max=stm, any_hit=True, wide_depth=wd,
    order=_sort_order(vary(a, i), b, dyn.bounds)).t), so, sdj)
def dest_order(a, b, i):
    dest = vary(a, i) + b * stm[:, None]
    return _sort_order(dest, b, dyn.bounds)
timeit('shadow dest-sort  ', loop(lambda a, b, i: trace(
    arrays, dyn, vary(a, i), b, t_max=stm, any_hit=True, wide_depth=wd,
    order=dest_order(a, b, i)).t), so, sdj)
st = TraceState.clear(B)
timeit('shade             ', loop(lambda h, i: shade(
    arrays, dyn, ro2, rd2, jax.tree.map(lambda x: x, h), st, alive, xsj, ysj,
    jnp.uint32(3) + i.astype(jnp.uint32), jnp.uint32(1), jnp.int32(1),
    True, True, radiance, W).ray_o), hit0)
