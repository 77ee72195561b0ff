import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core.camera import Camera, generate_rays_simple
from cuda_pathtracer_tpu.ops import intersect as isect
from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide
from cuda_pathtracer_tpu.accel.wide import ARITY, LEAF_MAX, INNER_BOX0, INNER_REFS, LEAF_TRIS, LEAF_GIDS, LEAF_GID_MAX

scene = get_scene('sibenik', asset_dirs=['/root/reference'])
arrays = scene.to_device(); dyn = scene.dynamic_arrays()
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
W,H = 640,480
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = generate_rays_simple(cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, H)

# instrumented copy of the while loop: count iterations until ALL lanes done
import cuda_pathtracer_tpu.ops.traverse_wide as tw
orig_while = jax.lax.while_loop
count = {}
def counting_while(cond, body, init):
    def body2(c):
        cc, it = c
        return (body(cc), it + 1)
    def cond2(c):
        return cond(c[0])
    out, iters = orig_while(cond2, lambda c: body2(c), (init, jnp.asarray(0)))
    count['iters'] = iters
    return out
jax.lax.while_loop = counting_while
f = jax.jit(lambda ro, rd: (traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd), count['iters']))
out, iters = f(ro, rd)
print("primary lockstep iterations:", int(iters), flush=True)
jax.lax.while_loop = orig_while
