"""Probe I: cost of field-matrix extraction variants inside the step.
 V1: 15x broadcast_to((k,1) column slice -> (k,128))       [current]
 V2: one (128,1)->(128,128) lane-broadcast + aligned row slices
 V3: V2 + only do the needed path's math (scripted leaf/inner alternation)
Each runs the full leaf+inner math chain, scripted next idx."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
N = 8192
BIG = 3.0e38

def make(T, variant):
    def kernel(tab, o_ref, t_out):
        o = o_ref[:]
        ox, oy, oz = o[0:1], o[1:2], o[2:3]
        def body(i, carry):
            idx, t = carry
            rowv = tab[pl.ds(idx, 1), :]
            rowT = jnp.transpose(rowv)             # (128,1)
            if variant == 1:
                def fS(a, k):
                    return jnp.broadcast_to(rowT[a:a+k], (k, 128))
                mats = [fS(j*12, 12) for j in range(9)] \
                     + [fS(j*16, 16) for j in range(6)]
            else:
                rowB = jnp.broadcast_to(rowT, (128, 128))
                mats = [rowB[j*16:j*16+12] for j in range(8)] \
                     + [rowB[112:124]] \
                     + [rowB[j*16:j*16+16] for j in range(6)]
            # leaf-ish math on the 9 (12,128) mats
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = mats[:9]
            hx = oy*e2z - oz*e2y; hy = oz*e2x - ox*e2z; hz = ox*e2y - oy*e2x
            a = e1x*hx + e1y*hy + e1z*hz
            f = 1.0 / jnp.where(jnp.abs(a) < 1e-4, 1.0, a)
            sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
            u = f*(sx*hx + sy*hy + sz*hz)
            qx = sy*e1z - sz*e1y; qy = sz*e1x - sx*e1z; qz = sx*e1y - sy*e1x
            vv = f*(ox*qx + oy*qy + oz*qz)
            tt = f*(e2x*qx + e2y*qy + e2z*qz)
            okm = (jnp.abs(a) >= 1e-4) & (u >= 0) & (u <= 1) & (vv >= 0) & (u+vv <= 1) & (tt > 0) & (tt < t)
            leaf_t = jnp.min(jnp.where(okm, tt, BIG), axis=0, keepdims=True)
            # inner-ish math on the 6 (16,128) mats
            lox, loy, loz, hix, hiy, hiz = mats[9:]
            t0x = (lox-ox)*oy; t1x = (hix-ox)*oy
            t0y = (loy-oy)*oz; t1y = (hiy-oy)*oz
            t0z = (loz-oz)*ox; t1z = (hiz-oz)*ox
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x,t1x), jnp.minimum(t0y,t1y)), jnp.minimum(t0z,t1z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x,t1x), jnp.maximum(t0y,t1y)), jnp.maximum(t0z,t1z))
            chit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t)
            pc = jnp.min(jnp.where(chit, tmin, BIG), axis=1, keepdims=True)
            kmin = jnp.min(pc, axis=0, keepdims=True)
            sel = jnp.min(jnp.where(pc == kmin,
                                    jax.lax.broadcasted_iota(jnp.int32, (16,1), 0), 16))
            t2 = jnp.minimum(t, leaf_t)
            return ((idx*5 + sel + 1) % N, t2)
        fin = jax.lax.fori_loop(0, T, body,
                                (jnp.int32(0), jnp.full((1,128), BIG, jnp.float32)))
        t_out[:, :] = jnp.broadcast_to(fin[1], (8, 128))
    return kernel

tab = jnp.asarray(np.random.rand(N, 128)*10-5, jnp.float32)
o = jnp.asarray(np.random.rand(8, 128), jnp.float32)
for variant in (1, 2):
    res = {}
    for T in (512, 4096):
        f = pl.pallas_call(
            make(T, variant),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))
        try:
            g = jax.jit(f)
            out = g(tab, o); _ = np.asarray(out[:1])
            best = 1e9
            for _ in range(4):
                s = time.perf_counter(); out = g(tab, o); _ = np.asarray(out[:1])
                best = min(best, time.perf_counter() - s)
            res[T] = best
        except Exception as e:
            lines = [l for l in str(e).split('\n') if 'Not implemented' in l or 'Mosaic f' in l]
            print(f'V{variant} FAIL', [l[-80:] for l in lines[:1]]); break
    if len(res) == 2:
        print(f'V{variant}: {(res[4096]-res[512])*1e9/(4096-512):8.1f} ns/step')
