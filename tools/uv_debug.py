"""Debug the want_uv mismatch: which lanes, which gids, kernel u/v vs
re-intersect u/v, and whether the kernel t matches the re-intersect t."""
import numpy as np
import jax.numpy as jnp

from cuda_pathtracer_tpu.scene.scene import Scene, Material, GameObject
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet as tpk
from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2
from cuda_pathtracer_tpu.ops import intersect as isect
import os, sys

asset = os.environ.get('CPT_ASSETS', '/root/reference')
scene = Scene(asset_dirs=[asset])
m = scene.add_material(Material.DIFFUSE((0.4,) * 3))
scene.add_object(GameObject(
    scene.add_model('teapot.obj', 1.0, (0, 0, 0), (0, 0, 0), m)))
g2 = GameObject(scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), m))
g2.position[:] = [2.5, 0.5, 1.0]
scene.add_object(g2)
scene.finalize()
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
merged = tpk2.build_merged_table(np.asarray(dyn.wide_rows), scene.wide_depth)

cam = cam_mod.Camera.create([0, 1.5, -6], [0, 0, 1], 1.5, 6, 0.0)
W, H = 64, 48
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, H)

tm = np.asarray(dyn.tri_meta)
for share in (8, 0):
    h = tpk2.traverse_packet2(arrays, merged, ro, rd,
                              interpret=True, share=share, want_uv=True)
    tri = np.asarray(h.intersected) & (np.asarray(h.prim_id) >= 0)
    idx = np.nonzero(tri)[0]
    pid = np.asarray(h.prim_id)[tri]
    v0 = jnp.asarray(tm[pid, 2:5])
    v1 = jnp.asarray(tm[pid, 5:8])
    v2 = jnp.asarray(tm[pid, 8:11])
    tt, ok, tu, tv = isect.ray_triangle(ro[tri], rd[tri], v0, v1, v2)
    ku = np.asarray(h.u)[tri]
    kv = np.asarray(h.v)[tri]
    kt = np.asarray(h.t)[tri]
    bad = ~np.isclose(ku, np.asarray(tu), rtol=2e-5, atol=2e-6)
    print(f'share={share}: {bad.sum()}/{bad.size} mismatched')
    for j in np.nonzero(bad)[0][:10]:
        print(f'  lane {idx[j]} gid {pid[j]}: kernel u={ku[j]:.6f} '
              f'v={kv[j]:.6f} t={kt[j]:.6f} | reint u={float(tu[j]):.6f} '
              f'v={float(tv[j]):.6f} t={float(tt[j]):.6f} ok={bool(ok[j])}')
