"""Hardware validation of the share-K HBM-DMA path (ADVICE round-3 lows).

Interpret mode emulates async copies synchronously, so the per-slot DMA
pipeline (NPK*share row slots, (NPK,share) semaphores) and the body_h
push-then-stage SMEM ordering were unexercised on real silicon. This runs
the exact parity checks of tests/test_packet.py's share tests on the REAL
TPU (interpret=False): share=8 VMEM and share=8 HBM (pure-DMA and hybrid
splits) vs sequential share=0 VMEM ground truth.

Run: python tools/hw_share_hbm_parity.py   (needs the axon TPU tunnel)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from cuda_pathtracer_tpu.scene.scene import Scene, GameObject, Material
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2

REFERENCE_DIR = '/root/reference'


def main():
    scene = Scene(asset_dirs=[REFERENCE_DIR])
    m = scene.add_material(Material.DIFFUSE((0.4,) * 3))
    scene.add_object(GameObject(
        scene.add_model('teapot.obj', 1.0, (0, 0, 0), (0, 0, 0), m)))
    g2 = GameObject(scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), m))
    g2.position[:] = [2.5, 0.5, 1.0]
    scene.add_object(g2)
    scene.finalize()
    arrays, dyn = scene.to_device(), scene.dynamic_arrays()
    table = tpk2.build_merged_table(np.asarray(dyn.wide_rows),
                                    scene.wide_depth)

    cam = cam_mod.Camera.create([0, 1.5, -6], [0, 0, 1], 1.5, 6, 0.0)
    W, H = 64, 48
    ys, xs = np.mgrid[0:H, 0:W]
    ro, rd = cam_mod.generate_rays_simple(
        cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, H)

    def run(**kw):
        h = tpk2.traverse_packet2(arrays, table, ro, rd, **kw)
        return (np.asarray(h.intersected), np.asarray(h.t),
                np.asarray(h.prim_id))

    i0, t0, p0 = run(share=0)
    n_rows = int(table.rows.shape[0])
    cases = {
        'share8_vmem': dict(share=8),
        'share8_hbm': dict(share=8, hbm=True),
        'share8_hybrid_mid': dict(share=8, hbm=True,
                                  split=max(8, (n_rows // 2) & ~7)),
        'share8_hybrid_tiny': dict(share=8, hbm=True, split=8),
        'seq_hbm': dict(share=0, hbm=True),
    }
    ok = True
    for name, kw in cases.items():
        i1, t1, p1 = run(**kw)
        same_i = (i0 == i1).all()
        both = i0 & i1
        same_t = (t0[both] == t1[both]).all()
        diff = p0[both] != p1[both]
        ties_ok = (t0[both][diff] == t1[both][diff]).all()
        status = 'OK' if (same_i and same_t and ties_ok) else 'FAIL'
        ok &= status == 'OK'
        print(f'{name:22s} {status}  intersected={same_i} t={same_t} '
              f'pid_diffs={int(diff.sum())} (all exact-t ties: {ties_ok})')
    print('HW share-hbm parity:', 'PASS' if ok else 'FAIL')
    return 0 if ok else 1


if __name__ == '__main__':
    raise SystemExit(main())
