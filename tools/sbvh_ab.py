"""A/B the SBVH spatial-split build (CPT_SBVH=1) against the binned build
by exact kernel-semantics union simulation on real sibenik wavefronts
(same harness as collapse_ab.py; both trees go through the default DP wide
collapse). Also asserts closest-hit t parity packet by packet — spatial
splits change WHICH leaves a triangle is tested from, never the hit.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/sbvh_ab.py [npackets]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__) + '/..')
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import collapse_ab as cab  # noqa: E402

NP_ = int(sys.argv[1]) if len(sys.argv) > 1 else 96
C_INNER, C_LEAF = 430.0, 610.0


def build(sbvh: str):
    os.environ['CPT_SBVH'] = sbvh
    import importlib
    from cuda_pathtracer_tpu.scene import builder as b
    importlib.reload(b)
    scene = b.get_scene('sibenik', asset_dirs=['/root/reference', '.'])
    dyn = scene.dynamic_arrays()
    from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2
    merged = tpk2.build_merged_table(np.asarray(dyn.wide_rows),
                                     scene.wide_depth)
    return np.asarray(merged.rows)


def main():
    cab.NP_ = NP_
    waves = list(cab.wavefronts())
    results = {}
    for sbvh in ('0', '1'):
        import time
        t0 = time.perf_counter()
        rows = build(sbvh)
        bt = time.perf_counter() - t0
        walk = cab.make_walker(rows)
        label = 'sbvh' if sbvh == '1' else 'binned'
        print(f'--- {label}: {rows.shape[0]} rows (scene+table {bt:.1f}s)')
        for name, o, d in waves:
            rng = np.random.default_rng(1)
            npk = min(NP_, o.shape[0] // 128)
            pick = rng.choice(o.shape[0] // 128, size=npk, replace=False)
            IV = LV = 0
            ts = []
            for p in pick:
                sl = slice(p * 128, (p + 1) * 128)
                iv, lv, t = walk(o[sl], d[sl])
                IV += iv
                LV += lv
                ts.append(t)
            nr = npk * 128
            ns = (IV * C_INNER + LV * C_LEAF) / nr
            print(f'  {name:8s}: inner {IV/npk:7.2f} leaf {LV/npk:7.2f} '
                  f'/packet; visits/ray {(IV+LV)/nr:6.3f}; '
                  f'projected {ns:6.1f} ns/ray')
            results[(label, name)] = (IV + LV, np.concatenate(ts))
    for name in ('primary', 'bounce'):
        v0, t0 = results[('binned', name)]
        v1, t1 = results[('sbvh', name)]
        nd = int(np.count_nonzero(t0 != t1))
        print(f'{name}: union visits {v1/v0:.3f}x of binned; '
              f't mismatches {nd}/{len(t0)} '
              f'(max abs diff {np.abs(t0-t1).max():.3e})')


if __name__ == '__main__':
    main()
