"""Headline benchmark: Mrays/s on the sibenik-class scene at 1080p.

Prints ONE JSON line:
  {"metric": "Mrays/s sibenik-1080p", "value": N, "unit": "Mrays/s",
   "vs_baseline": N}

Baseline: the reference renders sibenik at 130 fps / 640x480 with 1 diffuse +
1 shadow ray on a GTX 960M (README.md:202) ≈ 80 Mrays/s. BASELINE.json's
north star is ≥100 Mrays/s/chip at 1080p; vs_baseline is reported against the
80 Mrays/s reference figure.

Runs on whatever JAX platform is active (the real TPU chip under the driver).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MRAYS = 80.0


def main():
    import os
    width, height = 1920, 1080
    warmup_samples = 1
    bench_samples = int(os.environ.get('BENCH_SAMPLES', '4'))

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_CACHE_DIR', '/tmp/jaxcache'))
    from cuda_pathtracer_tpu.scene.builder import get_scene
    from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
    from cuda_pathtracer_tpu.scene import state

    scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
    pt = Pathtracer(scene, width, height)
    # camera inside the hall looking down the nave
    from cuda_pathtracer_tpu.core.camera import Camera
    camera = Camera.create([0.0, 5.0, -16.0], [0.0, 0.0, 1.0], 1.5, 12.0, 0.0)

    # compile + warm up (interactive clear then converge samples)
    pt.render(camera, should_clear=True)
    for _ in range(warmup_samples):
        pt.render(camera, should_clear=False)
    pt.finish()

    rays_before = float(pt.rays_traced)  # forces a full device sync
    t0 = time.perf_counter()
    for _ in range(bench_samples):
        pt.render(camera, should_clear=False)
    rays_after = float(pt.rays_traced)   # sync again: real wall time
    dt = time.perf_counter() - t0
    rays = rays_after - rays_before

    mrays = rays / dt / 1e6
    total, has_nan, has_neg = pt.energy()
    result = {
        'metric': 'Mrays/s sibenik-1080p',
        'value': round(mrays, 2),
        'unit': 'Mrays/s',
        'vs_baseline': round(mrays / BASELINE_MRAYS, 3),
    }
    print(json.dumps(result))
    # extra context on stderr (not part of the contract)
    print(f'# {rays/1e6:.1f} Mrays in {dt:.2f}s over {bench_samples} samples '
          f'({width}x{height}); energy={total:.1f} nan={has_nan} neg={has_neg}; '
          f'platform={jax.devices()[0].platform}', file=sys.stderr)


if __name__ == '__main__':
    main()
