"""2mtris stress-scene bench: converge Mrays/s at 1080p on the HBM-DMA
packet path. Isolated from bench.py so NPK2/PPC2 interleave settings can be
A/B'd quickly (env: CPT_NPK2, CPT_PPC2).

Usage: PYTHONPATH=/root/repo:/root/.axon_site [CPT_NPK2=4] python tools/stress_bench.py [samples]
"""
import os
import sys
import time

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
sys.path.insert(0, os.path.dirname(__file__) + '/..')

from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.core.camera import Camera

samples = int(sys.argv[1]) if len(sys.argv) > 1 else 2
scene = get_scene('2mtris', asset_dirs=['/root/reference', '.'])
pt = Pathtracer(scene, 1920, 1080)
cam = Camera.create([0, 6, -8], [0, -0.05, 1], 1.5, 8.0, 0.0)
pt.render(cam, should_clear=True)
pt.render(cam, should_clear=False)
pt.finish()
r0 = float(pt.rays_traced)
t0 = time.perf_counter()
for _ in range(samples):
    pt.render(cam, should_clear=False)
r1 = float(pt.rays_traced)
dt = time.perf_counter() - t0
total, has_nan, _ = pt.energy()
print(f'2mtris: {(r1 - r0)/dt/1e6:.3f} Mrays/s '
      f'({samples} samples, {dt:.1f}s, NPK2={os.environ.get("CPT_NPK2", "2")}'
      f', PPC2={os.environ.get("CPT_PPC2", "8")}, '
      f'energy={total:.1f} nan={has_nan})')
