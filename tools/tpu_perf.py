"""Quick TPU perf probe for the wavefront engine (sibenik-class)."""
import time, sys
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
print("devices:", jax.devices(), flush=True)
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.core.camera import Camera

W = int(sys.argv[1]) if len(sys.argv) > 1 else 640
H = int(sys.argv[2]) if len(sys.argv) > 2 else 480
scene = get_scene('sibenik', asset_dirs=['/root/reference'])
print("scene built", flush=True)
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
pt = Pathtracer(scene, W, H)
t0 = time.time()
pt.render(cam, should_clear=True); pt.finish()
print(f"interactive compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
pt.render(cam, should_clear=False); pt.finish()
print(f"converge compile+run: {time.time()-t0:.1f}s", flush=True)
for i in range(4):
    t0 = time.time()
    pt.render(cam, should_clear=False)
    pt.finish()
    print(f"sample {i}: {(time.time()-t0)*1000:.0f} ms", flush=True)
r = float(pt.rays_traced)
print(f"total rays: {r/1e6:.1f}M over {pt.sample_idx} samples", flush=True)
