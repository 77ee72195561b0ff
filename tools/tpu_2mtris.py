import time, numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.core.camera import Camera
from cuda_pathtracer_tpu.utils.image import save_png
t0 = time.time()
scene = get_scene('2mtris', asset_dirs=['/root/reference'])
print(f"2mtris scene build (gen + SAH + wide): {time.time()-t0:.0f}s, tris={len(scene._v0)}", flush=True)
t0 = time.time()
dyn = scene.dynamic_arrays()
print(f"world build: {time.time()-t0:.0f}s, wide rows {dyn.wide_rows.shape}, depth {scene.wide_depth}", flush=True)
cam = Camera.create([0.0, 10.0, -35.0], [0.0, 0.1, 1.0], 1.5, 30.0, 0.0)
pt = Pathtracer(scene, 320, 240)
t0 = time.time()
pt.render(cam, should_clear=True)
v = float(pt.rays_traced)
print(f"first frame: {time.time()-t0:.0f}s rays={v/1e6:.2f}M", flush=True)
t0 = time.time()
for _ in range(15):
    pt.render(cam, should_clear=False)
r = float(pt.rays_traced)
print(f"15 converge: {time.time()-t0:.0f}s total rays={r/1e6:.1f}M", flush=True)
save_png(np.asarray(film.to_uint8(pt.image())), 'screenshots/2mtris.png')
e, nan, neg = pt.energy()
print(f"energy={e:.0f} nan={nan} neg={neg} -> screenshots/2mtris.png", flush=True)
