import time, sys, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
print("devices:", jax.devices(), flush=True)
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.core.camera import Camera

scene = get_scene('sibenik', asset_dirs=['/root/reference'])
cam = Camera.create([0.0, -4.0, -14.0], [0.0, 0.05, 1.0], 1.5, 10.0, 0.0)
for W, H in [(640, 480), (1920, 1080)]:
    pt = Pathtracer(scene, W, H)
    t0 = time.time(); pt.render(cam, should_clear=True); pt.finish()
    print(f"{W}x{H} interactive: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); pt.render(cam, should_clear=False); pt.finish()
    print(f"{W}x{H} converge first: {time.time()-t0:.1f}s", flush=True)
    r0 = float(pt.rays_traced)
    t0 = time.time()
    NS = 64
    for _ in range(NS):
        pt.render(cam, should_clear=False)
    pt.finish()
    dt = time.time()-t0
    rays = float(pt.rays_traced) - r0
    e, nan, neg = pt.energy()
    print(f"{W}x{H}: {dt/NS*1000:.1f} ms/sample, {rays/dt/1e6:.1f} Mrays/s, energy={e:.1f} nan={nan} neg={neg}", flush=True)
    if W == 640:
        img = film.to_uint8(pt.image(blur=False))
        from PIL import Image
        Image.fromarray(np.asarray(img)[::-1]).save('/tmp/tpu_sibenik.png')
        print("saved /tmp/tpu_sibenik.png", flush=True)
