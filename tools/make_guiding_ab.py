"""Guiding A/B gallery pair: sibenik at equal sample counts with the
radiance cache ON vs OFF (the reference's README.md:128-139 comparison).
Writes screenshots/sibenik_guiding_{on,off}.png.

PYTHONPATH=/root/repo:/root/.axon_site python tools/make_guiding_ab.py
"""
import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.core.camera import Camera
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.utils.image import save_png

SPP = 48
W, H = 640, 480

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
cam = Camera.create([0.0, 5.0, -16.0], [0.0, 0.0, 1.0], 1.5, 12.0, 0.0)

for cache_on in (True, False):
    pt = Pathtracer(scene, W, H)
    pt.cache = cache_on
    pt.render(cam, should_clear=True)
    pt.lum, pt.alb = film.clear_accumulators(W * H)
    pt.sample_idx = 0
    while pt.sample_idx < SPP:
        pt.render(cam, should_clear=False)
    pt.finish()
    img = film.to_uint8(pt.image())
    name = f'screenshots/sibenik_guiding_{"on" if cache_on else "off"}.png'
    save_png(np.asarray(img), name)
    e, nan, neg = pt.energy()
    print(f'{name}: {SPP} spp energy={e:.0f} nan={nan}', flush=True)
