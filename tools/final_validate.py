"""End-of-round validation on the TPU: blur-through-Pallas display path,
outside scene animation frame, shard mesh of 1."""
import numpy as np, jax, time
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
from cuda_pathtracer_tpu.parallel.mesh import ShardedPathtracer, make_mesh
from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.scene import state

sc = get_scene('outside', asset_dirs=['/root/reference'])
cam = state.read_state('/root/reference/save.txt')
pt = Pathtracer(sc, 640, 480)
sc.update(None, 2.0)   # animated cube positions
pt.render(cam, should_clear=True)
for _ in range(4): pt.render(cam, should_clear=False)
pt.finish()
img_blur = np.asarray(pt.image(blur=True))   # goes through the Pallas kernel
img_raw = np.asarray(pt.image(blur=False))
print("blur img finite:", np.isfinite(img_blur).all(), "mean", img_blur.mean(),
      "| raw mean", img_raw.mean(), flush=True)
e, nan, neg = pt.energy()
print(f"energy={e:.0f} nan={nan} neg={neg}", flush=True)

sp = ShardedPathtracer(sc, 128, 96, mesh=make_mesh(jax.devices()[:1]))
sp.render(cam, should_clear=True)
sp.finish()
print("sharded(1-dev) ok, lum finite:", np.isfinite(np.asarray(sp.lum)).all(), flush=True)
