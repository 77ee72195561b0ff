"""The fused Pallas blur kernel must match the XLA reference implementation
(run in interpreter mode on the CPU test backend)."""
import numpy as np
import jax.numpy as jnp

from cuda_pathtracer_tpu.models import film
from cuda_pathtracer_tpu.ops.blur_pallas import blur_luminance_pallas, fits_vmem

W, H = 64, 48


def _accumulators(seed=0, n=12.0):
    rng = np.random.RandomState(seed)
    lum = np.concatenate([rng.rand(H * W, 3).astype(np.float32) * n,
                          np.full((H * W, 1), n, np.float32)], axis=1)
    alb = np.concatenate([rng.rand(H * W, 3).astype(np.float32) * n + 0.1,
                          np.full((H * W, 1), n, np.float32)], axis=1)
    return jnp.asarray(lum), jnp.asarray(alb)


def test_pallas_blur_matches_xla():
    lum, alb = _accumulators()
    for n in (1.0, 12.0, 500.0):   # spans the spread regimes
        want = np.asarray(film._blur_xla(lum, alb, n, W, H))
        got = np.asarray(blur_luminance_pallas(lum, alb, n, width=W, height=H,
                                               interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fits_vmem_gate():
    assert fits_vmem(640, 480)
    assert not fits_vmem(1920, 1080)
