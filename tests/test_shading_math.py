"""Focused unit tests of the shading math against the reference formulas
(getRefractRay src/kernels.h:458-483, samplers src/kernels.h:390-450)."""
import numpy as np
import jax.numpy as jnp

from cuda_pathtracer_tpu.models.shading import _refract, _reflect_ray
from cuda_pathtracer_tpu.models import sampling
from cuda_pathtracer_tpu.core import rng as _rng


def test_refract_straight_through_matched_media():
    """ior == 1 -> the ray continues straight and Fresnel reflectance ~ 0."""
    rd = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    pos = jnp.zeros((1, 3))
    _, refr_d, refl, beer = _refract(rd, n, pos, jnp.asarray([1.0]),
                                     jnp.zeros((1, 3)),
                                     jnp.asarray([False]), jnp.asarray([1.0]))
    np.testing.assert_allclose(np.asarray(refr_d), np.asarray(rd), atol=1e-6)
    assert float(refl[0]) < 1e-6
    np.testing.assert_allclose(np.asarray(beer), 1.0)


def test_refract_total_internal_reflection():
    """Shallow exit angle from glass (inside=True) -> TIR -> reflected = 1."""
    ang = np.deg2rad(80.0)  # well past the ~41.8deg critical angle for n=1.5
    rd = jnp.asarray([[np.sin(ang), -np.cos(ang), 0.0]], dtype=jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    pos = jnp.zeros((1, 3))
    _, _, refl, _ = _refract(rd, n, pos, jnp.asarray([1.5]),
                             jnp.zeros((1, 3)),
                             jnp.asarray([True]), jnp.asarray([1.0]))
    assert float(refl[0]) == 1.0


def test_refract_snells_law():
    """30deg incidence into n=1.5: sin(theta_t) = sin(30)/1.5."""
    ang = np.deg2rad(30.0)
    rd = jnp.asarray([[np.sin(ang), -np.cos(ang), 0.0]], dtype=jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    pos = jnp.zeros((1, 3))
    _, refr_d, _, _ = _refract(rd, n, pos, jnp.asarray([1.5]),
                               jnp.zeros((1, 3)),
                               jnp.asarray([False]), jnp.asarray([1.0]))
    d = np.asarray(refr_d)[0]
    sin_t = abs(d[0]) / np.linalg.norm(d)
    np.testing.assert_allclose(sin_t, np.sin(ang) / 1.5, rtol=1e-5)


def test_beer_absorption():
    rd = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    absorption = jnp.asarray([[0.5, 1.0, 2.0]])
    t = jnp.asarray([2.0])
    _, _, _, beer = _refract(rd, n, jnp.zeros((1, 3)), jnp.asarray([1.5]),
                             absorption, jnp.asarray([True]), t)
    np.testing.assert_allclose(np.asarray(beer)[0],
                               np.exp(-np.array([0.5, 1.0, 2.0]) * 2.0),
                               rtol=1e-5)


def test_reflect_ray():
    rd = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    o, d = _reflect_ray(rd, n, jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(d)[0], [1 / np.sqrt(2), 1 / np.sqrt(2), 0],
                               atol=1e-6)


def test_cosine_hemisphere_distribution():
    """Samples lie in the hemisphere around the normal and the mean cosine
    approaches 2/3 (cosine weighting)."""
    n = 20000
    u = np.random.RandomState(0)
    r0 = jnp.asarray(u.rand(n).astype(np.float32))
    r1 = jnp.asarray(u.rand(n).astype(np.float32))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    d = np.asarray(sampling.hemisphere_cosine(normal, r0, r1))
    assert (d[:, 2] > -1e-6).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_guided_sampler_prefers_bright_buckets():
    """With one dominant bucket, most samples pick it and invprob reweights
    by total/(bucket*8) (SampleHemisphereCached, kernels.h:408-431)."""
    n = 8192
    cache = np.full((n, 8), 0.1, np.float32)
    cache[:, 5] = 5.0
    total = cache.sum(axis=1)
    st = _rng.make_state(np.arange(1, n + 1).astype(np.uint32))
    s, st = _rng.rand(st)
    r0, st = _rng.rand(st)
    r1, st = _rng.rand(st)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    d, bucket, invprob = sampling.hemisphere_cached(
        normal, jnp.asarray(cache), jnp.asarray(total), s, r0, r1)
    b = np.asarray(bucket)
    frac5 = (b == 5).mean()
    assert frac5 > 0.8  # 5.0 / 5.7 of the probability mass
    ip = np.asarray(invprob)[b == 5]
    np.testing.assert_allclose(ip, total[0] / (5.0 * 8.0), rtol=1e-4)


def test_guiding_energy_clamp_ignores_nan():
    # cum_mask with an exact-zero channel makes total/cum_mask NaN; CUDA's
    # fminf(100, NaN) == 100, so the cache update must not poison itself
    # (kernels.h:872; ADVICE.md round 1, high)
    import jax.numpy as jnp
    from cuda_pathtracer_tpu.models.guiding import (
        SampleCache, accumulate_buckets, SAMPLE_BUCKET, ENERGY_CLAMP)
    cache = SampleCache(
        stype=jnp.full((3, 2), SAMPLE_BUCKET, jnp.int32),
        tri=jnp.zeros((3, 2), jnp.int32),
        bucket=jnp.zeros((3, 2), jnp.int32),
        cum_mask=jnp.zeros((3, 2, 3), jnp.float32))   # all-zero mask -> 0/0
    total = jnp.zeros((2, 3), jnp.float32)
    sums, counts = accumulate_buckets(4, cache, total)
    assert np.isfinite(np.asarray(sums)).all()
    assert float(sums[0, 0]) == ENERGY_CLAMP * 6   # every entry clamps to 100
