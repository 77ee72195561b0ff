"""RNG parity with the reference hash/xorshift formulas
(src/use_cuda.h:61-101, src/kernels.h:20-29)."""
import numpy as np
import jax.numpy as jnp

from cuda_pathtracer_tpu.core import rng


def ref_wang_hash(seed: int) -> int:
    seed &= 0xffffffff
    seed = ((seed ^ 61) ^ (seed >> 16)) & 0xffffffff
    seed = (seed * 9) & 0xffffffff
    seed = (seed ^ (seed >> 4)) & 0xffffffff
    seed = (seed * 0x27d4eb2d) & 0xffffffff
    seed = (seed ^ (seed >> 15)) & 0xffffffff
    return seed


def ref_xorshift(seed: int) -> int:
    seed &= 0xffffffff
    seed ^= (seed << 13) & 0xffffffff
    seed ^= seed >> 17
    seed ^= (seed << 5) & 0xffffffff
    return seed & 0xffffffff


def test_wang_hash_parity():
    seeds = np.array([0, 1, 42, 123456789, 0xffffffff], np.uint32)
    got = np.asarray(rng.wang_hash(jnp.asarray(seeds)))
    want = np.array([ref_wang_hash(int(s)) for s in seeds], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_xorshift_parity():
    seeds = np.array([1, 7, 99, 2**31, 0xdeadbeef], np.uint32)
    got = np.asarray(rng.xorshift(jnp.asarray(seeds)))
    want = np.array([ref_xorshift(int(s)) for s in seeds], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_rand_uniform_range_and_chain():
    seed = jnp.asarray(np.array([12345], np.uint32))
    vals = []
    for _ in range(100):
        v, seed = rng.rand_uniform(seed)
        vals.append(float(v[0]))
    vals = np.array(vals)
    assert (vals >= 0).all() and (vals < 1).all()
    # sanity: roughly uniform
    assert 0.3 < vals.mean() < 0.7


def test_get_seed_parity():
    width = 640
    x, y, ridx = 13, 27, 5
    got = int(rng.get_seed(x, y, ridx, width))
    want = ref_wang_hash(ref_wang_hash(x + width * y) + ridx)
    assert got == want


def test_blue_noise_gating():
    """sampleIdx < 1 -> quasirandom fmod(bn + pi*k, 1) (src/kernels.h:20-29)."""
    st = rng.RandState(
        seed=jnp.asarray(np.array([1, 1], np.uint32)),
        bn_sample=jnp.asarray(np.array([0.25, 0.5], np.float32)),
        bn_idx=jnp.zeros(2, jnp.uint32),
        sample_idx=jnp.asarray(0, jnp.uint32))
    v0, st = rng.rand(st)
    v1, st = rng.rand(st)
    np.testing.assert_allclose(np.asarray(v0),
                               np.mod([0.25, 0.5], 1.0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(v1), np.mod(np.array([0.25, 0.5]) + np.pi, 1.0), rtol=1e-5)
    # later samples use the xorshift stream
    st2 = st._replace(sample_idx=jnp.asarray(3, jnp.uint32))
    v2, _ = rng.rand(st2)
    expected = ref_xorshift(ref_xorshift(ref_xorshift(1)))  # two draws happened above
    np.testing.assert_allclose(float(v2[0]),
                               expected * 2.3283064365387e-10, rtol=1e-6)
