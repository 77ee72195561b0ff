"""The Pallas dense-window segmented sum matches jax.ops.segment_sum.

Covers the shapes the guiding update produces (dense low segments + a dump
segment at the top) and adversarial distributions: sparse spans that force
multiple window passes per tile, all-one-segment streams, and empty input
padding. Run in interpret mode so CI needs no TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_pathtracer_tpu.ops.guiding_scatter import segment_sum_pairs


def _ref(e, w, seg, S):
    both = jnp.stack([e, w], axis=-1)
    out = jax.ops.segment_sum(both, seg, num_segments=S)
    return np.asarray(out[:, 0]), np.asarray(out[:, 1])


def _check(e, w, seg, S):
    ke, kw = segment_sum_pairs(jnp.asarray(e), jnp.asarray(w),
                               jnp.asarray(seg), num_segments=S,
                               interpret=True)
    re, rw = _ref(jnp.asarray(e), jnp.asarray(w), jnp.asarray(seg), S)
    np.testing.assert_allclose(np.asarray(ke), re, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kw), rw, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('L,S,seed', [
    (3000, 4096, 0),       # dense: most tiles one pass
    (2048, 300_000, 1),    # sparse: spans >> window, multi-pass tiles
    (1024, 130, 2),        # heavy duplication, tiny table
    (700, 2048, 3),        # sub-tile input (padding exercised)
])
def test_matches_segment_sum(L, S, seed):
    rng = np.random.default_rng(seed)
    seg = rng.integers(0, S, L).astype(np.int32)
    e = rng.random(L).astype(np.float32) * 10
    w = (rng.random(L) < 0.7).astype(np.float32)
    _check(e, w, seg, S)


def test_single_segment_stream():
    # every update in one segment: one run the length of the stream
    L, S = 2048, 9000
    e = np.ones(L, np.float32)
    w = np.full(L, 2.0, np.float32)
    seg = np.full(L, 8999, np.int32)
    _check(e, w, seg, S)


def test_guiding_shape_distribution():
    # the real update shape: valid entries hit a few hundred triangles'
    # buckets, invalid ones all map to the dump segment S-1
    rng = np.random.default_rng(7)
    L, n_tris = 6144, 2000
    S = n_tris * 8 + 1
    valid = rng.random(L) < 0.6
    tri = rng.integers(0, 300, L)
    seg = np.where(valid, tri * 8 + rng.integers(0, 8, L), S - 1)
    e = np.where(valid, rng.random(L) * 100, 0.0).astype(np.float32)
    w = valid.astype(np.float32)
    _check(e, w, seg.astype(np.int32), S)
