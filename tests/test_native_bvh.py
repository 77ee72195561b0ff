"""Native C++ BVH builder vs the numpy reference implementation."""
import numpy as np
import pytest

from cuda_pathtracer_tpu.accel import native
from cuda_pathtracer_tpu.accel.bvh import build_bvh_numpy


@pytest.fixture(scope='module')
def tris():
    r = np.random.RandomState(7)
    n = 5000
    base = (r.rand(n, 3).astype(np.float32) - 0.5) * 50
    return (base,
            base + (r.rand(n, 3).astype(np.float32) - 0.5),
            base + (r.rand(n, 3).astype(np.float32) - 0.5))


def test_native_matches_numpy_topology(tris):
    if not native.available():
        pytest.skip('native builder not built')
    v0, v1, v2 = tris
    a = native.build_bvh_native(v0, v1, v2)
    b = build_bvh_numpy(v0, v1, v2)
    assert len(a.vmin) == len(b.vmin)
    np.testing.assert_array_equal(a.leaf_count, b.leaf_count)
    np.testing.assert_array_equal(a.leaf_start, b.leaf_start)
    np.testing.assert_allclose(a.vmin, b.vmin, rtol=1e-6)
    np.testing.assert_allclose(a.vmax, b.vmax, rtol=1e-6)


def test_native_coverage(tris):
    if not native.available():
        pytest.skip('native builder not built')
    v0, v1, v2 = tris
    nodes = native.build_bvh_native(v0, v1, v2)
    n = len(v0)
    counts = np.zeros(n, np.int64)
    for i in range(len(nodes.vmin)):
        if nodes.leaf_count[i] > 0:
            s, c = nodes.leaf_start[i], nodes.leaf_count[i]
            counts[s:s + c] += 1
    np.testing.assert_array_equal(counts, 1)
    assert len(np.unique(nodes.perm)) == n


def test_native_single_triangle():
    if not native.available():
        pytest.skip('native builder not built')
    v0 = np.array([[0, 0, 0]], np.float32)
    v1 = np.array([[1, 0, 0]], np.float32)
    v2 = np.array([[0, 1, 0]], np.float32)
    nodes = native.build_bvh_native(v0, v1, v2)
    assert len(nodes.vmin) == 1
    assert nodes.leaf_count[0] == 1
