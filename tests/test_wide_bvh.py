"""Fat-row wide BVH: build invariants + traversal parity with the narrow
threaded walk (which is itself validated against brute force)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cuda_pathtracer_tpu.accel.bvh import build_bvh_numpy
from cuda_pathtracer_tpu.accel.wide import (build_wide_bvh, LEAF_MAX, ARITY,
                                            LEAF_GIDS, LEAF_GID_MAX, LEAF_TRIS)
from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide
from cuda_pathtracer_tpu.ops.traverse import traverse
from cuda_pathtracer_tpu.scene.scene import Scene, Material, GameObject
from test_bvh import random_tris, _EmptyPrims, make_world


def test_wide_build_covers_all_triangles():
    v0, v1, v2 = random_tris(777, seed=11)
    nodes = build_bvh_numpy(v0, v1, v2)
    p = nodes.perm
    wide = build_wide_bvh(nodes, v0[p], v1[p], v2[p])
    rows = wide.rows
    leaf = rows[:, 0] < 0
    count = 0
    seen = set()
    for r in np.nonzero(leaf)[0]:
        n = int(-rows[r, 0])
        assert 1 <= n <= LEAF_MAX
        gids = rows[r, LEAF_GIDS:LEAF_GID_MAX].view(np.int32)[:n]
        seen.update(int(g) for g in gids)
        count += n
    assert count == 777
    assert seen == set(range(777))
    assert wide.depth >= 1


def test_wide_traversal_matches_narrow(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.5,) * 3))
    teapot = scene.add_model('teapot.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(teapot))
    g = GameObject(cube)
    g.position[:] = [5, 1, 0]
    g.rotation[:] = [0.3, 0.7, 0.1]
    scene.add_object(g)
    scene.finalize()
    arrays = scene.to_device()
    dyn = scene.dynamic_arrays()
    assert dyn.wide_rows.shape[0] > 0
    assert scene.wide_depth > 0

    r = np.random.RandomState(3)
    nrays = 512
    ro = np.tile(np.array([[0, 2, -9]], np.float32), (nrays, 1))
    target = (r.rand(nrays, 3).astype(np.float32) - 0.5) * np.array([14, 8, 6])
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    narrow = traverse(arrays, dyn.world, jnp.asarray(ro), jnp.asarray(rd))
    wide = traverse_wide(arrays, dyn.wide_rows, scene.wide_depth,
                         jnp.asarray(ro), jnp.asarray(rd))

    np.testing.assert_array_equal(np.asarray(narrow.intersected),
                                  np.asarray(wide.intersected))
    hits = np.asarray(narrow.intersected)
    np.testing.assert_allclose(np.asarray(wide.t)[hits],
                               np.asarray(narrow.t)[hits], rtol=1e-4)
    # the hit triangle must be the same (or an equal-t duplicate)
    same = (np.asarray(wide.prim_id)[hits] == np.asarray(narrow.prim_id)[hits])
    assert same.mean() > 0.98


def test_wide_any_hit(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.5,) * 3))
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(cube))
    scene.finalize()
    arrays = scene.to_device()
    dyn = scene.dynamic_arrays()
    ro = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 10.0, -5.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hit = traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd,
                        any_hit=True)
    assert bool(hit.intersected[0])
    assert not bool(hit.intersected[1])


def test_wide_tmax_respected(reference_assets):
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.5,) * 3))
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    scene.add_object(GameObject(cube))
    scene.finalize()
    arrays = scene.to_device()
    dyn = scene.dynamic_arrays()
    ro = jnp.asarray([[0.0, 0.0, -5.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0]])
    # cube front face at z=-1 -> t=4; a shadow-style ray capped at t=2 misses
    hit = traverse_wide(arrays, dyn.wide_rows, scene.wide_depth, ro, rd,
                        t_max=jnp.asarray([2.0]), any_hit=True)
    assert not bool(hit.intersected[0])


def test_wide_top_level_more_than_16_instances(reference_assets):
    """>16 instances exercise the multi-level 16-ary top fan-out."""
    scene = Scene(asset_dirs=[reference_assets])
    white = scene.add_material(Material.DIFFUSE((0.5,) * 3))
    cube = scene.add_model('cube.obj', 1.0, (0, 0, 0), (0, 0, 0), white)
    n_inst = 21
    for i in range(n_inst):
        g = GameObject(cube)
        g.position[:] = [4.0 * i, 0, 0]
        scene.add_object(g)
    scene.finalize()
    arrays = scene.to_device()
    dyn = scene.dynamic_arrays()
    assert dyn.wide_rows.shape[0] > 0

    # a ray aimed at each instance must hit that instance
    ro = np.array([[4.0 * i, 0.0, -10.0] for i in range(n_inst)], np.float32)
    rd = np.tile(np.array([[0, 0, 1.0]], np.float32), (n_inst, 1))
    hit = traverse_wide(arrays, dyn.wide_rows, scene.wide_depth,
                        jnp.asarray(ro), jnp.asarray(rd))
    assert np.asarray(hit.intersected).all()
    np.testing.assert_allclose(np.asarray(hit.t), 9.0, rtol=1e-5)
    inst = np.asarray(dyn.world.tri_inst)[np.asarray(hit.prim_id)]
    np.testing.assert_array_equal(inst, np.arange(n_inst))
    # narrow path agrees
    nar = traverse(arrays, dyn.world, jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_allclose(np.asarray(nar.t), np.asarray(hit.t), rtol=1e-6)
