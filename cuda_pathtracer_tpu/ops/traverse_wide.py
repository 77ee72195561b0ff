"""Wide-BVH wavefront traversal — the TPU performance path.

One iteration = ONE fat-row gather (512B) + 16 slab tests + 12 inline
Möller-Trumbore tests, all vectorized across the wavefront. The per-lane
"short stack" holds (node, visited-children-mask) pairs, one per tree level
(the masked short-stack of BASELINE.json's north star): on pop, the node row
is re-fetched and its boxes re-tested against the (improved) current t, which
re-prunes for free and keeps stack entries at 8 bytes.

Ordered descent: the nearest hit child is entered first (per-lane argmin of
child tmin), matching the reference's near-child-first policy
(src/kernels.h:252-255) but over 16 children at once.

Contract-compatible with ops/traverse.py:traverse (same Hit, same
sphere/plane prepass); selected automatically by the engines when the scene
provides a wide table.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import intersect as isect
from .traverse import Hit, PRIM_TRIANGLE, _primitives_prepass
from ..constants import T_MAX
from ..accel.wide import (ARITY, LEAF_MAX, INNER_BOX0, INNER_REFS,
                          LEAF_TRIS, LEAF_GIDS, LEAF_GID_MAX)


def traverse_wide(scene, wide_rows, depth: int, ro, rd, t_max=None,
                  active=None, any_hit: bool = False,
                  stop_on_hit=None) -> Hit:
    """Closest-hit / any-hit trace against the fat-row 16-ary BVH.

    wide_rows: f32[N, 128] device table; depth: static stack bound.
    `stop_on_hit` (bool[B], optional) makes individual lanes terminate at
    their first intersection — this lets shadow rays and extension rays share
    ONE fused traversal call (halving the per-iteration gather cost of a
    bounce). `any_hit=True` is the uniform version.
    Returns Hit with prim_id = world-triangle index (as in the narrow path).
    """
    B = ro.shape[:-1]
    D = depth + 2
    if t_max is None:
        t_max = jnp.full(B, T_MAX, jnp.float32)
    if active is None:
        active = jnp.ones(B, bool)

    t0, ptype0, pid0, found0 = _primitives_prepass(scene, ro, rd, t_max, any_hit)

    if stop_on_hit is None:
        stop_on_hit = jnp.full(B, bool(any_hit))

    inv_rd = isect.safe_inv_dir(rd)
    start = jnp.where(active & ~(stop_on_hit & found0),
                      0, -1).astype(jnp.int32)

    lane12 = jnp.arange(LEAF_MAX, dtype=jnp.int32)
    slot_bits = (1 << jnp.arange(ARITY, dtype=jnp.int32)).astype(jnp.int32)

    def cond(c):
        return jnp.any(c['cur'] >= 0)

    def body(c):
        cur = c['cur']
        live = cur >= 0
        row = wide_rows[jnp.maximum(cur, 0)]              # [B, 128] — 1 gather
        tag = row[..., 0]
        is_leaf = live & (tag < 0)
        is_inner = live & (tag > 0)

        t = c['t']

        # ---- leaf: up to 12 inline triangles (field-major layout) ----
        ntr = (-tag).astype(jnp.int32)
        tris = row[..., LEAF_TRIS:LEAF_TRIS + 9 * LEAF_MAX].reshape(
            *B, 9, LEAF_MAX)
        v0 = jnp.moveaxis(tris[..., 0:3, :], -2, -1)   # [B, 12, 3]
        v1 = jnp.moveaxis(tris[..., 3:6, :], -2, -1)
        v2 = jnp.moveaxis(tris[..., 6:9, :], -2, -1)
        h, tt, _, _ = isect.ray_triangle(ro[..., None, :], rd[..., None, :],
                                         v0, v1, v2)
        lv = h & (lane12 < ntr[..., None]) & (tt < t[..., None]) \
            & is_leaf[..., None]
        # min-reduce + equality re-select instead of argmin/take_along_axis:
        # per-lane dynamic gathers cost as much as a full table gather on TPU
        tt = jnp.where(lv, tt, T_MAX)
        leaf_best_t = jnp.min(tt, axis=-1)
        gids = jax.lax.bitcast_convert_type(
            row[..., LEAF_GIDS:LEAF_GID_MAX], jnp.int32)
        leaf_gid = jnp.min(jnp.where(tt == leaf_best_t[..., None], gids,
                                     jnp.int32(2**30)), axis=-1)
        leaf_found = jnp.any(lv, axis=-1)
        t = jnp.where(leaf_found, leaf_best_t, t)
        best = jnp.where(leaf_found, leaf_gid, c['best'])
        found = c['found'] | leaf_found

        # ---- inner: 16 slab tests, nearest-first descent ----
        box = row[..., INNER_BOX0:INNER_BOX0 + 6 * ARITY].reshape(*B, 6, ARITY)
        bt0 = (box[..., 0:3, :] - ro[..., None]) * inv_rd[..., None]
        bt1 = (box[..., 3:6, :] - ro[..., None]) * inv_rd[..., None]
        tmin = jnp.max(jnp.minimum(bt0, bt1), axis=-2)    # [B, 16]
        tmax = jnp.min(jnp.maximum(bt0, bt1), axis=-2)
        chit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t[..., None])
        chit = chit & ((c['cur_mask'][..., None] & slot_bits) == 0)
        chit = chit & is_inner[..., None]
        # gate by the slot count: empty slots' inside-out sentinel boxes can
        # overflow to +-inf in the slab test and must never be entered (their
        # ref of 0 would cycle back to the root)
        n_child = tag.astype(jnp.int32)
        chit = chit & (jnp.arange(ARITY, dtype=jnp.int32) < n_child[..., None])
        tsel = jnp.where(chit, tmin, T_MAX)
        tbest_child = jnp.min(tsel, axis=-1)
        is_sel = (tsel == tbest_child[..., None]) & chit
        # break ties toward the lowest slot by selecting the min slot index
        sel_slot = jnp.min(jnp.where(is_sel,
                                     jnp.arange(ARITY, dtype=jnp.int32),
                                     jnp.int32(ARITY)), axis=-1)
        sel_onehot = jnp.arange(ARITY, dtype=jnp.int32) == sel_slot[..., None]
        has_child = jnp.any(chit, axis=-1)
        refs = jax.lax.bitcast_convert_type(
            row[..., INNER_REFS:INNER_REFS + ARITY], jnp.int32)
        child = jnp.sum(jnp.where(sel_onehot, refs, 0), axis=-1)
        nhits = jnp.sum(chit, axis=-1)
        sel_bit = jnp.left_shift(jnp.int32(1), jnp.minimum(sel_slot, ARITY - 1))
        new_mask = c['cur_mask'] | sel_bit

        # push (cur, new_mask) when siblings remain
        do_push = is_inner & has_child & (nhits > 1)
        sp = c['sp']
        iota = jnp.arange(D, dtype=jnp.int32)
        at_sp = (iota == sp[..., None]) & do_push[..., None]
        stack_node = jnp.where(at_sp, cur[..., None], c['stack_node'])
        stack_mask = jnp.where(at_sp, new_mask[..., None], c['stack_mask'])
        sp = sp + do_push.astype(jnp.int32)

        # descend / pop (satisfied stop-on-hit lanes halt immediately)
        stopped = stop_on_hit & found
        descend = is_inner & has_child & ~stopped
        can_pop = live & ~descend & (sp > 0) & ~stopped
        pop_onehot = iota == jnp.maximum(sp - 1, 0)[..., None]
        popped_node = jnp.sum(jnp.where(pop_onehot, stack_node, 0), axis=-1)
        popped_mask = jnp.sum(jnp.where(pop_onehot, stack_mask, 0), axis=-1)
        sp = sp - can_pop.astype(jnp.int32)

        nxt = jnp.where(descend, child,
                        jnp.where(can_pop, popped_node, -1))
        nxt_mask = jnp.where(descend, 0,
                             jnp.where(can_pop, popped_mask, 0))
        cur = jnp.where(live, nxt, cur)
        cur_mask = jnp.where(live, nxt_mask, c['cur_mask'])

        return dict(cur=cur, cur_mask=cur_mask, sp=sp,
                    stack_node=stack_node, stack_mask=stack_mask,
                    t=t, best=best, found=found)

    init = dict(
        cur=start,
        cur_mask=jnp.zeros(B, jnp.int32),
        sp=jnp.zeros(B, jnp.int32),
        stack_node=jnp.zeros((*B, D), jnp.int32),
        stack_mask=jnp.zeros((*B, D), jnp.int32),
        t=t0,
        best=jnp.full(B, -1, jnp.int32),
        found=jnp.zeros(B, bool))

    if wide_rows.shape[0] > 0:
        final = jax.lax.while_loop(cond, body, init)
        t, best, found = final['t'], final['best'], final['found']
    else:
        t, best, found = t0, init['best'], init['found']

    ptype = jnp.where(found, PRIM_TRIANGLE, ptype0)
    pid = jnp.where(found, best, pid0)
    intersected = active & (found | found0)
    return Hit(t=t, prim_type=ptype, prim_id=pid, intersected=intersected)
