"""Does a wider (32/64-ary) packet BVH reduce union visits enough to beat
its extra per-visit vector cost? (CPU, numpy)

The packet kernel's per-visit wall is the vector->scalar extraction chain
(~550 ns), which is paid ONCE per node visit regardless of arity; the box
test itself is ~90 ns at 16-ary. Wider nodes amortize the chain over more
children: per-visit cost model
    cost(A) = chain + slab * A / 16
with chain ~ 460 ns and slab ~ 90 ns (tools/kernel_lab.py nodec vs v0,
tools/tpu_step_audit.py). This tool collapses the same binary SAH tree to
arity 16 / 32 / 64 and counts packet-union visits on a realistic sorted
bounce wavefront + a coherent primary wavefront.

PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/arity_study.py
"""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_platforms', 'cpu')
from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet as tpk
import cuda_pathtracer_tpu.models.pathtracer as ptm

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
arrays, dyn = scene.to_device(), scene.dynamic_arrays()
cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 64          # sampled rows: the study is O(rays * visits) python
B = W * H
ys, xs = np.mgrid[0:H, 0:W]
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)

# ---- binary tree from the models' BVHs is not directly exposed; instead
# re-collapse the WIDE rows' implicit tree: treat each 16-ary node's children
# as units and merge parent+child 16-ary levels into 32/64-ary by absorbing
# the children of the largest-SAH child. Simpler, equivalent-quality: rebuild
# a k-ary collapse directly from the binary world tree built by
# accel.build_world_bvh (node_box/node_meta arrays).
world = dyn.world
nb = np.asarray(world.node_box)         # [N, 6] lo|hi
nm = np.asarray(world.node_meta)        # [N, 3] left/right|start|count ?
tris = np.asarray(world.tris)
print('binary nodes', len(nb), 'meta cols', nm.shape)

# node_meta layout (ops/traverse.py:40): [miss, leaf_start, leaf_count],
# nodes in DFS order — inner node i has left child i+1 and right child
# miss[i+1] (the left subtree's miss link points at its sibling)
miss = nm[:, 0]
first = nm[:, 1]
count = nm[:, 2]
N = len(nb)
left = np.arange(1, N + 1)
left = np.clip(left, 0, N - 1)
right = miss[left]


def collapse(root, K):
    """Collapse the binary tree into K-ary nodes: repeatedly expand the
    child with the largest surface area until K children or all leaves."""
    def area(i):
        d = nb[i, 3:6] - nb[i, 0:3]
        return max(d[0] * d[1] + d[1] * d[2] + d[2] * d[0], 0.0)

    nodes = []        # each: (list of child entries); entry = ('n', kid) or ('l', bin_node)
    def build(b):
        # returns index into nodes, or ('leaf', b)
        if count[b] > 0:
            return ('leaf', b)
        kids = [left[b], right[b]]
        while len(kids) < K:
            inner = [k for k in kids if count[k] == 0]
            if not inner:
                break
            k = max(inner, key=area)
            kids.remove(k)
            kids += [left[k], right[k]]
        idx = len(nodes)
        nodes.append(None)
        nodes[idx] = [build(k) for k in kids], [k for k in kids]
        return ('node', idx)

    import sys
    sys.setrecursionlimit(200000)
    r = build(root)
    return nodes, r


def packet_union_visits(nodes, root, o128, d128, t128, K):
    """Union-walk visit count for one packet (exact kernel semantics:
    nearest-first, visited-mask short stack, shrinking t)."""
    with np.errstate(divide='ignore'):
        inv = np.clip(1.0 / d128, -1e30, 1e30)
    t = t128.copy()
    visits = 0
    stack = [(root, 0)]
    while stack:
        (kind, ref), mask = stack.pop()
        visits += 1
        if kind == 'leaf':
            # leaf: intersect tris of that binary leaf
            s, c = first[ref], count[ref]
            tr = tris[s:s + c]
            v0 = tr[:, 0:3]; e1 = tr[:, 3:6] - v0; e2 = tr[:, 6:9] - v0
            h = np.cross(d128[:, None, :], e2[None])
            a = (e1[None] * h).sum(-1)
            f = 1.0 / np.where(np.abs(a) < 1e-4, 1.0, a)
            sv = o128[:, None, :] - v0[None]
            u = f * (sv * h).sum(-1)
            q = np.cross(sv, e1[None])
            vv = f * (d128[:, None, :] * q).sum(-1)
            tt = f * (e2[None] * q).sum(-1)
            ok = ((np.abs(a) >= 1e-4) & (u >= 0) & (u <= 1) & (vv >= 0)
                  & (u + vv <= 1) & (tt > 0) & (tt < t[:, None]))
            t = np.where(ok.any(1),
                         np.minimum(t, np.where(ok, tt, 3e38).min(1)), t)
            continue
        kids_entries, kid_bins = nodes[ref]
        # slab test each child against the packet
        tmins = []
        hits = []
        for j, kb in enumerate(kid_bins):
            if mask >> j & 1:
                tmins.append(np.inf); hits.append(False); continue
            lo, hi = nb[kb, 0:3], nb[kb, 3:6]
            t0 = (lo[None] - o128) * inv
            t1 = (hi[None] - o128) * inv
            tmin = np.minimum(t0, t1).max(1)
            tmax = np.maximum(t0, t1).min(1)
            hit = (tmax >= np.maximum(tmin, 0)) & (tmin < t)
            tmins.append(np.where(hit, tmin, np.inf).min() if hit.any()
                         else np.inf)
            hits.append(hit.any())
        nh = sum(hits)
        if nh == 0:
            continue
        sel = int(np.argmin(tmins))
        if nh > 1:
            stack.append(((('node', ref)[0], ref), mask | (1 << sel)))
            stack[-1] = (('node', ref), mask | (1 << sel))
        stack.append((kids_entries[sel], 0))
    return visits


# wavefronts
h0 = jax.jit(lambda a, b: tpk.traverse_packet(
    arrays, tpk.split_packet_tables(np.asarray(dyn.wide_rows),
                                    scene.wide_depth), a, b,
    interpret=True))
# primary hits via numpy walker would be slow; reuse the wide XLA path
from cuda_pathtracer_tpu.ops.traverse_wide import traverse_wide
wd = -(-scene.wide_depth // 4) * 4
hitw = jax.jit(lambda a, b: traverse_wide(
    arrays, dyn.wide_rows, wd, a, b))(ro, rd)
tn = np.asarray(hitw.t)
ron, rdn = np.asarray(ro), np.asarray(rd)
hp = (ron + rdn * (np.minimum(tn, 100.0)[:, None] - 1e-3)).astype(np.float32)
rng = np.random.default_rng(5)
d2 = rng.normal(size=(B, 3)).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
flip = (d2 * rdn).sum(1) > 0
d2[flip] = -d2[flip]
order = np.asarray(ptm._sort_order(jnp.asarray(hp), jnp.asarray(d2),
                                   dyn.bounds, direction_major=True))
hps, d2s = hp[order], d2[order]

CHAIN, SLAB = 460.0, 90.0
for K in (16, 32, 64):
    nodes, root = collapse(0, K)
    rngg = np.random.default_rng(11)
    gs = rngg.integers(0, B // 128, 10)
    tot_b = 0
    tot_p = 0
    for g in gs:
        sl = slice(g * 128, (g + 1) * 128)
        tot_b += packet_union_visits(nodes, root, hps[sl], d2s[sl],
                                     np.full(128, 1e30), K)
        tot_p += packet_union_visits(nodes, root, ron[sl], rdn[sl],
                                     np.full(128, 1e30), K)
    cost = CHAIN + SLAB * K / 16
    print(f'K={K:3d}: nodes={len(nodes):6d}  bounce visits/pkt='
          f'{tot_b/len(gs):7.1f}  primary={tot_p/len(gs):6.1f}  '
          f'est bounce ns/pkt={tot_b/len(gs)*cost:9.0f}  '
          f'primary={tot_p/len(gs)*cost:8.0f}', flush=True)
