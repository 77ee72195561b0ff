"""Price the share-K batched-visit step (kernel_lab3 `share8`) on REAL
sibenik bounce wavefronts by exact kernel-semantics simulation.

kernel_lab3 measured a step that serves 8 inner visits under ONE cross-lane
any-reduce at 140.7 ns/visit vs the v2 step's 433 — but with SCRIPTED node
indices. A real kernel must feed those 8 slots from the packet's own
multi-push stack, which changes the schedule three ways this sim prices:

  1. slot fill: early/late in the traversal the stack holds < K pending
     children, so steps run partially empty (padded slots cost vector time
     but do no work);
  2. delayed t-tightening: all K visits in a step cull against the t
     snapshot at step START (leaf hits land at step end), so later steps
     may visit children a sequential descent would have culled -> union
     visit inflation;
  3. scheduling policy: which pending children fill a step (LIFO unspool
     order; leaf-first vs inner-first when both are pending — leaves
     tighten t, so draining them early should cut inflation).

Outputs per policy: union visits (inner+leaf), steps by type, slot fill,
and a projected ns/ray from the kernel_lab3-measured per-step costs.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/sharek_sim.py \
           [npackets] [K...]
"""
import os
import sys

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(__file__) + '/..')

from cuda_pathtracer_tpu.scene.builder import get_scene
from cuda_pathtracer_tpu.core import camera as cam_mod
from cuda_pathtracer_tpu.ops import traverse_packet as tpk
from cuda_pathtracer_tpu.ops import traverse_packet2 as tpk2
from cuda_pathtracer_tpu.ops.traverse_packet import PACKET, PBOX0, PTRIS
from cuda_pathtracer_tpu.ops.traverse_packet2 import PMETA, META_BASE_BITS
from cuda_pathtracer_tpu.accel.wide import ARITY, LEAF_MAX

BIG = 3.0e38
NP_ = int(sys.argv[1]) if len(sys.argv) > 1 else 48
KS = [int(a) for a in sys.argv[2:]] or [8]

scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
dyn = scene.dynamic_arrays()
merged = tpk2.build_merged_table(np.asarray(dyn.wide_rows), scene.wide_depth)
rows = np.asarray(merged.rows)
boxes = rows[:, PBOX0:PBOX0 + 96].reshape(-1, 6, ARITY)
metas = rows[:, PMETA].view(np.int32)
tris = rows[:, PTRIS:PTRIS + 9 * LEAF_MAX].reshape(-1, 9, LEAF_MAX)

cam = cam_mod.Camera.create([0.0, 5.0, -16.0], [0, 0, 1], 1.5, 12.0, 0.0)
W, H = 1920, 192
B = W * H
ys, xs = np.mgrid[0:H, 0:W]
import jax.numpy as jnp
ro, rd = cam_mod.generate_rays_simple(
    cam, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), W, 1080)
ron, rdn = np.asarray(ro), np.asarray(rd)

# bounce wavefront: brute hit points + hemisphere dirs, morton+oct sorted
# (same construction as tools/multipush_lab.py)
tables1 = tpk.split_packet_tables(np.asarray(dyn.wide_rows), scene.wide_depth)
h1 = tpk.traverse_packet(jax.device_put(scene.to_device()), tables1, ro, rd,
                         interpret=False) if False else None
# CPU: reuse the sim itself for primary hits (cheap enough at NP_ packets)


def slab_chit(cur, inv, oiv, t):
    bx = boxes[cur]
    t0 = bx[0:3, :, None] * inv.T[:, None, :] - oiv.T[:, None, :]
    t1 = bx[3:6, :, None] * inv.T[:, None, :] - oiv.T[:, None, :]
    tmin = np.maximum(np.minimum(t0, t1).max(0), 0.0)
    tmax = np.maximum(t0, t1).min(0)
    chit = (tmax >= tmin) & (np.minimum(t0, t1).max(0) < t[None, :])
    return int(((chit.any(1)) * (1 << np.arange(ARITY))).sum())


def leaf_tmin(cur, o, d, t):
    row = tris[cur]
    v0 = row[0:3].T[:, None, :]
    e1 = row[3:6].T[:, None, :]
    e2 = row[6:9].T[:, None, :]
    h = np.cross(d[None], e2)
    a = (e1 * h).sum(-1)
    f = np.where(np.abs(a) < 1e-4, 1.0,
                 1.0 / np.where(np.abs(a) < 1e-4, 1.0, a))
    s = o[None] - v0
    u = f * (s * h).sum(-1)
    qv = np.cross(s, e1)
    vv = f * (d[None] * qv).sum(-1)
    tt = f * (e2 * qv).sum(-1)
    ok = ((np.abs(a) >= 1e-4) & (u >= 0) & (u <= 1) & (vv >= 0)
          & (u + vv <= 1) & (tt > 0) & (tt < t[None, :]))
    return np.where(ok, tt, 1e30).min(0), ok.any(0)


def unspool(bits, meta):
    """All children of a stack entry, kernel bit order (lowest first)."""
    out = []
    base = meta & ((1 << META_BASE_BITS) - 1)
    n_inner = meta >> META_BASE_BITS
    while bits:
        low = bits & (-bits)
        j = low.bit_length() - 1
        child = base + j
        out.append(child if j < n_inner else ~child)
        bits ^= low
    return out


def sim_v2(o, d):
    """Sequential v2 schedule: steps == visits."""
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / d).astype(np.float32)
    oiv = (o * inv).astype(np.float32)
    t = np.full(PACKET, 1e30, np.float32)
    stack = [(1, -(1 << META_BASE_BITS) * 0)]  # sentinel replaced below
    # root visit is index 0 inner
    cur, iv, lv = 0, 0, 0
    stack = []
    while cur is not None:
        if cur >= 0:
            iv += 1
            bits = slab_chit(cur, inv, oiv, t)
            meta = int(metas[cur])
            kids = unspool(bits, meta)
            if kids:
                cur = kids[0]
                if kids[1:]:
                    stack.append(kids[1:])
                continue
        else:
            lv += 1
            tm, any_ok = leaf_tmin(~cur, o, d, t)
            t = np.where(any_ok, np.minimum(t, tm), t)
        while stack:
            top = stack[-1]
            cur = top.pop(0)
            if not top:
                stack.pop()
            break
        else:
            cur = None
    return iv, lv, iv + lv, t


def sim_shareK(o, d, K, policy='inner-first'):
    """Batched schedule: per step pop up to K pending children of ONE type
    (inner or leaf), visit them against the step-start t snapshot, apply
    leaf t updates at step end, push inner results LIFO.

    policy: 'leaf-first'  — drain any pending leaves before inner work
            'inner-first' — leaves only when no inner work is pending
            'leaf-full'   — leaf step as soon as K leaves are pending
                            (full fill AND early t-tightening), else inner"""
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / d).astype(np.float32)
    oiv = (o * inv).astype(np.float32)
    t = np.full(PACKET, 1e30, np.float32)
    pend_i = [0]            # pending inner child indices, LIFO
    pend_l = []             # pending leaf indices, LIFO
    iv = lv = 0
    steps_i = steps_l = 0
    slots_i = slots_l = 0
    while pend_i or pend_l:
        if policy == 'leaf-first':
            take_leaf = bool(pend_l)
        elif policy == 'leaf-full':
            take_leaf = len(pend_l) >= K or not pend_i
        else:
            take_leaf = not pend_i
        if take_leaf:
            batch = [pend_l.pop() for _ in range(min(K, len(pend_l)))]
            steps_l += 1
            slots_l += K
            lv += len(batch)
            t_snap = t.copy()
            for cur in batch:
                tm, any_ok = leaf_tmin(cur, o, d, t_snap)
                t = np.where(any_ok, np.minimum(t, tm), t)
        else:
            batch = [pend_i.pop() for _ in range(min(K, len(pend_i)))]
            steps_i += 1
            slots_i += K
            iv += len(batch)
            t_snap = t.copy()
            pushes = []
            for cur in batch:
                bits = slab_chit(cur, inv, oiv, t_snap)
                for c in unspool(bits, int(metas[cur])):
                    pushes.append(c)
            # LIFO push so the deepest-pushed (last) pops first next step
            for c in pushes:
                if c >= 0:
                    pend_i.append(c)
                else:
                    pend_l.append(~c)
    return dict(iv=iv, lv=lv, steps_i=steps_i, steps_l=steps_l,
                fill_i=iv / max(1, slots_i), fill_l=lv / max(1, slots_l),
                t=t)


def sim_share_entries(o, d, K):
    """EXACT kernel-schedule sim: typed (bits, base) entry stacks; an inner
    step unspools up to K inner children from the stack top (remainder
    written back), a leaf step likewise from the leaf stack; leaf-full
    policy (leaf step when >= K leaf children pending or no inner work).
    Tracks max stack depths for SMEM sizing."""
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / d).astype(np.float32)
    oiv = (o * inv).astype(np.float32)
    t = np.full(PACKET, 1e30, np.float32)
    stk_i = [(1, 0)]        # (bits, base): children {base+j for set j}
    stk_l = []
    cnt_l = 0
    iv = lv = steps_i = steps_l = 0
    max_i = max_l = 0
    while stk_i or stk_l:
        max_i = max(max_i, len(stk_i))
        max_l = max(max_l, len(stk_l))
        take_leaf = bool((cnt_l >= K or not stk_i) and stk_l)
        stk = stk_l if take_leaf else stk_i
        idxs = []
        bits, base = stk.pop()
        for _ in range(K):
            if not bits:
                if not stk:
                    break
                bits, base = stk.pop()
            low = bits & (-bits)
            idxs.append(base + (low.bit_length() - 1))
            bits ^= low
        if bits:
            stk.append((bits, base))
        t_snap = t.copy()
        if take_leaf:
            steps_l += 1
            lv += len(idxs)
            cnt_l -= len(idxs)
            for cur in idxs:
                tm, any_ok = leaf_tmin(cur, o, d, t_snap)
                t = np.where(any_ok, np.minimum(t, tm), t)
        else:
            steps_i += 1
            iv += len(idxs)
            for cur in idxs:
                hm = slab_chit(cur, inv, oiv, t_snap)
                meta = int(metas[cur])
                b = meta & ((1 << META_BASE_BITS) - 1)
                ni = meta >> META_BASE_BITS
                bi = hm & ((1 << ni) - 1)
                bl = hm >> ni
                if bi:
                    stk_i.append((bi, b))
                if bl:
                    stk_l.append((bl, b + ni))
                    cnt_l += bin(bl).count('1')
    return dict(iv=iv, lv=lv, steps_i=steps_i, steps_l=steps_l,
                fill_i=iv / max(1, steps_i * K),
                fill_l=lv / max(1, steps_l * K),
                max_i=max_i, max_l=max_l, t=t)


rng = np.random.default_rng(7)
sel = rng.choice(B // PACKET, size=min(NP_, B // PACKET), replace=False)

# build the bounce wavefront from the v2 sim's own primary hits
hp = np.empty_like(ron)
d2 = rng.normal(size=(B, 3)).astype(np.float32)
d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
flip = (d2 * rdn).sum(1) > 0
d2[flip] = -d2[flip]

# primary hits only for the selected packets (cheap CPU path)
prim_t = {}
for pidx in sel:
    sl = slice(pidx * PACKET, (pidx + 1) * PACKET)
    _, _, _, tfin = sim_v2(ron[sl], rdn[sl])
    prim_t[pidx] = np.minimum(tfin, 100.0)

# morton+oct sort over the selected packets' bounce rays, like the engine
all_hp, all_d2 = [], []
for pidx in sel:
    sl = slice(pidx * PACKET, (pidx + 1) * PACKET)
    all_hp.append((ron[sl] + rdn[sl] * (prim_t[pidx][:, None] - 1e-3))
                  .astype(np.float32))
    all_d2.append(d2[sl])
hp_c = np.concatenate(all_hp)
d2_c = np.concatenate(all_d2)
q = ((hp_c - hp_c.min(0)) / (np.ptp(hp_c, 0) + 1e-6) * 1023).astype(np.int64)


def spread(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
oct_ = ((d2_c[:, 0] > 0).astype(np.int64)
        | ((d2_c[:, 1] > 0).astype(np.int64) << 1)
        | ((d2_c[:, 2] > 0).astype(np.int64) << 2))
om = np.argsort((morton << 3) | oct_, kind='stable')
hp_s, d2_s = hp_c[om], d2_c[om]
NPK_SIM = hp_s.shape[0] // PACKET

# measured per-step costs (kernel_lab3, ns): v2 inner/leaf full steps and
# the share8 batched step (per STEP = per_visit * 8)
C_V2_I, C_V2_L = 433.2, 386.7
C_S8_I = 140.7 * 8
C_S8_L = 206.0 * 8        # estimate: loop/8 + leaf vector (no x-lane reduce)

tot = {}
base_iv = base_lv = 0
POLICIES = ['leaf-first', 'inner-first', 'leaf-full', 'entries']
res = {(k, p): [] for k in KS for p in POLICIES}
for p in range(NPK_SIM):
    sl = slice(p * PACKET, (p + 1) * PACKET)
    o_, d_ = hp_s[sl], d2_s[sl]
    iv, lv, _, _ = sim_v2(o_, d_)
    base_iv += iv
    base_lv += lv
    for k in KS:
        for pol in POLICIES:
            if pol == 'entries':
                res[(k, pol)].append(sim_share_entries(o_, d_, k))
            else:
                res[(k, pol)].append(sim_shareK(o_, d_, k, policy=pol))

rays = NPK_SIM * PACKET
ns_v2 = (base_iv * C_V2_I + base_lv * C_V2_L) / rays
print(f'packets={NPK_SIM} rays={rays}  v2: inner {base_iv/NPK_SIM:.1f} '
      f'leaf {base_lv/NPK_SIM:.1f} /packet -> {ns_v2:.0f} ns/ray '
      f'({1e3/ns_v2:.2f} Mrays/s-equiv)')
for k in KS:
    for name in POLICIES:
        rs = res[(k, name)]
        iv = sum(r['iv'] for r in rs)
        lv = sum(r['lv'] for r in rs)
        si = sum(r['steps_i'] for r in rs)
        sl_ = sum(r['steps_l'] for r in rs)
        ns = (si * C_S8_I * k / 8 + sl_ * C_S8_L * k / 8) / rays
        extra = ''
        if name == 'entries':
            extra = (f' maxstk {max(r["max_i"] for r in rs)}i/'
                     f'{max(r["max_l"] for r in rs)}l')
        print(f'K={k:2d} {name:11s}: inner {iv/NPK_SIM:7.1f} '
              f'(x{iv/base_iv:.3f}) leaf {lv/NPK_SIM:7.1f} '
              f'(x{lv/base_lv:.3f}) steps {si/NPK_SIM:6.1f}+{sl_/NPK_SIM:6.1f} '
              f'fill {iv/max(1,si*k):.2f}/{lv/max(1,sl_*k):.2f} '
              f'-> {ns:.0f} ns/ray ({ns_v2/ns:.2f}x vs v2){extra}')
