"""Traversal dispatch: Pallas packet kernel on TPU, fat-row wide BVH on CPU
(and as the large-scene fallback), threaded walk for raw WorldArrays scenes.

`wide_depth` is a static stack bound (rounded up by the caller to limit
recompiles); 0 selects the narrow threaded traversal, which remains the
semantics reference. The packet kernel requires its node tables to fit in
VMEM (~100 MB on v5e per tools/pallas_probe_r2f.py) — scenes beyond that fall
back to the XLA wide path automatically.
"""
from __future__ import annotations

import jax

from .traverse import traverse, Hit
from .traverse_wide import traverse_wide
from .traverse_packet import PacketTables, traverse_packet

# beyond this many table rows (512 B each) the packet tables stop fitting
# comfortably in VMEM alongside the pipeline buffers
PACKET_MAX_ROWS = 180_000


# 'auto': packet kernel on TPU, wide path on CPU (Mosaic is TPU-only; the
# interpreter is far too slow for full renders). Tests force 'on' to exercise
# the packet engine path end-to-end in interpret mode at tiny resolutions.
PACKET_MODE = 'auto'


def use_packet_path(dyn) -> bool:
    if PACKET_MODE == 'off':
        return False
    n_rows = int(dyn.packet_inner.shape[0]) + int(dyn.packet_leaf.shape[0])
    if not (0 < n_rows <= PACKET_MAX_ROWS):
        return False
    return PACKET_MODE == 'on' or jax.default_backend() != 'cpu'


def trace(scene, dyn, ro, rd, *, t_max=None, active=None,
          any_hit: bool = False, stop_on_hit=None, wide_depth: int = 0,
          order=None) -> Hit:
    """`order` (optional i32[B] permutation) pre-sorts rays for packet
    coherence; results come back in the caller's original ray order."""
    if wide_depth > 0 and use_packet_path(dyn):
        tables = PacketTables(dyn.packet_inner, dyn.packet_leaf, wide_depth)
        return traverse_packet(scene, tables, ro, rd, t_max=t_max,
                               active=active, any_hit=any_hit,
                               stop_on_hit=stop_on_hit, order=order,
                               interpret=jax.default_backend() == 'cpu')
    if wide_depth > 0:
        return traverse_wide(scene, dyn.wide_rows, wide_depth, ro, rd,
                             t_max=t_max, active=active, any_hit=any_hit,
                             stop_on_hit=stop_on_hit)
    return traverse(scene, dyn.world, ro, rd, t_max=t_max, active=active,
                    any_hit=any_hit, stop_on_hit=stop_on_hit)
