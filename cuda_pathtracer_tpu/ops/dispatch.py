"""Traversal dispatch: fat-row wide BVH when available, threaded walk else.

`wide_depth` is a static stack bound (rounded up by the caller to limit
recompiles); 0 selects the narrow threaded traversal, which remains the
semantics reference and the fallback for raw WorldArrays-only scenes.
"""
from __future__ import annotations

from .traverse import traverse, Hit
from .traverse_wide import traverse_wide


def trace(scene, dyn, ro, rd, *, t_max=None, active=None,
          any_hit: bool = False, stop_on_hit=None, wide_depth: int = 0) -> Hit:
    if wide_depth > 0:
        return traverse_wide(scene, dyn.wide_rows, wide_depth, ro, rd,
                             t_max=t_max, active=active, any_hit=any_hit,
                             stop_on_hit=stop_on_hit)
    return traverse(scene, dyn.world, ro, rd, t_max=t_max, active=active,
                    any_hit=any_hit, stop_on_hit=stop_on_hit)
