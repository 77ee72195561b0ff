"""Click-to-focus: trace one ray through the scene and set the focal length.

The reference does this on the host by reusing the HYBRID traversal against
the CPU scene buffers (src/main.cpp:381-393); here it is the same device
traversal with a single-ray batch.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import camera as cam_mod
from ..ops.traverse import traverse


def click_to_focus(camera, scene_arrays, dyn, x: int, y: int,
                   width: int, height: int):
    """Returns (new_camera, hit: bool). `y` is measured from the bottom, as
    in the reference's WINDOW_HEIGHT - mousey flip (main.cpp:385)."""
    xs = jnp.asarray([x], jnp.int32)
    ys = jnp.asarray([y], jnp.int32)
    ro, rd = cam_mod.generate_rays_simple(camera, xs, ys, width, height)
    hit = traverse(scene_arrays, dyn.world, ro, rd)
    if not bool(hit.intersected[0]):
        return camera, False
    new = camera._replace(focal_length=jnp.asarray(float(hit.t[0]), jnp.float32))
    return new, True
