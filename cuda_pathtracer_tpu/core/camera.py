"""Pinhole + thin-lens camera with barrel distortion.

Functional mirror of the reference Camera (src/types.h:586-677): the pytree
holds only the five persisted parameters (eye, viewDir, d, focalLength,
aperture — the same fields stateLoader.h:35-75 round-trips through save.txt);
the basis (lt, u, v) is re-derived inside the traced computation, so moving the
camera never triggers a recompile.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import rng as _rng
from . import vecmath as vm
from ..constants import PI


class Camera(NamedTuple):
    eye: jnp.ndarray          # f32[3]
    view_dir: jnp.ndarray     # f32[3]
    d: jnp.ndarray            # f32[] screen plane distance
    focal_length: jnp.ndarray  # f32[]
    aperture: jnp.ndarray     # f32[]

    @staticmethod
    def create(eye, view_dir, d=1.5, focal_length=5.0, aperture=0.01):
        return Camera(jnp.asarray(eye, jnp.float32),
                      jnp.asarray(view_dir, jnp.float32),
                      jnp.asarray(d, jnp.float32),
                      jnp.asarray(focal_length, jnp.float32),
                      jnp.asarray(aperture, jnp.float32))


def default_camera() -> Camera:
    """The fallback camera of stateLoader.h:30-33."""
    return Camera.create([0.0, 2.0, -3.0], [0.0, 0.0, 1.0], 1.5, 5.0, 0.01)


def basis(cam: Camera, width: int, height: int):
    """Derive (lt, u, v) exactly as Camera::recalculate (src/types.h:590-600)."""
    center = cam.eye + cam.d * cam.view_dir
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    u = vm.normalize(vm.cross(up, cam.view_dir))
    v = vm.normalize(vm.cross(cam.view_dir, u))
    ar = jnp.float32(width / height)
    lt = center - u * ar - v
    return lt, 2.0 * ar * u, 2.0 * v


def _distort(cam: Camera, p):
    """Barrel distortion r -> r + 0.2 r^3 about the view center
    (src/types.h:669-676)."""
    center = cam.eye + cam.d * cam.view_dir
    from_center = p - center
    r = vm.length(from_center)
    rd = r + 0.2 * r * r * r
    return center + from_center * (rd / jnp.maximum(1e-4, r))[..., None]


def generate_rays(cam: Camera, xs, ys, seeds, width: int, height: int,
                  rand_state: _rng.RandState | None = None):
    """Primary rays with AA jitter, distortion and lens sampling.

    Vectorized Camera::getRay(x, y, seed) (src/types.h:641-658). `xs`/`ys` are
    integer pixel coordinates of any batch shape; draws use the blue-noise-aware
    stream when `rand_state` is given, else raw xorshift from `seeds`.
    Returns (origin[...,3], direction[...,3], rand_state_after).
    """
    if rand_state is None:
        rand_state = _rng.make_state(seeds)
    r1, rand_state = _rng.rand(rand_state)
    r2, rand_state = _rng.rand(rand_state)
    xf = (xs.astype(jnp.float32) + r1) / jnp.float32(width)
    yf = (ys.astype(jnp.float32) + r2) / jnp.float32(height)

    lt, u, v = basis(cam, width, height)
    origin = _distort(cam, lt + xf[..., None] * u + yf[..., None] * v)
    direction = origin - cam.eye
    correction = vm.length(direction)
    direction = direction / correction[..., None]
    focal_point = origin + (cam.focal_length - cam.d) * direction

    r3, rand_state = _rng.rand(rand_state)
    r4, rand_state = _rng.rand(rand_state)
    offset_r = jnp.sqrt(r3)
    offset_a = r4 * jnp.float32(2.0 * PI)
    fx = offset_r * jnp.sin(offset_a)
    fy = offset_r * jnp.cos(offset_a)
    origin = origin + cam.aperture * (fx[..., None] * u + fy[..., None] * v)
    direction = vm.normalize(focal_point - origin)
    # reject directions pointing backwards through the lens (types.h:654)
    flip = vm.dot(direction, cam.view_dir) < 0
    direction = jnp.where(flip[..., None], -direction, direction)
    origin = origin - correction[..., None] * direction
    return origin, direction, rand_state


def generate_rays_simple(cam: Camera, xs, ys, width: int, height: int):
    """Jitter-free pinhole rays — Camera::getRay(x, y) (src/types.h:660-667),
    used by the Whitted raytracer mode and click-to-focus."""
    xf = xs.astype(jnp.float32) / jnp.float32(width)
    yf = ys.astype(jnp.float32) / jnp.float32(height)
    lt, u, v = basis(cam, width, height)
    point = _distort(cam, lt + xf[..., None] * u + yf[..., None] * v)
    direction = vm.normalize(point - cam.eye)
    origin = jnp.broadcast_to(cam.eye, direction.shape)
    return origin, direction


# ---------------------------------------------------------------------------
# Host-side interactive updates (the WASD/arrow/PgUp-PgDn handling of
# src/types.h:612-637). Pure: returns (new_camera, has_moved).
# ---------------------------------------------------------------------------

MOVE_SPEED = 0.08
LOOK_SPEED = 0.02
APERTURE_SPEED = 0.001


def update_camera(cam: Camera, actions: set) -> tuple[Camera, bool]:
    eye = np.asarray(cam.eye, np.float64).copy()
    view = np.asarray(cam.view_dir, np.float64).copy()
    aperture = float(cam.aperture)

    def _norm(v):
        return v / max(np.linalg.norm(v), 1e-12)

    side = _norm(np.cross([0.0, 1.0, 0.0], view))
    if 'move_forward' in actions:
        eye += MOVE_SPEED * view
    if 'move_backward' in actions:
        eye -= MOVE_SPEED * view
    if 'move_left' in actions:
        eye -= MOVE_SPEED * side
    if 'move_right' in actions:
        eye += MOVE_SPEED * side
    if 'look_up' in actions:
        view[1] += LOOK_SPEED
    if 'look_down' in actions:
        view[1] -= LOOK_SPEED
    if 'look_left' in actions:
        view -= LOOK_SPEED * side
    if 'look_right' in actions:
        view += LOOK_SPEED * side
    if 'aperture_up' in actions:
        aperture += APERTURE_SPEED
    if 'aperture_down' in actions:
        aperture -= APERTURE_SPEED
    view = _norm(view)

    moved = (not np.allclose(eye, np.asarray(cam.eye, np.float64))
             or not np.allclose(view, np.asarray(cam.view_dir, np.float64))
             or aperture != float(cam.aperture))
    new = Camera.create(eye, view, float(cam.d), float(cam.focal_length), aperture)
    return new, moved
