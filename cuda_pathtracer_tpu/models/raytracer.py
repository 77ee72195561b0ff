"""Whitted-style raytracer mode.

Behavioral mirror of the reference's OpenMP CPU raytracer
(src/raytracer.h:17-165): point-light direct lighting with hard shadows,
recursive reflect/refract with Fresnel reweighting and Beer absorption, the
checkerboard plane, sky constant (0.2, 0.3, 0.6), depth 2 interactive / 7
converged.

TPU-first restructuring: the reference recurses per pixel; here the recursion
tree is evaluated level-synchronously — each depth is one batched wavefront
(traversal + shading over all live recursion nodes at that depth), children
(refract/reflect) are spawned into the next level's lane set, and node
contributions scatter-add into the framebuffer with a segment-sum. Every
level's lane count is capped at 2x the pixel count with weight-priority
compaction (a bounded-memory deviation from true unbounded recursion; pure
binary branching only occurs for Fresnel-split dielectrics, which real scenes
keep far under the cap).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .shading import _refract, _reflect_ray
from ..core import camera as cam_mod
from ..core import vecmath as vm
from ..ops.traverse import PRIM_TRIANGLE, PRIM_SPHERE, PRIM_PLANE
from ..ops.dispatch import trace
from ..constants import EPS
from . import film

SKY_COLOR = (0.2, 0.3, 0.6)  # src/raytracer.h:89


def _shade_level(scene, dyn, ro, rd, weight, pixel, active, width, wide_depth=0):
    """Shade one recursion level; returns (contribution [B?,3] scattered adds,
    child rays). Mirrors Raytracer::radiance (src/raytracer.h:85-165)."""
    f3 = lambda m: m[..., None]  # noqa: E731
    B = ro.shape[0]

    hit = trace(scene, dyn, ro, rd, active=active, wide_depth=wide_depth)
    live = hit.intersected

    # sky for misses (raytracer.h:89)
    sky = jnp.array(SKY_COLOR, jnp.float32)
    contrib = jnp.where(f3(active & ~live), weight * sky, 0.0)

    pid = jnp.maximum(hit.prim_id, 0)
    gid = jnp.maximum(dyn.world.tri_gid[pid], 0)
    inst = jnp.maximum(dyn.world.tri_inst[pid], 0)
    is_tri = live & (hit.prim_type == PRIM_TRIANGLE)
    is_sphere = live & (hit.prim_type == PRIM_SPHERE)
    is_plane = live & (hit.prim_type == PRIM_PLANE)
    pos = ro + f3(hit.t) * rd

    n_sph = scene.sphere_mat.shape[0]
    n_pla = scene.plane_mat.shape[0]
    override = dyn.inst_mat[inst]
    mid = jnp.where(override >= 0, override, scene.tri_mat[gid])
    if n_sph:
        mid = jnp.where(is_sphere, scene.sphere_mat[jnp.clip(pid, 0, n_sph - 1)], mid)
    if n_pla:
        mid = jnp.where(is_plane, scene.plane_mat[jnp.clip(pid, 0, n_pla - 1)], mid)
    mid = jnp.clip(mid, 0, scene.mat_diffuse.shape[0] - 1)

    diffuse_color = scene.mat_diffuse[mid]
    transmit = scene.mat_transmit[mid]
    reflect_f = scene.mat_reflect[mid]
    ior = scene.mat_ior[mid]
    absorption = scene.mat_absorption[mid]

    normal = vm.normalize(
        vm.transform_dir(dyn.inst_transform[inst], scene.tri_normal[gid]),
        eps=1e-12)
    if n_sph:
        sph_c = scene.sphere_pos[jnp.clip(pid, 0, n_sph - 1)]
        normal = jnp.where(f3(is_sphere), vm.normalize(pos - sph_c, eps=1e-12),
                           normal)
    if n_pla:
        normal = jnp.where(f3(is_plane),
                           scene.plane_normal[jnp.clip(pid, 0, n_pla - 1)],
                           normal)
    inside = vm.dot(rd, normal) > 0.0
    collider_normal = jnp.where(f3(inside), -normal, normal)

    # checkerboard (raytracer.h:109-114 — no +1000 offset in this mode)
    if n_pla:
        px = jnp.abs(pos[..., 0] / 4.0).astype(jnp.uint32)
        py = jnp.abs(pos[..., 2] / 4.0).astype(jnp.uint32)
        checker = jnp.where(((px + py) % 2 == 0)[..., None],
                            jnp.ones(3, jnp.float32),
                            jnp.full(3, 0.2, jnp.float32))
        diffuse_color = jnp.where(f3(is_plane), checker, diffuse_color)

    diffuse = 1.0 - transmit - reflect_f

    # point-light direct lighting with hard shadows (raytracer.h:120-137)
    direct = jnp.zeros_like(diffuse_color)
    n_lights = int(scene.point_light_pos.shape[0])
    for li in range(n_lights):
        lpos = scene.point_light_pos[li]
        lcol = scene.point_light_color[li]
        from_light = pos - lpos
        facing = vm.dot(from_light, collider_normal) < 0.0
        d2 = vm.dot(from_light, from_light)
        dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
        fl = from_light / f3(dist)
        sro = lpos + EPS * fl
        shadow_active = live & facing & (diffuse > 0.0)
        shadow = trace(scene, dyn,
                       jnp.broadcast_to(sro, ro.shape), fl,
                       t_max=dist - 2.0 * EPS,
                       active=shadow_active, any_hit=True,
                       wide_depth=wide_depth)
        lit = shadow_active & ~shadow.intersected
        direct = direct + jnp.where(f3(lit),
                                    lcol * f3(vm.dot(-fl, collider_normal) / d2),
                                    0.0)

    contrib = contrib + jnp.where(
        f3(live & (diffuse > 0.0)),
        weight * diffuse_color * f3(diffuse) * direct, 0.0)

    # Fresnel reweighting (raytracer.h:140-156)
    refr_o, refr_d, refl_prob, _ = _refract(rd, collider_normal, pos, ior,
                                            absorption, inside, hit.t)
    has_transmit = live & (transmit > 0.0)
    changed = jnp.where(has_transmit, refl_prob, 0.0)
    transmit_eff = transmit - changed
    reflect_eff = reflect_f + changed

    beer = jnp.where(f3(inside), jnp.exp(-absorption * f3(hit.t)), 1.0)
    refract_child_active = has_transmit & (transmit_eff > 0.0)
    refract_w = jnp.where(f3(refract_child_active),
                          weight * diffuse_color * f3(transmit_eff) * beer, 0.0)

    refl_o, refl_d = _reflect_ray(rd, collider_normal, pos)
    reflect_child_active = live & (reflect_eff > 0.0)
    reflect_w = jnp.where(f3(reflect_child_active),
                          weight * diffuse_color * f3(reflect_eff), 0.0)

    children = (
        (refr_o, refr_d, refract_w, pixel,
         refract_child_active & (vm.max_comp(refract_w) > 1e-5)),
        (refl_o, refl_d, reflect_w, pixel,
         reflect_child_active & (vm.max_comp(reflect_w) > 1e-5)),
    )
    return contrib, pixel, children


def _compact(ro, rd, w, pixel, active, cap: int):
    """Weight-priority compaction to a fixed lane budget."""
    score = jnp.where(active, vm.max_comp(w), -1.0)
    order = jnp.argsort(-score)[:cap]
    return (ro[order], rd[order], w[order], pixel[order], active[order])


@partial(jax.jit, static_argnames=('width', 'height', 'max_depth',
                                   'wide_depth'))
def render_whitted(scene, dyn, camera, *, width: int, height: int,
                   max_depth: int, wide_depth: int = 0):
    """One full Whitted frame -> f32[H*W, 3] (Raytracer::Render,
    src/raytracer.h:62-83 — one jitter-free ray per pixel)."""
    B = width * height
    lanes = jnp.arange(B, dtype=jnp.int32)
    xs = lanes % width
    ys = lanes // width
    ro, rd = cam_mod.generate_rays_simple(camera, xs, ys, width, height)

    out = jnp.zeros((B, 3), jnp.float32)
    weight = jnp.ones((B, 3), jnp.float32)
    pixel = lanes
    active = jnp.ones(B, bool)
    cap = 2 * B

    for depth in range(max_depth):
        contrib, pix, children = _shade_level(scene, dyn, ro, rd, weight,
                                              pixel, active, width,
                                              wide_depth)
        out = out.at[pix].add(contrib, mode='drop')
        if depth == max_depth - 1:
            break
        parts = [c for c in children]
        ro = jnp.concatenate([p[0] for p in parts])
        rd = jnp.concatenate([p[1] for p in parts])
        weight = jnp.concatenate([p[2] for p in parts])
        pixel = jnp.concatenate([p[3] for p in parts])
        active = jnp.concatenate([p[4] for p in parts])
        if ro.shape[0] > cap:
            ro, rd, weight, pixel, active = _compact(ro, rd, weight, pixel,
                                                     active, cap)
    return out


class Raytracer:
    """Interactive Whitted mode (the reference's Raytracer Application,
    src/raytracer.h:17-31). Runs on whatever JAX backend is active — the
    'CPU mode' of the reference maps to jit-on-CPU, but it runs equally on
    the TPU."""

    def __init__(self, scene, width: int = 640, height: int = 480,
                 skydome: str | None = None):
        self.scene = scene
        self.width = width
        self.height = height
        self.arrays = scene.to_device(skydome=skydome)
        self.dyn = scene.dynamic_arrays()
        self.frame = jnp.zeros((width * height, 3), jnp.float32)

    def init(self):
        pass

    def render(self, camera, current_time: float = 0.0,
               frame_time: float = 0.0, should_clear: bool = False):
        if should_clear:
            self.dyn = self.scene.dynamic_arrays()
        max_depth = 2 if should_clear else 7   # raytracer.h:65
        wd = -(-self.scene.wide_depth // 4) * 4 if self.scene.wide_depth else 0
        self.frame = render_whitted(self.arrays, self.dyn, camera,
                                    width=self.width, height=self.height,
                                    max_depth=max_depth, wide_depth=wd)

    def finish(self):
        self.frame.block_until_ready()

    def image(self, blur: bool = False):
        """Raytracer output bypasses accumulation: w=1 luminance, no blur
        (main.cpp:370-373 uses the plain quad shader for raytracer mode)."""
        lum = jnp.concatenate([self.frame,
                               jnp.ones((self.frame.shape[0], 1), jnp.float32)],
                              axis=1)
        alb = jnp.ones_like(lum)
        return film.display(lum, alb, 1.0, self.width, self.height, blur=False)
