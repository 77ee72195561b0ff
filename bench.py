"""Headline benchmark: Mrays/s on the sibenik-class scene at 1080p.

Prints ONE JSON line:
  {"metric": "Mrays/s sibenik-1080p", "value": N, "unit": "Mrays/s",
   "vs_baseline": N}

Baseline: the reference renders sibenik at 130 fps / 640x480 with 1 diffuse +
1 shadow ray on a GTX 960M (README.md:202) ≈ 80 Mrays/s. BASELINE.json's
north star is ≥100 Mrays/s/chip at 1080p; vs_baseline is reported against the
80 Mrays/s reference figure.

Runs on whatever JAX platform is active (the real TPU chip under the driver).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MRAYS = 80.0


def main():
    import os
    # spp batching measured +3.5% on the headline (samples share per-bounce
    # fixed costs); the engine honors CPT_SPP, default the bench to 2
    os.environ.setdefault('CPT_SPP', '2')
    width, height = 1920, 1080
    warmup_samples = 1
    # 8 samples ≈ 21 s on the chip: halves the ~±4% run-to-run spread the
    # tunnel's latency jitter puts on shorter runs
    bench_samples = int(os.environ.get('BENCH_SAMPLES', '8'))

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_CACHE_DIR', '/tmp/jaxcache'))
    from cuda_pathtracer_tpu.scene.builder import get_scene
    from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
    from cuda_pathtracer_tpu.scene import state

    scene = get_scene('sibenik', asset_dirs=['/root/reference', '.'])
    pt = Pathtracer(scene, width, height)
    # camera inside the hall looking down the nave
    from cuda_pathtracer_tpu.core.camera import Camera
    camera = Camera.create([0.0, 5.0, -16.0], [0.0, 0.0, 1.0], 1.5, 12.0, 0.0)

    # compile + warm up (interactive clear then converge samples)
    pt.render(camera, should_clear=True)
    for _ in range(warmup_samples):
        pt.render(camera, should_clear=False)
    pt.finish()

    rays_before = float(pt.rays_traced)  # forces a full device sync
    t0 = time.perf_counter()
    for _ in range(bench_samples):
        pt.render(camera, should_clear=False)
    rays_after = float(pt.rays_traced)   # sync again: real wall time
    dt = time.perf_counter() - t0
    rays = rays_after - rays_before

    mrays = rays / dt / 1e6
    total, has_nan, has_neg = pt.energy()
    result = {
        'metric': 'Mrays/s sibenik-1080p',
        'value': round(mrays, 2),
        'unit': 'Mrays/s',
        'vs_baseline': round(mrays / BASELINE_MRAYS, 3),
    }
    print(json.dumps(result))
    # extra context on stderr (not part of the contract)
    print(f'# {rays/1e6:.1f} Mrays in {dt:.2f}s over {bench_samples} samples '
          f'({width}x{height}); energy={total:.1f} nan={has_nan} neg={has_neg}; '
          f'platform={jax.devices()[0].platform}', file=sys.stderr)

    # ---- roofline context: how far from hardware limits the converge
    # number sits. Packet traversal touches ~1 node row (512 B) per ray on
    # coherent wavefronts and ~1 row per ray-step on sorted bounce wavefronts
    # (measured unions: ~11 steps/128-ray tile packet, ~114 steps/bounce
    # packet, tools/tpu_packet_steps.py) -> ~0.5-1 KB of VMEM-resident table
    # reads per ray plus ~0.2 KB of HBM wavefront state.
    hbm_gbs = rays / dt * 0.2e-3 / 1e6 * 1e3   # ~0.2 KB HBM state per ray
    print(f'# roofline: ~{hbm_gbs:.1f} GB/s of HBM wavefront traffic at this '
          f'rate (v5e peak ~800 GB/s); the binding resource is the VPU-bound '
          f'packet step (~170-400 ns) x union steps, not bandwidth — '
          f'see PERF.md', file=sys.stderr)

    # ---- interactive-rate figure (the reference headline: 130 fps at
    # 640x480 with 1 diffuse + 1 shadow ray, README.md:202) ----
    import jax.numpy as jnp
    from cuda_pathtracer_tpu.models.pathtracer import render_sample
    from cuda_pathtracer_tpu.models import film
    from cuda_pathtracer_tpu.models.guiding import init_radiance_state
    iw, ih = 640, 480
    arrays, dyn = pt.arrays, pt.dyn
    radiance = init_radiance_state(int(arrays.tri_mat.shape[0]))
    lum, alb = film.clear_accumulators(iw * ih)
    wd = -(-scene.wide_depth // 4) * 4

    # blue-noise values hoisted per lane like the engine's _bn_bands does
    # (the in-jit 2D gather costs ~3.7 ms/frame, tools/interactive_profile.py)
    bn_np = np.asarray(arrays.blue_noise)
    lanes = np.arange(iw * ih)
    tpr = iw // 16
    g, wl = lanes // 128, lanes % 128
    bn_lanes = jnp.asarray(bn_np[((g // tpr) * 8 + wl // 16) % bn_np.shape[0],
                                 ((g % tpr) * 16 + wl % 16) % bn_np.shape[1]])

    # parity config: the reference's 130 fps headline runs WITHOUT path
    # guiding (a compile-time flag, default off) — cache_on=False removes
    # the guided-CDF walk and guide_off the cache scatter, like the
    # reference's ifdef does
    def frame(i):
        return render_sample(arrays, dyn, camera, radiance, lum, alb,
                             jnp.uint32(0), jnp.uint32(i), jnp.asarray(False),
                             bn_lanes,
                             nee=True, cache_on=False, max_bounces=2,
                             width=iw, height=ih, wide_depth=wd,
                             tile_order=True, guide_off=True)

    out = frame(0)
    out[0].block_until_ready()
    frames = 30
    t0 = time.perf_counter()
    last = None
    for i in range(frames):
        last = frame(i + 1)
    last[0].block_until_ready()
    fdt = time.perf_counter() - t0
    fps = frames / fdt
    irays = float(last[4]) * frames
    print(f'# interactive sibenik {iw}x{ih} (1 spp, depth 2, NEE): '
          f'{fps:.1f} fps, {irays/fdt/1e6:.1f} Mrays/s '
          f'(reference: 130 fps on a GTX 960M)', file=sys.stderr)

    # device-side frame time net of the ~30 ms/dispatch tunnel RTT: K whole
    # interactive frames (clear + render + display transform) fused in ONE
    # jit — what an on-prem host would see per frame
    K = 16
    from cuda_pathtracer_tpu.models.pathtracer import tile_unpermute

    @jax.jit
    def frames_device(rand0):
        def one(i, carry):
            rand_idx, _ = carry
            l0, a0 = film.clear_accumulators(iw * ih)
            l1, a1, _, ridx, _ = render_sample(
                arrays, dyn, camera, radiance, l0, a0,
                jnp.uint32(0), rand_idx, jnp.asarray(False), bn_lanes,
                nee=True, cache_on=False, max_bounces=2,
                width=iw, height=ih, wide_depth=wd, tile_order=True,
                guide_off=True)
            l1 = tile_unpermute(l1, iw, ih)
            a1 = tile_unpermute(a1, iw, ih)
            img = film.display(l1, a1, 1.0, iw, ih, blur=False)
            return ridx, img
        return jax.lax.fori_loop(0, K, one, (rand0, jnp.zeros(
            (ih, iw, 3), jnp.float32)))

    # two warm-up calls and best-of-3: the first post-compile execution can
    # be ~7x slow on this 1-core host (compile-cache serialization steals
    # the core that feeds the device) — measured 736 vs 108 ms/frame
    for w in range(2):
        r = frames_device(jnp.uint32(3 + w))
        r[1].block_until_ready()
    dev_dt = 1e9
    for t in range(3):
        t0 = time.perf_counter()
        r = frames_device(jnp.uint32(11 + t))
        r[1].block_until_ready()
        _ = np.asarray(r[1][:1, :1])
        dev_dt = min(dev_dt, (time.perf_counter() - t0) / K)
    print(f'# interactive_device_ms: {dev_dt*1e3:.1f} ms/frame = '
          f'{1.0/dev_dt:.1f} fps device-side (display transform fused, '
          f'RTT excluded)', file=sys.stderr)

    # ---- blur-filter share of frame time (reference: <=2%, README.md:173) --
    img_f = jax.jit(lambda l, a: film.display(l, a, 8.0, width, height,
                                              blur=False))
    img_b = jax.jit(lambda l, a: film.display(l, a, 8.0, width, height,
                                              blur=True))
    la, aa = pt.accumulators_pixel_order()
    # canonical layouts: the unpermute's reshape output can carry a
    # transposed device layout, which would charge an input copy to the
    # timed programs and distort the blur-minus-plain difference
    la = jax.device_put(np.asarray(la))
    aa = jax.device_put(np.asarray(aa))
    img_f(la, aa).block_until_ready()
    img_b(la, aa).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        r = img_f(la, aa)
    r.block_until_ready()
    t_plain = (time.perf_counter() - t0) / 10
    t0 = time.perf_counter()
    for _ in range(10):
        r = img_b(la, aa)
    r.block_until_ready()
    t_blur = (time.perf_counter() - t0) / 10
    frame_t = 1.0 / max(fps, 1e-9)
    print(f'# blur filter: {1e3*(t_blur-t_plain):.2f} ms/frame = '
          f'{100*(t_blur-t_plain)/frame_t:.1f}% of an interactive frame '
          f'(reference: <=2%)', file=sys.stderr)

    # ---- per-stage shares of a converge sample (VERDICT r3 item 6) ----
    # The reference reads these off nvprof: guiding pinned at 2.3% of the
    # GPU frame (/root/reference/README.md:119-124). Here: one profiled
    # converge sample, XLA-op self time by category, plus a guiding A/B.
    if os.environ.get('BENCH_SHARES', '1') != '0':
        try:
            from cuda_pathtracer_tpu.utils import profiling as _prof

            def one_sample():
                pt.render(camera, should_clear=False)
                pt.finish()
                _ = np.asarray(pt.lum[:1, :1])

            cats = _prof.device_op_shares(one_sample)
            top_ops = cats.pop('_top_ops', [])
            ctot = sum(cats.values()) or 1.0
            parts = '  '.join(
                f'{k} {v:.0f}ms ({100 * v / ctot:.1f}%)'
                for k, v in sorted(cats.items(), key=lambda kv: -kv[1]))
            print(f'# converge-sample device shares: {parts}',
                  file=sys.stderr)
            gd = cats.get('guiding-scatter', 0.0)
            srt = cats.get('sort', 0.0)
            print(f'# guiding-scatter share: {100 * gd / ctot:.2f}% '
                  f'(reference guiding kernels: 2.3%); '
                  f'sort share: {100 * srt / ctot:.2f}%', file=sys.stderr)
            print('# top ops: ' + '  '.join(
                f'{n[:40]} {ms:.0f}ms' for n, ms in top_ops[:8]),
                file=sys.stderr)
        except Exception as e:   # shares must never kill the headline
            print(f'# shares unavailable: {type(e).__name__}: {e}',
                  file=sys.stderr)

    # ---- per-scene rows: the whole surface, not one number ----
    if os.environ.get('BENCH_SCENES', '1') != '0':
        for row in bench_scenes():
            print('# ' + json.dumps(row), file=sys.stderr)


def bench_scenes():
    """Converge-rate rows for the other built-in scene families: the 2mtris
    stress scene, minecraft with guiding + blurred display, and the
    sponza.chai scripted scene."""
    import jax
    from cuda_pathtracer_tpu.scene.builder import get_scene
    from cuda_pathtracer_tpu.models.pathtracer import Pathtracer
    from cuda_pathtracer_tpu.core.camera import Camera

    configs = [
        ('2mtris', '2mtris', 1920, 1080, 2,
         Camera.create([0, 6, -8], [0, -0.05, 1], 1.5, 8.0, 0.0), False),
        ('minecraft+guiding+blur', 'minecraft', 640, 480, 6,
         Camera.create([0, 6, -14], [0, -0.15, 1], 1.5, 10.0, 0.0), True),
        ('sponza.chai', '/root/reference/sponza.chai', 640, 480, 6,
         Camera.create([0, 4, -10], [0, -0.1, 1], 1.5, 8.0, 0.0), False),
    ]
    rows = []
    for label, name, w, h, samples, cam_, blur in configs:
        try:
            scene = get_scene(name, asset_dirs=['/root/reference', '.'])
            pt = Pathtracer(scene, w, h)
            pt.render(cam_, should_clear=True)
            pt.render(cam_, should_clear=False)   # warm the converge program
            pt.finish()
            r0 = float(pt.rays_traced)
            t0 = time.perf_counter()
            for _ in range(samples):
                pt.render(cam_, should_clear=False)
            r1 = float(pt.rays_traced)            # device sync
            dt = time.perf_counter() - t0
            img = np.asarray(pt.image(blur=blur))  # exercise the display path
            total, has_nan, _ = pt.energy()
            rows.append({
                'metric': f'Mrays/s {label}',
                'value': round((r1 - r0) / dt / 1e6, 3),
                'unit': 'Mrays/s',
                'resolution': f'{w}x{h}',
                'samples': samples,
                'energy_finite': bool(np.isfinite(total)) and not has_nan,
                'img_mean': round(float(img.mean()), 4),
            })
        except Exception as e:   # a scene row must never kill the headline
            rows.append({'metric': f'Mrays/s {label}', 'value': None,
                         'error': f'{type(e).__name__}: {e}'[:200]})
    return rows


if __name__ == '__main__':
    main()
