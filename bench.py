#!/usr/bin/env python
"""Benchmarks over the BASELINE.json configs.

Default (what the driver runs): the headline config -- 8x8 grid, 1080p, 64
novel views, fused Pallas MXU blend -- printed as ONE JSON line:

    {"metric": ..., "value": ..., "unit": "GP/s", "vs_baseline": ...}

vs_baseline is against the self-established 2 GP/s-per-chip target
(BASELINE.md; the reference publishes no numbers; it self-times 100 kernel
repetitions, reference: src/interpolator.cu:271-295).

Other BASELINE configs: `python bench.py --config NAME` or env
LFI_BENCH_CONFIG with one of: headline, c1_2x2_512, c2_4x4_1024,
c3_allfocus_1080, c3_fast_allfocus_1080, c3_pyramid_allfocus_1080,
c3_occlusion_1080, c4_quilt_1080, c5_video_4k, c6_serving_batch,
c7_serving_allfocus, c7_tol_serving_allfocus, c8_stream_allfocus_1080,
c8_std_stream_allfocus_1080, c8_refresh_allfocus_1080,
c8_refresh_allfocus_4k, c8_stream_allfocus_4k, all.

Timing method: N dispatches in flight with distinct shift tables per run and
one tiny-fetch sync at the end (the production serving pattern). Repeated
identical executions can be memoized by tunneled execution environments, and
per-call sync adds ~30 ms of host round-trip -- both would fake the numbers.
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from lfinterpolator_tpu.core import geometry
from lfinterpolator_tpu.ops import (
    blend_pallas, blend_xla, focus as focus_ops, quilt, shift_pallas,
)
from lfinterpolator_tpu.models import pipeline

BASELINE_GPS = 2.0  # GP/s per chip (BASELINE.md target)
RUNS = int(os.environ.get("LFI_BENCH_RUNS", "50"))
WARMUP = 3


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[:8])


def _throughput(step, runs: int) -> float:
    """Seconds per call: pipelined dispatch, tiny-fetch sync."""
    for i in range(WARMUP):
        out = step(i)
        _sync(out)
        del out
    t0 = time.perf_counter()
    last = None
    for i in range(runs):
        last = step(WARMUP + i)
    _sync(last)
    return (time.perf_counter() - t0) / runs


def _setup(cols, rows, h, w, v, effect=3.0, aspect=1.0):
    g = cols * rows
    start_end = np.array([0.0, 0.0, cols - 1.0, rows - 1.0], np.float32)
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(start_end, cols, rows, effect, v)
    ).astype(np.float32)
    offsets = geometry.compute_offsets(
        cols, rows, w, h, aspect, geometry.trajectory_center(start_end)
    )
    # On-device synthetic light field (uploading hundreds of MB through a
    # tunneled device would dominate setup).
    planar = jax.random.randint(
        jax.random.key(0), (g, 3, h, w), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    return start_end, wm, offsets, planar


def _fixed_step(planar, wm, offsets, h, w, method="TEN", runs=None):
    use_pallas = method == "TEN" and blend_pallas.is_available()
    foci = [0.25 + 0.007 * i for i in range((runs or RUNS) + WARMUP + 1)]
    fos = [jnp.asarray(geometry.focused_offsets(offsets, f)) for f in foci]
    if use_pallas:
        px, py = blend_pallas.shift_bound(
            offsets, (min(foci), max(foci)), h, w
        )
        padded = jax.block_until_ready(
            jax.jit(blend_pallas.pad_images, static_argnums=(1, 2))(
                planar, px, py
            )
        )
        weights = jnp.asarray(wm)

        def step(i):
            return blend_pallas.render_fixed_padded(
                padded, weights, fos[i], h=h, w=w, px=px, py=py
            )
    else:
        weights = jnp.asarray(wm)
        render = jax.jit(blend_xla.render_fixed)

        def step(i):
            return render(planar, weights, fos[i])

    return step, use_pallas


def _emit(metric, value, unit, vs_baseline):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


def bench_headline():
    cols = rows = 8
    h, w, v = 1080, 1920, 64
    _, wm, offsets, planar = _setup(cols, rows, h, w, v)
    runs = RUNS * 3  # amortize the ~30 ms final-fetch round-trip <0.2 ms
    step, use_pallas = _fixed_step(planar, wm, offsets, h, w, runs=runs)
    per = _throughput(step, runs)
    gps = v * h * w / per / 1e9
    _emit(
        "8x8-grid 1080p 64-view fused blend throughput "
        f"({'pallas' if use_pallas else 'xla-cpu-fallback'}, pipelined, "
        f"{runs} runs, {per * 1000:.2f} ms/frame)",
        gps, "GP/s", gps / BASELINE_GPS,
    )


def bench_c1():
    # BASELINE config 1: 2x2 grid, 512x512, SINGLE center novel view
    # (start == end, like the reference's degenerate trajectory -> one
    # distinct view), plain aperture-weighted blend on the XLA path.
    h = w = 512
    v = 1
    g = 4
    start_end = np.array([0.5, 0.5, 0.5, 0.5], np.float32)  # grid center
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(start_end, 2, 2, 3.0, v)
    ).astype(np.float32)
    offsets = geometry.compute_offsets(
        2, 2, w, h, 1.0, geometry.trajectory_center(start_end)
    )
    planar = jax.random.randint(
        jax.random.key(0), (g, 3, h, w), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    # tiny renders: the final-fetch round-trip (~30 ms) must amortize well
    # below the per-frame time, so use many more runs than the default
    runs = RUNS * 6
    step, _ = _fixed_step(planar, wm, offsets, h, w, method="STD", runs=runs)
    per = _throughput(step, runs)
    gps = v * h * w / per / 1e9
    _emit(f"2x2-grid 512px single center view, STD/XLA path ({per*1000:.2f} ms)",
          gps, "GP/s", gps / BASELINE_GPS)


def bench_c2():
    # BASELINE config 2: 4x4 grid, 1024px, trajectory of 8 novel views.
    h = w = 1024
    v = 8
    _, wm, offsets, planar = _setup(4, 4, h, w, v)
    runs = RUNS * 4  # small frames: amortize the final-fetch round-trip
    step, _ = _fixed_step(planar, wm, offsets, h, w, runs=runs)
    per = _throughput(step, runs)
    gps = v * h * w / per / 1e9
    _emit(f"4x4-grid 1024px 8-view blend ({per*1000:.2f} ms)", gps, "GP/s",
          gps / BASELINE_GPS)


def _structured_scene(
    cols, rows, h, w,
    # candidates are 0.1 + k*0.3/31; planes sit ON the grid (k=3, 13, 26)
    # so the sweep can lock them exactly -- off-grid planes leave a
    # shallow cost minimum that truncation noise wins (measured: the
    # f=0.125 band's map bytes scattered while on-grid bands locked)
    plane_foci=(0.1 + 3 * 0.3 / 31, 0.1 + 13 * 0.3 / 31, 0.1 + 26 * 0.3 / 31),
):
    """Multi-plane light field: 3 depth bands, each texture-shifted per
    camera (on-device). Focus estimation on iid noise is meaningless -- no
    scene has uncorrelated disparity -- so the all-focus config uses
    realistic structured content (the estimate sweep itself is
    content-independent; the blend's level restriction is what real smooth
    depth maps exercise).

    `plane_foci` are the FOCUS VALUES the three depth bands align at, so
    they land inside the benched sweep window regardless of grid/resolution
    (the per-camera pixel shift of a plane at focus f is f * w/cols per
    grid cell -- the compute_offsets scale; y uses w/rows since offsets
    scale y by resX/resY at aspect 1). The original fixed 24/8/0-px
    depths mapped to f = 0.05/0.017/0 at 4x4/1920 -- all OUTSIDE the
    benched [0.1, 0.4] window, so estimated maps were argmin NOISE
    (measured: a flat 32-level histogram). Estimate speed is
    content-independent, but map-dependent stages (TEN level restriction,
    STD presence scan, pyramid presence pruning) were effectively running
    their worst case; rows measured before the fix say so."""
    g = cols * rows
    dpx = [f * w / cols for f in plane_foci]
    dpy = [f * w / rows for f in plane_foci]
    maxp = max((cols - 1) / 2, (rows - 1) / 2)
    m = int(np.ceil(maxp * max(dpx + dpy))) + 8
    tex = jax.random.randint(
        jax.random.key(7), (3, h + 2 * m, w + 2 * m), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    # smooth the texture so the disparity search has signal
    t = tex.astype(jnp.float32)
    t = (t + jnp.roll(t, 1, 1) + jnp.roll(t, 1, 2) + jnp.roll(t, 2, 1)) / 4
    tex = t.astype(jnp.uint8)
    band = h // 3
    pos = jnp.asarray(
        [[c - (cols - 1) / 2, r - (rows - 1) / 2]
         for c in range(cols) for r in range(rows)], jnp.float32
    )

    @jax.jit
    def make():
        def one(p):
            def plane(dx_px, dy_px):
                dx = (p[0] * dx_px).astype(jnp.int32) + m
                dy = (p[1] * dy_px).astype(jnp.int32) + m
                return lax.dynamic_slice(tex, (0, dy, dx), (3, h, w))
            near, mid, far = (
                plane(dpx[2], dpy[2]), plane(dpx[1], dpy[1]),
                plane(dpx[0], dpy[0]),
            )
            yy = lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
            return jnp.where(
                yy < band, near, jnp.where(yy < 2 * band, mid, far)
            )
        return jax.vmap(one)(pos)

    return jax.block_until_ready(make())


def bench_c3():
    # BASELINE config 3: 4x4 grid, 1080p, per-pixel focus-map disparity
    # search fused with blending (focus views capped at the grid size).
    cols = rows = 4
    h, w, v = 1080, 1920, 64
    start_end, wm, offsets, _ = _setup(cols, rows, h, w, v)
    planar = _structured_scene(cols, rows, h, w)
    ids = jnp.asarray(geometry.select_focus_views(start_end, cols, rows, 16))
    radius = geometry.block_radius(w, h)
    frad = (radius[0] // 10, radius[1] // 10)
    pad = focus_ops.shift_pad_bound(offsets, 0.1, 0.3, radius, h, w)
    from lfinterpolator_tpu.ops import allfocus_pallas, estimate_pallas

    spread = allfocus_pallas.spread_bound(offsets, 0.1, 0.3)
    spans = estimate_pallas.chunk_spans(offsets, 0.1, 0.3, 32, 4)
    weights = jnp.asarray(wm)
    offj = jnp.asarray(offsets)

    def step(i):
        return pipeline.render_all_focus(
            planar, weights, offj,
            jnp.float32(0.1 + 1e-7 * i), jnp.float32(0.3), ids,
            method="TEN", radius=radius, filter_radius=frad, steps=32, pad=pad,
            spread=spread, spans=spans,
        )

    per = _throughput(step, max(4, RUNS // 8))
    gps = v * h * w / per / 1e9
    _emit(
        f"4x4-grid 1080p all-in-focus pipeline: estimate+filter+blend "
        f"({per*1000:.0f} ms)", gps, "GP/s", gps / BASELINE_GPS,
    )


def bench_c3_fast():
    # c3's --fast-focus variant: same pipeline with the fast tap rule
    # (fused fast-taps estimate kernel; reference has no such mode knob).
    cols = rows = 4
    h, w, v = 1080, 1920, 64
    start_end, wm, offsets, _ = _setup(cols, rows, h, w, v)
    planar = _structured_scene(cols, rows, h, w)
    ids = jnp.asarray(geometry.select_focus_views(start_end, cols, rows, 16))
    radius = geometry.block_radius(w, h)
    frad = (radius[0] // 10, radius[1] // 10)
    pad = focus_ops.shift_pad_bound(offsets, 0.1, 0.3, radius, h, w)
    from lfinterpolator_tpu.ops import allfocus_pallas, estimate_pallas

    spread = allfocus_pallas.spread_bound(offsets, 0.1, 0.3)
    spans = estimate_pallas.chunk_spans(offsets, 0.1, 0.3, 32, 4)
    weights = jnp.asarray(wm)
    offj = jnp.asarray(offsets)

    def step(i):
        return pipeline.render_all_focus(
            planar, weights, offj,
            jnp.float32(0.1 + 1e-7 * i), jnp.float32(0.3), ids,
            method="TEN", radius=radius, filter_radius=frad, steps=32,
            pad=pad, spread=spread, spans=spans, exact_taps=False,
        )

    per = _throughput(step, max(4, RUNS // 8))
    gps = v * h * w / per / 1e9
    _emit(
        f"4x4-grid 1080p all-in-focus pipeline, --fast-focus tap rule "
        f"({per*1000:.0f} ms)", gps, "GP/s", gps / BASELINE_GPS,
    )


def bench_c3_pyramid():
    # c3's --focus-pyramid variant: coarse half-res sweep + presence-
    # predicated full-res refine (approximate; reference has no such mode).
    # The metric line also reports map agreement + view PSNR vs the exact
    # pipeline on the same scene, so the speed/quality trade is one row.
    cols = rows = 4
    h, w, v = 1080, 1920, 64
    start_end, wm, offsets, _ = _setup(cols, rows, h, w, v)
    planar = _structured_scene(cols, rows, h, w)
    ids = jnp.asarray(geometry.select_focus_views(start_end, cols, rows, 16))
    radius = geometry.block_radius(w, h)
    frad = (radius[0] // 10, radius[1] // 10)
    pad = focus_ops.shift_pad_bound(offsets, 0.1, 0.3, radius, h, w)
    from lfinterpolator_tpu.ops import allfocus_pallas, estimate_pallas

    spread = allfocus_pallas.spread_bound(offsets, 0.1, 0.3)
    spans = estimate_pallas.chunk_spans(offsets, 0.1, 0.3, 32, 4)
    weights = jnp.asarray(wm)
    offj = jnp.asarray(offsets)

    def step(i, pyramid=(2, 1)):
        return pipeline.render_all_focus(
            planar, weights, offj,
            jnp.float32(0.1 + 1e-7 * i), jnp.float32(0.3), ids,
            method="TEN", radius=radius, filter_radius=frad, steps=32,
            pad=pad, spread=spread, spans=spans, pyramid=pyramid,
        )

    per = _throughput(step, max(4, RUNS // 8))
    gps = v * h * w / per / 1e9
    # quality vs the exact pipeline (same scene, same focus)
    pv, pm = step(0)
    ev, em = step(0, pyramid=None)
    agree = float(jnp.mean((pm[0] == em[0]).astype(jnp.float32)))
    mse = float(
        jnp.mean(
            (pv.astype(jnp.float32) - ev.astype(jnp.float32)) ** 2
        )
    )
    psnr = 99.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse)
    _emit(
        f"4x4-grid 1080p all-in-focus pipeline, --focus-pyramid "
        f"({per*1000:.0f} ms; map agreement {100*agree:.1f}%, views "
        f"{psnr:.1f} dB vs exact)", gps, "GP/s", gps / BASELINE_GPS,
    )


def _stream_allfocus(cols, rows, h, w, K, runs, method="TEN"):
    """Streaming all-focus frame loop: per-frame estimate+select+blend from
    the raw stack (StreamingRenderer's focus_range>0 path), with the
    estimate phase timed separately (synced side run) to test the
    estimate-bound hypothesis."""
    v, steps = 64, 32
    start_end, wm, offsets, _ = _setup(cols, rows, h, w, v)
    planar = _structured_scene(cols, rows, h, w)
    ids = jnp.asarray(geometry.select_focus_views(start_end, cols, rows, K))
    radius = geometry.block_radius(w, h)
    frad = (radius[0] // 10, radius[1] // 10)
    pad = focus_ops.shift_pad_bound(offsets, 0.1, 0.3, radius, h, w)
    from lfinterpolator_tpu.ops import allfocus_pallas, estimate_pallas

    spread = allfocus_pallas.spread_bound(offsets, 0.1, 0.3)
    spans = estimate_pallas.chunk_spans(offsets, 0.1, 0.3, steps, 4)
    weights = jnp.asarray(wm)
    offj = jnp.asarray(offsets)

    def step(i):
        return pipeline.render_all_focus(
            planar, weights, offj,
            jnp.float32(0.1 + 1e-7 * i), jnp.float32(0.3), ids,
            method=method, radius=radius, filter_radius=frad, steps=steps,
            pad=pad, spread=spread, spans=spans,
        )

    per = _throughput(step, runs)

    def est_step(i):
        return pipeline.compute_focus_maps(
            planar, offj, jnp.float32(0.1 + 1e-7 * i), jnp.float32(0.3),
            ids, radius=radius, filter_radius=frad, steps=steps, pad=pad,
            spans=spans,
        )

    per_est = _throughput(est_step, runs)
    return per, per_est, v


def bench_c7_tol():
    # interpolate_batch's center_tolerance knob (api.py): 8 trajectories
    # whose centers are JITTERED within 0.04 grid cells. tolerance=0 keeps
    # 8 exact-center groups (8 estimates + selects); a small epsilon merges
    # them into ONE group sharing a single estimate+select (first member's
    # center). This bench times both arms at the pipeline level -- the
    # exact per-group work api.interpolate_batch dispatches -- so the row
    # quantifies what the knob buys a jittered serving workload.
    cols = rows = 4
    h, w, v, n_traj = 1080, 1920, 64, 8
    planar = _structured_scene(cols, rows, h, w)
    radius = geometry.block_radius(w, h)
    frad = (radius[0] // 10, radius[1] // 10)
    from lfinterpolator_tpu.ops import allfocus_pallas, estimate_pallas

    rng = np.random.default_rng(7)
    ses, wms, offs, idss = [], [], [], []
    for t in range(n_traj):
        d = rng.uniform(-0.02, 0.02, 2).astype(np.float32)
        se = np.array(
            [0.2 + d[0], 0.2 + d[1], 2.8 + d[0], 2.8 + d[1]], np.float32
        )
        ses.append(se)
        wms.append(
            geometry.quantize_weights_f16(
                geometry.weight_matrix(se, cols, rows, 3.0, v)
            ).astype(np.float32)
        )
        offs.append(
            geometry.compute_offsets(
                cols, rows, w, h, 1.0, geometry.trajectory_center(se)
            )
        )
        idss.append(
            jnp.asarray(geometry.select_focus_views(se, cols, rows, 16))
        )
    # shared static bounds (max over members keeps ONE compile per arm)
    pads = [
        focus_ops.shift_pad_bound(o, 0.1, 0.3, radius, h, w) for o in offs
    ]
    pad = (max(p[0] for p in pads), max(p[1] for p in pads))
    spread = max(
        allfocus_pallas.spread_bound(o, 0.1, 0.3) for o in offs
    )
    spanss = [
        estimate_pallas.chunk_spans(o, 0.1, 0.3, 32, 4) for o in offs
    ]
    spans = (max(s[0] for s in spanss), max(s[1] for s in spanss))
    offjs = [jnp.asarray(o) for o in offs]
    wjs = [jnp.asarray(wm) for wm in wms]
    merged_w = jnp.asarray(np.concatenate(wms, axis=0))  # [512, G]

    def render(weights, offj, ids, i):
        return pipeline.render_all_focus(
            planar, weights, offj,
            jnp.float32(0.1 + 1e-7 * i), jnp.float32(0.3), ids,
            method="TEN", radius=radius, filter_radius=frad, steps=32,
            pad=pad, spread=spread, spans=spans,
        )

    def step_solo(i):  # tolerance=0: one estimate+select per trajectory
        return [
            render(wjs[t], offjs[t], idss[t], i * n_traj + t)
            for t in range(n_traj)
        ]

    def step_merged(i):  # tolerance>=jitter: one shared estimate+select
        return render(merged_w, offjs[0], idss[0], i)

    runs = max(3, RUNS // 12)
    per_solo = _throughput(step_solo, runs)
    per_merged = _throughput(step_merged, max(4, RUNS // 8))
    _emit(
        f"4x4-grid 1080p all-focus serving, 8 center-jittered trajectories: "
        f"center_tolerance=0.05 merges to ONE estimate "
        f"({per_merged*1000:.0f} ms = {n_traj/per_merged:.1f} traj/s) vs "
        f"tolerance=0 per-center groups ({per_solo*1000:.0f} ms = "
        f"{n_traj/per_solo:.1f} traj/s), {per_solo/per_merged:.2f}x",
        n_traj / per_merged, "traj/s",
        (n_traj * v * h * w / per_merged / 1e9) / BASELINE_GPS,
    )


def bench_c8():
    # Streaming all-focus at the c3 scale but with the reference's full
    # K=32 focus views on an 8x8 grid (StreamingRenderer focus path,
    # landed untimed in round 3).
    runs = max(4, RUNS // 8)
    per, per_est, v = _stream_allfocus(8, 8, 1080, 1920, 32, runs)
    _emit(
        f"8x8-grid 1080p streaming all-focus ({per*1000:.0f} ms/frame, "
        f"estimate {per_est*1000:.0f} ms = {100*per_est/per:.0f}%)",
        1.0 / per, "frames/s",
        (v * 1080 * 1920 / per / 1e9) / BASELINE_GPS,
    )


def _refresh_allfocus(cols, rows, h, w, K, label):
    # Streaming all-focus with --map-refresh 8 (StreamingRenderer's
    # temporal map reuse): estimate every 8th frame, blend every frame
    # with the latest maps. Same shapes/engines as c8; the amortized
    # per-frame cost is blend + estimate/8.
    v, steps, N = 64, 32, 8
    start_end, wm, offsets, _ = _setup(cols, rows, h, w, v)
    planar = _structured_scene(cols, rows, h, w)
    ids = jnp.asarray(geometry.select_focus_views(start_end, cols, rows, K))
    radius = geometry.block_radius(w, h)
    frad = (radius[0] // 10, radius[1] // 10)
    pad = focus_ops.shift_pad_bound(offsets, 0.1, 0.3, radius, h, w)
    from lfinterpolator_tpu.ops import allfocus_pallas, estimate_pallas

    spread = allfocus_pallas.spread_bound(offsets, 0.1, 0.3)
    spans = estimate_pallas.chunk_spans(offsets, 0.1, 0.3, steps, 4)
    weights = jnp.asarray(wm)
    offj = jnp.asarray(offsets)
    blend = jax.jit(
        pipeline.blend_all_focus,
        static_argnames=("method", "steps", "pad", "spread"),
    )

    maps_box = [None]

    def step(i):
        if i % N == 0:
            maps_box[0] = pipeline.compute_focus_maps(
                planar, offj, jnp.float32(0.1 + 1e-7 * i),
                jnp.float32(0.3), ids, radius=radius, filter_radius=frad,
                steps=steps, pad=pad, spans=spans,
            )
        return blend(
            planar, weights, offj, maps_box[0],
            jnp.float32(0.1 + 1e-7 * i), jnp.float32(0.3), method="TEN",
            steps=steps, pad=pad, spread=spread,
        )

    runs = max(2 * N, RUNS // 2)
    per = _throughput(step, runs)
    _emit(
        f"{label} streaming all-focus, --map-refresh {N} "
        f"({per*1000:.0f} ms/frame amortized)",
        1.0 / per, "frames/s",
        (v * h * w / per / 1e9) / BASELINE_GPS,
    )


def bench_c8_refresh():
    _refresh_allfocus(8, 8, 1080, 1920, 32, "8x8-grid 1080p")


def bench_c8_refresh_4k():
    _refresh_allfocus(4, 4, 2160, 3840, 16, "4x4-grid 4K")


def bench_c8_std():
    # Streaming all-focus with the reference's canonical STD method --
    # newly viable at streaming rates since the round-5 fused 256-level
    # reroute (the XLA scan made STD frames ~1.9 s at this config).
    runs = max(4, RUNS // 10)
    per, per_est, v = _stream_allfocus(
        8, 8, 1080, 1920, 32, runs, method="STD"
    )
    _emit(
        f"8x8-grid 1080p streaming all-focus, STD method "
        f"({per*1000:.0f} ms/frame, estimate {per_est*1000:.0f} ms = "
        f"{100*per_est/per:.0f}%)",
        1.0 / per, "frames/s",
        (v * 1080 * 1920 / per / 1e9) / BASELINE_GPS,
    )


def bench_c8_4k():
    runs = max(3, RUNS // 12)
    per, per_est, v = _stream_allfocus(4, 4, 2160, 3840, 16, runs)
    _emit(
        f"4x4-grid 4K streaming all-focus ({per*1000:.0f} ms/frame, "
        f"estimate {per_est*1000:.0f} ms = {100*per_est/per:.0f}%)",
        1.0 / per, "frames/s",
        (v * 2160 * 3840 / per / 1e9) / BASELINE_GPS,
    )


def bench_c3_occ():
    # c3 on the parallax-OCCLUSION scene (utils/scenes.py): foreground
    # occluders at distinct disparities over a background plane, so the
    # estimated maps carry occlusion argmin noise instead of clean locked
    # bands. Quantifies the content-sensitive presence-driven stages (the
    # TEN fused blend's level restriction, the STD 256-byte presence scan)
    # on the map class real captured scenes produce -- the band scenes ran
    # them on their best case. Both methods timed; TEN is the metric.
    cols = rows = 4
    h, w, v = 1080, 1920, 64
    start_end, wm, offsets, _ = _setup(cols, rows, h, w, v)
    from lfinterpolator_tpu.utils.scenes import (
        make_occlusion_scene, occlusion_foci,
    )

    imgs = make_occlusion_scene(
        cols, rows, h, w, plane_foci=occlusion_foci(0.1, 0.3, 32), seed=7
    )
    planar = jax.device_put(jnp.asarray(
        np.ascontiguousarray(imgs[..., :3].transpose(0, 3, 1, 2))
    ))
    del imgs
    ids = jnp.asarray(geometry.select_focus_views(start_end, cols, rows, 16))
    radius = geometry.block_radius(w, h)
    frad = (radius[0] // 10, radius[1] // 10)
    pad = focus_ops.shift_pad_bound(offsets, 0.1, 0.3, radius, h, w)
    from lfinterpolator_tpu.ops import allfocus_pallas, estimate_pallas

    spread = allfocus_pallas.spread_bound(offsets, 0.1, 0.3)
    spans = estimate_pallas.chunk_spans(offsets, 0.1, 0.3, 32, 4)
    weights = jnp.asarray(wm)
    offj = jnp.asarray(offsets)

    def step_m(method):
        def step(i):
            return pipeline.render_all_focus(
                planar, weights, offj,
                jnp.float32(0.1 + 1e-7 * i), jnp.float32(0.3), ids,
                method=method, radius=radius, filter_radius=frad, steps=32,
                pad=pad, spread=spread,
                spans=spans,
            )
        return step

    per_ten = _throughput(step_m("TEN"), max(4, RUNS // 8))
    per_std = _throughput(step_m("STD"), max(3, RUNS // 16))
    gps = v * h * w / per_ten / 1e9
    _emit(
        f"4x4-grid 1080p all-in-focus on the parallax-occlusion scene: "
        f"TEN {per_ten*1000:.0f} ms, STD {per_std*1000:.0f} ms",
        gps, "GP/s", gps / BASELINE_GPS,
    )


def bench_c4():
    # 45-view 5x9 quilt serving (Looking Glass): ONE fused kernel pair --
    # clamp-shift + blend straight into the quilt canvas (blend_quilt),
    # never materializing the per-view stack. Falls back to the two-stage
    # blend + Pallas canvas copy where the fused route is unsupported.
    cols = rows = 8
    h, w, v = 1080, 1920, 64
    _, wm, offsets, planar = _setup(cols, rows, h, w, v)
    runs = max(24, RUNS // 2)  # amortize the final-fetch round-trip
    g = cols * rows
    if quilt.supports_fused_render(h, w, g):
        foci = [0.25 + 0.007 * i for i in range(runs + WARMUP + 1)]
        fos = [jnp.asarray(geometry.focused_offsets(offsets, f)) for f in foci]
        px, py = blend_pallas.shift_bound(offsets, (min(foci), max(foci)), h, w)
        padded = jax.block_until_ready(
            jax.jit(blend_pallas.pad_images, static_argnums=(1, 2))(
                planar, px, py
            )
        )
        weights = jnp.asarray(wm)

        def step(i):
            return quilt.render_fixed_quilt_padded(
                padded, weights, fos[i], cols=5, rows=9, h=h, w=w, px=px, py=py
            )

        label = "fused direct-to-canvas"
    else:
        blend_step, _ = _fixed_step(planar, wm, offsets, h, w, runs=runs)

        def step(i):
            return quilt.assemble_quilt(blend_step(i), cols=5, rows=9)

        label = "blend + copy fallback"

    per = _throughput(step, runs)
    gps = 45 * h * w / per / 1e9
    _emit(f"8x8-grid 1080p 45-view quilt, {label} ({per*1000:.2f} ms)",
          gps, "GP/s", gps / BASELINE_GPS)


def bench_c5():
    # streaming 4K: fixed geometry, one full shift+blend of the raw stack
    # per frame through the fused clamp-shift kernel (no pad pass -- the
    # round-2 design's per-frame pad of a 1.6x-inflated stack is gone).
    # Distinct per-frame shift tables defeat remote-execution memoization
    # while exercising the same per-frame work as new content would.
    cols = rows = 8
    g = cols * rows
    h, w, v = 2160, 3840, 64
    start_end = np.array([0.0, 0.0, cols - 1.0, rows - 1.0], np.float32)
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(start_end, cols, rows, 3.0, v)
    ).astype(np.float32)
    offsets = geometry.compute_offsets(
        cols, rows, w, h, 1.0, geometry.trajectory_center(start_end)
    )
    # enough runs that the one ~30 ms relay round-trip of the final tiny
    # fetch amortizes below ~2 ms/frame (6 runs inflated 27.7 -> 35 ms)
    runs = max(16, RUNS // 3)
    foci = [0.25 + 0.002 * i for i in range(runs + WARMUP + 1)]
    fos = [jnp.asarray(geometry.focused_offsets(offsets, f)) for f in foci]
    px, py = blend_pallas.shift_bound(offsets, (min(foci), max(foci)), h, w)
    base = jax.block_until_ready(
        jax.random.randint(
            jax.random.key(0), (g, 3, h, w), 0, 255, jnp.int32
        ).astype(jnp.uint8)
    )

    use_pallas = blend_pallas.is_available() and shift_pallas.supports(h, w)
    weights = jnp.asarray(wm)

    @jax.jit
    def render_xla_varied(x, weights, fo):
        return blend_xla.render_fixed(x, weights, fo)

    if use_pallas:
        tiled = jax.block_until_ready(shift_pallas.pad_to_tiles(base))

        def step(i):
            return shift_pallas.render_fixed_tiled(
                tiled, weights, fos[i], h=h, w=w, px=px, py=py
            )
    else:

        def step(i):
            return render_xla_varied(base, weights, fos[i])

    per = _throughput(step, runs)
    _emit(
        f"8x8-grid 4K video streaming blend ({per*1000:.0f} ms/frame, "
        f"{v} views, fused shift+blend from the raw stack)", 1.0 / per,
        "frames/s", (v * h * w / per / 1e9) / BASELINE_GPS,
    )


def bench_c6():
    # Serving config: 8 trajectories (sharing a center, the
    # interpolate_batch pattern) fused into ONE [512, G] blend. The blend is
    # bandwidth-bound on the image stack, so extra trajectories ride almost
    # free -- and M=512 fills the MXU where a single trajectory's M=64 is
    # one quarter-tile.
    cols = rows = 8
    h, w, v, n_traj = 1080, 1920, 64, 8
    _, _, offsets, planar = _setup(cols, rows, h, w, v)
    wms = [
        geometry.quantize_weights_f16(
            geometry.weight_matrix(
                np.array([0.1 * t, 0.1 * t, 7.0 - 0.1 * t, 7.0 - 0.1 * t],
                         np.float32),
                cols, rows, 3.0, v,
            )
        ).astype(np.float32)
        for t in range(n_traj)
    ]
    big = np.concatenate(wms, axis=0)  # [512, G], shared center
    runs = RUNS * 2  # amortize the final-fetch round-trip
    step, _ = _fixed_step(planar, big, offsets, h, w, runs=runs)
    per = _throughput(step, runs)
    gps = n_traj * v * h * w / per / 1e9
    _emit(
        f"8x8-grid 1080p serving: 8 trajectories x 64 views fused "
        f"({per*1000:.2f} ms, {n_traj/per:.0f} traj/s)",
        gps, "GP/s", gps / BASELINE_GPS,
    )


def bench_c7():
    # All-focus serving: 8 same-center trajectories fused into ONE [512, G]
    # per-pixel blend sharing a single disparity estimate + select (the
    # interpolate_batch(focus_range>0) pattern). The estimate dominates a
    # solo all-focus run, so batched trajectories ride nearly free.
    cols = rows = 4
    h, w, v, n_traj = 1080, 1920, 64, 8
    start_end, _, offsets, _ = _setup(cols, rows, h, w, v)
    planar = _structured_scene(cols, rows, h, w)
    ids = jnp.asarray(geometry.select_focus_views(start_end, cols, rows, 16))
    radius = geometry.block_radius(w, h)
    frad = (radius[0] // 10, radius[1] // 10)
    pad = focus_ops.shift_pad_bound(offsets, 0.1, 0.3, radius, h, w)
    from lfinterpolator_tpu.ops import allfocus_pallas, estimate_pallas

    spread = allfocus_pallas.spread_bound(offsets, 0.1, 0.3)
    spans = estimate_pallas.chunk_spans(offsets, 0.1, 0.3, 32, 4)
    wms = [
        geometry.quantize_weights_f16(
            geometry.weight_matrix(
                np.array([0.05 * t, 0.05 * t, 3.0 - 0.05 * t, 3.0 - 0.05 * t],
                         np.float32),
                cols, rows, 3.0, v,
            )
        ).astype(np.float32)
        for t in range(n_traj)
    ]
    weights = jnp.asarray(np.concatenate(wms, axis=0))  # [512, G]
    offj = jnp.asarray(offsets)

    def step(i):
        return pipeline.render_all_focus(
            planar, weights, offj,
            jnp.float32(0.1 + 1e-7 * i), jnp.float32(0.3), ids,
            method="TEN", radius=radius, filter_radius=frad, steps=32,
            pad=pad, spread=spread, spans=spans,
        )

    per = _throughput(step, max(4, RUNS // 8))
    gps = n_traj * v * h * w / per / 1e9
    _emit(
        f"4x4-grid 1080p all-focus serving: 8 trajectories x 64 views, one "
        f"shared estimate+select ({per*1000:.0f} ms, {n_traj/per:.1f} traj/s)",
        gps, "GP/s", gps / BASELINE_GPS,
    )


CONFIGS = {
    "headline": bench_headline,
    "c1_2x2_512": bench_c1,
    "c2_4x4_1024": bench_c2,
    "c3_allfocus_1080": bench_c3,
    "c3_fast_allfocus_1080": bench_c3_fast,
    "c3_pyramid_allfocus_1080": bench_c3_pyramid,
    "c3_occlusion_1080": bench_c3_occ,
    "c4_quilt_1080": bench_c4,
    "c5_video_4k": bench_c5,
    "c6_serving_batch": bench_c6,
    "c7_serving_allfocus": bench_c7,
    "c7_tol_serving_allfocus": bench_c7_tol,
    "c8_stream_allfocus_1080": bench_c8,
    "c8_std_stream_allfocus_1080": bench_c8_std,
    "c8_refresh_allfocus_1080": bench_c8_refresh,
    "c8_refresh_allfocus_4k": bench_c8_refresh_4k,
    "c8_stream_allfocus_4k": bench_c8_4k,
}


def _wait_for_backend() -> None:
    """Block until the (possibly tunneled) device backend answers a trivial
    program, probing in SUBPROCESSES so a wedged tunnel's init-hang can be
    timed out (a deliberate OOM or a heavy client's exit can wedge the
    tunneled TPU for tens of minutes, alternating init-hangs with fast
    UNAVAILABLE errors; an in-process retry cannot escape the hang case).

    Bounded by LFI_BENCH_WAIT_S (default 1800 s). On deadline the real run
    proceeds and surfaces the actual backend error. Probes are sequential
    with the main run (never a concurrent second chip client) and touch one
    tiny array, far below the heavy-use pattern that causes wedges.
    """
    deadline = time.monotonic() + float(os.environ.get("LFI_BENCH_WAIT_S", "1800"))
    probe = (
        "import jax; import numpy as np; "
        "print(float(np.asarray(jax.numpy.ones((8, 128)).sum())))"
    )
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=240,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(f"backend up after {attempt} probes", file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            print(
                f"backend still unresponsive after {attempt} probes; "
                "proceeding (the run will surface the error)",
                file=sys.stderr,
            )
            return
        time.sleep(60)


def main() -> None:
    _wait_for_backend()
    name = os.environ.get("LFI_BENCH_CONFIG", "headline")
    if "--config" in sys.argv:
        i = sys.argv.index("--config")
        if i + 1 >= len(sys.argv):
            print(f"--config needs a value: {list(CONFIGS)} or all",
                  file=sys.stderr)
            raise SystemExit(2)
        name = sys.argv[i + 1]
    if name == "all":
        for fn in CONFIGS.values():
            fn()
        return
    if name not in CONFIGS:
        print(f"Unknown config {name!r}; valid: {list(CONFIGS)} or all",
              file=sys.stderr)
        raise SystemExit(2)
    CONFIGS[name]()


if __name__ == "__main__":
    main()
