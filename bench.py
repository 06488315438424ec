#!/usr/bin/env python
"""Headline benchmark: 8x8-grid 1080p, 64 novel views, fused Pallas MXU blend.

Mirrors the reference's built-in self-benchmark (reference:
src/interpolator.cu:271-295 -- 100 timed repetitions of the render kernel)
on BASELINE.json's headline config. Prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": "GP/s", "vs_baseline": ...}

vs_baseline is against the self-established 2 GP/s-per-chip target
(BASELINE.md; the reference publishes no numbers).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from lfinterpolator_tpu.core import geometry
from lfinterpolator_tpu.ops import blend_pallas, blend_xla

BASELINE_GPS = 2.0  # GP/s per chip (BASELINE.md target)
RUNS = int(os.environ.get("LFI_BENCH_RUNS", "50"))
WARMUP = 3


def main() -> None:
    cols = rows = 8
    g = cols * rows
    h, w, v = 1080, 1920, 64

    start_end = np.array([0.0, 0.0, cols - 1.0, rows - 1.0], np.float32)
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(start_end, cols, rows, 3.0, v)
    ).astype(np.float32)
    offsets = geometry.compute_offsets(
        cols, rows, w, h, 1.0, geometry.trajectory_center(start_end)
    )
    # Distinct shift tables per repetition: some execution environments
    # memoize identical (executable, inputs) pairs, which would fake the
    # timing. Varying the focus slightly keeps the work identical.
    fos = [
        jnp.asarray(geometry.focused_offsets(offsets, 0.25 + 0.007 * i))
        for i in range(RUNS + WARMUP)
    ]

    # Synthesize the light field on-device (uploading 400 MB through a
    # tunneled device would dominate the benchmark's setup time).
    planar = jax.random.randint(
        jax.random.key(0), (g, 3, h, w), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    use_pallas = blend_pallas.is_available()
    if use_pallas:
        tile_h, tile_w = blend_pallas.default_tile(g, w)
        padded = jax.block_until_ready(
            jax.jit(blend_pallas.pad_images, static_argnums=(1, 2))(
                planar, tile_h, tile_w
            )
        )
        weights2 = blend_pallas.split_weights(jnp.asarray(wm))

        def step(fo):
            return blend_pallas.render_fixed_padded(
                padded, weights2, fo, h=h, w=w, tile_h=tile_h, tile_w=tile_w
            )
    else:  # CPU fallback so the benchmark at least runs anywhere
        weights = jnp.asarray(wm)

        def step(fo):
            return blend_xla.render_fixed(planar, weights, fo)

    # Warmup (and force real completion with a tiny fetch: through remote
    # tunnels, block_until_ready alone has been observed to return early).
    for i in range(WARMUP):
        out = step(fos[i])
        _ = np.asarray(out.reshape(-1)[:8])
        del out

    # Throughput regime: RUNS dispatches in flight (each with distinct
    # inputs), one sync at the end -- the production serving pattern, and the
    # only regime not dominated by per-call host round-trip overhead.
    t0 = time.perf_counter()
    last = None
    for i in range(RUNS):
        last = step(fos[WARMUP + i])
    _ = np.asarray(last.reshape(-1)[:8])
    per_frame = (time.perf_counter() - t0) / RUNS

    gps = v * h * w / per_frame / 1e9
    print(
        json.dumps(
            {
                "metric": "8x8-grid 1080p 64-view fused blend throughput "
                f"({'pallas' if use_pallas else 'xla-cpu-fallback'}, "
                f"pipelined, {RUNS} runs, {per_frame * 1000:.2f} ms/frame)",
                "value": round(gps, 3),
                "unit": "GP/s",
                "vs_baseline": round(gps / BASELINE_GPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
