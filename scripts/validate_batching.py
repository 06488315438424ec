#!/usr/bin/env python
"""Validate every capacity-planned batched render arm against the unbatched
render, byte for byte, on the CURRENT backend (real TPU or CPU interpret).

The capacity planner (core/capacity.py) can split a render into view
batches, drop the raw device stack, and row-block the all-focus select /
estimate; each arm must not change a single output byte. The CPU test suite
forces every arm on tiny fixtures (tests/test_capacity.py); this script
re-runs the same checks at production-like sizes on a real chip, where the
Pallas kernels (not interpret mode) execute.

Arms: fixed keep/drop, all-focus keep/drop/row-block/row-block-estimate/
drop+row-block-estimate, per method. Budgets are forced via LFI_HBM_BYTES
(only LOWERING the planner's ceiling -- no real OOM risk, which matters on
tunneled TPUs where an OOM can wedge the backend for hours).

Usage: validate_batching.py [--size HxW] [--grid CxR] [--skip-fixed]
One chip client at a time; budget several minutes of remote compiles.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lfinterpolator_tpu.api import Interpolator
from lfinterpolator_tpu.core import capacity, geometry
from lfinterpolator_tpu.core.config import RenderConfig
from lfinterpolator_tpu.io.loader import LightField
from lfinterpolator_tpu.models import pipeline
from lfinterpolator_tpu.ops import allfocus_pallas, estimate_pallas
from lfinterpolator_tpu.ops import focus as focus_ops

FOCUS, FRANGE = 0.1, 0.2


def _traj(cols, rows):
    # trajectories are NORMALIZED: parse_trajectory scales by (cols-1, rows-1)
    del cols, rows
    return "0,0,1,1"


def _plan_inputs(lf, cfg, traj, k):
    se = geometry.parse_trajectory(traj, lf.cols_rows)
    center = geometry.trajectory_center(se)
    offsets = geometry.compute_offsets(
        lf.cols, lf.rows, lf.width, lf.height, cfg.aspect, center
    )
    radius = geometry.block_radius(
        lf.width, lf.height, cfg.pixel_size_factor
    )
    pad = focus_ops.shift_pad_bound(
        offsets, FOCUS, FRANGE, radius, lf.height, lf.width
    )
    spread = allfocus_pallas.spread_bound(offsets, FOCUS, FRANGE)
    spans = estimate_pallas.chunk_spans(
        offsets, FOCUS, FRANGE, cfg.focus_steps, 4
    )
    mk = "TEN" if cfg.method in ("TEN", "TEN_WM") else "STD"
    fused = pipeline.allfocus_uses_fused_blend(
        mk, lf.height, lf.width, spread
    )
    # same est_fused_bytes callable api.interpolate plans with
    est_cb = estimate_pallas.slab_bytes_fn(
        lf.height, lf.width, k, 3, cfg.focus_steps, radius, spans,
        pad[0], pad[1], exact_taps=cfg.exact_focus_taps,
    )
    return pad[0], pad[1], fused, est_cb


def _find_budget(lf, cfg, v, k, traj, pred, divisor=4000):
    px, py, fused, est_cb = _plan_inputs(lf, cfg, traj, k)
    kw = dict(px=px, py=py, fused_blend=fused, est_fused_bytes=est_cb)
    g = lf.grid_size
    full = capacity.plan_allfocus_render(
        g, k, 3, lf.height, lf.width, v, budget=1 << 40, **kw
    ).bytes_unbatched
    for b in range(2 * full, 0, -max(1, full // divisor)):
        try:
            p = capacity.plan_allfocus_render(
                g, k, 3, lf.height, lf.width, v, budget=b, **kw
            )
        except ValueError:
            return None, None
        if pred(p):
            return b, p
    return None, None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--grid", default="4x4")
    ap.add_argument("--skip-fixed", action="store_true")
    args = ap.parse_args()
    h, w = (int(x) for x in args.size.split("x"))
    cols, rows = (int(x) for x in args.grid.split("x"))
    g, v, k = cols * rows, 64, 8
    traj = _traj(cols, rows)

    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 256, size=(g, h, w, 4), dtype=np.uint8)
    lf = LightField(images=imgs, cols=cols, rows=rows)
    failures = 0

    def render(cfg, budget, **ikw):
        if budget is not None:
            os.environ["LFI_HBM_BYTES"] = str(budget)
        else:
            os.environ.pop("LFI_HBM_BYTES", None)
        t0 = time.perf_counter()
        out = Interpolator(lf, config=cfg, progress=False).interpolate(
            traj, progress=False, **ikw
        )
        return out, time.perf_counter() - t0

    if not args.skip_fixed:
        cfg = RenderConfig(method="TEN", view_count=v)
        ref, t = render(cfg, None, focus=FOCUS)
        print(f"[fixed TEN] unbatched {t:.2f}s", flush=True)
        from lfinterpolator_tpu.ops import blend_pallas

        px, py = blend_pallas.shift_bound(
            geometry.compute_offsets(
                cols, rows, w, h, 1.0,
                geometry.trajectory_center(
                    geometry.parse_trajectory(traj, (cols, rows))
                ),
            ),
            FOCUS, h, w,
        )
        for name, pred in [
            ("keep", lambda p: p.batched and not p.drop_images),
            ("drop", lambda p: p.drop_images),
        ]:
            full = capacity.plan_fixed_render(
                g, 3, h, w, v, px, py, budget=1 << 40
            ).bytes_unbatched
            budget = plan = None
            for b in range(2 * full, 0, -max(1, full // 2000)):
                try:
                    p = capacity.plan_fixed_render(
                        g, 3, h, w, v, px, py, budget=b
                    )
                except ValueError:
                    break
                if pred(p):
                    budget, plan = b, p
                    break
            if budget is None:
                print(f"[fixed TEN] {name}: regime not reachable", flush=True)
                continue
            out, t = render(cfg, budget, focus=FOCUS)
            ok = np.array_equal(out.views, ref.views)
            print(
                f"[fixed TEN] {name}: vb={plan.view_batch} {t:.2f}s "
                f"views_eq={ok}", flush=True,
            )
            failures += 0 if ok else 1

    for method in ("TEN", "STD"):
        cfg = RenderConfig(method=method, view_count=v, focus_map_views=k)
        ref, t = render(cfg, None, focus=FOCUS, focus_range=FRANGE)
        print(f"[af {method}] unbatched {t:.2f}s", flush=True)
        arms = [
            ("keep", lambda p: p.batched and not p.drop_images
             and p.row_block is None),
            ("drop", lambda p: p.drop_images
             and p.estimate_row_block is None),
            ("rowblk", lambda p: p.row_block is not None
             and p.estimate_row_block is None),
            ("rowblk+est", lambda p: p.row_block is not None
             and p.estimate_row_block is not None and p.estimate_fused),
            ("rowblk+est-xla", lambda p: p.row_block is not None
             and p.estimate_row_block is not None and not p.estimate_fused),
            ("drop+est", lambda p: p.drop_images
             and p.estimate_row_block is not None),
        ]
        for name, pred in arms:
            b, p = _find_budget(lf, cfg, v, k, traj, pred)
            if b is None:
                print(f"[af {method}] {name}: regime not reachable "
                      "(engine-dependent; expected for some arms)", flush=True)
                continue
            out, t = render(cfg, b, focus=FOCUS, focus_range=FRANGE)
            ok_v = np.array_equal(out.views, ref.views)
            ok_m = np.array_equal(out.maps, ref.maps)
            print(
                f"[af {method}] {name}: vb={p.view_batch} "
                f"drop={p.drop_images} rb={p.row_block} "
                f"est_rb={p.estimate_row_block} "
                f"est_fused={p.estimate_fused} {t:.2f}s "
                f"views_eq={ok_v} maps_eq={ok_m}", flush=True,
            )
            failures += 0 if (ok_v and ok_m) else 1

    os.environ.pop("LFI_HBM_BYTES", None)
    print(json.dumps({"batched_arm_failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
