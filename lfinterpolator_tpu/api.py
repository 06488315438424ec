"""High-level API: the Interpolator (reference: src/interpolator.h:5-37).

Owns the device-resident light field and runs the render pipeline:

    interp = Interpolator("/data/scene")            # load + upload once
    result = interp.interpolate(trajectory="0,0,1,1", method="TEN", focus=0.2)
    result.save("out/")                             # 00.png..63.png (+maps)

Unlike the reference (which re-uploads constants per run and always times 100
kernel repetitions, src/interpolator.cu:248-297), uploads happen once at
construction, renders are jit-cached across calls with different
trajectories/focus values, and benchmarking is opt-in.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from .core import capacity, geometry
from .core.config import RenderConfig
from .io import writer
from .io.loader import LightField, load_light_field
from .models import pipeline
from .ops import blend_pallas, blend_xla, quilt as quilt_ops


def _fetch(x) -> np.ndarray:
    """Device->host fetch that also works for mesh-sharded arrays spanning
    multiple processes (gathered to every host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def _tiny_sync(out) -> None:
    """Force real completion with a minimal fetch.

    Through tunneled devices block_until_ready alone can return early; and a
    reshape(-1) of a sharded array would force a cross-device gather inside
    the timed region, so fetch a shard-local corner instead.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = (0,) * (leaf.ndim - 1) + (slice(0, min(8, leaf.shape[-1])),)
    corner = leaf[idx]
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # tiled=True: the corner of a sharded array is itself a global
        # non-fully-addressable array, which untiled gathering rejects.
        corner = multihost_utils.process_allgather(corner, tiled=True)
    _ = np.asarray(corner)


# The XLA arm of the view-batched fixed render, split at the blend seam
# (blend_xla.render_fixed = blend(shift_stack(...))) so the shift runs once
# per step and only the MXU contraction repeats per weight-row batch.
_shift_stack_jit = jax.jit(blend_xla.shift_stack)
_blend_rows_jit = jax.jit(blend_xla.blend)


@functools.lru_cache(maxsize=1)
def _pad_to_tiles_jit():
    from .ops import shift_pallas

    return jax.jit(shift_pallas.pad_to_tiles)


def _batch_weights(
    weights_np: np.ndarray, vb: int, progress: bool
) -> tuple[int, list[jnp.ndarray]]:
    """Split a [V, G] weight matrix into ceil(V/vb) device batches of vb
    rows. One compiled shape serves every batch: the trailing batch's rows
    are zero-padded (a zero row blends to zeros; trimmed host-side by
    _drain_view_batches)."""
    v, g = weights_np.shape
    nb = -(-v // vb)
    wm_pad = np.zeros((nb * vb, g), np.float32)
    wm_pad[:v] = weights_np
    w_batches = [
        jnp.asarray(wm_pad[b * vb : (b + 1) * vb]) for b in range(nb)
    ]
    if progress:
        print(
            f"Rendering {v} views in {nb} batches of {vb} "
            f"(output exceeds device memory)"
        )
    return nb, w_batches


def _drain_view_batches(
    nb: int, vb: int, v: int, h: int, w: int, render_batch
) -> np.ndarray:
    """Render `nb` view batches, draining each to the host while the next
    renders (JAX dispatch is async), so at most two batch outputs are ever
    device-resident. `render_batch(b)` -> device [vb, C, h, w] uint8; the
    trailing batch's zero-padded rows are trimmed. Returns [v, h, w, 3]."""
    out_np = np.empty((v, h, w, 3), np.uint8)
    pending = None  # (batch index, device views [vb, C, h, w])

    def drain(item):
        b, o = item
        arr = np.asarray(o)  # device->host fetch of one batch
        lo = b * vb
        n = min(v - lo, vb)
        out_np[lo : lo + n] = arr[:n].transpose(0, 2, 3, 1)

    for b in range(nb):
        o = render_batch(b)
        if pending is not None:
            drain(pending)
        pending = (b, o)
    drain(pending)
    return out_np


@dataclasses.dataclass
class RenderResult:
    """Output of one interpolate() call."""

    views: np.ndarray  # [V, H, W, 3] uint8
    maps: np.ndarray | None  # [2, H, W] uint8 (when focus_range > 0)
    run_times_s: list[float]  # per timed repetition (empty if not benchmarked)
    config: RenderConfig

    @property
    def avg_ms(self) -> float | None:
        if not self.run_times_s:
            return None
        return 1000.0 * sum(self.run_times_s) / len(self.run_times_s)

    @property
    def megapixels_per_s(self) -> float | None:
        """Output-pixel throughput of the render step."""
        if not self.run_times_s:
            return None
        v, h, w = self.views.shape[:3]
        avg = sum(self.run_times_s) / len(self.run_times_s)
        return v * h * w / avg / 1e6

    def save(self, path: str, *, progress: bool = True) -> list[str]:
        return writer.write_views(path, self.views, self.maps, progress=progress)

    def save_quilt(self, path: str, cols: int = 5, rows: int = 9,
                   tile_size: tuple[int, int] | None = None) -> str:
        q = quilt_ops.assemble_quilt(
            jnp.asarray(np.transpose(self.views, (0, 3, 1, 2))),
            cols=cols, rows=rows, tile_size=tile_size,
        )
        return writer.write_quilt(path, np.asarray(quilt_ops.to_hwc(q)))


@dataclasses.dataclass
class QuiltResult:
    """Output of one render_quilt() call."""

    quilt: np.ndarray  # [rows*tile_h, cols*tile_w, 3] uint8
    run_times_s: list[float]  # per timed repetition (empty if not benchmarked)
    config: RenderConfig
    fused: bool  # True when the direct-to-canvas kernel pair ran

    @property
    def avg_ms(self) -> float | None:
        if not self.run_times_s:
            return None
        return 1000.0 * sum(self.run_times_s) / len(self.run_times_s)

    @property
    def gigapixels_per_s(self) -> float | None:
        """Canvas-pixel throughput of the render step."""
        if not self.run_times_s:
            return None
        h, w = self.quilt.shape[:2]
        avg = sum(self.run_times_s) / len(self.run_times_s)
        return h * w / avg / 1e9

    def save(self, path: str) -> str:
        return writer.write_quilt(path, self.quilt)


class Interpolator:
    """Load a light field once; render novel-view sets many times."""

    def __init__(
        self,
        source: str | LightField,
        *,
        config: RenderConfig | None = None,
        progress: bool = True,
        mesh=None,  # jax.sharding.Mesh with axes (view, space), or None
    ):
        self.config = config or RenderConfig()
        self.lf = (
            source if isinstance(source, LightField) else load_light_field(
                source, progress=progress
            )
        )
        if progress:
            print(
                f"Loaded {self.lf.cols}x{self.lf.rows} grid of "
                f"{self.lf.width}x{self.lf.height} images"
            )
        self.mesh = mesh
        if mesh is not None:
            n_space = mesh.shape["space"]
            if self.lf.height % n_space != 0:
                raise ValueError(
                    f"Image height {self.lf.height} must divide by the mesh "
                    f"space axis ({n_space}) for sharded rendering"
                )
            if self.config.view_count % mesh.shape["view"] != 0:
                raise ValueError(
                    f"view_count {self.config.view_count} must divide by the "
                    f"mesh view axis ({mesh.shape['view']})"
                )
        # One host->device upload of the planar RGB stack (the analogue of
        # loadGPUData, src/interpolator.cu:95-137); replicated over the mesh
        # when sharded rendering is requested. May be dropped (set to None)
        # by a memory-pressured view-batched render and re-uploaded lazily.
        self.images: jnp.ndarray | None = None
        self._device_images()
        # Keyed by the (bucketed) shift bound: different focus settings that
        # land in the same bucket share one padded stack and one compiled
        # program. LRU-capped: each entry is a full padded device stack
        # (up to GBs), so an unbounded dict would leak HBM across a focus
        # sweep, while a single slot would re-pad when alternating settings.
        self._padded_cache: dict[tuple[int, int], jnp.ndarray] = {}
        self._padded_cache_max = 2

    # -- device data ------------------------------------------------------

    def _device_images(self) -> jnp.ndarray:
        """The device-resident planar stack, re-uploading if dropped."""
        if self.images is None:
            if isinstance(self.lf.images, np.ndarray):
                # Drop the alpha plane and transpose HOST-side: uploading
                # the RGBA stack and slicing on device would make the
                # device peak 1.33x the planar stack the capacity plan
                # counted (an uncounted 8.5 GiB transient at 8K/64 views).
                planar = jnp.asarray(
                    np.ascontiguousarray(
                        self.lf.images[..., :3].transpose(0, 3, 1, 2)
                    )
                )
            else:
                planar = blend_xla.to_planar(jnp.asarray(self.lf.images))
            if self.mesh is not None:
                from .parallel import mesh as pmesh

                self.images = pmesh.replicate(self.mesh, planar)
            else:
                self.images = jax.device_put(planar)
        return self.images

    def _padded(self, px: int, py: int) -> jnp.ndarray:
        """Shift-bound-padded stack for the Pallas kernel, built per bucket."""
        key = (px, py)
        if key not in self._padded_cache:
            padded = jax.jit(
                blend_pallas.pad_images, static_argnums=(1, 2)
            )(self._device_images(), px, py)
            while len(self._padded_cache) >= self._padded_cache_max:
                # Drop the oldest entry; the buffer frees on GC (an explicit
                # delete() could invalidate aliases, e.g. a mesh replicate
                # that no-op'd into the same committed buffer).
                self._padded_cache.pop(next(iter(self._padded_cache)))
            self._padded_cache[key] = jax.block_until_ready(padded)
        else:  # refresh LRU order (dicts preserve insertion order)
            self._padded_cache[key] = self._padded_cache.pop(key)
        return self._padded_cache[key]

    def _fixed_view_batched_step(
        self,
        plan: capacity.FixedRenderPlan,
        weights_np: np.ndarray,  # [V, G] float32
        fo_for,  # i -> focused offsets [G, 2] int32 (device)
        *,
        px: int,
        py: int,
        use_pallas: bool,
        progress: bool = False,
    ):
        """Build a step(i) rendering the views in HBM-sized batches.

        For outputs larger than device memory (e.g. 64 views at 8K =
        5.9 GiB): the stack is shifted once, then each weight-row batch
        blends while the previous batch drains to the host, so at most two
        batch outputs are device-resident. Under `plan.drop_images` the raw
        stack is additionally freed for the duration (re-uploaded from the
        host copy on the next non-Pallas use). Returns host [V, H, W, 3]
        uint8 -- callers must not re-fetch. (New capability: the reference
        tool aborts with a CUDA allocation error on >VRAM outputs,
        src/interpolator.cu:95-137.)
        """
        from .ops import shift_pallas

        lf = self.lf
        h, w = lf.height, lf.width
        v, g = weights_np.shape
        vb = plan.view_batch
        nb, w_batches = _batch_weights(weights_np, vb, progress)

        # Cached padded stacks from earlier focus buckets are residents the
        # plan's arithmetic did not count (each is GB-scale at the sizes
        # that trigger batching): evict everything but this render's bucket.
        for key in [k for k in self._padded_cache if k != (px, py)]:
            self._padded_cache.pop(key)
        padded = None
        if plan.drop_images:
            # The raw and padded stacks cannot both stay resident under
            # this budget: build the padded stack UNCACHED (the plan sized
            # the render without a cache entry), then free the raw one
            # before the shift intermediate materializes.
            padded = self._padded_cache.pop((px, py), None)
            if padded is None:
                padded = jax.block_until_ready(
                    jax.jit(blend_pallas.pad_images, static_argnums=(1, 2))(
                        self._device_images(), px, py
                    )
                )
            self.images = None
        elif use_pallas:
            padded = self._padded(px, py)
        use_tiled = use_pallas and shift_pallas.supports_padded(h, w)

        def step(i: int = 0) -> np.ndarray:
            fo_i = fo_for(i)
            # The shift is weight-independent: run it once per step, blend
            # per batch (the XLA arm previously re-shifted every batch).
            x4 = (
                shift_pallas.shift_padded_4d(
                    padded, fo_i, h=h, w=w, px=px, py=py
                )
                if use_tiled
                else None
            )
            shifted = (
                None if use_pallas
                else _shift_stack_jit(self._device_images(), fo_i)
            )

            def render_batch(b: int):
                if use_tiled:
                    return blend_pallas.blend_tiled_cropped(
                        x4, w_batches[b], h=h, w=w
                    )
                if use_pallas:
                    return blend_pallas.render_fixed_padded(
                        padded, w_batches[b], fo_i, h=h, w=w, px=px, py=py
                    )
                return _blend_rows_jit(shifted, w_batches[b])

            return _drain_view_batches(nb, vb, v, h, w, render_batch)

        return step

    def _allfocus_view_batched_step(
        self,
        plan: capacity.FixedRenderPlan,
        weights_np: np.ndarray,  # [V, G] float32
        offsets_j: jnp.ndarray,  # [G, 2] float32
        ids: np.ndarray,  # [K] int32 focus-view selection
        cfg: RenderConfig,
        *,
        radius: tuple[int, int],
        filter_radius: tuple[int, int],
        pad,
        spread,
        spans,
        method_key: str,
        progress: bool = False,
    ):
        """Build a step(i) -> (host views [V, H, W, 3], device maps [2, H, W])
        rendering the all-focus views in HBM-sized batches.

        The focus maps AND the per-pixel-focus selected stack are both
        view-independent, so each runs once per step; only the final MXU
        contraction (reference src/kernels.cu:326/:430) splits into
        weight-row batches, each draining to the host while the next renders
        (mirrors _fixed_view_batched_step's shift-once/blend-per-batch
        shape). blend_selected(select_allfocus(...)) is the same
        select+blend seam the unbatched blend_all_focus computes, so the
        split is byte-exact.
        """
        lf = self.lf
        h, w = lf.height, lf.width
        v, g = weights_np.shape
        vb = plan.view_batch
        nb, w_batches = _batch_weights(weights_np, vb, progress)
        ids_j = jnp.asarray(ids)
        # Stale cached padded stacks are residents the plan did not count.
        self._padded_cache.clear()
        tiled = pipeline.allfocus_uses_fused_blend(method_key, h, w, spread)
        assert tiled or not plan.drop_images  # the plan gates drop on fused
        px = pad[0] if pad is not None else max(w, 1)

        def block_list(rb: int, pye: int):
            out = []
            for r0 in range(0, h, rb):
                rc = min(rb, h - r0)
                out.append((
                    r0, rc, max(0, pye - r0), max(0, (r0 + rc + pye) - h)
                ))
            return out

        # The plan's estimate arithmetic sized ONE engine (the fused padded
        # operand carries a dead DMA tail the XLA sweep doesn't); withhold
        # spans -- the fused route trigger -- unless that engine was fused.
        spans_eff = spans if plan.estimate_fused else None

        def make_maps(f_i, fr):
            if plan.estimate_row_block is None:
                return pipeline.compute_focus_maps(
                    self._device_images(), offsets_j, f_i, fr, ids_j,
                    radius=radius, filter_radius=filter_radius,
                    steps=cfg.focus_steps, pad=pad,
                    exact_taps=cfg.exact_focus_taps, spans=spans_eff,
                    pyramid=(2, 1) if cfg.focus_pyramid else None,
                )
            # The estimate's full padded selected-views copy does not fit:
            # estimate block by block (estimate_focus_rows rebuilds each
            # block's pad window; its effective floor is max(pad, radius+1))
            # and assemble + filter the tiny full map on device.
            sel = pipeline.gather_views(self._device_images(), ids_j)
            sel_off = offsets_j[ids_j]
            blks = [
                pipeline.estimate_focus_rows(
                    sel, sel_off, f_i, fr, r0, radius=radius,
                    steps=cfg.focus_steps, pad=pad,
                    exact_taps=cfg.exact_focus_taps, rc=rc, top=top,
                    bot=bot, spans=spans_eff,
                )
                for r0, rc, top, bot in block_list(
                    plan.estimate_row_block,
                    max(int(pad[1]), int(radius[1]) + 1),
                )
            ]
            return pipeline.assemble_focus_maps(tuple(blks), filter_radius)

        if plan.row_block is not None:
            # XLA row-block mode (the plan only picks it for the XLA
            # engines): the per-pixel-focus select -- and under
            # plan.estimate_row_block the disparity estimate too -- runs
            # block by block over a row slab (select_allfocus_rows /
            # estimate_focus_rows), each block's weight-row batches
            # blending + draining while the next block computes.
            assert not tiled and not plan.drop_images and pad is not None
            blocks = block_list(plan.row_block, max(int(pad[1]), 1))

            def step(i: int = 0):
                f_i = jnp.float32(cfg.focus + 1e-7 * i)
                fr = jnp.float32(cfg.focus_range)
                maps = make_maps(f_i, fr)
                out_np = np.empty((v, h, w, 3), np.uint8)
                pending = None  # (batch, r0, rc, device views)

                def drain(item):
                    b, r0_, rc_, o = item
                    arr = np.asarray(o)
                    lo = b * vb
                    n = min(v - lo, vb)
                    out_np[lo : lo + n, r0_ : r0_ + rc_] = (
                        arr[:n].transpose(0, 2, 3, 1)
                    )

                for r0, rc, top, bot in blocks:
                    sel = pipeline.select_allfocus_rows(
                        self._device_images(), offsets_j, maps, f_i, fr,
                        r0, method=method_key, steps=cfg.focus_steps,
                        pad=pad, rc=rc, top=top, bot=bot,
                    )
                    for b in range(nb):
                        o = pipeline.blend_selected(
                            sel, w_batches[b], tiled=False, h=rc, w=w
                        )
                        if pending is not None:
                            drain(pending)
                        pending = (b, r0, rc, o)
                drain(pending)
                return out_np, maps

            return step

        def step(i: int = 0):
            # same benchmark-dedup epsilon as the unbatched step
            f_i = jnp.float32(cfg.focus + 1e-7 * i)
            fr = jnp.float32(cfg.focus_range)
            maps = make_maps(f_i, fr)
            if plan.drop_images:
                # The raw stack and the x4 select output cannot coexist
                # under this budget: build the tiled copy, free the raw
                # stack (re-uploaded lazily on the next use -- including
                # this step's next benchmark repetition), select from the
                # tiles, free them too.
                tiles = _pad_to_tiles_jit()(self._device_images())
                self.images = None
                selected = pipeline.select_allfocus_pretiled(
                    tiles, offsets_j, maps, f_i, fr,
                    steps=cfg.focus_steps, spread=spread, px=px, h=h, w=w,
                    method=method_key,
                )
                del tiles
            else:
                selected = pipeline.select_allfocus(
                    self._device_images(), offsets_j, maps, f_i, fr,
                    method=method_key, steps=cfg.focus_steps, pad=pad,
                    spread=spread,
                )

            def render_batch(b: int):
                return pipeline.blend_selected(
                    selected, w_batches[b], tiled=tiled, h=h, w=w
                )

            return _drain_view_batches(nb, vb, v, h, w, render_batch), maps

        return step

    # -- mesh capacity ----------------------------------------------------

    def _check_mesh_allfocus(
        self, k: int, v: int, pad, spread, spans, method_key: str, cfg,
        radius,
    ) -> None:
        """Host-side PER-CHIP HBM arithmetic for mesh all-focus renders
        (render_all_focus_sharded's slab route), raising an actionable
        error instead of letting a shard OOM the backend -- the mesh
        analogue of plan_allfocus_render."""
        from .parallel import mesh as pmesh

        phases = pmesh.allfocus_shard_bytes(
            self.mesh.shape["view"], self.mesh.shape["space"],
            self.lf.grid_size, k, 3, self.lf.height, self.lf.width, v,
            radius=radius, steps=cfg.focus_steps, pad=pad, spans=spans,
            spread=spread, method=method_key,
            exact_taps=cfg.exact_focus_taps,
        )
        capacity.check_capacity(
            phases["peak"], "Mesh all-focus render (per chip)",
            hint=capacity.MESH_HINT,
        )

    def _check_mesh_fixed(self, v: int, px: int, py: int, use_pallas: bool) -> None:
        from .parallel import mesh as pmesh

        capacity.check_capacity(
            pmesh.fixed_shard_bytes(
                self.mesh.shape["view"], self.mesh.shape["space"],
                self.lf.grid_size, 3, self.lf.height, self.lf.width, v,
                px=px, py=py, use_pallas=use_pallas,
            ),
            "Mesh fixed-focus render (per chip)", hint=capacity.MESH_HINT,
        )

    # -- rendering --------------------------------------------------------

    def interpolate(
        self,
        trajectory: str,
        *,
        focus: float = 0.0,
        focus_range: float = 0.0,
        method: str | None = None,
        effect: float | None = None,
        aspect: float | None = None,
        benchmark_runs: int = 0,
        progress: bool = True,
    ) -> RenderResult:
        """Synthesize the novel-view set for one trajectory.

        Mirrors Interpolator::interpolate (src/interpolator.cu:248-297);
        `benchmark_runs > 0` additionally times that many repetitions of the
        render step (the reference always times 100).
        """
        cfg = dataclasses.replace(
            self.config,
            focus=focus,
            focus_range=focus_range,
            method=(method or self.config.method),
            effect=(effect if effect is not None else self.config.effect),
            aspect=(aspect if aspect is not None else self.config.aspect),
        )
        cfg.validate()
        method_key = "TEN" if cfg.method in ("TEN", "TEN_WM") else "STD"

        lf = self.lf
        start_end = geometry.parse_trajectory(trajectory, lf.cols_rows)
        center = geometry.trajectory_center(start_end)
        wm = geometry.weight_matrix(
            start_end, lf.cols, lf.rows, cfg.effect, cfg.view_count
        )
        # fp16 weight quantization for parity with the reference
        # (src/interpolator.cu:217-219); accumulation stays float32.
        wm = geometry.quantize_weights_f16(wm).astype(np.float32)
        offsets = geometry.compute_offsets(
            lf.cols, lf.rows, lf.width, lf.height, cfg.aspect, center
        )
        if self.mesh is not None:
            from .parallel import mesh as pmesh

            weights = pmesh.shard_weights(self.mesh, jnp.asarray(wm))
        else:
            weights = jnp.asarray(wm)
        offsets_j = jnp.asarray(offsets)

        host_views = False  # set when a batched step returns host arrays
        if cfg.uses_focus_map:
            radius = geometry.block_radius(
                lf.width, lf.height, cfg.pixel_size_factor
            )
            filter_radius = (
                radius[0] // cfg.filter_radius_divisor,
                radius[1] // cfg.filter_radius_divisor,
            )
            ids = geometry.select_focus_views(
                start_end, lf.cols, lf.rows, cfg.focus_map_views
            )
            from .ops import focus as focus_ops

            pad = focus_ops.shift_pad_bound(
                offsets, cfg.focus, cfg.focus_range, radius, lf.height, lf.width
            )
            from .ops import allfocus_pallas, estimate_pallas

            spread = allfocus_pallas.spread_bound(
                offsets, cfg.focus, cfg.focus_range
            )
            spans = estimate_pallas.chunk_spans(
                offsets, cfg.focus, cfg.focus_range, cfg.focus_steps, 4
            )
            if progress:
                print("Estimating focus map...")

            plan = (
                capacity.plan_allfocus_render(
                    lf.grid_size, len(ids), 3, lf.height, lf.width,
                    cfg.view_count, px=pad[0], py=pad[1],
                    fused_blend=pipeline.allfocus_uses_fused_blend(
                        method_key, lf.height, lf.width, spread
                    ),
                    est_fused_bytes=estimate_pallas.slab_bytes_fn(
                        lf.height, lf.width, len(ids), 3, cfg.focus_steps,
                        radius, spans, pad[0], pad[1],
                        exact_taps=cfg.exact_focus_taps,
                    ),
                )
                if self.mesh is None
                # Mesh renders shard the stack by rows instead of view
                # batching, so the single-chip plan does not apply -- but
                # the PER-CHIP slab-route arithmetic must still fit.
                else capacity.FixedRenderPlan(None, False, 0, 0)
            )
            if self.mesh is not None:
                self._check_mesh_allfocus(
                    len(ids), cfg.view_count, pad, spread, spans,
                    method_key, cfg, radius,
                )
            if plan.batched:
                step = self._allfocus_view_batched_step(
                    plan, wm, offsets_j, ids, cfg,
                    radius=radius, filter_radius=filter_radius, pad=pad,
                    spread=spread, spans=spans, method_key=method_key,
                    progress=progress,
                )
                host_views = True
            else:
                def step(i: int = 0):
                    # The i-dependent epsilon keeps repeated benchmark runs from
                    # being deduplicated by execution-memoizing environments; it
                    # is far below the focus quantization step.
                    kwargs = dict(
                        method=method_key,
                        radius=radius,
                        filter_radius=filter_radius,
                        steps=cfg.focus_steps,
                        pad=pad,
                        # Run the estimate engine the plan sized (meshes
                        # plan per shard row block and always take fused).
                        spans=spans
                        if self.mesh is not None or plan.estimate_fused
                        else None,
                    )
                    if self.mesh is None and cfg.focus_pyramid:
                        # approximate coarse-to-fine estimate (documented
                        # flag; sharded renders row-block and fall back)
                        kwargs["pyramid"] = (2, 1)
                    if self.mesh is not None:
                        from .parallel import mesh as pmesh

                        return pmesh.render_all_focus_sharded(
                            self.mesh, self._device_images(), weights, offsets_j,
                            jnp.float32(cfg.focus + 1e-7 * i),
                            jnp.float32(cfg.focus_range),
                            jnp.asarray(ids),
                            exact_taps=cfg.exact_focus_taps, spread=spread,
                            **kwargs,
                        )
                    return pipeline.render_all_focus(
                        self._device_images(),
                        weights,
                        offsets_j,
                        jnp.float32(cfg.focus + 1e-7 * i),
                        jnp.float32(cfg.focus_range),
                        jnp.asarray(ids),
                        exact_taps=cfg.exact_focus_taps,
                        spread=spread,
                        **kwargs,
                    )

            views, maps = step()
            run = step
        else:
            def fo_for(i: int = 0):
                # see step(): the epsilon keeps repeated benchmark runs from
                # being deduplicated by execution-memoizing environments
                return jnp.asarray(
                    geometry.focused_offsets(offsets, cfg.focus + 1e-5 * i)
                )

            fo = fo_for(0)
            # Static clamp-pad bound covering the focus value plus the
            # benchmark loop's tiny per-run epsilons.
            focus_hi = cfg.focus + 1e-5 * (benchmark_runs + 1)
            f_interval = (min(cfg.focus, focus_hi), max(cfg.focus, focus_hi))
            if self.mesh is not None:
                from .parallel import mesh as pmesh

                use_pallas = (
                    method_key == "TEN"
                    and blend_pallas.is_available()
                    and lf.height % self.mesh.shape["space"] == 0
                )
                if use_pallas:
                    px, py = blend_pallas.shift_bound(
                        offsets, f_interval, lf.height, lf.width
                    )
                    self._check_mesh_fixed(
                        cfg.view_count, px, py, use_pallas=True
                    )
                    padded = pmesh.replicate(self.mesh, self._padded(px, py))

                    def step(i: int = 0):
                        return pmesh.render_fixed_sharded_pallas(
                            self.mesh, padded, weights,
                            fo if i == 0 else fo_for(i),
                            h=lf.height, w=lf.width, px=px, py=py,
                        )
                else:
                    self._check_mesh_fixed(
                        cfg.view_count, 0, 0, use_pallas=False
                    )

                    def step(i: int = 0):
                        return pmesh.render_fixed_sharded(
                            self.mesh, self._device_images(), weights,
                            fo if i == 0 else fo_for(i),
                        )

            elif method_key == "TEN" and blend_pallas.is_available():
                px, py = blend_pallas.shift_bound(
                    offsets, f_interval, lf.height, lf.width
                )
                plan = capacity.plan_fixed_render(
                    lf.grid_size, 3, lf.height, lf.width, cfg.view_count,
                    px, py,
                )
                if plan.batched:
                    step = self._fixed_view_batched_step(
                        plan, wm, fo_for, px=px, py=py, use_pallas=True,
                        progress=progress,
                    )
                    host_views = True
                else:
                    padded = self._padded(px, py)

                    def step(i: int = 0):
                        return blend_pallas.render_fixed_padded(
                            padded, weights, fo if i == 0 else fo_for(i),
                            h=lf.height, w=lf.width, px=px, py=py,
                        )

            else:
                plan = capacity.plan_fixed_render(
                    lf.grid_size, 3, lf.height, lf.width, cfg.view_count,
                    0, 0, use_padded=False,
                )
                if plan.batched:
                    step = self._fixed_view_batched_step(
                        plan, wm, fo_for, px=0, py=0, use_pallas=False,
                        progress=progress,
                    )
                    host_views = True
                else:

                    def step(i: int = 0):
                        return pipeline.render_fixed_focus(
                            self._device_images(), weights,
                            fo if i == 0 else fo_for(i), method=method_key,
                        )

            views = step()
            maps = None
            run = step

        views = jax.block_until_ready(views)

        run_times: list[float] = []
        if benchmark_runs > 0:
            if progress:
                print("Rendering views...")
            for i in range(benchmark_runs):
                t0 = time.perf_counter()
                out = run(i + 1)
                jax.block_until_ready(out)
                _tiny_sync(out)
                run_times.append(time.perf_counter() - t0)
            if progress:
                avg = 1000 * sum(run_times) / len(run_times)
                print(
                    f"Average time of {benchmark_runs} runs: {avg:.3f} ms"
                )

        views_np = (
            views if host_views else _fetch(blend_xla.from_planar(views))
        )
        maps_np = _fetch(maps) if maps is not None else None
        return RenderResult(
            views=views_np, maps=maps_np, run_times_s=run_times, config=cfg
        )

    def render_quilt(
        self,
        trajectory: str,
        *,
        focus: float = 0.0,
        focus_range: float = 0.0,
        method: str | None = None,
        effect: float | None = None,
        aspect: float | None = None,
        cols: int = 5,
        rows: int = 9,
        tile_size: tuple[int, int] | None = None,
        benchmark_runs: int = 0,
        progress: bool = True,
    ) -> QuiltResult:
        """Quilt-ONLY render (Looking Glass 5x9 by default).

        When the geometry, method, and capacity allow it, this runs the
        fused direct-to-canvas route (`quilt.render_fixed_quilt_padded`):
        ONE kernel pair clamp-shifts the padded stack and blends each of
        the cols*rows placed views straight at its tile position in the
        canvas -- the per-view stack never materializes and only cols*rows
        of the view_count views are ever blended (measured 3.55 ms vs
        5.50 ms two-stage at 8x8/1080p, bench c4). Everything else --
        STD, all-focus (focus_range > 0), resized tiles, mesh renders,
        capacity-batched sizes, unaligned geometry -- falls back to the
        byte-identical two-stage render + assemble path.

        Reference flow: render all views, then scripts/viewsToQuilt.sh
        montages the PNGs out of process.
        """
        cfg = dataclasses.replace(
            self.config,
            focus=focus,
            focus_range=focus_range,
            method=(method or self.config.method),
            effect=(effect if effect is not None else self.config.effect),
            aspect=(aspect if aspect is not None else self.config.aspect),
        )
        cfg.validate()
        method_key = "TEN" if cfg.method in ("TEN", "TEN_WM") else "STD"
        lf = self.lf
        n = cols * rows
        if cfg.view_count < n:
            raise ValueError(
                f"Quilt needs {n} views ({cols}x{rows}), but view_count is "
                f"{cfg.view_count}"
            )

        fused_ok = (
            self.mesh is None
            and cfg.focus_range == 0.0
            and method_key == "TEN"
            and blend_pallas.is_available()
            and (tile_size is None or tile_size == (lf.height, lf.width))
            and quilt_ops.supports_fused_render(
                lf.height, lf.width, lf.grid_size, cols, rows
            )
        )
        if fused_ok:
            start_end = geometry.parse_trajectory(trajectory, lf.cols_rows)
            center = geometry.trajectory_center(start_end)
            wm = geometry.quantize_weights_f16(
                geometry.weight_matrix(
                    start_end, lf.cols, lf.rows, cfg.effect, cfg.view_count
                )
            ).astype(np.float32)
            offsets = geometry.compute_offsets(
                lf.cols, lf.rows, lf.width, lf.height, cfg.aspect, center
            )
            focus_hi = cfg.focus + 1e-5 * (benchmark_runs + 1)
            f_interval = (min(cfg.focus, focus_hi), max(cfg.focus, focus_hi))
            px, py = blend_pallas.shift_bound(
                offsets, f_interval, lf.height, lf.width
            )
            # The canvas holds exactly n views' bytes, so the fixed-render
            # plan with view_count=n models the fused route's footprint
            # (padded stack + shift intermediate + output).
            plan = capacity.plan_fixed_render(
                lf.grid_size, 3, lf.height, lf.width, n, px, py
            )
            fused_ok = not plan.batched

        if fused_ok:
            padded = self._padded(px, py)
            weights = jnp.asarray(wm)

            def step(i: int = 0):
                # same benchmark-dedup epsilon as interpolate()'s fixed path
                fo = jnp.asarray(
                    geometry.focused_offsets(offsets, cfg.focus + 1e-5 * i)
                )
                return quilt_ops.render_fixed_quilt_padded(
                    padded, weights, fo, cols=cols, rows=rows,
                    h=lf.height, w=lf.width, px=px, py=py,
                )

            q = jax.block_until_ready(step())
            run_times: list[float] = []
            for i in range(benchmark_runs):
                t0 = time.perf_counter()
                out = step(i + 1)
                jax.block_until_ready(out)
                _tiny_sync(out)
                run_times.append(time.perf_counter() - t0)
            if benchmark_runs > 0 and progress:
                avg = 1000 * sum(run_times) / len(run_times)
                print(f"Average time of {benchmark_runs} runs: {avg:.3f} ms")
            return QuiltResult(
                quilt=np.asarray(quilt_ops.to_hwc(q)),
                run_times_s=run_times, config=cfg, fused=True,
            )

        # Two-stage fallback: full render, then on-device assembly --
        # byte-identical to the fused route (chip-validated, bench c4).
        result = self.interpolate(
            trajectory, focus=focus, focus_range=focus_range,
            method=cfg.method, effect=cfg.effect, aspect=cfg.aspect,
            benchmark_runs=benchmark_runs, progress=progress,
        )
        q = quilt_ops.assemble_quilt(
            jnp.asarray(np.transpose(result.views, (0, 3, 1, 2))),
            cols=cols, rows=rows, tile_size=tile_size,
        )
        return QuiltResult(
            quilt=np.asarray(quilt_ops.to_hwc(q)),
            run_times_s=result.run_times_s, config=cfg, fused=False,
        )

    def interpolate_batch(
        self,
        trajectories: list[str],
        *,
        focus: float = 0.0,
        focus_range: float = 0.0,
        method: str | None = None,
        effect: float | None = None,
        aspect: float | None = None,
        center_tolerance: float = 0.0,
        progress: bool = True,
    ) -> list[RenderResult]:
        """Render several trajectories in few fused passes.

        The blend is bandwidth-bound on reading the image stack, so stacking
        the trajectories' weight matrices into one [n*V, G] matrix makes the
        extra trajectories nearly free: every source pixel is read once for
        all of them. The per-image shifts depend only on the trajectory
        CENTER, so trajectories are grouped by center and each group renders
        in one fused pass; results come back in the caller's order. When a
        group's stacked output outgrows device memory, the pass falls back
        to view batches (see _fixed_view_batched_step). (No reference
        equivalent -- the CUDA tool renders one trajectory per process.)

        With `focus_range > 0` (all-in-focus), sharing goes further: the
        focus-view selection, disparity maps, and per-pixel-focus selected
        stack all depend only on the group's center, so one estimate + one
        select serve every trajectory in the group and each pays only its
        MXU contraction -- the estimate is >60% of a solo all-focus run.
        Each result carries the group's shared maps.

        `center_tolerance` (grid-cell units, default 0 = off) additionally
        merges groups whose centers lie within that distance of an earlier
        trajectory's center: a serving workload with jittered trajectories
        then pays ONE estimate per cluster instead of one per distinct
        center. This is a documented approximation -- members of a merged
        group render with the FIRST member's center (its offsets, focus
        views, and maps), so their outputs can differ from a solo render;
        sub-0.01 tolerances are visually lossless for typical grids while
        collapsing jitter, but the default keeps exact per-center behavior.
        """
        cfg = dataclasses.replace(
            self.config,
            focus=focus,
            focus_range=focus_range,
            method=(method or self.config.method),
            effect=(effect if effect is not None else self.config.effect),
            aspect=(aspect if aspect is not None else self.config.aspect),
        )
        cfg.validate()
        method_key = "TEN" if cfg.method in ("TEN", "TEN_WM") else "STD"
        lf = self.lf

        parsed = [
            geometry.parse_trajectory(t, lf.cols_rows) for t in trajectories
        ]
        centers = np.stack([geometry.trajectory_center(se) for se in parsed])
        # Group indices by (quantized) center; one fused pass per group.
        groups: dict[tuple, list[int]] = {}
        if center_tolerance > 0.0:
            # Greedy clustering: join the first earlier center within the
            # tolerance (Euclidean, grid-cell units), else found a group.
            reps: list[np.ndarray] = []
            for i, c in enumerate(centers):
                for gi, rep in enumerate(reps):
                    if float(np.hypot(*(c - rep))) <= center_tolerance:
                        groups[(gi,)].append(i)
                        break
                else:
                    groups[(len(reps),)] = [i]
                    reps.append(c)
        else:
            for i, c in enumerate(centers):
                groups.setdefault(
                    tuple(np.round(c / 1e-5).astype(np.int64)), []
                ).append(i)

        results: list[RenderResult | None] = [None] * len(trajectories)
        v = cfg.view_count
        for idxs in groups.values():
            center = centers[idxs[0]]
            offsets = geometry.compute_offsets(
                lf.cols, lf.rows, lf.width, lf.height, cfg.aspect, center
            )
            wms = [
                geometry.quantize_weights_f16(
                    geometry.weight_matrix(
                        parsed[i], lf.cols, lf.rows, cfg.effect, cfg.view_count
                    )
                ).astype(np.float32)
                for i in idxs
            ]
            big_np = np.concatenate(wms, axis=0)  # [len(idxs)*V, G]
            big = jnp.asarray(big_np)
            fo = jnp.asarray(geometry.focused_offsets(offsets, cfg.focus))
            maps_np = None

            if self.mesh is not None and big.shape[0] % self.mesh.shape["view"] != 0:
                raise ValueError(
                    f"batched view count {big.shape[0]} must divide by the "
                    f"mesh view axis ({self.mesh.shape['view']})"
                )

            if cfg.uses_focus_map:
                # All trajectories of a group share the center, so the
                # focus-view selection, the disparity maps, and the
                # per-pixel-focus selected stack are shared too -- one
                # estimate+select serves the whole group.
                radius = geometry.block_radius(
                    lf.width, lf.height, cfg.pixel_size_factor
                )
                filter_radius = (
                    radius[0] // cfg.filter_radius_divisor,
                    radius[1] // cfg.filter_radius_divisor,
                )
                ids = geometry.select_focus_views(
                    parsed[idxs[0]], lf.cols, lf.rows, cfg.focus_map_views
                )
                from .ops import allfocus_pallas, estimate_pallas
                from .ops import focus as focus_ops

                pad = focus_ops.shift_pad_bound(
                    offsets, cfg.focus, cfg.focus_range, radius,
                    lf.height, lf.width,
                )
                spread = allfocus_pallas.spread_bound(
                    offsets, cfg.focus, cfg.focus_range
                )
                spans = estimate_pallas.chunk_spans(
                    offsets, cfg.focus, cfg.focus_range, cfg.focus_steps, 4
                )
                offsets_j = jnp.asarray(offsets)
                kwargs = dict(
                    method=method_key, radius=radius,
                    filter_radius=filter_radius, steps=cfg.focus_steps,
                    pad=pad, spans=spans,
                )
                if self.mesh is not None:
                    from .parallel import mesh as pmesh

                    self._check_mesh_allfocus(
                        len(ids), big_np.shape[0], pad, spread, spans,
                        method_key, cfg, radius,
                    )
                    views, maps = pmesh.render_all_focus_sharded(
                        self.mesh, self._device_images(),
                        pmesh.shard_weights(self.mesh, big), offsets_j,
                        jnp.float32(cfg.focus), jnp.float32(cfg.focus_range),
                        jnp.asarray(ids), exact_taps=cfg.exact_focus_taps,
                        spread=spread, **kwargs,
                    )
                else:
                    plan = capacity.plan_allfocus_render(
                        lf.grid_size, len(ids), 3, lf.height, lf.width,
                        big_np.shape[0], px=pad[0], py=pad[1],
                        fused_blend=pipeline.allfocus_uses_fused_blend(
                            method_key, lf.height, lf.width, spread
                        ),
                        est_fused_bytes=estimate_pallas.slab_bytes_fn(
                            lf.height, lf.width, len(ids), 3,
                            cfg.focus_steps, radius, spans, pad[0], pad[1],
                            exact_taps=cfg.exact_focus_taps,
                        ),
                    )
                    if plan.batched:
                        views, maps = self._allfocus_view_batched_step(
                            plan, big_np, offsets_j, ids, cfg,
                            radius=radius, filter_radius=filter_radius,
                            pad=pad, spread=spread, spans=spans,
                            method_key=method_key, progress=progress,
                        )()
                    else:
                        # run the estimate engine the plan sized
                        kwargs["spans"] = spans if plan.estimate_fused else None
                        if cfg.focus_pyramid:
                            kwargs["pyramid"] = (2, 1)
                        views, maps = pipeline.render_all_focus(
                            self._device_images(), big, offsets_j,
                            jnp.float32(cfg.focus),
                            jnp.float32(cfg.focus_range), jnp.asarray(ids),
                            exact_taps=cfg.exact_focus_taps, spread=spread,
                            **kwargs,
                        )
                maps_np = _fetch(maps)
            elif self.mesh is not None:
                from .parallel import mesh as pmesh

                big_sharded = pmesh.shard_weights(self.mesh, big)
                # Mirror interpolate(): prefer the fused Pallas kernel per
                # shard when the method and geometry allow it.
                use_pallas = (
                    method_key == "TEN"
                    and blend_pallas.is_available()
                    and lf.height % self.mesh.shape["space"] == 0
                )
                if use_pallas:
                    px, py = blend_pallas.shift_bound(
                        offsets, cfg.focus, lf.height, lf.width
                    )
                    self._check_mesh_fixed(
                        big_np.shape[0], px, py, use_pallas=True
                    )
                    padded = pmesh.replicate(self.mesh, self._padded(px, py))
                    views = pmesh.render_fixed_sharded_pallas(
                        self.mesh, padded, big_sharded, fo,
                        h=lf.height, w=lf.width, px=px, py=py,
                    )
                else:
                    self._check_mesh_fixed(
                        big_np.shape[0], 0, 0, use_pallas=False
                    )
                    views = pmesh.render_fixed_sharded(
                        self.mesh, self._device_images(), big_sharded, fo,
                    )
            elif method_key == "TEN" and blend_pallas.is_available():
                px, py = blend_pallas.shift_bound(
                    offsets, cfg.focus, lf.height, lf.width
                )
                plan = capacity.plan_fixed_render(
                    lf.grid_size, 3, lf.height, lf.width, big_np.shape[0],
                    px, py,
                )
                if plan.batched:
                    views = self._fixed_view_batched_step(
                        plan, big_np, lambda i: fo, px=px, py=py,
                        use_pallas=True, progress=progress,
                    )()
                else:
                    views = blend_pallas.render_fixed_padded(
                        self._padded(px, py), big, fo,
                        h=lf.height, w=lf.width, px=px, py=py,
                    )
            else:
                plan = capacity.plan_fixed_render(
                    lf.grid_size, 3, lf.height, lf.width, big_np.shape[0],
                    0, 0, use_padded=False,
                )
                if plan.batched:
                    views = self._fixed_view_batched_step(
                        plan, big_np, lambda i: fo, px=0, py=0,
                        use_pallas=False, progress=progress,
                    )()
                else:
                    views = pipeline.render_fixed_focus(
                        self._device_images(), big, fo, method=method_key
                    )
            views_np = (
                views if isinstance(views, np.ndarray)
                else _fetch(blend_xla.from_planar(views))
            )
            for j, i in enumerate(idxs):
                results[i] = RenderResult(
                    views=views_np[j * v : (j + 1) * v],
                    maps=maps_np,  # the group's shared maps (all-focus)
                    run_times_s=[],
                    config=cfg,
                )
        return results  # type: ignore[return-value]


def interpolate(
    input_path: str,
    output_path: str,
    trajectory: str,
    *,
    focus: float = 0.0,
    focus_range: float = 0.0,
    method: str = "STD",
    effect: float = 3.0,
    aspect: float = 1.0,
    benchmark_runs: int = 0,
    progress: bool = True,
) -> RenderResult:
    """One-shot convenience wrapper matching the reference CLI's behavior."""
    interp = Interpolator(
        input_path,
        config=RenderConfig(method=method, effect=effect, aspect=aspect),
        progress=progress,
    )
    result = interp.interpolate(
        trajectory,
        focus=focus,
        focus_range=focus_range,
        benchmark_runs=benchmark_runs,
        progress=progress,
    )
    result.save(output_path, progress=progress)
    return result
