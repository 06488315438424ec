"""Host-side HBM capacity planning for single-chip renders.

The reference CUDA tool simply aborts with cudaErrorMemoryAllocation when a
light field outgrows device memory (no planning analogue -- this module is a
new capability). On TPU the stakes are higher: letting XLA discover the OOM
at compile/alloc time can wedge a tunneled backend for hours, so every
oversized request must be caught by host-side arithmetic BEFORE any device
allocation.

`plan_fixed_render` sizes the fixed-focus pipeline's resident buffers
(raw planar stack, shift-bound padded stack, shifted intermediate, blended
output) against the device budget and returns one of three shapes:

  * everything fits            -> no batching (the common case; zero change)
  * output too big             -> render the views in batches, fetching each
                                  batch to the host while the next renders
  * raw + padded stacks too big -> additionally free the raw device stack for
                                  the duration of the render (it re-uploads
                                  from the host copy on demand)

or raises with the arithmetic when even a single-view batch cannot fit, with
a pointer at mesh sharding (parallel/mesh.py splits the stack by rows, so a
multi-chip mesh renders outputs no single chip can hold).
"""

from __future__ import annotations

import dataclasses
import os


#: Per-chip HBM on TPU v5e. Used when the backend exposes no byte limit.
DEFAULT_TPU_HBM_BYTES = int(15.75 * 2**30)

#: Effectively-unbounded budget reported for CPU/interpret runs, where host
#: RAM (not HBM) backs the buffers and batching would only slow tests down.
UNBOUNDED = 1 << 62


def device_hbm_bytes() -> int:
    """Device memory budget in bytes, host-side.

    `LFI_HBM_BYTES` overrides (tests use it to force batching on tiny
    inputs); otherwise the TPU backend's reported `bytes_limit`, falling
    back to the v5e default; non-TPU backends are treated as unbounded.
    """
    env = os.environ.get("LFI_HBM_BYTES")
    if env:
        return int(env)
    try:
        import jax

        dev = jax.local_devices()[0]
        # Host-backed platforms have no HBM to protect. Everything else
        # (including the tunneled "axon" TPU platform) is treated as a TPU.
        if dev.platform == "cpu":
            return UNBOUNDED
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:  # backend not initialized / stats unsupported
        pass
    return DEFAULT_TPU_HBM_BYTES


def _headroom(budget: int) -> int:
    """Slack left for XLA scratch, fragmentation, and small constants.

    512 MB at full-chip budgets: a 256 MB slack planned an 8K render to
    within ~50 MB of the 15.75 GiB budget and the chip intermittently
    returned RESOURCE_EXHAUSTED at that occupancy (round 4; the identical
    plan also ran clean twice -- fragmentation-sensitive), so the margin
    is set by observed allocator behavior, not arithmetic."""
    return min(512 * 2**20, budget // 16)


def _align(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class FixedRenderPlan:
    """How to fit one render into device memory."""

    view_batch: int | None  # weight rows per fused pass; None = all at once
    drop_images: bool  # free the raw device stack during the render
    budget: int  # effective byte budget the plan was sized against
    bytes_unbatched: int  # resident bytes of the plain single-pass render
    # All-focus XLA-select arm only: output rows per select block (the
    # per-pixel-focus select runs block by block over a row slab instead of
    # one full-stack pass). None = whole frame at once.
    row_block: int | None = None
    # All-focus: output rows per ESTIMATE block when its full padded
    # selected-views copy does not fit (pipeline.estimate_focus_rows pads
    # per block instead; the maps are engine-independent, so this composes
    # with both the XLA row-block arm and the fused drop arm). None = whole
    # frame at once.
    estimate_row_block: int | None = None
    # All-focus: whether the plan's estimate arithmetic sized the FUSED
    # SWAR kernels (estimate_pallas) -- their padded operand carries a dead
    # DMA tail the XLA sweep doesn't, so the engine must be part of the
    # plan. api.py passes `spans` to the estimate only when True, keeping
    # the engine that runs the one that was sized.
    estimate_fused: bool = False

    @property
    def batched(self) -> bool:
        return self.view_batch is not None


def plan_fixed_render(
    g: int,
    c: int,
    h: int,
    w: int,
    v: int,
    px: int,
    py: int,
    *,
    use_padded: bool = True,
    budget: int | None = None,
) -> FixedRenderPlan:
    """Size the fixed-focus render and pick a fitting view batch.

    Resident buffers (uint8 unless noted), in pipeline order:

      in     [G, C, H, W]                      raw planar stack
      padded [G, C, H+2py+48, W+2px+256]       clamp-encoded pad (Pallas path)
      shift  [G, C, H8, W128]                  shifted intermediate
      out    [Vb, C, H8, W128] (+ crop copy)   blended batch

    Batched renders keep TWO batch outputs in flight (batch t+1 renders
    while batch t drains to the host), hence the factor 2. With
    `use_padded=False` (the XLA fallback path) there is no padded stack, the
    raw stack can never be dropped (every step's shift re-reads it), and the
    XLA blend's float32 temporaries must be counted: the u8->f32 einsum
    materializes a 4x f32 copy of the shifted stack (blend_xla.blend) plus a
    4-byte-per-pixel accumulator for the batch being rendered.
    """
    b = (budget if budget is not None else device_hbm_bytes())
    b_eff = b - _headroom(b)
    h8, w128 = _align(h, 8), _align(w, 128)
    in_b = g * c * h * w
    padded_b = g * c * (h + 2 * py + 48) * (w + 2 * px + 256) if use_padded else 0
    shift_b = g * c * h8 * w128
    # Per-view output bytes; unaligned geometries pay an extra cropped copy.
    ov = c * h8 * w128 + (c * h * w if (h8, w128) != (h, w) else 0)
    # XLA blend f32 temporaries (zero on the Pallas path: its accumulator
    # lives in VMEM). The f32 stack copy is per-call transient, counted once.
    f32_stack = 0 if use_padded else 4 * shift_b
    f32_view = 0 if use_padded else 4 * c * h * w  # accumulator rows

    total = in_b + padded_b + shift_b + f32_stack + v * (ov + f32_view)
    if total <= b_eff:
        return FixedRenderPlan(None, False, b_eff, total)

    def _vb(avail: int) -> int:
        # two u8 batch outputs in flight + one batch's f32 accumulator
        return min(v, avail // (2 * ov + f32_view))

    vb = _vb(b_eff - in_b - padded_b - shift_b - f32_stack)
    if vb >= 1:
        return FixedRenderPlan(vb, False, b_eff, total)

    # Dropping the raw stack only helps the padded path, and the build
    # itself must fit (raw + padded coexist while the pad op runs).
    if use_padded and in_b + padded_b <= b_eff:
        vb = _vb(b_eff - padded_b - shift_b)
        if vb >= 1:
            return FixedRenderPlan(vb, True, b_eff, total)

    gib = 2.0**30
    raise ValueError(
        f"Light field too large for one device: {g} images of {w}x{h} need "
        f"{in_b / gib:.2f} GiB raw + {padded_b / gib:.2f} GiB padded + "
        f"{shift_b / gib:.2f} GiB shifted + {ov / gib:.2f} GiB per output "
        f"view against a {b_eff / gib:.2f} GiB budget, and even a one-view "
        f"batch does not fit. Render with a multi-chip mesh "
        f"(Interpolator(mesh=...) shards the stack by rows) or reduce the "
        f"resolution/grid."
    )


def plan_allfocus_render(
    g: int,
    k: int,
    c: int,
    h: int,
    w: int,
    v: int,
    *,
    px: int = 1,
    py: int = 1,
    fused_blend: bool = False,
    est_fused_bytes=None,
    budget: int | None = None,
) -> FixedRenderPlan:
    """Size the all-focus render and pick a fitting view batch.

    Three phases with different residents (all uint8 unless noted; px/py is
    the shift-pad bound from focus_ops.shift_pad_bound, fused_blend is
    pipeline.allfocus_uses_fused_blend for this config -- the plan's
    arithmetic must match the engine that actually runs):

      estimate: in [G, C, H, W] + selected views [K, C, H, W] + maps
                [2, H, W] + the engine's big operand. Fused SWAR kernels
                (`est_fused_bytes` given -- estimate_pallas.slab_bytes_fn,
                exact per-geometry PEAK arithmetic incl. the dead DMA tail
                AND the pad-build row-concat intermediate that coexists
                with the operand during the column concat): the
                tail-extended edge pad, or per row block the slab + its
                tail-extended copy. XLA sweep: the edge-padded copy
                [K, C, H+2py, W+2px] + one selected-scale sweep temporary.
      select:   in + the per-pixel-focus selected stack, built once
                (weight-independent). Fused kernel: tiled input copy +
                x4 output, both [G, C, H8, W128]. XLA scan: edge-padded
                copy [G, C, H+2py, W+2px] + the [G, C, H, W] scan carry.
      blend:    in + maps + the selected stack + out [Vb, C, H8, W128]
                (+ crop copy), two batch outputs in flight when batching;
                the XLA arm's blend_fast may additionally build one
                tile-aligned copy of the selected stack.

    The estimate and select phases are view-independent; batching only
    splits the blend. The estimate engine + row blocking are decided first
    (every arm needs the maps) in preference order fused-full, fused
    row-blocked, XLA-full, XLA row-blocked: the fused kernels are ~1.9x
    the XLA sweep and their window traffic is nearly block-size
    independent, so a row-blocked fused estimate still beats a full-frame
    XLA one. `plan.estimate_fused` records the choice; api.py passes
    `spans` (the fused route trigger) only when it is True.
    """
    b = (budget if budget is not None else device_hbm_bytes())
    b_eff = b - _headroom(b)
    h8, w128 = _align(h, 8), _align(w, 128)
    pxe, pye = max(px, 1), max(py, 1)
    in_b = g * c * h * w
    shift_b = g * c * h8 * w128
    pad_b = g * c * (h + 2 * pye) * (w + 2 * pxe)
    sel_b = k * c * h * w
    sel_pad_b = k * c * (h + 2 * pye) * (w + 2 * pxe)
    maps_b = 2 * h * w
    ov = c * h8 * w128 + (c * h * w if (h8, w128) != (h, w) else 0)

    est_xla_full_b = in_b + sel_b + sel_pad_b + sel_b + maps_b
    if fused_blend:
        select_b = in_b + 2 * shift_b + maps_b  # tiled copy + x4 out
        keep_b = in_b + shift_b + maps_b  # x4 resident while blending
    else:
        select_b = in_b + pad_b + in_b + maps_b  # padded copy + scan carry
        # selected stack + blend_fast's tile-aligned copy when unaligned
        keep_b = in_b + in_b + maps_b + (
            shift_b if (h8, w128) != (h, w) else 0
        )

    def _slab_bytes(n: int, rb: int) -> int:
        """One row block's edge-padded window over an n-image stack."""
        return n * c * (rb + 2 * pye) * (w + 2 * pxe)

    def _infeasible_msg() -> str:
        gib = 2.0**30
        return (
            f"All-focus render too large for one device: {g} images of "
            f"{w}x{h} need {est_xla_full_b / gib:.2f} GiB to estimate the "
            f"focus map, {select_b / gib:.2f} GiB for the per-pixel-focus "
            f"select, and {keep_b / gib:.2f} GiB + {ov / gib:.2f} GiB per "
            f"output view to blend, against a {b_eff / gib:.2f} GiB "
            f"budget, and even a one-view batch does not fit. Render with "
            f"a multi-chip mesh (Interpolator(mesh=...) shards the stack "
            f"by rows) or reduce the resolution/grid."
        )

    def _est_plan() -> tuple[int | None, bool, int]:
        """(est_row_block, fused, estimate-phase bytes); raises when even
        the smallest row block cannot fit in either engine (nothing can
        render then: every arm needs the maps). Two consecutive blocks'
        buffers can overlap in flight, hence the factor 2."""
        if est_fused_bytes is not None:
            fb = est_fused_bytes(h)
            if fb is not None and in_b + sel_b + fb + maps_b <= b_eff:
                return None, True, in_b + sel_b + fb + maps_b
            rb = (max(h // 2, 8) + 7) // 8 * 8
            while rb >= 8:
                sb = est_fused_bytes(rb)
                if sb is not None and in_b + sel_b + 2 * sb + maps_b <= b_eff:
                    return rb, True, in_b + sel_b + 2 * sb + maps_b
                rb = (rb // 2) // 8 * 8
        if est_xla_full_b <= b_eff:
            return None, False, est_xla_full_b
        rb = (max(h // 2, 8) + 7) // 8 * 8
        while rb >= 8:
            blk = in_b + sel_b + 2 * _slab_bytes(k, rb) + maps_b
            if blk <= b_eff:
                return rb, False, blk
            rb = (rb // 2) // 8 * 8
        raise ValueError(_infeasible_msg())

    est_rb, est_fused, estimate_b = _est_plan()

    total = max(estimate_b, select_b, keep_b + v * ov)
    if total <= b_eff and est_rb is None:
        return FixedRenderPlan(
            None, False, b_eff, total, estimate_fused=est_fused
        )
    if max(estimate_b, select_b) <= b_eff:
        vb = min(v, (b_eff - keep_b) // (2 * ov))
        if vb >= 1:
            return FixedRenderPlan(
                vb, False, b_eff, total,
                estimate_row_block=est_rb, estimate_fused=est_fused,
            )
        if total <= b_eff:
            # est_rb is set (else the unbatched return above fired) but two
            # batch outputs in flight don't fit. The whole blend DOES fit
            # as ONE batch of all views (a single batch is never
            # double-buffered), so a row-blocked estimate needs no real
            # view batching -- without this arm, v=1 renders with
            # b_eff - keep_b in [ov, 2*ov) would spuriously fall through
            # to the drop/row-block arms or raise infeasible.
            return FixedRenderPlan(
                v, False, b_eff, total,
                estimate_row_block=est_rb, estimate_fused=est_fused,
            )

    # Fused-engine drop arm: estimate (needs the raw stack; row-blocked
    # when its full padded copy does not fit), build the tiled copy, DROP
    # the raw stack, select (tiled + x4 coexist), blend batches against x4
    # alone. The XLA select has no such arm: its padded copy and scan carry
    # both re-derive from the raw stack.
    if fused_blend:
        drop_phases = max(in_b + shift_b + maps_b, 2 * shift_b + maps_b)
        if drop_phases <= b_eff:
            vb = min(v, (b_eff - (shift_b + maps_b)) // (2 * ov))
            if vb >= 1:
                return FixedRenderPlan(
                    vb, True, b_eff, total,
                    estimate_row_block=est_rb, estimate_fused=est_fused,
                )
    else:
        # XLA row-block arm: the select scan runs block by block over a row
        # SLAB (pipeline.select_allfocus_rows rebuilds just the rows a
        # block's shifts read), so the full padded copy and full scan carry
        # never materialize. Two consecutive blocks' buffers can overlap in
        # flight (block t+1 dispatches while t's results drain), hence the
        # factors 2. The estimate's own blocking (est_rb) was decided
        # above: its phase completes before the first select block runs.
        rb = (max(h // 2, 8) + 7) // 8 * 8
        while rb >= 8:
            rb8 = _align(min(rb, h), 8)
            slab_b = _slab_bytes(g, rb)
            selr_b = g * c * rb * w
            align_b = (
                g * c * rb8 * w128 if (rb8, w128) != (rb, w) else 0
            )
            ov_blk = c * rb8 * w128 + (
                c * rb * w if (rb8, w128) != (rb, w) else 0
            )
            keep_blk = in_b + maps_b + 2 * selr_b + align_b
            if max(in_b + maps_b + slab_b + 2 * selr_b, keep_blk) <= b_eff:
                vb = min(v, (b_eff - keep_blk) // (2 * ov_blk))
                if vb >= 1:
                    return FixedRenderPlan(
                        vb, False, b_eff, total, rb,
                        estimate_row_block=est_rb, estimate_fused=est_fused,
                    )
            rb //= 2
            rb = rb // 8 * 8

    raise ValueError(_infeasible_msg())


def check_capacity(
    resident_bytes: int, what: str, *,
    budget: int | None = None, hint: str | None = None,
) -> None:
    """Raise before any device allocation when `resident_bytes` cannot fit.

    A deliberately LOWER-bound guard for pipelines without a batched
    fallback (all-focus, streaming, mesh shards): it only trips on
    arithmetic certainty, never on an estimate of transient XLA scratch.
    `hint` overrides the default remediation advice (mesh renders must not
    be told to use a mesh).
    """
    b = (budget if budget is not None else device_hbm_bytes())
    b_eff = b - _headroom(b)
    if resident_bytes > b_eff:
        unit, div = (
            ("GiB", 2.0**30) if max(resident_bytes, b_eff) >= 2**30
            else ("MiB", 2.0**20)
        )
        hint = hint or (
            "Render with a multi-chip mesh (Interpolator(mesh=...)), use "
            "Interpolator.interpolate (which batches views automatically), "
            "or reduce the resolution/grid."
        )
        raise ValueError(
            f"{what} needs at least {resident_bytes / div:.2f} {unit} of "
            f"device memory against a {b_eff / div:.2f} {unit} budget. {hint}"
        )


#: Remediation advice for PER-CHIP mesh-shard arithmetic overruns.
MESH_HINT = (
    "Add chips along the mesh's 'space' axis (row sharding divides every "
    "per-shard operand), shrink the replicated stack (fewer grid images or "
    "lower resolution), or render single-chip via Interpolator.interpolate "
    "(which batches views and row-blocks automatically)."
)
