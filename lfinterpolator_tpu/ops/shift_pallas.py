"""Fused clamp-shift Pallas kernel: raw tiled stack -> shifted flat stack.

Replaces the two-stage pad_images + preshift_flat data movement (one padded
HBM copy per light field + one unaligned dynamic_slice per render, see
blend_pallas.py) with a single kernel that reads the raw stack once and
writes the blend-ready flat layout once:

    out[g, c, y, x] = raw[g, c, clip(y + dy_g, 0, h-1), clip(x + dx_g, 0, w-1)]

for y in [0, H8), x in [0, W128) -- the same edge-clamped-window semantics as
the reference's cudaBoundaryModeClamp surface reads (reference:
src/kernels.cu:119-126) and bit-identical to blend_pallas.preshift_flat.

Why this shape (all constraints measured on v5e, see CLAUDE.md):
  - DMA slice offsets must be tile-aligned (sublanes %8, lanes %128), so the
    per-image row offset is split into an 8-aligned DMA start plus a sub-8
    residual fixed in VMEM;
  - Mosaic has no dynamic roll / offset-broadcast for 8-bit vectors (nor
    i16: dynamic_rotate legalizes for 32-bit only), so the residual row
    roll, the lane roll (dx), and the border selects run on an i32 widening
    of the block (measured free -- the kernel is store/select-bound, not
    widen-bound); lane-border selects use one full-width masked store, or
    static edge strips when those cover <1/4 of the row (the 4K case).
  - One auto-pipelined output block plus one manually double-buffered input
    DMA per grid step keeps the kernel at the chip's copy ceiling instead of
    the per-window-DMA issue latency floor.

The raw stack lives in a tiled layout [G, C, H8, W128] (rows padded to 8,
lanes to 128; pad content irrelevant) built once at upload by pad_to_tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend_pallas import _align, _interpret


def pad_to_tiles(images: jnp.ndarray) -> jnp.ndarray:
    """[G, C, H, W] uint8 -> [G, C, H8, W128] with zero tile padding.

    Pad content is never read by shift_flat_tiled (the clamp masks cover it),
    so plain zero padding suffices -- unlike pad_images, no edge replication
    and no shift-bound inflation: the tiled stack is at most (1+7/H)(1+127/W)
    times the raw bytes.
    """
    g, c, h, w = images.shape
    h8, w128 = _align(h, 8), _align(w, 128)
    if (h8, w128) == (h, w):
        return images
    return jnp.pad(images, ((0, 0), (0, 0), (0, h8 - h), (0, w128 - w)))


def _pick_tb(h8: int, w128: int, budget_bytes: int = 6 * 1024 * 1024) -> int:
    """Largest 8-multiple divisor of h8 whose i32 working set fits VMEM.

    The compute path holds ~3 live i32 [TB, W128] temporaries plus the 2
    u8 input slots and 2 u8 output blocks; cap TB so 3*4*TB*W128 stays
    within the budget."""
    cap = max(8, budget_bytes // (12 * w128) // 8 * 8)
    best = 8
    for tb in range(8, min(h8 - 8, cap) + 1, 8):
        if h8 % tb == 0:
            best = tb
    return best


def _shift_kernel(
    dyx_ref,  # SMEM [G, 2] int32 (dx, dy), pre-clipped to (+-px, +-py)
    raw_ref,  # HBM [G, C, H8, W128] uint8
    out_ref,  # VMEM block [1, 1, TB, W128] uint8
    scratch,  # VMEM [2, TB+8, W128] uint8
    sems,  # DMA semaphores [2]
    *,
    h: int,
    w: int,
    tb: int,
    sl: int,  # left strip width (static, 128-multiple; 0 = no strip stores)
    sr: int,  # right strip width (static, 128-multiple; 0 = no strip stores)
):
    grid = (pl.num_programs(0), pl.num_programs(1), pl.num_programs(2))
    h8 = grid[2] * tb
    w128 = out_ref.shape[3]
    n = (pl.program_id(0) * grid[1] + pl.program_id(1)) * grid[2] + pl.program_id(2)
    total = grid[0] * grid[1] * grid[2]

    def copy_for(step):
        rb = step % grid[2]
        c = (step // grid[2]) % grid[1]
        g = step // (grid[1] * grid[2])
        dy = dyx_ref[g, 1]
        s0 = jnp.clip(rb * tb + dy, 0, h - tb)
        s0a = (jnp.minimum(s0, h8 - tb - 8) // 8) * 8
        return pltpu.make_async_copy(
            raw_ref.at[g, c, pl.ds(s0a, tb + 8), :],
            scratch.at[step % 2],
            sems.at[step % 2],
        )

    @pl.when(n == 0)
    def _():
        copy_for(0).start()

    @pl.when(n + 1 < total)
    def _():
        copy_for(n + 1).start()

    copy_for(n).wait()

    g = pl.program_id(0)
    rb = pl.program_id(2)
    r0 = rb * tb
    dx = dyx_ref[g, 0]
    dy = dyx_ref[g, 1]
    s0 = jnp.clip(r0 + dy, 0, h - tb)
    s0a = (jnp.minimum(s0, h8 - tb - 8) // 8) * 8
    # want zone[y] = block[y + delta] for the rows that are in range;
    # delta folds both the clamp offset and the 8-alignment residual
    delta = r0 + dy - s0a

    v0 = jnp.clip(-(r0 + dy), 0, tb)  # rows < v0 -> top border
    v1 = jnp.clip(h - 1 - r0 - dy, -1, tb - 1)  # rows > v1 -> bottom border
    x0 = -dx  # lanes < x0 -> left border
    x1 = w - 1 - dx  # lanes > x1 -> right border

    a = scratch[n % 2, :, :].astype(jnp.int32)  # [tb+8, w128]
    zone = pltpu.roll(
        a, (tb + 8 - delta % (tb + 8)) % (tb + 8), 0
    )[0:tb, :]

    ys = jax.lax.broadcasted_iota(jnp.int32, (tb, 1), 0)
    lane_shift = (w128 - (dx % w128)) % w128

    # Row borders, unconditionally: border rows sit at STATIC block
    # positions (a top-clamped band has s0a == 0 so src row 0 is block row
    # 0; a bottom-clamped band has s0a == h8-tb-8 so src row h-1 is block
    # row tb+7-(h8-h)), and an unconditional 2-level select measured FASTER
    # than pl.when band branches (branches triplicate the store pipeline and
    # defeat Mosaic's scheduling; see CLAUDE.md round-2 notes).
    bi = tb + 7 - (h8 - h)
    rf = jnp.where(
        ys < v0, a[0:1, :], jnp.where(ys > v1, a[bi : bi + 1, :], zone)
    )
    rolled = pltpu.roll(rf, lane_shift, 1)
    # rf[:, w-1] broadcast: offset-broadcasts relayout slowly, so roll a
    # static 128-lane chunk by 1 to bring column w-1 to lane offset 0.
    right = pltpu.roll(rf[:, w - 128 : w], 1, 1)[:, 0:1]

    if sl == 0:
        # Single full-width masked store: cheapest when the border strips
        # would cover a large fraction of the row (and the only correct
        # option when they overlap, e.g. small images).
        xs = jax.lax.broadcasted_iota(jnp.int32, (tb, w128), 1)
        out_ref[0, 0, :, :] = jnp.where(
            xs < x0, rf[:, 0:1], jnp.where(xs > x1, right, rolled)
        ).astype(jnp.uint8)
    else:
        # Strip stores: lane-border selects confined to the static edge
        # strips so the middle of every row is a single rolled store (wins
        # when sl+sr is a small fraction of w128, e.g. 4K).
        out_ref[0, 0, :, sl : w128 - sr] = rolled[:, sl : w128 - sr].astype(
            jnp.uint8
        )
        xs_l = jax.lax.broadcasted_iota(jnp.int32, (tb, sl), 1)
        out_ref[0, 0, :, 0:sl] = jnp.where(
            xs_l < x0, rf[:, 0:1], rolled[:, 0:sl]
        ).astype(jnp.uint8)
        xs_r = jax.lax.broadcasted_iota(jnp.int32, (tb, sr), 1) + (w128 - sr)
        out_ref[0, 0, :, w128 - sr : w128] = jnp.where(
            xs_r > x1, right, rolled[:, w128 - sr : w128]
        ).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("h", "w", "px", "py"))
def shift_flat_tiled(
    tiled: jnp.ndarray,  # [G, C, H8, W128] uint8 (from pad_to_tiles)
    focused_offsets: jnp.ndarray,  # [G, 2] int32 (dx, dy), traced
    *,
    h: int,
    w: int,
    px: int,
    py: int,
) -> jnp.ndarray:
    """Clamp-shift every image -> flat [G, C*H8*W128] uint8.

    Bit-identical to blend_pallas.preshift_flat(pad_images(raw), ...): shifts
    are clipped to (+-px, +-py), which preserves semantics because the caller
    derives the bounds from the actual focus range (shift_bound) and any
    shift >= the image size saturates the clamp anyway.
    """
    g, c, h8, w128 = tiled.shape
    tb = _pick_tb(h8, w128)
    # Static strips covering every lane that can need border values. Strip
    # stores only pay off when the strips are a small fraction of the row
    # (measured crossover ~1/4 on v5e); otherwise -- including overlapping
    # strips on small images -- one full-width masked store is faster.
    sl = min(_align(min(px, w - 1), 128), w128)
    sr = min(_align(min(px, w - 1) + (w128 - w), 128), w128)
    if sl + sr > w128 // 4 or w128 - sl - sr <= 0:
        sl = sr = 0  # full-width masked store
    dyx = jnp.stack(
        [
            jnp.clip(focused_offsets[:, 0], -px, px),
            jnp.clip(focused_offsets[:, 1], -py, py),
        ],
        axis=1,
    ).astype(jnp.int32)

    kernel = functools.partial(
        _shift_kernel, h=h, w=w, tb=tb, sl=sl, sr=sr
    )
    out = pl.pallas_call(
        kernel,
        grid=(g, c, h8 // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tb, w128), lambda gg, cc, rr: (gg, cc, rr, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((g, c, h8, w128), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, tb + 8, w128), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * g * c * h8 * w128, transcendentals=0
        ),
        interpret=_interpret(),
    )(dyx, tiled)
    return out.reshape(g, c * h8 * w128)


def _pshift_kernel(
    dyx_ref,  # SMEM [G, 2] int32 (dx, dy), pre-clipped to (+-px, +-py)
    rs_ref,  # SMEM [1] int32: global row of the output block's first row
    pad_ref,  # HBM [G, C, Hp, Wp] uint8 (blend_pallas.pad_images)
    out_ref,  # VMEM block [1, 1, TB, W128] uint8
    scratch,  # VMEM [2, TB+8, W128+128] uint8
    sems,  # DMA semaphores [2]
    *,
    tb: int,
    px: int,
    py: int,
):
    grid = (pl.num_programs(0), pl.num_programs(1), pl.num_programs(2))
    w128 = out_ref.shape[3]
    s_lanes = w128 + 128
    n = (pl.program_id(0) * grid[1] + pl.program_id(1)) * grid[2] + pl.program_id(2)
    total = grid[0] * grid[1] * grid[2]

    def starts(g, rb):
        # tile-aligned window start; in-bounds for any clipped shift by
        # pad_images' +16-row/+256-lane tails
        s0 = (py + dyx_ref[g, 1] + rs_ref[0] + rb * tb) // 8 * 8
        l0 = (px + dyx_ref[g, 0]) // 128 * 128
        return s0, l0

    def copy_for(step):
        rb = step % grid[2]
        c = (step // grid[2]) % grid[1]
        g = step // (grid[1] * grid[2])
        s0, l0 = starts(g, rb)
        return pltpu.make_async_copy(
            pad_ref.at[g, c, pl.ds(s0, tb + 8), pl.ds(l0, s_lanes)],
            scratch.at[step % 2],
            sems.at[step % 2],
        )

    @pl.when(n == 0)
    def _():
        copy_for(0).start()

    @pl.when(n + 1 < total)
    def _():
        copy_for(n + 1).start()

    copy_for(n).wait()

    g = pl.program_id(0)
    rb = pl.program_id(2)
    s0, l0 = starts(g, rb)
    r_res = (py + dyx_ref[g, 1] + rs_ref[0] + rb * tb) - s0  # [0, 8)
    l_res = (px + dyx_ref[g, 0]) - l0  # [0, 128)

    # Borderless (the padded stack already encodes the clamp), and all in
    # the SUBLANE-PACKED u32 view: bitcast packs 4 consecutive rows per
    # lane with row 0 in the LSB (verified on v5e AND in interpret mode),
    # so a lane roll moves whole byte-columns and the sub-4-row residual is
    # a pair of 32-bit shifts -- every op touches 1/4 the bytes of the
    # widened-i32 formulation.
    A = pltpu.bitcast(scratch[n % 2, :, :], jnp.uint32)  # [(tb+8)/4, S]
    R = (tb + 8) // 4
    q = r_res // 4
    rr = r_res - 4 * q
    z0 = pltpu.roll(A, (R - q % R) % R, 0)  # z0[k] = A[k+q]
    z1 = pltpu.roll(A, (R - (q + 1) % R) % R, 0)  # A[k+q+1]
    sh = 8 * rr
    shl = (32 - sh) % 32  # avoid an UB shift-by-32 when rr == 0
    mix = jax.lax.shift_right_logical(z0, sh.astype(jnp.uint32)) | jax.lax.shift_left(
        z1, shl.astype(jnp.uint32)
    )
    z = jnp.where(rr == 0, z0, mix)[0 : tb // 4, :]
    z = pltpu.roll(z, (s_lanes - l_res % s_lanes) % s_lanes, 1)
    out_ref[0, 0, :, :] = pltpu.bitcast(z[:, 0:w128], jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "px", "py", "row_count")
)
def shift_flat_padded(
    padded: jnp.ndarray,  # [G, C, H+2py+16, W+2px+256] uint8 (pad_images)
    focused_offsets: jnp.ndarray,  # [G, 2] int32 (dx, dy), traced
    *,
    h: int,
    w: int,
    px: int,
    py: int,
    row_start: jnp.ndarray | int = 0,
    row_count: int | None = None,
) -> jnp.ndarray:
    """Clamp-shift from a pre-padded stack -> flat [G, C*H8*W128] uint8.

    Bit-identical to blend_pallas.preshift_flat, but runs as a Pallas
    kernel: one tile-aligned window DMA per (image, channel, band) plus two
    residual rolls in the sublane-packed u32 view -- no border work at all
    (the pad encodes the clamp). Measured 2.19 ms true at 8x8/1080p/64v
    (widened-i32 rolls: 3.0; the XLA unaligned dynamic-slice: ~2.75;
    aligned-copy floor: ~1.2 at the chip's ~670 GB/s). The remaining
    end-to-end gap is an XLA-inserted ~1.2 ms relayout copy between this
    kernel's [g,c,h8,w128] output tiling (image rows on sublanes) and the
    blend's [g, L] operand tiling (8 images per sublane tile) -- Mosaic
    cannot emit the merged layout directly (in-kernel sublane-to-lane
    reshape stores crash the compiler).
    """
    g, c = padded.shape[:2]
    h_out = h if row_count is None else int(row_count)
    h8, w128 = _align(h_out, 8), _align(w, 128)
    tb = _pick_tb(h8, w128 + 128)
    dyx = jnp.stack(
        [
            jnp.clip(focused_offsets[:, 0], -px, px),
            jnp.clip(focused_offsets[:, 1], -py, py),
        ],
        axis=1,
    ).astype(jnp.int32)
    rs = jnp.asarray(row_start, jnp.int32).reshape(1)
    kernel = functools.partial(_pshift_kernel, tb=tb, px=px, py=py)
    out = pl.pallas_call(
        kernel,
        grid=(g, c, h8 // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tb, w128), lambda gg, cc, rr: (gg, cc, rr, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((g, c, h8, w128), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, tb + 8, w128 + 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * g * c * h8 * w128, transcendentals=0
        ),
        interpret=_interpret(),
    )(dyx, rs, padded)
    return out.reshape(g, c * h8 * w128)


def supports_padded(h: int, w: int) -> bool:
    """Whether the padded-shift kernel handles this geometry."""
    w128 = _align(w, 128)
    return w128 + 128 <= 8 * 3968 and _align(h, 8) >= 8


def supports(h: int, w: int) -> bool:
    """Whether the fused shift kernel handles this geometry (else callers
    use the XLA pad+slice path)."""
    h8, w128 = _align(h, 8), _align(w, 128)
    if w128 > 8 * 3968:  # lane-roll temporaries would blow VMEM
        return False
    # tb < h must hold so a band never needs both edge clamps (_pick_tb
    # caps tb at h8-8); w >= 128 so the right-border chunk roll has a full
    # static 128-lane window; require >= 2 bands of headroom
    return h8 >= 16 and w >= 128 and h >= 16


@functools.partial(jax.jit, static_argnames=("h", "w", "px", "py"))
def render_fixed_tiled(
    tiled: jnp.ndarray,  # [G, C, H8, W128] uint8 (from pad_to_tiles)
    weights: jnp.ndarray,  # [V, G] float32
    focused_offsets: jnp.ndarray,  # [G, 2] int32
    *,
    h: int,
    w: int,
    px: int,
    py: int,
) -> jnp.ndarray:
    """Fixed-focus fused render from a tiled raw stack -> [V, C, H, W] u8.

    Single-jit shift + MXU blend; same numerics as render_fixed_padded
    (reference semantics: Standard/Tensors::process, src/kernels.cu:289-461).
    """
    from .blend_pallas import blend_flat

    g, c, h8, w128 = tiled.shape
    v = weights.shape[0]
    flat = shift_flat_tiled(
        tiled, focused_offsets, h=h, w=w, px=px, py=py
    )
    out = blend_flat(flat, weights).reshape(v, c, h8, w128)
    if (h8, w128) != (h, w):
        out = out[:, :, :h, :w]
    return out
