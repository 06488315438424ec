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
  - Mosaic has no dynamic roll / offset-broadcast / compare for 8-bit
    vectors (nor i16: dynamic_rotate legalizes for 32-bit only), so the
    whole epilogue runs in the SUBLANE-PACKED u32 view (pltpu.bitcast
    packs 4 consecutive rows per lane, row 0 in the LSB): lane rolls and
    lane-border selects are column-granular and work unchanged, the row
    alignment is one packed roll + two 32-bit shifts, and the row-border
    selects are byte-mask bitwise arithmetic -- 1/4 the bytes per op of a
    widened-i32 formulation.
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


def _pick_tb(
    h8: int, w128: int, budget_bytes: int = 7 * 1024 * 1024,
    max_window: int | None = None,
) -> int | None:
    """Largest 8-multiple divisor of h8 whose packed working set fits VMEM.

    The compute path holds a few packed-u32 [TB/4+, W128] temporaries plus
    the 2 u8 input slots and 2 u8 output blocks. The DMA window is
    align32(tb+8) rows so the packed view has a sublane-aligned row count
    (Mosaic rejects sublane rotates on unaligned shapes); `max_window`
    bounds it (the tiled kernel's windows must fit the stack height).
    Returns None when no tb qualifies.

    The 7 MB budget is measured, not derived: at 4K it admits tb=216
    (1920 window DMAs instead of 3456), 8.14 -> 7.49 ms on v5e; tb=240
    (7.4 MB of packed temporaries) still compiled and ran at 7.58 ms, so
    7 MB keeps headroom below the observed ceiling. 1080p picks tb=360
    under either budget."""
    cap = max(8, budget_bytes // (8 * w128) // 8 * 8)
    best = None
    for tb in range(8, min(h8, cap) + 1, 8):
        if h8 % tb:
            continue
        if max_window is not None and _align(tb + 8, 32) > max_window:
            continue
        best = tb
    return best


def _shift_kernel(
    dyx_ref,  # SMEM [G, 2] int32 (dx, dy), pre-clipped to (+-px, +-py)
    raw_ref,  # HBM [G, C, H8, W128] uint8
    out_ref,  # VMEM block [1, 1, TB, W128] uint8
    scratch,  # VMEM [2, WR, W128] uint8 (WR = align32(tb+8))
    sems,  # DMA semaphores [2]
    *,
    h: int,
    w: int,
    tb: int,
):
    grid = (pl.num_programs(0), pl.num_programs(1), pl.num_programs(2))
    h8 = grid[2] * tb
    wr = _align(tb + 8, 32)  # window rows: packed view stays sublane-aligned
    w128 = out_ref.shape[3]
    n = (pl.program_id(0) * grid[1] + pl.program_id(1)) * grid[2] + pl.program_id(2)
    total = grid[0] * grid[1] * grid[2]

    def copy_for(step):
        rb = step % grid[2]
        c = (step // grid[2]) % grid[1]
        g = step // (grid[1] * grid[2])
        dy = dyx_ref[g, 1]
        s0 = jnp.clip(rb * tb + dy, 0, h - tb)
        s0a = (jnp.minimum(s0, h8 - wr) // 8) * 8
        return pltpu.make_async_copy(
            raw_ref.at[g, c, pl.ds(s0a, wr), :],
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
    s0a = (jnp.minimum(s0, h8 - wr) // 8) * 8
    # want zone[y] = block[y + delta] for the rows that are in range;
    # delta folds both the clamp offset and the 8-alignment residual
    delta = r0 + dy - s0a

    v0 = jnp.clip(-(r0 + dy), 0, tb)  # rows < v0 -> top border
    v1 = jnp.clip(h - 1 - r0 - dy, -1, tb - 1)  # rows > v1 -> bottom border
    x0 = -dx  # lanes < x0 -> left border
    x1 = w - 1 - dx  # lanes > x1 -> right border

    # Everything below runs in the SUBLANE-PACKED u32 view: bitcast packs 4
    # consecutive rows per lane with row 0 in the LSB (verified on v5e AND
    # in interpret mode), so the lane roll and lane-border selects work
    # unchanged (column-granular), the row alignment becomes one packed
    # roll + two 32-bit shifts, and the row-border selects become byte-mask
    # bitwise arithmetic -- every op touches 1/4 the bytes of the previous
    # widened-i32 formulation (measured 3.84 -> ~2 ms at 1080p).
    A = pltpu.bitcast(scratch[n % 2, :, :], jnp.uint32)  # [wr/4, w128]
    R = wr // 4
    q = delta // 4
    rr = delta - 4 * q  # in [0, 4) for any (possibly negative) delta
    z0 = pltpu.roll(A, (R - q % R) % R, 0)  # z0[k] = A[k+q]
    z1 = pltpu.roll(z0, R - 1, 0)  # A[k+q+1]: STATIC one-step roll of z0
    sh = (8 * rr).astype(jnp.uint32)
    shl = ((32 - 8 * rr) % 32).astype(jnp.uint32)  # no UB shift when rr==0
    mix = jax.lax.shift_right_logical(z0, sh) | jax.lax.shift_left(z1, shl)
    zone = jnp.where(rr == 0, z0, mix)[0 : tb // 4, :]

    # Row borders as byte masks: byte i of packed row k is band row 4k+i.
    # Border rows sit at STATIC byte positions (a top-clamped band has
    # s0a == 0 so src row 0 is byte-row 0; a bottom-clamped band has
    # s0a == h8-wr so src row h-1 is byte-row wr-1-(h8-h)); replicate
    # that byte across the word with * 0x01010101.
    ff = jnp.uint32(0xFF)
    rep = jnp.uint32(0x01010101)
    topv = (A[0:1, :] & ff) * rep
    bi = wr - 1 - (h8 - h)
    botv = (
        jax.lax.shift_right_logical(
            A[bi // 4 : bi // 4 + 1, :], jnp.uint32(8 * (bi % 4))
        )
        & ff
    ) * rep
    ysp = jax.lax.broadcasted_iota(jnp.int32, (tb // 4, 1), 0) * 4
    zero = jnp.uint32(0)
    mtop = zero
    mbot = zero
    for i in range(4):
        byte = jnp.uint32(0xFF << (8 * i))
        mtop = mtop | jnp.where(ysp + i < v0, byte, zero)
        mbot = mbot | jnp.where(ysp + i > v1, byte, zero)
    keep = (mtop | mbot) ^ jnp.uint32(0xFFFFFFFF)
    rf = (mtop & topv) | (mbot & botv) | (keep & zone)

    lane_shift = (w128 - (dx % w128)) % w128
    rolled = pltpu.roll(rf, lane_shift, 1)
    # rf[:, w-1] broadcast: offset-broadcasts relayout slowly, so roll a
    # static 128-lane chunk by 1 to bring column w-1 to lane offset 0.
    right = pltpu.roll(rf[:, w - 128 : w], 1, 1)[:, 0:1]
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, w128), 1)
    out_ref[0, 0, :, :] = pltpu.bitcast(
        jnp.where(xs < x0, rf[:, 0:1], jnp.where(xs > x1, right, rolled)),
        jnp.uint8,
    )


@functools.partial(jax.jit, static_argnames=("h", "w", "px", "py"))
def shift_tiled_4d(
    tiled: jnp.ndarray,  # [G, C, H8, W128] uint8 (from pad_to_tiles)
    focused_offsets: jnp.ndarray,  # [G, 2] int32 (dx, dy), traced
    *,
    h: int,
    w: int,
    px: int,
    py: int,
) -> jnp.ndarray:
    """Clamp-shift every image -> [G, C, H8, W128] uint8 (native tiling).

    Bit-identical to blend_pallas.preshift_flat(pad_images(raw), ...): shifts
    are clipped to (+-px, +-py), which preserves semantics because the caller
    derives the bounds from the actual focus range (shift_bound) and any
    shift >= the image size saturates the clamp anyway. Feed the result to
    blend_pallas.blend_tiled (same tiling, no relayout); reshaping it flat
    for blend_flat costs a structural XLA relayout copy (~1.2 ms/1080p).
    """
    g, c, h8, w128 = tiled.shape
    tb = _pick_tb(h8, w128, max_window=h8)
    if tb is None:
        raise ValueError("geometry unsupported; check supports() first")
    dyx = jnp.stack(
        [
            jnp.clip(focused_offsets[:, 0], -px, px),
            jnp.clip(focused_offsets[:, 1], -py, py),
        ],
        axis=1,
    ).astype(jnp.int32)

    kernel = functools.partial(_shift_kernel, h=h, w=w, tb=tb)
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
            pltpu.VMEM((2, _align(tb + 8, 32), w128), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * g * c * h8 * w128, transcendentals=0
        ),
        interpret=_interpret(),
    )(dyx, tiled)
    return out


@functools.partial(jax.jit, static_argnames=("h", "w", "px", "py"))
def shift_flat_tiled(
    tiled: jnp.ndarray,
    focused_offsets: jnp.ndarray,
    *,
    h: int,
    w: int,
    px: int,
    py: int,
) -> jnp.ndarray:
    """shift_tiled_4d reshaped to the flat [G, C*H8*W128] blend layout
    (incurs the structural relayout copy; prefer the 4D route)."""
    g, c, h8, w128 = tiled.shape
    return shift_tiled_4d(
        tiled, focused_offsets, h=h, w=w, px=px, py=py
    ).reshape(g, c * h8 * w128)


def _pshift_kernel(
    dyx_ref,  # SMEM [G, 2] int32 (dx, dy), pre-clipped to (+-px, +-py)
    rs_ref,  # SMEM [1] int32: global row of the output block's first row
    pad_ref,  # HBM [G, C, Hp, Wp] uint8 (blend_pallas.pad_images)
    out_ref,  # VMEM block [1, 1, TB, W128] uint8
    scratch,  # VMEM [2, WR, W128+128] uint8 (WR = align32(tb+8))
    sems,  # DMA semaphores [2]
    *,
    tb: int,
    px: int,
    py: int,
):
    grid = (pl.num_programs(0), pl.num_programs(1), pl.num_programs(2))
    wr = _align(tb + 8, 32)  # window rows: packed view stays sublane-aligned
    w128 = out_ref.shape[3]
    s_lanes = w128 + 128
    n = (pl.program_id(0) * grid[1] + pl.program_id(1)) * grid[2] + pl.program_id(2)
    total = grid[0] * grid[1] * grid[2]

    def starts(g, rb):
        # tile-aligned window start; in-bounds for any clipped shift by
        # pad_images' +48-row/+256-lane tails
        s0 = (py + dyx_ref[g, 1] + rs_ref[0] + rb * tb) // 8 * 8
        l0 = (px + dyx_ref[g, 0]) // 128 * 128
        return s0, l0

    def copy_for(step):
        rb = step % grid[2]
        c = (step // grid[2]) % grid[1]
        g = step // (grid[1] * grid[2])
        s0, l0 = starts(g, rb)
        return pltpu.make_async_copy(
            pad_ref.at[g, c, pl.ds(s0, wr), pl.ds(l0, s_lanes)],
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
    A = pltpu.bitcast(scratch[n % 2, :, :], jnp.uint32)  # [wr/4, S]
    R = wr // 4
    q = r_res // 4
    rr = r_res - 4 * q
    z0 = pltpu.roll(A, (R - q % R) % R, 0)  # z0[k] = A[k+q]
    z1 = pltpu.roll(z0, R - 1, 0)  # A[k+q+1]: STATIC one-step roll of z0
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
def shift_padded_4d(
    padded: jnp.ndarray,  # [G, C, H+2py+48, W+2px+256] uint8 (pad_images)
    focused_offsets: jnp.ndarray,  # [G, 2] int32 (dx, dy), traced
    *,
    h: int,
    w: int,
    px: int,
    py: int,
    row_start: jnp.ndarray | int = 0,
    row_count: int | None = None,
) -> jnp.ndarray:
    """Clamp-shift from a pre-padded stack -> [G, C, H8, W128] uint8.

    Bit-identical to blend_pallas.preshift_flat (modulo the flat reshape),
    but runs as a Pallas kernel: one tile-aligned window DMA per (image,
    channel, band) plus two residual rolls in the sublane-packed u32 view
    -- no border work at all (the pad encodes the clamp). Measured 2.19 ms
    true at 8x8/1080p/64v (widened-i32 rolls: 3.0; the XLA unaligned
    dynamic-slice: ~2.75; aligned-copy floor: ~1.2 at the chip's ~670
    GB/s). Feed the output to blend_pallas.blend_tiled, which consumes
    this tiling natively; reshaping it flat for blend_flat costs an
    XLA-inserted ~1.2 ms relayout copy (the flat [g, L] tiling packs 8
    images per sublane tile, this one packs image rows, and Mosaic cannot
    emit the merged layout directly -- in-kernel sublane-to-lane reshape
    stores crash the compiler).
    """
    g, c = padded.shape[:2]
    h_out = h if row_count is None else int(row_count)
    h8, w128 = _align(h_out, 8), _align(w, 128)
    tb = _pick_tb(h8, w128 + 128)
    if tb is None:
        raise ValueError("geometry unsupported; check supports_padded() first")
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
            pltpu.VMEM((2, _align(tb + 8, 32), w128 + 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * g * c * h8 * w128, transcendentals=0
        ),
        interpret=_interpret(),
    )(dyx, rs, padded)
    return out


@functools.partial(
    jax.jit, static_argnames=("h", "w", "px", "py", "row_count")
)
def shift_flat_padded(
    padded: jnp.ndarray,
    focused_offsets: jnp.ndarray,
    *,
    h: int,
    w: int,
    px: int,
    py: int,
    row_start: jnp.ndarray | int = 0,
    row_count: int | None = None,
) -> jnp.ndarray:
    """shift_padded_4d reshaped to the flat [G, C*H8*W128] blend layout
    (incurs the structural relayout copy; prefer the 4D route)."""
    g, c = padded.shape[:2]
    h_out = h if row_count is None else int(row_count)
    h8, w128 = _align(h_out, 8), _align(w, 128)
    return shift_padded_4d(
        padded, focused_offsets, h=h, w=w, px=px, py=py,
        row_start=row_start, row_count=row_count,
    ).reshape(g, c * h8 * w128)


def supports_padded(h: int, w: int, row_count: int | None = None) -> bool:
    """Whether the padded-shift kernel handles this geometry.

    Mirrors `supports`: verifies the same `_pick_tb` invariant
    shift_flat_padded assumes (a valid block height for the kernel's
    working set), instead of encoding a looser ad-hoc bound.
    """
    h_out = h if row_count is None else int(row_count)
    h8, w128 = _align(h_out, 8), _align(w, 128)
    return (
        w128 + 128 <= 8 * 3968
        and h8 >= 8
        and _pick_tb(h8, w128 + 128) is not None
    )


def supports(h: int, w: int) -> bool:
    """Whether the fused shift kernel handles this geometry (else callers
    use the XLA pad+slice path)."""
    h8, w128 = _align(h, 8), _align(w, 128)
    if w128 > 8 * 3968:  # lane-roll temporaries would blow VMEM
        return False
    # w >= 128 so the right-border chunk roll has a full static 128-lane
    # window; the sublane-aligned DMA window align32(tb+8) must fit the
    # stack height (h8 >= 32, enforced via _pick_tb)
    return (
        h >= 16
        and w >= 128
        and _pick_tb(h8, w128, max_window=h8) is not None
    )


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
    from .blend_pallas import blend_tiled

    g, c, h8, w128 = tiled.shape
    x4 = shift_tiled_4d(
        tiled, focused_offsets, h=h, w=w, px=px, py=py
    )
    out = blend_tiled(x4, weights)
    if (h8, w128) != (h, w):
        out = out[:, :, :h, :w]
    return out
