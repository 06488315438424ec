"""Fused per-pixel-focus (allFocus) clamp-shift Pallas kernel.

TPU-native equivalent of the reference tensor kernel's allFocus arm
(Tensors::process<true>, reference: src/kernels.cu:398-461, per-pixel map
read at :429-430): every output pixel samples each source image at

    img[clip(int(y + f(y,x)*oy_g), 0, h-1), clip(int(x + f(y,x)*ox_g), 0, w-1)]

where f(y,x) decodes the RAW focus map byte (loadFocusFromMap,
src/kernels.cu:134-137) and int() is the C f32 truncation (focusCoords,
src/kernels.cu:78-82).

Because the raw map is level-quantized (the estimator emits exactly `steps`
byte values), the per-pixel sample is a select over at most `steps`
constant-shift variants of each image. The XLA path realizes that as one
shifted-stack pass per present (level, row-band) -- re-reading the stack
once per present level. This kernel reads each source window ONCE and runs
the per-level work as in-VMEM rolls and selects:

  per (image, channel, row-band) grid step:
    1. one manually double-buffered DMA of a window covering every present
       level's row span (static height `tbw` = band + spread bound),
    2. for each level present in the band (SMEM presence table, runtime
       skip): a 32-aligned slice of the sublane-packed u32 window + a
       packed residual roll, the exact f32 truncation-correction rule of
       blend_xla.trunc_offsets as byte masks (+-1 row variants are 32-bit
       byte shifts), border clamps as byte-mask bitwise arithmetic, the
       dynamic lane roll + +-1 lane variants + truncation/border selects
       (column-granular, unchanged by packing), and the map-level equality
       as the SWAR zero-byte test -- accumulated into a packed u32 scratch,
    3. one u8 store (a bitcast) of the selected band.

The output keeps the input's [G, C, HL8, W128] tiling, so the full TEN
allFocus render is this kernel + the same-tiling MXU matmul
(blend_pallas.blend_tiled) as the fixed-focus path -- no relayout copy. Numerics are bit-identical to the XLA quantized-select
path (and hence the oracle): the trunc corrections evaluate the oracle's own
f32 expressions on iota coordinates, and all selects are integer-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend_pallas import _align, _interpret


def spread_bound(
    offsets, focus: float, focus_range: float, bucket: int = 64
) -> int:
    """Static row-span bound: max over images of the spread of floor(f*oy)
    across the focus interval. Host-side (concrete offsets), bucketed so
    nearby focus settings share one compiled program."""
    import numpy as np  # host-side only

    oy = np.abs(np.asarray(offsets)[:, 1]).max()
    lo, hi = float(focus), float(focus) + float(focus_range)
    spread = (abs(hi - lo)) * float(oy)
    return max(bucket, -(-int(np.ceil(spread + 2)) // bucket) * bucket)


def _pick_tb_af(hl8: int, h8: int, w128: int, spread: int,
                budget_bytes: int = 11 * 1024 * 1024) -> int | None:
    """Largest 8-multiple divisor of the output-block height `hl8` whose
    working set fits VMEM (windows must also fit the full stack height h8).

    Model: 2 u8 DMA windows [tbw, w128] + the packed-u32 window scratch
    (same bytes) + per-level packed temporaries (~8 live [tb/4, w128] u32)
    + the packed accumulator + double-buffered blocks. Bigger tb amortizes
    the once-per-step window costs over more output rows."""
    best = None
    for tb in range(8, hl8 + 1, 8):
        if hl8 % tb:
            continue
        tbw = _align(tb + spread + 16, 32)
        # tbw may fill the whole stack: the window start is then always 0,
        # so both border rows still sit at static block positions
        if tbw > h8:
            continue
        need = w128 * (3 * tbw + 11 * tb + 2 * tbw)
        if need <= budget_bytes:
            best = tb
    return best


def supports(h: int, w: int, spread: int, row_count: int | None = None) -> bool:
    """Whether the fused allFocus kernel handles this geometry (else callers
    use the XLA per-level scan path). `row_count` is the output row-block
    height for sharded rendering (None = full frame)."""
    h8, w128 = _align(h, 8), _align(w, 128)
    hl8 = h8 if row_count is None else _align(int(row_count), 8)
    if w128 > 8 * 3968 or w < 128 or h < 16 or hl8 < 8:
        return False
    return _pick_tb_af(hl8, h8, w128, spread) is not None


def _af_kernel(
    levels_ref,  # SMEM [L] int32 (byte values of the quantized levels)
    fys_ref,  # SMEM [L, G] f32 (true fractional row shifts, f_l * oy_g)
    fxs_ref,  # SMEM [L, G] f32
    rowspan_ref,  # SMEM [G, 2] int32 (min, max) of floor(fy) over levels
    pres_ref,  # SMEM [NB, L] int32 presence per (band, level)
    rs_ref,  # SMEM [1] int32: global row of the output block's first row
    map_ref,  # VMEM block [TB, W128] uint8 (raw focus map band)
    raw_ref,  # HBM [G, C, H8, W128] uint8 (FULL image stack)
    out_ref,  # VMEM block [1, 1, TB, W128] uint8
    acc,  # VMEM scratch [TB/4, W128] uint32 (packed accumulator)
    winp,  # VMEM scratch [TBW/4, W128] uint32 (packed window)
    scratch,  # VMEM scratch [2, TBW, W128] uint8
    sems,  # DMA semaphores [2]
    *,
    h: int,
    w: int,
    tb: int,
    tbw: int,
    n_levels: int,
    px: int,
):
    grid = (pl.num_programs(0), pl.num_programs(1), pl.num_programs(2))
    h8 = raw_ref.shape[2]  # FULL tiled height (output may be a row block)
    w128 = out_ref.shape[3]
    n = (pl.program_id(0) * grid[1] + pl.program_id(1)) * grid[2] + pl.program_id(2)
    total = grid[0] * grid[1] * grid[2]

    def window_start(g, rb):
        # Pin bottom-clamp-capable bands to the bottom-most window so the
        # border row h-1 sits at a STATIC block position; elsewhere an
        # 8-aligned start below the lowest needed row (coverage by the
        # static spread bound in tbw).
        r0 = rs_ref[0] + rb * tb
        bot_possible = r0 + tb + rowspan_ref[g, 1] > h - 2
        s0 = jnp.clip(r0 + rowspan_ref[g, 0] - 1, 0, h8 - tbw)
        # the trailing //8*8 must be the last op so Mosaic can prove the
        # DMA start's sublane alignment (h8 - tbw is already a multiple)
        return jnp.where(bot_possible, h8 - tbw, s0) // 8 * 8

    def copy_for(step):
        rb = step % grid[2]
        c = (step // grid[2]) % grid[1]
        g = step // (grid[1] * grid[2])
        return pltpu.make_async_copy(
            raw_ref.at[g, c, pl.ds(window_start(g, rb), tbw), :],
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
    r0 = rs_ref[0] + rb * tb
    s0a = window_start(g, rb)
    minny = rowspan_ref[g, 0]

    # Pack the window once per step; ALL per-level work runs on the
    # sublane-packed u32 view (4 byte-rows per lane, row 0 in the LSB --
    # verified on v5e and in interpret mode): the +-1 row variants of the
    # truncation rule become 32-bit byte shifts, the row-rule and border
    # selects become byte-mask bitwise arithmetic, the map-level equality
    # becomes the SWAR zero-byte test, and the lane work (rolls, dxo
    # selects, lane borders) is column-granular so it carries over
    # unchanged. Every op touches 1/4 the bytes of the previous widened-i32
    # formulation.
    winp[:, :] = pltpu.bitcast(scratch[n % 2, :, :], jnp.uint32)
    mapp = pltpu.bitcast(map_ref[:, :], jnp.uint32)  # [tb/4, w128]
    acc[:, :] = jnp.zeros((tb // 4, w128), jnp.uint32)

    ff = jnp.uint32(0xFF)
    rep = jnp.uint32(0x01010101)
    m7f = jnp.uint32(0x7F7F7F7F)
    allff = jnp.uint32(0xFFFFFFFF)
    one8 = jnp.uint32(8)
    nbp = tb // 4

    ysp = jax.lax.broadcasted_iota(jnp.int32, (nbp, 1), 0) * 4 + r0
    qx = jax.lax.broadcasted_iota(jnp.int32, (1, w128), 1)
    qxf = qx.astype(jnp.float32)
    # static packed positions of the border rows (see window_start)
    bi = tbw - 1 - (h8 - h)
    topv = (winp[0:1, :] & ff) * rep
    botv = (
        jax.lax.shift_right_logical(
            winp[bi // 4 : bi // 4 + 1, :], jnp.uint32(8 * (bi % 4))
        )
        & ff
    ) * rep

    def level_body(l, _):
        @pl.when(pres_ref[rb, l] == 1)
        def _():
            fy = fys_ref[l, g]
            fx = fxs_ref[l, g]
            n_y = jnp.clip(jnp.floor(fy), -(h + 2.0), h + 2.0).astype(jnp.int32)
            n_y = jnp.clip(n_y, minny, minny + tbw)  # defensive: in-window
            n_x = jnp.clip(jnp.floor(fx), -(px + 0.0), px + 0.0).astype(jnp.int32)

            # exact truncation deltas (blend_xla.trunc_offsets semantics)
            # and border conditions, evaluated per BYTE-ROW (4 interleaved
            # tiny [tb/4, 1] chains) and folded into byte masks
            zero = jnp.uint32(0)
            mm = zero
            mp = zero
            mtop = zero
            mbot = zero
            for i in range(4):
                qyf_i = (ysp + i).astype(jnp.float32)
                dyo_i = jnp.clip(
                    (jnp.trunc(qyf_i + fy) - (qyf_i + jnp.floor(fy))).astype(
                        jnp.int32
                    ),
                    -1, 1,
                )
                rowidx_i = ysp + i + n_y + dyo_i
                byte = jnp.uint32(0xFF << (8 * i))
                mm = mm | jnp.where(dyo_i == -1, byte, zero)
                mp = mp | jnp.where(dyo_i == 1, byte, zero)
                mtop = mtop | jnp.where(rowidx_i < 0, byte, zero)
                mbot = mbot | jnp.where(rowidx_i > h - 1, byte, zero)
            dxo = jnp.clip(
                (jnp.trunc(qxf + fx) - (qxf + jnp.floor(fx))).astype(jnp.int32),
                -1, 1,
            )  # [1, w128]

            o = r0 + n_y - 1 - s0a
            # full-window packed rolls (no alignment constraints; packed
            # rolls move 1/4 the bytes, so the window/band ratio is cheap);
            # negative or overflowing o wraps (mod), leaving garbage exactly
            # on rows whose rowidx is out of [0, h) -- border-masked below
            rp_all = tbw // 4
            rb4 = o // 4
            rr = o - 4 * rb4  # in [0, 4) for any sign of o
            z0r = pltpu.roll(winp[:, :], (rp_all - rb4 % rp_all) % rp_all, 0)
            # z1r[k] = winp[k+rb4+1] = z0r[k+1]: a STATIC one-step roll of
            # the already-rolled view -- the second dynamic window roll it
            # replaces cost a full dynamic_rotate per level.
            z1r = pltpu.roll(z0r, rp_all - 1, 0)
            sh = (8 * rr).astype(jnp.uint32)
            shl = ((32 - 8 * rr) % 32).astype(jnp.uint32)
            base = jnp.where(
                rr == 0,
                z0r,
                jax.lax.shift_right_logical(z0r, sh)
                | jax.lax.shift_left(z1r, shl),
            )
            zm = base[0:nbp, :]  # byte k,i = img row r0+n_y-1 + 4k+i
            # bn[k] = base[k+1]: a static sublane slice (in bounds because
            # tbw = align32(tb+spread+16) >= tb+4, i.e. nbp+1 <= rp_all).
            bn = base[1 : nbp + 1, :]
            z0v = jax.lax.shift_right_logical(zm, one8) | jax.lax.shift_left(
                bn, jnp.uint32(24)
            )
            zpv = jax.lax.shift_right_logical(
                zm, jnp.uint32(16)
            ) | jax.lax.shift_left(bn, jnp.uint32(16))
            rsel = (mm & zm) | (mp & zpv) | (((mm | mp) ^ allff) & z0v)
            keep = (mtop | mbot) ^ allff
            rf = (mtop & topv) | (mbot & botv) | (keep & rsel)

            rolled = pltpu.roll(rf, (w128 - n_x % w128) % w128, 1)
            rm = pltpu.roll(rolled, 1, 1)  # rf[x + n_x - 1]
            rp = pltpu.roll(rolled, w128 - 1, 1)  # rf[x + n_x + 1]
            csel = jnp.where(dxo == 1, rp, jnp.where(dxo == -1, rm, rolled))
            colidx = qx + n_x + dxo
            left = rf[:, 0:1]
            right = pltpu.roll(rf[:, w - 128 : w], 1, 1)[:, 0:1]
            val = jnp.where(
                colidx < 0, left, jnp.where(colidx > w - 1, right, csel)
            )

            # map == level as the SWAR zero-byte test on map ^ level*rep.
            # The borrow-free formulation ~((x&0x7F..)+0x7F.. | x | 0x7F..)
            # is exact per byte (the classic (x-rep)&~x&0x80.. one false-
            # positives on 0x01 bytes adjacent to a zero byte).
            lrep = levels_ref[l].astype(jnp.uint32) * rep
            x = mapp ^ lrep
            t = (x & m7f) + m7f
            m80 = ((t | x) | m7f) ^ allff
            mask = jax.lax.shift_right_logical(m80, jnp.uint32(7)) * ff
            acc[:, :] = (mask & val) | ((mask ^ allff) & acc[:, :])

        return 0

    lax.fori_loop(0, n_levels, level_body, 0)
    out_ref[0, 0, :, :] = pltpu.bitcast(acc[:, :], jnp.uint8)




@functools.partial(
    jax.jit, static_argnames=("h", "w", "spread", "px", "row_count")
)
def allfocus_select_tiled(
    tiled: jnp.ndarray,  # [G, C, H8, W128] uint8 (shift_pallas.pad_to_tiles)
    focus_map8: jnp.ndarray,  # [HL8, W128] uint8 (padded raw-map BLOCK)
    levels: jnp.ndarray,  # [L] uint8 (quantized level byte values)
    fys: jnp.ndarray,  # [L, G] f32 (f_level * offset_y)
    fxs: jnp.ndarray,  # [L, G] f32
    *,
    h: int,
    w: int,
    spread: int,
    px: int,
    row_start: jnp.ndarray | int = 0,
    row_count: int | None = None,
) -> jnp.ndarray:
    """Per-pixel-level selected stack -> [G, C, HL8, W128] uint8.

    Bit-identical to the XLA quantized-select pass of
    blend_xla.render_allfocus_quantized (for maps whose bytes are all in
    `levels`); feed the result to blend_pallas.blend_tiled (same tiling,
    no relayout copy -- reshaping it flat for blend_flat costs the
    structural XLA relayout, ~1.2 ms at 1080p). `px` bounds
    |floor(fx)| (e.g. the x component of focus.shift_pad_bound).

    With `row_start` (traced) / `row_count` (static), renders only that
    block of output rows (spatially-sharded rendering); `focus_map8` must
    then be the matching padded [align8(row_count), W128] block.
    """
    g, c, h8, w128 = tiled.shape
    hl8 = h8 if row_count is None else _align(int(row_count), 8)
    n_levels = levels.shape[0]
    tb = _pick_tb_af(hl8, h8, w128, spread)
    if tb is None:
        raise ValueError("geometry unsupported; check supports() first")
    tbw = _align(tb + spread + 16, 32)
    nb = hl8 // tb
    row_start = jnp.asarray(row_start, jnp.int32).reshape(1)

    nys = jnp.clip(jnp.floor(fys), -(h + 2.0), h + 2.0).astype(jnp.int32)
    minny = nys.min(axis=0)
    maxny = jnp.minimum(nys.max(axis=0), minny + spread)
    rowspan = jnp.stack([minny, maxny], axis=1)  # [G, 2]
    presence = (
        jnp.any(
            focus_map8.reshape(nb, tb, w128)[:, :, :w, None]
            == levels[None, None, None, :],
            axis=(1, 2),
        )
    ).astype(jnp.int32)  # [NB, L]

    kernel = functools.partial(
        _af_kernel, h=h, w=w, tb=tb, tbw=tbw, n_levels=n_levels, px=px,
    )
    out = pl.pallas_call(
        kernel,
        grid=(g, c, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (tb, w128), lambda gg, cc, rr: (rr, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tb, w128), lambda gg, cc, rr: (gg, cc, rr, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((g, c, hl8, w128), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((tb // 4, w128), jnp.uint32),
            pltpu.VMEM((tbw // 4, w128), jnp.uint32),
            pltpu.VMEM((2, tbw, w128), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * n_levels * g * c * hl8 * w128,
            bytes_accessed=2 * g * c * hl8 * w128,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        levels.astype(jnp.int32),
        fys.astype(jnp.float32),
        fxs.astype(jnp.float32),
        rowspan,
        presence,
        row_start,
        focus_map8,
        tiled,
    )
    return out


def render_allfocus_quantized_fused(
    images: jnp.ndarray,  # [G, C, H, W] uint8
    weights: jnp.ndarray,  # [V, G] float32
    offsets: jnp.ndarray,  # [G, 2] float32 (x, y)
    focus_map: jnp.ndarray,  # [row_count or H, W] uint8 (raw, quantized)
    focus: jnp.ndarray,
    focus_range: jnp.ndarray,
    *,
    steps: int,
    spread: int,
    px: int,
    row_start: jnp.ndarray | int = 0,
    row_count: int | None = None,
    all_bytes: bool = False,
) -> jnp.ndarray:
    """The fused-kernel drop-in for blend_xla.render_allfocus_quantized on
    raw (level-quantized) maps: derives the level set and the per-level
    fractional shifts with the shared exact expressions, then renders
    through the kernel. The single dispatch point for both the single-chip
    pipeline and the sharded mesh path.

    ``all_bytes=True`` scans all 256 byte values (blend_xla.byte_levels)
    instead of the estimator's `steps` levels -- exact for ANY map, e.g.
    the box-filtered one the STD method reads (src/kernels.cu:326). On
    realistic dense-byte filtered maps the kernel's presence table skips
    absent (band, level) work just like the XLA scan but without its
    per-level dispatch overhead: measured round 5 at 1080p, 367 -> 101 ms
    (4x4, 241 distinct bytes) and 1597 -> 319 ms (8x8, 221 bytes),
    bit-identical."""
    from . import blend_xla

    if all_bytes:
        levels, f_levels = blend_xla.byte_levels(focus, focus_range)
    else:
        levels, f_levels = blend_xla.quantized_levels(
            focus, focus_range, steps
        )
    return render_allfocus_tiled(
        images, weights, focus_map, levels,
        f_levels[:, None] * offsets[None, :, 1],
        f_levels[:, None] * offsets[None, :, 0],
        spread=spread, px=px, row_start=row_start, row_count=row_count,
    )


def select_allfocus_quantized(
    images: jnp.ndarray,  # [G, C, H, W] uint8
    offsets: jnp.ndarray,  # [G, 2] float32 (x, y)
    focus_map: jnp.ndarray,  # [row_count or H, W] uint8 (raw, quantized)
    focus: jnp.ndarray,
    focus_range: jnp.ndarray,
    *,
    steps: int,
    spread: int,
    px: int,
    row_start: jnp.ndarray | int = 0,
    row_count: int | None = None,
    pre_tiled: bool = False,
    h: int | None = None,
    w: int | None = None,
    all_bytes: bool = False,
) -> jnp.ndarray:
    """The weight-independent SELECT stage of render_allfocus_quantized_fused
    -> x4 [G, C, h8, w128] uint8 in the blend_tiled operand tiling.

    Split out so view-batched renders (api.py) select once and blend per
    weight-row batch (blend_pallas.blend_tiled_cropped); bit-identical to the
    stack render_allfocus_quantized_fused contracts. With `pre_tiled=True`,
    `images` is an existing pad_to_tiles output [G, C, H8, W128] and `h`/`w`
    give the true geometry -- used by memory-pressured renders that drop the
    raw stack once the tiled copy exists. `all_bytes` as in
    render_allfocus_quantized_fused (the STD filtered-map level set)."""
    from . import blend_xla

    if all_bytes:
        levels, f_levels = blend_xla.byte_levels(focus, focus_range)
    else:
        levels, f_levels = blend_xla.quantized_levels(
            focus, focus_range, steps
        )
    return _select_tiled(
        images, focus_map, levels,
        f_levels[:, None] * offsets[None, :, 1],
        f_levels[:, None] * offsets[None, :, 0],
        spread=spread, px=px, row_start=row_start, row_count=row_count,
        pre_tiled=pre_tiled, h=h, w=w,
    )


def render_allfocus_tiled(
    images: jnp.ndarray,  # [G, C, H, W] uint8
    weights: jnp.ndarray,  # [V, G] float32
    focus_map: jnp.ndarray,  # [row_count or H, W] uint8 (raw, quantized)
    levels: jnp.ndarray,  # [L] uint8
    fys: jnp.ndarray,  # [L, G] f32
    fxs: jnp.ndarray,  # [L, G] f32
    *,
    spread: int,
    px: int,
    row_start: jnp.ndarray | int = 0,
    row_count: int | None = None,
) -> jnp.ndarray:
    """Full TEN allFocus render: fused select kernel + MXU blend.

    -> [V, C, row_count or H, W] uint8; same numerics as the XLA quantized
    path. With `row_start`/`row_count`, renders only that block of output
    rows (`focus_map` must be the matching block)."""
    from .blend_pallas import blend_tiled

    g, c, h, w = images.shape
    h_out = h if row_count is None else int(row_count)
    hl8, w128 = _align(h_out, 8), _align(w, 128)
    x4 = _select_tiled(
        images, focus_map, levels, fys, fxs,
        spread=spread, px=px, row_start=row_start, row_count=row_count,
    )
    out = blend_tiled(x4, weights)
    if (hl8, w128) != (h_out, w):
        out = out[:, :, :h_out, :w]
    return out


def _select_tiled(
    images, focus_map, levels, fys, fxs, *, spread, px, row_start, row_count,
    pre_tiled=False, h=None, w=None,
):
    """Pad the map/stack to tile alignment and run the fused select kernel
    -> x4 [G, C, h8, w128] uint8 (the blend_tiled operand tiling). With
    `pre_tiled`, `images` is already the tiled stack and h/w are given."""
    from .shift_pallas import pad_to_tiles

    if pre_tiled:
        if h is None or w is None:
            raise ValueError("pre_tiled select needs the true h/w")
        tiled = images
    else:
        _, _, h, w = images.shape
        tiled = pad_to_tiles(images)
    h_out = h if row_count is None else int(row_count)
    hl8, w128 = _align(h_out, 8), _align(w, 128)
    map8 = jnp.pad(
        focus_map, ((0, hl8 - h_out), (0, w128 - w)), mode="edge"
    )
    return allfocus_select_tiled(
        tiled, map8, levels, fys, fxs,
        h=h, w=w, spread=spread, px=px,
        row_start=row_start, row_count=row_count,
    )
