"""Fused Pallas focus-estimate kernels (FocusMap::estimate).

Two siblings share the window DMA scheme, SWAR byte min/max and the
argmin tail: `estimate_fused` reproduces the EXACT per-center-pixel tap
rule (9 per-cell tap maps per view), `estimate_fast_fused` the fast
tap-position rule (ONE trunc-corrected window + one minmax per view, the
9 stencil costs become static slices of a single range map).

TPU-native re-design of the reference disparity search
(reference: src/kernels.cu:164-258) with the EXACT per-CENTER-pixel C
truncation semantics of `focus.estimate_focus_map(exact_taps=True)` --
bit-identical by construction, measured ~2x faster on v5e (the XLA path
pays i32-density selects and per-candidate HBM materialization; this
kernel keeps every candidate's working set in VMEM and runs all byte work
on the sublane-packed u32 view).

Why this exists despite Mosaic lacking u8 vector min/max (the round-2
PARITY analysis): the per-byte unsigned min/max IS expressible as
borrow-guarded SWAR mask arithmetic on the packed u32 view,

    axb = a ^ b
    d   = (a | 0x80..80) - (b & 0x7F..7F)         # per-byte, borrow-free
    ge  = (((d & ~axb) | (a & ~b)) & 0x80..80) >> 7) * 0xFF
    max = b ^ (axb & ge);  min = a ^ (axb & ge)   # one mask, both results

(exhaustively verified per byte), and at 4 bytes/lane the whole
select/roll/minmax pipeline runs ~4x denser than the widened-i32
formulation that round 2 measured losing. A stripped core of this kernel
measured 17.0 ms per (8 candidates x 32 views x 9 cells x 1 channel) at
1056x1920 -- ~204 ms extrapolated vs 484 ms XLA.

Structure (grid = (bands, lane-chunks, cand-chunks, channels,
cands-in-chunk), last dim fastest; lane chunks split the output width
when the K-window VMEM set would overflow at full width -- see
_cfg_candidates):

  * per (band, chunk, channel): K window DMAs from the edge-padded view
    stack (one strided [TBW, WL] window per view, start 8/128-aligned via
    per-(chunk, view) SMEM tables), reused across the chunk's candidates;
  * per candidate and view: packed row alignment (dynamic roll + static
    one-step roll + byte funnel), 9 static row variants (stencil rows and
    their +-1 truncation neighbours), per-byte-row truncation masks from
    the oracle's own f32 expressions (blend_xla.trunc_offsets semantics),
    one dynamic lane roll per stencil row + 9 static lane variants, the
    per-column truncation rule as two vector selects, and per-cell SWAR
    min/max accumulation;
  * per (cell, candidate): running max over channels of (max - min)
    (packed byte subtract -- borrow-free since max >= min per byte);
  * per candidate (last channel): unpack to 4 interleaved i32 planes,
    9-cell stencil cost sum, strict-first argmin against the running
    best, and the winning candidate's map byte (precomputed with the
    exact encode expressions) folded into a packed best-byte register.

The window DMAs read an edge-padded stack (clamp encoded spatially, no
border arithmetic in-kernel, like blend_pallas.pad_images); the pad
bounds are the estimate's existing shift_pad_bound (px, py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend_pallas import _align, _interpret


def chunk_spans(
    offsets, focus: float, focus_range: float, steps: int, sc: int,
) -> tuple[int, int]:
    """Static (row, col) bounds on the shift span within one `sc`-candidate
    chunk. Host-side (concrete offsets/focus floats), bucketed to 8 so
    nearby focus settings share a compiled program."""
    import numpy as np  # host-side only

    off = np.asarray(offsets)
    step = abs(float(focus_range)) / max(steps - 1, 1)
    span = step * max(sc - 1, 1)
    sy = int(np.ceil(span * float(np.abs(off[:, 1]).max()))) + 4
    sx = int(np.ceil(span * float(np.abs(off[:, 0]).max()))) + 4
    rnd = lambda v: -(-v // 8) * 8
    return rnd(sy), rnd(sx)


def _wchunks(w128: int):
    """Output lane-chunk widths to try, widest first: the full width, then
    progressively narrower 128-multiple divisors. Narrower chunks shrink
    the K-window VMEM set (windows overlap horizontally by the span+radius
    slack, ~10-15% extra fetch per split) -- how 4K geometries fit."""
    seen = []
    for n in (1, 2, 3, 4, 5, 6, 8, 10, 12, 15):
        if w128 % n == 0 and w128 // n % 128 == 0 and w128 // n >= 256:
            if w128 // n not in seen:
                seen.append(w128 // n)
    return seen or [w128]


def _cfg_candidates(
    h8: int, w128: int, steps: int, ry: int, rx: int,
    span_y: int, span_x: int, tb_max: int, tile_tb_first: bool = False,
):
    """Yield (tb, tbw, wl, cc, sc, wco) candidates in preference order.

    Priority: fetch-amplification cap first (4x, then uncapped -- a
    narrower lane chunk with tall bands beats a full-width chunk forced
    down to tb=8, the 4K failure mode: 16x window/band amplification and
    3-4x the DMA issue count); then LARGE sc (small sc refetches the K
    windows steps/sc times per band/channel -- a 2-32x multiplier, far
    bigger than lane-chunk overhead; measured at 8x8/1080p exact: sc=4
    197.5 ms vs sc=2 205.0 at the same tb/wco); then wide lane chunks
    (less wl/wco overhead); then tall bands.

    `tile_tb_first` (the EXACT kernel): prefer sublane-tile-aligned band
    heights -- tb a multiple of 32 packs to tb/4 = 8k sublanes, whole
    (8, 128) tile rows -- over BOTH larger misaligned bands and wider
    lane chunks (tb moves outside the wco loop). The exact kernel's
    packed accumulators live in [tb/4, WL] u32 planes, and misaligned
    plane heights (tb=40 -> 10 sublanes) cost Mosaic masked/split tile
    ops on every select/minmax: measured at 4K/K=32/steps=32 exact,
    tb=32 925 ms vs tb=40 1189 vs tb=24 1250 at identical sc4/wco1280
    (and 205 vs 281 at 1080p/sc2) -- tb=32 wins even though ceil(h8/32)
    bands refetch MORE window bytes than tb=40. Band height beats chunk
    width: at 8K width (row-blocked 2160x7680, radius (76,44)) the
    wide-chunk-first pick tb=8/wco=1536 measured 6807 ms vs
    tb=32/wco=768 2598 ms (2.6x) and tb=24/wco=768 3328 ms -- 2-sublane
    planes + 24x window refetch lose to whole tiles at half the chunk
    width. The FAST kernel's corrected-window maps are [rc4, WL] with
    rc4 already dominated by 2*ry; it measured the OPPOSITE tb order
    (tb=88 307 ms, tb=64 356, tb=32 555 at 4K), so it keeps plain
    wide-chunks-then-tall-bands.

    tb need NOT divide h8: the grid runs ceil(h8/tb) bands and _run slices
    the <tb overshoot rows off (every op is clamp-windowed, so the extra
    rows just compute garbage). The kernel is VPU-bound, so overshoot rows
    cost real compute: accept at most h8/8 (12.5%) of them. Without this,
    awkward row-block heights (272 = 16x17) admit only tiny divisors and
    the window-per-band amplification explodes (measured 612 ms vs the
    full frame's 440 at 8x8/1080p/span-120: tb=16 gives a 12x tbw/tb)."""
    tbs = list(range(tb_max, 7, -8))
    if tile_tb_first:
        tbs.sort(key=lambda t: (t % 32 != 0, -t))
    wcos = _wchunks(w128)
    pairs = (
        [(tb, wco) for tb in tbs for wco in wcos]
        if tile_tb_first
        else [(tb, wco) for wco in wcos for tb in tbs]
    )
    for amp_cap in (4, 10**9):
        for sc in (4, 2, 1):
            if steps % sc:
                continue
            cc = steps // sc
            for tb, wco in pairs:
                wl = _align(wco + span_x + 2 * rx + 140, 128)
                if wl > 8 * 3968:  # lane-roll temporaries would blow VMEM
                    continue
                waste = -(-h8 // tb) * tb - h8
                if waste * 8 > h8:
                    continue
                tbw = _align(tb + span_y + 2 * ry + 16, 32)
                # Tile-aligned bands get one notch of amp slack (5x in
                # the capped tier): the measured VPU win from whole-tile
                # accumulator planes (925 vs 1189 ms at 4K, where tb=32
                # means tbw/tb = 5) exceeds the extra window refetch of
                # the smaller band.
                cap = amp_cap * tb
                if tile_tb_first and tb % 32 == 0:
                    cap += amp_cap * tb // 4
                if tbw > cap:
                    continue
                yield tb, tbw, wl, cc, sc, wco


def _pick_cfg(
    h8: int, w128: int, k: int, steps: int, ry: int, rx: int,
    span_y: int, span_x: int, budget: int = 13 * 1024 * 1024,
):
    """Choose (TB, TBW, WL, CC, SC, WCO) fitting VMEM, or None.

    Working set: K u8 windows [TBW, WL] + packed accumulators
    (18 + 9*SC + ~6 temps) x [TB/4, WL] u32 + best state.
    """
    for tb, tbw, wl, cc, sc, wco in _cfg_candidates(
        h8, w128, steps, ry, rx, span_y, span_x, 40, tile_tb_first=True
    ):
        need = (
            k * tbw * wl
            + (18 + 9 * sc + 8) * tb * wl
            + 10 * tb * wl  # best-cost planes + temps
        )
        if need <= budget:
            return tb, tbw, wl, cc, sc, wco
    return None


def _cfg_for(
    h_out: int, w: int, k: int, steps: int, radius: tuple[int, int],
    span_y: int, span_x: int, *, exact_taps: bool = True,
):
    """THE availability gate + config pick, shared by every consumer.

    Returns the (TB, TBW, WL, CC, SC, WCO) config the kernel will run with
    for this geometry, or None when the fused engine cannot run it.
    `supports`/`supports_fast` (runtime gates), `slab_dims` (capacity
    arithmetic), and `_run` (the engine itself) all derive from this one
    predicate, so the planner can never size an engine the runtime
    rejects -- or vice versa. radius is the (rx, ry) pair from
    geometry.block_radius; the pickers take (ry, rx)."""
    h8 = _align(h_out, 8)
    if w < 256 or h8 < 8 or k < 1 or steps < 2:
        return None
    pick = _pick_cfg if exact_taps else _pick_cfg_fast
    return pick(
        h8, _align(w, 128), k, steps, int(radius[1]), int(radius[0]),
        span_y, span_x,
    )


def supports(
    h_out: int, w: int, k: int, steps: int, radius: tuple[int, int],
    span_y: int, span_x: int,
) -> bool:
    return (
        _cfg_for(h_out, w, k, steps, radius, span_y, span_x, exact_taps=True)
        is not None
    )


def _edge_pad(
    selected: jnp.ndarray, px: int, py: int, hp: int, wp: int
) -> jnp.ndarray:
    """[K, C, H, W] -> [K, C, HP, WP]: edge-replicate (px, py) clamp pads
    plus the dead alignment tail in ONE broadcast+concat pass.

    jnp.pad(mode="edge") lowers ~2x slower on TPU (gather-style fill, see
    blend_pallas.pad_images); the tail rows/cols are fetched by overshooting
    DMA windows but never selected, so edge values serve there as well as
    zeros."""
    k, c, h, w = selected.shape
    top = jnp.broadcast_to(selected[:, :, :1, :], (k, c, py, w))
    bot = jnp.broadcast_to(selected[:, :, h - 1 :, :], (k, c, hp - h - py, w))
    x = jnp.concatenate([top, selected, bot], axis=2)
    left = jnp.broadcast_to(x[:, :, :, :1], (k, c, hp, px))
    right = jnp.broadcast_to(x[:, :, :, w - 1 : w], (k, c, hp, wp - w - px))
    return jnp.concatenate([left, x, right], axis=3)


def _lst_table(mnx, px: int, rx: int, n_wc: int, wco: int, wp: int, wl: int):
    """[WC, CC, K] 128-aligned window lane starts: chunk wc's out col 0
    is px + wc*wco in padded coords; clip BEFORE the 128-floor so Mosaic
    can prove the DMA start alignment (CLAUDE.md)."""
    wcol = jnp.arange(n_wc, dtype=jnp.int32)[:, None, None] * wco
    return jnp.clip(px + wcol + mnx[None] - (rx + 2), 0, wp - wl) // 128 * 128


def _swar_ge(a, b):
    """Per-byte mask (0xFF / 0x00) of a >= b (unsigned), plus a ^ b."""
    h8c = jnp.uint32(0x80808080)
    n8c = jnp.uint32(0x7F7F7F7F)
    axb = a ^ b
    d = (a | h8c) - (b & n8c)
    ge80 = ((d & ~axb) | (a & ~b)) & h8c
    m = jax.lax.shift_right_logical(ge80, jnp.uint32(7)) * jnp.uint32(0xFF)
    return m, axb


def _est_kernel(
    fys_ref,  # SMEM [S, K] f32
    fxs_ref,  # SMEM [S, K] f32
    nys_ref,  # SMEM [S, K] i32 (clipped floor, = XLA dyf)
    nxs_ref,  # SMEM [S, K] i32 (clipped floor, = XLA dxf)
    base8_ref,  # SMEM [CC, K] i32 (8-aligned window row base, band 0)
    lst_ref,  # SMEM [WC, CC, K] i32 (128-aligned window lane start)
    lvl_ref,  # SMEM [S] i32 (map byte per candidate)
    rs_ref,  # SMEM [2] i32 (global coord row start, window row start --
    #          equal in full mode; slab mode passes (r0, 0): trunc masks
    #          need GLOBAL rows, window/base math runs in slab-local rows)
    *rest,  # [pres_ref] + pad_ref, out_ref, scratch refs (see below):
    #         pres_ref -- SMEM [NB, WC, CC] i32 candidate-presence bitmask
    #         (bit s_in: scan candidate cc*sc+s_in for this block), ONLY
    #         when predicated=True (the focus-pyramid refine pass)
    # pad_ref: HBM [K, C, HP, WP] u8 (edge-padded view stack or slab)
    # out_ref: VMEM block [TB, W128] u8
    # win: VMEM scratch [K, TBW, WL] u8
    # accs: VMEM scratch [18, TB/4, WL] u32 (min/max per cell)
    # chmax: VMEM scratch [9, SC, TB/4, WL] u32 (range max over channels)
    # bestc: VMEM scratch [4, TB/4, WL] i32 (best cost, byte-row planes)
    # bestb: VMEM scratch [TB/4, WL] u32 (best map byte, packed)
    # sems: DMA semaphores [K]
    tb: int,
    tbw: int,
    wl: int,
    sc: int,
    ry: int,
    rx: int,
    px: int,
    py: int,
    wco: int,
    k_views: int,
    n_ch: int,
    predicated: bool = False,
):
    if predicated:
        (pres_ref, pad_ref, out_ref, win, accs, chmax, bestc, bestb,
         sems) = rest
    else:
        pres_ref = None
        pad_ref, out_ref, win, accs, chmax, bestc, bestb, sems = rest
    band = pl.program_id(0)
    wc = pl.program_id(1)
    cc = pl.program_id(2)
    c = pl.program_id(3)
    s_in = pl.program_id(4)
    n_cc = pl.num_programs(2)
    s = cc * sc + s_in
    if predicated:
        # Whole-step presence predication (the focus-pyramid refine pass):
        # skip the K window DMAs when no candidate of this chunk is present
        # for this block, and skip a candidate's entire accumulate/argmin
        # step when its bit is off. Per the measured predication rule
        # (CLAUDE.md), pl.when only ever guards WHOLE steps here -- never
        # per-block vector selects inside a step.
        presm = pres_ref[band, wc, cc]
        chunk_on = presm != 0
        s_on = (jax.lax.shift_right_logical(presm, s_in) & 1) != 0

    nbp = tb // 4
    rall = tbw // 4
    allff = jnp.uint32(0xFFFFFFFF)
    ffu = jnp.uint32(0xFF)
    zero = jnp.uint32(0)

    # ---- window set DMA: once per (band, lane-chunk, cand-chunk, ch) ----
    @pl.when((s_in == 0) & chunk_on if predicated else s_in == 0)
    def _():
        # the trailing //8*8 and //128*128 are no-ops on the already-aligned
        # table values but let Mosaic PROVE the DMA start alignment (SMEM
        # values carry no alignment facts)
        def copy_kv(kv):
            ws = (base8_ref[cc, kv] + band * tb) // 8 * 8
            ls = lst_ref[wc, cc, kv] // 128 * 128
            return pltpu.make_async_copy(
                pad_ref.at[kv, c, pl.ds(ws, tbw), pl.ds(ls, wl)],
                win.at[kv],
                sems.at[kv],
            )

        def issue(kv, _):
            copy_kv(kv).start()
            return 0

        lax.fori_loop(0, k_views, issue, 0)

        def wait(kv, _):
            copy_kv(kv).wait()
            return 0

        lax.fori_loop(0, k_views, wait, 0)

    # global center rows of this band's packed rows (byte i = row 4kk+i)
    ysp = jax.lax.broadcasted_iota(jnp.int32, (nbp, 1), 0) * 4 + (
        rs_ref[0] + band * tb
    )
    # lane l of this chunk is output column wc*wco + l
    qx = jax.lax.broadcasted_iota(jnp.int32, (1, wl), 1) + wc * wco
    qxf = qx.astype(jnp.float32)

    row_offs = sorted({syo + d for syo in (-ry, 0, ry) for d in (-1, 0, 1)})
    col_offs = sorted({sxo + d for sxo in (-rx, 0, rx) for d in (-1, 0, 1)})

    def compute_taps(kv):
        """The 9 stencil-cell tap maps of view kv (packed u32)."""
        fy = fys_ref[s, kv]
        fx = fxs_ref[s, kv]
        ny = nys_ref[s, kv]
        nx = nxs_ref[s, kv]

        w32 = pltpu.bitcast(win[kv], jnp.uint32)  # [TBW/4, WL]
        # packed alignment: A[m] = window[m + dr] with
        # dr = py + row_start + ny - (base8 + band*tb) + band*tb ... the
        # band term cancels: dr = py + rs + ny - base8 - (ry + 2) shifted
        # so variants index at off + ry + 2 >= 1 (rs = the WINDOW row
        # start, rs_ref[1]: 0 in slab mode where base8 is slab-local)
        dr = py + rs_ref[1] + ny - base8_ref[cc, kv] - (ry + 2)
        rb4 = dr // 4
        rr = dr - 4 * rb4
        z0 = pltpu.roll(w32, (rall - rb4 % rall) % rall, 0)
        z1 = pltpu.roll(z0, rall - 1, 0)  # static one-step roll
        sh = (8 * rr).astype(jnp.uint32)
        shl = ((32 - 8 * rr) % 32).astype(jnp.uint32)
        base = jnp.where(
            rr == 0,
            z0,
            jax.lax.shift_right_logical(z0, sh) | jax.lax.shift_left(z1, shl),
        )

        # 9 static row variants: variant[off][kk] bytes = rows 4kk+i+off
        variants = {}
        for off in row_offs:
            q, r = divmod(off + ry + 2, 4)
            lo = base[q : q + nbp, :]
            if r == 0:
                variants[off] = lo
            else:
                hi = base[q + 1 : q + nbp + 1, :]
                variants[off] = jax.lax.shift_right_logical(
                    lo, jnp.uint32(8 * r)
                ) | jax.lax.shift_left(hi, jnp.uint32(32 - 8 * r))

        # per-byte-row truncation masks (oracle's exact f32 expression,
        # blend_xla.trunc_offsets): dyo in {-1, 0, 1} at the CENTER row
        fyf = jnp.floor(fy)
        mm = zero
        mp = zero
        for i in range(4):
            qyf_i = (ysp + i).astype(jnp.float32)
            dyo_i = jnp.clip(
                (jnp.trunc(qyf_i + fy) - (qyf_i + fyf)).astype(jnp.int32),
                -1, 1,
            )
            byte = jnp.uint32(0xFF << (8 * i))
            mm = mm | jnp.where(dyo_i == -1, byte, zero)
            mp = mp | jnp.where(dyo_i == 1, byte, zero)
        nm = (mm | mp) ^ allff

        # per-column truncation rule at the CENTER column (lane l = out col)
        fxf = jnp.floor(fx)
        dxo = jnp.clip(
            (jnp.trunc(qxf + fx) - (qxf + fxf)).astype(jnp.int32), -1, 1
        )  # [1, WL]
        dxp = dxo == 1
        dxm = dxo == -1

        # lane roll: rolled[l] = A[l + rxl]; window lane of out col
        # wc*wco + l is (wc*wco + l) + nx + px - lst
        rxl = px + nx + wc * wco - lst_ref[wc, cc, kv]

        taps = []
        for syo in (-ry, 0, ry):
            rsel = (
                (mm & variants[syo - 1])
                | (mp & variants[syo + 1])
                | (nm & variants[syo])
            )
            r0 = pltpu.roll(rsel, (wl - rxl % wl) % wl, 1)
            lvar = {
                m: (pltpu.roll(r0, (wl - m % wl) % wl, 1) if m else r0)
                for m in col_offs
            }
            for sxo in (-rx, 0, rx):
                taps.append(jnp.where(
                    dxp, lvar[sxo + 1], jnp.where(dxm, lvar[sxo - 1], lvar[sxo])
                ))
        return taps

    def acc_minmax(cell, mn_new, mx_new):
        mn = accs[2 * cell]
        mx = accs[2 * cell + 1]
        m1, axb1 = _swar_ge(mx, mx_new)   # mx >= new ?
        accs[2 * cell + 1] = mx_new ^ (axb1 & m1)
        m2, axb2 = _swar_ge(mn, mn_new)   # mn >= new ?
        accs[2 * cell] = mn ^ (axb2 & m2)

    def view_body(kv, _):
        # one view per iteration; a pairwise minmax tree (3 SWAR compares
        # per 2 views instead of 4) measured SLOWER (265 vs 259 ms at the
        # 8x8/1080p config): the 18 extra live tap registers cost more in
        # scheduling than the saved compares
        tt = compute_taps(kv)
        for cell in range(9):
            acc_minmax(cell, tt[cell], tt[cell])
        return 0

    def accumulate():
        # ---- init per-candidate minmax accumulators ----
        for cell in range(9):
            accs[2 * cell] = jnp.full((nbp, wl), allff, jnp.uint32)
            accs[2 * cell + 1] = jnp.zeros((nbp, wl), jnp.uint32)

        lax.fori_loop(0, k_views, view_body, 0)

        # ---- per-cell range, channel max ----
        for cell in range(9):
            rng = accs[2 * cell + 1] - accs[2 * cell]  # per-byte, borrow-free
            if n_ch == 1:
                chmax[cell, s_in] = rng
            else:
                @pl.when(c == 0)
                def _(cell=cell, rng=rng):
                    chmax[cell, s_in] = rng

                @pl.when(c > 0)
                def _(cell=cell, rng=rng):
                    cur = chmax[cell, s_in]
                    m, axb = _swar_ge(cur, rng)
                    chmax[cell, s_in] = rng ^ (axb & m)

    if predicated:
        pl.when(s_on)(accumulate)
    else:
        accumulate()

    # ---- cost + strict-first argmin (last channel only) ----
    @pl.when(c == n_ch - 1)
    def _():
        # best-state init is presence-INDEPENDENT (a skipped s == 0 must
        # still initialize what the final write reads)
        @pl.when(s == 0)
        def _():
            for i in range(4):
                bestc[i] = jnp.full((nbp, wl), jnp.int32(2**30), jnp.int32)
            bestb[:, :] = jnp.zeros((nbp, wl), jnp.uint32)

        def argmin_update():
            planes = []
            for i in range(4):
                shi = jnp.uint32(8 * i)
                tot = jnp.zeros((nbp, wl), jnp.int32)
                for cell in range(9):
                    tot = tot + (
                        jax.lax.shift_right_logical(chmax[cell, s_in], shi)
                        & ffu
                    ).astype(jnp.int32)
                planes.append(tot)

            byte_s = lvl_ref[s].astype(jnp.uint32) * jnp.uint32(0x01010101)
            mupd = zero
            for i in range(4):
                better = planes[i] < bestc[i]
                bestc[i] = jnp.where(better, planes[i], bestc[i])
                mupd = mupd | jnp.where(
                    better, jnp.uint32(0xFF << (8 * i)), zero
                )
            bestb[:, :] = (mupd & byte_s) | (~mupd & bestb[:, :])

        if predicated:
            pl.when(s_on)(argmin_update)
        else:
            argmin_update()

        @pl.when((cc == n_cc - 1) & (s_in == sc - 1))
        def _():
            out_ref[:, :] = pltpu.bitcast(bestb[:, :], jnp.uint8)[
                :, 0:wco
            ]


def _pick_cfg_fast(
    h8: int, w128: int, k: int, steps: int, ry: int, rx: int,
    span_y: int, span_x: int, budget: int = 13 * 1024 * 1024,
):
    """Choose (TB, TBW, WL, CC, SC, WCO) for the fast-taps kernel, or None.

    Working set: K u8 windows [TBW, WL] (the binding term, same as the
    exact kernel) + (2 minmax + SC chmax + ~8 temps) packed maps of
    [RC4, WL] u32 with RC4 = (TB + 2ry)/4 + 2 (the corrected window
    overhangs the band by +-ry rows) + best state.
    """
    for tb, tbw, wl, cc, sc, wco in _cfg_candidates(
        h8, w128, steps, ry, rx, span_y, span_x, 96
    ):
        rc4b = tb + 2 * ry + 8  # bytes/lane of one [RC4, WL] u32 map
        need = (
            k * tbw * wl
            + (2 + sc + 8) * rc4b * wl
            + 6 * tb * wl  # best-cost planes + byte register
        )
        if need <= budget:
            return tb, tbw, wl, cc, sc, wco
    return None


def supports_fast(
    h_out: int, w: int, k: int, steps: int, radius: tuple[int, int],
    span_y: int, span_x: int,
) -> bool:
    return (
        _cfg_for(h_out, w, k, steps, radius, span_y, span_x, exact_taps=False)
        is not None
    )


def _est_fast_kernel(
    fys_ref,  # SMEM [S, K] f32
    fxs_ref,  # SMEM [S, K] f32
    nys_ref,  # SMEM [S, K] i32
    nxs_ref,  # SMEM [S, K] i32
    base8_ref,  # SMEM [CC, K] i32
    lst_ref,  # SMEM [WC, CC, K] i32
    lvl_ref,  # SMEM [S] i32
    rs_ref,  # SMEM [2] i32 (global coord row start, window row start)
    pad_ref,  # HBM [K, C, HP, WP] u8
    out_ref,  # VMEM block [TB, W128] u8
    win,  # VMEM scratch [K, TBW, WL] u8
    mns,  # VMEM scratch [RC4, WL] u32 (view min of the corrected window)
    mxs,  # VMEM scratch [RC4, WL] u32
    chmax,  # VMEM scratch [SC, RC4, WL] u32 (range max over channels)
    bestc,  # VMEM scratch [4, TB/4, WL] i32
    bestb,  # VMEM scratch [TB/4, WL] u32
    sems,  # DMA semaphores [K]
    *,
    tb: int,
    tbw: int,
    wl: int,
    sc: int,
    ry: int,
    rx: int,
    px: int,
    py: int,
    wco: int,
    k_views: int,
    n_ch: int,
):
    """Fast-taps sibling of _est_kernel (focus.estimate_focus_map with
    exact_taps=False, reference tap loop src/kernels.cu:205-216 evaluated
    at the TAP position): per view ONE trunc-corrected window over band
    rows [-ry, tb+ry) x cols [-rx, w+rx) and ONE SWAR minmax accumulate,
    instead of 9 per-cell tap maps; the 9 stencil costs become static
    slices of the single per-candidate range map. Bit-identical to the
    XLA cost_fast path (ops/focus.py::cost_fast)."""
    band = pl.program_id(0)
    wc = pl.program_id(1)
    cc = pl.program_id(2)
    c = pl.program_id(3)
    s_in = pl.program_id(4)
    n_cc = pl.num_programs(2)
    s = cc * sc + s_in

    nbp = tb // 4
    rc4 = (tb + 2 * ry) // 4 + 2
    rall = tbw // 4
    allff = jnp.uint32(0xFFFFFFFF)
    ffu = jnp.uint32(0xFF)
    zero = jnp.uint32(0)

    # ---- window set DMA: once per (band, lane-chunk, cand-chunk, ch) ----
    @pl.when(s_in == 0)
    def _():
        def copy_kv(kv):
            ws = (base8_ref[cc, kv] + band * tb) // 8 * 8
            ls = lst_ref[wc, cc, kv] // 128 * 128
            return pltpu.make_async_copy(
                pad_ref.at[kv, c, pl.ds(ws, tbw), pl.ds(ls, wl)],
                win.at[kv],
                sems.at[kv],
            )

        def issue(kv, _):
            copy_kv(kv).start()
            return 0

        lax.fori_loop(0, k_views, issue, 0)

        def wait(kv, _):
            copy_kv(kv).wait()
            return 0

        lax.fori_loop(0, k_views, wait, 0)

    mns[:, :] = jnp.full((rc4, wl), allff, jnp.uint32)
    mxs[:, :] = jnp.zeros((rc4, wl), jnp.uint32)

    # window rows: byte i of packed row kk is band row 4kk + i - ry
    ysp = jax.lax.broadcasted_iota(jnp.int32, (rc4, 1), 0) * 4 + (
        rs_ref[0] + band * tb - ry
    )
    qxw = jax.lax.broadcasted_iota(jnp.int32, (1, wl), 1) - rx + wc * wco
    qxwf = qxw.astype(jnp.float32)

    def corrected_window(kv):
        """View kv's trunc-corrected window (packed u32 [RC4, WL])."""
        fy = fys_ref[s, kv]
        fx = fxs_ref[s, kv]
        ny = nys_ref[s, kv]
        nx = nxs_ref[s, kv]

        w32 = pltpu.bitcast(win[kv], jnp.uint32)  # [TBW/4, WL]
        # same alignment fold as the exact kernel: base byte b holds band
        # row b - (ry + 2), so window byte j (band row j - ry) sits at
        # base byte j + d + 2 for trunc variant d (rs_ref[1] = the window
        # row start: 0 in slab mode where base8 is slab-local)
        dr = py + rs_ref[1] + ny - base8_ref[cc, kv] - (ry + 2)
        rb4 = dr // 4
        rr = dr - 4 * rb4
        z0 = pltpu.roll(w32, (rall - rb4 % rall) % rall, 0)
        z1 = pltpu.roll(z0, rall - 1, 0)
        sh = (8 * rr).astype(jnp.uint32)
        shl = ((32 - 8 * rr) % 32).astype(jnp.uint32)
        base = jnp.where(
            rr == 0,
            z0,
            jax.lax.shift_right_logical(z0, sh) | jax.lax.shift_left(z1, shl),
        )

        variants = {}
        for d in (-1, 0, 1):
            r = d + 2  # in {1, 2, 3}: always a two-row funnel
            lo = base[0:rc4, :]
            hi = base[1 : rc4 + 1, :]
            variants[d] = jax.lax.shift_right_logical(
                lo, jnp.uint32(8 * r)
            ) | jax.lax.shift_left(hi, jnp.uint32(32 - 8 * r))

        # per-byte-row trunc masks at the WINDOW row (the fast rule:
        # trunc_offsets evaluated at the tap position, not the center)
        fyf = jnp.floor(fy)
        mm = zero
        mp = zero
        for i in range(4):
            qyf_i = (ysp + i).astype(jnp.float32)
            dyo_i = jnp.clip(
                (jnp.trunc(qyf_i + fy) - (qyf_i + fyf)).astype(jnp.int32),
                -1, 1,
            )
            byte = jnp.uint32(0xFF << (8 * i))
            mm = mm | jnp.where(dyo_i == -1, byte, zero)
            mp = mp | jnp.where(dyo_i == 1, byte, zero)
        nm = (mm | mp) ^ allff
        rsel = (mm & variants[-1]) | (mp & variants[1]) | (nm & variants[0])

        # lane alignment: window lane l is col l - rx, so roll by rxl - rx
        a = px + nx + wc * wco - lst_ref[wc, cc, kv] - rx
        r0 = pltpu.roll(rsel, (wl - a % wl) % wl, 1)
        lvp = pltpu.roll(r0, wl - 1, 1)  # r0[l + 1]
        lvm = pltpu.roll(r0, 1, 1)  # r0[l - 1]
        fxf = jnp.floor(fx)
        dxo = jnp.clip(
            (jnp.trunc(qxwf + fx) - (qxwf + fxf)).astype(jnp.int32), -1, 1
        )
        return jnp.where(dxo == 1, lvp, jnp.where(dxo == -1, lvm, r0))

    def view_body(kv, _):
        t = corrected_window(kv)
        mx = mxs[:, :]
        m1, axb1 = _swar_ge(mx, t)
        mxs[:, :] = t ^ (axb1 & m1)
        mn = mns[:, :]
        m2, axb2 = _swar_ge(mn, t)
        mns[:, :] = mn ^ (axb2 & m2)
        return 0

    lax.fori_loop(0, k_views, view_body, 0)

    # ---- range, channel max (one map instead of 9 cell maps) ----
    rng = mxs[:, :] - mns[:, :]  # per-byte, borrow-free (max >= min)
    if n_ch == 1:
        chmax[s_in] = rng
    else:
        @pl.when(c == 0)
        def _():
            chmax[s_in] = rng

        @pl.when(c > 0)
        def _():
            cur = chmax[s_in]
            m, axb = _swar_ge(cur, rng)
            chmax[s_in] = rng ^ (axb & m)

    # ---- cost: 9 static slices of the range map + argmin ----
    @pl.when(c == n_ch - 1)
    def _():
        ch = chmax[s_in]
        planes = [jnp.zeros((nbp, wl), jnp.int32) for _ in range(4)]
        for syo in (-ry, 0, ry):
            o = syo + ry  # window byte offset of band row 0 for this cell
            qo, ro = divmod(o, 4)
            if ro == 0:
                pk = ch[qo : qo + nbp, :]
            else:
                pk = jax.lax.shift_right_logical(
                    ch[qo : qo + nbp, :], jnp.uint32(8 * ro)
                ) | jax.lax.shift_left(
                    ch[qo + 1 : qo + nbp + 1, :], jnp.uint32(32 - 8 * ro)
                )
            for sxo in (-rx, 0, rx):
                m = rx + sxo  # window lane offset: tap col l + sxo
                pkr = pltpu.roll(pk, (wl - m % wl) % wl, 1) if m else pk
                for i in range(4):
                    planes[i] = planes[i] + (
                        jax.lax.shift_right_logical(pkr, jnp.uint32(8 * i))
                        & ffu
                    ).astype(jnp.int32)

        @pl.when(s == 0)
        def _():
            for i in range(4):
                bestc[i] = jnp.full((nbp, wl), jnp.int32(2**30), jnp.int32)
            bestb[:, :] = jnp.zeros((nbp, wl), jnp.uint32)

        byte_s = lvl_ref[s].astype(jnp.uint32) * jnp.uint32(0x01010101)
        mupd = zero
        for i in range(4):
            better = planes[i] < bestc[i]
            bestc[i] = jnp.where(better, planes[i], bestc[i])
            mupd = mupd | jnp.where(
                better, jnp.uint32(0xFF << (8 * i)), zero
            )
        bestb[:, :] = (mupd & byte_s) | (~mupd & bestb[:, :])

        @pl.when((cc == n_cc - 1) & (s_in == sc - 1))
        def _():
            out_ref[:, :] = pltpu.bitcast(bestb[:, :], jnp.uint8)[
                :, 0:wco
            ]


def _tail_pad(slab: jnp.ndarray, hp: int, wp: int) -> jnp.ndarray:
    """[K, C, SR, SW] slab -> [K, C, HP, WP]: extend the dead DMA-overshoot
    tail below/right by edge replication (one broadcast+concat pass, like
    _edge_pad's tail; the tail rows/cols are fetched but never selected)."""
    k, c, sr, sw = slab.shape
    bot = jnp.broadcast_to(slab[:, :, sr - 1 :, :], (k, c, hp - sr, sw))
    x = jnp.concatenate([slab, bot], axis=2)
    right = jnp.broadcast_to(x[:, :, :, sw - 1 :], (k, c, hp, wp - sw))
    return jnp.concatenate([x, right], axis=3)


def slab_dims(
    h_out: int, w: int, k: int, steps: int, radius: tuple[int, int],
    span_y: int, span_x: int, px: int, py: int, exact_taps: bool = True,
) -> tuple[int, int] | None:
    """(HP, WP) of the fused kernels' padded operand for an h_out-row run
    (full frame or one row block), or None when no config fits. px/py may
    be the raw shift_pad_bound values; the kernels' effective floors are
    applied here. Gate + config come from _cfg_for, the same predicate
    supports()/supports_fast() and _run use, so planner and engine agree
    by construction."""
    rx, ry = int(radius[0]), int(radius[1])
    pxe, pye = max(int(px), rx + 1), max(int(py), ry + 1)
    h8 = _align(h_out, 8)
    cfg = _cfg_for(
        h_out, w, k, steps, radius, span_y, span_x, exact_taps=exact_taps
    )
    if cfg is None:
        return None
    tb, tbw, wl = cfg[0], cfg[1], cfg[2]
    h8e = -(-h8 // tb) * tb  # _run's band overshoot extends hp
    return (
        _align(h_out + 2 * pye, 8) + tbw + (h8e - h8),
        _align(w + 2 * pxe, 128) + wl,
    )


def slab_extra_bytes(
    rb: int, h: int, w: int, k: int, c: int, steps: int,
    radius: tuple[int, int], span_y: int, span_x: int, px: int, py: int,
    exact_taps: bool = True,
) -> int | None:
    """Host-side capacity arithmetic for the fused estimate's big buffers:
    the PEAK of one rb-row run's operand build (the full frame when
    rb >= h). The [K, C, HP, WP] padded operand is built in one
    broadcast+concat pass (_edge_pad full-frame, window_slab per row
    block); during the final column concat the row-concat intermediate
    [K, C, HP, W] coexists with the output, so the true peak is
    K*C*HP*(WP + W) -- counting only the operand once declared a plan
    "fitting" whose real build OOMs the chip (which can wedge a tunneled
    backend for hours). Row blocks build the operand DIRECTLY from the raw
    selected stack (pipeline.estimate_focus_rows -> window_slab), so
    exactly one such buffer exists per block. Returns None when the
    geometry has no fused config (the caller then plans the XLA engine)."""
    dims = slab_dims(
        min(int(rb), h), w, k, steps, radius, span_y, span_x, px, py,
        exact_taps=exact_taps,
    )
    if dims is None:
        return None
    return k * c * dims[0] * (dims[1] + w)


def window_slab(
    selected: jnp.ndarray,  # [K, C, H, W] uint8 (raw selected stack)
    r0, *, px: int, py: int, rc: int, top: int, bot: int,
    hp: int, wp: int,
) -> jnp.ndarray:
    """Rows [r0, r0+HP) x cols [-px, WP-px) of the virtual full edge pad,
    built directly from the raw stack in ONE slice + broadcast/concat pass
    -> [K, C, HP, WP] uint8, the fused kernels' slab-mode operand.

    Equals _tail_pad(pipeline._row_slab(...), hp, wp) byte for byte (the
    extension rows replicate the same clamped edge row) without ever
    materializing the intermediate XLA-shaped slab -- halves the slab-mode
    peak residency. top/bot are the block's STATIC edge-clip counts against
    the same (px, py) effective floors (api.block_list semantics); px/py
    must already be the effective floors."""
    n, c, h, w = selected.shape
    rows = rc + 2 * py - top - bot
    r0 = jnp.asarray(r0, jnp.int32)
    blk = jax.lax.dynamic_slice(
        selected, (jnp.int32(0), jnp.int32(0), r0 - (py - top), jnp.int32(0)),
        (n, c, rows, w),
    )
    topr = jnp.broadcast_to(blk[:, :, :1, :], (n, c, top, w))
    botr = jnp.broadcast_to(blk[:, :, rows - 1 :, :], (n, c, hp - top - rows, w))
    x = jnp.concatenate([topr, blk, botr], axis=2)
    left = jnp.broadcast_to(x[:, :, :, :1], (n, c, hp, px))
    right = jnp.broadcast_to(x[:, :, :, w - 1 :], (n, c, hp, wp - w - px))
    return jnp.concatenate([left, x, right], axis=3)


def slab_bytes_fn(
    h: int, w: int, k: int, c: int, steps: int,
    radius: tuple[int, int], spans: tuple[int, int], px: int, py: int,
    exact_taps: bool = True,
):
    """The `est_fused_bytes` callable capacity.plan_allfocus_render takes:
    rb -> slab_extra_bytes(rb, ...) for this geometry, or None when the
    fused estimate cannot run at all (no TPU/interpret backend) -- the
    planner then sizes the XLA sweep, and api.py withholds `spans` so the
    engine that runs is the one that was sized."""
    from .blend_pallas import is_available

    if not is_available():
        return None
    return lambda rb: slab_extra_bytes(
        rb, h, w, k, c, steps, radius, int(spans[0]), int(spans[1]),
        px, py, exact_taps=exact_taps,
    )


def _run(
    selected, sel_offsets, focus, focus_range, *,
    h_out: int, w: int, radius: tuple[int, int], steps: int,
    px: int, py: int, span_y: int, span_x: int,
    row_start, slab, coord_row0, fast: bool, pres=None,
) -> jnp.ndarray:
    """Shared host preamble + pallas_call of both fused estimate kernels.

    Full mode (slab=None): `selected` is the [K, C, H, W] stack; it is
    edge-padded with clamp semantics + the dead alignment tail, and
    `row_start` is both the coordinate and the window row origin.

    Slab mode (slab=[K, C, h_out+2py, W+2px], the same window
    pipeline._row_slab builds for the XLA row-blocked estimate -- rows
    [r0, r0+h_out+2py) of the virtual full pad): only the dead DMA tail is
    appended (top/left pads are already in the slab), the window/base math
    runs in slab-local rows (window row start 0), and `coord_row0` = r0
    feeds the kernels' GLOBAL-row truncation masks. Isomorphic to full
    mode under (h -> h_out, hp -> slab hp, rs_win -> 0), so bit-identity
    with the same rows of the full run holds by the same argument.
    """
    from .blend_xla import div_exact, no_fma

    src = selected if slab is None else slab
    k, c = src.shape[0], src.shape[1]
    rx, ry = int(radius[0]), int(radius[1])
    h8 = _align(h_out, 8)
    w128 = _align(w, 128)
    cfg = _cfg_for(
        h_out, w, k, steps, radius, span_y, span_x, exact_taps=not fast
    )
    if cfg is None:
        raise ValueError("geometry unsupported; check supports() first")
    tb, tbw, wl, cc, sc, wco = cfg
    nb = -(-h8 // tb)  # tb need not divide h8 (see _cfg_candidates)
    h8e = nb * tb  # rows [h8, h8e) compute garbage; sliced off below
    n_wc = w128 // wco

    focus = jnp.asarray(focus, jnp.float32)
    focus_range = jnp.asarray(focus_range, jnp.float32)
    step = div_exact(focus_range, jnp.float32(steps - 1))
    idx = jnp.arange(steps, dtype=jnp.float32)
    candidates = focus + no_fma(step * idx)  # [S]
    fys = candidates[:, None] * sel_offsets[None, :, 1]  # [S, K]
    fxs = candidates[:, None] * sel_offsets[None, :, 0]

    # exact map-byte encode per candidate index (same expressions as the
    # XLA tail: round_half_away(no_fma(norm * 255)))
    best_focus = focus + no_fma(step * idx)
    normalized = div_exact(best_focus - focus, focus_range)
    nv = no_fma(normalized * jnp.float32(255))
    lvl = jnp.where(nv >= 0, jnp.floor(nv + 0.5), jnp.ceil(nv - 0.5)).astype(
        jnp.int32
    )

    # clipped floors (XLA dyf/dxf, trunc_shifted_window semantics)
    nys = jnp.clip(
        jnp.floor(fys).astype(jnp.int32), -(py - ry - 1), py - ry - 1
    )
    nxs = jnp.clip(
        jnp.floor(fxs).astype(jnp.int32), -(px - rx - 1), px - rx - 1
    )

    # per-(chunk, view) aligned window starts; windows may overshoot the
    # needed rows/lanes by alignment+span slack, so the padded stack gets
    # a dead tail below/right that is fetched but never selected
    mny = nys.reshape(cc, sc, k).min(axis=1)  # [CC, K]
    mnx = nxs.reshape(cc, sc, k).min(axis=1)  # [CC, K]
    # hp carries the overshoot rows (h8e - h8) so the base8 clip bound
    # below, hp - tbw - (nb-1)*tb, reduces to the same align(.+2py,8)
    # - h8 + tb expression as the tb | h8 case -- overshoot windows read
    # deeper into the (replicated-edge) tail, never out of bounds
    if slab is None:
        h, w_in = selected.shape[2], selected.shape[3]
        hp = _align(h + 2 * py, 8) + tbw + (h8e - h8)
        wp = _align(w_in + 2 * px, 128) + wl
        rs_win = jnp.asarray(row_start, jnp.int32)
        rs_coord = rs_win
        # edge-padded stack with clamp semantics + dead alignment tail
        padded = _edge_pad(selected, px, py, hp, wp)
    else:
        hp = _align(h_out + 2 * py, 8) + tbw + (h8e - h8)
        wp = _align(w + 2 * px, 128) + wl
        rs_win = jnp.int32(0)
        rs_coord = jnp.asarray(coord_row0, jnp.int32)
        sr, sw = slab.shape[2], slab.shape[3]
        if (sr, sw) == (hp, wp):
            padded = slab  # pre-built window (window_slab)
        elif sr == h_out + 2 * py:
            # raw XLA-shaped slab (pipeline._row_slab): append the dead
            # DMA tail below/right
            padded = _tail_pad(slab, hp, wp)
        else:
            raise ValueError(
                f"slab rows must be h_out+2py={h_out + 2 * py} (raw) or "
                f"the window_slab dims ({hp}, {wp}); got ({sr}, {sw})"
            )
    base = py + rs_win + mny - (ry + 2)
    base8 = jnp.clip(base, 0, hp - tbw - (nb - 1) * tb) // 8 * 8
    lst = _lst_table(mnx, px, rx, n_wc, wco, wp, wl)
    rs2 = jnp.stack([rs_coord, rs_win])

    if pres is not None:
        # focus-pyramid refine pass: per-(band, chunk, cand-chunk) presence
        # bitmasks gate the window DMAs and candidate steps (exact kernel
        # only -- the fast tap rule has its own cheap sibling)
        if fast:
            raise ValueError("presence predication is exact-taps only")
        if pres.shape != (nb, n_wc, cc):
            raise ValueError(
                f"presence table must be [{nb}, {n_wc}, {cc}]; "
                f"got {pres.shape}"
            )
    kernel = functools.partial(
        _est_fast_kernel if fast else _est_kernel,
        tb=tb, tbw=tbw, wl=wl, sc=sc, ry=ry, rx=rx, px=px, py=py,
        wco=wco, k_views=k, n_ch=c,
        **({} if fast else {"predicated": pres is not None}),
    )
    if fast:
        rc4 = (tb + 2 * ry) // 4 + 2
        scratch = [
            pltpu.VMEM((k, tbw, wl), jnp.uint8),
            pltpu.VMEM((rc4, wl), jnp.uint32),
            pltpu.VMEM((rc4, wl), jnp.uint32),
            pltpu.VMEM((sc, rc4, wl), jnp.uint32),
            pltpu.VMEM((4, tb // 4, wl), jnp.int32),
            pltpu.VMEM((tb // 4, wl), jnp.uint32),
            pltpu.SemaphoreType.DMA((k,)),
        ]
        flops = 60 * steps * k * c * h8e * n_wc * wl // 4
    else:
        scratch = [
            pltpu.VMEM((k, tbw, wl), jnp.uint8),
            pltpu.VMEM((18, tb // 4, wl), jnp.uint32),
            pltpu.VMEM((9, sc, tb // 4, wl), jnp.uint32),
            pltpu.VMEM((4, tb // 4, wl), jnp.int32),
            pltpu.VMEM((tb // 4, wl), jnp.uint32),
            pltpu.SemaphoreType.DMA((k,)),
        ]
        flops = 300 * steps * k * c * h8e * n_wc * wl // 4
    n_smem = 8 if pres is None else 9
    operands = [
        fys.astype(jnp.float32),
        fxs.astype(jnp.float32),
        nys, nxs, base8, lst, lvl,
        rs2,
    ]
    if pres is not None:
        operands.append(pres.astype(jnp.int32))
    operands.append(padded)
    return pl.pallas_call(
        kernel,
        grid=(nb, n_wc, cc, c, sc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(
            (tb, wco), lambda b, wcg, ccg, cg, sg: (b, wcg),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((h8e, w128), jnp.uint8),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=nb * n_wc * cc * c * k * tbw * wl,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*operands)[:h8]


@functools.partial(
    jax.jit,
    static_argnames=(
        "h_out", "w", "radius", "steps", "px", "py", "span_y", "span_x",
    ),
)
def estimate_fused(
    selected: jnp.ndarray | None,  # [K, C, H, W] uint8 (None in slab mode)
    sel_offsets: jnp.ndarray,  # [K, 2] f32 (x, y)
    focus: jnp.ndarray,
    focus_range: jnp.ndarray,
    *,
    h_out: int,
    w: int,
    radius: tuple[int, int],
    steps: int,
    px: int,
    py: int,
    span_y: int,
    span_x: int,
    row_start: jnp.ndarray | int = 0,
    slab: jnp.ndarray | None = None,  # [K, C, h_out+2py, W+2px] uint8
    coord_row0: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """Fused exact-taps estimate -> [align8(h_out), W128] uint8 map.

    Bit-identical to focus.estimate_focus_map(exact_taps=True, pad=(px,py))
    on rows [row_start, row_start+h_out); callers slice [:h_out, :w].
    `span_y`/`span_x` are the static chunk_spans bounds; (px, py) the
    shift_pad_bound pads. Check supports() first.

    Slab mode (`slab` given, `selected` ignored/None, row_start must stay
    0): the estimate runs over ONE row block's pad window -- padded rows
    [r0, r0+h_out+2py) of the virtual full pad, the same window
    pipeline._row_slab builds -- with `coord_row0` = r0 feeding the global
    row coordinates; the full padded stack never materializes (see _run).
    """
    return _run(
        selected, sel_offsets, focus, focus_range,
        h_out=h_out, w=w, radius=radius, steps=steps, px=px, py=py,
        span_y=span_y, span_x=span_x, row_start=row_start,
        slab=slab, coord_row0=coord_row0, fast=False,
    )


def _coarse_params(
    radius: tuple[int, int], px: int, py: int, span_y: int, span_x: int,
    scale: int,
):
    """Static kernel parameters of the coarse (1/scale-res) estimate pass,
    derived from the full-res ones: scaled radius/pads/spans stay valid
    upper bounds (shifts scale exactly with the offsets; pads only need to
    strictly exceed shift+radius and are re-bucketed)."""
    rx_c = max(1, int(radius[0]) // scale)
    ry_c = max(1, int(radius[1]) // scale)
    rnd64 = lambda v: -(-v // 64) * 64
    rnd8 = lambda v: -(-v // 8) * 8
    px_c = rnd64(max(-(-int(px) // scale), rx_c + 2))
    py_c = rnd64(max(-(-int(py) // scale), ry_c + 2))
    sy_c = rnd8(-(-int(span_y) // scale))
    sx_c = rnd8(-(-int(span_x) // scale))
    return (rx_c, ry_c), px_c, py_c, sy_c, sx_c


def supports_pyramid(
    h: int, w: int, k: int, steps: int, radius: tuple[int, int],
    span_y: int, span_x: int, px: int, py: int, scale: int = 2,
) -> bool:
    """Whether the coarse-to-fine pyramid estimate handles this geometry:
    both the full-res refine kernel and the 1/scale-res coarse kernel must
    have fused configs (the coarse frame must still be >= 256 px wide)."""
    if scale < 2 or steps < 2:
        return False
    if not supports(h, w, k, steps, radius, span_y, span_x):
        return False
    radius_c, _, _, sy_c, sx_c = _coarse_params(
        radius, px, py, span_y, span_x, scale
    )
    hc, wc_ = -(-h // scale), -(-w // scale)
    return supports(hc, wc_, k, steps, radius_c, sy_c, sx_c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps", "sc", "nb", "tb", "n_wc", "wco", "scale", "refine",
    ),
)
def _presence_from_coarse(
    coarse: jnp.ndarray,  # [HC, WC_] uint8 (coarse map bytes)
    *,
    steps: int,
    sc: int,
    nb: int,
    tb: int,
    n_wc: int,
    wco: int,
    scale: int,
    refine: int,
) -> jnp.ndarray:
    """[NB, N_WC, CC] int32 candidate-presence bitmasks for the refine pass.

    Full-res block (band, wc) covers rows [band*tb, +tb) x cols
    [wc*wco, +wco); coarse pixel (i, j) samples full-res (scale*i,
    scale*j), so the block's coarse witnesses are the window
    [band*tb/scale - 1, ..+tb/scale + 1) x [...] (the +-1 margin covers
    pixels BETWEEN samples, whose best candidate can follow either
    neighbor). min/max step over the window, widened by +-refine, becomes
    a contiguous bit range per sc-candidate chunk. Every pixel's
    [coarse -1 .. +1 sample span +- refine] window is therefore a subset
    of its block's scanned set."""
    hc, wcc = coarse.shape
    tbc, wcoc = tb // scale, wco // scale
    # byte -> nearest candidate index (inverse of the round(s*255/(S-1))
    # encode; exact roundtrip for every s, pinned by tests)
    si = (coarse.astype(jnp.int32) * (steps - 1) * 2 + 255) // 510
    pb = nb * tbc + 1 - hc
    pr = n_wc * wcoc + 1 - wcc
    sip = jnp.pad(si, ((1, pb), (1, pr)), mode="edge")
    win = (tbc + 2, wcoc + 2)
    strides = (tbc, wcoc)
    mx = jax.lax.reduce_window(
        sip, jnp.int32(-(2**31)), jax.lax.max, win, strides, "VALID"
    )
    mn = jax.lax.reduce_window(
        sip, jnp.int32(2**31 - 1), jax.lax.min, win, strides, "VALID"
    )
    smin = jnp.clip(mn - refine, 0, steps - 1)
    smax = jnp.clip(mx + refine, 0, steps - 1)
    sidx = jnp.arange(steps, dtype=jnp.int32)
    inr = (sidx >= smin[..., None]) & (sidx <= smax[..., None])
    bits = inr.reshape(nb, n_wc, steps // sc, sc).astype(jnp.int32)
    return (bits << jnp.arange(sc, dtype=jnp.int32)).sum(
        axis=-1, dtype=jnp.int32
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "h_out", "w", "radius", "steps", "px", "py", "span_y", "span_x",
    ),
)
def _estimate_fused_pres(
    selected, sel_offsets, focus, focus_range, pres, *,
    h_out: int, w: int, radius: tuple[int, int], steps: int,
    px: int, py: int, span_y: int, span_x: int,
):
    return _run(
        selected, sel_offsets, focus, focus_range,
        h_out=h_out, w=w, radius=radius, steps=steps, px=px, py=py,
        span_y=span_y, span_x=span_x, row_start=0, slab=None,
        coord_row0=0, fast=False, pres=pres,
    )


def estimate_fused_pyramid(
    selected: jnp.ndarray,  # [K, C, H, W] uint8
    sel_offsets: jnp.ndarray,  # [K, 2] f32 (x, y)
    focus: jnp.ndarray,
    focus_range: jnp.ndarray,
    *,
    h_out: int,
    w: int,
    radius: tuple[int, int],
    steps: int,
    px: int,
    py: int,
    span_y: int,
    span_x: int,
    scale: int = 2,
    refine: int = 1,
) -> jnp.ndarray:
    """Coarse-to-fine exact-taps estimate -> [align8(h_out), W128] u8 map.

    Two fused passes: (1) the full candidate sweep at 1/scale resolution
    (subsampled stack, offsets scaled with it -- 1/scale^2 the work); (2)
    the full-res exact kernel with per-block candidate-presence bitmasks
    derived from the coarse map (window DMAs and candidate steps outside
    [block coarse min-refine, max+refine] are skipped -- whole-step
    pl.when predication, the one pattern measured to win on this kernel
    family). The refine pass's scanned set per block is a superset of
    every member pixel's own [coarse +- refine] window, and the output is
    the exact argmin over that scanned set.

    APPROXIMATE BY DESIGN: a pixel whose true global best lies outside its
    block's scanned set gets the best scanned candidate instead -- gate
    behind an explicit flag (cli --focus-pyramid) and quantify with the
    PSNR row vs the exact oracle. The reference has no such mode
    (full sweep always, src/kernels.cu:239-258). Check supports_pyramid
    first. Equals estimate_fused bit-for-bit when refine >= steps."""
    k = selected.shape[0]
    coarse_sel = selected[:, :, ::scale, ::scale]
    hc, wc_ = coarse_sel.shape[2], coarse_sel.shape[3]
    radius_c, px_c, py_c, sy_c, sx_c = _coarse_params(
        radius, px, py, span_y, span_x, scale
    )
    coarse = estimate_fused(
        coarse_sel, sel_offsets / scale, focus, focus_range,
        h_out=hc, w=wc_, radius=radius_c, steps=steps,
        px=px_c, py=py_c, span_y=sy_c, span_x=sx_c,
    )[:hc, :wc_]
    cfg = _cfg_for(h_out, w, k, steps, radius, span_y, span_x,
                   exact_taps=True)
    if cfg is None:
        raise ValueError("geometry unsupported; check supports_pyramid")
    tb, _, _, _, sc, wco = cfg
    h8 = _align(h_out, 8)
    nb = -(-h8 // tb)
    n_wc = _align(w, 128) // wco
    pres = _presence_from_coarse(
        coarse, steps=steps, sc=sc, nb=nb, tb=tb, n_wc=n_wc, wco=wco,
        scale=scale, refine=refine,
    )
    return _estimate_fused_pres(
        selected, sel_offsets, focus, focus_range, pres,
        h_out=h_out, w=w, radius=radius, steps=steps, px=px, py=py,
        span_y=span_y, span_x=span_x,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "h_out", "w", "radius", "steps", "px", "py", "span_y", "span_x",
    ),
)
def estimate_fast_fused(
    selected: jnp.ndarray | None,  # [K, C, H, W] uint8 (None in slab mode)
    sel_offsets: jnp.ndarray,  # [K, 2] f32 (x, y)
    focus: jnp.ndarray,
    focus_range: jnp.ndarray,
    *,
    h_out: int,
    w: int,
    radius: tuple[int, int],
    steps: int,
    px: int,
    py: int,
    span_y: int,
    span_x: int,
    row_start: jnp.ndarray | int = 0,
    slab: jnp.ndarray | None = None,  # [K, C, h_out+2py, W+2px] uint8
    coord_row0: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """Fused FAST-taps estimate -> [align8(h_out), W128] uint8 map.

    Bit-identical to focus.estimate_focus_map(exact_taps=False, pad=(px,py))
    on rows [row_start, row_start+h_out); callers slice [:h_out, :w]. The
    host preamble is estimate_fused's exactly (shared _run -- the fast rule
    changes only the in-kernel tap construction), including the slab mode.
    Check supports_fast() first.
    """
    return _run(
        selected, sel_offsets, focus, focus_range,
        h_out=h_out, w=w, radius=radius, steps=steps, px=px, py=py,
        span_y=span_y, span_x=span_x, row_start=row_start,
        slab=slab, coord_row0=coord_row0, fast=True,
    )
