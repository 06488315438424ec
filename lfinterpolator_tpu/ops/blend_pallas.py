"""Fused Pallas MXU blend kernel (the "TEN" method).

TPU-native re-design of the reference's tensor-core kernel
(Tensors::process, reference: src/kernels.cu:398-461). The CUDA version tiles
32 pixels x 16 images x 8 views onto WMMA fragments per warp; here the blend
is factored into two bandwidth-shaped stages:

  1. **clamped shift** (pure data movement, XLA): every image is shifted by
     its per-image constant offset with cudaBoundaryModeClamp semantics
     (src/kernels.cu:119-126) via ONE dynamic_slice of an edge-padded stack
     -- the padding is built once per light field from a static shift bound,
     so per-render cost is a single aligned device copy;
  2. **flat MXU blend** (Pallas): the shifted stack is viewed as
     [G, C*H*W] and blended in one matmul per lane-chunk,

         out[v, p] = clip(rne( W[v, :] @ A[:, p] )),

     with Mosaic's automatic double-buffered HBM->VMEM pipeline over chunks.

Why flat: pixel tiles shaped [G, TH, TW] force sublane-strided row reads for
the per-row matmuls (measured 3.4x slower); the [G, chunk] view keeps every
VPU/MXU access contiguous and the kernel runs near the chip's effective copy
bandwidth (~668 GB/s measured on v5e, 82% of the 819 GB/s spec -- see
BASELINE.md; an earlier "343 GB/s" figure was a relay round-trip artifact),
i.e. it is HBM-bound, not compute-bound.

Precision: pixels are exact in f32; weights stay f32 and the MXU contraction
accumulates in f32 (preferred_element_type) -- at worst 1 LSB from the
reference STD kernel's float accumulation (src/kernels.cu:292-310) due to
accumulation order, and strictly better than the reference tensor path's
fp16 accumulators (src/kernels.cu:422).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def is_available() -> bool:
    """True when the Pallas TPU path should be used."""
    if os.environ.get("LFI_PALLAS_INTERPRET", "") == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _interpret() -> bool:
    return os.environ.get("LFI_PALLAS_INTERPRET", "") == "1"


def _align(x: int, m: int) -> int:
    return -(-x // m) * m


def shift_bound(
    offsets, focus: float | tuple[float, float], h: int, w: int,
    bucket: int = 128,
) -> tuple[int, int]:
    """Static (px, py) pad bound covering every focused shift.

    `focus` is a value or (min, max) interval; bounds are computed host-side
    from concrete offsets, bucketed so nearby focus values share one compiled
    program, and capped at (w, h) -- a shift beyond the image size clamps
    every read to the border, so larger bounds change nothing (clip
    semantics in preshift match).
    """
    import numpy as np  # host-side only

    offsets = np.asarray(offsets)
    if np.ndim(focus) == 0:
        focus = (float(focus), float(focus))
    mx = max(abs(f) * float(np.abs(offsets[:, 0]).max()) for f in focus)
    my = max(abs(f) * float(np.abs(offsets[:, 1]).max()) for f in focus)
    rnd = lambda v: max(bucket, _align(int(np.ceil(v)) + 1, bucket))
    return min(rnd(mx), w), min(rnd(my), h)


def pad_images(images: jnp.ndarray, px: int, py: int) -> jnp.ndarray:
    """Edge-replicate pad [G, C, H, W] -> [G, C, H+2py+48, W+2px+256].

    The (px, py) sides encode the clamp for shifts up to the bound; the
    extra bottom/right tail covers the alignment overhang of the shifted
    window (rows to 8, lanes to 128) PLUS the tile-aligned DMA window of
    the Pallas padded-shift kernel (floor8/floor128 starts and a
    sublane-aligned align32(tb+8)-row window). Built once per light field
    (per frame when streaming). Implemented as explicit broadcast+concat:
    bit-identical to jnp.pad(mode="edge") but ~2x faster on TPU, where XLA
    lowers edge padding through a slow gather-style fill.
    """
    g, c, h, w = images.shape
    top = jnp.broadcast_to(images[:, :, :1, :], (g, c, py, w))
    bot = jnp.broadcast_to(images[:, :, h - 1 :, :], (g, c, py + 48, w))
    x = jnp.concatenate([top, images, bot], axis=2)
    hp = h + 2 * py + 48
    left = jnp.broadcast_to(x[:, :, :, :1], (g, c, hp, px))
    right = jnp.broadcast_to(x[:, :, :, w - 1 : w], (g, c, hp, px + 256))
    return jnp.concatenate([left, x, right], axis=3)


def _auto_chunk(l: int, g: int = 64, v: int = 64) -> int:
    """Largest 128-multiple divisor of `l` fitting the VMEM budget.

    Big chunks amortize the per-step pipeline overhead; the working set per
    lane is roughly 2g (double-buffered u8 in) + 8g (i32/f32 widened A)
    + 2v (double-buffered u8 out) + 4v (f32 accumulator) bytes, against a
    ~12 MB scoped-VMEM budget (16 MB minus headroom).
    """
    # Calibrated against Mosaic's scoped-vmem accounting: the v=512 OOM
    # reported 16.88 MB at chunk 15360 ~= 2*(g+v)*chunk + ~0.25 KB/lane of
    # accumulator tiles (Mosaic N-tiles the dot internally).
    per_lane = 2 * (g + v) + 256
    target = max(512, min(16384, (14 * 1024 * 1024) // per_lane // 128 * 128))
    for size in range(min(target, l) // 128 * 128, 127, -128):
        if l % size == 0:
            return size
    return l  # l < 128 (tiny images): single chunk


def preshift_flat(
    padded: jnp.ndarray,  # [G, C, Hp, Wp] uint8 (from pad_images)
    focused_offsets: jnp.ndarray,  # [G, 2] int32 (dx, dy), traced
    *,
    px: int,
    py: int,
    h: int,
    w: int,
    row_start: jnp.ndarray | int = 0,
    row_count: int | None = None,
) -> jnp.ndarray:
    """Clamp-shift every image -> flat [G, C*h_al*w_al] uint8.

    out[g, c, y, x] = img[g, c, clip(row_start+y+dy_g, 0, h-1),
                          clip(x+dx_g, 0, w-1)]
    for y < row_count, x < w (trailing alignment rows/cols hold edge filler).
    Exact for |dy|<=py, |dx|<=px; shifts are clipped to (+-py, +-px), which
    preserves semantics because the bound is >= max |shift| by construction
    (shift_bound), and any shift >= image size saturates the clamp anyway.
    """
    g, c = padded.shape[:2]
    if row_count is None:
        row_count = h
    h_al = _align(int(row_count), 8)
    w_al = _align(w, 128)
    row_start = jnp.asarray(row_start, jnp.int32)

    def one(img, o):
        dy = jnp.clip(o[1], -py, py).astype(jnp.int32)
        dx = jnp.clip(o[0], -px, px).astype(jnp.int32)
        return lax.dynamic_slice(
            img, (jnp.int32(0), py + dy + row_start, px + dx), (c, h_al, w_al)
        )

    return jax.vmap(one)(padded, focused_offsets).reshape(g, c * h_al * w_al)


def _blend_kernel(x_ref, w_ref, out_ref):
    # One MXU contraction per chunk: [V, G] @ [G, chunk] with f32
    # accumulation; round-half-even + clip to u8 matches __float2int_rn
    # (src/kernels.cu:301-310).
    a = x_ref[:, :].astype(jnp.int32).astype(jnp.float32)
    acc = jnp.dot(w_ref[:, :], a, preferred_element_type=jnp.float32)
    out_ref[:, :] = (
        jnp.clip(jnp.round(acc), 0, 255).astype(jnp.int32).astype(jnp.uint8)
    )


@jax.jit
def blend_flat(
    flat: jnp.ndarray,  # [G, L] uint8, L a multiple of 128 (lane-aligned)
    weights: jnp.ndarray,  # [V, G] float32
) -> jnp.ndarray:
    """Flat multi-view blend -> [V, L] uint8 (the MXU hot loop)."""
    g, l = flat.shape
    v = weights.shape[0]
    chunk = _auto_chunk(l, g, v)
    return pl.pallas_call(
        _blend_kernel,
        grid=(l // chunk,),
        in_specs=[
            pl.BlockSpec((g, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((v, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (v, chunk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((v, l), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * v * g * l,
            bytes_accessed=(g + v) * l,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(flat, weights)


def _pick_wchunk(w128: int, g: int, v: int) -> int:
    """Largest 128-multiple divisor of w128 fitting the tiled blend's VMEM
    working set: double-buffered 8-row u8 in/out blocks per image/view plus
    ~4 packed-f32 temporaries of the wider side."""
    per_lane = 8 * (2 * g + 2 * v + 4 * max(g, v))
    cap = max(128, (10 * 1024 * 1024) // per_lane // 128 * 128)
    for size in range(min(cap, w128) // 128 * 128, 127, -128):
        if w128 % size == 0:
            return size
    return w128  # w128 < 128 never occurs (inputs are lane-aligned)


def _blend_tiled_kernel(w2_ref, x_ref, out_ref):
    # Blend an 8-row band of every image in the SUBLANE-PACKED u32 view of
    # the shift kernels' native [G, C, H8, W128] tiling: bitcast packs 4
    # consecutive rows per lane, so the band is [G*2, wchunk] u32 and ONE
    # [V*2, G*2] matmul per byte plane blends all 8 rows. The weight operand
    # is kron(W, I_2), which preserves packed-row parity (see blend_tiled).
    # No strided ops, no relayout on either side.
    g = x_ref.shape[0]
    v = out_ref.shape[0]
    wchunk = x_ref.shape[3]
    x = x_ref[:, 0, :, :].reshape(g * 8, wchunk)
    p = pltpu.bitcast(x, jnp.uint32)  # [G*2, wchunk]
    w2 = w2_ref[:, :]  # [V*2, G*2] = kron(W, I_2)
    ff = jnp.uint32(0xFF)
    parts = []
    for b in range(4):
        byte = jax.lax.shift_right_logical(p, jnp.uint32(8 * b)) & ff
        a = byte.astype(jnp.int32).astype(jnp.float32)
        acc = jnp.dot(w2, a, preferred_element_type=jnp.float32)
        q = (
            jnp.clip(jnp.round(acc), 0, 255)
            .astype(jnp.int32)
            .astype(jnp.uint32)
        )
        parts.append(jax.lax.shift_left(q, jnp.uint32(8 * b)))
    word = (parts[0] | parts[1]) | (parts[2] | parts[3])  # [V*2, wchunk]
    out_ref[:, 0, :, :] = pltpu.bitcast(word, jnp.uint8).reshape(v, 8, wchunk)


@jax.jit
def blend_tiled(
    x4: jnp.ndarray,  # [G, C, H8, W128] uint8 (a shift kernel's output)
    weights: jnp.ndarray,  # [V, G] float32
) -> jnp.ndarray:
    """Multi-view blend straight on the 4D tiling -> [V, C, H8, W128] u8.

    Reads the shift kernels' native [G, C, H8, W128] output tiling and
    writes the blended views in the SAME tiling, so the structural XLA
    relayout copies on both sides of the flat blend (~1.2 ms at 1080p,
    ~4.8 ms at 4K: the flat [G, L] tiling packs 8 images per sublane tile,
    the 4D tiling packs image rows, and Mosaic cannot store one layout from
    a kernel reading the other) fold away entirely. Measured 6.68 -> 4.10
    ms end-to-end per 1080p/64-view frame vs the flat route on v5e.

    Numerics: same u8 x f32 -> round-half-even class as blend_flat
    (reference: src/kernels.cu:301-310). The kron(W, I_2) contraction adds
    only zero-product operand slots (exact +0.0 adds), but the doubled
    contraction width can still reassociate the f32 sum (XLA blocks dots
    by K), so outputs sit within the documented <=1 LSB accumulation-order
    class of blend_flat rather than bit-equal in general -- measured 13 of
    398M bytes off by 1 on v5e at the headline config, and the all-focus
    fuzz configs diverge by 1 LSB even in interpret mode. Callers that
    must match an XLA-path render bit-for-bit route BOTH contractions
    through this kernel (see blend_xla.blend_fast).
    """
    g, c, h8, w128 = x4.shape
    v = weights.shape[0]
    w2 = jnp.kron(weights, jnp.eye(2, dtype=weights.dtype))
    wchunk = _pick_wchunk(w128, g, v)
    return pl.pallas_call(
        _blend_tiled_kernel,
        grid=(c, h8 // 8, w128 // wchunk),
        in_specs=[
            pl.BlockSpec(
                (2 * v, 2 * g), lambda ci, bi, li: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g, 1, 8, wchunk), lambda ci, bi, li: (0, ci, bi, li),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (v, 1, 8, wchunk), lambda ci, bi, li: (0, ci, bi, li),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((v, c, h8, w128), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=4 * v * g * c * h8 * w128,  # 2x the flat blend: MXU fill
            bytes_accessed=(g + v) * c * h8 * w128,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(w2, x4)


def _quilt_fits_vmem(w128: int, g: int, n: int) -> bool:
    """Per-band VMEM working set of the quilt blend: double-buffered u8
    image band + double-buffered u8 canvas band + f32 extraction/accum
    temporaries + the packed result word."""
    per_lane = 16 * g + 16 * n + 8 * (2 * g) + 8 * (2 * n) + 128
    return per_lane * w128 <= 12 * 1024 * 1024


def _blend_quilt_kernel(w2_ref, x_ref, out_ref, *, cols, rows):
    # Blend DIRECTLY into the quilt canvas: same single [2n, 2G] x
    # [2G, W] matmul per byte plane as _blend_tiled_kernel (one stream of
    # the band through the MXU for ALL views -- a per-view-matmul variant
    # measured 12.2 ms vs 4.25 two-stage at the c4 config: 45x re-streams),
    # then 45 static sub-stores place each view's packed [2, W] u32 rows at
    # its tile position in the [1, rows, 8, cols*W] canvas band block. The
    # canvas is laid out [C, rows, H8, cols*W] so one block spans every
    # quilt row of a band; the final [C, rows*H8, cols*W] reshape merges
    # two adjacent row-major dims at an 8-row boundary (free, no relayout).
    g = x_ref.shape[0]
    wq = x_ref.shape[3]  # full tile width (w128 -- no lane chunking:
    #                      tile seams must land at block column offsets)
    x = x_ref[:, 0, :, :].reshape(g * 8, wq)
    p = pltpu.bitcast(x, jnp.uint32)  # [2G, wq]
    w2 = w2_ref[:, :]  # [2n, 2G] = kron(W[:n], I_2)
    ff = jnp.uint32(0xFF)
    parts = []
    for b in range(4):
        byte = jax.lax.shift_right_logical(p, jnp.uint32(8 * b)) & ff
        a = byte.astype(jnp.int32).astype(jnp.float32)
        acc = jnp.dot(w2, a, preferred_element_type=jnp.float32)
        q = (
            jnp.clip(jnp.round(acc), 0, 255)
            .astype(jnp.int32)
            .astype(jnp.uint32)
        )
        parts.append(jax.lax.shift_left(q, jnp.uint32(8 * b)))
    word = (parts[0] | parts[1]) | (parts[2] | parts[3])  # [2n, wq]
    for r in range(rows):
        for cl in range(cols):
            v2 = 2 * (r * cols + cl)
            out_ref[0, r, :, cl * wq : (cl + 1) * wq] = pltpu.bitcast(
                word[v2 : v2 + 2], jnp.uint8
            )


def supports_quilt(
    h: int, w: int, g: int, cols: int = 5, rows: int = 9
) -> bool:
    """Whether blend_quilt handles this geometry: tiles must butt exactly
    (no 8/128 alignment padding inside the canvas) and the per-band
    working set must fit VMEM."""
    return (
        is_available()
        and h % 8 == 0
        and w % 128 == 0
        and w >= 128
        and 2 * cols * rows <= 512  # packed weight rows stay one matmul
        and _quilt_fits_vmem(_align(w, 128), g, cols * rows)
    )


@functools.partial(jax.jit, static_argnames=("cols", "rows"))
def blend_quilt(
    x4: jnp.ndarray,  # [G, C, H8, W128] uint8 (a shift kernel's output)
    weights: jnp.ndarray,  # [V, G] float32, V >= cols*rows
    *,
    cols: int = 5,
    rows: int = 9,
) -> jnp.ndarray:
    """Blend + quilt assembly in ONE kernel -> [C, rows*H8, cols*W128] u8.

    The quilt pipeline used to be blend_tiled (all 64 views, 2x H8*W128*C*V
    bytes of HBM traffic) followed by a separate canvas copy (2x more for
    45 of them); for a quilt-only render that is ~2.2x the traffic actually
    needed. Here each view's blended band is written straight to its canvas
    position (tile order = montage order: row-major, top-left first, view
    i -> tile i), so the canvas is produced for (G + cols*rows) * C*H8*W128
    bytes total and the intermediate [V, C, H8, W128] stack never exists.

    Requires exact tile alignment (h % 8 == 0, w % 128 == 0, e.g. the
    reference's 1080x1920 tiles -- scripts/viewsToQuilt.sh:2); gate with
    supports_quilt. Numerics: same class as blend_tiled (<= 1 LSB from the
    XLA oracle; bit-equal to blend_tiled per view in interpret mode)."""
    g, c, h8, w128 = x4.shape
    n = cols * rows
    v = weights.shape[0]
    if v < n:
        raise ValueError(f"Quilt needs {n} views, got {v}")
    if not _quilt_fits_vmem(w128, g, n):
        raise ValueError("geometry unsupported; check supports_quilt first")
    w2 = jnp.kron(weights[:n], jnp.eye(2, dtype=weights.dtype))  # [2n, 2G]
    nb = h8 // 8
    out = pl.pallas_call(
        functools.partial(_blend_quilt_kernel, cols=cols, rows=rows),
        grid=(c, nb),
        in_specs=[
            pl.BlockSpec(
                (2 * n, 2 * g), lambda ci, bi: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g, 1, 8, w128), lambda ci, bi: (0, ci, bi, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, 8, cols * w128), lambda ci, bi: (ci, 0, bi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (c, rows, h8, cols * w128), jnp.uint8
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * g * c * h8 * w128,
            bytes_accessed=(g + n) * c * h8 * w128,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(w2, x4)
    return out.reshape(c, rows * h8, cols * w128)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "px", "py", "row_count")
)
def render_fixed_padded(
    padded: jnp.ndarray,  # [G, C, Hp, Wp] uint8 (from pad_images)
    weights: jnp.ndarray,  # [V, G] float32
    focused_offsets: jnp.ndarray,  # [G, 2] int32 (dx, dy)
    *,
    h: int,
    w: int,
    px: int,
    py: int,
    row_start: jnp.ndarray | int = 0,
    row_count: int | None = None,
) -> jnp.ndarray:
    """Fixed-focus fused blend on a pre-padded stack -> [V, C, H, W] uint8.

    `row_start`/`row_count` restrict the output to a block of rows (used by
    mesh-sharded rendering; `row_start` may be traced).
    """
    g, c = padded.shape[:2]
    v = weights.shape[0]
    h_out = h if row_count is None else int(row_count)
    h_al = _align(h_out, 8)
    w_al = _align(w, 128)
    from . import shift_pallas

    if is_available() and shift_pallas.supports_padded(h, w, row_count=h_out):
        # borderless Pallas shift (2.19 ms vs the XLA unaligned
        # dynamic-slice's ~2.75 at the headline config) feeding the
        # same-tiling blend_tiled -- no structural relayout copy on either
        # side (6.68 -> 4.10 ms/frame measured end-to-end at 1080p/64v)
        x4 = shift_pallas.shift_padded_4d(
            padded, focused_offsets, px=px, py=py, h=h, w=w,
            row_start=row_start, row_count=h_out,
        )
        out = blend_tiled(x4, weights)
    else:
        flat = preshift_flat(
            padded, focused_offsets, px=px, py=py, h=h, w=w,
            row_start=row_start, row_count=h_out,
        )
        out = blend_flat(flat, weights).reshape(v, c, h_al, w_al)
    if (h_al, w_al) != (h_out, w):
        out = out[:, :, :h_out, :w]
    return out


@functools.partial(jax.jit, static_argnames=("h", "w"))
def blend_tiled_cropped(
    x4: jnp.ndarray,  # [G, C, H8, W128] uint8 (a shift kernel's output)
    weights: jnp.ndarray,  # [Vb, G] float32
    *,
    h: int,
    w: int,
) -> jnp.ndarray:
    """blend_tiled + on-device crop to [Vb, C, h, w].

    Used by the view-batched render path (api.py): the shifted stack is
    built once, then each weight-row batch blends and drains to the host
    while the next renders, so outputs larger than HBM never materialize.
    """
    out = blend_tiled(x4, weights)
    if out.shape[2:] != (h, w):
        out = out[:, :, :h, :w]
    return out


def render_fixed(
    images: jnp.ndarray,  # [G, C, H, W] uint8 (unpadded)
    weights: jnp.ndarray,  # [V, G] float32
    focused_offsets: jnp.ndarray,  # [G, 2] int32
) -> jnp.ndarray:
    """Jittable convenience wrapper (traced offsets, no static shift bound).

    Uses the general concat-based clamp shift, so it works for arbitrary
    traced shifts inside an outer jit; repeated rendering should pre-pad
    once with pad_images()/shift_bound() and call render_fixed_padded().
    """
    from . import blend_xla

    g, c, h, w = images.shape
    h_al, w_al = _align(h, 8), _align(w, 128)
    shifted = blend_xla.shift_stack(images, focused_offsets)
    if (h_al, w_al) != (h, w):
        shifted = jnp.pad(
            shifted, ((0, 0), (0, 0), (0, h_al - h), (0, w_al - w)), mode="edge"
        )
    out = blend_flat(
        shifted.reshape(g, c * h_al * w_al), weights
    ).reshape(weights.shape[0], c, h_al, w_al)
    if (h_al, w_al) != (h, w):
        out = out[:, :, :h, :w]
    return out
