"""Fused Pallas MXU blend kernel (the "TEN" method).

TPU-native re-design of the reference's tensor-core kernel
(Tensors::process, reference: src/kernels.cu:398-461). The CUDA version tiles
32 pixels x 16 images x 8 views onto WMMA fragments per warp; here one kernel
instance owns a [TILE_H x TILE_W] spatial tile and performs the whole
multi-view blend as MXU matmuls:

    out[v, c, th, :] = clip(rne( W[v, :] @ A[:, c*TH+th, :] ))

with A the [G, C*TILE_H, TILE_W] bf16 stage of all G clamp-shifted image
windows, filled by a double-buffered HBM->VMEM DMA pipeline (the analogue of
the CUDA kernel's shared-memory staging, src/kernels.cu:372-385).

Clamped-shift handling without gathers or in-kernel fixup: the image stack is
pre-padded by one tile of edge replication per side, so every shifted window
is a plain contiguous slice:

    padded[g, c, q_y, q_x] = img[g, c, clip(q_y - TH, 0, H-1), clip(q_x - TW, 0, W-1)]
    window start  sr = clip(tile_y*TH + dy_g + TH, 0, Hp - TH)   (same for x)

which reproduces cudaBoundaryModeClamp reads exactly for every output pixel
and any shift magnitude (starts are precomputed host-side into scalar-prefetch
tables). The padding depends only on the images, so it is built once per
light field, outside the render loop.

Precision: weights are decomposed into hi+lo bfloat16 (two MXU passes with
float32 accumulation), giving effectively-float32 weight precision -- better
than the reference's fp16 weights and fp16 accumulation (src/kernels.cu:422).
Pixels are exact in bf16 (integers <= 255).
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


# DMA pipeline depth: windows are small (tens of KB), so throughput is
# latency-bound; several in-flight copies hide it (measured flat beyond 8).
_N_BUF = 8


def default_tile(g: int, w: int, v: int = 64) -> tuple[int, int]:
    """Pick (TILE_H, TILE_W).

    Wide, short tiles minimize the number of per-image window DMAs (the
    bottleneck) while keeping the VMEM working set -- the bf16 stage
    (G*C*TH*TW*2B), the double-buffered output block (2*V*C*TH*TW), and the
    DMA ring -- within budget.
    """
    tile_h = 8
    tile_w = 2048
    budget = 12 * 1024 * 1024

    def vmem_bytes(tw):
        stage = g * 3 * tile_h * tw * 2
        out_blocks = 2 * v * 3 * tile_h * tw
        ring = _N_BUF * 3 * (tile_h + _SUB) * (tw + _LANE)
        return stage + out_blocks + ring

    while vmem_bytes(tile_w) > budget and tile_w > 128:
        tile_w //= 2
    tile_w = min(tile_w, max(128, -(-w // 128) * 128))
    return tile_h, tile_w


# HBM uint8 arrays are (8, 128)-tiled on TPU: DMA window starts must sit on
# tile boundaries. Windows are therefore fetched from the rounded-down tile
# start with (SUB, LANE) extra rows/cols, and the sub-tile residual shift is
# applied in-kernel with dynamic rotates.
_SUB = 8
_LANE = 128


def pad_images(images: jnp.ndarray, tile_h: int, tile_w: int) -> jnp.ndarray:
    """Edge-replicate pad [G, C, H, W] -> [G, C, Hp, Wp] for the kernel.

    Hp = ceil(H/TH)*TH + 2*TH + SUB (grid overrun + one clamp tile per side
    + the tile-alignment fetch overhang).
    """
    g, c, h, w = images.shape
    h_ceil = -(-h // tile_h) * tile_h
    w_ceil = -(-w // tile_w) * tile_w
    return jnp.pad(
        images,
        (
            (0, 0),
            (0, 0),
            (tile_h, tile_h + (h_ceil - h) + _SUB),
            (tile_w, tile_w + (w_ceil - w) + _LANE),
        ),
        mode="edge",
    )


def split_weights(weights: jnp.ndarray) -> jnp.ndarray:
    """[V, G] float32 -> [2, V, G] bfloat16 (hi, lo residual)."""
    hi = weights.astype(jnp.bfloat16)
    lo = (weights - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.stack([hi, lo])


def window_starts(
    focused_offsets: jnp.ndarray,  # [G, 2] int32 (dx, dy)
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    row_start: jnp.ndarray | int = 0,
    n_ti: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scalar-prefetch tables sr [n_ti, G], sc [nTj, G] of window starts.

    `row_start`/`n_ti` select the tile rows covered (sharded row blocks);
    `row_start` may be traced and need not be tile-aligned.
    """
    h_ceil = -(-h // tile_h) * tile_h
    w_ceil = -(-w // tile_w) * tile_w
    hp, wp = h_ceil + 2 * tile_h, w_ceil + 2 * tile_w
    if n_ti is None:
        n_ti = h_ceil // tile_h
    n_tj = w_ceil // tile_w
    dy = jnp.clip(focused_offsets[:, 1], -2 * h, 2 * h)
    dx = jnp.clip(focused_offsets[:, 0], -2 * w, 2 * w)
    # absolute output row of tile i is row_start + i*tile_h
    base_rows = jnp.asarray(row_start, jnp.int32) + (
        jnp.arange(n_ti, dtype=jnp.int32)[:, None] * tile_h
    )
    tj = jnp.arange(n_tj, dtype=jnp.int32)[:, None]
    # Exact starts in [0, hp-TH]; the kernel splits them into an aligned DMA
    # start (floor to the HBM tile) plus an in-kernel residual rotate.
    sr = jnp.clip(base_rows + dy[None, :] + tile_h, 0, hp - tile_h)
    sc = jnp.clip(tj * tile_w + dx[None, :] + tile_w, 0, wp - tile_w)
    return sr.astype(jnp.int32), sc.astype(jnp.int32)


def _blend_kernel(tile_h, tile_w, g_count, sr_ref, sc_ref, images_ref, w_ref,
                  out_ref, win, stage, sems):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    c = 3

    def get_dma(slot, g):
        # Align the window start down to the HBM (8,128) tile; fetch one extra
        # tile of rows/cols so the residual rotate stays in-window.
        sr_al = pl.multiple_of((sr_ref[ti, g] // _SUB) * _SUB, _SUB)
        sc_al = pl.multiple_of((sc_ref[tj, g] // _LANE) * _LANE, _LANE)
        return pltpu.make_async_copy(
            images_ref.at[
                g, :, pl.ds(sr_al, tile_h + _SUB), pl.ds(sc_al, tile_w + _LANE)
            ],
            win.at[slot],
            sems.at[slot],
        )

    # Keep at most _N_BUF-1 copies in flight: starting window g+_N_BUF would
    # target slot g%_N_BUF, racing the window being consumed this iteration.
    for g0 in range(min(_N_BUF - 1, g_count)):  # warm-up
        get_dma(g0, g0).start()

    def stage_one(g, _):
        slot = lax.rem(g, _N_BUF)

        @pl.when(g + _N_BUF - 1 < g_count)
        def _():
            nxt = g + _N_BUF - 1
            get_dma(lax.rem(nxt, _N_BUF), nxt).start()

        get_dma(slot, g).wait()
        rr = lax.rem(sr_ref[ti, g], _SUB)  # residual rows in [0, 8)
        rc = lax.rem(sc_ref[tj, g], _LANE)  # residual cols in [0, 128)
        for ch in range(c):
            # Widen u8 -> i32 first: dynamic rotates need 32-bit lanes, and
            # Mosaic has no direct u8->bf16 cast anyway (values <=255, exact).
            w2 = win[slot, ch].astype(jnp.int32)  # [TH+8, TW+128]
            w2 = pltpu.roll(w2, tile_h + _SUB - rr, axis=0)
            w2 = pltpu.roll(w2, tile_w + _LANE - rc, axis=1)
            w2 = w2[:tile_h, :tile_w]
            stage[g, ch * tile_h : (ch + 1) * tile_h, :] = (
                w2.astype(jnp.float32).astype(jnp.bfloat16)
            )
        return 0

    lax.fori_loop(0, g_count, stage_one, 0, unroll=False)

    w_hi = w_ref[0]
    w_lo = w_ref[1]
    for i in range(c * tile_h):  # static unroll: static slice + static store
        a = stage[:, i, :]  # [G, TILE_W] bf16
        acc = jnp.dot(w_hi, a, preferred_element_type=jnp.float32) + jnp.dot(
            w_lo, a, preferred_element_type=jnp.float32
        )
        # No direct f32->u8 cast in Mosaic: round-half-even, clip, via i32.
        out_ref[:, i // tile_h, i % tile_h, :] = (
            jnp.clip(jnp.round(acc), 0, 255).astype(jnp.int32).astype(jnp.uint8)
        )


@functools.partial(
    jax.jit, static_argnames=("h", "w", "tile_h", "tile_w", "row_count")
)
def render_fixed_padded(
    padded: jnp.ndarray,  # [G, C, Hp, Wp] uint8 (from pad_images)
    weights2: jnp.ndarray,  # [2, V, G] bfloat16 (from split_weights)
    focused_offsets: jnp.ndarray,  # [G, 2] int32 (dx, dy)
    *,
    h: int,
    w: int,
    tile_h: int,
    tile_w: int,
    row_start: jnp.ndarray | int = 0,
    row_count: int | None = None,
) -> jnp.ndarray:
    """Fixed-focus fused blend on a pre-padded stack -> [V, C, H, W] uint8.

    `row_start`/`row_count` (multiples of tile_h; `row_start` may be traced)
    restrict the output to a block of rows -- used by mesh-sharded rendering,
    where every shard runs this kernel on its own row block against the
    replicated padded stack.
    """
    g, c, hp, wp = padded.shape
    assert c == 3, "planar RGB expected"
    v = weights2.shape[1]
    h_out = h if row_count is None else int(row_count)
    n_ti = -(-h_out // tile_h)
    n_tj = (wp - 2 * tile_w - _LANE) // tile_w
    sr, sc = window_starts(
        focused_offsets, h, w, tile_h, tile_w,
        row_start=row_start, n_ti=n_ti,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ti, n_tj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # images stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
        ],
        out_specs=pl.BlockSpec(
            (v, c, tile_h, tile_w), lambda ti, tj, sr, sc: (0, 0, ti, tj)
        ),
        scratch_shapes=[
            # DMA ring buffer (one extra HBM tile of rows/cols per window)
            pltpu.VMEM((_N_BUF, c, tile_h + _SUB, tile_w + _LANE), jnp.uint8),
            pltpu.VMEM((g, c * tile_h, tile_w), jnp.bfloat16),  # stage A
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    kernel = functools.partial(_blend_kernel, tile_h, tile_w, g)
    flops = 2 * 2 * v * g * c * (n_ti * tile_h) * (n_tj * tile_w)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, c, h_out, w), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=g * c * (n_ti * tile_h) * (n_tj * tile_w)
            + v * c * h_out * w,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(sr, sc, padded, weights2)


def render_fixed(
    images: jnp.ndarray,  # [G, C, H, W] uint8 (unpadded)
    weights: jnp.ndarray,  # [V, G] float32
    focused_offsets: jnp.ndarray,  # [G, 2] int32
) -> jnp.ndarray:
    """Convenience wrapper: pads + splits weights per call.

    For repeated rendering, pre-pad once with pad_images() and call
    render_fixed_padded().
    """
    g, c, h, w = images.shape
    tile_h, tile_w = default_tile(g, w, v=weights.shape[0])
    padded = pad_images(images, tile_h, tile_w)
    return render_fixed_padded(
        padded,
        split_weights(weights),
        focused_offsets,
        h=h,
        w=w,
        tile_h=tile_h,
        tile_w=tile_w,
    )
