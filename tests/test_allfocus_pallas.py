"""Fused per-pixel-focus kernel (ops/allfocus_pallas) vs the XLA path.

Runs in Pallas interpret mode on CPU (see conftest). The ground truth is
blend_xla.render_allfocus_quantized, which is itself oracle-validated
(test_blend_xla, test_fuzz); the fused kernel must be bit-identical on maps
whose bytes are the estimator's quantized levels.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lfinterpolator_tpu.core import geometry
from lfinterpolator_tpu.models import pipeline
from lfinterpolator_tpu.ops import allfocus_pallas, blend_xla, focus as focus_ops


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")


def _quantized_case(rng, g, h, w, steps, focus, frange, oamp, v=8):
    images = jnp.asarray(rng.integers(0, 256, (g, 3, h, w), dtype=np.uint8))
    weights = jnp.asarray(
        (np.abs(rng.normal(size=(v, g))) / g).astype(np.float32)
    )
    offsets = jnp.asarray(rng.uniform(-oamp, oamp, (g, 2)).astype(np.float32))
    levels, f_levels = blend_xla.quantized_levels(
        jnp.float32(focus), jnp.float32(frange), steps
    )
    fmap = jnp.asarray(np.asarray(levels)[rng.integers(0, steps, (h, w))])
    return images, weights, offsets, levels, f_levels, fmap


CASES = [
    # (G, H, W, steps, focus, frange, offset_amp)
    (6, 64, 256, 8, 0.1, 0.3, 60.0),
    (4, 48, 192, 16, -0.2, 0.5, 30.0),
    (5, 96, 140, 32, 0.05, 0.2, 200.0),  # shifts beyond the image width
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"g{c[0]}_{c[1]}x{c[2]}_s{c[3]}")
def test_matches_quantized_xla(case, rng):
    g, h, w, steps, focus, frange, oamp = case
    images, weights, offsets, levels, f_levels, fmap = _quantized_case(
        rng, g, h, w, steps, focus, frange, oamp
    )
    spread = allfocus_pallas.spread_bound(offsets, focus, frange, bucket=8)
    assert allfocus_pallas.supports(h, w, spread)
    mx = max(abs(focus), abs(focus + frange)) * float(
        np.abs(np.asarray(offsets)[:, 0]).max()
    )
    my = max(abs(focus), abs(focus + frange)) * float(
        np.abs(np.asarray(offsets)[:, 1]).max()
    )
    want = np.asarray(
        blend_xla.render_allfocus_quantized(
            images, weights, offsets, fmap,
            jnp.float32(focus), jnp.float32(frange), steps=steps,
            pad=(int(np.ceil(mx)) + 8, int(np.ceil(my)) + 8),
        )
    )
    got = np.asarray(
        allfocus_pallas.render_allfocus_tiled(
            images, weights, fmap, levels,
            f_levels[:, None] * offsets[None, :, 1],
            f_levels[:, None] * offsets[None, :, 0],
            spread=spread,
            px=int(np.ceil(mx)) + 8,
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.full
def test_pipeline_ten_uses_kernel_and_matches(rng):
    """Full pipeline with spread= must equal the pipeline without it."""
    g_cols = g_rows = 4
    h, w, steps = 64, 256, 32
    focus, frange = 0.05, 0.2
    g = g_cols * g_rows
    images = jnp.asarray(rng.integers(0, 256, (g, 3, h, w), dtype=np.uint8))
    se = np.array([0.0, 0.0, 3.0, 3.0], np.float32)
    weights = jnp.asarray(
        geometry.quantize_weights_f16(
            geometry.weight_matrix(se, g_cols, g_rows, 3.0, 8)
        ).astype(np.float32)
    )
    offsets = jnp.asarray(
        geometry.compute_offsets(
            g_cols, g_rows, w, h, 1.0, geometry.trajectory_center(se)
        )
    )
    ids = jnp.asarray(
        geometry.select_focus_views(se, g_cols, g_rows, g)
    )
    radius = geometry.block_radius(w, h)
    pad = focus_ops.shift_pad_bound(offsets, focus, frange, radius, h, w)
    spread = allfocus_pallas.spread_bound(offsets, focus, frange, bucket=8)
    assert allfocus_pallas.supports(h, w, spread)
    kwargs = dict(
        method="TEN", radius=radius, filter_radius=(0, 0),
        steps=steps, pad=pad,
    )
    views_ref, maps_ref = pipeline.render_all_focus(
        images, weights, offsets, jnp.float32(focus), jnp.float32(frange),
        ids, **kwargs,
    )
    views_ker, maps_ker = pipeline.render_all_focus(
        images, weights, offsets, jnp.float32(focus), jnp.float32(frange),
        ids, spread=spread, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(maps_ker), np.asarray(maps_ref))
    np.testing.assert_array_equal(np.asarray(views_ker), np.asarray(views_ref))


@pytest.mark.full
def test_arbitrary_byte_map_256_levels_matches_xla(rng):
    """The kernel generalizes to arbitrary-byte maps via the full 256-byte
    level set (blend_xla.byte_levels) and must equal the XLA all_bytes scan
    bit-for-bit. (The pipeline keeps STD on the XLA scan -- measured faster
    for dense-byte filtered maps -- but the kernel's generality is part of
    its contract.)"""
    g, h, w = 5, 64, 256
    focus, frange = 0.1, 0.4
    images = jnp.asarray(rng.integers(0, 256, (g, 3, h, w), dtype=np.uint8))
    weights = jnp.asarray(
        (np.abs(rng.normal(size=(8, g))) / g).astype(np.float32)
    )
    offsets = jnp.asarray(rng.uniform(-50, 50, (g, 2)).astype(np.float32))
    fmap = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    levels, f_levels = blend_xla.byte_levels(
        jnp.float32(focus), jnp.float32(frange)
    )
    spread = allfocus_pallas.spread_bound(offsets, focus, frange, bucket=8)
    assert allfocus_pallas.supports(h, w, spread)
    mx = max(abs(focus), abs(focus + frange)) * float(
        np.abs(np.asarray(offsets)[:, 0]).max()
    )
    my = max(abs(focus), abs(focus + frange)) * float(
        np.abs(np.asarray(offsets)[:, 1]).max()
    )
    want = np.asarray(
        blend_xla.render_allfocus_quantized(
            images, weights, offsets, fmap,
            jnp.float32(focus), jnp.float32(frange), steps=32,
            pad=(int(np.ceil(mx)) + 8, int(np.ceil(my)) + 8), all_bytes=True,
        )
    )
    got = np.asarray(
        allfocus_pallas.render_allfocus_tiled(
            images, weights, fmap, levels,
            f_levels[:, None] * offsets[None, :, 1],
            f_levels[:, None] * offsets[None, :, 0],
            spread=spread, px=int(np.ceil(mx)) + 8,
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.full
def test_pipeline_std_ignores_spread(rng):
    """STD stays on the XLA 256-byte scan (the kernel measured slower for
    dense-byte filtered maps); spread= must be accepted and change nothing."""
    g_cols = g_rows = 4
    h, w, steps = 64, 256, 32
    focus, frange = 0.05, 0.2
    g = g_cols * g_rows
    images = jnp.asarray(rng.integers(0, 256, (g, 3, h, w), dtype=np.uint8))
    se = np.array([0.0, 0.0, 3.0, 3.0], np.float32)
    weights = jnp.asarray(
        geometry.quantize_weights_f16(
            geometry.weight_matrix(se, g_cols, g_rows, 3.0, 8)
        ).astype(np.float32)
    )
    offsets = jnp.asarray(
        geometry.compute_offsets(
            g_cols, g_rows, w, h, 1.0, geometry.trajectory_center(se)
        )
    )
    ids = jnp.asarray(geometry.select_focus_views(se, g_cols, g_rows, g))
    radius = geometry.block_radius(w, h)
    pad = focus_ops.shift_pad_bound(offsets, focus, frange, radius, h, w)
    spread = allfocus_pallas.spread_bound(offsets, focus, frange, bucket=8)
    kwargs = dict(
        method="STD", radius=radius, filter_radius=(2, 2),
        steps=steps, pad=pad,
    )
    views_ref, maps_ref = pipeline.render_all_focus(
        images, weights, offsets, jnp.float32(focus), jnp.float32(frange),
        ids, **kwargs,
    )
    views_ker, maps_ker = pipeline.render_all_focus(
        images, weights, offsets, jnp.float32(focus), jnp.float32(frange),
        ids, spread=spread, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(maps_ker), np.asarray(maps_ref))
    np.testing.assert_array_equal(np.asarray(views_ker), np.asarray(views_ref))


def test_unsupported_geometry_falls_back():
    assert not allfocus_pallas.supports(12, 256, 64)  # too short
    assert not allfocus_pallas.supports(64, 100, 64)  # w < 128
    assert not allfocus_pallas.supports(64, 256, 4096)  # spread blows VMEM


@pytest.mark.full
def test_row_blocks_match_full_frame(rng):
    """Stacking row-block renders must equal the full-frame render."""
    g, h, w, steps, focus, frange, oamp = 5, 96, 256, 16, 0.1, 0.3, 40.0
    images, weights, offsets, levels, f_levels, fmap = _quantized_case(
        rng, g, h, w, steps, focus, frange, oamp
    )
    spread = allfocus_pallas.spread_bound(offsets, focus, frange, bucket=8)
    fys = f_levels[:, None] * offsets[None, :, 1]
    fxs = f_levels[:, None] * offsets[None, :, 0]
    px = 24
    full = np.asarray(
        allfocus_pallas.render_allfocus_tiled(
            images, weights, fmap, levels, fys, fxs, spread=spread, px=px
        )
    )
    n_blocks, hb = 4, h // 4
    assert allfocus_pallas.supports(h, w, spread, row_count=hb)
    blocks = [
        np.asarray(
            allfocus_pallas.render_allfocus_tiled(
                images, weights, fmap[b * hb : (b + 1) * hb], levels,
                fys, fxs, spread=spread, px=px,
                row_start=b * hb, row_count=hb,
            )
        )
        for b in range(n_blocks)
    ]
    np.testing.assert_array_equal(np.concatenate(blocks, axis=2), full)


@pytest.mark.full
def test_sharded_pipeline_uses_kernel_and_matches(rng):
    """Mesh all-focus with spread= must equal the mesh render without it."""
    import jax
    from jax.sharding import Mesh
    from lfinterpolator_tpu.parallel import mesh as pmesh

    g_cols = g_rows = 4
    h, w, steps = 64, 256, 16
    focus, frange = 0.05, 0.2
    g = g_cols * g_rows
    images = jnp.asarray(rng.integers(0, 256, (g, 3, h, w), dtype=np.uint8))
    se = np.array([0.0, 0.0, 3.0, 3.0], np.float32)
    weights = jnp.asarray(
        geometry.quantize_weights_f16(
            geometry.weight_matrix(se, g_cols, g_rows, 3.0, 8)
        ).astype(np.float32)
    )
    offsets = jnp.asarray(
        geometry.compute_offsets(
            g_cols, g_rows, w, h, 1.0, geometry.trajectory_center(se)
        )
    )
    ids = jnp.asarray(geometry.select_focus_views(se, g_cols, g_rows, g))
    radius = geometry.block_radius(w, h)
    pad = focus_ops.shift_pad_bound(offsets, focus, frange, radius, h, w)
    spread = allfocus_pallas.spread_bound(offsets, focus, frange, bucket=8)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("view", "space"))
    assert allfocus_pallas.supports(h, w, spread, row_count=h // 2)
    kwargs = dict(
        method="TEN", radius=radius, filter_radius=(0, 0),
        steps=steps, pad=pad,
    )
    views_ref, maps_ref = pmesh.render_all_focus_sharded(
        mesh, images, weights, offsets,
        jnp.float32(focus), jnp.float32(frange), ids, **kwargs,
    )
    views_ker, maps_ker = pmesh.render_all_focus_sharded(
        mesh, images, weights, offsets,
        jnp.float32(focus), jnp.float32(frange), ids,
        spread=spread, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(maps_ker), np.asarray(maps_ref))
    np.testing.assert_array_equal(np.asarray(views_ker), np.asarray(views_ref))


@pytest.mark.full
def test_pipeline_std_fused_256_matches_xla(rng):
    """Round 5: the STD method routes the fused kernel's 256-byte-level
    mode on the FILTERED map when supported (measured 3.4-5x the XLA scan
    on dense-byte maps). spread= vs spread=None pipelines must be
    bit-identical, and the select/blend seam split must match too."""
    g_cols = g_rows = 4
    h, w, steps = 64, 256, 32
    focus, frange = 0.05, 0.2
    g = g_cols * g_rows
    images = jnp.asarray(rng.integers(0, 256, (g, 3, h, w), dtype=np.uint8))
    se = np.array([0.0, 0.0, 3.0, 3.0], np.float32)
    weights = jnp.asarray(
        geometry.quantize_weights_f16(
            geometry.weight_matrix(se, g_cols, g_rows, 3.0, 8)
        ).astype(np.float32)
    )
    offsets = jnp.asarray(
        geometry.compute_offsets(
            g_cols, g_rows, w, h, 1.0, geometry.trajectory_center(se)
        )
    )
    ids = jnp.asarray(geometry.select_focus_views(se, g_cols, g_rows, g))
    radius = geometry.block_radius(w, h)
    # nonzero filter radius: the STD path reads the FILTERED map, whose
    # bytes are arbitrary -- the whole point of the 256-level mode
    frad = (2, 2)
    pad = focus_ops.shift_pad_bound(offsets, focus, frange, radius, h, w)
    spread = allfocus_pallas.spread_bound(offsets, focus, frange, bucket=8)
    assert allfocus_pallas.supports(h, w, spread)
    kwargs = dict(
        method="STD", radius=radius, filter_radius=frad, steps=steps, pad=pad,
    )
    views_ref, maps_ref = pipeline.render_all_focus(
        images, weights, offsets, jnp.float32(focus), jnp.float32(frange),
        ids, **kwargs,
    )
    assert len(np.unique(np.asarray(maps_ref[1]))) > steps  # dense bytes
    views_ker, maps_ker = pipeline.render_all_focus(
        images, weights, offsets, jnp.float32(focus), jnp.float32(frange),
        ids, spread=spread, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(maps_ker), np.asarray(maps_ref))
    np.testing.assert_array_equal(np.asarray(views_ker), np.asarray(views_ref))
    # seam split: select (tiled x4) + blend == the fused render
    maps = maps_ker
    sel = pipeline.select_allfocus(
        images, offsets, maps, jnp.float32(focus), jnp.float32(frange),
        method="STD", steps=steps, pad=pad, spread=spread,
    )
    out = pipeline.blend_selected(sel, weights, tiled=True, h=h, w=w)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(views_ker))
