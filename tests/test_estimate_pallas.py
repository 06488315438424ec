"""Fused SWAR focus-estimate kernels vs the XLA sweeps (interpret mode).

Both kernels are documented bit-identical to their XLA paths
(focus.estimate_focus_map with exact_taps=True / False, pad=...); these
tests assert exact equality across geometries, focus signs, odd view
counts, odd radii, lane-chunked grids and sharded row blocks. Chip-scale
validation + timing live in the PARITY notes (exact: 257.2 ms vs 482.6
XLA; fast: 97.4 vs 146.5, at 8x8/1080p/K=32/steps=32).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lfinterpolator_tpu.core import geometry
from lfinterpolator_tpu.ops import estimate_pallas as ep
from lfinterpolator_tpu.ops import focus as focus_ops


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")


def _setup(rng, cols, rows, h, w, K, focus, frange, radius, aspect=1.3):
    se = np.array([0, 0, cols - 1.0, rows - 1.0], np.float32)
    offsets = geometry.compute_offsets(
        cols, rows, w, h, aspect, geometry.trajectory_center(se)
    )
    ids = np.asarray(geometry.select_focus_views(se, cols, rows, K))
    pad = focus_ops.shift_pad_bound(offsets, focus, frange, radius, h, w)
    sel_img = jnp.asarray(rng.integers(0, 256, (K, 3, h, w), dtype=np.uint8))
    sel_off = jnp.asarray(offsets)[jnp.asarray(ids)]
    return offsets, pad, sel_img, sel_off


def _compare(rng, cols, rows, h, w, K, steps, focus, frange, radius,
             row=None):
    offsets, pad, sel_img, sel_off = _setup(
        rng, cols, rows, h, w, K, focus, frange, radius
    )
    spans = ep.chunk_spans(offsets, focus, frange, steps, 4)
    rs, rc = (0, h) if row is None else row
    assert ep.supports(rc, w, K, steps, radius, spans[0], spans[1])
    want = focus_ops.estimate_focus_map(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange), radius,
        steps=steps, pad=pad, exact_taps=True, row_start=rs, row_count=rc,
    )
    got = ep.estimate_fused(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
        h_out=rc, w=w, radius=radius, steps=steps,
        px=pad[0], py=pad[1], span_y=spans[0], span_x=spans[1],
        row_start=rs,
    )[:rc, :w]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_estimate_base(rng):
    _compare(rng, 4, 4, 64, 384, 8, 8, 0.1, 0.4, (4, 2))


def test_fused_estimate_negative_focus(rng):
    _compare(rng, 4, 4, 64, 384, 8, 8, -0.3, 0.5, (4, 2))


@pytest.mark.full
def test_fused_estimate_odd_view_count(rng):
    _compare(rng, 4, 4, 64, 384, 7, 8, 0.1, 0.4, (4, 2))


@pytest.mark.full
def test_fused_estimate_big_radius(rng):
    _compare(rng, 4, 4, 96, 512, 8, 16, 0.0, 0.6, (10, 6))


@pytest.mark.full
def test_fused_estimate_row_block(rng):
    _compare(rng, 4, 4, 64, 384, 8, 8, 0.1, 0.4, (4, 2), row=(24, 32))


@pytest.mark.full
def test_fused_estimate_unaligned_sizes(rng):
    _compare(rng, 4, 4, 52, 300, 8, 8, 0.1, 0.4, (4, 2))


def _assert_overshoot_cfg(rng, h, exact):
    """Guard that h really picks a band height NOT dividing h8, so the
    overshoot-row slicing in _run is exercised (not just the tb | h8
    fast path)."""
    offsets, pad, _, _ = _setup(rng, 4, 4, h, 384, 8, 0.1, 0.4, (4, 2))
    spans = ep.chunk_spans(offsets, 0.1, 0.4, 8, 4)
    pick = ep._pick_cfg if exact else ep._pick_cfg_fast
    h8 = -(-h // 8) * 8
    # supports()/slab_dims pass (ry, rx) = (radius[1], radius[0]); the
    # fixture radius is (4, 2), so ry=2, rx=4 here.
    cfg = pick(h8, 384, 8, 8, 2, 4, spans[0], spans[1])
    assert cfg is not None and h8 % cfg[0], (h8, cfg)


@pytest.mark.full
def test_fused_estimate_overshoot_bands(rng):
    # 136 = 8*17: every large tb overshoots; the picker accepts <= h8/8
    # waste rows and _run slices them off (see _cfg_candidates)
    _assert_overshoot_cfg(rng, 136, exact=True)
    _compare(rng, 4, 4, 136, 384, 8, 8, 0.1, 0.4, (4, 2))


def test_support_gate_and_planner_agree():
    """The runtime gates (supports/supports_fast) and the capacity
    planner's sizing (slab_dims) must agree on availability for every
    geometry -- all three derive from _cfg_for, and this pins the contract
    across a sweep of supported, sub-minimum, and awkward shapes so a
    future edit can't silently desynchronize the plan from the engine
    that runs (round-3 advisor finding)."""
    sweep = [
        # (h, w, k, steps, radius, span_y, span_x)
        (64, 384, 8, 8, (4, 2), 8, 8),
        (136, 384, 8, 8, (4, 2), 8, 8),      # overshoot bands
        (52, 300, 8, 8, (4, 2), 8, 8),       # unaligned
        (1080, 1920, 32, 32, (20, 11), 16, 48),  # 1080p-scale
        (2160, 3840, 32, 32, (39, 22), 32, 96),  # 4K-scale (lane-chunked)
        (64, 200, 8, 8, (4, 2), 8, 8),       # w < 256: unsupported
        (4, 384, 8, 8, (4, 2), 8, 8),        # supported (h8 == 8)
        (64, 384, 0, 8, (4, 2), 8, 8),       # k < 1: unsupported
        (64, 384, 8, 1, (4, 2), 8, 8),       # steps < 2: unsupported
        (64, 384, 8, 8, (4, 2), 4096, 8),    # span blows VMEM
    ]
    for h, w, k, steps, radius, sy, sx in sweep:
        for exact in (True, False):
            gate = (ep.supports if exact else ep.supports_fast)(
                h, w, k, steps, radius, sy, sx
            )
            dims = ep.slab_dims(
                h, w, k, steps, radius, sy, sx, px=1, py=1,
                exact_taps=exact,
            )
            assert (dims is not None) == gate, (
                h, w, k, steps, radius, sy, sx, exact, gate, dims
            )


def _structured_selected(rng, h, w, K, sel_off, frange, steps):
    """Multi-plane stack with real disparity signal: three depth bands whose
    per-view shifts equal candidate focus values, so the coarse map has
    coherent structure and the presence tables actually prune."""
    m = 64
    tex = rng.integers(0, 256, (3, h + 2 * m, w + 2 * m), dtype=np.uint8)
    t = tex.astype(np.float32)
    t = (t + np.roll(t, 1, 1) + np.roll(t, 2, 2)) / 2
    tex = t.astype(np.uint8)
    step = frange / (steps - 1)
    planes = (0.0, step * (steps // 2), step * (steps - 1))
    band = h // 3
    off = np.asarray(sel_off)
    out = np.empty((K, 3, h, w), np.uint8)
    for k in range(K):
        y0 = 0
        for f, hb in zip(planes, (band, band, h - 2 * band)):
            dx = int(round(-f * off[k, 0])) + m
            dy = int(round(-f * off[k, 1])) + m
            out[k, :, y0 : y0 + hb] = tex[:, dy + y0 : dy + y0 + hb, dx : dx + w]
            y0 += hb
    return jnp.asarray(out)


def _pyramid_setup(rng, h=96, w=512, K=8, steps=8, focus=0.0, frange=0.21):
    cols = rows = 4
    radius = (4, 2)
    se = np.array([0, 0, cols - 1.0, rows - 1.0], np.float32)
    offsets = geometry.compute_offsets(
        cols, rows, w, h, 1.3, geometry.trajectory_center(se)
    )
    ids = np.asarray(geometry.select_focus_views(se, cols, rows, K))
    sel_off = np.asarray(offsets)[ids]
    sel_img = _structured_selected(rng, h, w, K, sel_off, frange, steps)
    pad = focus_ops.shift_pad_bound(offsets, focus, frange, radius, h, w)
    spans = ep.chunk_spans(offsets, focus, frange, steps, 4)
    pxe = max(pad[0], radius[0] + 1)
    pye = max(pad[1], radius[1] + 1)
    return (sel_img, jnp.asarray(sel_off), radius, pxe, pye, spans,
            focus, frange, steps, h, w, K)


@pytest.mark.full
def test_pyramid_full_refine_equals_exact(rng):
    """refine >= steps makes every candidate present -> the pyramid refine
    pass must equal the plain exact fused sweep bit for bit (the
    predication machinery adds nothing when nothing is skipped)."""
    (sel_img, sel_off, radius, pxe, pye, spans,
     focus, frange, steps, h, w, K) = _pyramid_setup(rng)
    assert ep.supports_pyramid(
        h, w, K, steps, radius, spans[0], spans[1], pxe, pye
    )
    kw = dict(h_out=h, w=w, radius=radius, steps=steps, px=pxe, py=pye,
              span_y=spans[0], span_x=spans[1])
    exact = ep.estimate_fused(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange), **kw
    )[:h, :w]
    pyr = ep.estimate_fused_pyramid(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
        scale=2, refine=steps, **kw
    )[:h, :w]
    np.testing.assert_array_equal(np.asarray(pyr), np.asarray(exact))


def test_pyramid_matches_masked_xla_oracle(rng):
    """The presence-predicated refine pass equals the XLA sweep restricted
    to the same per-block candidate sets, bit for bit -- on a structured
    scene where the presence tables genuinely prune (asserted)."""
    (sel_img, sel_off, radius, pxe, pye, spans,
     focus, frange, steps, h, w, K) = _pyramid_setup(rng)
    kw = dict(h_out=h, w=w, radius=radius, steps=steps, px=pxe, py=pye,
              span_y=spans[0], span_x=spans[1])
    pyr = ep.estimate_fused_pyramid(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
        scale=2, refine=1, **kw
    )[:h, :w]

    # rebuild the same presence table the pyramid used
    coarse = ep.estimate_fused(
        sel_img[:, :, ::2, ::2], sel_off / 2, jnp.float32(focus),
        jnp.float32(frange),
        h_out=-(-h // 2), w=-(-w // 2),
        radius=ep._coarse_params(radius, pxe, pye, *spans, 2)[0],
        steps=steps,
        px=ep._coarse_params(radius, pxe, pye, *spans, 2)[1],
        py=ep._coarse_params(radius, pxe, pye, *spans, 2)[2],
        span_y=ep._coarse_params(radius, pxe, pye, *spans, 2)[3],
        span_x=ep._coarse_params(radius, pxe, pye, *spans, 2)[4],
    )[: -(-h // 2), : -(-w // 2)]
    cfg = ep._cfg_for(h, w, K, steps, radius, spans[0], spans[1])
    tb, sc, wco = cfg[0], cfg[4], cfg[5]
    h8 = -(-h // 8) * 8
    nb, n_wc = -(-h8 // tb), (-(-w // 128) * 128) // wco
    pres = np.asarray(ep._presence_from_coarse(
        coarse, steps=steps, sc=sc, nb=nb, tb=tb, n_wc=n_wc, wco=wco,
        scale=2, refine=1,
    ))
    # expand bitmasks to a per-pixel [S, h, w] mask for the XLA oracle
    bits = (
        pres[:, :, :, None] >> np.arange(sc)[None, None, None, :]
    ) & 1  # [NB, WC, CC, sc]
    present_blocks = bits.reshape(nb, n_wc, steps).astype(bool)
    full = np.zeros((steps, nb * tb, n_wc * wco), bool)
    for b in range(nb):
        for wc in range(n_wc):
            full[:, b * tb : (b + 1) * tb, wc * wco : (wc + 1) * wco] = (
                present_blocks[b, wc][:, None, None]
            )
    present = jnp.asarray(full[:, :h, :w])
    assert not bool(present.all()), "scene must actually prune candidates"

    want = focus_ops.estimate_focus_map(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange), radius,
        steps=steps, pad=(pxe, pye), exact_taps=True, present=present,
    )
    np.testing.assert_array_equal(np.asarray(pyr), np.asarray(want))


def test_pyramid_close_to_exact_on_structured_scene(rng):
    """On a depth-coherent scene the pyramid agrees with the exact sweep on
    the overwhelming majority of pixels (the approximation shows up only
    near block/depth boundaries)."""
    (sel_img, sel_off, radius, pxe, pye, spans,
     focus, frange, steps, h, w, K) = _pyramid_setup(rng)
    kw = dict(h_out=h, w=w, radius=radius, steps=steps, px=pxe, py=pye,
              span_y=spans[0], span_x=spans[1])
    exact = np.asarray(ep.estimate_fused(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange), **kw
    )[:h, :w])
    pyr = np.asarray(ep.estimate_fused_pyramid(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
        scale=2, refine=1, **kw
    )[:h, :w])
    assert (pyr == exact).mean() > 0.95


def test_estimate_focus_map_routes_to_fused(rng, monkeypatch):
    """estimate_focus_map(spans=...) takes the fused kernel (spied) and
    returns the identical map."""
    from unittest import mock

    cols = rows = 4
    h, w, K, steps = 64, 384, 8, 8
    focus, frange, radius = 0.1, 0.4, (4, 2)
    offsets, pad, sel_img, sel_off = _setup(
        rng, cols, rows, h, w, K, focus, frange, radius
    )
    spans = ep.chunk_spans(offsets, focus, frange, steps, 4)
    plain = focus_ops.estimate_focus_map(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange), radius,
        steps=steps, pad=pad,
    )
    with mock.patch.object(ep, "estimate_fused", wraps=ep.estimate_fused) as spy:
        routed = focus_ops.estimate_focus_map(
            sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
            radius, steps=steps, pad=pad, spans=spans,
        )
        assert spy.call_count == 1
    np.testing.assert_array_equal(np.asarray(routed), np.asarray(plain))


@pytest.mark.full
def test_pipeline_all_focus_with_spans(rng, small_lf):
    """The full all-focus pipeline with spans matches the XLA-estimate run
    exactly (maps and views)."""
    from lfinterpolator_tpu.models import pipeline
    from lfinterpolator_tpu.ops import blend_xla

    images, (cols, rows) = small_lf
    h, w = images.shape[1:3]
    se = np.array([0, 0, cols - 1.0, rows - 1.0], np.float32)
    v = 4
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(se, cols, rows, 3.0, v)
    ).astype(np.float32)
    offsets = geometry.compute_offsets(
        cols, rows, w, h, 1.0, geometry.trajectory_center(se)
    )
    ids = jnp.asarray(geometry.select_focus_views(se, cols, rows, 8))
    radius = (2, 2)
    pad = focus_ops.shift_pad_bound(offsets, 0.0, 0.5, radius, h, w)
    spans = ep.chunk_spans(offsets, 0.0, 0.5, 8, 4)
    planar = blend_xla.to_planar(jnp.asarray(images))
    args = (planar, jnp.asarray(wm), jnp.asarray(offsets),
            jnp.float32(0.0), jnp.float32(0.5), ids)
    kw = dict(method="STD", radius=radius, filter_radius=(1, 1), steps=8,
              pad=pad)
    want_v, want_m = pipeline.render_all_focus(*args, **kw)
    got_v, got_m = pipeline.render_all_focus(*args, spans=spans, **kw)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def _compare_fast(rng, cols, rows, h, w, K, steps, focus, frange, radius,
                  row=None):
    offsets, pad, sel_img, sel_off = _setup(
        rng, cols, rows, h, w, K, focus, frange, radius
    )
    spans = ep.chunk_spans(offsets, focus, frange, steps, 4)
    rs, rc = (0, h) if row is None else row
    assert ep.supports_fast(rc, w, K, steps, radius, spans[0], spans[1])
    want = focus_ops.estimate_focus_map(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange), radius,
        steps=steps, pad=pad, exact_taps=False, row_start=rs, row_count=rc,
    )
    got = ep.estimate_fast_fused(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
        h_out=rc, w=w, radius=radius, steps=steps,
        px=pad[0], py=pad[1], span_y=spans[0], span_x=spans[1],
        row_start=rs,
    )[:rc, :w]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fast_fused_base(rng):
    _compare_fast(rng, 4, 4, 64, 384, 8, 8, 0.1, 0.4, (4, 2))


def test_fast_fused_negative_focus(rng):
    _compare_fast(rng, 4, 4, 64, 384, 8, 8, -0.3, 0.5, (4, 2))


def test_fast_fused_odd_view_count(rng):
    _compare_fast(rng, 4, 4, 64, 384, 7, 8, 0.1, 0.4, (4, 2))


def test_fast_fused_big_radius(rng):
    _compare_fast(rng, 4, 4, 96, 512, 8, 16, 0.0, 0.6, (10, 6))


def test_fast_fused_odd_radius(rng):
    # odd ry exercises the unaligned window-byte funnels in the cost slices
    _compare_fast(rng, 4, 4, 64, 384, 8, 8, 0.1, 0.4, (5, 3))


def test_fast_fused_row_block(rng):
    _compare_fast(rng, 4, 4, 64, 384, 8, 8, 0.1, 0.4, (4, 2), row=(24, 32))


def test_fast_fused_unaligned_sizes(rng):
    _compare_fast(rng, 4, 4, 52, 300, 8, 8, 0.1, 0.4, (4, 2))


def test_fast_fused_overshoot_bands(rng):
    _assert_overshoot_cfg(rng, 136, exact=False)
    _compare_fast(rng, 4, 4, 136, 384, 8, 8, 0.1, 0.4, (4, 2))


def test_estimate_focus_map_routes_fast_to_fused(rng):
    """estimate_focus_map(exact_taps=False, spans=...) takes the fast fused
    kernel (spied) and returns the identical map."""
    from unittest import mock

    cols = rows = 4
    h, w, K, steps = 64, 384, 8, 8
    focus, frange, radius = 0.1, 0.4, (4, 2)
    offsets, pad, sel_img, sel_off = _setup(
        rng, cols, rows, h, w, K, focus, frange, radius
    )
    spans = ep.chunk_spans(offsets, focus, frange, steps, 4)
    plain = focus_ops.estimate_focus_map(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange), radius,
        steps=steps, pad=pad, exact_taps=False,
    )
    with mock.patch.object(
        ep, "estimate_fast_fused", wraps=ep.estimate_fast_fused
    ) as spy:
        routed = focus_ops.estimate_focus_map(
            sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
            radius, steps=steps, pad=pad, exact_taps=False, spans=spans,
        )
        assert spy.call_count == 1
    np.testing.assert_array_equal(np.asarray(routed), np.asarray(plain))


@pytest.mark.full
def test_small_user_pad_matches_xla(rng):
    """A user pad smaller than radius+1 gets the same floor the XLA padded
    branch applies, so the fused routes stay bit-identical instead of
    producing a silently wrong map (px=4 <= rx=4 exercises the floor)."""
    cols = rows = 4
    h, w, K, steps = 64, 384, 8, 8
    focus, frange, radius = 0.1, 0.4, (4, 2)
    offsets, _, sel_img, sel_off = _setup(
        rng, cols, rows, h, w, K, focus, frange, radius
    )
    spans = ep.chunk_spans(offsets, focus, frange, steps, 4)
    pad = (4, 2)  # == radius: below the rx+1/ry+1 floor
    for exact in (True, False):
        want = focus_ops.estimate_focus_map(
            sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
            radius, steps=steps, pad=pad, exact_taps=exact,
        )
        got = focus_ops.estimate_focus_map(
            sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
            radius, steps=steps, pad=pad, exact_taps=exact, spans=spans,
        )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=f"exact={exact}"
        )


@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("h,rb", [(52, 24), (136, 88)])
@pytest.mark.full
def test_fused_slab_blocks_match_xla(rng, exact, h, rb):
    """Slab mode: estimate_focus_rows(spans=...) routes each row block
    through the fused kernels' slab path (only the dead DMA tail is
    appended to the block's pad window) and the assembled map is
    bit-identical to the full XLA estimate. Unaligned h, rb not dividing
    h, blocks clipped at both image edges, and (h=136/rb=88) band heights
    that overshoot the block (slab hp carries the extra rows) are all
    exercised."""
    from unittest import mock

    from lfinterpolator_tpu.models import pipeline

    cols = rows = 4
    w, K, steps = 300, 8, 8
    focus, frange, radius = 0.1, 0.4, (4, 2)
    offsets, pad, sel_img, sel_off = _setup(
        rng, cols, rows, h, w, K, focus, frange, radius
    )
    spans = ep.chunk_spans(offsets, focus, frange, steps, 4)
    want = focus_ops.estimate_focus_map(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange), radius,
        steps=steps, pad=pad, exact_taps=exact,
    )
    pye = max(pad[1], radius[1] + 1)
    fn_name = "estimate_fused" if exact else "estimate_fast_fused"
    blks = []
    with mock.patch.object(
        ep, fn_name, wraps=getattr(ep, fn_name)
    ) as spy:
        for r0 in range(0, h, rb):
            rc = min(rb, h - r0)
            blks.append(pipeline.estimate_focus_rows(
                sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
                r0, radius=radius, steps=steps, pad=pad, exact_taps=exact,
                rc=rc, top=max(0, pye - r0), bot=max(0, r0 + rc + pye - h),
                spans=spans,
            ))
        # every TRACE went through the fused slab path (jit caching makes
        # the call count < the block count when static shapes repeat)
        assert spy.call_count >= 1
        assert all(
            kw.get("slab") is not None for _, kw in spy.call_args_list
        )
    got = np.concatenate([np.asarray(b) for b in blks], axis=0)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_sel_mode_bitwise_matches_where(rng):
    """The recorded-experiment bitwise select path stays equivalent."""
    offsets, pad, sel_img, sel_off = _setup(
        rng, 4, 4, 48, 384, 6, 0.1, 0.4, (4, 2)
    )
    kw = dict(steps=6, pad=pad, exact_taps=True)
    a = focus_ops.estimate_focus_map(
        sel_img, sel_off, jnp.float32(0.1), jnp.float32(0.4), (4, 2), **kw
    )
    b = focus_ops.estimate_focus_map(
        sel_img, sel_off, jnp.float32(0.1), jnp.float32(0.4), (4, 2),
        sel_mode="bitwise", **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.full
def test_lane_chunked_grids_match_xla(rng, monkeypatch):
    """Forcing WCO < W128 (the 4K-fitting lane-chunk mode) stays
    bit-identical for both kernels, including the per-chunk window
    tables and in-kernel column-coordinate offsets."""
    cols = rows = 4
    h, w, K, steps = 64, 512, 8, 8
    focus, frange, radius = 0.1, 0.4, (4, 2)
    offsets, pad, sel_img, sel_off = _setup(
        rng, cols, rows, h, w, K, focus, frange, radius
    )
    spans = ep.chunk_spans(offsets, focus, frange, steps, 4)
    monkeypatch.setattr(ep, "_wchunks", lambda w128: [256])
    for exact in (True, False):
        for rs, rc in ((0, h), (24, 32)):  # full frame + a sharded block
            want = focus_ops.estimate_focus_map(
                sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
                radius, steps=steps, pad=pad, exact_taps=exact,
                row_start=rs, row_count=rc,
            )
            fn = ep.estimate_fused if exact else ep.estimate_fast_fused
            got = fn.__wrapped__(
                sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
                h_out=rc, w=w, radius=radius, steps=steps,
                px=pad[0], py=pad[1], span_y=spans[0], span_x=spans[1],
                row_start=rs,
            )[:rc, :w]
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want),
                err_msg=f"exact={exact} rows=({rs},{rc})",
            )


@pytest.mark.full
def test_pyramid_through_pipeline_jit(rng):
    """Regression: pipeline.compute_focus_maps must declare `pyramid`
    static -- round 4's first chip run of the --focus-pyramid bench hit
    TracerBoolConversionError because the (scale, refine) ints traced
    through its jit boundary (the CLI test only covered the spans=None
    fallback, which never reaches supports_pyramid)."""
    from lfinterpolator_tpu.models import pipeline

    (sel_img, sel_off, radius, pxe, pye, spans,
     focus, frange, steps, h, w, K) = _pyramid_setup(rng)
    ids = jnp.arange(K, dtype=jnp.int32)  # images[ids] == sel_img
    maps = pipeline.compute_focus_maps(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange), ids,
        radius=radius, filter_radius=(1, 1), steps=steps,
        pad=(pxe, pye), spans=(int(spans[0]), int(spans[1])),
        pyramid=(2, 1),
    )
    want = ep.estimate_fused_pyramid(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
        h_out=h, w=w, radius=radius, steps=steps, px=pxe, py=pye,
        span_y=spans[0], span_x=spans[1], scale=2, refine=1,
    )[:h, :w]
    np.testing.assert_array_equal(np.asarray(maps[0]), np.asarray(want))


@pytest.mark.full
def test_pyramid_through_render_all_focus_jit(rng):
    """Same regression one level up: render_all_focus is ALSO jitted and
    must declare `pyramid` static (the CLI/streaming entry; the first fix
    only patched compute_focus_maps and the CLI still crashed)."""
    from lfinterpolator_tpu.models import pipeline

    (sel_img, sel_off, radius, pxe, pye, spans,
     focus, frange, steps, h, w, K) = _pyramid_setup(rng)
    ids = jnp.arange(K, dtype=jnp.int32)
    weights = jnp.full((4, K), 1.0 / K, jnp.float32)
    views, maps = pipeline.render_all_focus(
        sel_img, weights, sel_off, jnp.float32(focus), jnp.float32(frange),
        ids, method="STD", radius=radius, filter_radius=(1, 1), steps=steps,
        pad=(pxe, pye), spans=(int(spans[0]), int(spans[1])),
        pyramid=(2, 1),
    )
    want = ep.estimate_fused_pyramid(
        sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
        h_out=h, w=w, radius=radius, steps=steps, px=pxe, py=pye,
        span_y=spans[0], span_x=spans[1], scale=2, refine=1,
    )[:h, :w]
    np.testing.assert_array_equal(np.asarray(maps[0]), np.asarray(want))
    assert views.shape == (4, 3, h, w)
