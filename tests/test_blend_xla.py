"""Golden tests: pure-XLA blend paths vs the NumPy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from lfinterpolator_tpu.core import geometry
from lfinterpolator_tpu.ops import blend_xla, reference as oracle


def _setup(rng, cols=3, rows=3, h=24, w=32, v=8, effect=3.0):
    g = cols * rows
    images = rng.integers(0, 256, size=(g, h, w, 4), dtype=np.uint8)
    start_end = np.array([0.0, 0.0, cols - 1.0, rows - 1.0], dtype=np.float32)
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(start_end, cols, rows, effect, v)
    )
    center = geometry.trajectory_center(start_end)
    offsets = geometry.compute_offsets(cols, rows, w, h, 1.0, center)
    return images, wm, offsets


def test_shift_axis_clamped_matches_numpy(rng):
    x = rng.integers(0, 256, size=(2, 6, 9), dtype=np.uint8)
    for shift in [-20, -6, -3, 0, 2, 5, 9, 30]:
        got = np.asarray(blend_xla.shift_axis_clamped(jnp.asarray(x), shift, axis=2))
        idx = np.clip(np.arange(9) + shift, 0, 8)
        np.testing.assert_array_equal(got, x[:, :, idx], err_msg=f"shift={shift}")


def test_shift_axis_clamped_with_padding(rng):
    x = rng.integers(0, 256, size=(1, 4, 7), dtype=np.uint8)
    pad = 3
    got = np.asarray(
        blend_xla.shift_axis_clamped(jnp.asarray(x), 2, axis=2, pad=pad)
    )
    assert got.shape == (1, 4, 7 + 2 * pad)
    idx = np.clip(np.arange(-pad, 7 + pad) + 2, 0, 6)
    np.testing.assert_array_equal(got, x[:, :, idx])


def test_render_fixed_matches_oracle(rng):
    images, wm, offsets = _setup(rng)
    for focus in [0.0, 0.37, -0.5, 1.2]:
        fo = geometry.focused_offsets(offsets, focus)
        want = oracle.blend_fixed(images, wm, fo)
        got = blend_xla.render_fixed(
            blend_xla.to_planar(jnp.asarray(images)),
            jnp.asarray(wm.astype(np.float32)),
            jnp.asarray(fo),
        )
        got = np.asarray(blend_xla.from_planar(got))
        # float32 accumulation order differs (sequential vs MXU tree) so values
        # on exact rounding boundaries may differ by 1 LSB.
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, f"focus={focus}: max diff {diff.max()}"
        assert (diff > 0).mean() < 0.01, f"focus={focus}: mismatch rate too high"


def test_render_fixed_large_shift_clamps(rng):
    # Shifts larger than the image must behave like full clamp (edge colors).
    images, wm, offsets = _setup(rng, h=16, w=20)
    fo = geometry.focused_offsets(offsets, 50.0)  # enormous shifts
    want = oracle.blend_fixed(images, wm, fo)
    got = np.asarray(
        blend_xla.from_planar(
            blend_xla.render_fixed(
                blend_xla.to_planar(jnp.asarray(images)),
                jnp.asarray(wm.astype(np.float32)),
                jnp.asarray(fo),
            )
        )
    )
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1


def test_render_allfocus_matches_oracle(rng):
    images, wm, offsets = _setup(rng)
    h, w = images.shape[1:3]
    fmap = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    focus, frange = 0.05, 0.4
    want = oracle.blend_allfocus(images, wm, offsets, fmap, focus, frange)
    got = np.asarray(
        blend_xla.from_planar(
            blend_xla.render_allfocus(
                blend_xla.to_planar(jnp.asarray(images)),
                jnp.asarray(wm.astype(np.float32)),
                jnp.asarray(offsets),
                jnp.asarray(fmap),
                jnp.float32(focus),
                jnp.float32(frange),
            )
        )
    )
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_render_allfocus_negative_focus_truncation(rng):
    # Negative focus exercises the trunc-toward-zero (not floor) semantics.
    images, wm, offsets = _setup(rng, cols=2, rows=2, h=12, w=12, v=4)
    h, w = images.shape[1:3]
    fmap = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    focus, frange = -0.6, 0.3
    want = oracle.blend_allfocus(images, wm, offsets, fmap, focus, frange)
    got = np.asarray(
        blend_xla.from_planar(
            blend_xla.render_allfocus(
                blend_xla.to_planar(jnp.asarray(images)),
                jnp.asarray(wm.astype(np.float32)),
                jnp.asarray(offsets),
                jnp.asarray(fmap),
                jnp.float32(focus),
                jnp.float32(frange),
            )
        )
    )
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1


def test_planar_roundtrip(rng):
    images = rng.integers(0, 256, size=(3, 5, 7, 4), dtype=np.uint8)
    p = blend_xla.to_planar(jnp.asarray(images))
    assert p.shape == (3, 3, 5, 7)
    back = np.asarray(blend_xla.from_planar(p))
    np.testing.assert_array_equal(back, images[..., :3])


def test_render_allfocus_quantized_matches_oracle(rng):
    """Level-quantized select path vs oracle, on an estimator-style map."""
    from lfinterpolator_tpu.core import geometry as geo
    images, wm, offsets = _setup(rng, cols=3, rows=3, h=24, w=32, v=8)
    h, w = images.shape[1:3]
    steps = 8
    focus, frange = 0.05, 0.4
    # map restricted to the estimator's byte levels
    lev = geo.round_half_away(
        (np.float32(frange) / (steps - 1)) * np.arange(steps, dtype=np.float32)
        / np.float32(frange) * 255
    ).astype(np.uint8)
    fmap = lev[rng.integers(0, steps, size=(h, w))]
    want = oracle.blend_allfocus(images, wm, offsets, fmap, focus, frange)
    got = np.asarray(
        blend_xla.from_planar(
            blend_xla.render_allfocus_quantized(
                blend_xla.to_planar(jnp.asarray(images)),
                jnp.asarray(wm.astype(np.float32)),
                jnp.asarray(offsets),
                jnp.asarray(fmap),
                jnp.float32(focus),
                jnp.float32(frange),
                steps=steps,
            )
        )
    )
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    # trunc_shifted_window reproduces the per-pixel truncation exactly, so
    # the only differences are 1-LSB float accumulation-order effects.
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_render_allfocus_quantized_covers_all_levels(rng):
    """Every estimator level must be selected (no pixels left at zero)."""
    from lfinterpolator_tpu.core import geometry as geo
    images, wm, offsets = _setup(rng, cols=2, rows=2, h=16, w=16, v=4)
    images[:, :, :, :3] = np.maximum(images[:, :, :, :3], 1)  # no zero pixels
    steps = 4
    lev = geo.round_half_away(
        np.arange(steps) / (steps - 1) * 255
    ).astype(np.uint8)
    fmap = np.repeat(lev, 4)[None, :].repeat(16, axis=0).astype(np.uint8)
    got = np.asarray(
        blend_xla.render_allfocus_quantized(
            blend_xla.to_planar(jnp.asarray(images)),
            jnp.asarray(wm.astype(np.float32)),
            jnp.asarray(offsets),
            jnp.asarray(fmap),
            jnp.float32(0.0),
            jnp.float32(0.3),
            steps=steps,
        )
    )
    assert (got > 0).all()


def test_render_allfocus_quantized_padded_matches_unpadded(rng):
    images, wm, offsets = _setup(rng, cols=2, rows=2, h=20, w=28, v=4)
    h, w = images.shape[1:3]
    steps = 4
    lev = np.round(np.arange(steps) / (steps - 1) * 255).astype(np.uint8)
    fmap = lev[rng.integers(0, steps, size=(h, w))]
    args = (
        blend_xla.to_planar(jnp.asarray(images)),
        jnp.asarray(wm.astype(np.float32)),
        jnp.asarray(offsets),
        jnp.asarray(fmap),
        jnp.float32(0.1),
        jnp.float32(0.5),
    )
    base = np.asarray(blend_xla.render_allfocus_quantized(*args, steps=steps))
    fast = np.asarray(
        blend_xla.render_allfocus_quantized(*args, steps=steps, pad=(64, 64))
    )
    np.testing.assert_array_equal(fast, base)


def test_trunc_shifted_window_f32_rounding_adversarial(rng):
    """The oracle truncates the ROUNDED f32 sum coord+shift; shifts within an
    ulp of an integer must reproduce that, not floor(shift)+correction
    (regression for a review finding: a shift of nextafter(2.0, 0) moved the
    whole frame one source row)."""
    import math

    img = rng.integers(0, 256, size=(3, 24, 40), dtype=np.uint8)
    h, w = 24, 40
    px = py = 64
    padded = np.pad(img, ((0, 0), (py, py), (px, px)), mode="edge")
    adversarial = [
        np.float32(math.nextafter(2.0, 0.0)),
        np.float32(math.nextafter(2.0, 4.0)),
        np.float32(-math.nextafter(2.0, 0.0)),
        np.float32(math.nextafter(-3.0, 0.0)),
        np.float32(1.9999999),
        np.float32(-0.0),
        np.float32(7.5),
        np.float32(-7.5),
        np.float32(2.0),
    ]
    for fy in adversarial:
        for fx in adversarial[::2]:
            got = np.asarray(
                blend_xla.trunc_shifted_window(
                    jnp.asarray(padded), jnp.float32(fy), jnp.float32(fx),
                    px=px, py=py, h_out=h, w=w,
                )
            )
            # oracle semantics: per-pixel trunc of the rounded f32 sum
            qy = np.arange(h, dtype=np.float32)
            qx = np.arange(w, dtype=np.float32)
            cy = np.clip(np.trunc(qy + fy).astype(np.int64), 0, h - 1)
            cx = np.clip(np.trunc(qx + fx).astype(np.int64), 0, w - 1)
            want = img[:, cy[:, None], cx[None, :]]
            np.testing.assert_array_equal(got, want, err_msg=f"fy={fy} fx={fx}")


def test_allfocus_quantized_near_integer_shift(rng):
    """End-to-end regression: per-level shifts within an ulp of an integer."""
    import math

    h, w, g, v, steps = 16, 24, 4, 4, 4
    images = rng.integers(0, 256, size=(g, h, w, 4), dtype=np.uint8)
    wm = np.full((v, g), 0.25, dtype=np.float16)
    # Choose offsets so level 3 (byte 255 -> f=focus+range) lands a shift of
    # nextafter(2.0, 0) in y for image 0.
    target = np.float32(math.nextafter(2.0, 0.0))
    offsets = np.array(
        [[0.3, float(target) / 0.5], [1.0, -2.0], [-1.7, 0.9], [0.0, 0.0]],
        np.float32,
    )
    focus, frange = 0.0, 0.5
    lev = np.round(np.arange(steps) / (steps - 1) * 255).astype(np.uint8)
    fmap = lev[rng.integers(0, steps, size=(h, w))]
    want = oracle.blend_allfocus(images, wm, offsets, fmap, focus, frange)
    for pad in (None, (64, 64)):
        got = np.asarray(
            blend_xla.from_planar(
                blend_xla.render_allfocus_quantized(
                    blend_xla.to_planar(jnp.asarray(images)),
                    jnp.asarray(wm.astype(np.float32)),
                    jnp.asarray(offsets),
                    jnp.asarray(fmap),
                    jnp.float32(focus),
                    jnp.float32(frange),
                    steps=steps,
                    pad=pad,
                )
            )
        )
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, f"pad={pad}: max {diff.max()}"


def test_render_allfocus_all_bytes_matches_gather(rng):
    """The 256-byte-level scan (the STD filtered-map fast path) is exact vs
    the per-pixel gather for ARBITRARY byte maps."""
    from lfinterpolator_tpu.core import geometry

    g, h, w, v = 9, 40, 64, 6
    images = rng.integers(0, 256, size=(g, h, w, 4), dtype=np.uint8)
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(np.array([0, 0, 2, 2], np.float32), 3, 3, 3.0, v)
    ).astype(np.float32)
    offsets = geometry.compute_offsets(
        3, 3, w, h, 1.0, np.array([1.0, 1.0], np.float32)
    )
    fmap = rng.integers(0, 256, size=(h, w), dtype=np.uint8)  # arbitrary bytes
    planar = blend_xla.to_planar(jnp.asarray(images))
    args = (planar, jnp.asarray(wm), jnp.asarray(offsets), jnp.asarray(fmap),
            jnp.float32(0.1), jnp.float32(0.5))
    want = np.asarray(blend_xla.render_allfocus(*args))
    got = np.asarray(blend_xla.render_allfocus_quantized(
        *args, steps=32, pad=(64, 64), all_bytes=True))
    np.testing.assert_array_equal(got, want)


def test_blend_fast_matches_blend(rng, monkeypatch):
    """blend_fast (flat Pallas route, interpret mode) == XLA blend, including
    non-lane-aligned widths that need the pad+trim path."""
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")
    g, v = 5, 4
    for h, w in [(16, 128), (13, 50)]:
        shifted = jnp.asarray(rng.integers(0, 256, (g, 3, h, w), dtype=np.uint8))
        weights = jnp.asarray(rng.random((v, g), dtype=np.float32))
        a = np.asarray(blend_xla.blend(shifted, weights))
        b = np.asarray(blend_xla.blend_fast(shifted, weights))
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1, (h, w, diff.max())


def test_div_exact_matches_ieee(rng):
    """div_exact == IEEE f32 division bit-for-bit (on CPU `/` is already
    IEEE; on TPU the reciprocal-multiply lowering misrounds ~34% of
    quotients, which div_exact corrects -- verified on-chip separately)."""
    a = ((rng.random(50000) - 0.3) * np.exp2(rng.integers(-8, 12, 50000))).astype(np.float32)
    b = ((rng.random(50000) + 1e-3) * np.exp2(rng.integers(-4, 10, 50000))).astype(np.float32)
    got = np.asarray(blend_xla.div_exact(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got.view(np.uint32), (a / b).view(np.uint32))
    bytes_ = np.arange(256, dtype=np.float32)
    got2 = np.asarray(blend_xla.div_exact(jnp.asarray(bytes_), jnp.float32(255)))
    np.testing.assert_array_equal(
        got2.view(np.uint32), (bytes_ / np.float32(255)).view(np.uint32)
    )


@pytest.mark.full
def test_allfocus_selected_slab_blocks_match_full(rng):
    """select_allfocus_rows (row-slab mode: each block's pad window rebuilt
    from the raw stack) concatenates to exactly the full-stack select, for
    both map flavors, across block sizes that hit clipped top/bottom pads
    and a non-divisor tail."""
    from lfinterpolator_tpu.models import pipeline
    from lfinterpolator_tpu.ops import focus as focus_ops

    g, c, h, w = 9, 3, 52, 70
    images = jnp.asarray(rng.integers(0, 256, (g, c, h, w), dtype=np.uint8))
    se = geometry.parse_trajectory("0,0,2,2", (3, 3))
    offsets = geometry.compute_offsets(
        3, 3, w, h, 1.0, geometry.trajectory_center(se)
    )
    radius = geometry.block_radius(w, h)
    pad = focus_ops.shift_pad_bound(offsets, 0.1, 0.3, radius, h, w)
    offj = jnp.asarray(offsets)
    f, fr = jnp.float32(0.1), jnp.float32(0.3)
    maps = pipeline.compute_focus_maps(
        images, offj, f, fr, jnp.arange(g),
        radius=radius, filter_radius=(1, 1), steps=8, pad=pad,
    )
    py = max(pad[1], 1)
    for method in ("STD", "TEN"):
        fmap = maps[1] if method == "STD" else maps[0]
        full = np.asarray(blend_xla.allfocus_selected(
            images, offj, fmap, f, fr, steps=8, pad=pad,
            all_bytes=(method == "STD"),
        ))
        for rb in (16, 20):
            outs = []
            r0 = 0
            while r0 < h:
                rc = min(rb, h - r0)
                outs.append(np.asarray(pipeline.select_allfocus_rows(
                    images, offj, maps, f, fr, r0,
                    method=method, steps=8, pad=pad, rc=rc,
                    top=max(0, py - r0), bot=max(0, (r0 + rc + py) - h),
                )))
                r0 += rc
            np.testing.assert_array_equal(
                np.concatenate(outs, axis=2), full, err_msg=f"{method} rb={rb}"
            )
