"""Randomized end-to-end configurations vs the oracle.

Each case draws a random (grid, resolution, views, focus, effect, aspect,
method) configuration and checks the full pipeline against the bit-faithful
oracle. Catches interactions the targeted tests miss (odd sizes, rectangular
grids, negative focus, extreme aspect).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lfinterpolator_tpu.core import geometry
from lfinterpolator_tpu.models import pipeline
from lfinterpolator_tpu.ops import blend_xla, focus as focus_ops
from lfinterpolator_tpu.ops import reference as oracle

CASES = list(range(10))


def _random_cfg(seed):
    r = np.random.default_rng(seed)
    cols = int(r.integers(2, 6))
    rows = int(r.integers(2, 6))
    h = int(r.integers(12, 49))
    w = int(r.integers(16, 65))
    v = int(r.choice([1, 3, 8, 16]))
    focus = float(r.uniform(-0.8, 0.8))
    effect = float(r.choice([1.0, 3.0, 7.0]))
    aspect = float(r.choice([0.5, 1.0, 1.783, 2.276]))
    traj = r.uniform(0, 1, 4)
    return cols, rows, h, w, v, focus, effect, aspect, traj


@pytest.mark.parametrize("seed", CASES)
def test_fixed_focus_random_config(seed, rng):
    cols, rows, h, w, v, focus, effect, aspect, traj = _random_cfg(seed)
    g = cols * rows
    images = rng.integers(0, 256, size=(g, h, w, 4), dtype=np.uint8)
    se = geometry.parse_trajectory(",".join(str(x) for x in traj), (cols, rows))
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(se, cols, rows, effect, v)
    )
    offsets = geometry.compute_offsets(
        cols, rows, w, h, aspect, geometry.trajectory_center(se)
    )
    fo = geometry.focused_offsets(offsets, focus)
    want = oracle.blend_fixed(images, wm, fo)
    got = np.asarray(
        blend_xla.from_planar(
            pipeline.render_fixed_focus(
                blend_xla.to_planar(jnp.asarray(images)),
                jnp.asarray(wm.astype(np.float32)),
                jnp.asarray(fo),
                method="STD",
            )
        )
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"seed={seed} cfg={(cols, rows, h, w, v, focus)}"


@pytest.mark.parametrize(
    "seed",
    [CASES[0]] + [pytest.param(s, marks=pytest.mark.full) for s in CASES[1:5]],
)
@pytest.mark.full
def test_all_focus_random_config(seed, rng):
    cols, rows, h, w, v, focus, effect, aspect, traj = _random_cfg(seed + 100)
    focus_range = abs(focus) + 0.1
    g = cols * rows
    k = min(8, g)
    steps = 8
    images = rng.integers(0, 256, size=(g, h, w, 4), dtype=np.uint8)
    se = geometry.parse_trajectory(",".join(str(x) for x in traj), (cols, rows))
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(se, cols, rows, effect, v)
    )
    offsets = geometry.compute_offsets(
        cols, rows, w, h, aspect, geometry.trajectory_center(se)
    )
    ids = geometry.select_focus_views(se, cols, rows, k)
    radius = geometry.block_radius(w, h)
    frad = (radius[0] // 10, radius[1] // 10)
    pad = focus_ops.shift_pad_bound(offsets, focus, focus_range, radius, h, w)

    # oracle: estimate -> filter -> both blends
    map0 = oracle.focus_map_estimate(
        images, offsets, ids, focus, focus_range, radius, steps=steps
    )
    map1 = oracle.focus_map_filter(map0, frad)

    planar = blend_xla.to_planar(jnp.asarray(images))
    for method, want_map in (("STD", map1), ("TEN", map0)):
        views, maps = pipeline.render_all_focus(
            planar,
            jnp.asarray(wm.astype(np.float32)),
            jnp.asarray(offsets),
            jnp.float32(focus),
            jnp.float32(focus_range),
            jnp.asarray(ids),
            method=method,
            radius=radius,
            filter_radius=frad,
            steps=steps,
            pad=pad,
        )
        np.testing.assert_array_equal(
            np.asarray(maps[0]), map0, err_msg=f"seed={seed} map0"
        )
        np.testing.assert_array_equal(
            np.asarray(maps[1]), map1, err_msg=f"seed={seed} map1"
        )
        want = oracle.blend_allfocus(
            images, wm, offsets, want_map, focus, focus_range
        )
        got = np.asarray(blend_xla.from_planar(views))
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, (
            f"seed={seed} method={method} cfg={(cols, rows, h, w, v, focus)}"
        )


@pytest.mark.parametrize("seed", CASES[:6])
def test_pallas_kernel_random_config(seed, rng, monkeypatch):
    """Fuzz the fused Pallas blend (interpret mode) across random configs."""
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")
    from lfinterpolator_tpu.ops import blend_pallas

    cols, rows, h, w, v, focus, effect, aspect, traj = _random_cfg(seed + 500)
    v = max(2, v)
    g = cols * rows
    images = rng.integers(0, 256, size=(g, h, w, 4), dtype=np.uint8)
    se = geometry.parse_trajectory(",".join(str(x) for x in traj), (cols, rows))
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(se, cols, rows, effect, v)
    )
    offsets = geometry.compute_offsets(
        cols, rows, w, h, aspect, geometry.trajectory_center(se)
    )
    fo = geometry.focused_offsets(offsets, focus)
    want = oracle.blend_fixed(images, wm, fo)
    got = np.asarray(
        blend_xla.from_planar(
            blend_pallas.render_fixed(
                blend_xla.to_planar(jnp.asarray(images)),
                jnp.asarray(wm.astype(np.float32)),
                jnp.asarray(fo),
            )
        )
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"seed={seed} cfg={(cols, rows, h, w, v, focus)}"


@pytest.mark.parametrize("seed", CASES[:6])
def test_allfocus_kernel_random_config(seed, rng, monkeypatch):
    """Fused allFocus kernel vs the XLA quantized path on random
    kernel-supported geometries (interpret mode)."""
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")
    from lfinterpolator_tpu.ops import allfocus_pallas

    r = np.random.default_rng(seed + 500)
    g = int(r.integers(2, 7))
    h = int(r.integers(17, 90))
    w = int(r.integers(128, 300))
    steps = int(r.choice([4, 8, 16]))
    v = int(r.choice([1, 4, 8]))
    focus = float(r.uniform(-0.4, 0.4))
    frange = float(r.uniform(0.05, 0.6))
    oamp = float(r.uniform(5.0, 120.0))
    images = jnp.asarray(rng.integers(0, 256, (g, 3, h, w), dtype=np.uint8))
    weights = jnp.asarray(
        (np.abs(rng.normal(size=(v, g))) / g).astype(np.float32)
    )
    offsets = jnp.asarray(rng.uniform(-oamp, oamp, (g, 2)).astype(np.float32))
    levels, f_levels = blend_xla.quantized_levels(
        jnp.float32(focus), jnp.float32(frange), steps
    )
    fmap = jnp.asarray(np.asarray(levels)[rng.integers(0, steps, (h, w))])
    spread = allfocus_pallas.spread_bound(offsets, focus, frange, bucket=8)
    if not allfocus_pallas.supports(h, w, spread):
        pytest.skip(f"unsupported geometry seed={seed}")
    mx = max(abs(focus), abs(focus + frange)) * float(
        np.abs(np.asarray(offsets)[:, 0]).max()
    )
    my = max(abs(focus), abs(focus + frange)) * float(
        np.abs(np.asarray(offsets)[:, 1]).max()
    )
    px, py = int(np.ceil(mx)) + 8, int(np.ceil(my)) + 8
    want = np.asarray(
        blend_xla.render_allfocus_quantized(
            images, weights, offsets, fmap,
            jnp.float32(focus), jnp.float32(frange),
            steps=steps, pad=(px, py),
        )
    )
    got = np.asarray(
        allfocus_pallas.render_allfocus_tiled(
            images, weights, fmap, levels,
            f_levels[:, None] * offsets[None, :, 1],
            f_levels[:, None] * offsets[None, :, 0],
            spread=spread, px=px,
        )
    )
    np.testing.assert_array_equal(
        got, want, err_msg=f"seed={seed} cfg={(g, h, w, steps, focus, frange)}"
    )


@pytest.mark.parametrize(
    "seed",
    [CASES[0]] + [pytest.param(s, marks=pytest.mark.full) for s in CASES[1:4]],
)
@pytest.mark.full
def test_estimate_kernels_random_config(seed, rng, monkeypatch):
    """Both fused estimate kernels (exact + fast tap rule) equal their XLA
    paths bit for bit on random supported geometries."""
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")
    from lfinterpolator_tpu.ops import estimate_pallas as ep

    r = np.random.default_rng(1000 + seed)
    cols = rows = 4
    h = int(r.integers(4, 13)) * 8
    w = int(r.integers(2, 4)) * 128 + int(r.integers(0, 64))
    K = int(r.choice([4, 7, 8]))
    steps = int(r.choice([4, 8, 12]))
    focus = float(r.uniform(-0.4, 0.4))
    frange = float(r.uniform(0.2, 0.6))
    radius = (int(r.integers(2, 8)), int(r.integers(2, 6)))
    se = np.array([0, 0, cols - 1.0, rows - 1.0], np.float32)
    offsets = geometry.compute_offsets(
        cols, rows, w, h, float(r.choice([1.0, 1.783])),
        geometry.trajectory_center(se),
    )
    ids = np.asarray(geometry.select_focus_views(se, cols, rows, K))
    pad = focus_ops.shift_pad_bound(offsets, focus, frange, radius, h, w)
    spans = ep.chunk_spans(offsets, focus, frange, steps, 4)
    sel_img = jnp.asarray(rng.integers(0, 256, (K, 3, h, w), dtype=np.uint8))
    sel_off = jnp.asarray(offsets)[jnp.asarray(ids)]
    for exact, sup in (
        (True, ep.supports), (False, ep.supports_fast)
    ):
        if not sup(h, w, K, steps, radius, spans[0], spans[1]):
            continue
        args = (sel_img, sel_off, jnp.float32(focus), jnp.float32(frange),
                radius)
        kw = dict(steps=steps, pad=pad, exact_taps=exact)
        want = focus_ops.estimate_focus_map(*args, **kw)
        got = focus_ops.estimate_focus_map(*args, spans=spans, **kw)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want),
            err_msg=f"seed={seed} exact={exact} "
                    f"cfg={(h, w, K, steps, focus, frange, radius)}",
        )
