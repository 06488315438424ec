"""Golden tests for the fused Pallas MXU blend kernel (interpret mode on CPU).

The same kernel is validated on real TPU hardware by bench.py and the driver's
compile check; here interpret mode verifies the semantics (clamp-shift
preshift, flat-chunk matmul, rounding epilogue) against the oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfinterpolator_tpu.core import geometry
from lfinterpolator_tpu.ops import blend_pallas, blend_xla, reference as oracle


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")


def _run(images, wm, fo):
    planar = blend_xla.to_planar(jnp.asarray(images))
    got = blend_pallas.render_fixed(
        planar, jnp.asarray(wm.astype(np.float32)), jnp.asarray(fo)
    )
    return np.asarray(blend_xla.from_planar(got))


def _run_padded(images, wm, fo, focus_interval, **kw):
    planar = blend_xla.to_planar(jnp.asarray(images))
    h, w = images.shape[1:3]
    offsets = kw.pop("offsets")
    px, py = blend_pallas.shift_bound(offsets, focus_interval, h, w)
    padded = blend_pallas.pad_images(planar, px, py)
    got = blend_pallas.render_fixed_padded(
        padded, jnp.asarray(wm.astype(np.float32)), jnp.asarray(fo),
        h=h, w=w, px=px, py=py, **kw,
    )
    return np.asarray(blend_xla.from_planar(got))


def _setup(rng, cols, rows, h, w, v=16):
    g = cols * rows
    images = rng.integers(0, 256, size=(g, h, w, 4), dtype=np.uint8)
    se = np.array([0.0, 0.0, cols - 1.0, rows - 1.0], np.float32)
    wm = geometry.quantize_weights_f16(
        geometry.weight_matrix(se, cols, rows, 3.0, v)
    )
    offsets = geometry.compute_offsets(
        cols, rows, w, h, 1.0, geometry.trajectory_center(se)
    )
    return images, wm, offsets


def test_matches_oracle_zero_focus(rng):
    images, wm, offsets = _setup(rng, 2, 2, 24, 40)
    fo = geometry.focused_offsets(offsets, 0.0)
    want = oracle.blend_fixed(images, wm, fo)
    got = _run(images, wm, fo)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_matches_oracle_with_shifts(rng):
    images, wm, offsets = _setup(rng, 2, 2, 30, 50)
    for focus in [0.2, -0.45, 1.0]:
        fo = geometry.focused_offsets(offsets, focus)
        want = oracle.blend_fixed(images, wm, fo)
        got = _run(images, wm, fo)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, f"focus={focus}"
        assert (diff > 0).mean() < 1e-3, f"focus={focus}"


def test_matches_oracle_huge_shifts_clamp(rng):
    images, wm, offsets = _setup(rng, 2, 2, 16, 32)
    fo = geometry.focused_offsets(offsets, 40.0)  # beyond image size
    want = oracle.blend_fixed(images, wm, fo)
    got = _run(images, wm, fo)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_nonaligned_resolution(rng):
    # Odd sizes exercise the alignment pad + trim of the flat layout.
    images, wm, offsets = _setup(rng, 2, 2, 21, 37)
    fo = geometry.focused_offsets(offsets, 0.7)
    want = oracle.blend_fixed(images, wm, fo)
    got = _run(images, wm, fo)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_padded_path_matches_oracle(rng):
    """The pre-padded fast path (shift_bound + pad_images) is clamp-exact,
    including shifts that clip against the pad bound and odd sizes."""
    images, wm, offsets = _setup(rng, 3, 3, 29, 45)
    for focus in [0.0, 0.6, -0.8, 25.0]:
        fo = geometry.focused_offsets(offsets, focus)
        want = oracle.blend_fixed(images, wm, fo)
        got = _run_padded(images, wm, fo, focus, offsets=offsets)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, focus


def test_padded_path_interval_bound(rng):
    """One padded stack (interval bound) serves several focus values."""
    images, wm, offsets = _setup(rng, 2, 2, 32, 64)
    planar = blend_xla.to_planar(jnp.asarray(images))
    px, py = blend_pallas.shift_bound(offsets, (-0.5, 0.9), 32, 64)
    padded = blend_pallas.pad_images(planar, px, py)
    for focus in [-0.5, 0.0, 0.33, 0.9]:
        fo = geometry.focused_offsets(offsets, focus)
        want = oracle.blend_fixed(images, wm, fo)
        got = np.asarray(blend_xla.from_planar(
            blend_pallas.render_fixed_padded(
                padded, jnp.asarray(wm.astype(np.float32)), jnp.asarray(fo),
                h=32, w=64, px=px, py=py,
            )
        ))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, focus


@pytest.mark.full
def test_row_block_matches_full_render(rng):
    """row_start/row_count (the mesh-shard path) equals the full render's
    rows, including a non-multiple-of-8 block and a traced row_start."""
    images, wm, offsets = _setup(rng, 2, 2, 40, 64)
    fo = geometry.focused_offsets(offsets, 0.45)
    full = _run_padded(images, wm, fo, 0.45, offsets=offsets)
    planar = blend_xla.to_planar(jnp.asarray(images))
    px, py = blend_pallas.shift_bound(offsets, 0.45, 40, 64)
    padded = blend_pallas.pad_images(planar, px, py)
    for row_start, row_count in [(0, 8), (16, 24), (25, 15), (35, 5)]:
        got = np.asarray(blend_xla.from_planar(
            blend_pallas.render_fixed_padded(
                padded, jnp.asarray(wm.astype(np.float32)), jnp.asarray(fo),
                h=40, w=64, px=px, py=py,
                row_start=jnp.int32(row_start), row_count=row_count,
            )
        ))
        np.testing.assert_array_equal(
            got, full[:, row_start : row_start + row_count],
            err_msg=f"rows [{row_start}, {row_start+row_count})",
        )


def test_blend_tiled_matches_blend_flat(rng):
    """The 4D-tiling blend (kron(W, I_2) on the sublane-packed u32 view)
    is bit-identical to the flat blend under sequential accumulation."""
    for g, v, c, h8, w128 in [(4, 6, 3, 16, 128), (9, 4, 4, 8, 256)]:
        x4 = jnp.asarray(
            rng.integers(0, 256, size=(g, c, h8, w128), dtype=np.uint8)
        )
        wm = jnp.asarray(rng.random((v, g), dtype=np.float32))
        want = blend_pallas.blend_flat(
            x4.reshape(g, c * h8 * w128), wm
        ).reshape(v, c, h8, w128)
        got = blend_pallas.blend_tiled(x4, wm)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_blend_tiled_lane_chunked(rng, monkeypatch):
    """Multi-chunk grids (wchunk < w128, the 4K shape) blend identically."""
    g, v, c, h8, w128 = 4, 4, 3, 8, 512
    x4 = jnp.asarray(
        rng.integers(0, 256, size=(g, c, h8, w128), dtype=np.uint8)
    )
    wm = jnp.asarray(rng.random((v, g), dtype=np.float32))
    want = np.asarray(blend_pallas.blend_tiled(x4, wm))
    monkeypatch.setattr(blend_pallas, "_pick_wchunk", lambda *a: 128)
    got = np.asarray(blend_pallas.blend_tiled.__wrapped__(x4, wm))
    np.testing.assert_array_equal(got, want)


def test_pick_wchunk_invariants():
    for w128 in [128, 1920, 3840, 128 * 63]:
        for g, v in [(64, 64), (4, 4), (256, 512)]:
            wc = blend_pallas._pick_wchunk(w128, g, v)
            assert w128 % wc == 0 and wc % 128 == 0
            # double-buffered VMEM working set stays within budget
            per_lane = 8 * (2 * g + 2 * v + 4 * max(g, v))
            assert wc * per_lane <= 12 * 1024 * 1024 or wc == 128


def test_auto_chunk_invariants():
    for l in [128, 1024, 3 * 1080 * 1920, 3 * 48 * 128, 6220800]:
        for g, v in [(64, 64), (64, 512), (256, 64), (4, 4)]:
            c = blend_pallas._auto_chunk(l, g, v)
            assert l % c == 0 and c % 128 == 0 and c <= 16384
            # VMEM working set stays within the scoped budget
            assert c * (2 * (g + v) + 256) <= 14 * 1024 * 1024 or c == 128 or l < 128
    assert blend_pallas._auto_chunk(3 * 8 * 1920) == 15360


def test_shift_bound_covers_and_caps():
    offsets = np.array([[500.0, -300.0], [-40.0, 20.0]], np.float32)
    px, py = blend_pallas.shift_bound(offsets, 0.5, 1080, 1920)
    assert px >= 250 and py >= 150  # covers max |shift|
    px, py = blend_pallas.shift_bound(offsets, 100.0, 64, 128)
    assert px <= 128 and py <= 64  # capped at image size (clamp saturates)


def test_blend_tiled_degenerate_shapes(rng):
    """Single-view and single-image stacks blend identically (the kron
    operand degenerates to [2, 2g] / [2v, 2])."""
    for g, v in [(9, 1), (1, 5), (1, 1)]:
        x4 = jnp.asarray(
            rng.integers(0, 256, size=(g, 3, 8, 128), dtype=np.uint8)
        )
        wm = jnp.asarray(rng.random((v, g), dtype=np.float32))
        want = blend_pallas.blend_flat(
            x4.reshape(g, 3 * 8 * 128), wm
        ).reshape(v, 3, 8, 128)
        got = blend_pallas.blend_tiled(x4, wm)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
