"""Golden tests for the fused Pallas MXU blend kernel (interpret mode on CPU).

The same kernel is validated on real TPU hardware by bench.py and the driver's
compile check; here interpret mode verifies the semantics (DMA windows,
residual rotates, matmul epilogue) against the oracle.
"""

import numpy as np
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
    # Odd sizes exercise grid-overrun cropping and residual rotates.
    images, wm, offsets = _setup(rng, 2, 2, 21, 37)
    fo = geometry.focused_offsets(offsets, 0.7)
    want = oracle.blend_fixed(images, wm, fo)
    got = _run(images, wm, fo)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_split_weights_roundtrip(rng):
    w = rng.random((16, 64), dtype=np.float32)
    two = np.asarray(blend_pallas.split_weights(jnp.asarray(w)))
    recon = two[0].astype(np.float32) + two[1].astype(np.float32)
    assert np.abs(recon - w).max() < 2e-5  # ~f32-precision weights


def test_window_starts_alignment_invariants():
    fo = jnp.asarray(np.array([[5, -7], [-300, 300]], np.int32))
    sr, sc = blend_pallas.window_starts(fo, h=100, w=200, tile_h=8, tile_w=128)
    hp = -(-100 // 8) * 8 + 16
    wp = -(-200 // 128) * 128 + 256
    assert sr.shape == (-(-100 // 8), 2)
    assert (np.asarray(sr) >= 0).all() and (np.asarray(sr) <= hp - 8).all()
    assert (np.asarray(sc) >= 0).all() and (np.asarray(sc) <= wp - 128).all()
