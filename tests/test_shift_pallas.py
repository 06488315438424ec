"""Fused clamp-shift kernel (ops/shift_pallas) vs the pad+slice reference.

Runs in Pallas interpret mode on CPU (see conftest). The ground truth is
blend_pallas.preshift_flat over a shift-bound-padded stack, which is itself
oracle-validated; shift_flat_tiled must be bit-identical.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lfinterpolator_tpu.ops import blend_pallas, shift_pallas


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")


def _align(x, m):
    return -(-x // m) * m


CASES = [
    # (G, C, H, W, px, py, shift_scale)
    (4, 3, 96, 512, 128, 64, 1.0),
    (3, 3, 100, 300, 128, 128, 1.0),  # odd W/H -> tile padding
    (2, 1, 37, 130, 256, 256, 1.0),  # degenerate strips (sl+sr > w128)
    (2, 3, 64, 256, 128, 128, 5.0),  # shifts beyond the clip bounds
    (2, 3, 216, 640, 384, 384, 1.0),  # multi-band with large bounds
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"g{c[0]}c{c[1]}_{c[2]}x{c[3]}")
def test_matches_preshift(case, rng):
    g, c, h, w, px, py, scale = case
    assert shift_pallas.supports(h, w)
    raw = rng.integers(0, 256, (g, c, h, w), dtype=np.uint8)
    fo = (rng.uniform(-1, 1, (g, 2)) * np.array([px, py]) * scale).astype(
        np.int32
    )
    tiled = shift_pallas.pad_to_tiles(jnp.asarray(raw))
    got = np.asarray(
        shift_pallas.shift_flat_tiled(
            tiled, jnp.asarray(fo), h=h, w=w, px=px, py=py
        )
    )
    padded = blend_pallas.pad_images(jnp.asarray(raw), px, py)
    want = np.asarray(
        blend_pallas.preshift_flat(
            padded, jnp.asarray(fo), px=px, py=py, h=h, w=w
        )
    )
    np.testing.assert_array_equal(got, want)


def test_render_fixed_tiled_matches_padded(rng):
    g, c, h, w, px, py = 6, 3, 96, 384, 128, 128
    v = 8
    raw = rng.integers(0, 256, (g, c, h, w), dtype=np.uint8)
    fo = (rng.uniform(-1, 1, (g, 2)) * np.array([px, py])).astype(np.int32)
    wm = (rng.random((v, g)).astype(np.float32)) / g
    tiled = shift_pallas.pad_to_tiles(jnp.asarray(raw))
    got = np.asarray(
        shift_pallas.render_fixed_tiled(
            tiled, jnp.asarray(wm), jnp.asarray(fo), h=h, w=w, px=px, py=py
        )
    )
    padded = blend_pallas.pad_images(jnp.asarray(raw), px, py)
    want = np.asarray(
        blend_pallas.render_fixed_padded(
            padded, jnp.asarray(wm), jnp.asarray(fo), h=h, w=w, px=px, py=py
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pad_to_tiles_shapes(rng):
    raw = rng.integers(0, 256, (2, 3, 37, 130), dtype=np.uint8)
    tiled = np.asarray(shift_pallas.pad_to_tiles(jnp.asarray(raw)))
    assert tiled.shape == (2, 3, _align(37, 8), _align(130, 128))
    np.testing.assert_array_equal(tiled[:, :, :37, :130], raw)
    # already aligned: no copy semantics change
    raw2 = rng.integers(0, 256, (2, 3, 40, 256), dtype=np.uint8)
    assert shift_pallas.pad_to_tiles(jnp.asarray(raw2)).shape == raw2.shape


def test_supports_gates_degenerate():
    assert not shift_pallas.supports(8, 128)  # too short for a band + slack
    assert shift_pallas.supports(1080, 1920)
    assert shift_pallas.supports(2160, 3840)


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"pad_g{c[0]}c{c[1]}_{c[2]}x{c[3]}")
def test_padded_kernel_matches_preshift(case, rng):
    g, c, h, w, px, py, scale = case
    assert shift_pallas.supports_padded(h, w)
    raw = rng.integers(0, 256, (g, c, h, w), dtype=np.uint8)
    fo = (rng.uniform(-1, 1, (g, 2)) * np.array([px, py]) * scale).astype(
        np.int32
    )
    padded = blend_pallas.pad_images(jnp.asarray(raw), px, py)
    got = np.asarray(
        shift_pallas.shift_flat_padded(
            padded, jnp.asarray(fo), h=h, w=w, px=px, py=py
        )
    )
    want = np.asarray(
        blend_pallas.preshift_flat(
            padded, jnp.asarray(fo), px=px, py=py, h=h, w=w
        )
    )
    np.testing.assert_array_equal(got, want)


def test_padded_kernel_row_blocks(rng):
    g, c, h, w, px, py = 4, 3, 96, 384, 128, 128
    raw = rng.integers(0, 256, (g, c, h, w), dtype=np.uint8)
    fo = rng.integers(-100, 100, (g, 2)).astype(np.int32)
    padded = blend_pallas.pad_images(jnp.asarray(raw), px, py)
    full = np.asarray(
        shift_pallas.shift_flat_padded(
            padded, jnp.asarray(fo), h=h, w=w, px=px, py=py
        )
    ).reshape(g, c, _align(h, 8), _align(w, 128))
    hb = h // 4
    blocks = [
        np.asarray(
            shift_pallas.shift_flat_padded(
                padded, jnp.asarray(fo), h=h, w=w, px=px, py=py,
                row_start=b * hb, row_count=hb,
            )
        ).reshape(g, c, _align(hb, 8), _align(w, 128))
        for b in range(4)
    ]
    np.testing.assert_array_equal(
        np.concatenate(blocks, axis=2)[:, :, :h], full[:, :, :h]
    )


def test_supports_padded_mirrors_pick_tb(monkeypatch):
    """supports_padded encodes the same _pick_tb invariant shift_flat_padded
    assumes (VERDICT r2 weak #5): when _pick_tb declines, the gate is False
    and the kernel raises instead of tracing with tb=None."""
    from lfinterpolator_tpu.ops import shift_pallas as sp

    assert sp.supports_padded(32, 256)
    assert sp.supports_padded(1080, 1920, row_count=270)
    assert not sp.supports_padded(32, 8 * 3968)  # lane-roll VMEM bound
    monkeypatch.setattr(sp, "_pick_tb", lambda *a, **k: None)
    assert not sp.supports_padded(32, 256)
    with pytest.raises(ValueError, match="supports_padded"):
        sp.shift_flat_padded(
            jnp.zeros((1, 3, 32 + 2 * 8 + 48, 256 + 2 * 128 + 256), jnp.uint8),
            jnp.zeros((1, 2), jnp.int32),
            h=32, w=256, px=128, py=8,
        )
