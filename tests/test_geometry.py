"""Unit tests for host-side geometry against hand-computed values.

Each test mirrors a formula in reference src/interpolator.cu (cited in the
geometry module docstrings).
"""

import numpy as np
import pytest

from lfinterpolator_tpu.core import geometry


def test_round_half_away():
    x = np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49, -0.49])
    expected = np.array([1, 2, 3, -1, -2, -3, 0, -0])
    np.testing.assert_array_equal(geometry.round_half_away(x), expected)


def test_parse_trajectory_scales_by_grid_minus_one():
    # value * (colsRows[i%2]-1): x by cols-1, y by rows-1 (interpolator.cu:318-337)
    t = geometry.parse_trajectory("0.0,0.0,1.0,1.0", (8, 4))
    np.testing.assert_allclose(t, [0.0, 0.0, 7.0, 3.0])
    t = geometry.parse_trajectory("0.5,0.5,0.5,0.5", (5, 5))
    np.testing.assert_allclose(t, [2.0, 2.0, 2.0, 2.0])


def test_parse_trajectory_rejects_bad_input():
    with pytest.raises(ValueError):
        geometry.parse_trajectory("0.0,1.0", (4, 4))


def test_generate_trajectory_endpoints_and_count():
    pts = geometry.generate_trajectory(np.array([0.0, 0.0, 3.0, 6.0]), 64)
    assert pts.shape == (64, 2)
    np.testing.assert_allclose(pts[0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(pts[-1], [3.0, 6.0], atol=1e-5)
    # equally spaced: step = (end-start)/63
    np.testing.assert_allclose(pts[1] - pts[0], [3.0 / 63, 6.0 / 63], atol=1e-6)


def test_trajectory_center_is_midpoint():
    c = geometry.trajectory_center(np.array([1.0, 2.0, 3.0, 6.0]))
    np.testing.assert_allclose(c, [2.0, 4.0])


def test_grid_positions_flat_order_is_col_major():
    pos = geometry.grid_positions(2, 3)
    # flat index = col*rows + row
    np.testing.assert_array_equal(
        pos, [[0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [1, 2]]
    )


def test_generate_weights_hand_computed():
    # 2x2 grid, view at (0,0), effect=1:
    # maxDistance = |(2,2)| = 2*sqrt(2)
    # dists from (0,0): 0, 1, 1, sqrt(2)
    md = 2 * np.sqrt(2)
    raw = np.array([md - 0, md - 1, md - 1, md - np.sqrt(2)])
    expected = raw / raw.sum()
    w = geometry.generate_weights(np.array([0.0, 0.0]), 2, 2, 1.0)
    np.testing.assert_allclose(w, expected, rtol=1e-6)
    assert abs(w.sum() - 1.0) < 1e-6


def test_generate_weights_effect_sharpens():
    w1 = geometry.generate_weights(np.array([0.0, 0.0]), 4, 4, 1.0)
    w7 = geometry.generate_weights(np.array([0.0, 0.0]), 4, 4, 7.0)
    # Higher effect concentrates weight on the nearest camera (index 0).
    assert w7[0] > w1[0]
    assert np.argmax(w7) == 0


def test_weight_matrix_shape_and_normalization():
    wm = geometry.weight_matrix(np.array([0.0, 0.0, 3.0, 3.0]), 4, 4, 3.0, 64)
    assert wm.shape == (64, 16)
    np.testing.assert_allclose(wm.sum(axis=1), np.ones(64), atol=1e-5)


def test_compute_offsets_hand_computed():
    # 2x2 grid, 100x50 image, aspect 1, center (0.5, 0.5):
    # offset_g = (center-pos)/(2,2) * (100,50), y *= (100/50)/1 = 2
    off = geometry.compute_offsets(2, 2, 100, 50, 1.0, np.array([0.5, 0.5]))
    expected = np.array(
        [
            [0.25 * 100, 0.25 * 50 * 2],
            [0.25 * 100, -0.25 * 50 * 2],
            [-0.25 * 100, 0.25 * 50 * 2],
            [-0.25 * 100, -0.25 * 50 * 2],
        ]
    )
    np.testing.assert_allclose(off, expected, rtol=1e-6)


def test_focused_offsets_rounding():
    off = np.array([[1.0, -1.0], [3.0, -3.0]], dtype=np.float32)
    fo = geometry.focused_offsets(off, 0.5)  # 0.5, -0.5, 1.5, -1.5
    np.testing.assert_array_equal(fo, [[1, -1], [2, -2]])


def test_select_focus_views_nearest_center():
    ids = geometry.select_focus_views(np.array([0.0, 0.0, 2.0, 2.0]), 3, 3, 4)
    # center (1,1) -> nearest is flat idx 4 (pos (1,1)), then the 4 at distance 1
    assert ids[0] == 4
    assert set(ids[1:]).issubset({1, 3, 5, 7})
    assert len(set(ids)) == 4


def test_select_focus_views_requires_enough_images():
    with pytest.raises(ValueError):
        geometry.select_focus_views(np.array([0.0, 0.0, 1.0, 1.0]), 2, 2, 32)


def test_block_radius_even_rounding():
    # 1920/100=19 -> 20; 1080/100=10 -> stays 10
    assert geometry.block_radius(1920, 1080) == (20, 10)
    # small images clamp to the minimum of 2 (reference UB below 100px)
    assert geometry.block_radius(64, 48) == (2, 2)


def test_focus_candidates():
    c = geometry.focus_candidates(0.1, 0.31, 32)
    assert c.shape == (32,)
    np.testing.assert_allclose(c[0], 0.1, atol=1e-7)
    np.testing.assert_allclose(c[-1], 0.41, atol=1e-6)
    np.testing.assert_allclose(np.diff(c), 0.31 / 31, atol=1e-6)


def test_quantize_weights_f16_precision():
    w = geometry.weight_matrix(np.array([0.0, 0.0, 3.0, 3.0]), 4, 4, 3.0, 64)
    q = geometry.quantize_weights_f16(w)
    assert q.dtype == np.float16
    assert np.abs(q.astype(np.float32) - w).max() < 1e-3


def test_generate_trajectory_single_view():
    pts = geometry.generate_trajectory(np.array([1.0, 2.0, 3.0, 4.0]), 1)
    assert pts.shape == (1, 2)
    np.testing.assert_allclose(pts[0], [1.0, 2.0])
    w = geometry.weight_matrix(np.array([0.0, 0.0, 1.0, 1.0]), 2, 2, 3.0, 1)
    assert np.isfinite(w).all()
