"""Tests for on-device quilt assembly and quality metrics."""

import numpy as np
import jax.numpy as jnp
import pytest

from lfinterpolator_tpu.ops import quilt
from lfinterpolator_tpu.utils import metrics


def test_quilt_tile_order_row_major(rng):
    v, c, h, w = 45, 3, 4, 6
    views = rng.integers(0, 256, size=(v, c, h, w), dtype=np.uint8)
    q = np.asarray(quilt.assemble_quilt(jnp.asarray(views), cols=5, rows=9))
    assert q.shape == (3, 9 * h, 5 * w)
    # view k sits at row k//5, col k%5 (montage order)
    for k in [0, 4, 5, 44]:
        r, cidx = divmod(k, 5)
        np.testing.assert_array_equal(
            q[:, r * h : (r + 1) * h, cidx * w : (cidx + 1) * w], views[k]
        )


def test_quilt_resize(rng):
    views = rng.integers(0, 256, size=(45, 3, 8, 8), dtype=np.uint8)
    q = np.asarray(
        quilt.assemble_quilt(jnp.asarray(views), cols=5, rows=9, tile_size=(4, 4))
    )
    assert q.shape == (3, 36, 20)


def test_quilt_too_few_views(rng):
    views = rng.integers(0, 256, size=(10, 3, 4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="needs 45"):
        quilt.assemble_quilt(jnp.asarray(views), cols=5, rows=9)


def test_blend_quilt_matches_blend_then_assemble(rng, monkeypatch):
    """The fused direct-to-canvas quilt blend equals blend_tiled followed
    by the copy assembly bit for bit (same K ordering per view)."""
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")
    from lfinterpolator_tpu.ops import blend_pallas as bp

    g, c, h8, w128 = 9, 3, 16, 256
    cols, rows = 2, 3
    x4 = jnp.asarray(rng.integers(0, 256, (g, c, h8, w128), dtype=np.uint8))
    wm = rng.random((8, g)).astype(np.float32)
    weights = jnp.asarray(wm / wm.sum(axis=1, keepdims=True))
    assert bp.supports_quilt(h8, w128, g)
    got = np.asarray(bp.blend_quilt(x4, weights, cols=cols, rows=rows))
    assert got.shape == (c, rows * h8, cols * w128)
    want = np.asarray(
        quilt.assemble_quilt(bp.blend_tiled(x4, weights), cols=cols, rows=rows)
    )
    np.testing.assert_array_equal(got, want)


def test_render_fixed_quilt_padded_matches_two_stage(rng, monkeypatch):
    """Quilt-only fused render (shift + direct-to-canvas blend) equals the
    render-views-then-assemble route exactly."""
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")
    from lfinterpolator_tpu.ops import blend_pallas as bp

    g, c, h, w = 9, 3, 32, 256
    cols, rows = 2, 2
    px, py = 4, 4
    images = jnp.asarray(rng.integers(0, 256, (g, c, h, w), dtype=np.uint8))
    padded = bp.pad_images(images, px, py)
    fo = jnp.asarray(
        rng.integers(-3, 4, size=(g, 2)).astype(np.int32)
    )
    wm = rng.random((cols * rows, g)).astype(np.float32)
    weights = jnp.asarray(wm / wm.sum(axis=1, keepdims=True))
    assert quilt.supports_fused_render(h, w, g)
    got = np.asarray(
        quilt.render_fixed_quilt_padded(
            padded, weights, fo, cols=cols, rows=rows, h=h, w=w, px=px, py=py
        )
    )
    views = bp.render_fixed_padded(padded, weights, fo, h=h, w=w, px=px, py=py)
    want = np.asarray(quilt.assemble_quilt(views, cols=cols, rows=rows))
    np.testing.assert_array_equal(got, want)


def test_supports_quilt_gates_unaligned():
    from lfinterpolator_tpu.ops import blend_pallas as bp

    assert not bp.supports_quilt(1079, 1920, 64)  # h % 8 != 0
    assert not bp.supports_quilt(1080, 1921, 64)  # w % 128 != 0


def test_psnr_identical_and_known(rng):
    a = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert metrics.psnr(a, a) == float("inf")
    b = a.astype(np.int32).copy()
    b = np.clip(b + 1, 0, 255)  # off-by-one everywhere -> MSE ~1
    p = metrics.psnr(a, b.astype(np.uint8))
    assert 47.0 < p < 48.5  # 10*log10(255^2/1) = 48.13, minus clip effects


def test_ssim_bounds(rng):
    a = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    assert metrics.ssim(a, a) == pytest.approx(1.0)
    noise = rng.integers(0, 256, size=a.shape, dtype=np.uint8)
    assert metrics.ssim(a, noise) < 0.2


def test_metrics_shape_mismatch(rng):
    a = np.zeros((4, 4)), np.zeros((5, 5))
    with pytest.raises(ValueError):
        metrics.psnr(*a)


def test_quilt_pallas_matches_dus(rng, monkeypatch):
    """The aligned-tile Pallas copy path equals the dynamic_update_slice
    canvas bit for bit (including band splitting)."""
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")
    from lfinterpolator_tpu.ops import quilt as q

    views = jnp.asarray(
        rng.integers(0, 256, (8, 3, 16, 128), dtype=np.uint8)
    )
    got = np.asarray(q.assemble_quilt(views, cols=2, rows=3))
    # force the fallback for the reference result
    monkeypatch.setattr(q, "_pick_bh", lambda *a, **k: None)
    want = np.asarray(
        q.assemble_quilt.__wrapped__(views, cols=2, rows=3)
    )
    np.testing.assert_array_equal(got, want)
    # band-split variant (bh < th) also matches
    monkeypatch.undo()
    monkeypatch.setenv("LFI_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(q, "_pick_bh", lambda th, tw, budget=0: 8)
    got_b = np.asarray(
        q.assemble_quilt.__wrapped__(views, cols=2, rows=3)
    )
    np.testing.assert_array_equal(got_b, want)


# ---------------------------------------------------------------------------
# VMAF parse path (reference: scripts/imageQualityMetrics.sh:10-11).
# ffmpeg/libvmaf is absent in this environment, so the subprocess + parse
# path is exercised end-to-end against a fake ffmpeg that reproduces the
# real filter's output format (vf_libvmaf logs "VMAF score: %f" to stderr;
# standalone libvmaf v1 printed "VMAF score = %f" — both canned below).


def _write_fake_ffmpeg(tmp_path, vmaf_line):
    script = tmp_path / "ffmpeg"
    script.write_text(
        "#!/bin/sh\n"
        'if [ "$2" = "-filters" ]; then\n'
        '  echo " ... V->V       libvmaf           Calculate the VMAF"\n'
        "  exit 0\n"
        "fi\n"
        f"echo '{vmaf_line}' >&2\n"
        "exit 0\n"
    )
    script.chmod(0o755)
    return str(script)


@pytest.mark.parametrize(
    "line, want",
    [
        # ffmpeg vf_libvmaf (all released versions): "VMAF score: %f"
        ("[Parsed_libvmaf_0 @ 0x5600a1b2c3d0] VMAF score: 92.345678", 92.345678),
        # libvmaf v1 standalone / vmafossexec format
        ("VMAF score = 76.668905", 76.668905),
        # integer score edge case
        ("[libvmaf @ 0x7f] VMAF score: 100", 100.0),
    ],
)
def test_vmaf_regex_real_formats(line, want):
    m = metrics._VMAF_RE.search(line)
    assert m is not None
    assert float(m.group(1)) == pytest.approx(want)


def test_vmaf_end_to_end_fake_ffmpeg(tmp_path, rng):
    from lfinterpolator_tpu.io import codec

    a = tmp_path / "a.png"
    b = tmp_path / "b.png"
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    codec.encode_png(str(a), img)
    codec.encode_png(str(b), img)

    fake = _write_fake_ffmpeg(
        tmp_path, "[Parsed_libvmaf_0 @ 0x5600a1b2c3d0] VMAF score: 92.345678"
    )
    assert metrics.vmaf_available(fake)
    score = metrics.vmaf(str(a), str(b), ffmpeg=fake)
    assert score == pytest.approx(92.345678)
    # compare_files should surface it under the "vmaf" key
    got = metrics.compare_files(str(a), str(b), with_vmaf=True)
    assert got["psnr"] == float("inf")
    # compare_files uses the default "ffmpeg" binary, absent here -> no key,
    # proving the graceful-skip branch alongside the parse branch
    assert "vmaf" not in got or isinstance(got["vmaf"], float)


def test_vmaf_unparseable_output_returns_none(tmp_path, rng):
    from lfinterpolator_tpu.io import codec

    a = tmp_path / "a.png"
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    codec.encode_png(str(a), img)
    fake = _write_fake_ffmpeg(tmp_path, "frame I/O summary, no score here")
    assert metrics.vmaf(str(a), str(a), ffmpeg=fake) is None


def test_vmaf_missing_binary_returns_none(tmp_path):
    assert metrics.vmaf("x.png", "y.png", ffmpeg=str(tmp_path / "nope")) is None
    assert not metrics.vmaf_available(str(tmp_path / "nope"))
