"""End-to-end test of the scene regression harness (focusMapCompare parity)."""

import os
import subprocess
import sys

import numpy as np

from lfinterpolator_tpu.io import codec

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def test_focus_map_compare_harness(tmp_path, rng):
    # Two of the canonical scenes, tiny synthetic 6x6 grids (the harness's
    # focus search needs >=32 images by default; it runs with defaults, so
    # give it 36).
    root = tmp_path / "inputs"
    for scene in ("cornell", "bonfire"):
        d = root / scene
        d.mkdir(parents=True)
        tex = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
        for c in range(6):
            for r in range(6):
                img = np.zeros((64, 80, 4), np.uint8)
                img[:, :, :3] = tex[r * 2 : r * 2 + 64, c * 2 : c * 2 + 80]
                img[:, :, 3] = 255
                codec.encode_png(str(d / f"{c}_{r}.png"), img)

    out = subprocess.run(
        [
            sys.executable, f"{REPO}/scripts/focus_map_compare.py",
            "--input-root", str(root),
            "--out", str(tmp_path / "comparison"),
            "--scenes", "cornell,bonfire",
        ],
        capture_output=True, text=True, env=ENV, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for scene in ("cornell", "bonfire"):
        common = tmp_path / "comparison" / f"{scene}C" / "0.png"
        single = tmp_path / "comparison" / scene / "0.png"
        assert common.exists() and single.exists()
        a = codec.decode(str(common))
        b = codec.decode(str(single))
        assert a.shape == b.shape == (64, 80, 4)


def test_render_video_script(tmp_path, rng):
    root = tmp_path / "video"
    for f in range(3):
        d = root / f"frame{f:03d}"
        d.mkdir(parents=True)
        for c in range(2):
            for r in range(2):
                img = rng.integers(0, 256, (12, 16, 4), dtype=np.uint8)
                codec.encode_png(str(d / f"{c}_{r}.png"), img)
    out = tmp_path / "rendered"
    res = subprocess.run(
        [sys.executable, f"{REPO}/scripts/render_video.py",
         "-i", str(root), "-o", str(out), "-t", "0,0,1,1", "-m", "STD"],
        capture_output=True, text=True, env=ENV, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert sorted(os.listdir(out)) == ["frame_00000", "frame_00001", "frame_00002"]
    assert len(os.listdir(out / "frame_00001")) == 64
    # resume: a second run renders nothing new but succeeds
    res2 = subprocess.run(
        [sys.executable, f"{REPO}/scripts/render_video.py",
         "-i", str(root), "-o", str(out), "-t", "0,0,1,1", "-m", "STD",
         "--resume"],
        capture_output=True, text=True, env=ENV, timeout=600,
    )
    assert res2.returncode == 0 and "3 frames" in res2.stdout
