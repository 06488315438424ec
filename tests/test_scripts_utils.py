"""Tests for the evaluation scripts and profiling utilities."""

import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from lfinterpolator_tpu.io import codec
from lfinterpolator_tpu.utils import profiling

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def _write(tmp_path, name, arr):
    p = str(tmp_path / name)
    codec.encode_png(p, arr)
    return p


def test_image_quality_metrics_script(tmp_path, rng):
    a = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    pa = _write(tmp_path, "a.png", a)
    out = subprocess.run(
        [sys.executable, f"{REPO}/scripts/image_quality_metrics.py", pa, pa],
        capture_output=True, text=True, env=ENV,
    )
    assert out.returncode == 0
    psnr, ssim = out.stdout.split()
    assert psnr == "inf" and float(ssim) == pytest.approx(1.0)


def test_compare_dirs_script(tmp_path, rng):
    d1 = tmp_path / "d1"; d2 = tmp_path / "d2"
    d1.mkdir(); d2.mkdir()
    img = rng.integers(0, 256, (12, 12, 4), dtype=np.uint8)
    _write(d1, "x.png", img)
    noisy = np.clip(img.astype(int) + rng.integers(-3, 4, img.shape), 0, 255).astype(np.uint8)
    _write(d2, "x.png", noisy)
    out = subprocess.run(
        [sys.executable, f"{REPO}/scripts/compare_dirs.py", str(d1), str(d2), "--json"],
        capture_output=True, text=True, env=ENV,
    )
    assert out.returncode == 0
    data = json.loads(out.stdout)
    assert "x.png" in data["files"] and data["avg_psnr"] > 30


def test_views_to_quilt_script(tmp_path, rng):
    d = tmp_path / "views"; d.mkdir()
    for i in range(6):
        _write(d, f"{i:02d}.png", rng.integers(0, 256, (8, 10, 4), dtype=np.uint8))
    out = subprocess.run(
        [sys.executable, f"{REPO}/scripts/views_to_quilt.py", str(d),
         "--cols", "3", "--rows", "2"],
        capture_output=True, text=True, env=ENV,
    )
    assert out.returncode == 0, out.stderr
    q = codec.decode(str(d / "quilt.png"))
    assert q.shape == (16, 30, 4)


def test_benchmark_harness():
    calls = []

    def step(i):
        calls.append(i)
        return jnp.ones((4,)) * i

    res = profiling.benchmark(step, out_pixels=1000, runs=5, warmup=2)
    assert len(res.times_s) == 5
    assert len(calls) == 7
    assert res.gpixels_per_s > 0
    assert set(res.to_dict()) == {"runs", "avg_ms", "min_ms", "gpixels_per_s"}


def test_timer_sync():
    with profiling.Timer() as t:
        x = t.sync(jnp.arange(10) * 2)
    assert t.elapsed_s >= 0
    assert int(x.sum()) == 90
