"""Image quality metrics: PSNR and SSIM.

Python equivalent of the reference's ffmpeg-based evaluation
(reference: scripts/imageQualityMetrics.sh:6-9, which extracts ffmpeg's
`psnr` average and `ssim` All scores). Computed here directly so the quality
gates need no external tools.
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, max_value: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"Shape mismatch: {a.shape} vs {b.shape}")
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_value**2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return k / k.sum()


def _filter2d_valid(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' convolution with a 1-D kernel applied to both axes."""
    n = k.size
    # rows
    out = np.zeros((img.shape[0] - n + 1, img.shape[1]), dtype=np.float64)
    for i in range(n):
        out += k[i] * img[i : i + out.shape[0], :]
    out2 = np.zeros((out.shape[0], img.shape[1] - n + 1), dtype=np.float64)
    for i in range(n):
        out2 += k[i] * out[:, i : i + out2.shape[1]]
    return out2


def ssim(a: np.ndarray, b: np.ndarray, max_value: float = 255.0) -> float:
    """Structural similarity (Wang et al. 2004, 11x11 Gaussian window).

    Accepts [H, W] or [H, W, C] uint8/float; channel scores are averaged
    (ffmpeg's 'All').
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"Shape mismatch: {a.shape} vs {b.shape}")
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    k = _gaussian_kernel()
    scores = []
    for ch in range(a.shape[2]):
        x, y = a[:, :, ch], b[:, :, ch]
        mu_x = _filter2d_valid(x, k)
        mu_y = _filter2d_valid(y, k)
        mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
        sig_xx = _filter2d_valid(x * x, k) - mu_xx
        sig_yy = _filter2d_valid(y * y, k) - mu_yy
        sig_xy = _filter2d_valid(x * y, k) - mu_xy
        s = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
            (mu_xx + mu_yy + c1) * (sig_xx + sig_yy + c2)
        )
        scores.append(s.mean())
    return float(np.mean(scores))


def compare_images(a: np.ndarray, b: np.ndarray) -> dict[str, float]:
    return {"psnr": psnr(a, b), "ssim": ssim(a, b)}
