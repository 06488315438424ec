#!/usr/bin/env python
"""PSNR/SSIM of one image pair (reference: scripts/imageQualityMetrics.sh).

Usage: image_quality_metrics.py INPUT REFERENCE
Prints: "<psnr_db> <ssim>" (ffmpeg-style one-liner; VMAF is not reproduced --
it needs the libvmaf model, out of scope for a self-contained repo).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfinterpolator_tpu.io import codec
from lfinterpolator_tpu.utils import metrics


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    a = codec.decode(sys.argv[1])[:, :, :3]
    b = codec.decode(sys.argv[2])[:, :, :3]
    print(f"{metrics.psnr(a, b):.6f} {metrics.ssim(a, b):.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
