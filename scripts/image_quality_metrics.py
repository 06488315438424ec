#!/usr/bin/env python
"""PSNR/SSIM/VMAF of one image pair (reference: scripts/imageQualityMetrics.sh).

Usage: image_quality_metrics.py INPUT REFERENCE
Prints: "<psnr_db> <ssim> [<vmaf>]" (ffmpeg-style one-liner). PSNR and SSIM
are computed self-contained; VMAF (a learned metric tied to the libvmaf
model, scripts/imageQualityMetrics.sh:10-11) shells out to an ffmpeg with
libvmaf and is omitted from the line when none is available.
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
    line = f"{metrics.psnr(a, b):.6f} {metrics.ssim(a, b):.6f}"
    score = metrics.vmaf(sys.argv[1], sys.argv[2])
    if score is not None:
        line += f" {score:.6f}"
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
