#!/usr/bin/env python
"""PSNR/SSIM for every same-named image in two directories
(reference: scripts/compareDirs.sh).

Usage: compare_dirs.py DIR_A DIR_B [--json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lfinterpolator_tpu.io import codec
from lfinterpolator_tpu.utils import metrics


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    as_json = "--json" in sys.argv
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    dir_a, dir_b = args
    names = sorted(
        set(os.listdir(dir_a)) & set(os.listdir(dir_b))
    )
    names = [n for n in names if n.lower().endswith((".png", ".jpg", ".jpeg"))]
    if not names:
        print("No matching image filenames.", file=sys.stderr)
        return 1
    results = {}
    for n in names:
        a = codec.decode(os.path.join(dir_a, n))[:, :, :3]
        b = codec.decode(os.path.join(dir_b, n))[:, :, :3]
        results[n] = metrics.compare_images(a, b)
        if not as_json:
            print(f"{n} {results[n]['psnr']:.4f} {results[n]['ssim']:.6f}")
    if as_json:
        import math

        def enc(v):  # identical pairs give inf PSNR; keep the JSON valid
            return v if math.isfinite(v) else "inf"

        avg_psnr = sum(r["psnr"] for r in results.values()) / len(results)
        avg_ssim = sum(r["ssim"] for r in results.values()) / len(results)
        print(json.dumps({
            "files": {
                n: {k: enc(v) for k, v in r.items()} for n, r in results.items()
            },
            "avg_psnr": enc(avg_psnr),
            "avg_ssim": enc(avg_ssim),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
