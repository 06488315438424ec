#!/usr/bin/env python
"""PSNR/SSIM (+VMAF when an ffmpeg with libvmaf is available) for every
same-named image in two directories (reference: scripts/compareDirs.sh).

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
    use_vmaf = metrics.vmaf_available()
    results = {}
    for n in names:
        pa, pb = os.path.join(dir_a, n), os.path.join(dir_b, n)
        a = codec.decode(pa)[:, :, :3]
        b = codec.decode(pb)[:, :, :3]
        results[n] = metrics.compare_images(a, b)
        if use_vmaf:
            score = metrics.vmaf(pa, pb)
            if score is not None:
                results[n]["vmaf"] = score
        if not as_json:
            line = f"{n} {results[n]['psnr']:.4f} {results[n]['ssim']:.6f}"
            if "vmaf" in results[n]:
                line += f" {results[n]['vmaf']:.4f}"
            print(line)
    if as_json:
        import math

        def enc(v):  # identical pairs give inf PSNR; keep the JSON valid
            return v if math.isfinite(v) else "inf"

        avg_psnr = sum(r["psnr"] for r in results.values()) / len(results)
        avg_ssim = sum(r["ssim"] for r in results.values()) / len(results)
        payload = {
            "files": {
                n: {k: enc(v) for k, v in r.items()} for n, r in results.items()
            },
            "avg_psnr": enc(avg_psnr),
            "avg_ssim": enc(avg_ssim),
        }
        vmafs = [r["vmaf"] for r in results.values() if "vmaf" in r]
        if vmafs:
            payload["avg_vmaf"] = enc(sum(vmafs) / len(vmafs))
        print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
