#!/usr/bin/env python
"""Animate a rendered view directory into a looping GIF preview.

The reference offers no preview tooling; this turns the 64-view output of a
render into a back-and-forth parallax sweep for quick visual inspection.

Usage: make_preview.py VIEW_DIR [OUT.gif] [--fps 24] [--scale 0.5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("view_dir")
    p.add_argument("out", nargs="?", default=None)
    p.add_argument("--fps", type=float, default=24.0)
    p.add_argument("--scale", type=float, default=1.0)
    args = p.parse_args()

    try:
        from PIL import Image
    except ImportError:
        print("make_preview.py needs Pillow", file=sys.stderr)
        return 1

    names = sorted(
        n for n in os.listdir(args.view_dir)
        if n.lower().endswith(".png") and n[:-4].isdigit()
    )
    if not names:
        print(f"No numbered view PNGs in {args.view_dir}", file=sys.stderr)
        return 1
    frames = []
    for n in names:
        im = Image.open(os.path.join(args.view_dir, n)).convert("RGB")
        if args.scale != 1.0:
            im = im.resize(
                (max(1, int(im.width * args.scale)),
                 max(1, int(im.height * args.scale)))
            )
        frames.append(im)
    # back-and-forth sweep
    seq = frames + frames[-2:0:-1]
    out = args.out or os.path.join(args.view_dir, "preview.gif")
    seq[0].save(
        out, save_all=True, append_images=seq[1:],
        duration=int(1000 / args.fps), loop=0,
    )
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
