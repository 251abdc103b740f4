"""Offline splice composer — rebuild of the reference's models/test.py:24-40:
out = mask·source + (1−mask)·target over folders of aligned images.

Usage:
    python scripts/compose_splice.py --source <dir> --target <dir> \
        --mask <dir> --out <dir>
"""

import argparse
import os

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--target", required=True)
    ap.add_argument("--mask", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in sorted(os.listdir(args.source)):
        paths = [os.path.join(d, name) for d in (args.source, args.target, args.mask)]
        if not all(os.path.exists(p) for p in paths):
            continue
        src = np.asarray(Image.open(paths[0]).convert("RGB"), np.float32)
        tgt = np.asarray(Image.open(paths[1]).convert("RGB"), np.float32)
        m = np.asarray(Image.open(paths[2]).convert("L"), np.float32)[..., None] / 255.0
        out = m * src + (1 - m) * tgt
        Image.fromarray(out.astype(np.uint8)).save(os.path.join(args.out, name))
    print("done")


if __name__ == "__main__":
    main()
