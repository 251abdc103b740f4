"""Offline tamper-mask extraction from before/after image pairs — rebuild of
the reference's mask.py:5-70 (`getMaskImage`): per-pixel |before−after|
thresholding + dilation cleanup, for building real-world eval sets.

Usage:
    python scripts/extract_masks.py --before <dir> --after <dir> --out <dir> \
        [--thresh 30]
"""

import argparse
import os

import numpy as np
import cv2


def mask_from_pair(before, after, thresh=30):
    diff = np.abs(before.astype(np.int32) - after.astype(np.int32)).sum(axis=-1)
    mask = (diff > thresh).astype(np.uint8) * 255
    kernel = np.ones((3, 3), np.uint8)
    mask = cv2.dilate(mask, kernel, iterations=1)
    mask = cv2.erode(mask, kernel, iterations=1)
    return mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--before", required=True)
    ap.add_argument("--after", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--thresh", type=int, default=30)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in sorted(os.listdir(args.before)):
        bp = os.path.join(args.before, name)
        apath = os.path.join(args.after, name)
        if not os.path.exists(apath):
            continue
        b = cv2.imread(bp, cv2.IMREAD_COLOR)
        a = cv2.imread(apath, cv2.IMREAD_COLOR)
        if b is None or a is None or b.shape != a.shape:
            continue
        cv2.imwrite(os.path.join(args.out, name),
                    mask_from_pair(b, a, args.thresh))
    print("done")


if __name__ == "__main__":
    main()
