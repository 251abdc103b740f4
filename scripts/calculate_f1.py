"""Offline F1 threshold-sweep scorer over predicted vs GT mask folders —
CLI rebuild of the reference's calculate_f1.py:41-72 (per-image pixel F1 at
thresholds 0.1..0.9, per-threshold averages, binarized dumps).

Usage:
    python scripts/calculate_f1.py --gt <gt_masks/> --pred <predicted_masks/> \
        [--save <out/>]
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", required=True)
    ap.add_argument("--pred", required=True)
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from vwfd_tpu.metrics import mask_confusion, f1_from_confusion

    files = sorted(os.listdir(args.gt))
    print(f"found {len(files)} images")
    thresholds = np.round(np.arange(0.1, 0.95, 0.1), 1)
    sums = {t: 0.0 for t in thresholds}
    n = 0
    for name in files:
        gp = os.path.join(args.gt, name)
        pp = os.path.join(args.pred, name)
        if not os.path.exists(pp):
            continue
        gt = np.asarray(Image.open(gp).convert("L"), np.float32) / 255.0
        pred = np.asarray(Image.open(pp).convert("L"), np.float32) / 255.0
        n += 1
        for t in thresholds:
            tn, tp, fn, fp = mask_confusion(jnp.asarray(pred), jnp.asarray(gt), float(t))
            f1 = float(f1_from_confusion(tn, tp, fn, fp))
            sums[t] += f1
            if args.save:
                d = os.path.join(args.save, str(int(t * 10)))
                os.makedirs(d, exist_ok=True)
                binary = ((pred * 255 > int(255 * t)) * 255).astype(np.uint8)
                Image.fromarray(binary).save(os.path.join(d, name))
    for t in thresholds:
        print(f"thresh {t:.1f} : average F1 {sums[t] / max(n, 1):.4f}")


if __name__ == "__main__":
    main()
