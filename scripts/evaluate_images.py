"""Legacy image-quality evaluation — rebuild of the reference's root
`test.py:29-167`: loop a folder of (ground-truth, processed) image pairs,
report PSNR/SSIM and their Y-channel variants, and running averages.

Usage:
    python scripts/evaluate_images.py --gt <dir> --pred <dir> [--crop 4]
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
    ap.add_argument("--crop", type=int, default=0,
                    help="border crop before scoring (test.py scale border)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from vwfd_tpu.metrics import psnr255_int, ssim
    from vwfd_tpu.ops.color import rgb_to_y_bt601

    sums = {"psnr": 0.0, "ssim": 0.0, "psnr_y": 0.0, "ssim_y": 0.0}
    n = 0
    for name in sorted(os.listdir(args.gt)):
        gp, pp = os.path.join(args.gt, name), os.path.join(args.pred, name)
        if not os.path.exists(pp):
            continue
        gt = np.asarray(Image.open(gp).convert("RGB"), np.float32) / 255.0
        pr = np.asarray(Image.open(pp).convert("RGB"), np.float32) / 255.0
        if gt.shape != pr.shape:
            continue
        c = args.crop
        if c:
            gt, pr = gt[c:-c, c:-c], pr[c:-c, c:-c]
        g, p = jnp.asarray(gt[None]), jnp.asarray(pr[None])
        gy = rgb_to_y_bt601(g)[..., None]
        py = rgb_to_y_bt601(p)[..., None]
        vals = {
            "psnr": float(psnr255_int(g, p)),
            "ssim": float(ssim(g, p)),
            "psnr_y": float(psnr255_int(gy, py)),
            "ssim_y": float(ssim(gy, py)),
        }
        n += 1
        for k, v in vals.items():
            sums[k] += v
        print(f"{name}: " + " ".join(f"{k}={v:.4f}" for k, v in vals.items()))
    if n:
        print("---- averages over", n, "images ----")
        for k, v in sums.items():
            print(f"{k}: {v / n:.4f}")


if __name__ == "__main__":
    main()
