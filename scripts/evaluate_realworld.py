"""Real-world folder-protocol evaluation — rebuild of the reference's
`train.py -val 1` path (train.py:110-127 → IRNclr_model.evaluate:765-905):
walk ori/immunized/tampered/mask folders, immunize where missing, attack,
localize + reverse, save recovered images and predicted masks for offline
scoring by scripts/calculate_f1.py.

Usage:
    python scripts/evaluate_realworld.py --ckpt <dir> --step N \
        --ori <dir> [--immu <dir>] --tamper <dir> --mask <dir> --out <dir>
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--ori", required=True)
    ap.add_argument("--immu", default=None)
    ap.add_argument("--tamper", required=True)
    ap.add_argument("--mask", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import cv2
    from vwfd_tpu.config import Config, DataConfig
    from vwfd_tpu.models.image_model import ImageImmunizationModel, ImageBatch
    from vwfd_tpu.models.state import restore_checkpoint, latest_step
    from vwfd_tpu.utils import save_image

    cfg = Config(data=DataConfig(gt_size=args.size))
    model = ImageImmunizationModel(cfg, task="clr")
    key = jax.random.PRNGKey(0)
    states = model.init_states(key)
    step = args.step or latest_step(args.ckpt)
    if step is not None:
        states = restore_checkpoint(args.ckpt, step, states)

    os.makedirs(os.path.join(args.out, "recovered"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "predicted_masks"), exist_ok=True)

    def load(path, gray=False):
        flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
        img = cv2.imread(path, flag)
        if img is None:
            return None
        if not gray:
            img = img[:, :, ::-1]
        img = cv2.resize(img, (args.size, args.size))
        img = img.astype(np.float32) / 255.0
        return img[..., None] if gray else img

    for name in sorted(os.listdir(args.ori)):
        ori = load(os.path.join(args.ori, name))
        msk = load(os.path.join(args.mask, name), gray=True)
        if ori is None or msk is None:
            continue
        gray = cv2.cvtColor((ori * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
        canny = (cv2.Canny(gray, 100, 200).astype(np.float32) / 255.0)[..., None]
        batch = ImageBatch(jnp.asarray(ori[None]), jnp.asarray(canny[None]),
                           jnp.asarray(msk[None]))
        tam = load(os.path.join(args.tamper, name))
        prev = jnp.asarray(tam[None]) if tam is not None else batch.image
        key, k = jax.random.split(key)
        out = model.eval_step(states, batch, prev, k)
        save_image(np.asarray(out["recovered"][0]),
                   os.path.join(args.out, "recovered", name))
        save_image(np.asarray(out["predicted_mask"][0]),
                   os.path.join(args.out, "predicted_masks", name))
        per_attack = " ".join("%.3f" % float(v) for v in out["f1_per_attack"])
        print(name, "psnr_fw=%.2f psnr_bw=%.2f f1=%.3f f1_per_attack=[%s]" % (
            float(out["psnr_forward"]), float(out["psnr_backward"]),
            float(out["f1_best"]), per_attack))


if __name__ == "__main__":
    main()
