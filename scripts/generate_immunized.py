"""Batch immunization export — rebuild of the reference's
`only_gen_immunized` protocol (models/IRNp_model.py:461-491): walk an image
folder, embed the watermark into every image with the 4-channel INN
(RGB + canny), and write the immunized images (rounded to 8-bit like the
reference's `(x*255).round()/255` save) for the real-world evaluation
pipeline (scripts/evaluate_realworld.py consumes them via --immu).

Usage:
    python scripts/generate_immunized.py --ckpt <dir> [--step N] \
        --ori <dir> --out <dir> [--size 512] [--task pami|clr|imuge]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (optional: random-init export "
                         "otherwise, useful for pipeline smoke tests)")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--ori", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--task", default="pami",
                    choices=["pami", "clr", "imuge"])
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import cv2
    from vwfd_tpu.config import Config, DataConfig
    from vwfd_tpu.models.image_model import ImageImmunizationModel
    from vwfd_tpu.models.state import restore_checkpoint, latest_step
    from vwfd_tpu.utils import save_image

    cfg = Config(data=DataConfig(gt_size=args.size))
    model = ImageImmunizationModel(cfg, task=args.task)
    states = model.init_states(jax.random.PRNGKey(0))
    if args.ckpt:
        step = args.step or latest_step(args.ckpt)
        if step is not None:
            states = restore_checkpoint(args.ckpt, step, states)

    os.makedirs(args.out, exist_ok=True)
    params = {k: s.params for k, s in states.items()}

    @jax.jit
    def immunize(img, canny):
        fwd_rgb, _ = model._embed_p(params, states, img, canny)
        return fwd_rgb

    names, imgs, cannies = [], [], []

    def flush():
        if not names:
            return
        img = jnp.asarray(np.stack(imgs))
        canny = jnp.asarray(np.stack(cannies))
        out = np.asarray(immunize(img, canny))
        # 8-bit round on save, as the reference writes `(x*255).round()`
        for n, im in zip(names, out):
            save_image(np.clip(im, 0, 1), os.path.join(args.out, n))
            print("immunized", n)
        names.clear(), imgs.clear(), cannies.clear()

    for name in sorted(os.listdir(args.ori)):
        img = cv2.imread(os.path.join(args.ori, name), cv2.IMREAD_COLOR)
        if img is None:
            continue
        img = cv2.resize(img[:, :, ::-1], (args.size, args.size))
        img = img.astype(np.float32) / 255.0
        gray = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
        canny = (cv2.Canny(gray, 100, 200).astype(np.float32) / 255.0)[..., None]
        base = os.path.splitext(name)[0] + ".png"
        names.append(base)
        imgs.append(img)
        cannies.append(canny)
        if len(names) == args.batch:
            flush()
    flush()


if __name__ == "__main__":
    main()
