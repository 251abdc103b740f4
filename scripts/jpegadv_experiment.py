"""JPEG-vs-adversarial-example study driver — condensed rebuild of
jpegadv/targeted_compress.py:25-189 and untargeted_compress.py: attack a
victim classifier (FGSM / IGSM / targeted-IGSM / JPEG-resistant), then sweep
a JPEG quality list over both the clean and the adversarial image, recording
accuracy, targeted-hit rate, PSNR-to-clean, PSNR-to-adv and L2 per quality.
Real libjpeg (PIL) is the compressor, like the reference's
`jpgcompress.normalJpegCompress`.

Usage:
    python scripts/jpegadv_experiment.py --victim A --attack igsm \
        [--targeted] [--images <folder>] [--n 16] [--out results.json]
Without --images it runs on seeded synthetic images (no datasets ship in
this environment).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--victim", default="A", choices=["A", "B", "C"])
    ap.add_argument("--attack", default="igsm",
                    choices=["fgsm", "igsm", "jpeg_resistant"])
    ap.add_argument("--targeted", action="store_true")
    ap.add_argument("--images", default=None)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--classes", type=int, default=10)
    ap.add_argument("--epsilon", type=float, default=0.03)
    ap.add_argument("--qualities", type=int, nargs="+",
                    default=[90, 70, 50, 30, 10])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from vwfd_tpu import adversarial as adv
    from vwfd_tpu.attacks.jpeg import jpeg_real
    from vwfd_tpu.metrics import psnr255_int

    model = adv.VICTIMS[args.victim](num_classes=args.classes)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, args.size, args.size, 3)))

    if args.images:
        import cv2
        files = sorted(os.listdir(args.images))[:args.n]
        imgs = []
        for f in files:
            im = cv2.imread(os.path.join(args.images, f), cv2.IMREAD_COLOR)
            if im is None:
                continue
            im = cv2.resize(im[:, :, ::-1], (args.size, args.size))
            imgs.append(im.astype(np.float32) / 255.0)
        images = np.stack(imgs)
    else:
        images = rng.random((args.n, args.size, args.size, 3)).astype(np.float32)

    logits_fn = jax.jit(lambda x: model.apply(params, x))
    labels = np.argmax(np.asarray(logits_fn(jnp.asarray(images))), axis=1)

    def ce_of(label):
        def loss(x):
            lg = model.apply(params, x[None] if x.ndim == 3 else x)
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                lg, jnp.full((lg.shape[0],), label)))
        return loss

    rows = []
    for i in range(images.shape[0]):
        img = jnp.asarray(images[i])
        label = int(labels[i])
        lg = np.asarray(logits_fn(img[None]))[0]
        target = int(np.argmin(lg))  # targeted_compress.py: argmin logit
        if args.targeted:
            advpic = adv.igsm_targeted(ce_of(target), img,
                                       epsilon=args.epsilon)
        elif args.attack == "fgsm":
            advpic = adv.fgsm(ce_of(label), img, epsilon=args.epsilon)
        elif args.attack == "jpeg_resistant":
            advpic = adv.jpeg_resistant_fgsm(ce_of(label), img,
                                             epsilon=args.epsilon)
        else:
            advpic = adv.igsm(ce_of(label), img, epsilon=args.epsilon)

        adv_np = np.asarray(advpic)
        row = {"id": i, "label": label, "target": target,
               "adv_label": int(np.argmax(np.asarray(
                   logits_fn(advpic[None]))[0])),
               "adv_psnr": float(psnr255_int(img[None], advpic[None])),
               "adv_l2": float(np.sqrt(np.mean((adv_np - images[i]) ** 2))),
               "sweep": {}}
        for variant, base in (("jpg_pic", images[i]), ("jpg_adv", adv_np)):
            per_q = []
            for q in args.qualities:
                jp = jpeg_real(base, q)
                pl = int(np.argmax(np.asarray(
                    logits_fn(jnp.asarray(jp)[None]))[0]))
                per_q.append({
                    "q": q, "label": pl, "acc": int(pl == label),
                    "target_hit": int(pl == target),
                    "psnr_with_pic": float(psnr255_int(
                        jnp.asarray(images[i])[None], jnp.asarray(jp)[None])),
                    "psnr_with_adv": float(psnr255_int(
                        jnp.asarray(adv_np)[None], jnp.asarray(jp)[None])),
                    "l2_with_pic": float(np.sqrt(np.mean((jp - images[i]) ** 2))),
                })
            row["sweep"][variant] = per_q
        rows.append(row)
        print(f"[{i}] label={label} adv={row['adv_label']} "
              f"target={target} psnr={row['adv_psnr']:.1f}")

    summary = {
        "victim": args.victim, "attack": args.attack,
        "targeted": args.targeted, "qualities": args.qualities,
        "adv_fooled_rate": float(np.mean(
            [r["adv_label"] != r["label"] for r in rows])),
        "adv_target_rate": float(np.mean(
            [r["adv_label"] == r["target"] for r in rows])),
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
