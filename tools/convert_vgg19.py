"""Convert torchvision's pretrained VGG19 feature weights to the `.npz`
consumed by `TrainConfig.vgg_weights` / `metrics.perceptual.load_vgg_npz`.

The reference builds its perceptual/style losses on torchvision's pretrained
VGG19 (reference loss.py:155-178). This environment has no egress, so the
conversion runs wherever the weights exist:

    # with torchvision + internet:
    python tools/convert_vgg19.py --out vgg19_features.npz
    # or from an already-downloaded state dict (.pth of vgg19().features):
    python tools/convert_vgg19.py --pth vgg19_features.pth --out vgg19.npz

then train with `train.vgg_weights: vgg19.npz` in the YAML config.
"""

import argparse

import numpy as np

# keep in sync with vwfd_tpu.metrics.perceptual._STAGES
_STAGES = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))


def state_dict_to_npz_dict(state_dict):
    """torchvision `vgg19().features` state dict (numpy, OIHW, keys like
    '0.weight') → flat dict of HWIO kernels keyed `conv{s}_{r}.kernel/.bias`."""
    order = []
    for s, (_, reps) in enumerate(_STAGES, start=1):
        for r in range(1, reps + 1):
            order.append(f"conv{s}_{r}")
    idxs = sorted({int(k.split(".")[0]) for k in state_dict
                   if k.endswith("weight")})
    assert len(idxs) == len(order), (len(idxs), len(order))
    out = {}
    for name, idx in zip(order, idxs):
        w = np.asarray(state_dict[f"{idx}.weight"])  # (O, I, kh, kw)
        b = np.asarray(state_dict[f"{idx}.bias"])
        out[f"{name}.kernel"] = w.transpose(2, 3, 1, 0)  # HWIO
        out[f"{name}.bias"] = b
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", default=None,
                    help="state dict of vgg19().features (skips the download)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch
    if args.pth:
        sd = torch.load(args.pth, map_location="cpu")
    else:
        from torchvision.models import vgg19, VGG19_Weights
        sd = vgg19(weights=VGG19_Weights.IMAGENET1K_V1).features.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}
    np.savez(args.out, **state_dict_to_npz_dict(sd))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
