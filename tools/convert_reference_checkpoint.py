"""Convert reference PyTorch checkpoints (.pth) into vwfd_tpu params.

Supports the two nets the flagship saves (models/IRNcrop_model.py:920-930):
  * `netG`       — Inveritible_Decolorization_PAMI → `InvertibleNet(fused_st=False)`
  * `generator`  — network/UNet.py UNet             → `UNet`

Key maps (reference module tree, models/invertible_net.py:476-531):
  operations_down = [Haar, coupling]×L  → down_blocks_{level}_{block}
  operations_up   = [HaarUp, coupling…] → up_blocks_{level}_{block}
  RNVPCouplingBlock.{s1,t1,s2,t2} = ResBlock(conv1..conv4 = Sequential(conv,
  ELU) → `convK.0.weight`; conv5 plain) → ResSubnet Conv_0..Conv_4.
  (DenseBlock subnets use plain `convK.weight` — handled too.)

Tensor layout: torch Conv2d OIHW → flax HWIO; ConvTranspose2d IOHW → HWIO.

Usage:
    python tools/convert_reference_checkpoint.py --netg 10000_netG.pth \
        --unet 10000_domain.pth --out converted/ [--frames 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _conv_w(t):
    """torch Conv2d weight OIHW → flax HWIO."""
    return np.asarray(t).transpose(2, 3, 1, 0)


def _convT_w(t):
    """torch ConvTranspose2d weight IOHW → flax ConvTranspose HWIO.

    torch's transposed conv is the *convolution* adjoint, while
    lax.conv_transpose (flax default, transpose_kernel=False) correlates —
    so the spatial taps must be flipped."""
    return np.asarray(t).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def _strip_module(sd):
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _subnet_params(sd, prefix):
    """One ResBlock/DenseBlock subnet → {Conv_i: {kernel, bias}}."""
    out = {}
    for i in range(5):
        tk = f"{prefix}.conv{i + 1}"
        wk = f"{tk}.0.weight" if f"{tk}.0.weight" in sd else f"{tk}.weight"
        bk = f"{tk}.0.bias" if f"{tk}.0.bias" in sd else f"{tk}.bias"
        p = {"kernel": _conv_w(sd[wk])}
        if bk in sd:
            p["bias"] = np.asarray(sd[bk])
        out[f"Conv_{i}"] = p
    return out


def convert_netg(sd, down_num=3, block_num=(1, 1, 1)):
    """Inveritible_Decolorization_PAMI state dict → InvertibleNet params
    (construct the target with `fused_st=False` and matching config)."""
    sd = _strip_module(sd)
    params = {}
    # operations_down: [Haar, c]*down_num with block_num couplings per level
    idx = 0
    for level in range(down_num):
        idx += 1  # skip HaarDownsampling (fixed weights; ours is param-free)
        for blk in range(block_num[level]):
            mod = {}
            for name in ("s1", "t1", "s2", "t2"):
                mod[name] = _subnet_params(sd, f"operations_down.{idx}.{name}")
            params[f"down_blocks_{level}_{blk}"] = mod
            idx += 1
    up_sched = list(block_num[:-1])[::-1] + [0]
    idx = 0
    for level in range(down_num):
        idx += 1  # skip HaarUpsampling
        for blk in range(up_sched[level]):
            mod = {}
            for name in ("s1", "t1", "s2", "t2"):
                mod[name] = _subnet_params(sd, f"operations_up.{idx}.{name}")
            params[f"up_blocks_{level}_{blk}"] = mod
            idx += 1
    return {"params": params}


_UNET_BLOCKS = [("encoder1", "enc1"), ("encoder2", "enc2"),
                ("encoder3", "enc3"), ("encoder4", "enc4"),
                ("bottleneck", "bottleneck"),
                ("decoder4", "dec4"), ("decoder3", "dec3"),
                ("decoder2", "dec2"), ("decoder1", "dec1")]
_UNET_UPS = [("upconv4", "up4"), ("upconv3", "up3"),
             ("upconv2", "up2"), ("upconv1", "up1")]


def convert_unet(sd):
    """network/UNet.py state dict → our UNet {params, batch_stats}."""
    sd = _strip_module(sd)
    params, stats = {}, {}
    for tname, fname in _UNET_BLOCKS:
        p, s = {}, {}
        for i in (1, 2):
            p[f"Conv_{i - 1}"] = {
                "kernel": _conv_w(sd[f"{tname}.{fname}conv{i}.weight"])}
            p[f"BatchNorm_{i - 1}"] = {
                "scale": np.asarray(sd[f"{tname}.{fname}norm{i}.weight"]),
                "bias": np.asarray(sd[f"{tname}.{fname}norm{i}.bias"])}
            s[f"BatchNorm_{i - 1}"] = {
                "mean": np.asarray(sd[f"{tname}.{fname}norm{i}.running_mean"]),
                "var": np.asarray(sd[f"{tname}.{fname}norm{i}.running_var"])}
        params[fname] = p
        stats[fname] = s
    for tname, fname in _UNET_UPS:
        params[fname] = {"kernel": _convT_w(sd[f"{tname}.weight"]),
                         "bias": np.asarray(sd[f"{tname}.bias"])}
    params["head"] = {"kernel": _conv_w(sd["conv.weight"]),
                      "bias": np.asarray(sd["conv.bias"])}
    return {"params": params, "batch_stats": stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--netg", type=str, default=None, help="*_netG.pth")
    ap.add_argument("--unet", type=str, default=None,
                    help="*_domain.pth (the UNet 'generator')")
    ap.add_argument("--out", required=True)
    ap.add_argument("--down-num", type=int, default=3)
    ap.add_argument("--block-num", type=int, nargs="+", default=[1, 1, 1])
    args = ap.parse_args()

    import torch

    os.makedirs(args.out, exist_ok=True)
    if args.netg:
        sd = torch.load(args.netg, map_location="cpu")
        tree = convert_netg({k: v.numpy() for k, v in sd.items()},
                            args.down_num, tuple(args.block_num))
        np.savez(os.path.join(args.out, "netG.npz"),
                 **_flatten(tree))
        print("netG converted")
    if args.unet:
        sd = torch.load(args.unet, map_location="cpu")
        tree = convert_unet({k: v.numpy() for k, v in sd.items()})
        np.savez(os.path.join(args.out, "generator.npz"), **_flatten(tree))
        print("generator (UNet) converted")


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def load_npz_tree(path):
    """Inverse of the npz flattening — returns a nested dict."""
    flat = np.load(path)
    tree = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


if __name__ == "__main__":
    main()
