"""Golden parity of the VGG19 import path against a real torch forward
(VERDICT r1 #7): port a torch VGG19 `features` state dict (random weights —
no pretrained weights exist in this environment) through
`load_torch_state_dict` and compare every reluX_Y activation.

Reference behavior being matched: loss.py:126-276 (PerceptualLoss/StyleLoss
over torchvision VGG19 feature taps).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vwfd_tpu.metrics.perceptual import (  # noqa: E402
    VGG19Features, load_torch_state_dict, perceptual_loss, style_loss,
)

# torchvision vgg19 `features` layout (conv indices 0,2,5,7,10,...)
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _torch_vgg19_features():
    layers, in_ch = [], 3
    for v in _CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = v
    return tnn.Sequential(*layers)


def test_vgg19_torch_activation_parity(rng):
    torch.manual_seed(0)
    net = _torch_vgg19_features().eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = load_torch_state_dict(sd)

    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    feats = VGG19Features().apply(params, jnp.asarray(x))

    acts = {}
    with torch.no_grad():
        cur = torch.from_numpy(x.transpose(0, 3, 1, 2))
        s, r = 1, 1
        for layer in net:
            cur = layer(cur)
            if isinstance(layer, tnn.ReLU):
                acts[f"relu{s}_{r}"] = cur.numpy().transpose(0, 2, 3, 1)
                r += 1
            elif isinstance(layer, tnn.MaxPool2d):
                s, r = s + 1, 1

    assert set(acts) == set(feats)
    for tap, ref in acts.items():
        got = np.asarray(feats[tap])
        scale = max(1.0, float(np.abs(ref).max()))
        diff = np.abs(got - ref).max() / scale
        assert diff < 1e-4, (tap, diff)


def test_perceptual_and_style_losses_with_ported_params(rng):
    torch.manual_seed(1)
    net = _torch_vgg19_features().eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = load_torch_state_dict(sd)
    a = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    p = float(perceptual_loss(a, b, params=params))
    s = float(style_loss(a, b, params=params))
    assert np.isfinite(p) and p > 0
    assert np.isfinite(s) and s > 0
    assert float(perceptual_loss(a, a, params=params)) < 1e-6


def test_vgg_npz_config_path(tmp_path, rng):
    """The pretrained-weights CLI path (VERDICT r2 missing #3): torch state
    dict → tools/convert_vgg19 npz → TrainConfig.vgg_weights → the image
    model's perceptual terms actually use those weights."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_vgg19 import state_dict_to_npz_dict

    from vwfd_tpu.metrics.perceptual import load_vgg_npz

    torch.manual_seed(1)
    net = _torch_vgg19_features().eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    path = tmp_path / "vgg19.npz"
    np.savez(path, **state_dict_to_npz_dict(sd))

    params = load_vgg_npz(str(path))
    ref = load_torch_state_dict(sd)
    for name, kv in ref["params"].items():
        np.testing.assert_array_equal(np.asarray(kv["kernel"]),
                                      np.asarray(params["params"][name]["kernel"]))

    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    l_pre = float(perceptual_loss(x, y, params=params))
    l_rand = float(perceptual_loss(x, y))  # seeded-random fallback
    assert np.isfinite(l_pre) and l_pre != l_rand

    # and through the typed config into the model
    from vwfd_tpu.config import Config, TrainConfig
    from vwfd_tpu.models.image_model import ImageImmunizationModel

    cfg = Config(train=TrainConfig(vgg_weights=str(path)))
    model = ImageImmunizationModel(cfg, task="pami")
    assert model.vgg_params is not None
    np.testing.assert_array_equal(
        np.asarray(model.vgg_params["params"]["conv1_1"]["kernel"]),
        np.asarray(params["params"]["conv1_1"]["kernel"]))
