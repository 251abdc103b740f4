"""Golden parity of the exact dual up-sample head against the reference
formulation (network/SUNet_detail.py:334-390 UpSample) rebuilt in torch with
the same random weights — VERDICT r1 #8.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vwfd_tpu.nets.sunet import DualUpSample, pixel_shuffle  # noqa: E402


class _TorchUpSample(tnn.Module):
    """Verbatim behavioral copy of SUNet_detail.py UpSample (NCHW)."""

    def __init__(self, in_channels, scale_factor):
        super().__init__()
        self.factor = scale_factor
        if scale_factor == 2:
            self.conv = tnn.Conv2d(in_channels, in_channels // 2, 1, 1, 0,
                                   bias=False)
            self.up_p = tnn.Sequential(
                tnn.Conv2d(in_channels, 2 * in_channels, 1, 1, 0, bias=False),
                tnn.PReLU(), tnn.PixelShuffle(2),
                tnn.Conv2d(in_channels // 2, in_channels // 2, 1, 1, 0,
                           bias=False))
            self.up_b = tnn.Sequential(
                tnn.Conv2d(in_channels, in_channels, 1, 1, 0), tnn.PReLU(),
                tnn.Upsample(scale_factor=2, mode="bilinear",
                             align_corners=False),
                tnn.Conv2d(in_channels, in_channels // 2, 1, 1, 0, bias=False))
        else:
            self.conv = tnn.Conv2d(2 * in_channels, in_channels, 1, 1, 0,
                                   bias=False)
            self.up_p = tnn.Sequential(
                tnn.Conv2d(in_channels, 16 * in_channels, 1, 1, 0, bias=False),
                tnn.PReLU(), tnn.PixelShuffle(4),
                tnn.Conv2d(in_channels, in_channels, 1, 1, 0, bias=False))
            self.up_b = tnn.Sequential(
                tnn.Conv2d(in_channels, in_channels, 1, 1, 0), tnn.PReLU(),
                tnn.Upsample(scale_factor=4, mode="bilinear",
                             align_corners=False),
                tnn.Conv2d(in_channels, in_channels, 1, 1, 0, bias=False))

    def forward(self, x):
        return self.conv(torch.cat([self.up_p(x), self.up_b(x)], dim=1))


def _port(tm):
    def k(conv):  # (O, I, 1, 1) → HWIO
        return jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))
    p = {
        "up_p_conv1": {"kernel": k(tm.up_p[0])},
        "PReLU_0": {"negative_slope":
                    jnp.asarray(tm.up_p[1].weight.detach().numpy()[0])},
        "up_p_conv2": {"kernel": k(tm.up_p[3])},
        "up_b_conv1": {"kernel": k(tm.up_b[0]),
                       "bias": jnp.asarray(tm.up_b[0].bias.detach().numpy())},
        "PReLU_1": {"negative_slope":
                    jnp.asarray(tm.up_b[1].weight.detach().numpy()[0])},
        "up_b_conv2": {"kernel": k(tm.up_b[3])},
        "fuse": {"kernel": k(tm.conv)},
    }
    return {"params": p}


def test_pixel_shuffle_matches_torch(rng):
    x = rng.random((2, 4, 5, 18)).astype(np.float32)
    r = 3
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    ref = tnn.PixelShuffle(r)(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)


@pytest.mark.parametrize("factor,cin", [(2, 16), (4, 8)])
def test_dual_upsample_matches_reference(rng, factor, cin):
    torch.manual_seed(0)
    tm = _TorchUpSample(cin, factor).eval()
    m = DualUpSample(factor=factor)
    x = rng.random((1, 8, 8, cin)).astype(np.float32)
    params = _port(tm)
    # param-count parity
    ours_n = sum(np.prod(np.shape(v)) for lay in params["params"].values()
                 for v in lay.values())
    torch_n = sum(p.numel() for p in tm.parameters())
    assert ours_n == torch_n
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)
