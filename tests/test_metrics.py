"""Metric/loss parity tests vs torch-implemented oracles of the reference formulas."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vwfd_tpu import metrics as M


def test_psnr_int_semantics(rng):
    a = rng.random((2, 16, 16, 3), dtype=np.float32)
    b = np.clip(a + 0.03 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    got = float(M.psnr255_int(jnp.asarray(a), jnp.asarray(b)))
    # oracle: torch .int() truncates toward zero
    ta = (torch.from_numpy(a) * 255).int().float()
    tb = (torch.from_numpy(b) * 255).int().float()
    mse = torch.mean((ta - tb) ** 2)
    want = float(20 * torch.log10(torch.tensor(255.0)) - 10 * torch.log10(mse))
    assert abs(got - want) < 1e-3


def test_psnr_zero_mse_returns_zero(rng):
    a = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    assert float(M.psnr255_int(a, a)) == 0.0


def test_ssim_matches_torch_oracle(rng):
    a = rng.random((2, 3, 32, 32), dtype=np.float32)
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)

    # independent torch oracle of the 11x11 gaussian-window SSIM
    import math
    g = torch.tensor([math.exp(-((x - 5) ** 2) / (2 * 1.5 ** 2)) for x in range(11)])
    g = (g / g.sum()).float()
    win = (g[:, None] @ g[None, :]).expand(3, 1, 11, 11).contiguous()
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    mu1 = F.conv2d(ta, win, padding=5, groups=3)
    mu2 = F.conv2d(tb, win, padding=5, groups=3)
    s1 = F.conv2d(ta * ta, win, padding=5, groups=3) - mu1 ** 2
    s2 = F.conv2d(tb * tb, win, padding=5, groups=3) - mu2 ** 2
    s12 = F.conv2d(ta * tb, win, padding=5, groups=3) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    want = float((((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
                  ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean())

    got = float(M.ssim(jnp.asarray(np.moveaxis(a, 1, -1)),
                       jnp.asarray(np.moveaxis(b, 1, -1))))
    assert abs(got - want) < 1e-4


def test_ssim_identity_is_one(rng):
    a = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    assert abs(float(M.ssim(a, a)) - 1.0) < 1e-5


def test_f1_sweep_and_scores(rng):
    gt = (rng.random((64, 64)) > 0.7).astype(np.float32)
    pred = np.clip(gt + 0.3 * rng.standard_normal((64, 64)), 0, 1).astype(np.float32)
    ts, f1s = M.f1_sweep(jnp.asarray(pred), jnp.asarray(gt))
    assert f1s.shape == (9,)
    assert np.all(np.asarray(f1s) >= 0) and np.all(np.asarray(f1s) <= 1)

    # oracle at one threshold, following calculate_f1.py counting
    t = 0.5
    p = ((pred * 255).astype(np.uint8) > int(255 * t))
    g = ((gt * 255).astype(np.uint8) > int(255 * t))
    tp = np.sum(p & g); fp = np.sum(p & ~g); fn = np.sum(~p & g)
    want = 2 * tp / (2 * tp + fp + fn)
    scores = M.mask_scores(jnp.asarray(pred), jnp.asarray(gt), 0.5)
    assert abs(float(scores["F1"]) - want) < 1e-5
    tn = np.sum(~p & ~g)
    assert abs(float(scores["ACC"]) - (tp + tn) / p.size) < 1e-5


def test_edge_accuracy_perfect(rng):
    m = jnp.asarray((rng.random((1, 16, 16, 1)) > 0.5).astype(np.float32))
    p, r = M.edge_accuracy(m, m)
    assert float(p) > 0.99 and float(r) > 0.99


def test_bce_with_logits_matches_torch(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    t = (rng.random((4, 8)) > 0.5).astype(np.float32)
    want = float(F.binary_cross_entropy_with_logits(torch.from_numpy(x), torch.from_numpy(t)))
    got = float(M.bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
    assert abs(got - want) < 1e-5


def test_smooth_l1_matches_torch(rng):
    a = rng.standard_normal((4, 8)).astype(np.float32) * 3
    b = rng.standard_normal((4, 8)).astype(np.float32)
    want = float(F.smooth_l1_loss(torch.from_numpy(a), torch.from_numpy(b)))
    got = float(M.smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5


def test_reconstruction_loss_charbonnier(rng):
    a = rng.random((2, 4, 4, 3), dtype=np.float32)
    b = rng.random((2, 4, 4, 3), dtype=np.float32)
    d = a - b
    want = np.mean(np.sum(np.sqrt(d * d + 1e-6), axis=(1, 2, 3)))
    got = float(M.reconstruction_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-3


def test_dice_loss_range(rng):
    p = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    assert float(M.dice_loss(p, p)) < 0.05
    assert float(M.dice_loss(p, 1 - p)) > float(M.dice_loss(p, p))


def test_adversarial_loss_modes(rng):
    out = jnp.asarray(rng.random((2, 4, 4, 1), dtype=np.float32) * 0.8 + 0.1)
    for lt in ("nsgan", "lsgan"):
        assert np.isfinite(float(M.adversarial_loss(out, True, True, loss_type=lt)))
    logits = jnp.asarray(rng.standard_normal((2, 4, 4, 1)).astype(np.float32))
    assert np.isfinite(float(M.adversarial_loss(logits, False, True, loss_type="hinge")))


def test_exclusion_and_misc_losses(rng):
    a = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    assert np.isfinite(float(M.exclusion_loss(a, b)))
    assert np.isfinite(float(M.gradient_loss(a)))
    assert np.isfinite(float(M.grayscale_loss(a, b)))
    assert np.isfinite(float(M.std_loss(a)))
    assert np.isfinite(float(M.non_blurry_loss(a)))


@pytest.mark.slow
def test_perceptual_and_style_losses(rng):
    a = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    pa = float(M.perceptual_loss(a, b))
    assert np.isfinite(pa) and pa > 0
    assert float(M.perceptual_loss(a, a)) < 1e-6
    sa = float(M.style_loss(a, b))
    assert np.isfinite(sa)


def test_bitwise_message_error():
    dec = jnp.asarray([[0.9, 0.1, 0.6], [0.2, 0.8, 0.4]])
    msg = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])
    assert abs(float(M.bitwise_message_error(dec, msg)) - 2 / 6) < 1e-6
