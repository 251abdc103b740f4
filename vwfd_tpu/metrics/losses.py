"""Training losses — reference: loss.py, models/modules/loss.py, dice_loss.py.

All are pure functions over NHWC arrays; GAN losses are split into
discriminator/generator views by arguments, not module state.
"""

import jax
import jax.numpy as jnp

from .metrics import _depthwise_same_conv  # shared depthwise helper


def bce_loss(pred, target, eps=1e-7):
    """nn.BCELoss on probabilities."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def bce_with_logits(logits, target):
    """nn.BCEWithLogitsLoss — the flagship forward/backward criterion
    (models/IRNcrop_model.py:108,378-393)."""
    return jnp.mean(jnp.maximum(logits, 0) - logits * target +
                    jnp.log1p(jnp.exp(-jnp.abs(logits))))


def smooth_l1(pred, target, beta=1.0):
    """nn.SmoothL1Loss (models/IRNcrop_model.py:107)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d ** 2 / beta, d - 0.5 * beta))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def reconstruction_loss(x, target, losstype="l_char", eps=1e-6):
    """models/modules/loss.py:5-22 `ReconstructionLoss`: per-sample spatial sum,
    batch mean. (NB the reference's forward ignores the constructor's losstype
    and defaults to 'l_char'; the 'l1' branch there sums *signed* diffs — we
    implement the standard |·| instead, as SURVEY.md §0 directs for bugs.)"""
    axes = tuple(range(1, x.ndim))
    if losstype == "l2":
        return jnp.mean(jnp.sum((x - target) ** 2, axis=axes))
    if losstype == "l_char":
        d = x - target
        return jnp.mean(jnp.sum(jnp.sqrt(d * d + eps), axis=axes))
    if losstype == "l1":
        return jnp.mean(jnp.sum(jnp.abs(x - target), axis=axes))
    raise ValueError(f"reconstruction loss type {losstype!r}")


def ssim_loss_map(x, y):
    """loss.py:9-39 `SSIM_Loss`: 3×3 avg-pool SSIM with reflection padding,
    returned as per-pixel map clamp((1−SSIM)/2, 0, 1)."""
    def pool3(z):
        zp = jnp.pad(z, [(0, 0)] * (z.ndim - 3) + [(1, 1), (1, 1), (0, 0)],
                     mode="reflect")
        k = jnp.ones((3, 3), dtype=z.dtype) / 9.0
        # valid 3×3 average = depthwise same conv on padded input, cropped
        out = _depthwise_same_conv(zp, k)
        return out[..., 1:-1, 1:-1, :]

    mu_x, mu_y = pool3(x), pool3(y)
    sigma_x = pool3(x ** 2) - mu_x ** 2
    sigma_y = pool3(y ** 2) - mu_y ** 2
    sigma_xy = pool3(x * y) - mu_x * mu_y
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def gan_loss(logits, target_is_real, gan_type="gan"):
    """models/modules/loss.py:77-109 `GANLoss` (gan | lsgan | wgan-gp)."""
    if gan_type in ("gan", "ragan"):
        t = jnp.ones_like(logits) if target_is_real else jnp.zeros_like(logits)
        return bce_with_logits(logits, t)
    if gan_type == "lsgan":
        t = jnp.ones_like(logits) if target_is_real else jnp.zeros_like(logits)
        return l2_loss(logits, t)
    if gan_type == "wgan-gp":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    raise ValueError(gan_type)


def adversarial_loss(outputs, is_real, is_disc=None, loss_type="nsgan", mask=None):
    """loss.py:41-88 `AdversarialLoss` (nsgan | lsgan | hinge) with the
    mask-weighted fake labels option."""
    if loss_type == "hinge":
        if is_disc:
            o = -outputs if is_real else outputs
            return jnp.mean(jax.nn.relu(1 + o))
        return jnp.mean(-outputs)
    labels = jnp.ones_like(outputs)
    if not is_real:
        if mask is None:
            labels = jnp.zeros_like(outputs)
        else:
            from ..ops.resize import resize_bilinear
            m = resize_bilinear(mask, (outputs.shape[-3], outputs.shape[-2]))
            labels = labels * (1.0 - m)
    if loss_type == "nsgan":
        return bce_loss(outputs, labels)
    if loss_type == "lsgan":
        return l2_loss(outputs, labels)
    raise ValueError(loss_type)


def gradient_penalty(disc_fn, key, real, fake):
    """WGAN-GP gradient penalty (models/modules/loss.py:112-131
    `GradientPenaltyLoss`): E[(‖∇_x D(x̂)‖₂ − 1)²] on random interpolates."""
    eps = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
    interp = eps * real + (1 - eps) * fake

    def per_sample(x):
        return jnp.sum(disc_fn(x[None]))

    grads = jax.vmap(jax.grad(per_sample))(interp)
    norms = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, -1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def _avg_pool_2x2(x):
    *lead, h, w, c = x.shape
    return x.reshape(*lead, h // 2, 2, w // 2, 2, c).mean(axis=(-4, -2))


def exclusion_loss(img1, img2, level: int = 3):
    """Gradient-decorrelation loss (loss.py:309-360), NHWC."""
    gradx_loss, grady_loss = [], []
    for _ in range(level):
        gx1 = img1[..., 1:, :, :] - img1[..., :-1, :, :]
        gy1 = img1[..., :, 1:, :] - img1[..., :, :-1, :]
        gx2 = img2[..., 1:, :, :] - img2[..., :-1, :, :]
        gy2 = img2[..., :, 1:, :] - img2[..., :, :-1, :]
        sx1 = jax.nn.sigmoid(gx1) * 2 - 1
        sy1 = jax.nn.sigmoid(gy1) * 2 - 1
        sx2 = jax.nn.sigmoid(gx2) * 2 - 1
        sy2 = jax.nn.sigmoid(gy2) * 2 - 1
        c1, c2 = img1.shape[-1], img2.shape[-1]
        for i in range(c2):
            for j in range(c1):
                gradx_loss.append(jnp.mean((sx1[..., j] ** 2) * (sx2[..., i] ** 2)) ** 0.25)
                grady_loss.append(jnp.mean((sy1[..., j] ** 2) * (sy2[..., i] ** 2)) ** 0.25)
        img1 = _avg_pool_2x2(img1)
        img2 = _avg_pool_2x2(img2)
    n = level * 9
    return (sum(gradx_loss) / n + sum(grady_loss) / n) / 2.0


def gradient_loss(a):
    """L1 on spatial gradients (loss.py:413-424)."""
    gx = jnp.abs(a[..., :, :-1, :] - a[..., :, 1:, :])
    gy = jnp.abs(a[..., :-1, :, :] - a[..., 1:, :, :])
    return jnp.mean(gx) + jnp.mean(gy)


_GRAY = jnp.asarray([0.299, 0.587, 0.114])


def grayscale_loss(x, y):
    """MSE on grayscale projections (loss.py:391-401)."""
    return l2_loss(x @ _GRAY, y @ _GRAY)


def extended_l1_loss(a, b, mask):
    """Mask-normalized L1 (loss.py:363-376)."""
    normalizer = jnp.mean(jnp.abs(mask))
    return l1_loss(mask * a, mask * b) / (normalizer + 1e-12)


def non_blurry_loss(x):
    """1 − MSE(x, 0.5) (loss.py:379-388)."""
    return 1.0 - l2_loss(x, jnp.full_like(x, 0.5))


def std_loss(x):
    """MSE between center-tap and 5×5 box-blur of grayscale (loss.py:286-306)."""
    g = (x @ _GRAY)[..., None]
    k = jnp.ones((5, 5)) / 25.0
    blur = _depthwise_same_conv(g, k)[..., 2:-2, 2:-2, :]
    center = g[..., 2:-2, 2:-2, :]
    return l2_loss(center, blur)


def dice_loss(pred, target, smooth: float = 1.0, p: float = 2.0):
    """BinaryDiceLoss (dice_loss.py:24-55)."""
    b = pred.shape[0]
    pf = pred.reshape(b, -1)
    tf = target.reshape(b, -1)
    num = 2 * jnp.sum(pf * tf, axis=1) + smooth
    den = jnp.sum(pf ** p + tf ** p, axis=1) + smooth
    return jnp.mean(1 - num / den)


def cw_loss(logits, target, is_targeted, num_classes=1000, kappa=0.0):
    """Carlini-Wagner margin loss (models/modules/loss.py:24-42)."""
    one_hot = jax.nn.one_hot(target.astype(jnp.int32), num_classes, dtype=logits.dtype)
    real = jnp.sum(one_hot * logits, axis=1)
    other = jnp.max((1 - one_hot) * logits - one_hot * 10000.0, axis=1)
    margin = other - real if is_targeted else real - other
    return jnp.sum(jnp.maximum(margin, kappa))
