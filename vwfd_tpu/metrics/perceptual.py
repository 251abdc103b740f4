"""VGG19 feature losses (perceptual + style/gram) — reference: loss.py:91-276.

The reference builds its perceptual/style losses on torchvision's pretrained
VGG19. This environment has no pretrained weights (zero egress), so
`VGG19Features` is a faithful Flax VGG19 feature trunk with a *fixed seeded*
initialization by default — random-convnet features are a known-usable
perceptual distance — and `load_torch_state_dict` to drop in ported
torchvision weights when available.
"""

import functools
import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# VGG19 conv plan: (channels, convs-per-stage)
_STAGES = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))

# Feature taps used by the reference losses (loss.py:126-151, 91-122):
PERCEPTUAL_TAPS = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1")
STYLE_TAPS = ("relu2_2", "relu3_4", "relu4_4", "relu5_2")


class VGG19Features(nn.Module):
    """VGG19 feature trunk, returns a dict of every reluX_Y activation."""

    @nn.compact
    def __call__(self, x):
        feats = {}
        for s, (ch, reps) in enumerate(_STAGES, start=1):
            for r in range(1, reps + 1):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{s}_{r}")(x)
                x = nn.relu(x)
                feats[f"relu{s}_{r}"] = x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


@functools.lru_cache(maxsize=1)
def _default_params(channels: int = 3):
    # ensure_compile_time_eval: this may first run inside a jit trace; the
    # cached params must be concrete arrays, never trace-bound constants.
    with jax.ensure_compile_time_eval():
        model = VGG19Features()
        dummy = jnp.zeros((1, 32, 32, channels), dtype=jnp.float32)
        return model.init(jax.random.PRNGKey(1234), dummy)


def load_torch_state_dict(state_dict):
    """Convert a torchvision `vgg19().features` state dict (numpy arrays keyed
    by layer index, OIHW) into Flax params for `VGG19Features`."""
    order = []
    for s, (_, reps) in enumerate(_STAGES, start=1):
        for r in range(1, reps + 1):
            order.append(f"conv{s}_{r}")
    params = {}
    idxs = sorted({int(k.split(".")[0]) for k in state_dict if k.endswith("weight")})
    for name, idx in zip(order, idxs):
        w = np.asarray(state_dict[f"{idx}.weight"])  # (O, I, kh, kw)
        b = np.asarray(state_dict[f"{idx}.bias"])
        params[name] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                        "bias": jnp.asarray(b)}
    return {"params": params}


def load_vgg_npz(path):
    """Load VGG19 feature params from an `.npz` written by
    `tools/convert_vgg19.py` (keys `conv{s}_{r}.kernel` / `.bias`, HWIO) —
    the config-reachable pretrained-weights path (`TrainConfig.vgg_weights`)."""
    data = np.load(path)
    params = {}
    for s, (_, reps) in enumerate(_STAGES, start=1):
        for r in range(1, reps + 1):
            name = f"conv{s}_{r}"
            params[name] = {"kernel": jnp.asarray(data[f"{name}.kernel"]),
                            "bias": jnp.asarray(data[f"{name}.bias"])}
    return {"params": params}


def _features(x, params):
    if params is None:
        params = _default_params(x.shape[-1])
    return VGG19Features().apply(params, x)


def perceptual_loss(x, y, params=None, weights=(1.0, 1.0, 1.0, 1.0, 1.0)):
    """Σ wᵢ·L1(featᵢ(x), featᵢ(y)) over relu{1..5}_1 (loss.py:126-151)."""
    fx, fy = _features(x, params), _features(y, params)
    loss = 0.0
    for w, tap in zip(weights, PERCEPTUAL_TAPS):
        loss = loss + w * jnp.mean(jnp.abs(fx[tap] - fy[tap]))
    return loss


def _gram(f):
    b, h, w, c = f.shape
    m = f.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", m, m) / (h * w * c)


def style_loss(x, y, params=None):
    """Σ L1(gram(featᵢ(x)), gram(featᵢ(y))) over the style taps (loss.py:91-122)."""
    fx, fy = _features(x, params), _features(y, params)
    loss = 0.0
    for tap in STYLE_TAPS:
        loss = loss + jnp.mean(jnp.abs(_gram(fx[tap]) - _gram(fy[tap])))
    return loss
