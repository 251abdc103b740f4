"""Image immunization family (PAMI / CLR) train + eval on tiny configs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vwfd_tpu.config import Config, DataConfig, ModelConfig
from vwfd_tpu.models.image_model import ImageImmunizationModel, ImageBatch

TINY = Config(
    data=DataConfig(gt_size=32, batch_size=2),
    model=ModelConfig(inn_down_num=2, inn_block_num=(1, 1),
                      localizer_dim=16, localizer_residual_blocks=1),
)


def _batch(rng, b=2, s=32):
    img = jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32))
    canny = jnp.asarray((rng.random((b, s, s, 1)) > 0.9).astype(np.float32))
    mask = np.zeros((b, s, s, 1), np.float32)
    mask[:, 8:20, 8:20] = 1.0
    return ImageBatch(img, canny, jnp.asarray(mask))


@pytest.mark.parametrize("task", ["pami", "clr"])
def test_image_model_train_step(rng, task):
    model = ImageImmunizationModel(TINY, task=task, n_attacks=2,
                                   attack_ratios=(0.5, 1.0))
    states = model.init_states(jax.random.PRNGKey(0))
    batch = _batch(rng)
    prev = jnp.clip(batch.image + 0.1, 0, 1)
    new_states, logs = model.train_step(states, batch, prev, jax.random.PRNGKey(1))
    for k in ("loss", "lF", "lB", "l_mask", "PF"):
        assert np.isfinite(float(logs[k])), (k, logs[k])
    if task == "clr":
        assert np.isfinite(float(logs["l_apex"]))
    before = jax.tree_util.tree_leaves(states["netG"].params)
    after = jax.tree_util.tree_leaves(new_states["netG"].params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_image_model_eval(rng):
    model = ImageImmunizationModel(TINY, task="pami", n_attacks=2,
                                   attack_ratios=(0.5, 1.0))
    states = model.init_states(jax.random.PRNGKey(0))
    batch = _batch(rng)
    out = model.eval_step(states, batch, batch.image, jax.random.PRNGKey(2))
    assert out["recovered"].shape == batch.image.shape
    assert out["predicted_mask"].shape == batch.mask.shape
    assert np.isfinite(float(out["psnr_forward"]))
    assert out["f1_sweep"].shape == (9,)


def test_canny_soft(rng):
    from vwfd_tpu.ops.canny import canny_soft
    # sharp vertical edge → strong edge response at the boundary column
    img = np.zeros((1, 32, 32, 3), np.float32)
    img[:, :, 16:] = 1.0
    e = np.asarray(canny_soft(jnp.asarray(img)))
    assert e.shape == (1, 32, 32, 1)
    edge_col = e[0, :, 14:18, 0].mean()
    flat_col = e[0, :, 2:10, 0].mean()
    assert edge_col > 5 * flat_col
    # differentiable
    g = jax.grad(lambda x: jnp.sum(canny_soft(x)))(jnp.asarray(img))
    assert np.isfinite(np.asarray(g)).all()


def test_image_model_with_gan(rng):
    model = ImageImmunizationModel(TINY, task="pami", n_attacks=2,
                                   attack_ratios=(0.5, 1.0), with_gan=True)
    states = model.init_states(jax.random.PRNGKey(0))
    assert "discriminator" in states
    batch = _batch(rng)
    new_states, logs = model.train_step(states, batch, batch.image,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["g_adv"]))
    assert np.isfinite(float(logs["d_loss"]))
    before = jax.tree_util.tree_leaves(states["discriminator"].params)
    after = jax.tree_util.tree_leaves(new_states["discriminator"].params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_image_model_with_jpeg_simulator(rng):
    model = ImageImmunizationModel(TINY, task="pami", n_attacks=2,
                                   attack_ratios=(0.5, 1.0),
                                   with_jpeg_simulator=True)
    states = model.init_states(jax.random.PRNGKey(0))
    assert "jpeg_sim" in states
    batch = _batch(rng)
    new_states, logs = model.train_step(states, batch, batch.image,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["l_sim"]))
    before = jax.tree_util.tree_leaves(states["jpeg_sim"].params)
    after = jax.tree_util.tree_leaves(new_states["jpeg_sim"].params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))
