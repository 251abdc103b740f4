"""KD-JPEG and tianchi trainer tests (tiny configs) + adversarial utils."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from vwfd_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from vwfd_tpu.models.kdjpeg_model import KDJpegModel
from vwfd_tpu.models.tianchi_model import TianchiModel


@pytest.mark.slow
def test_kdjpeg_train_step(rng):
    cfg = Config(data=DataConfig(gt_size=32))
    model = KDJpegModel(cfg, qf_classes=3, size=32, nc=(8, 12, 16, 24), nb=1,
                        disc_dim=8)
    states = model.init_states(jax.random.PRNGKey(0))
    b = 2
    real_jpeg = jnp.asarray(rng.random((3 * b, 32, 32, 3), dtype=np.float32))
    labels = jnp.asarray(np.repeat(np.arange(3), b))
    new_states, logs = model.train_step(states, real_jpeg, labels,
                                        jax.random.PRNGKey(1))
    for k in ("lQF", "l_simul", "l_simul_bayar", "qfsimu", "FW_GAN",
              "dis_loss", "PSSIMU"):
        assert np.isfinite(float(logs[k])), k
    sim = model.simulate(new_states, real_jpeg[:2],
                         jnp.asarray([[0.5], [0.9]], jnp.float32))
    assert sim.shape == (2, 32, 32, 3)


@pytest.mark.slow
def test_tianchi_train_and_eval(rng):
    cfg = Config(data=DataConfig(gt_size=32))
    model = TianchiModel(cfg, embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                         window_size=4)
    states = model.init_states(jax.random.PRNGKey(0))
    imgs = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    masks = jnp.asarray((rng.random((2, 32, 32, 1)) > 0.7).astype(np.float32))
    new_states, logs = model.train_step(states, imgs, masks, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["CE"]))
    assert np.isfinite(float(logs["CE1"]))
    out = model.eval_step(new_states, imgs, masks)
    assert out["f1_sweep"].shape == (9,)


def test_adversarial_fgsm_family(rng):
    from vwfd_tpu.adversarial import fgsm, igsm, jpeg_resistant_fgsm

    img = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    target = jnp.zeros_like(img)

    def loss(x):
        return jnp.mean((x - target) ** 2)

    adv = fgsm(loss, img, epsilon=0.03)
    assert float(jnp.abs(adv - img).max()) <= 0.03 + 1e-6
    assert float(loss(adv)) > float(loss(img))  # ascended the loss

    adv2 = igsm(loss, img, epsilon=0.03, step_size=0.01, steps=3)
    assert float(jnp.abs(adv2 - img).max()) <= 0.03 + 1e-5

    adv3 = jpeg_resistant_fgsm(loss, img, epsilon=0.05, step_size=0.02,
                               steps=2, quality=75)
    assert np.isfinite(np.asarray(adv3)).all()


def test_schedules():
    from vwfd_tpu.models.schedules import (multistep_restart, cosine_restart,
                                           with_warmup)
    s = multistep_restart(1e-3, milestones=[10, 20], gamma=0.5)
    assert abs(float(s(0)) - 1e-3) < 1e-9
    assert abs(float(s(15)) - 5e-4) < 1e-8
    assert abs(float(s(25)) - 2.5e-4) < 1e-8
    s2 = multistep_restart(1e-3, milestones=[10], gamma=0.5,
                           restarts=[30], restart_weights=[0.5])
    assert abs(float(s2(30)) - 5e-4) < 1e-8   # restart: weight 0.5, decay reset
    c = cosine_restart(1e-3, periods=[100, 100])
    assert abs(float(c(0)) - 1e-3) < 1e-8
    assert float(c(50)) < 1e-3
    w = with_warmup(1e-3, warmup_steps=10)
    assert abs(float(w(5)) - 5e-4) < 1e-8
    assert abs(float(w(20)) - 1e-3) < 1e-8


@pytest.mark.slow
def test_image_model_imuge_mode(rng):
    import jax.numpy as jnp
    from vwfd_tpu.config import Config, DataConfig, ModelConfig
    from vwfd_tpu.models.image_model import ImageImmunizationModel, ImageBatch
    cfg = Config(data=DataConfig(gt_size=32, batch_size=2),
                 model=ModelConfig(inn_down_num=2, inn_block_num=(1, 1),
                                   localizer_dim=16,
                                   localizer_residual_blocks=1))
    model = ImageImmunizationModel(cfg, task="imuge", n_attacks=2,
                                   attack_ratios=(0.5, 1.0))
    assert model.watermark_source == "gray_prev"
    states = model.init_states(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    canny = jnp.zeros((2, 32, 32, 1))  # ignored in imuge mode
    mask = jnp.zeros((2, 32, 32, 1)).at[:, 8:16, 8:16].set(1.0)
    batch = ImageBatch(img, canny, mask)
    prev = jnp.clip(img + 0.1, 0, 1)
    _, logs = model.train_step(states, batch, prev, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))


def test_kdjpeg_collate_property(rng):
    """LQJpegDataset batches collate to the class-major layout train_step
    assumes: first B entries ARE the clean sources, labels [0]*B,[1]*B,…
    (VERDICT r1 weak #7)."""
    from vwfd_tpu.data.jpeg_data import LQJpegDataset
    from vwfd_tpu.data import Loader
    from vwfd_tpu.models.kdjpeg_model import KDJpegModel

    ds = LQJpegDataset(size=16, synthetic_length=6, qualities=(30, 70))
    loader = Loader(ds, batch_size=3, seed=0)
    versions, labels = next(iter(loader))
    flat, lab = KDJpegModel.collate(versions, labels, qf_classes=3)
    b = versions.shape[0]
    np.testing.assert_array_equal(lab, np.repeat(np.arange(3), b))
    # class-major: flat[:b] are the clean (label-0) versions of all items
    np.testing.assert_allclose(flat[:b], versions[:, 0], atol=0)
    np.testing.assert_allclose(flat[b:2 * b], versions[:, 1], atol=0)
    # mis-ordered labels are rejected
    bad = np.asarray(labels).copy()
    bad[0] = bad[0][::-1]
    with pytest.raises(ValueError):
        KDJpegModel.collate(versions, bad, qf_classes=3)
