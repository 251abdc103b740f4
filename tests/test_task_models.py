"""KD-JPEG and tianchi trainer tests (tiny configs) + adversarial utils."""

import numpy as np
import jax
import jax.numpy as jnp

from vwfd_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from vwfd_tpu.models.kdjpeg_model import KDJpegModel
from vwfd_tpu.models.tianchi_model import TianchiModel


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
