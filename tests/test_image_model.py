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


def _snap(states, net):
    """Host-side param snapshot — train_step donates `states`, so before/after
    comparisons must copy out before the call."""
    return [np.asarray(x)
            for x in jax.tree_util.tree_leaves(states[net].params)]


@pytest.mark.slow
@pytest.mark.parametrize("task", ["pami", "clr"])
def test_image_model_train_step(rng, task):
    model = ImageImmunizationModel(TINY, task=task, n_attacks=2,
                                   attack_ratios=(0.5, 1.0))
    states = model.init_states(jax.random.PRNGKey(0))
    batch = _batch(rng)
    prev = jnp.clip(batch.image + 0.1, 0, 1)
    before = _snap(states, "netG")
    new_states, logs = model.train_step(states, batch, prev, jax.random.PRNGKey(1))
    for k in ("loss", "lF", "lB", "l_mask", "PF"):
        assert np.isfinite(float(logs[k])), (k, logs[k])
    if task == "clr":
        assert np.isfinite(float(logs["l_apex"]))
    after = jax.tree_util.tree_leaves(new_states["netG"].params)
    assert any(not np.allclose(a, np.asarray(b))
               for a, b in zip(before, after))


@pytest.mark.slow
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


@pytest.mark.slow
def test_image_model_with_gan(rng):
    model = ImageImmunizationModel(TINY, task="pami", n_attacks=2,
                                   attack_ratios=(0.5, 1.0), with_gan=True)
    states = model.init_states(jax.random.PRNGKey(0))
    assert "discriminator" in states
    batch = _batch(rng)
    before = _snap(states, "discriminator")
    new_states, logs = model.train_step(states, batch, batch.image,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["g_adv"]))
    assert np.isfinite(float(logs["d_loss"]))
    after = jax.tree_util.tree_leaves(new_states["discriminator"].params)
    assert any(not np.allclose(a, np.asarray(b))
               for a, b in zip(before, after))


@pytest.mark.slow
def test_image_model_with_jpeg_simulator(rng):
    model = ImageImmunizationModel(TINY, task="pami", n_attacks=2,
                                   attack_ratios=(0.5, 1.0),
                                   with_jpeg_simulator=True)
    states = model.init_states(jax.random.PRNGKey(0))
    assert "jpeg_sim" in states
    batch = _batch(rng)
    before = _snap(states, "jpeg_sim")
    new_states, logs = model.train_step(states, batch, batch.image,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["l_sim"]))
    after = jax.tree_util.tree_leaves(new_states["jpeg_sim"].params)
    assert any(not np.allclose(a, np.asarray(b))
               for a, b in zip(before, after))


def test_copy_move_tamper_follows_shift(rng):
    """Tampered region equals the shifted source; GT mask follows the shift
    (IRNp_model.py:561-601 semantics)."""
    from vwfd_tpu.attacks.spatial import copy_move_tamper, shift_zero_pad
    img = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    mask = np.zeros((2, 32, 32, 1), np.float32)
    # 16×16 center block: any |shift| < 16 keeps part of it in frame, so the
    # translation search below always has a nonzero mask to match
    mask[:, 8:24, 8:24] = 1.0
    mask = jnp.asarray(mask)
    tampered, new_mask = jax.jit(copy_move_tamper)(
        jax.random.PRNGKey(3), img, mask)
    t, m = np.asarray(tampered), np.asarray(new_mask)
    # locate the realized shift by matching the mask translation
    found = None
    for dx in range(-16, 16):
        for dy in range(-16, 16):
            cand = np.asarray(shift_zero_pad(mask, dx, dy))
            if np.array_equal(cand > 0.5, m > 0.5) and m.sum() > 0:
                found = (dx, dy)
                break
        if found:
            break
    assert found is not None, "mask is not a pure translation of the original"
    shifted_src = np.asarray(shift_zero_pad(img, found[0], found[1]))
    np.testing.assert_allclose(t[m[..., 0] > 0.5],
                               shifted_src[m[..., 0] > 0.5], atol=1e-6)
    np.testing.assert_allclose(t[m[..., 0] <= 0.5],
                               np.asarray(img)[m[..., 0] <= 0.5], atol=1e-6)


def test_cropped_out_rectification(rng):
    """cropped_out: scaled-back frame is zero outside the crop, close to the
    original inside it, and the STE passes gradients through the clean image
    (noise_layers/crop.py:77-118, IRNclr_model.py:556-575)."""
    from vwfd_tpu.attacks.spatial import cropped_out, rect_mask
    img = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    apex = (8.0, 24.0, 8.0, 28.0)
    scaled, real, mask_out = jax.jit(lambda x: cropped_out(x, apex))(img)
    assert scaled.shape == img.shape
    r = np.asarray(real)
    outside = np.asarray(mask_out)[..., :1] > 0.5
    assert np.abs(r[np.broadcast_to(outside, r.shape)]).max() == 0.0
    # crop → upscale → downscale-back round trip stays close to the source
    inside = ~outside
    src = np.asarray(img)
    err = np.abs(r - src)[np.broadcast_to(inside, r.shape)]
    assert err.mean() < 0.08, err.mean()
    # straight-through: d(real)/d(img) follows the ideal (masked) path
    g = jax.grad(lambda x: jnp.sum(cropped_out(x, apex)[1]))(img)
    g = np.asarray(g)
    assert np.abs(g[np.broadcast_to(inside, g.shape)]).sum() > 0
    assert np.abs(g[np.broadcast_to(outside, g.shape)]).sum() == 0


@pytest.mark.slow
def test_clr_train_full_reverse_and_pami_copymove(rng):
    """CLR path runs the rectified k-way reverse; PAMI 'copymove' mode trains."""
    model = ImageImmunizationModel(TINY, task="clr", n_attacks=2,
                                   attack_ratios=(0.5, 1.0))
    assert model.reverse_k == 0  # parity default: reverse ALL attacked copies
    states = model.init_states(jax.random.PRNGKey(0))
    batch = _batch(rng)
    _, logs = model.train_step(states, batch, batch.image, jax.random.PRNGKey(1))
    for k in ("loss", "l_apex", "l_ce", "lB"):
        assert np.isfinite(float(logs[k])), k

    cm = ImageImmunizationModel(TINY, task="pami", n_attacks=2,
                                attack_ratios=(0.5, 1.0),
                                tamper_mode="copymove", reverse_k=1)
    cstates = cm.init_states(jax.random.PRNGKey(0))
    _, clogs = cm.train_step(cstates, batch, batch.image, jax.random.PRNGKey(1))
    assert np.isfinite(float(clogs["loss"]))


@pytest.mark.slow
def test_jpeg_simulator_real_pair(rng):
    """Simulator co-training against real-libjpeg targets from the LQ pipeline
    (IRN_model.py:735-760): l_sim finite and jpeg_sim params move."""
    from vwfd_tpu.data.jpeg_data import LQJpegDataset
    model = ImageImmunizationModel(TINY, task="pami", n_attacks=2,
                                   attack_ratios=(0.5, 1.0),
                                   with_jpeg_simulator=True, reverse_k=1)
    states = model.init_states(jax.random.PRNGKey(0))
    batch = _batch(rng)
    ds = LQJpegDataset(size=32, synthetic_length=4, qualities=(50, 90))
    versions, _ = ds[0]
    jpeg_real = jnp.asarray(np.stack([versions[1], versions[1]]))  # QF 50
    qf = jnp.asarray([0.5, 0.5], jnp.float32)
    before = _snap(states, "jpeg_sim")
    new_states, logs = model.train_step(states, batch, batch.image,
                                        jax.random.PRNGKey(1),
                                        jpeg_pair=(jpeg_real, qf))
    assert np.isfinite(float(logs["l_sim"]))
    after = jax.tree_util.tree_leaves(new_states["jpeg_sim"].params)
    assert any(not np.allclose(a, np.asarray(b))
               for a, b in zip(before, after))


@pytest.mark.slow
def test_image_data_parallel_train_step(rng):
    """VERDICT r2 #2: the image family trains sharded over the 8-device CPU
    mesh (mirrors test_video_model.py::test_data_parallel_train_step)."""
    from vwfd_tpu.parallel import make_mesh, shard_batch

    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    model = ImageImmunizationModel(TINY, task="pami", n_attacks=2,
                                   attack_ratios=(0.5, 1.0), mesh=mesh,
                                   tamper_mode="splice")
    states = model.init_states(jax.random.PRNGKey(0))
    b, s = 8, 32
    img = rng.random((b, s, s, 3), dtype=np.float32)
    canny = (rng.random((b, s, s, 1)) > 0.9).astype(np.float32)
    mask = np.zeros((b, s, s, 1), np.float32)
    mask[:, 8:20, 8:20] = 1.0
    img, canny, mask = shard_batch((img, canny, mask), mesh)
    batch = ImageBatch(img, canny, mask)
    prev = shard_batch(np.clip(np.asarray(img) + 0.05, 0, 1), mesh)
    new_states, logs = model.train_step(states, batch, prev,
                                        jax.random.PRNGKey(3))
    assert np.isfinite(float(logs["loss"]))
    # gradient sync: every device must hold identical updated params
    leaf = jax.tree_util.tree_leaves(new_states["netG"].params)[0]
    shards = [np.asarray(sh.data) for sh in leaf.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_allclose(shards[0], sh, atol=1e-6)
