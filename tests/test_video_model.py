"""End-to-end flagship slice: embed → splice → attack → localize → update,
plus checkpoint round-trip and multi-device data parallelism on the fake mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vwfd_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from vwfd_tpu.models import VideoWatermarkModel, VideoBatch
from vwfd_tpu.models.state import save_checkpoint, restore_checkpoint


TINY = Config(
    data=DataConfig(gt_size=32, batch_size=2, frames=2, synthetic=True),
    model=ModelConfig(inn_down_num=2, inn_block_num=(1, 1), unet_features=4),
)
RATIOS = (0.5, 1.0, 1.5)


def _batch(rng, cfg, b=2):
    s, t = cfg.data.gt_size, cfg.data.frames
    video = rng.random((b, t, s, s, 3), dtype=np.float32)
    mask = np.zeros((b, t, s, s, 1), np.float32)
    mask[:, :, 8:16, 8:16] = 1.0
    return VideoBatch(jnp.asarray(video), jnp.asarray(mask))


@pytest.fixture(scope="module")
def model_and_states():
    model = VideoWatermarkModel(TINY, attack_ratios=RATIOS)
    states = model.init_states(jax.random.PRNGKey(0))
    return model, states


@pytest.mark.slow
def test_train_step_updates_and_logs(model_and_states, rng):
    model, states = model_and_states
    batch = _batch(rng, TINY)
    prev = batch.video + 0.1
    # train_step donates `states`; snapshot params host-side and donate a
    # copy so the module-scoped fixture stays alive for later tests
    before = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(states["netG"].params)]
    g_before = [np.asarray(x)
                for x in jax.tree_util.tree_leaves(states["generator"].params)]
    donated = jax.tree_util.tree_map(jnp.array, states)
    new_states, logs = model.train_step(donated, batch, prev,
                                        jax.random.PRNGKey(1))
    for k in ("loss", "lF", "lB", "PF"):
        assert np.isfinite(float(logs[k])), k
    # params actually moved
    after = jax.tree_util.tree_leaves(new_states["netG"].params)
    assert any(not np.allclose(x, np.asarray(y))
               for x, y in zip(before, after))
    g_after = jax.tree_util.tree_leaves(new_states["generator"].params)
    assert any(not np.allclose(x, np.asarray(y))
               for x, y in zip(g_before, g_after))


@pytest.mark.slow
def test_train_step_nan_guard(model_and_states, rng):
    """In-step failure guard (SURVEY.md §5): a batch that produces a
    non-finite loss must leave params/opt state/step counter untouched —
    the guard is a jnp.where select inside the jitted step so it composes
    with buffer donation."""
    model, states = model_and_states
    batch = _batch(rng, TINY)
    bad = VideoBatch(batch.video.at[0, 0, 0, 0, 0].set(jnp.nan), batch.mask)
    before = {net: [np.asarray(x) for x in
                    jax.tree_util.tree_leaves(states[net].params)]
              for net in ("netG", "generator")}
    opt_before = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(states["netG"].opt_state)]
    donated = jax.tree_util.tree_map(jnp.array, states)
    new_states, logs = model.train_step(donated, bad, batch.video + 0.1,
                                        jax.random.PRNGKey(1))
    assert not np.isfinite(float(logs["loss"]))
    for net in ("netG", "generator"):
        after = jax.tree_util.tree_leaves(new_states[net].params)
        for x, y in zip(before[net], after):
            np.testing.assert_array_equal(x, np.asarray(y))
    # optimizer state too: AdamW (m, v) and the step counter all keep their
    # pre-step values
    opt_after = jax.tree_util.tree_leaves(new_states["netG"].opt_state)
    for x, y in zip(opt_before, opt_after):
        np.testing.assert_array_equal(x, np.asarray(y))


def test_embed_imperceptibility_at_init(model_and_states, rng):
    # zero-init coupling nets → at init the INN is near-identity, so the
    # embedded video should be very close to the input (high PSNR).
    model, states = model_and_states
    batch = _batch(rng, TINY)
    fwd = model.embed(states, batch.video)
    assert fwd.shape == batch.video.shape
    from vwfd_tpu.metrics import psnr255_int
    p = float(psnr255_int(batch.video, fwd))
    assert p > 25.0, p


def test_eval_step_metrics(model_and_states, rng):
    model, states = model_and_states
    batch = _batch(rng, TINY)
    out = model.eval_step(states, batch, batch.video, jax.random.PRNGKey(2))
    assert out["f1_sweep"].shape == (9,)
    assert np.isfinite(float(out["psnr_forward"]))
    assert np.isfinite(float(out["ssim_forward"]))


@pytest.mark.slow
def test_checkpoint_roundtrip(model_and_states, tmp_path):
    model, states = model_and_states
    save_checkpoint(str(tmp_path), 7, states)
    restored = restore_checkpoint(str(tmp_path), 7, states)
    a = jax.tree_util.tree_leaves(states["netG"].params)
    b = jax.tree_util.tree_leaves(restored["netG"].params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_data_parallel_train_step(rng):
    """The DDP-equivalent: batch sharded over the 8-device CPU mesh
    (SURVEY.md §2.1: DP via sharded batch dim + automatic grad all-reduce)."""
    from vwfd_tpu.parallel import make_mesh, batch_sharding, shard_batch

    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    model = VideoWatermarkModel(TINY, mesh=mesh, attack_ratios=RATIOS)
    states = model.init_states(jax.random.PRNGKey(0))
    video = rng.random((8, 2, 32, 32, 3), dtype=np.float32)
    mask = np.zeros((8, 2, 32, 32, 1), np.float32)
    mask[:, :, 8:16, 8:16] = 1.0
    batch = VideoBatch(*shard_batch((video, mask), mesh))
    prev = shard_batch(video + 0.05, mesh)
    new_states, logs = model.train_step(states, batch, prev, jax.random.PRNGKey(3))
    assert np.isfinite(float(logs["loss"]))
    # gradient sync: every device must hold identical updated params
    leaf = jax.tree_util.tree_leaves(new_states["netG"].params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_allclose(shards[0], s, atol=1e-6)


def test_make_optimizer_schedules():
    """LR schedule parity wiring (VERDICT r2 #7): make_optimizer builds the
    configured multistep/cosine/warmup schedule from TrainConfig."""
    import optax
    from vwfd_tpu.config import TrainConfig
    from vwfd_tpu.models.state import make_optimizer

    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}

    def lr_trace(tc, n):
        tx = make_optimizer(tc)
        state = tx.init(params)
        p = params
        out = []
        for _ in range(n):
            updates, state = tx.update(grads, state, p)
            out.append(-float(updates["w"][0]))
            p = optax.apply_updates(p, updates)
        return out

    # multistep: lr halves at milestone 2 (weight-decay term perturbs the
    # pure-lr readout by ~1e-5·lr — compare loosely)
    tc = TrainConfig(lr=1e-3, weight_decay=0.0, gradient_clipping=0.0,
                     lr_scheme="multistep", lr_milestones=(2,), lr_gamma=0.5)
    trace = lr_trace(tc, 4)
    assert abs(trace[0] - 1e-3) < 1e-5
    assert abs(trace[3] - 5e-4) < 1e-5

    # warmup: first step scaled down
    tc = TrainConfig(lr=1e-3, weight_decay=0.0, gradient_clipping=0.0,
                     warmup_steps=10)
    trace = lr_trace(tc, 2)
    assert trace[0] < 2e-4  # ~0/10ths..1/10th of base at step 0
    assert trace[1] > trace[0]

    # cosine: decays toward eta_min within the period
    tc = TrainConfig(lr=1e-3, weight_decay=0.0, gradient_clipping=0.0,
                     lr_scheme="cosine", lr_periods=(8,), eta_min=0.0)
    trace = lr_trace(tc, 8)
    assert trace[0] > trace[4] > trace[7] >= 0.0


@pytest.mark.slow
def test_flagship_tpu_nets_train_step(rng):
    """The configs/video.yaml flagship combo (res_tpu coupling trunks +
    UNetTPU extractor, BASELINE.md r3) trains end-to-end: finite losses,
    near-identity embed at init, both nets' params move."""
    cfg = Config(
        data=DataConfig(gt_size=32, batch_size=2, frames=2, synthetic=True),
        model=ModelConfig(inn_down_num=2, inn_block_num=(1, 1),
                          inn_subnet="res_tpu", extractor="unet_tpu",
                          extractor_features=8),
    )
    model = VideoWatermarkModel(cfg, attack_ratios=RATIOS)
    states = model.init_states(jax.random.PRNGKey(0))
    batch = _batch(rng, cfg)
    fwd = model.embed(states, batch.video)
    psnr = -10 * np.log10(float(jnp.mean((fwd - batch.video) ** 2)) + 1e-12)
    assert psnr > 40, f"init embed not near-identity: {psnr:.1f} dB"
    # snapshot params host-side before train_step donates `states`
    befores = {net: [np.asarray(x) for x in
                     jax.tree_util.tree_leaves(states[net].params)]
               for net in ("netG", "generator")}
    new_states, logs = model.train_step(states, batch, batch.video + 0.1,
                                        jax.random.PRNGKey(1))
    for k in ("loss", "lF", "lB", "PF"):
        assert np.isfinite(float(logs[k])), k
    for net in ("netG", "generator"):
        after = jax.tree_util.tree_leaves(new_states[net].params)
        assert any(not np.allclose(x, np.asarray(y))
                   for x, y in zip(befores[net], after)), net
