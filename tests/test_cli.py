"""train.py CLI smoke tests (tiny shapes, CPU, subprocess) — validates the
wiring VERDICT r2 flagged: telemetry reachable from the CLI, image-loop
checkpoint/--val, every loop accepting the mesh path."""

import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")

_TINY_YAML = """
name: tinytest
task: {task}
data:
  gt_size: 32
  batch_size: 2
  frames: 2
  synthetic: true
model:
  inn_down_num: 2
  inn_block_num: [1, 1]
  unet_features: 4
  localizer_dim: 16
  localizer_residual_blocks: 1
  n_attacks: 2
  attack_ratios: [0.5, 1.0, 1.5]
train:
  dtype: float32
  save_interval: 2
ckpt_dir: {ckpt}
out_dir: {out}
"""


def _run(args, cwd, extra_env=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    if extra_env:
        env.update(extra_env)
    return subprocess.run([sys.executable, os.path.join(_ROOT, "train.py")]
                          + args, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=1800)


@pytest.mark.slow
def test_cli_video_with_telemetry(tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(_TINY_YAML.format(task="video", ckpt=tmp_path / "ckpt",
                                     out=tmp_path / "out"))
    r = _run(["--config", str(cfg), "--steps", "2",
              "--logdir", str(tmp_path / "runs")], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    scalars = tmp_path / "runs" / "scalars.jsonl"
    assert scalars.exists(), "ScalarLogger unreachable from the CLI"
    recs = [json.loads(l) for l in scalars.read_text().splitlines()]
    assert recs and "loss" in recs[-1]
    # checkpoint written at save_interval=2
    assert (tmp_path / "ckpt" / "2").exists()


@pytest.mark.slow
def test_cli_image_val_and_ckpt(tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(_TINY_YAML.format(task="pami", ckpt=tmp_path / "ckpt",
                                     out=tmp_path / "out"))
    r = _run(["--config", str(cfg), "--steps", "2", "--no-telemetry"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "ckpt_pami" / "2").exists(), \
        "image loop must checkpoint"
    r = _run(["--config", str(cfg), "--val", "--val-batches", "1",
              "--resume", "--no-telemetry"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "eval:" in (r.stdout + r.stderr), "--val must report metrics"


@pytest.mark.slow
@pytest.mark.parametrize("task", ["hidden", "tianchi"])
def test_cli_aux_loops_checkpoint_and_resume(tmp_path, task):
    """The non-video/image loops checkpoint at save_interval and --resume
    restores the step counter (VERDICT r2 §5 checkpoint row)."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(_TINY_YAML.format(task=task, ckpt=tmp_path / "ckpt",
                                     out=tmp_path / "out"))
    r = _run(["--config", str(cfg), "--steps", "2", "--no-telemetry"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / f"ckpt_{task}" / "2").exists(), \
        f"{task} loop must checkpoint"
    # resume: runs 2 more steps from step 2 and writes step-4 checkpoint
    r = _run(["--config", str(cfg), "--steps", "4", "--resume",
              "--no-telemetry"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert f"resuming {task} from step 2" in (r.stdout + r.stderr)
    assert (tmp_path / f"ckpt_{task}" / "4").exists()


def test_video_val_splices_previous_batch(monkeypatch, tmp_path):
    """--val's splice source must be the PREVIOUS batch's clean clips — the
    reference's previous_images ring buffer protocol
    (models/IRNcrop_model.py:348,445-450). Using the current batch would make
    "tampered" pixels self-referential at eval (VERDICT r3 missing #5).
    In-process with a stub model: pins the CLI wiring, no compilation."""
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    import train as train_mod
    import vwfd_tpu.models as models_pkg
    from vwfd_tpu.config import load_config

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(_TINY_YAML.format(task="video",
                                          ckpt=tmp_path / "ckpt",
                                          out=tmp_path / "out"))
    cfg = load_config(str(cfg_path))

    calls = []

    class _Stub:
        def __init__(self, cfg, mesh=None):
            pass

        def init_states(self, key):
            return {}

        def eval_step(self, states, batch, prev, key):
            calls.append((np.asarray(batch.video), np.asarray(prev)))
            return {"f1_best": jnp.asarray(0.0)}

    monkeypatch.setattr(models_pkg, "VideoWatermarkModel", _Stub)
    args = argparse.Namespace(val=True, val_batches=2, resume=False,
                              steps=None, no_telemetry=True, logdir=None)
    train_mod._video_loop(cfg, None, args, jax.random.PRNGKey(0), True)

    assert len(calls) == 2
    for video, prev in calls:
        assert not np.allclose(video, prev), \
            "eval splice source must not be the current batch"
    # chain property: call i's splice source is call i-1's clean batch
    assert np.allclose(calls[1][1], calls[0][0])
