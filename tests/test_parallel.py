"""Multi-host entry + process-0 guards (VERDICT r2 #5).

Real multi-process runs need a pod; what this host CAN validate is the
env-gating (no JAX distributed init without VWFD_MULTIHOST — single-host runs
pay nothing) and that the CLI's telemetry/checkpoint paths honor the
process-0 guard (the reference's `rank <= 0` checks, train.py:96-109)."""

import importlib.util
import os

import jax
import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load_train_module():
    spec = importlib.util.spec_from_file_location(
        "vwfd_train_cli", os.path.join(_ROOT, "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_maybe_init_distributed_is_env_gated(monkeypatch):
    from vwfd_tpu import parallel

    called = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.setdefault("init", kw))
    monkeypatch.delenv("VWFD_MULTIHOST", raising=False)
    assert parallel.maybe_init_distributed() == 0
    assert "init" not in called, "must not initialize without VWFD_MULTIHOST"

    monkeypatch.setenv("VWFD_MULTIHOST", "1")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    parallel.maybe_init_distributed()
    assert called["init"] == {"coordinator_address": "10.0.0.1:1234",
                              "num_processes": 4, "process_id": 2}


def test_is_main_process_guard(monkeypatch):
    from vwfd_tpu import parallel

    assert parallel.is_main_process()  # single-process: process 0
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    assert not parallel.is_main_process()


def test_cli_telemetry_respects_process0(tmp_path):
    from vwfd_tpu.config import Config

    mod = _load_train_module()

    class _Args:
        no_telemetry = False
        logdir = str(tmp_path / "runs")

    # non-main process: no logger, no montage dir, nothing written
    sl, md = mod._telemetry(Config(), _Args(), is_main=False)
    assert sl is None and md is None
    assert not os.path.exists(_Args.logdir)

    # main process: both wired
    sl, md = mod._telemetry(Config(), _Args(), is_main=True)
    assert sl is not None and md is not None
    sl.log(1, loss=0.5)
    sl.close()
    assert os.path.exists(os.path.join(_Args.logdir, "scalars.jsonl"))


@pytest.mark.slow
def test_two_process_cpu_dryrun(tmp_path):
    """REAL 2-process jax.distributed run (VERDICT r2 #5): coordinator +
    2 OS processes x 4 virtual CPU devices, production maybe_init_distributed
    / Loader per-process slicing / put_global assembly / cross-process grad
    all-reduce; asserts identical finite loss on every process. Also
    round-trips an orbax checkpoint under the multi-process sharding
    (VERDICT r3 #9): every process saves + restores, shard bit-equality."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "tools",
                                      "dryrun_multiprocess.py"),
         "--procs", "2", "--timeout", "1400",
         "--ckpt-dir", str(tmp_path / "mpckpt")],
        capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "dryrun_multiprocess ok: 2 processes" in r.stdout
    assert "orbax save/restore verified" in r.stdout


@pytest.mark.slow
def test_four_process_cpu_dryrun():
    """4-process depth (VERDICT r3 #9): 4 OS processes x 2 virtual CPU
    devices forming the same 8-device global mesh — the per-process batch
    slicing and grad all-reduce must hold at deeper process counts."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "tools",
                                      "dryrun_multiprocess.py"),
         "--procs", "4", "--local-devices", "2", "--timeout", "1400"],
        capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "dryrun_multiprocess ok: 4 processes" in r.stdout
