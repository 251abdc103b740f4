"""REAL multi-process distributed dryrun on the CPU backend.

The reference scales by launching one process per GPU over NCCL
(reference train.py:20-33 `init_dist` + torch.distributed.launch). The
TPU-native analog is multi-host SPMD: every host calls
`jax.distributed.initialize()` (vwfd_tpu.parallel.maybe_init_distributed),
`jax.devices()` spans the pod, and the SAME mesh + NamedSharding program
runs everywhere. This tool validates that path end-to-end without a pod:

    python tools/dryrun_multiprocess.py --procs 2

spawns 2 OS processes, each owning 4 virtual CPU devices
(`--xla_force_host_platform_device_count=4`), forms the 8-device global
mesh, and drives ONE full flagship train step through the production
stack — `maybe_init_distributed` env-gating, `Loader`'s per-process row
slicing (the DistIterSampler per-rank split, data/data_sampler.py:31-40),
`put_global` / `jax.make_array_from_process_local_data` batch assembly,
replicated params, XLA-inserted cross-process grad all-reduce — then
asserts the loss is finite and bit-identical on every process and that
param replicas stayed in sync (the DDP invariant).
"""

import argparse
import os
import socket
import subprocess
import sys

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _child():
    import numpy as np
    import jax

    # Must land before the backend initializes — the env var alone is
    # unreliable when a TPU PJRT plugin is registered (tests/conftest.py:7-19).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    sys.path.insert(0, _ROOT)
    from vwfd_tpu.parallel import (maybe_init_distributed, make_mesh,
                                   batch_sharding, is_main_process)

    pid = maybe_init_distributed()
    assert jax.default_backend() == "cpu", jax.default_backend()
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.process_count() == nproc, (jax.process_count(), nproc)
    assert pid == int(os.environ["JAX_PROCESS_ID"])

    mesh = make_mesh(axes=("data",))
    n_dev = len(jax.devices())
    assert n_dev == nproc * jax.local_device_count()

    from __graft_entry__ import _tiny_model
    from vwfd_tpu.data import SyntheticVideoDataset, Loader
    from vwfd_tpu.models import VideoBatch

    # init_states(mesh=...) replicates params via put_global — every process
    # computes the same init from the same PRNGKey, so replicas agree.
    model, states, cfg = _tiny_model(mesh=mesh)

    ds = SyntheticVideoDataset(size=64, frames=2, length=64, seed=0)
    loader = Loader(ds, batch_size=n_dev, seed=0,
                    sharding=batch_sharding(mesh))
    video, mask = next(iter(loader))
    assert len(video.sharding.device_set) == n_dev, (
        "loader batch must span the global mesh")
    assert video.shape[0] == n_dev, "global batch shape must be global-sized"

    batch = VideoBatch(video, mask)
    new_states, logs = model.train_step(states, batch, video,
                                        jax.random.PRNGKey(1))
    jax.block_until_ready(new_states["netG"].params)
    loss = float(logs["loss"])
    assert np.isfinite(loss), f"non-finite loss: {loss}"

    # DDP invariant: replicated params identical across this process's
    # local devices after the cross-process synced update.
    checked = 0
    for leaf in jax.tree_util.tree_leaves(new_states["netG"].params):
        if not leaf.sharding.is_fully_replicated:
            continue
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        if len(shards) > 1:
            for s in shards[1:]:
                assert np.array_equal(shards[0], s), "replicas diverged"
            checked += 1
        if checked >= 4:
            break
    assert checked > 0, "no leaf with >1 local replica"

    # Orbax save/restore under multi-process sharding (VERDICT r3 #9): every
    # process participates in the save (orbax coordinates through the jax
    # distributed runtime), then restores into the same sharded templates and
    # checks bit-equality shard by shard.
    ckpt_dir = os.environ.get("VWFD_DRYRUN_CKPT")
    if ckpt_dir:
        from vwfd_tpu.models.state import save_checkpoint, restore_checkpoint

        save_checkpoint(ckpt_dir, 1, new_states)
        restored = restore_checkpoint(ckpt_dir, 1, new_states)
        compared = 0
        for name in new_states:
            la = jax.tree_util.tree_leaves(new_states[name].params)
            lb = jax.tree_util.tree_leaves(restored[name].params)
            assert len(la) == len(lb)
            for a, b in zip(la, lb):
                for sa, sb in zip(a.addressable_shards, b.addressable_shards):
                    assert np.array_equal(np.asarray(sa.data),
                                          np.asarray(sb.data)), \
                        f"restored shard differs in {name}"
                    compared += 1
        assert compared > 0
        print(f"ckpt roundtrip ok shards={compared}", flush=True)

    print(f"ok process={pid}/{nproc} main={is_main_process()} "
          f"devices={n_dev} loss={loss:.6f} replicas_checked={checked}",
          flush=True)


def _driver(procs, local_devices, timeout, ckpt_dir=None):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env_base = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
        VWFD_MULTIHOST="1",
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        JAX_NUM_PROCESSES=str(procs),
    )
    if ckpt_dir:
        env_base["VWFD_DRYRUN_CKPT"] = os.path.abspath(ckpt_dir)
    children = []
    for i in range(procs):
        env = dict(env_base, JAX_PROCESS_ID=str(i))
        children.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, cwd=_ROOT, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs, rcs = [], []
    for i, c in enumerate(children):
        try:
            out, _ = c.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for cc in children:
                cc.kill()
            raise SystemExit(f"process {i} timed out after {timeout}s")
        outs.append(out)
        rcs.append(c.returncode)
    for i, (rc, out) in enumerate(zip(rcs, outs)):
        if rc != 0:
            sys.stderr.write(f"--- process {i} (rc={rc}) ---\n{out}\n")
    if any(rcs):
        raise SystemExit("multi-process dryrun FAILED")
    losses = set()
    for out in outs:
        ok = [l for l in out.splitlines() if l.startswith("ok process=")]
        assert ok, f"no ok line in:\n{out}"
        losses.add(ok[-1].split("loss=")[1].split()[0])
        if ckpt_dir:
            assert any(l.startswith("ckpt roundtrip ok")
                       for l in out.splitlines()), \
                f"no ckpt roundtrip line in:\n{out}"
    assert len(losses) == 1, f"loss differs across processes: {losses}"
    print(f"dryrun_multiprocess ok: {procs} processes x {local_devices} "
          f"devices, loss={losses.pop()} identical on every process"
          + (", orbax save/restore verified" if ckpt_dir else ""))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--ckpt-dir", default=None,
                    help="also round-trip an orbax checkpoint under the "
                         "multi-process sharding (every process saves + "
                         "restores; shard-level bit-equality asserted)")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        _child()
    else:
        _driver(args.procs, args.local_devices, args.timeout, args.ckpt_dir)


if __name__ == "__main__":
    main()
