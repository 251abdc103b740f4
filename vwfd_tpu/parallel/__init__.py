"""Device mesh + sharding — the TPU-native replacement for the reference's
NCCL/DDP stack (train.py:20-33 `init_dist`, models/IRN_model.py:150-163 DDP,
data/data_sampler.py `DistIterSampler`).

Design (SURVEY.md §2.1/§5): the reference has *data parallelism only*. Here
that is a 1-D `Mesh(('data',))`: the batch dim is sharded with NamedSharding,
params are replicated, and XLA inserts the gradient all-reduce over ICI —
no NCCL analog, no per-rank process logic, one program.

`make_mesh(n)` also supports a 2-D ('data','frame') layout that additionally
shards the video clip dim T — the TPU-native generalization SURVEY.md §2.1
suggests beyond parity.
"""

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> int:
    """Multi-host entry — the SPMD replacement for the reference's per-GPU
    process spawn + NCCL `init_process_group` (train.py:20-33).

    Env-gated so single-host runs (v5e-8 and below) pay nothing: set
    `VWFD_MULTIHOST=1` (with the standard JAX cluster env — coordinator
    address/process id auto-detected on TPU pods, or JAX_COORDINATOR_ADDRESS /
    JAX_PROCESS_ID / JAX_NUM_PROCESSES elsewhere) and every host calls
    `jax.distributed.initialize()`; afterwards `jax.devices()` spans the pod
    and the same `Mesh` + NamedSharding code drives DCN+ICI collectives.

    Returns the process index (0 on single-host). Callers gate logging,
    checkpoint writes, and montage dumps on `process_index() == 0` — the
    analog of the reference's `rank <= 0` guards (train.py:96-109)."""
    if os.environ.get("VWFD_MULTIHOST", "") not in ("", "0", "false"):
        kwargs = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kwargs = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        jax.distributed.initialize(**kwargs)
    return jax.process_index()


def is_main_process() -> bool:
    """Process-0 guard (reference `rank <= 0`, train.py:96-109)."""
    return jax.process_index() == 0


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",)) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.asarray(devs[:n])
    if len(axes) == 1:
        return Mesh(devs.reshape(n), axes)
    # 2-D layout: put the larger factor on 'data'
    d2 = 1
    for f in range(int(np.sqrt(n)), 0, -1):
        if n % f == 0:
            d2 = f
            break
    return Mesh(devs.reshape(n // d2, d2), axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim across 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def video_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, H, W, C) over a ('data','frame') mesh."""
    if "frame" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "frame"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """Place one host array under `sharding`, multi-process aware.

    Single-process: plain `device_put`. Multi-process (after
    `maybe_init_distributed`): `device_put` cannot target non-addressable
    devices, so each process contributes its *local* chunk of the global
    array via `jax.make_array_from_process_local_data` — for a replicated
    sharding that chunk is the full array (every host computes/loads the
    same values), for a batch-dim sharding it is this process's contiguous
    row block (the per-rank `batch_size // world_size` split of the
    reference, data/__init__.py:16-17)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding,
                                                      np.asarray(x))
    return jax.device_put(x, sharding)


def shard_batch(batch, mesh: Mesh, spec: Optional[NamedSharding] = None):
    """Place a host batch (pytree) on the mesh, sharded on the leading dim."""
    sh = spec or batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), tree)


def local_batch_slice(global_batch_size: int):
    """This process's contiguous row range [lo, hi) of a global batch —
    the DistIterSampler per-rank split (data/data_sampler.py:31-40), made
    contiguous because a 1-D mesh built from `jax.devices()` orders devices
    process-major, so process p owns rows [p*B/P, (p+1)*B/P)."""
    pc = jax.process_count()
    assert global_batch_size % pc == 0, (
        f"global batch {global_batch_size} must divide process count {pc}")
    per = global_batch_size // pc
    lo = jax.process_index() * per
    return lo, lo + per
