"""Train-state bundles + checkpointing.

Replaces BaseModel's save/load machinery (models/base_model.py:77-150) with
orbax: one checkpoint holds every net's params/variables/optimizer state plus
the step counter — full training-state resume, not just weights.
"""

import os
from typing import Any, Callable, Dict

import jax
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class NetState:
    """One network: params + extra variable collections + optimizer state."""
    params: Any
    variables: Any          # batch_stats / spectral collections (may be empty)
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, variables, tx):
        return cls(params=params, variables=variables,
                   opt_state=tx.init(params), tx=tx, apply_fn=apply_fn)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def adamw_chain(lr, beta1=0.9, beta2=0.999, weight_decay=1e-5, clip=1.0):
    """AdamW + global-norm clip — the reference's per-net optimizer recipe
    (models/IRNcrop_model.py:193-261 + clip_grad_norm_ at :410-412)."""
    steps = []
    if clip:
        steps.append(optax.clip_by_global_norm(clip))
    steps.append(optax.adamw(lr, b1=beta1, b2=beta2, weight_decay=weight_decay))
    return optax.chain(*steps)


def make_optimizer(tc):
    """Optimizer from a TrainConfig: AdamW + clip, with the configured LR
    schedule (constant / multistep-restart / cosine-restart, each optionally
    warmed up) — the reference's scheduler construction
    (models/IRNcrop_model.py:263-282 + base_model.py:51-75)."""
    from .schedules import multistep_restart, cosine_restart, with_warmup
    if tc.lr_scheme == "multistep" and tc.lr_milestones:
        lr = multistep_restart(tc.lr, tc.lr_milestones, tc.lr_gamma,
                               tc.lr_restarts or None,
                               tc.lr_restart_weights or None)
    elif tc.lr_scheme == "cosine" and tc.lr_periods:
        lr = cosine_restart(tc.lr, tc.lr_periods, tc.eta_min,
                            tc.lr_restart_weights or None)
    else:
        lr = tc.lr
    lr = with_warmup(lr, tc.warmup_steps)
    return adamw_chain(lr, tc.beta1, tc.beta2, tc.weight_decay,
                       tc.gradient_clipping)


def load_npz_tree(path: str):
    """Nested param dict from a `/`-flattened .npz (the converter's format,
    tools/convert_reference_checkpoint.py)."""
    import numpy as np
    flat = np.load(path)
    tree = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


def apply_pretrain(states: Dict[str, NetState], pretrain_path: str,
                   logger=None) -> Dict[str, NetState]:
    """Load converted reference weights (<name>.npz per net) into matching
    NetStates — the analog of the reference's startup pretrain load
    (models/IRNcrop_model.py:152-178 / base_model.py:117-127). Shapes are
    validated leaf-by-leaf; a missing file skips that net."""
    import os
    import numpy as np
    out = dict(states)
    for name, s in states.items():
        path = os.path.join(pretrain_path, f"{name}.npz")
        if not os.path.exists(path):
            continue
        tree = load_npz_tree(path)
        params = tree.pop("params")

        def _check(a, b, _name=name):
            if np.shape(a) != np.shape(b):
                raise ValueError(f"pretrain shape mismatch in {_name}: "
                                 f"{np.shape(a)} vs {np.shape(b)}")
        jax.tree_util.tree_map(_check, s.params, params)
        variables = s.variables
        if tree:  # extra collections (e.g. batch_stats)
            variables = {**variables, **tree}
        import jax.numpy as jnp
        out[name] = s.replace(
            params=jax.tree_util.tree_map(
                lambda t, x: jnp.asarray(x, dtype=t.dtype), s.params, params),
            variables=variables)
        if logger is not None:
            logger.info("loaded pretrain %s from %s", name, path)
    return out


def save_checkpoint(ckpt_dir: str, step: int, states: Dict[str, NetState]):
    """Orbax save of {name: (params, variables, opt_state)} + step."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    payload = {name: {"params": s.params, "variables": s.variables,
                      "opt_state": s.opt_state}
               for name, s in states.items()}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(ckpt_dir: str, step: int, states: Dict[str, NetState]):
    """Restore into existing NetState templates (shapes/dtypes must match)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    template = {name: {"params": s.params, "variables": s.variables,
                       "opt_state": s.opt_state}
                for name, s in states.items()}
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    return {name: states[name].replace(params=restored[name]["params"],
                                       variables=restored[name]["variables"],
                                       opt_state=restored[name]["opt_state"])
            for name in states}


def latest_step(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None
