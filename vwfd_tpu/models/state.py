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
