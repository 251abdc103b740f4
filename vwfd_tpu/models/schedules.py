"""LR schedules — reference: models/lr_scheduler.py (`MultiStepLR_Restart:8`,
`CosineAnnealingLR_Restart:34`) and BaseModel's linear warmup
(models/base_model.py:51-75 `update_learning_rate`). Expressed as optax
schedules so they compose into the optimizer chain (no mutable scheduler
objects)."""

from typing import Optional, Sequence

import numpy as np
import optax


def multistep_restart(base_lr: float, milestones: Sequence[int],
                      gamma: float = 0.5,
                      restarts: Optional[Sequence[int]] = None,
                      restart_weights: Optional[Sequence[float]] = None):
    """Step decay ×gamma at each milestone; optional restarts reset the decay
    and scale the base LR by the paired weight (lr_scheduler.py:8-31)."""
    restarts = list(restarts or [])
    restart_weights = list(restart_weights or [1.0] * len(restarts))
    milestones = list(milestones)

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step)
        # restart segment + its weight
        seg = jnp.sum(jnp.asarray([step >= r for r in restarts]).astype(jnp.int32)) \
            if restarts else 0
        weight = jnp.asarray([1.0] + restart_weights)[seg] if restarts else 1.0
        seg_start = jnp.asarray([0] + restarts)[seg] if restarts else 0
        local = step - seg_start
        n_decays = jnp.sum(jnp.asarray(
            [local >= m for m in milestones]).astype(jnp.int32))
        return base_lr * weight * (gamma ** n_decays)

    return schedule


def cosine_restart(base_lr: float, periods: Sequence[int],
                   eta_min: float = 0.0,
                   restart_weights: Optional[Sequence[float]] = None):
    """Cosine annealing with warm restarts (lr_scheduler.py:34-76)."""
    restart_weights = list(restart_weights or [1.0] * len(periods))
    bounds = np.cumsum([0] + list(periods))

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step)
        seg = jnp.clip(jnp.sum(jnp.asarray(
            [step >= b for b in bounds[1:]]).astype(jnp.int32)),
            0, len(periods) - 1)
        start = jnp.asarray(bounds[:-1])[seg]
        period = jnp.asarray(list(periods))[seg]
        w = jnp.asarray(restart_weights)[seg]
        t = (step - start) / period
        return eta_min + 0.5 * (base_lr * w - eta_min) * (1 + jnp.cos(jnp.pi * t))

    return schedule


def with_warmup(schedule_or_lr, warmup_steps: int):
    """Linear LR warmup (base_model.py:61-75 `_set_lr`/warmup branch)."""
    if warmup_steps <= 0:
        return schedule_or_lr
    base = schedule_or_lr if callable(schedule_or_lr) else (lambda s: schedule_or_lr)

    def schedule(step):
        import jax.numpy as jnp
        frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
        return base(step) * frac

    return schedule


def adamw_with_schedule(schedule, beta1=0.9, beta2=0.999, weight_decay=1e-5,
                        clip=1.0):
    steps = []
    if clip:
        steps.append(optax.clip_by_global_norm(clip))
    steps.append(optax.adamw(schedule, b1=beta1, b2=beta2,
                             weight_decay=weight_decay))
    return optax.chain(*steps)
