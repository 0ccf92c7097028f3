"""Optimizers and schedules.

reference: torch.optim.Adam + StepLR in run_pde_observers.py, plus the
custom complex-aware Adam/NAdam in libs/pino_utils/{adam,negadam}.py —
unnecessary here because all params are real leaves (complex weights are
stored as (2, ...) real arrays, see ops/factorized.py).
"""
from __future__ import annotations

from typing import Optional

import optax


def step_lr(base_lr: float, step_size_epochs: int, gamma: float,
            steps_per_epoch: int):
    """torch.optim.lr_scheduler.StepLR equivalent."""
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=step_size_epochs * steps_per_epoch,
        decay_rate=gamma,
        staircase=True,
    )


def multistep_lr(base_lr: float, milestones, gamma: float):
    """torch MultiStepLR equivalent (PINO training, train_pino.py:208)."""
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def adam_l2(learning_rate, weight_decay: float = 0.0,
            grad_clip: Optional[float] = None):
    """Adam with torch-style (coupled) L2 weight decay: the decay is added
    to the gradient *before* the Adam moments, matching
    torch.optim.Adam(weight_decay=...)."""
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam())
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def negadam(learning_rate, weight_decay: float = 0.0):
    """NAdam variant (libs/pino_utils/negadam.py:54): Adam with Nesterov
    momentum."""
    parts = []
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(nesterov=True))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)
