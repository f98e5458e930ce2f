"""Optimizer and schedule factory with torch-matching semantics.

Capability spec: ``/root/reference/main.py:65-79`` — Adam or SGD with
``weight_decay`` as L2-into-gradient (torch semantics, not decoupled AdamW),
CE or BCE criterion.  The reference *declares* a scheduler block in its YAML
but never reads it (``/root/reference/config.yml:53-57``, SURVEY.md §5);
here it is actually wired: ``none | step | cosine | lin``.
"""

from __future__ import annotations

import optax

from montecarlo_gated_mil_tpu.core.config import TrainingPlan


def make_schedule(plan: TrainingPlan, steps_per_epoch: int = 1) -> optax.Schedule:
    """Learning-rate schedule in the configured decay units.

    With ``scheduler.unit == 'epoch'`` (the default — torch StepLR, the
    scheduler the reference's YAML declares, steps per *epoch*), decay
    points are epochs: callers pass ``steps_per_epoch`` (= ceil(bags /
    grad_acc_steps), the optimizer steps one epoch produces) and the
    optimizer-step schedule lands decays exactly on epoch boundaries —
    ``(s // spe) // step_size == s // (spe * step_size)`` for integers, so
    the staircase below is exact, not approximate.  With ``unit == 'step'``
    the decay counts optimizer steps directly (``steps_per_epoch`` is
    ignored).
    """
    base_lr = plan.parameters.lr
    sched = plan.scheduler
    name = sched.name.lower()
    if name in ("none", ""):
        return optax.constant_schedule(base_lr)
    if steps_per_epoch < 1:
        raise ValueError(f"steps_per_epoch must be >= 1, got {steps_per_epoch}")
    mult = steps_per_epoch if sched.unit.lower() == "epoch" else 1
    if name == "step":
        # lr * gamma^(unit_count // step_size) — torch StepLR semantics.
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=sched.step_size * mult,
            decay_rate=sched.gamma,
            staircase=True,
        )
    if name == "cosine":
        return optax.cosine_decay_schedule(
            init_value=base_lr, decay_steps=max(sched.step_size, 1) * mult
        )
    if name == "lin":
        return optax.linear_schedule(
            init_value=base_lr,
            end_value=base_lr * sched.gamma,
            transition_steps=max(sched.step_size, 1) * mult,
        )
    raise ValueError(f"unknown scheduler {sched.name!r}")


def make_optimizer(
    plan: TrainingPlan, steps_per_epoch: int = 1
) -> optax.GradientTransformation:
    """Adam/SGD with torch-style L2 weight decay folded into the gradient
    *before* the optimizer statistics (torch ``weight_decay`` semantics).
    ``steps_per_epoch`` converts epoch-unit schedules (see
    :func:`make_schedule`); it does not change the optimizer state shape,
    so checkpoints resume across different values."""
    schedule = make_schedule(plan, steps_per_epoch)
    wd = plan.parameters.wd
    name = plan.optimizer.lower()
    if name == "adam":
        core = optax.scale_by_adam()
    elif name == "sgd":
        core = optax.identity()
    else:
        raise ValueError(f"optimizer must be adam or sgd, got {plan.optimizer!r}")
    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(core)
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
