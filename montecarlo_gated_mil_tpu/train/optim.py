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


def make_schedule(plan: TrainingPlan) -> optax.Schedule:
    base_lr = plan.parameters.lr
    sched = plan.scheduler
    name = sched.name.lower()
    if name in ("none", ""):
        return optax.constant_schedule(base_lr)
    if name == "step":
        # lr * gamma^(step // step_size), torch StepLR semantics.
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=sched.step_size,
            decay_rate=sched.gamma,
            staircase=True,
        )
    if name == "cosine":
        return optax.cosine_decay_schedule(
            init_value=base_lr, decay_steps=max(sched.step_size, 1)
        )
    if name == "lin":
        return optax.linear_schedule(
            init_value=base_lr,
            end_value=base_lr * sched.gamma,
            transition_steps=max(sched.step_size, 1),
        )
    raise ValueError(f"unknown scheduler {sched.name!r}")


def make_optimizer(plan: TrainingPlan) -> optax.GradientTransformation:
    """Adam/SGD with torch-style L2 weight decay folded into the gradient
    *before* the optimizer statistics (torch ``weight_decay`` semantics)."""
    schedule = make_schedule(plan)
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
