"""Training losses for the DeiT workload.

Re-implements the reference's DistillationLoss (workloads/deit/losses.py):
base criterion plus none/soft/hard distillation against a teacher's logits,
weighted by alpha; soft uses KL at temperature tau.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def soft_kl(student_logits, teacher_logits, tau: float) -> jax.Array:
    """KL(teacher || student) at temperature tau, scaled by tau^2 / N."""
    t = jax.nn.softmax(teacher_logits / tau, axis=-1)
    log_s = jax.nn.log_softmax(student_logits / tau, axis=-1)
    log_t = jax.nn.log_softmax(teacher_logits / tau, axis=-1)
    kl = jnp.sum(t * (log_t - log_s), axis=-1)
    return jnp.mean(kl) * tau * tau


def distillation_loss(
    base_criterion: Callable,
    student_outputs,
    labels,
    teacher_logits: Optional[jax.Array] = None,
    distillation_type: str = "none",
    alpha: float = 0.5,
    tau: float = 1.0,
):
    """student_outputs: logits, or (cls_logits, dist_logits) for models with
    a distillation token (reference losses.py forward)."""
    if isinstance(student_outputs, tuple):
        outputs, outputs_kd = student_outputs
    else:
        outputs = outputs_kd = student_outputs

    base = base_criterion(outputs, labels)
    if distillation_type == "none":
        return base
    assert teacher_logits is not None, \
        "distillation requires teacher logits"

    if distillation_type == "soft":
        dist = soft_kl(outputs_kd, teacher_logits, tau)
    elif distillation_type == "hard":
        hard_labels = jnp.argmax(teacher_logits, axis=-1)
        logp = jax.nn.log_softmax(outputs_kd, axis=-1)
        dist = -jnp.mean(
            jnp.take_along_axis(logp, hard_labels[:, None], axis=-1))
    else:
        raise ValueError(distillation_type)
    return base * (1 - alpha) + dist * alpha
