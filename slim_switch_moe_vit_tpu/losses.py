"""Training criteria (reference: ``losses.py``, timm loss classes used in
``main.py:653-694``, BCE target transform ``engine.py:49-50``).

All losses are pure functions logits×targets → scalar, fp32.
"""
from __future__ import annotations

import typing as typ
from functools import partial

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels):
    """Plain CE with integer labels (torch.nn.CrossEntropyLoss, main.py:661)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def label_smoothing_cross_entropy(logits, labels, smoothing: float = 0.1):
    """timm LabelSmoothingCrossEntropy (main.py:659)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def soft_target_cross_entropy(logits, target):
    """timm SoftTargetCrossEntropy for mixup soft labels (main.py:657)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-target.astype(jnp.float32) * logp, axis=-1))


def bce_with_logits(logits, target):
    """torch.nn.BCEWithLogitsLoss (main.py:663-664). The engine binarizes the
    target first (``targets.gt(0.0)``, engine.py:49-50) — callers do the same."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # numerically-stable BCE: max(x,0) - x*t + log(1+exp(-|x|))
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.mean(loss)


def make_base_criterion(mixup_active: bool, smoothing: float, bce_loss: bool
                        ) -> typ.Callable:
    """Criterion selection mirroring main.py:653-664."""
    if bce_loss:
        return lambda logits, target: bce_with_logits(
            logits, (target > 0.0).astype(jnp.float32)
        )
    if mixup_active:
        return soft_target_cross_entropy
    if smoothing:
        return partial(label_smoothing_cross_entropy, smoothing=smoothing)
    return cross_entropy


def distillation_loss(base_loss: jnp.ndarray, outputs_kd: typ.Optional[jnp.ndarray],
                      teacher_logits: typ.Optional[jnp.ndarray],
                      distillation_type: str, alpha: float, tau: float):
    """DeiT DistillationLoss blend (reference losses.py:28-73).

    ``soft``: KL(log_softmax(student/T) || log_softmax(teacher/T)), summed then
    divided by student numel, × T² (matches F.kl_div(..., 'sum', log_target) /
    numel, losses.py:57-65). ``hard``: CE vs teacher argmax (losses.py:69-70).
    """
    if distillation_type == "none":
        return base_loss
    assert outputs_kd is not None and teacher_logits is not None
    teacher_logits = jax.lax.stop_gradient(teacher_logits.astype(jnp.float32))
    if distillation_type == "soft":
        T = tau
        s = jax.nn.log_softmax(outputs_kd.astype(jnp.float32) / T, axis=-1)
        t = jax.nn.log_softmax(teacher_logits / T, axis=-1)
        # KL(t||s) with log inputs: sum t_p * (t - s)
        kl = jnp.sum(jnp.exp(t) * (t - s))
        dist = kl * (T * T) / outputs_kd.size
    elif distillation_type == "hard":
        dist = cross_entropy(outputs_kd, jnp.argmax(teacher_logits, axis=-1))
    else:
        raise ValueError(distillation_type)
    return base_loss * (1.0 - alpha) + dist * alpha


def accuracy_topk(logits, labels, ks=(1, 5)):
    """top-k accuracy in percent (timm.utils.accuracy used in engine.py:107)."""
    maxk = max(ks)
    k_eff = min(maxk, logits.shape[-1])
    _, pred = jax.lax.top_k(logits, k_eff)
    correct = pred == labels[:, None]
    return [
        jnp.mean(jnp.any(correct[:, : min(k, k_eff)], axis=-1).astype(jnp.float32))
        * 100.0
        for k in ks
    ]
