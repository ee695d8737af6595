"""Train/eval engine: jitted steps + host epoch loops.

Rebuild of the reference ``engine.py`` with the torch loop inverted the JAX
way: everything per-batch (mixup, forward, loss, backward, optimizer, EMA)
fuses into ONE jitted ``train_step`` so the TPU never waits on python
(reference: ``engine.py:42-81`` does these as separate host-driven torch calls).

bf16 notes: the reference trains under CUDA AMP with a grad scaler
(``engine.py:52,68``). On TPU we run bf16 activations with fp32 params/optimizer
state — bf16's exponent range makes loss scaling unnecessary, so there is no
scaler (documented divergence; fidelity kept by matching the math, not the
mechanism).
"""
from __future__ import annotations

import math
import sys
import typing as typ
from functools import partial

import jax
import jax.numpy as jnp
import optax

from .losses import accuracy_topk, cross_entropy, distillation_loss
from .train_state import TrainState
from .utils.metrics import MetricLogger, SmoothedValue


def _collect_moe_metrics(mut: dict) -> typ.Dict[str, jnp.ndarray]:
    """Average each sown moe metric (balance_loss, drop_fraction,
    skip_fraction) across blocks."""
    if "moe_metrics" not in mut:
        return {}
    buckets: typ.Dict[str, list] = {}

    def walk(tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if isinstance(v, dict):
                    walk(v)
                else:
                    buckets.setdefault(k, []).append(jnp.asarray(v))

    walk(mut["moe_metrics"])
    return {k: jnp.mean(jnp.stack(v)) for k, v in buckets.items()}


def make_train_step(model, update_fn, base_criterion, *,
                    distillation_type: str = "none", alpha: float = 0.5,
                    tau: float = 1.0, teacher_apply=None,
                    ema_decay: typ.Optional[float] = None,
                    moe_balance_weight: float = 0.0,
                    mixup_fn=None, bce_loss: bool = False,
                    augment_fn=None, donate: bool = True,
                    set_training_mode: bool = True,
                    use_fused_optimizer: bool = False):
    """Build the jitted train step.

    Args:
        update_fn: from optim.make_optimizer — (grads, opt_state, params,
            lr_base, lr_gate) -> (updates, opt_state).
        teacher_apply: fn(images)->logits for distillation (frozen, no grad).
        mixup_fn: fn(rng, images, int_labels) -> (images, soft_targets); runs
            on-device inside the step (TPU-first; reference applies timm Mixup
            on device per batch, engine.py:46-47).
    Returns:
        train_step(state, images, targets, lr_base, lr_gate) -> (state, metrics)
    """

    def train_step(state: TrainState, images, targets, lr_base, lr_gate):
        rng, drop_rng, mix_rng, aug_rng = jax.random.split(state.rng, 4)

        if augment_fn is not None:
            # fused on-device augmentation (uint8 in, normalized float out)
            images = augment_fn(aug_rng, images)
        if mixup_fn is not None:
            images, targets = mixup_fn(mix_rng, images, targets)
        if bce_loss:
            targets = (targets > 0.0).astype(jnp.float32)  # engine.py:49-50

        teacher_logits = None
        if distillation_type != "none" and teacher_apply is not None:
            teacher_logits = jax.lax.stop_gradient(teacher_apply(images))

        def loss_fn(params):
            variables = {"params": params}
            if state.gates:
                variables["gates"] = state.gates
            # set_training_mode=False keeps dropout/droppath off while still
            # training (reference engine.py:36 model.train(set_training_mode),
            # used for DeiT finetuning, main.py:837)
            out, mut = model.apply(
                variables, images, deterministic=not set_training_mode,
                rngs={"dropout": drop_rng}, mutable=["moe_metrics"],
            )
            if isinstance(out, tuple):
                logits, logits_kd = out
            else:
                logits, logits_kd = out, None
            base = base_criterion(logits, targets)
            loss = distillation_loss(
                base, logits_kd, teacher_logits, distillation_type, alpha, tau
            )
            moe_metrics = _collect_moe_metrics(mut)
            if moe_balance_weight and "balance_loss" in moe_metrics:
                loss = loss + moe_balance_weight * moe_metrics["balance_loss"]
            return loss, moe_metrics

        (loss, moe_metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # measured on v5e: XLA fuses the optax chain to ~1 TB/s effective;
        # the Pallas fused optimizer is at parity (ops/fused_adamw.py), so it
        # stays opt-in
        fused_apply = (getattr(update_fn, "fused_apply", None)
                       if use_fused_optimizer else None)
        if fused_apply is not None:
            # single-pass Pallas AdamW+EMA (ops/fused_adamw.py) — same math,
            # ~1/2 the optimizer HBM traffic
            ema_in = state.ema_params if ema_decay is not None else None
            params, opt_state, ema_out = fused_apply(
                state.params, grads, state.opt_state, ema_in,
                lr_base, lr_gate, ema_decay)
            ema = ema_out if ema_in is not None else state.ema_params
        else:
            updates, opt_state = update_fn(
                grads, state.opt_state, state.params, lr_base, lr_gate)
            params = optax.apply_updates(state.params, updates)

            ema = state.ema_params
            if ema is not None and ema_decay is not None:
                # timm ModelEma: e = d*e + (1-d)*p (engine.py:77-78)
                ema = jax.tree.map(
                    lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                    ema, params,
                )

        metrics = {"loss": loss, **moe_metrics}
        new_state = state.replace(
            params=params, opt_state=opt_state, ema_params=ema,
            rng=rng, step=state.step + 1,
        )
        return new_state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)


def make_eval_step(model, use_ema: bool = False, preprocess_fn=None):
    """Eval step: CE loss + top-1/5 accuracy (reference engine.py:88-112)."""

    @jax.jit
    def eval_step(state: TrainState, images, targets):
        if preprocess_fn is not None:
            images = preprocess_fn(images)
        params = state.ema_params if use_ema else state.params
        variables = {"params": params}
        if state.gates:
            variables["gates"] = state.gates
        logits = model.apply(variables, images, deterministic=True)
        loss = cross_entropy(logits, targets)
        acc1, acc5 = accuracy_topk(logits, targets, ks=(1, 5))
        return loss, acc1, acc5

    return eval_step


def train_one_epoch(state: TrainState, train_step, data_loader, epoch: int,
                    lr_base: float, lr_gate: float, *, print_freq: int = 10,
                    max_steps: typ.Optional[int] = None,
                    abort_on_nan: bool = True):
    """Host epoch loop (reference engine.py:22-85). Returns (state, stats).

    Async metric fetch: device→host transfers stall the accelerator, so step
    metrics are buffered as device arrays and fetched only every
    ``print_freq`` steps (and at epoch end). The NaN abort (reference
    engine.py:56-60) therefore fires up to print_freq-1 steps late — the same
    window CUDA's async queue gives the reference in practice.
    """
    metric_logger = MetricLogger(delimiter="  ")
    metric_logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
    header = f"Epoch: [{epoch}]"

    window: typ.List[dict] = []  # un-fetched device metrics

    def drain():
        if not window:
            return
        # ONE device_get for the whole window — per-scalar fetches cost a
        # full host round-trip each (~27 ms over this tunnel), which round 2
        # measured as the gap between main.py and bench.py throughput
        fetched = jax.device_get(window)
        window.clear()
        for m in fetched:
            loss_value = float(m["loss"])
            if abort_on_nan and not math.isfinite(loss_value):
                # reference crash-fast behavior (engine.py:56-60)
                print(f"Loss is {loss_value}, stopping training")
                sys.exit(1)
            extra = {k: float(m[k]) for k in
                     ("balance_loss", "drop_fraction", "skip_fraction")
                     if k in m}
            metric_logger.update(loss=loss_value, lr=lr_base, **extra)

    n = 0
    for samples, targets in metric_logger.log_every(data_loader, print_freq, header):
        state, metrics = train_step(
            state, jnp.asarray(samples), jnp.asarray(targets),
            jnp.asarray(lr_base, jnp.float32), jnp.asarray(lr_gate, jnp.float32),
        )
        window.append(metrics)
        n += 1
        if n % print_freq == 0:
            drain()
        if max_steps is not None and n >= max_steps:
            break

    drain()
    metric_logger.synchronize_between_processes()
    print("Averaged stats:", metric_logger)
    return state, {k: m.global_avg for k, m in metric_logger.meters.items()}


def evaluate(state: TrainState, eval_step, data_loader, *, print_freq: int = 10,
             max_steps: typ.Optional[int] = None):
    """Eval loop (reference engine.py:88-121).

    Metrics are buffered as device values and fetched in ONE device_get per
    ``print_freq`` window — per-scalar fetches cost a full host round-trip
    each (~27 ms on this tunnel; three per batch dominated real eval time).
    """
    metric_logger = MetricLogger(delimiter="  ")
    header = "Test:"
    window: typ.List[tuple] = []  # (batch_size, device (loss, acc1, acc5))

    def drain():
        if not window:
            return
        fetched = jax.device_get([m for _, m in window])
        sizes = [bs for bs, _ in window]
        window.clear()
        for bs, (loss, acc1, acc5) in zip(sizes, fetched):
            metric_logger.update(loss=float(loss))
            metric_logger.meters["acc1"].update(float(acc1), n=bs)
            metric_logger.meters["acc5"].update(float(acc5), n=bs)

    n = 0
    for images, target in metric_logger.log_every(data_loader, print_freq, header):
        bs = images.shape[0]
        metrics = eval_step(state, jnp.asarray(images), jnp.asarray(target))
        window.append((bs, metrics))
        n += 1
        if n % print_freq == 0:
            drain()
        if max_steps is not None and n >= max_steps:
            break

    drain()
    metric_logger.synchronize_between_processes()
    print("* Acc@1 {:.3f} Acc@5 {:.3f} loss {:.3f}".format(
        metric_logger.acc1.global_avg, metric_logger.acc5.global_avg,
        metric_logger.loss.global_avg,
    ))
    return {k: m.global_avg for k, m in metric_logger.meters.items()}
