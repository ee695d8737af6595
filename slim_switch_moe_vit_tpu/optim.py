"""Optimizer + LR schedule with timm-parity semantics.

The reference builds AdamW through timm's ``create_optimizer_v2`` with a custom
``param_group_fn`` giving skip gates their own LR (``main.py:619-631,729-731``)
and a cosine schedule stepped per epoch through ``create_scheduler``
(``main.py:734,886``). Parity points implemented here:

- **weight-decay mask**: timm excludes biases/1-d params and the model's
  ``no_weight_decay()`` set ({pos_embed, cls_token, dist_token},
  reference ``vision_transformer.py`` / timm optim factory defaults).
- **two LR groups**: params whose path contains ``moe_gate``/``dense_gate``
  train at ``--gate-lr``; timm schedulers scale every group by the same
  relative curve, so both groups share one scale factor applied to their own
  base LR.
- **epoch-granular cosine**: lr constant within an epoch; linear warmup from
  ``warmup_lr`` over ``warmup_epochs``; cosine from base to ``min_lr`` at
  ``epochs``; ``min_lr`` during cooldown.

The optimizer is hand-rolled on optax primitives so the two dynamic LR scalars
can be fed into the jitted step each epoch without re-jitting.
"""
from __future__ import annotations

import math
import typing as typ

import jax
import jax.numpy as jnp
import optax

NO_WEIGHT_DECAY_NAMES = {"pos_embed", "cls_token", "dist_token"}
GATE_MARKERS = ("moe_gate", "dense_gate")


def _path_names(path) -> typ.List[str]:
    return [str(getattr(k, "key", getattr(k, "name", k))) for k in path]


def is_gate_param(path) -> bool:
    names = _path_names(path)
    return any(any(m in n for m in GATE_MARKERS) for n in names)


def wd_mask(params):
    """True where weight decay applies (timm: ndim>1 and not in no-decay set).

    Expert-stacked biases (E, h) are 2-d here but correspond to the reference's
    per-expert 1-d biases, so anything named ``*bias*`` is also excluded.
    """

    def f(path, leaf):
        names = _path_names(path)
        if any(n in NO_WEIGHT_DECAY_NAMES for n in names):
            return False
        if "bias" in names[-1]:
            return False
        return leaf.ndim > 1

    return jax.tree_util.tree_map_with_path(f, params)


def gate_mask(params):
    return jax.tree_util.tree_map_with_path(lambda p, _: is_gate_param(p), params)


def attn_only_mask(params):
    """Trainable mask for ``--attn-only`` finetuning (reference
    main.py:575-595): attention params, the classifier head, and pos_embed
    train; patch embed and everything else freeze."""

    def f(path, _):
        names = _path_names(path)
        if any(n == "patch_embed" for n in names):
            return False
        if any("attn" in n for n in names):
            return True
        if names and names[0] in ("head", "head_dist", "fc", "pos_embed"):
            return True
        return False

    return jax.tree_util.tree_map_with_path(f, params)


class TimmCosineSchedule:
    """lr(epoch) per param group, matching timm CosineLRScheduler defaults as
    driven by the reference CLI (sched=cosine, warmup_prefix False)."""

    def __init__(self, base_lr: float, epochs: int, warmup_epochs: int = 5,
                 warmup_lr: float = 1e-6, min_lr: float = 1e-5,
                 cooldown_epochs: int = 10,
                 noise_range: typ.Optional[typ.Sequence[float]] = None,
                 noise_pct: float = 0.67, noise_std: float = 1.0,
                 noise_seed: int = 42):
        self.base_lr = base_lr
        self.epochs = epochs
        self.warmup_epochs = warmup_epochs
        self.warmup_lr = warmup_lr
        self.min_lr = min_lr
        self.cooldown_epochs = cooldown_epochs
        # timm lr-noise: epoch percentages of t_initial (--lr-noise pct pct)
        self.noise_range = None
        if noise_range:
            rng = [p * epochs if p < 1.0 else p for p in noise_range]
            self.noise_range = (rng[0], rng[1] if len(rng) > 1 else epochs)
        self.noise_pct = noise_pct
        self.noise_std = noise_std
        self.noise_seed = noise_seed

    def _noise(self, epoch: int) -> float:
        """timm Scheduler._calculate_noise: per-epoch seeded gaussian clipped
        to +/- noise_pct."""
        if self.noise_range is None:
            return 0.0
        if not (self.noise_range[0] <= epoch < self.noise_range[1]):
            return 0.0
        import numpy as np

        g = np.random.RandomState(self.noise_seed + epoch)
        while True:
            n = g.randn() * self.noise_std
            if abs(n) < self.noise_pct:
                return float(n)

    def scale(self, epoch: int) -> float:
        """Relative multiplier applied to every group's base lr. Warmup is an
        absolute ramp for the main group; we return the main group's ratio and
        let groups share it (timm scales groups proportionally)."""
        return self(epoch) / self.base_lr if self.base_lr > 0 else 0.0

    def __call__(self, epoch: int) -> float:
        if self.warmup_epochs > 0 and epoch < self.warmup_epochs:
            slope = (self.base_lr - self.warmup_lr) / self.warmup_epochs
            return self.warmup_lr + slope * epoch
        if epoch >= self.epochs:
            return self.min_lr
        t = epoch / max(self.epochs, 1)
        lr = self.min_lr + 0.5 * (self.base_lr - self.min_lr) * (
            1.0 + math.cos(math.pi * t)
        )
        return lr * (1.0 + self._noise(epoch))


class TimmStepSchedule:
    """lr(epoch) matching timm StepLRScheduler as driven by the reference CLI
    (``--sched step --decay-epochs N --decay-rate R``): linear warmup, then
    ``base_lr * R ** (epoch // N)``. timm does not clamp step decay to
    ``min_lr``; lr-noise applies the same way as for cosine."""

    def __init__(self, base_lr: float, epochs: int, *, decay_epochs: float = 30,
                 decay_rate: float = 0.1, warmup_epochs: int = 5,
                 warmup_lr: float = 1e-6,
                 noise_range: typ.Optional[typ.Sequence[float]] = None,
                 noise_pct: float = 0.67, noise_std: float = 1.0,
                 noise_seed: int = 42):
        self.base_lr = base_lr
        self.epochs = epochs
        self.decay_epochs = max(decay_epochs, 1e-9)
        self.decay_rate = decay_rate
        self.warmup_epochs = warmup_epochs
        self.warmup_lr = warmup_lr
        self._noise_helper = TimmCosineSchedule(
            base_lr, epochs, noise_range=noise_range, noise_pct=noise_pct,
            noise_std=noise_std, noise_seed=noise_seed)

    def scale(self, epoch: int) -> float:
        return self(epoch) / self.base_lr if self.base_lr > 0 else 0.0

    def __call__(self, epoch: int) -> float:
        if self.warmup_epochs > 0 and epoch < self.warmup_epochs:
            slope = (self.base_lr - self.warmup_lr) / self.warmup_epochs
            return self.warmup_lr + slope * epoch
        lr = self.base_lr * self.decay_rate ** int(epoch // self.decay_epochs)
        return lr * (1.0 + self._noise_helper._noise(epoch))


class TimmPlateauSchedule:
    """``--sched plateau``: timm PlateauLRScheduler semantics — a thin wrapper
    around ``torch.optim.lr_scheduler.ReduceLROnPlateau`` (mode inferred from
    the eval metric; accuracy -> 'max') with timm's linear warmup on top.
    Parity-tested against torch's ReduceLROnPlateau itself
    (tests/test_optim_extras.py), since torch is the authoritative
    implementation timm defers to.

    NOTE the reference driver cannot actually run plateau: it steps the
    scheduler without a metric (``/root/reference/main.py:886``
    ``lr_scheduler.step(epoch)``), and torch's ReduceLROnPlateau then raises
    on ``float(None)``. Implemented here are the INTENDED semantics — the way
    timm's own train loop drives it, feeding the epoch's eval metric — via
    ``observe(metric)`` called after each epoch's eval (main.py). lr-noise is
    not supported with plateau (timm applies/restores it around the torch
    state in a way that cannot be reproduced without torch's internals;
    passing ``--lr-noise`` with plateau raises up front).

    torch-parity points (ReduceLROnPlateau defaults): relative improvement
    threshold 1e-4 — for mode 'max' an epoch improves iff
    ``metric > best * (1 + 1e-4)`` — patience counted in *bad* epochs, decay
    ``lr *= decay_rate`` floored at ``min_lr``, cooldown 0.
    """

    def __init__(self, base_lr: float, epochs: int, *, decay_rate: float = 0.1,
                 patience_epochs: int = 10, warmup_epochs: int = 5,
                 warmup_lr: float = 1e-6, min_lr: float = 1e-5,
                 mode: str = "max", threshold: float = 1e-4,
                 eps: float = 1e-8):
        self.base_lr = base_lr
        self.epochs = epochs
        self.decay_rate = decay_rate
        self.patience = patience_epochs
        self.warmup_epochs = warmup_epochs
        self.warmup_lr = warmup_lr
        self.min_lr = min_lr
        self.mode = mode
        self.threshold = threshold
        self.eps = eps
        self.current_lr = base_lr
        self.best = -math.inf if mode == "max" else math.inf
        self.num_bad = 0

    def _is_better(self, metric: float) -> bool:
        # torch ReduceLROnPlateau.is_better, threshold_mode='rel'
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold)
        return metric < self.best * (1.0 - self.threshold)

    def observe(self, epoch: int, metric: float) -> None:
        """Feed epoch's eval metric (timm train loop:
        ``lr_scheduler.step(epoch + 1, eval_metric)``). No-op during warmup,
        mirroring timm's PlateauLRScheduler.step warmup branch."""
        if self.warmup_epochs > 0 and epoch < self.warmup_epochs:
            return
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            # torch _reduce_lr: floor at min_lr, skip sub-eps updates (so the
            # lr can never INCREASE toward min_lr, and tiny lrs stop moving)
            new_lr = max(self.current_lr * self.decay_rate, self.min_lr)
            if self.current_lr - new_lr > self.eps:
                self.current_lr = new_lr
            self.num_bad = 0

    def scale(self, epoch: int) -> float:
        return self(epoch) / self.base_lr if self.base_lr > 0 else 0.0

    def __call__(self, epoch: int) -> float:
        if self.warmup_epochs > 0 and epoch < self.warmup_epochs:
            slope = (self.base_lr - self.warmup_lr) / self.warmup_epochs
            return self.warmup_lr + slope * epoch
        return self.current_lr

    # Unlike cosine/step, plateau is STATEFUL — the reference checkpoints
    # lr_scheduler.state_dict() (main.py:900) so a resumed run keeps its
    # decay bookkeeping. Same here via a JSON sidecar
    # (utils/checkpoint.py::save_checkpoint extra={"sched": ...}).
    def state_dict(self) -> dict:
        return {"current_lr": self.current_lr, "best": self.best,
                "num_bad": self.num_bad}

    def load_state_dict(self, st: dict) -> None:
        self.current_lr = float(st["current_lr"])
        self.best = float(st["best"])
        self.num_bad = int(st["num_bad"])


class TimmTanhSchedule:
    """``--sched tanh``: timm TanhLRScheduler — the hyperbolic-tangent decay
    of Hsueh et al. 2018 (arXiv:1806.01593), the fourth and last schedule the
    DeiT-era timm ``create_scheduler`` dispatches (cosine/tanh/step/plateau).

    Decay: ``lr = min_lr + 0.5*(base - min_lr) * (1 - tanh(lb + (ub-lb)*t/T))``
    with timm's defaults ``lb=-6.0, ub=4.0`` (not CLI-exposed in the reference,
    so the defaults are the whole surface). Warmup ramp, cooldown-to-min_lr,
    and lr-noise behave exactly as in TimmCosineSchedule (shared timm
    ``Scheduler`` base-class behavior)."""

    def __init__(self, base_lr: float, epochs: int, *, lb: float = -6.0,
                 ub: float = 4.0, warmup_epochs: int = 5,
                 warmup_lr: float = 1e-6, min_lr: float = 1e-5,
                 cooldown_epochs: int = 10,
                 noise_range: typ.Optional[typ.Sequence[float]] = None,
                 noise_pct: float = 0.67, noise_std: float = 1.0,
                 noise_seed: int = 42):
        self.base_lr = base_lr
        self.epochs = epochs
        self.lb = lb
        self.ub = ub
        self.warmup_epochs = warmup_epochs
        self.warmup_lr = warmup_lr
        self.min_lr = min_lr
        self.cooldown_epochs = cooldown_epochs
        self._noise_helper = TimmCosineSchedule(
            base_lr, epochs, noise_range=noise_range, noise_pct=noise_pct,
            noise_std=noise_std, noise_seed=noise_seed)

    def scale(self, epoch: int) -> float:
        return self(epoch) / self.base_lr if self.base_lr > 0 else 0.0

    def __call__(self, epoch: int) -> float:
        if self.warmup_epochs > 0 and epoch < self.warmup_epochs:
            slope = (self.base_lr - self.warmup_lr) / self.warmup_epochs
            return self.warmup_lr + slope * epoch
        if epoch >= self.epochs:
            return self.min_lr
        tr = epoch / max(self.epochs, 1)
        lr = self.min_lr + 0.5 * (self.base_lr - self.min_lr) * (
            1.0 - math.tanh(self.lb + (self.ub - self.lb) * tr)
        )
        return lr * (1.0 + self._noise_helper._noise(epoch))


SUPPORTED_SCHEDULERS = ("cosine", "tanh", "step", "plateau")


def create_scheduler(sched: str, base_lr: float, epochs: int, *,
                     warmup_epochs: int = 5, warmup_lr: float = 1e-6,
                     min_lr: float = 1e-5, cooldown_epochs: int = 10,
                     decay_epochs: float = 30, decay_rate: float = 0.1,
                     patience_epochs: int = 10,
                     noise_range=None, noise_pct: float = 0.67,
                     noise_std: float = 1.0, noise_seed: int = 42):
    """timm ``create_scheduler`` parity for the CLI surface this framework
    honors (reference ``main.py:734``). Unsupported names raise instead of
    silently substituting an algorithm (PARITY 2.1)."""
    if sched == "cosine":
        return TimmCosineSchedule(
            base_lr, epochs, warmup_epochs=warmup_epochs, warmup_lr=warmup_lr,
            min_lr=min_lr, cooldown_epochs=cooldown_epochs,
            noise_range=noise_range, noise_pct=noise_pct, noise_std=noise_std,
            noise_seed=noise_seed)
    if sched == "tanh":
        return TimmTanhSchedule(
            base_lr, epochs, warmup_epochs=warmup_epochs, warmup_lr=warmup_lr,
            min_lr=min_lr, cooldown_epochs=cooldown_epochs,
            noise_range=noise_range, noise_pct=noise_pct, noise_std=noise_std,
            noise_seed=noise_seed)
    if sched == "step":
        return TimmStepSchedule(
            base_lr, epochs, decay_epochs=decay_epochs, decay_rate=decay_rate,
            warmup_epochs=warmup_epochs, warmup_lr=warmup_lr,
            noise_range=noise_range, noise_pct=noise_pct, noise_std=noise_std,
            noise_seed=noise_seed)
    if sched == "plateau":
        if noise_range:
            raise ValueError(
                "--lr-noise is not supported with --sched plateau (see "
                "TimmPlateauSchedule docstring)")
        return TimmPlateauSchedule(
            base_lr, epochs, decay_rate=decay_rate,
            patience_epochs=patience_epochs, warmup_epochs=warmup_epochs,
            warmup_lr=warmup_lr, min_lr=min_lr)
    raise ValueError(
        f"--sched {sched!r} is not implemented; supported: "
        f"{SUPPORTED_SCHEDULERS} (see PARITY.md 2.1 — this framework refuses "
        "to silently substitute a schedule)")


def scaled_lr(lr: float, batch_size: int, world_size: int,
              unscale_lr: bool) -> float:
    """Linear LR scaling: lr * global_batch / 512 (reference main.py:615-617)."""
    if unscale_lr:
        return lr
    return lr * batch_size * world_size / 512.0


SUPPORTED_OPTIMIZERS = ("adamw", "adam", "sgd", "nesterov", "momentum",
                        "lamb", "nadam", "radam", "adadelta", "rmsprop")


class _AdadeltaState(typ.NamedTuple):
    v: typ.Any      # E[g^2]
    u: typ.Any      # E[delta^2]


def _scale_by_adadelta(rho: float = 0.9, eps: float = 1e-6):
    """torch.optim.Adadelta semantics (what timm's 'adadelta' constructs):
    ``delta = g * sqrt(u + eps) / sqrt(v + eps)``; both accumulators decay at
    ``rho``. lr is applied downstream per group."""

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return _AdadeltaState(v=z, u=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        v = jax.tree.map(lambda a, g: rho * a + (1 - rho) * g * g,
                         state.v, grads)
        delta = jax.tree.map(
            lambda g, vv, uu: g * jnp.sqrt(uu + eps) / jnp.sqrt(vv + eps),
            grads, v, state.u)
        u = jax.tree.map(lambda a, d: rho * a + (1 - rho) * d * d,
                         state.u, delta)
        return delta, _AdadeltaState(v=v, u=u)

    return optax.GradientTransformation(init, update)


class _RMSpropState(typ.NamedTuple):
    v: typ.Any
    buf: typ.Any


def _scale_by_rmsprop(alpha: float = 0.9, eps: float = 1e-8,
                      momentum: float = 0.0):
    """torch.optim.RMSprop semantics; timm's factory constructs it with
    ``alpha=0.9`` (NOT torch's 0.99 default) and the CLI ``--momentum``.
    eps is OUTSIDE the sqrt; the momentum buffer accumulates the pre-lr
    direction (torch applies lr at the final ``p -= lr*buf``), so the
    downstream per-group lr application is exact even when lr changes."""

    def init(params):
        return _RMSpropState(v=jax.tree.map(jnp.zeros_like, params),
                             buf=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        v = jax.tree.map(lambda a, g: alpha * a + (1 - alpha) * g * g,
                         state.v, grads)
        d = jax.tree.map(lambda g, vv: g / (jnp.sqrt(vv) + eps), grads, v)
        if momentum > 0:
            buf = jax.tree.map(lambda b, dd: momentum * b + dd, state.buf, d)
            return buf, _RMSpropState(v=v, buf=buf)
        return d, _RMSpropState(v=v, buf=state.buf)

    return optax.GradientTransformation(init, update)


class _NadamState(typ.NamedTuple):
    count: jnp.ndarray
    mu_product: jnp.ndarray
    m: typ.Any
    v: typ.Any


def _scale_by_nadam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                    momentum_decay: float = 4e-3):
    """Nadam (Dozat 2016) with the Keras momentum schedule
    ``mu_t = b1*(1 - 0.5*0.96**(t*psi))``, ``psi=momentum_decay`` — the
    formula both timm's Nadam and torch.optim.NAdam implement
    (torch-parity tested). L2 weight decay goes on the gradient upstream."""

    def init(params):
        return _NadamState(
            count=jnp.zeros([], jnp.int32),
            mu_product=jnp.ones([], jnp.float32),
            m=jax.tree.map(jnp.zeros_like, params),
            v=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (tf * momentum_decay))
        mu_t1 = b1 * (1.0 - 0.5 * 0.96 ** ((tf + 1.0) * momentum_decay))
        mu_prod = state.mu_product * mu_t
        m = jax.tree.map(lambda a, g: b1 * a + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda a, g: b2 * a + (1 - b2) * g * g,
                         state.v, grads)
        bc2 = 1.0 - b2 ** tf

        def f(g, mm, vv):
            denom = jnp.sqrt(vv / bc2) + eps
            return ((1.0 - mu_t) / (1.0 - mu_prod) * g
                    + mu_t1 / (1.0 - mu_prod * mu_t1) * mm) / denom

        return (jax.tree.map(f, grads, m, v),
                _NadamState(count=t, mu_product=mu_prod, m=m, v=v))

    return optax.GradientTransformation(init, update)


class _RAdamState(typ.NamedTuple):
    count: jnp.ndarray
    m: typ.Any
    v: typ.Any


def _scale_by_radam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """RAdam (Liu et al. 2020): variance rectification when the SMA length
    ``rho_t > 5``, plain bias-corrected momentum otherwise. The branch depends
    only on the traced step count -> jnp.where, jit-stable. Weight decay is
    DECOUPLED downstream (timm's radam applies ``p -= lr*wd*p`` directly,
    i.e. torch.optim.RAdam(decoupled_weight_decay=True), the parity target)."""

    rho_inf = 2.0 / (1.0 - b2) - 1.0

    def init(params):
        return _RAdamState(count=jnp.zeros([], jnp.int32),
                           m=jax.tree.map(jnp.zeros_like, params),
                           v=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(jnp.float32)
        m = jax.tree.map(lambda a, g: b1 * a + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda a, g: b2 * a + (1 - b2) * g * g,
                         state.v, grads)
        bc1 = 1.0 - b1 ** tf
        bc2 = 1.0 - b2 ** tf
        rho_t = rho_inf - 2.0 * tf * (b2 ** tf) / bc2
        # clamp: for rho_t <= 5 the numerator can go negative; the sqrt's NaN
        # would be discarded by the where below, but keep the value finite
        rect = jnp.sqrt(jnp.maximum((rho_t - 4.0) * (rho_t - 2.0) * rho_inf,
                                    0.0)
                        / jnp.maximum((rho_inf - 4.0) * (rho_inf - 2.0)
                                      * rho_t, 1e-12))
        use_rect = rho_t > 5.0

        def f(mm, vv):
            mhat = mm / bc1
            adapted = rect * mhat / (jnp.sqrt(vv / bc2) + eps)
            return jnp.where(use_rect, adapted, mhat)

        return jax.tree.map(f, m, v), _RAdamState(count=t, m=m, v=v)

    return optax.GradientTransformation(init, update)


def _lamb_global_grad_rescale(max_grad_norm: float):
    """timm Lamb's pre-step: divide EVERY grad by
    ``max(1, global_grad_norm / max_grad_norm)`` (timm optim/lamb.py, ported
    from NVIDIA FusedLAMB; default ``max_grad_norm=1.0``). Unlike
    ``optax.clip_by_global_norm`` this always *divides* rather than clipping
    only when over the threshold — the formulas coincide, both scale by
    ``min(1, max_norm/gnorm)``."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        gnorm = optax.global_norm(updates)
        denom = jnp.maximum(1.0, gnorm / max_grad_norm)
        return jax.tree.map(lambda g: g / denom, updates), state

    return optax.GradientTransformation(init, update)


def _scale_by_trust_ratio_masked(mask_fn):
    """timm Lamb layer adaptation: ``trust_ratio = ||p|| / ||update||`` when
    both norms are positive, else 1 — applied ONLY to params whose group has
    weight decay (timm lamb.py: ``if group['weight_decay'] != 0 or
    always_adapt``; the factory routes no-decay params into a wd=0 group, so
    they update with trust_ratio 1)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params):
        mask = mask_fn(params)

        def f(u, p, m):
            pn = jnp.linalg.norm(p)
            un = jnp.linalg.norm(u)
            tr = jnp.where(pn > 0.0, jnp.where(un > 0.0, pn / un, 1.0), 1.0)
            return u * jnp.where(m, tr, 1.0)

        return jax.tree.map(f, updates, params, mask), state

    return optax.GradientTransformation(init, update)


def make_optimizer(params, *, opt: str = "adamw", weight_decay: float = 0.05,
                   betas: typ.Tuple[float, float] = (0.9, 0.999),
                   eps: float = 1e-8, momentum: float = 0.9,
                   clip_grad: typ.Optional[float] = None,
                   trainable_mask=None):
    """Optimizer core transforms; LR is applied separately per group in
    ``apply_updates_two_group`` so it can change per epoch without re-init.

    ``opt`` mirrors the timm names the reference CLI exposes
    (``main.py:729-731`` via ``create_optimizer_v2``):

    - ``adamw`` — decoupled weight decay (default, the reference recipe).
    - ``adam`` — torch Adam: weight decay is L2 added to the gradient
      *before* the moment update.
    - ``sgd`` / ``nesterov`` — torch SGD with Nesterov momentum (timm maps
      plain ``sgd`` to nesterov=True); L2 weight decay on the gradient.
    - ``momentum`` — SGD with heavy-ball (non-Nesterov) momentum.
    - ``lamb`` — timm Lamb (FusedLAMB port): global grad-norm pre-division
      (max_grad_norm=1), Adam moments, decoupled weight decay, per-param
      trust ratio on decayed params only (torch-parity tested in
      tests/test_optim_extras.py).
    - ``nadam`` — Nadam with the Keras momentum schedule (psi=4e-3), the
      formula timm's Nadam and torch.optim.NAdam share; L2 wd on the grad.
    - ``radam`` — rectified Adam; DECOUPLED weight decay (timm radam applies
      ``p -= lr*wd*p``; parity target torch RAdam(decoupled_weight_decay=True)).
    - ``adadelta`` — torch Adadelta (rho 0.9, eps 1e-6); L2 wd on the grad.
    - ``rmsprop`` — torch RMSprop as timm constructs it: alpha=0.9 (not
      torch's 0.99 default), CLI momentum; L2 wd on the grad.

    Any other name raises — this framework refuses to silently substitute an
    algorithm (PARITY 2.1). In all cases timm's no-decay filtering applies
    (``wd_mask``).

    Returns (init_fn, update_fn) where update_fn(grads, state, params,
    lr_base, lr_gate) -> (updates, new_state); updates already include sign.

    When ``opt='adamw'`` and neither grad clipping nor a trainable mask is
    requested, update_fn also carries a ``fused_apply`` attribute — a
    single-pass Pallas AdamW(+EMA) update (see ``ops/fused_adamw.py``) with
    identical math that the train step prefers; the optax state layout is
    unchanged, so checkpoints are interchangeable between the two paths.
    """
    if opt not in SUPPORTED_OPTIMIZERS:
        raise ValueError(
            f"--opt {opt!r} is not implemented; supported: "
            f"{SUPPORTED_OPTIMIZERS} (see PARITY.md 2.1)")
    chain = []
    if clip_grad is not None and clip_grad > 0:
        chain.append(optax.clip_by_global_norm(clip_grad))
    if opt == "adamw":
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
    elif opt == "lamb":
        # timm Lamb order: global grad rescale -> Adam moments (eps outside
        # the sqrt, same as scale_by_adam) -> +wd*p -> trust ratio on the
        # decayed params. optax.lamb differs on the first and last points
        # (no global rescale; unconditional trust ratio), so build it here.
        chain.append(_lamb_global_grad_rescale(1.0))
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
        chain.append(_scale_by_trust_ratio_masked(
            wd_mask if weight_decay else
            (lambda params: jax.tree.map(lambda _: False, params))))
    elif opt == "radam":
        # decoupled weight decay (timm radam: p -= lr*wd*p), like adamw
        chain.append(_scale_by_radam(b1=betas[0], b2=betas[1], eps=eps))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
    elif opt in ("adam", "nadam", "adadelta", "rmsprop"):
        # torch semantics: L2 on the gradient BEFORE the moment update
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
        if opt == "adam":
            chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                             eps=eps))
        elif opt == "nadam":
            chain.append(_scale_by_nadam(b1=betas[0], b2=betas[1], eps=eps))
        elif opt == "adadelta":
            chain.append(_scale_by_adadelta(eps=1e-6))
        else:  # rmsprop — timm constructs torch RMSprop with alpha=0.9
            chain.append(_scale_by_rmsprop(alpha=0.9, eps=eps,
                                           momentum=momentum))
    else:  # sgd / nesterov / momentum — torch SGD semantics
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
        if momentum:
            chain.append(optax.trace(decay=momentum,
                                     nesterov=opt in ("sgd", "nesterov")))
    tx = optax.chain(*chain)

    gmask = gate_mask(params)
    tmask = trainable_mask(params) if trainable_mask is not None else None

    def update(grads, state, params, lr_base, lr_gate):
        if tmask is not None:
            grads = jax.tree.map(
                lambda g, t: jnp.where(t, g, 0.0), grads, tmask)
        updates, state = tx.update(grads, state, params)
        updates = jax.tree.map(
            lambda u, g: -jnp.where(g, lr_gate, lr_base) * u, updates, gmask
        )
        if tmask is not None:
            updates = jax.tree.map(
                lambda u, t: jnp.where(t, u, 0.0), updates, tmask)
        return updates, state

    if (opt == "adamw" and (clip_grad is None or clip_grad <= 0)
            and trainable_mask is None):
        from .ops.fused_adamw import fused_adamw_ema

        wdm = wd_mask(params)
        adam_index = 0  # position of ScaleByAdamState in the chain state

        def fused_apply(params, grads, opt_state, ema, lr_base, lr_gate,
                        ema_decay):
            adam = opt_state[adam_index]
            new_p, mu, nu, new_ema, t = fused_adamw_ema(
                params, grads, adam.mu, adam.nu, ema, adam.count,
                lr_base, lr_gate, wdm, gmask,
                b1=betas[0], b2=betas[1], eps=eps,
                weight_decay=weight_decay, ema_decay=ema_decay)
            new_adam = adam._replace(count=t, mu=mu, nu=nu)
            new_state = (opt_state[:adam_index] + (new_adam,)
                         + opt_state[adam_index + 1:])
            return new_p, new_state, new_ema

        update.fused_apply = fused_apply

    return tx.init, update
