"""On-device Mixup/CutMix as a jitted batch transform.

Rebuild of timm's ``Mixup`` as used by the reference (``main.py:505-517``,
applied per batch on device at ``engine.py:46-47``). TPU-first: this runs
*inside* the jitted train step from an explicit PRNG key — no host RNG, no
recompile (all randomness is traced).

Semantics (timm 'batch' mode, the reference default ``--mixup-mode batch``):
- with prob ``prob``: pick cutmix vs mixup by ``switch_prob``; lam ~ Beta(a, a)
- mixup: x = lam*x + (1-lam)*reverse(x)
- cutmix: paste the reversed batch's random bbox of area ratio (1-lam); lam is
  corrected to the clipped box's true area ratio (timm ``rand_bbox``)
- targets: one-hot with label smoothing folded in
  (y = onehot(y1)*lam + onehot(y2)*(1-lam)); smoothing on/off values as timm.
"""
from __future__ import annotations

import typing as typ
from functools import partial

import jax
import jax.numpy as jnp


def one_hot_smooth(labels, num_classes: int, smoothing: float = 0.0):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32) * (on - off) + off


def _beta(rng, alpha: float):
    """Beta(alpha, alpha) via two gammas."""
    a = jnp.float32(alpha)
    g1 = jax.random.gamma(rng, a)
    g2 = jax.random.gamma(jax.random.fold_in(rng, 1), a)
    return g1 / (g1 + g2)


def _rand_bbox(rng, H: int, W: int, lam):
    """timm rand_bbox: cut box of area ratio (1-lam) centered uniformly,
    clipped to the image; returns (y0, y1, x0, x1, corrected_lam)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (H * ratio).astype(jnp.int32)
    cut_w = (W * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, H)
    cx = jax.random.randint(kx, (), 0, W)
    y0 = jnp.clip(cy - cut_h // 2, 0, H)
    y1 = jnp.clip(cy + cut_h // 2, 0, H)
    x0 = jnp.clip(cx - cut_w // 2, 0, W)
    x1 = jnp.clip(cx + cut_w // 2, 0, W)
    box_area = (y1 - y0) * (x1 - x0)
    lam_corr = 1.0 - box_area.astype(jnp.float32) / float(H * W)
    return y0, y1, x0, x1, lam_corr


def _rand_bbox_minmax(rng, H: int, W: int, minmax):
    """timm rand_bbox_minmax (cutmix_minmax mode): box height/width sampled
    independently as a ratio in [minmax[0], minmax[1]] of each side; lam is
    the true kept-area ratio."""
    kh, kw, ky, kx = jax.random.split(rng, 4)
    cut_h = jax.random.randint(kh, (), int(minmax[0] * H),
                               max(int(minmax[1] * H), int(minmax[0] * H) + 1))
    cut_w = jax.random.randint(kw, (), int(minmax[0] * W),
                               max(int(minmax[1] * W), int(minmax[0] * W) + 1))
    y0 = jax.random.randint(ky, (), 0, H - cut_h + 1)
    x0 = jax.random.randint(kx, (), 0, W - cut_w + 1)
    lam = 1.0 - (cut_h * cut_w).astype(jnp.float32) / float(H * W)
    return y0, y0 + cut_h, x0, x0 + cut_w, lam


def make_mixup_fn(*, mixup_alpha: float = 0.8, cutmix_alpha: float = 1.0,
                  cutmix_minmax: typ.Optional[typ.Sequence[float]] = None,
                  prob: float = 1.0, switch_prob: float = 0.5,
                  label_smoothing: float = 0.1, num_classes: int = 1000
                  ) -> typ.Callable:
    """Returns fn(rng, images(B,H,W,C), int_labels(B)) -> (images, soft_targets).

    ``cutmix_minmax`` overrides cutmix_alpha and enables cutmix with
    min/max box-ratio sampling (timm semantics, reference main.py:293-298)."""
    use_mixup = mixup_alpha > 0.0
    use_cutmix = cutmix_alpha > 0.0 or cutmix_minmax is not None

    def apply(rng, x, labels):
        B, H, W, C = x.shape
        k_apply, k_switch, k_lam, k_box = jax.random.split(rng, 4)
        do_apply = jax.random.uniform(k_apply) < prob
        if use_mixup and use_cutmix:
            do_cutmix = jax.random.uniform(k_switch) < switch_prob
        else:
            do_cutmix = jnp.asarray(use_cutmix)
        alpha_m = mixup_alpha if use_mixup else 1.0
        alpha_c = cutmix_alpha if use_cutmix else 1.0
        lam_m = _beta(k_lam, alpha_m)
        lam_c = _beta(jax.random.fold_in(k_lam, 7), alpha_c)

        x_rev = x[::-1]

        # mixup branch
        x_mix = lam_m.astype(x.dtype) * x + (1.0 - lam_m).astype(x.dtype) * x_rev

        # cutmix branch (static-shape mask via iota comparison)
        if cutmix_minmax is not None:
            y0, y1, x0, x1, lam_c_corr = _rand_bbox_minmax(
                k_box, H, W, cutmix_minmax)
        else:
            y0, y1, x0, x1, lam_c_corr = _rand_bbox(k_box, H, W, lam_c)
        row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        in_box = ((row >= y0) & (row < y1) & (col >= x0) & (col < x1))
        x_cut = jnp.where(in_box[None, :, :, None], x_rev, x)

        lam = jnp.where(do_cutmix, lam_c_corr, lam_m)
        x_aug = jnp.where(do_cutmix, x_cut, x_mix)

        lam = jnp.where(do_apply, lam, 1.0)
        x_out = jnp.where(do_apply, x_aug, x)

        y1h = one_hot_smooth(labels, num_classes, label_smoothing)
        y2h = y1h[::-1]
        targets = y1h * lam + y2h * (1.0 - lam)
        return x_out, targets

    return apply


def mixup_active(mixup: float, cutmix: float,
                 cutmix_minmax: typ.Optional[typ.Sequence[float]]) -> bool:
    """reference main.py:506."""
    return mixup > 0.0 or cutmix > 0.0 or cutmix_minmax is not None
