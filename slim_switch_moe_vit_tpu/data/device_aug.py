"""Fused on-device image augmentation (batched, jitted, runs on TPU).

The reference's photometric pipeline is host-side PIL/timm per sample
(``datasets.py:290-308`` → timm ``transforms_imagenet_train``: hflip →
RandAugment ``rand-m9-mstd0.5-inc1`` → normalize → RandomErasing; and the
DeiT-III ``3-Augment`` in ``augment.py:94-131``). TPU-first redesign: the host
ships uint8 crops; everything photometric runs here as one jitted batch
function — the VPU does per-pixel math orders of magnitude faster than PIL and
it overlaps with the train step.

Implemented RandAugment ops (timm 'rand' policy, increasing variants, 15 ops):
AutoContrast, Equalize, Invert, Rotate, Posterize, Solarize, SolarizeAdd,
Color, Contrast, Brightness, Sharpness, ShearX, ShearY, TranslateXRel,
TranslateYRel. Each sample draws ``num_layers=2`` ops; each applies with prob
0.5 at magnitude ~N(m, mstd) clipped to [0, 10] (timm semantics). Geometry uses
bilinear resampling with grey (128) fill, matching timm defaults.

RandomErasing: timm 'pixel' mode — box of area U(0.02, 1/3), log-aspect
U(0.3, 3.3), filled with unit gaussian noise in *normalized* space, applied
with prob ``reprob`` after normalize (timm order).
"""
from __future__ import annotations

import math
import typing as typ
from functools import partial

import jax
import jax.numpy as jnp

from .datasets import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

FILL = 128.0
_LEVEL_DENOM = 10.0


# ---------------------------------------------------------------------------
# Geometry: single image (H, W, 3) float32 in [0, 255]; inverse-affine sampling.
# ---------------------------------------------------------------------------

def _affine(img, mat):
    """Apply inverse affine ``mat`` (2x3): in_coord = mat @ (x_out, y_out, 1).
    Bilinear, constant grey fill (timm fillcolor=(128,)*3)."""
    H, W = img.shape[0], img.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    x_in = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2]
    y_in = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2]
    coords = jnp.stack([y_in, x_in])

    def sample(channel):
        return jax.scipy.ndimage.map_coordinates(
            channel, [coords[0], coords[1]], order=1, mode="constant",
            cval=FILL)

    return jnp.stack([sample(img[..., c]) for c in range(3)], axis=-1)


def _center_mat(H, W, a, b, c, d, e, f):
    """PIL-style affine about the image center."""
    cx, cy = (W - 1) * 0.5, (H - 1) * 0.5
    # translate center to origin, apply, translate back
    c2 = c + cx - (a * cx + b * cy)
    f2 = f + cy - (d * cx + e * cy)
    return jnp.array([[a, b, c2], [d, e, f2]], jnp.float32)


def _rotate(img, mag):
    deg = mag / _LEVEL_DENOM * 30.0
    rad = deg * math.pi / 180.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    H, W = img.shape[0], img.shape[1]
    return _affine(img, _center_mat(H, W, cos, sin, 0.0, -sin, cos, 0.0))


def _shear_x(img, mag):
    s = mag / _LEVEL_DENOM * 0.3
    H, W = img.shape[0], img.shape[1]
    return _affine(img, _center_mat(H, W, 1.0, s, 0.0, 0.0, 1.0, 0.0))


def _shear_y(img, mag):
    s = mag / _LEVEL_DENOM * 0.3
    H, W = img.shape[0], img.shape[1]
    return _affine(img, _center_mat(H, W, 1.0, 0.0, 0.0, s, 1.0, 0.0))


def _translate_x(img, mag):
    W = img.shape[1]
    t = mag / _LEVEL_DENOM * 0.45 * W
    H = img.shape[0]
    return _affine(img, jnp.array([[1.0, 0.0, t], [0.0, 1.0, 0.0]], jnp.float32))


def _translate_y(img, mag):
    H = img.shape[0]
    t = mag / _LEVEL_DENOM * 0.45 * H
    return _affine(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, t]], jnp.float32))


# ---------------------------------------------------------------------------
# Photometric ops
# ---------------------------------------------------------------------------

def _grayscale(img):
    # PIL L-mode weights
    g = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return jnp.broadcast_to(g[..., None], img.shape)


def _blend(a, b, factor):
    return a + factor * (b - a)


def _autocontrast(img, mag):
    def per_channel(ch):
        lo = jnp.min(ch)
        hi = jnp.max(ch)
        scale = jnp.where(hi > lo, 255.0 / (hi - lo), 1.0)
        off = jnp.where(hi > lo, -lo * scale, 0.0)
        return jnp.clip(ch * scale + off, 0.0, 255.0)

    return jnp.stack([per_channel(img[..., c]) for c in range(3)], axis=-1)


def _equalize(img, mag):
    def per_channel(ch):
        ints = jnp.clip(ch, 0, 255).astype(jnp.int32).reshape(-1)
        hist = jnp.zeros((256,), jnp.int32).at[ints].add(1)
        step = (jnp.sum(hist) - hist[255]) // 255
        csum = jnp.cumsum(hist) - hist  # exclusive
        lut = jnp.where(step > 0, (csum + step // 2) // jnp.maximum(step, 1), 0)
        lut = jnp.clip(lut, 0, 255).astype(jnp.float32)
        out = lut[ints].reshape(ch.shape)
        return jnp.where(step > 0, out, ch)

    return jnp.stack([per_channel(img[..., c]) for c in range(3)], axis=-1)


def _invert(img, mag):
    return 255.0 - img


def _posterize(img, mag):
    # PosterizeIncreasing: bits = 4 - round(4*m/10); more magnitude = coarser
    bits = 4 - jnp.round(mag / _LEVEL_DENOM * 4.0)
    bits = jnp.clip(bits, 0, 8)
    step = jnp.exp2(8.0 - bits)
    out = jnp.floor(img / step) * step
    return jnp.where(bits >= 8, img, out)


def _solarize(img, mag):
    # SolarizeIncreasing: thresh = 256 - round(256*m/10)
    thresh = 256.0 - jnp.round(mag / _LEVEL_DENOM * 256.0)
    return jnp.where(img >= thresh, 255.0 - img, img)


def _solarize_add(img, mag):
    add = jnp.round(mag / _LEVEL_DENOM * 110.0)
    return jnp.where(img < 128.0, jnp.clip(img + add, 0, 255), img)


def _enhance_factor(mag):
    # *Increasing variants: factor = 1 + m/10*0.9 with random sign folded into mag
    return 1.0 + mag / _LEVEL_DENOM * 0.9


def _color(img, mag):
    return jnp.clip(_blend(_grayscale(img), img, _enhance_factor(mag)), 0, 255)


def _contrast(img, mag):
    # PIL Contrast degenerate: mean of grayscale image
    mean = jnp.mean(_grayscale(img)[..., 0])
    return jnp.clip(_blend(jnp.full_like(img, mean), img, _enhance_factor(mag)),
                    0, 255)


def _brightness(img, mag):
    return jnp.clip(img * _enhance_factor(mag), 0, 255)


_SMOOTH_KERNEL = jnp.array(
    [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], jnp.float32) / 13.0


def _sharpness(img, mag):
    # PIL Sharpness degenerate: 3x3 smoothing, borders keep original
    x = img.transpose(2, 0, 1)[:, None]  # (3,1,H,W)
    k = _SMOOTH_KERNEL[None, None]
    smooth = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME")[:, 0]
    smooth = smooth.transpose(1, 2, 0)
    # keep borders
    H, W = img.shape[0], img.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = (ys == 0) | (ys == H - 1) | (xs == 0) | (xs == W - 1)
    smooth = jnp.where(border[..., None], img, smooth)
    return jnp.clip(_blend(smooth, img, _enhance_factor(mag)), 0, 255)


# Signed-magnitude ops negate magnitude with prob 0.5 (timm randomly_negate).
_RA_OPS: typ.List[typ.Tuple[typ.Callable, bool]] = [
    (_autocontrast, False), (_equalize, False), (_invert, False),
    (_rotate, True), (_posterize, False), (_solarize, False),
    (_solarize_add, False), (_color, True), (_contrast, True),
    (_brightness, True), (_sharpness, True), (_shear_x, True),
    (_shear_y, True), (_translate_x, True), (_translate_y, True),
]


def _randaugment_single(rng, img, magnitude: float, mstd: float,
                        num_layers: int):
    """Apply RandAugment to one (H, W, 3) image in [0, 255]."""
    branches = [lambda a, f=fn: f(a[0], a[1]) for fn, _ in _RA_OPS]
    signed = jnp.array([s for _, s in _RA_OPS])

    def layer(i, img):
        k = jax.random.fold_in(rng, i)
        k_op, k_apply, k_mag, k_sign = jax.random.split(k, 4)
        op = jax.random.randint(k_op, (), 0, len(_RA_OPS))
        mag = magnitude + mstd * jax.random.normal(k_mag)
        mag = jnp.clip(mag, 0.0, _LEVEL_DENOM)
        neg = signed[op] & (jax.random.uniform(k_sign) < 0.5)
        mag = jnp.where(neg, -mag, mag)
        out = jax.lax.switch(op, branches, (img, mag))
        return jnp.where(jax.random.uniform(k_apply) < 0.5, out, img)

    return jax.lax.fori_loop(0, num_layers, layer, img,
                             unroll=True)


# ---------------------------------------------------------------------------
# 3-Augment (DeiT-III, reference augment.py:94-131)
# ---------------------------------------------------------------------------

def _gaussian_blur(rng, img):
    sigma = jax.random.uniform(rng, (), minval=0.1, maxval=2.0)
    r = 4  # static 9x9 kernel covers sigma<=2
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k1 = jnp.exp(-(xs ** 2) / (2 * sigma ** 2))
    k1 = k1 / jnp.sum(k1)
    x = img.transpose(2, 0, 1)[:, None]
    kh = k1[None, None, :, None] * jnp.ones((1, 1, 1, 1))
    x = jax.lax.conv_general_dilated(x, k1[None, None, None, :], (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, k1[None, None, :, None], (1, 1), "SAME")
    return x[:, 0].transpose(1, 2, 0)


def _color_jitter(rng, img, strength: float):
    kb, kc, ks = jax.random.split(rng, 3)
    b = jax.random.uniform(kb, (), minval=1 - strength, maxval=1 + strength)
    c = jax.random.uniform(kc, (), minval=1 - strength, maxval=1 + strength)
    s = jax.random.uniform(ks, (), minval=1 - strength, maxval=1 + strength)
    img = jnp.clip(img * b, 0, 255)
    mean = jnp.mean(_grayscale(img)[..., 0])
    img = jnp.clip(_blend(jnp.full_like(img, mean), img, c), 0, 255)
    img = jnp.clip(_blend(_grayscale(img), img, s), 0, 255)
    return img


def _three_augment_single(rng, img, color_jitter: float):
    k_choice, k_op, k_cj = jax.random.split(rng, 3)
    choice = jax.random.randint(k_choice, (), 0, 3)
    img = jax.lax.switch(
        choice,
        [lambda a: _grayscale(a),
         lambda a: jnp.where(a >= 128.0, 255.0 - a, a),  # solarize(thr 128)
         lambda a: _gaussian_blur(k_op, a)],
        img,
    )
    if color_jitter:
        img = _color_jitter(k_cj, img, color_jitter)
    return img


# ---------------------------------------------------------------------------
# Random erasing (timm RandomErasing, 'pixel' mode) — in normalized space
# ---------------------------------------------------------------------------

def _random_erase_single(rng, img, prob: float, count: int):
    H, W, C = img.shape

    def one(i, img):
        k = jax.random.fold_in(rng, i)
        ka, kr, ky, kx, kn, kp = jax.random.split(k, 6)
        do = jax.random.uniform(kp) < prob
        area = H * W
        target = jax.random.uniform(ka, (), minval=0.02, maxval=1 / 3) * area / count
        log_r = jax.random.uniform(kr, (), minval=math.log(0.3),
                                   maxval=math.log(1 / 0.3))
        aspect = jnp.exp(log_r)
        h = jnp.sqrt(target * aspect).astype(jnp.int32)
        w = jnp.sqrt(target / aspect).astype(jnp.int32)
        h = jnp.clip(h, 1, H - 1)
        w = jnp.clip(w, 1, W - 1)
        top = jax.random.randint(ky, (), 0, H)
        left = jax.random.randint(kx, (), 0, W)
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        box = (ys >= top) & (ys < top + h) & (xs >= left) & (xs < left + w)
        noise = jax.random.normal(kn, img.shape, img.dtype)
        return jnp.where(do & box[..., None], noise, img)

    return jax.lax.fori_loop(0, count, one, img, unroll=True)


# ---------------------------------------------------------------------------
# Full pipelines
# ---------------------------------------------------------------------------

def build_device_augment(*, input_size: int, aa: typ.Optional[str] = "rand-m9-mstd0.5-inc1",
                         hflip: float = 0.5, color_jitter: float = 0.3,
                         reprob: float = 0.25, recount: int = 1,
                         three_augment: bool = False,
                         mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD):
    """Returns jit-safe fn(rng, uint8 images NHWC) -> normalized float32 NHWC.

    Pipeline (timm order): hflip → RandAugment (or 3-Augment / color-jitter) →
    normalize → RandomErasing.
    """
    magnitude, mstd, num_layers = 9.0, 0.5, 2
    if aa:
        # parse 'rand-m{M}-mstd{S}[-inc1]'
        for tok in aa.split("-")[1:]:
            if tok.startswith("mstd"):
                mstd = float(tok[4:])
            elif tok.startswith("m"):
                magnitude = float(tok[1:])
    # numpy (not jnp) constants: device-resident closure constants force a
    # device->host fetch during MLIR lowering, which stalls behind the TPU
    # tunnel; numpy constants embed directly.
    import numpy as np

    mean_a = np.asarray(mean, np.float32) * 255.0
    std_a = np.asarray(std, np.float32) * 255.0

    def augment(rng, images):
        images = images.astype(jnp.float32)
        B = images.shape[0]
        k_flip, k_aa, k_re = jax.random.split(rng, 3)

        # hflip per sample
        flip = jax.random.bernoulli(k_flip, hflip, (B,))
        images = jnp.where(flip[:, None, None, None], images[:, :, ::-1], images)

        if three_augment:
            keys = jax.random.split(k_aa, B)
            images = jax.vmap(
                lambda k, im: _three_augment_single(k, im, color_jitter)
            )(keys, images)
        elif aa:
            keys = jax.random.split(k_aa, B)
            images = jax.vmap(
                lambda k, im: _randaugment_single(k, im, magnitude, mstd,
                                                  num_layers)
            )(keys, images)
        elif color_jitter:
            keys = jax.random.split(k_aa, B)
            images = jax.vmap(
                lambda k, im: _color_jitter(k, im, color_jitter)
            )(keys, images)

        images = (images - mean_a) / std_a

        if reprob > 0:
            keys = jax.random.split(k_re, B)
            images = jax.vmap(
                lambda k, im: _random_erase_single(k, im, reprob, recount)
            )(keys, images)
        return images

    return augment


def build_eval_normalize(mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD,
                         dtype=None):
    # numpy (not jnp) constants: device-resident closure constants force a
    # device->host fetch during MLIR lowering, which stalls behind the TPU
    # tunnel; numpy constants embed directly.
    import numpy as np

    mean_a = np.asarray(mean, np.float32) * 255.0
    std_a = np.asarray(std, np.float32) * 255.0

    def normalize(images):
        y = (images.astype(jnp.float32) - mean_a) / std_a
        if dtype is not None:
            # emit the model's compute dtype so XLA fuses subtract+divide+
            # convert into ONE pass over the (B, 224, 224, 3) batch — as two
            # passes the f32 intermediate costs ~0.5 ms/forward at b256
            # (scripts/profile_eval.py; the model casts right after anyway)
            y = y.astype(dtype)
        return y

    return normalize
