"""RegNetY — the reference's default distillation teacher
(``--teacher-model regnety_160``, reference ``main.py:320-326,666-684``).

Standard pycls/timm RegNetY: stem conv → 4 stages of bottleneck blocks with
3x3 group conv + squeeze-excitation → global pool head. Stage widths/depths
derive from the (w0, wa, wm, depth) quantized-linear parameterization.

The teacher is used frozen (the reference loads a trained checkpoint and runs
it under no_grad, ``main.py:676-684``; losses.py:50-51), so BatchNorm runs on
imported running statistics. ``import_torch_regnet`` maps a timm
``regnety_160`` state dict onto this param tree.
"""
from __future__ import annotations

import typing as typ

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .registry import register_model

Dtype = typ.Any


def generate_regnet_widths(wa: float, w0: int, wm: float, depth: int,
                           q: int = 8):
    """pycls generate_regnet: per-stage (widths, depths)."""
    widths_cont = w0 + wa * np.arange(depth)
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = (np.round(widths / q) * q).astype(int)
    stage_widths, stage_depths = np.unique(widths, return_counts=True)
    order = np.argsort(stage_widths)
    return stage_widths[order].tolist(), stage_depths[order].tolist()


def adjust_widths_groups(widths, groups):
    """Make widths divisible by their group width (pycls adjust_ws_gs_comp)."""
    gs = [min(g, w) for g, w in zip(groups, widths)]
    ws = [int(round(w / g) * g) for w, g in zip(widths, gs)]
    return ws, gs


class _ConvBN(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.kernel // 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return x


class _SE(nn.Module):
    rd_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                    name="fc2")(s)
        return x * nn.sigmoid(s)


class _Bottleneck(nn.Module):
    w_out: int
    stride: int
    group_width: int
    se_ratio: float
    w_in: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_b = self.w_out  # bottleneck ratio 1.0
        groups = w_b // self.group_width
        shortcut = x
        y = nn.relu(_ConvBN(w_b, 1, dtype=self.dtype, name="conv1")(x, train))
        y = nn.relu(_ConvBN(w_b, 3, self.stride, groups, dtype=self.dtype,
                            name="conv2")(y, train))
        if self.se_ratio > 0:
            rd = int(round(self.w_in * self.se_ratio))
            y = _SE(rd, dtype=self.dtype, name="se")(y)
        y = _ConvBN(self.w_out, 1, dtype=self.dtype, name="conv3")(y, train)
        if self.stride != 1 or self.w_in != self.w_out:
            shortcut = _ConvBN(self.w_out, 1, self.stride, dtype=self.dtype,
                               name="downsample")(x, train)
        return nn.relu(y + shortcut)


class RegNet(nn.Module):
    stage_widths: typ.Sequence[int]
    stage_depths: typ.Sequence[int]
    group_width: int
    se_ratio: float = 0.25
    stem_width: int = 32
    num_classes: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        x = nn.relu(_ConvBN(self.stem_width, 3, 2, dtype=self.dtype,
                            name="stem")(x, train))
        w_in = self.stem_width
        for si, (w, d) in enumerate(zip(self.stage_widths,
                                        self.stage_depths)):
            for bi in range(d):
                x = _Bottleneck(
                    w_out=w, stride=2 if bi == 0 else 1,
                    group_width=self.group_width, se_ratio=self.se_ratio,
                    w_in=w_in, dtype=self.dtype,
                    name=f"s{si + 1}_b{bi + 1}")(x, train)
                w_in = w
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=jnp.float32, name="head_fc")(
                x.astype(jnp.float32))
        return x


def _regnety(wa, w0, wm, depth, group_width, **kwargs):
    widths, depths = generate_regnet_widths(wa, w0, wm, depth)
    widths, groups = adjust_widths_groups(widths,
                                          [group_width] * len(widths))
    return RegNet(stage_widths=widths, stage_depths=depths,
                  group_width=min(groups), se_ratio=0.25,
                  num_classes=kwargs.get("num_classes", 1000),
                  dtype=kwargs.get("dtype", jnp.float32))


@register_model
def regnety_160(pretrained=False, **kwargs):
    """RegNetY-16GF (timm regnety_160): w0=200, wa=106.23, wm=2.48, d=18,
    group=112."""
    kwargs.pop("img_size", None)
    return _regnety(106.23, 200, 2.48, 18, 112, **kwargs)


@register_model
def regnety_040(pretrained=False, **kwargs):
    kwargs.pop("img_size", None)
    return _regnety(31.41, 96, 2.24, 22, 64, **kwargs)


# ---------------------------------------------------------------------------
# torch (timm) checkpoint import
# ---------------------------------------------------------------------------

def import_torch_regnet(path_or_dict, model: RegNet, variables: dict) -> dict:
    """Map a timm regnety state dict onto {params, batch_stats}."""
    import os

    if isinstance(path_or_dict, (str, os.PathLike)):
        import torch

        ckpt = torch.load(path_or_dict, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in path_or_dict.items()}

    params = {k: v for k, v in variables["params"].items()}
    stats = {k: v for k, v in variables["batch_stats"].items()}

    def conv(dst_p, src):  # torch OIHW -> flax HWIO (group conv: O, I/g, H, W)
        w = sd[src]
        return jnp.asarray(w.transpose(2, 3, 1, 0))

    new_params: dict = {}
    new_stats: dict = {}
    # stem
    new_params["stem"] = {}
    new_params["stem"]["conv"] = {"kernel": conv(None, "stem.conv.weight")}
    new_params["stem"]["bn"] = {
        "scale": jnp.asarray(sd["stem.bn.weight"]),
        "bias": jnp.asarray(sd["stem.bn.bias"]),
    }
    new_stats["stem"] = {"bn": {
        "mean": jnp.asarray(sd["stem.bn.running_mean"]),
        "var": jnp.asarray(sd["stem.bn.running_var"]),
    }}

    for si, d in enumerate(model.stage_depths):
        for bi in range(d):
            name = f"s{si + 1}_b{bi + 1}"
            tsrc = f"s{si + 1}.b{bi + 1}"
            blk: dict = {}
            stt: dict = {}
            for cn in ("conv1", "conv2", "conv3"):
                blk[cn] = {
                    "conv": {"kernel": conv(None, f"{tsrc}.{cn}.conv.weight")},
                    "bn": {
                        "scale": jnp.asarray(sd[f"{tsrc}.{cn}.bn.weight"]),
                        "bias": jnp.asarray(sd[f"{tsrc}.{cn}.bn.bias"]),
                    },
                }
                stt[cn] = {"bn": {
                    "mean": jnp.asarray(sd[f"{tsrc}.{cn}.bn.running_mean"]),
                    "var": jnp.asarray(sd[f"{tsrc}.{cn}.bn.running_var"]),
                }}
            if f"{tsrc}.se.fc1.weight" in sd:
                blk["se"] = {
                    "fc1": {
                        "kernel": conv(None, f"{tsrc}.se.fc1.weight"),
                        "bias": jnp.asarray(sd[f"{tsrc}.se.fc1.bias"]),
                    },
                    "fc2": {
                        "kernel": conv(None, f"{tsrc}.se.fc2.weight"),
                        "bias": jnp.asarray(sd[f"{tsrc}.se.fc2.bias"]),
                    },
                }
            if f"{tsrc}.downsample.conv.weight" in sd:
                blk["downsample"] = {
                    "conv": {"kernel": conv(None,
                                            f"{tsrc}.downsample.conv.weight")},
                    "bn": {
                        "scale": jnp.asarray(
                            sd[f"{tsrc}.downsample.bn.weight"]),
                        "bias": jnp.asarray(sd[f"{tsrc}.downsample.bn.bias"]),
                    },
                }
                stt["downsample"] = {"bn": {
                    "mean": jnp.asarray(
                        sd[f"{tsrc}.downsample.bn.running_mean"]),
                    "var": jnp.asarray(
                        sd[f"{tsrc}.downsample.bn.running_var"]),
                }}
            new_params[name] = blk
            new_stats[name] = stt

    new_params["head_fc"] = {
        "kernel": jnp.asarray(sd["head.fc.weight"].T),
        "bias": jnp.asarray(sd["head.fc.bias"]),
    }

    # shape-check against the initialized tree
    import jax

    def check(a, b, path=""):
        if isinstance(a, dict):
            for k in a:
                check(a[k], b[k], path + "/" + str(k))
        else:
            assert a.shape == b.shape, (path, a.shape, b.shape)

    check(new_params, params)
    check(new_stats, stats)
    return {"params": new_params, "batch_stats": new_stats}
