"""Torch training oracle for golden-baseline curves.

The reference cannot execute in this environment (its model path needs timm
and the CUDA-only fmoe, neither installed — see BASELINE.md), so golden
numbers are established against this minimal torch implementation of the
SAME math the reference defines, written from its formulas:

- ResMoE block wiring           /root/reference/models/resMoE.py:126-145
  (norm1 -> gate -> attn on kept + residual; norm2 -> gate -> MoE on kept)
- token-skip Gate STE           /root/reference/models/resMoE.py:59-85
- FastMoE NaiveGate top-k       softmax over the k selected logits, dropless
- DeiT attention / pre-LN ViT   /root/reference/models/vision_transformer.py:248-322
- label-smoothing CE            timm LabelSmoothingCrossEntropy semantics
- AdamW (decoupled wd) + two LR groups (gate params at --gate-lr)
                                /root/reference/main.py:619-631

Weights are TRANSFERRED from the JAX model (same init), batches are shared,
and the two implementations must track each other's loss step by step — that
trajectory is the "reference curve" at CPU scale.

Layout notes: qkv is split contiguously (q = qkv[..., :C]); the reference's
timm layout differs only by a fixed column permutation of the qkv weight,
which cannot change the expressible function or the training dynamics, so
the transfer uses this repo's convention on both sides.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


class OracleGate(nn.Module):
    """reference models/resMoE.py:32-85 (hard STE path)."""

    def __init__(self, dim):
        super().__init__()
        self.head = nn.Linear(dim, 1)

    def forward(self, x, threshold: float):
        prob = torch.sigmoid(self.head(x))              # (B, N, 1)
        nprob = 1.0 - prob
        hard_skip = (prob > threshold).float()
        skip = hard_skip + nprob.detach() - nprob       # resMoE.py:76
        keep = (1.0 - hard_skip) + prob.detach() - prob  # resMoE.py:77
        return skip, keep


class OracleMoE(nn.Module):
    """FastMoE NaiveGate + dropless expert FFN (resMoE.py:15-29).

    ``capacity``: optional static per-expert slot count. Token-major priority
    — the p-th (token, choice) pair in flat order wins a slot iff fewer than
    ``capacity`` earlier pairs chose the same expert; dropped pairs contribute
    zero to the combine (the rebuild's capacity/capacity_fused semantics,
    ``ops/moe.py::make_dispatch`` / ``aligned_expert_layout``).
    """

    def __init__(self, dim, hidden, num_experts, top_k, capacity=None):
        super().__init__()
        self.router = nn.Linear(dim, num_experts)
        self.w1 = nn.Parameter(torch.zeros(num_experts, dim, hidden))
        self.b1 = nn.Parameter(torch.zeros(num_experts, hidden))
        self.w2 = nn.Parameter(torch.zeros(num_experts, hidden, dim))
        self.b2 = nn.Parameter(torch.zeros(num_experts, dim))
        self.top_k = top_k
        self.capacity = capacity

    def forward(self, x):
        B, N, d = x.shape
        flat = x.reshape(-1, d)
        logits = self.router(flat.float())
        vals, idx = torch.topk(logits, self.top_k, dim=-1)
        gate_w = torch.softmax(vals, dim=-1)            # over selected only
        E = self.w1.shape[0]
        if self.capacity is not None:
            flat_idx = idx.reshape(-1)                  # (T*k) token-major
            onehot = F.one_hot(flat_idx, E).to(torch.int64)
            rank = (onehot.cumsum(0) - onehot).gather(
                1, flat_idx[:, None])[:, 0]
            keep = (rank < self.capacity).reshape(-1, self.top_k)
            gate_w = gate_w * keep.float()              # dropped -> 0 weight
        y = torch.zeros_like(flat)
        for e in range(E):
            for kk in range(self.top_k):
                sel = idx[:, kk] == e
                if not sel.any():
                    continue
                xe = flat[sel]
                h = F.gelu(xe @ self.w1[e] + self.b1[e], approximate="none")
                out = h @ self.w2[e] + self.b2[e]
                y[sel] += gate_w[sel, kk:kk + 1] * out
        return y.reshape(B, N, d)


class OracleAttention(nn.Module):
    """vision_transformer.py:248-280 (contiguous qkv split, fp32 softmax)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.num_heads = num_heads

    def forward(self, x):
        B, N, C = x.shape
        H = self.num_heads
        dh = C // H
        qkv = self.qkv(x)
        q, k, v = qkv.split(C, dim=-1)
        q = q.reshape(B, N, H, dh).permute(0, 2, 1, 3)
        k = k.reshape(B, N, H, dh).permute(0, 2, 1, 3)
        v = v.reshape(B, N, H, dh).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * dh ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, C)
        return self.proj(out)


class OracleResMoEBlock(nn.Module):
    """forward_residule_moe (resMoE.py:126-145): zero-mask semantics."""

    def __init__(self, dim, num_heads, hidden, num_experts, top_k):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = OracleAttention(dim, num_heads)
        self.mlp = OracleMoE(dim, hidden, num_experts, top_k)
        self.dense_gate = OracleGate(dim)
        self.moe_gate = OracleGate(dim)

    def forward(self, x, threshold: float):
        x = self.norm1(x)
        skip_w, keep_w = self.dense_gate(x, threshold)
        skip, tk = x * skip_w, x * keep_w
        x = self.attn(tk) + tk + skip
        x = self.norm2(x)
        skip_w, keep_w = self.moe_gate(x, threshold)
        skip, tk = x * skip_w, x * keep_w
        x = self.mlp(tk) + tk + skip
        return x


class OracleResMoEViT(nn.Module):
    def __init__(self, img_size=32, patch_size=16, dim=192, depth=12,
                 num_heads=3, mlp_ratio=4.0, num_experts=8, top_k=2,
                 num_classes=10, capacity=None):
        super().__init__()
        self.patch_size = patch_size
        self.grid = img_size // patch_size
        self.proj = nn.Linear(patch_size * patch_size * 3, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, self.grid ** 2 + 1, dim))
        self.blocks = nn.ModuleList([
            OracleResMoEBlock(dim, num_heads, int(dim * mlp_ratio),
                              num_experts, top_k)
            for _ in range(depth)
        ])
        if capacity is not None:
            for blk in self.blocks:
                blk.mlp.capacity = capacity
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x, threshold: float):
        # x: (B, H, W, 3) channels-last, same patch-extraction math as the
        # JAX PatchEmbed (a stride==kernel conv is exactly this reshape+GEMM)
        B, H, W, C = x.shape
        p = self.patch_size
        g = H // p
        x = x.reshape(B, g, p, g, p, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, g * g, p * p * C)
        x = self.proj(x)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x, threshold)
        x = self.norm(x)
        return self.head(x[:, 0])


class OracleMlp(nn.Module):
    """timm Mlp: fc1 -> exact GELU -> fc2 (vision_transformer.py Block MLP)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x), approximate="none"))


class OracleBlock(nn.Module):
    """Plain pre-LN block (vision_transformer.py:283-322)."""

    def __init__(self, dim, num_heads, hidden):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = OracleAttention(dim, num_heads)
        self.mlp = OracleMlp(dim, hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class OracleViT(nn.Module):
    """Dense DeiT, optionally distilled (models/model.py:32-77): dist token +
    second head; training returns both head outputs, eval averages them."""

    def __init__(self, img_size=32, patch_size=16, dim=192, depth=12,
                 num_heads=3, mlp_ratio=4.0, num_classes=10, distilled=False):
        super().__init__()
        self.patch_size = patch_size
        self.grid = img_size // patch_size
        self.distilled = distilled
        n_extra = 2 if distilled else 1
        self.proj = nn.Linear(patch_size * patch_size * 3, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        if distilled:
            self.dist_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, self.grid ** 2 + n_extra, dim))
        self.blocks = nn.ModuleList([
            OracleBlock(dim, num_heads, int(dim * mlp_ratio))
            for _ in range(depth)
        ])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)
        if distilled:
            self.head_dist = nn.Linear(dim, num_classes)

    def forward(self, x, train=False):
        B, H, W, C = x.shape
        p = self.patch_size
        g = H // p
        x = x.reshape(B, g, p, g, p, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, g * g, p * p * C)
        x = self.proj(x)
        toks = [self.cls_token.expand(B, -1, -1)]
        if self.distilled:
            toks.append(self.dist_token.expand(B, -1, -1))
        x = torch.cat(toks + [x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        logits = self.head(x[:, 0])
        if not self.distilled:
            return logits
        logits_dist = self.head_dist(x[:, 1])
        if train:
            return logits, logits_dist
        return (logits + logits_dist) / 2.0


def smoothed_ce(logits, targets, smoothing=0.1):
    """timm LabelSmoothingCrossEntropy."""
    logp = F.log_softmax(logits, dim=-1)
    nll = -logp.gather(1, targets[:, None]).squeeze(1)
    return ((1 - smoothing) * nll - smoothing * logp.mean(dim=-1)).mean()


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def load_from_flax(model: OracleResMoEViT, params: dict):
    """Transfer this repo's flax resmoe params into the oracle."""
    sd = {}
    sd["proj.weight"] = _t(params["patch_embed"]["proj"]["kernel"]).T
    sd["proj.bias"] = _t(params["patch_embed"]["proj"]["bias"])
    sd["cls_token"] = _t(params["cls_token"])
    sd["pos_embed"] = _t(params["pos_embed"])
    sd["norm.weight"] = _t(params["norm"]["scale"])
    sd["norm.bias"] = _t(params["norm"]["bias"])
    sd["head.weight"] = _t(params["head"]["kernel"]).T
    sd["head.bias"] = _t(params["head"]["bias"])
    for i in range(len(model.blocks)):
        b = params[f"blocks_{i}"]
        pre = f"blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[pre + ln + ".weight"] = _t(b[ln]["scale"])
            sd[pre + ln + ".bias"] = _t(b[ln]["bias"])
        sd[pre + "attn.qkv.weight"] = _t(b["attn"]["qkv"]["kernel"]).T
        sd[pre + "attn.qkv.bias"] = _t(b["attn"]["qkv"]["bias"])
        sd[pre + "attn.proj.weight"] = _t(b["attn"]["proj"]["kernel"]).T
        sd[pre + "attn.proj.bias"] = _t(b["attn"]["proj"]["bias"])
        for g in ("dense_gate", "moe_gate"):
            sd[pre + g + ".head.weight"] = _t(b[g]["head"]["kernel"]).T
            sd[pre + g + ".head.bias"] = _t(b[g]["head"]["bias"])
        m = b["mlp"]
        sd[pre + "mlp.router.weight"] = _t(m["router_kernel"]).T
        sd[pre + "mlp.router.bias"] = _t(m["router_bias"])
        sd[pre + "mlp.w1"] = _t(m["expert_fc1_kernel"])
        sd[pre + "mlp.b1"] = _t(m["expert_fc1_bias"])
        sd[pre + "mlp.w2"] = _t(m["expert_fc2_kernel"])
        sd[pre + "mlp.b2"] = _t(m["expert_fc2_bias"])
    model.load_state_dict(sd)


def load_from_flax_vit(model: OracleViT, params: dict):
    """Transfer this repo's flax dense/distilled deit params into OracleViT."""
    sd = {}
    sd["proj.weight"] = _t(params["patch_embed"]["proj"]["kernel"]).T
    sd["proj.bias"] = _t(params["patch_embed"]["proj"]["bias"])
    sd["cls_token"] = _t(params["cls_token"])
    sd["pos_embed"] = _t(params["pos_embed"])
    sd["norm.weight"] = _t(params["norm"]["scale"])
    sd["norm.bias"] = _t(params["norm"]["bias"])
    sd["head.weight"] = _t(params["head"]["kernel"]).T
    sd["head.bias"] = _t(params["head"]["bias"])
    if model.distilled:
        sd["dist_token"] = _t(params["dist_token"])
        sd["head_dist.weight"] = _t(params["head_dist"]["kernel"]).T
        sd["head_dist.bias"] = _t(params["head_dist"]["bias"])
    for i in range(len(model.blocks)):
        b = params[f"blocks_{i}"]
        pre = f"blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[pre + ln + ".weight"] = _t(b[ln]["scale"])
            sd[pre + ln + ".bias"] = _t(b[ln]["bias"])
        sd[pre + "attn.qkv.weight"] = _t(b["attn"]["qkv"]["kernel"]).T
        sd[pre + "attn.qkv.bias"] = _t(b["attn"]["qkv"]["bias"])
        sd[pre + "attn.proj.weight"] = _t(b["attn"]["proj"]["kernel"]).T
        sd[pre + "attn.proj.bias"] = _t(b["attn"]["proj"]["bias"])
        sd[pre + "mlp.fc1.weight"] = _t(b["mlp"]["fc1"]["kernel"]).T
        sd[pre + "mlp.fc1.bias"] = _t(b["mlp"]["fc1"]["bias"])
        sd[pre + "mlp.fc2.weight"] = _t(b["mlp"]["fc2"]["kernel"]).T
        sd[pre + "mlp.fc2.bias"] = _t(b["mlp"]["fc2"]["bias"])
    model.load_state_dict(sd)


def soft_distill_loss(base, outputs_kd, teacher_logits, alpha, tau):
    """reference losses.py:53-72: KL at temperature tau, x tau^2 / numel,
    blended with the base loss by alpha."""
    T = tau
    kd = F.kl_div(
        F.log_softmax(outputs_kd / T, dim=-1),
        F.log_softmax(teacher_logits / T, dim=-1),
        reduction="sum", log_target=True,
    ) * (T * T) / outputs_kd.numel()
    return base * (1.0 - alpha) + kd * alpha


def train_losses_distilled(student: OracleViT, teacher: OracleViT,
                           images: np.ndarray, labels: np.ndarray,
                           steps: int, lr: float, alpha: float, tau: float,
                           smoothing: float = 0.1):
    """Distilled-deit training: base smoothed CE on the cls head + soft KD on
    the dist head vs the frozen teacher (reference main.py:666-694 +
    losses.py:28-73)."""
    opt = make_optimizer(student, lr, lr)
    teacher.eval()
    losses = []
    nb = images.shape[0]
    for s in range(steps):
        x = torch.from_numpy(images[s % nb])
        y = torch.from_numpy(labels[s % nb])
        with torch.no_grad():
            t_logits = teacher(x)
        logits, logits_kd = student(x, train=True)
        base = smoothed_ce(logits, y, smoothing)
        loss = soft_distill_loss(base, logits_kd, t_logits, alpha, tau)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses


def make_optimizer(model: OracleResMoEViT, lr: float, gate_lr: float,
                   weight_decay: float = 0.05):
    """AdamW with timm's grouping (main.py:619-631): gates get --gate-lr;
    biases / 1-d params / pos_embed / cls_token get no weight decay."""
    no_decay, decay, gates = [], [], []
    for name, p in model.named_parameters():
        if "gate" in name:
            gates.append(p)
        elif p.ndim <= 1 or name in ("pos_embed", "cls_token") or \
                name.endswith((".b1", ".b2")) or "bias" in name:
            no_decay.append(p)
        else:
            decay.append(p)
    return torch.optim.AdamW([
        {"params": decay, "weight_decay": weight_decay},
        {"params": no_decay, "weight_decay": 0.0},
        {"params": gates, "weight_decay": 0.0, "lr": gate_lr},
    ], lr=lr, betas=(0.9, 0.999), eps=1e-8)


def soft_ce(logits, target):
    """timm SoftTargetCrossEntropy (reference main.py:657 — the criterion
    whenever mixup/cutmix is active; smoothing is folded into the targets)."""
    return (-target * F.log_softmax(logits, dim=-1)).sum(dim=-1).mean()


def train_losses_recipe(model: OracleResMoEViT, images: np.ndarray,
                        soft_targets: np.ndarray, lrs, gate_lrs,
                        threshold: float = 0.5, ema_decay: float = 0.99996,
                        eval_images: np.ndarray = None,
                        eval_labels: np.ndarray = None):
    """Full cmd.sh recipe math (reference cmd.sh:7-13 + engine.py:22-85):
    pre-augmented, pre-mixed batches (shared bit-exact with the JAX side via
    the shared-batch protocol), SoftTargetCrossEntropy, per-epoch cosine LR
    fed per step, timm-ModelEma update after each optimizer step.

    ``images[s]``/``soft_targets[s]`` are the step-s batch; ``lrs``/
    ``gate_lrs`` give each step's group LRs (cosine, epoch-granular).
    Returns dict with the per-step loss curve and, when an eval batch is
    given, final plain-CE eval losses for both the live and EMA weights.
    """
    opt = make_optimizer(model, lrs[0], gate_lrs[0])
    # timm ModelEma semantics (reference main.py:597-607, engine.py:77-78):
    # shadow of every float state entry, updated post-step
    ema = {k: v.detach().clone() for k, v in model.state_dict().items()}
    losses = []
    for s in range(len(lrs)):
        opt.param_groups[0]["lr"] = lrs[s]
        opt.param_groups[1]["lr"] = lrs[s]
        opt.param_groups[2]["lr"] = gate_lrs[s]
        x = torch.from_numpy(images[s])
        t = torch.from_numpy(soft_targets[s])
        logits = model(x, threshold)
        loss = soft_ce(logits, t)
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            msd = model.state_dict()
            for k in ema:
                if ema[k].dtype.is_floating_point:
                    ema[k].mul_(ema_decay).add_(msd[k], alpha=1 - ema_decay)
                else:
                    ema[k].copy_(msd[k])
        losses.append(float(loss))
    out = {"losses": losses}
    if eval_images is not None:
        with torch.no_grad():
            x = torch.from_numpy(eval_images)
            y = torch.from_numpy(eval_labels)
            out["final_eval_loss"] = float(
                F.cross_entropy(model(x, threshold), y))
            backup = {k: v.detach().clone()
                      for k, v in model.state_dict().items()}
            model.load_state_dict(ema)
            out["final_ema_eval_loss"] = float(
                F.cross_entropy(model(x, threshold), y))
            model.load_state_dict(backup)
    return out


def train_losses(model: OracleResMoEViT, images: np.ndarray,
                 labels: np.ndarray, steps: int, lr: float, gate_lr: float,
                 threshold: float = 0.5, smoothing: float = 0.1):
    """Run ``steps`` AdamW steps over the fixed batch cycle, return losses."""
    opt = make_optimizer(model, lr, gate_lr)
    losses = []
    nb = images.shape[0]
    for s in range(steps):
        x = torch.from_numpy(images[s % nb])
        y = torch.from_numpy(labels[s % nb])
        logits = model(x, threshold)
        loss = smoothed_ce(logits, y, smoothing)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses


# ---------------------------------------------------------------------------
# Sparse (zeta-pruning) oracle — reference models/layers.py:275-473 +
# models/base_model.py. Restates the SViTE-style search math: soft zeta
# masks multiply qkv / the MLP hidden / the patch tokens; compress binarizes
# at budget percentiles and OR-propagates the patch mask last->first.
# ---------------------------------------------------------------------------


class OracleSparseAttention(nn.Module):
    """reference layers.py:275-327 (full-search zeta shape)."""

    def __init__(self, dim, num_heads, num_patches):
        super().__init__()
        self.num_heads = num_heads
        d = dim // num_heads
        self.scale = d ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.zeta = nn.Parameter(torch.ones(1, 1, num_heads, 1, d))
        self.patch_zeta = nn.Parameter(torch.ones(1, num_patches, 1) * 3.0)
        self.is_searched = False
        self.searched_zeta = torch.ones(1, 1, num_heads, 1, d)
        self.searched_patch_zeta = torch.ones(1, num_patches, 1)

    def forward(self, x):
        zp = (self.searched_patch_zeta if self.is_searched
              else torch.tanh(self.patch_zeta))
        x = x * zp
        B, N, C = x.shape
        H = self.num_heads
        d = C // H
        z = self.searched_zeta if self.is_searched else self.zeta
        qkv = self.qkv(x).reshape(B, N, 3, H, d).permute(2, 0, 3, 1, 4)
        qkv = qkv * z
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class OracleSparseMlp(nn.Module):
    """reference layers.py:420-446: zeta multiplies the GELU'd hidden."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)
        self.zeta = nn.Parameter(torch.ones(1, 1, hidden))
        self.is_searched = False
        self.searched_zeta = torch.ones(1, 1, hidden)

    def forward(self, x):
        z = self.searched_zeta if self.is_searched else self.zeta
        h = F.gelu(self.fc1(x), approximate="none") * z
        return self.fc2(h)


class OracleSparseBlock(nn.Module):
    def __init__(self, dim, num_heads, hidden, num_patches):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = OracleSparseAttention(dim, num_heads, num_patches)
        self.mlp = OracleSparseMlp(dim, hidden)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class OracleSparseViT(nn.Module):
    def __init__(self, img_size=32, patch_size=16, dim=192, depth=12,
                 num_heads=3, mlp_ratio=4.0, num_classes=10):
        super().__init__()
        self.patch_size = patch_size
        self.grid = img_size // patch_size
        self.num_patches = self.grid ** 2 + 1  # incl. cls (zoo.py parity)
        self.proj = nn.Linear(patch_size * patch_size * 3, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, self.grid ** 2 + 1, dim))
        self.blocks = nn.ModuleList([
            OracleSparseBlock(dim, num_heads, int(dim * mlp_ratio),
                              self.num_patches)
            for _ in range(depth)
        ])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):
        B, H, W, C = x.shape
        p = self.patch_size
        g = H // p
        x = x.reshape(B, g, p, g, p, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, g * g, p * p * C)
        x = self.proj(x)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])


def load_from_flax_sparse(model: OracleSparseViT, params: dict):
    sd = {}
    sd["proj.weight"] = _t(params["patch_embed"]["proj"]["kernel"]).T
    sd["proj.bias"] = _t(params["patch_embed"]["proj"]["bias"])
    sd["cls_token"] = _t(params["cls_token"])
    sd["pos_embed"] = _t(params["pos_embed"])
    sd["norm.weight"] = _t(params["norm"]["scale"])
    sd["norm.bias"] = _t(params["norm"]["bias"])
    sd["head.weight"] = _t(params["head"]["kernel"]).T
    sd["head.bias"] = _t(params["head"]["bias"])
    for i in range(len(model.blocks)):
        b = params[f"blocks_{i}"]
        pre = f"blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[pre + ln + ".weight"] = _t(b[ln]["scale"])
            sd[pre + ln + ".bias"] = _t(b[ln]["bias"])
        sd[pre + "attn.qkv.weight"] = _t(b["attn"]["qkv"]["kernel"]).T
        sd[pre + "attn.qkv.bias"] = _t(b["attn"]["qkv"]["bias"])
        sd[pre + "attn.proj.weight"] = _t(b["attn"]["proj"]["kernel"]).T
        sd[pre + "attn.proj.bias"] = _t(b["attn"]["proj"]["bias"])
        sd[pre + "attn.zeta"] = _t(b["attn"]["zeta"])
        sd[pre + "attn.patch_zeta"] = _t(b["attn"]["patch_zeta"])
        sd[pre + "mlp.fc1.weight"] = _t(b["mlp"]["fc1"]["kernel"]).T
        sd[pre + "mlp.fc1.bias"] = _t(b["mlp"]["fc1"]["bias"])
        sd[pre + "mlp.fc2.weight"] = _t(b["mlp"]["fc2"]["kernel"]).T
        sd[pre + "mlp.fc2.bias"] = _t(b["mlp"]["fc2"]["bias"])
        sd[pre + "mlp.zeta"] = _t(b["mlp"]["zeta"])
    model.load_state_dict(sd)


def sparse_sparsity_loss(model: OracleSparseViT):
    """reference base_model.py:49-60 (L1 over soft zetas)."""
    la = lm = lp = 0.0
    for blk in model.blocks:
        la = la + blk.attn.zeta.abs().sum()
        lp = lp + torch.tanh(blk.attn.patch_zeta).abs().sum()
        lm = lm + blk.mlp.zeta.abs().sum()
    return la, lm, lp


def sparse_compress(model: OracleSparseViT, budget_attn, budget_mlp,
                    budget_patch):
    """reference base_model.py:88-132: percentile thresholds, binarize,
    patch-mask OR propagation from the last block backward."""
    za, zm, zp = [], [], []
    for blk in model.blocks:
        za.extend(blk.attn.zeta.detach().reshape(-1).tolist())
        zp.extend(torch.tanh(blk.attn.patch_zeta).detach()
                  .reshape(-1).tolist())
        zm.extend(blk.mlp.zeta.detach().reshape(-1).tolist())
    za, zm, zp = sorted(za), sorted(zm), sorted(zp)
    ta = za[int((1.0 - budget_attn) * len(za))]
    tm = zm[int((1.0 - budget_mlp) * len(zm))]
    tp = zp[int((1.0 - budget_patch) * len(zp))]

    mask = None
    patch_masks = []
    for blk in reversed(model.blocks):
        m = (torch.tanh(blk.attn.patch_zeta.detach()) >= tp)
        mask = m if mask is None else (mask | m)
        patch_masks.append(mask.float())
    patch_masks.reverse()

    for blk, pm in zip(model.blocks, patch_masks):
        blk.attn.is_searched = True
        blk.attn.searched_zeta = (blk.attn.zeta.detach() >= ta).float()
        blk.attn.searched_patch_zeta = pm
        blk.mlp.is_searched = True
        blk.mlp.searched_zeta = (blk.mlp.zeta.detach() >= tm).float()
    return ta, tm, tp


def sparse_decompress(model: OracleSparseViT):
    for blk in model.blocks:
        blk.attn.is_searched = False
        blk.mlp.is_searched = False


def train_losses_sparse(model: OracleSparseViT, images, labels, steps,
                        lr, w_sparse, smoothing=0.1):
    """Search-phase training: smoothed CE + w * L1(zetas), plain AdamW
    (weight decay 0 on both sides — wd-mask parity is covered by the other
    golden configs)."""
    opt = torch.optim.AdamW(model.parameters(), lr=lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    out = []
    nb = images.shape[0]
    for s in range(steps):
        x = torch.from_numpy(images[s % nb])
        y = torch.from_numpy(labels[s % nb])
        base = smoothed_ce(model(x), y, smoothing)
        la, lm, lp = sparse_sparsity_loss(model)
        loss = base + w_sparse * (la + lm + lp)
        opt.zero_grad()
        loss.backward()
        opt.step()
        out.append(float(loss))
    return out


# ---------------------------------------------------------------------------
# Switchable oracle — reference models/layers.py:31-157 (SwitchableLayerNorm:
# per-bucket affine; bucket by explicit id or L2-argmin to non-trainable
# centroids) + vision_transformer.py:325-639 (pre/router/mid/post split; the
# reference default router_start=0 / router_end=-1 gives 0/11/1). The torch
# side applies the per-bucket affine with index_select (the reference's
# boolean-mask loop, layers.py:144-149, computes the same function); the jax
# rebuild uses one gather — the golden test pins both value and GRADIENT
# equality of that rewrite.
# ---------------------------------------------------------------------------


class OracleSwitchableLN(nn.Module):
    def __init__(self, dim, buckets):
        super().__init__()
        self.eps = 1e-5
        self.weights = nn.Parameter(torch.ones(buckets, dim))
        self.biases = nn.Parameter(torch.zeros(buckets, dim))
        self.centroids = torch.zeros(buckets, dim)  # non-trainable buffer

    def forward(self, x, buckets=None):
        mean = x.mean(dim=-1, keepdim=True)
        diff = x - mean
        var = (diff * diff).mean(dim=-1, keepdim=True)
        normalized = diff * torch.rsqrt(var + self.eps)
        if buckets is None:
            d = ((x * x).sum(-1, keepdim=True)
                 - 2.0 * x @ self.centroids.T
                 + (self.centroids * self.centroids).sum(-1))
            selected = d.argmin(dim=-1)
        else:
            selected = torch.broadcast_to(buckets, x.shape[:-1])
        w = self.weights[selected]
        b = self.biases[selected]
        return normalized * w + b, selected


class OracleSwitchableViT(nn.Module):
    """Non-routing forward (routing-mode reference indexing is acknowledged
    buggy research code — SURVEY 2.23 — and excluded from golden scope)."""

    def __init__(self, img_size=32, patch_size=16, dim=192, depth=12,
                 num_heads=3, mlp_ratio=4.0, num_classes=10, buckets=4,
                 router_start=0, router_end=-1):
        super().__init__()
        self.patch_size = patch_size
        self.grid = img_size // patch_size
        self.proj = nn.Linear(patch_size * patch_size * 3, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, self.grid ** 2 + 1, dim))
        self.router = OracleSwitchableLN(dim, buckets)
        n_pre = router_start % depth
        n_mid = (router_end - router_start) % depth
        self.n_pre, self.n_mid = n_pre, n_mid
        self.blocks = nn.ModuleList([
            OracleBlock(dim, num_heads, int(dim * mlp_ratio))
            for _ in range(depth)
        ])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x, bucket=None):
        B, H, W, C = x.shape
        p = self.patch_size
        g = H // p
        x = x.reshape(B, g, p, g, p, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, g * g, p * p * C)
        x = self.proj(x)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks[:self.n_pre]:
            x = blk(x)
        x, selected = self.router(x, bucket)
        for blk in self.blocks[self.n_pre:]:
            x = blk(x)
        return self.head(self.norm(x)[:, 0]), selected


def load_from_flax_switchable(model: OracleSwitchableViT, params: dict,
                              centroids: np.ndarray):
    sd = {}
    sd["proj.weight"] = _t(params["patch_embed"]["proj"]["kernel"]).T
    sd["proj.bias"] = _t(params["patch_embed"]["proj"]["bias"])
    sd["cls_token"] = _t(params["cls_token"])
    sd["pos_embed"] = _t(params["pos_embed"])
    sd["router.weights"] = _t(params["router"]["weights"])
    sd["router.biases"] = _t(params["router"]["biases"])
    sd["norm.weight"] = _t(params["norm"]["scale"])
    sd["norm.bias"] = _t(params["norm"]["bias"])
    sd["head.weight"] = _t(params["head"]["kernel"]).T
    sd["head.bias"] = _t(params["head"]["bias"])
    for i in range(len(model.blocks)):
        b = params[f"block_{i}"]
        pre = f"blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[pre + ln + ".weight"] = _t(b[ln]["scale"])
            sd[pre + ln + ".bias"] = _t(b[ln]["bias"])
        sd[pre + "attn.qkv.weight"] = _t(b["attn"]["qkv"]["kernel"]).T
        sd[pre + "attn.qkv.bias"] = _t(b["attn"]["qkv"]["bias"])
        sd[pre + "attn.proj.weight"] = _t(b["attn"]["proj"]["kernel"]).T
        sd[pre + "attn.proj.bias"] = _t(b["attn"]["proj"]["bias"])
        sd[pre + "mlp.fc1.weight"] = _t(b["mlp"]["fc1"]["kernel"]).T
        sd[pre + "mlp.fc1.bias"] = _t(b["mlp"]["fc1"]["bias"])
        sd[pre + "mlp.fc2.weight"] = _t(b["mlp"]["fc2"]["kernel"]).T
        sd[pre + "mlp.fc2.bias"] = _t(b["mlp"]["fc2"]["bias"])
    model.load_state_dict(sd)
    model.router.centroids = torch.from_numpy(
        np.asarray(centroids, np.float32))


def train_losses_switchable(model: OracleSwitchableViT, images, labels,
                            steps, lr, smoothing=0.1):
    """Centroid-bucketed training: the per-bucket affine gradients flow
    through the bucket selection (selection itself is non-differentiable
    argmin on both sides)."""
    opt = torch.optim.AdamW(model.parameters(), lr=lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.0)
    out = []
    nb = images.shape[0]
    for s in range(steps):
        x = torch.from_numpy(images[s % nb])
        y = torch.from_numpy(labels[s % nb])
        logits, _ = model(x)
        loss = smoothed_ce(logits, y, smoothing)
        opt.zero_grad()
        loss.backward()
        opt.step()
        out.append(float(loss))
    return out
