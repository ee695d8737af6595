"""Checkpoint save/restore + foreign checkpoint import.

Reference behavior being mirrored (``main.py:893-907,703-724``): every epoch the
master writes ``checkpoint`` with {model, optimizer, lr_scheduler, epoch,
model_ema, scaler, args}; resume restores all of it and sets start_epoch.
TPU-native storage is Orbax (PyTree checkpoints). There is no grad-scaler on
TPU (bf16), so that slot holds None; schedule state is pure (epoch-indexed) so
only the epoch is stored.

Also provides importers for the reference's foreign formats:
- torch ``.pth`` DeiT checkpoints (param-name + layout remap, conv→dense patch
  embed, fused qkv transpose) — reference loads these for finetune
  (``main.py:532-573``);
- jax/flax ``.npz`` (the reference's ``_load_weights``,
  ``vision_transformer.py:888-1005``).
Both run through the same pos-embed resize as the reference when grid sizes
differ.
"""
from __future__ import annotations

import os
import typing as typ

import jax
import jax.numpy as jnp
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


_ASYNC_CKPTR = None


def _async_ckptr():
    """Singleton Orbax AsyncCheckpointer: device->host copies happen in the
    save call, the disk commit runs on a background thread — the train loop
    continues into the next epoch while the checkpoint lands. Orbax
    serializes consecutive async saves internally."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints():
    """Block until every in-flight async save has committed. Call before
    process exit and before restoring from a path that might still be
    mid-commit."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(path: str, state, epoch: int, extra: typ.Optional[dict] = None,
                    is_main: bool = True, use_async: bool = False):
    """Write the train-state payload (rank-0 only, reference utils.py:264-266).

    ``extra={"args": vars(args)}`` mirrors the reference's per-checkpoint args
    record (``main.py:898-906``); it lands in a JSON sidecar
    ``<path>.args.json`` (Orbax pytrees hold arrays, not namespaces) so a
    resumed run can reconstruct its config via ``load_checkpoint_args``.

    ``use_async=True`` commits on a background thread (``--async-checkpoint``;
    beyond-reference — the torch reference blocks the loop on
    ``torch.save``); the payload is snapshot at call time, so the ongoing
    epoch cannot mutate what lands on disk.
    """
    if not is_main:
        return
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "gates": state.gates,
        "ema_params": state.ema_params,
        "rng": state.rng,
        "step": state.step,
        "epoch": np.asarray(epoch),
    }
    extra = dict(extra) if extra else {}
    args_record = extra.pop("args", None)
    # scheduler bookkeeping (plateau's best/num_bad/current_lr — the
    # reference checkpoints lr_scheduler.state_dict(), main.py:900): plain
    # scalars, lands in its own JSON sidecar like the args record
    sched_record = extra.pop("sched", None)
    if extra:
        payload["extra"] = extra
    path = os.path.abspath(path)
    if use_async:
        _async_ckptr().save(path, payload, force=True)
    else:
        _ckptr().save(path, payload, force=True)
    import json

    if args_record is not None:
        with open(path + ".args.json", "w") as f:
            json.dump(args_record, f, indent=2, default=str)
    if sched_record is not None:
        with open(path + ".sched.json", "w") as f:
            json.dump(sched_record, f, indent=2)


def load_checkpoint_args(path: str) -> typ.Optional[dict]:
    """Read the args record saved next to a checkpoint, if present."""
    import json

    sidecar = os.path.abspath(path) + ".args.json"
    if not os.path.exists(sidecar):
        return None
    with open(sidecar) as f:
        return json.load(f)


def load_checkpoint_sched(path: str) -> typ.Optional[dict]:
    """Read the scheduler state saved next to a checkpoint, if present
    (plateau bookkeeping; reference parity for lr_scheduler.state_dict()
    restore, reference main.py:714-718)."""
    import json

    sidecar = os.path.abspath(path) + ".sched.json"
    if not os.path.exists(sidecar):
        return None
    with open(sidecar) as f:
        return json.load(f)


def restore_checkpoint(path: str, state) -> typ.Tuple[typ.Any, int]:
    """Restore into an existing state skeleton; returns (state, epoch)."""
    wait_for_checkpoints()  # a same-process async save might still be landing
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "gates": state.gates,
        "ema_params": state.ema_params,
        "rng": state.rng,
        "step": state.step,
        "epoch": np.asarray(0),
    }
    restored = _ckptr().restore(os.path.abspath(path), item=template)
    new_state = state.replace(
        params=restored["params"], opt_state=restored["opt_state"],
        gates=restored["gates"], ema_params=restored["ema_params"],
        rng=restored["rng"], step=restored["step"],
    )
    return new_state, int(restored["epoch"])


# ---------------------------------------------------------------------------
# Foreign checkpoint import
# ---------------------------------------------------------------------------

def _torch_linear(state_dict, prefix):
    w = np.asarray(state_dict[prefix + ".weight"])
    out = {"kernel": jnp.asarray(w.T)}
    if prefix + ".bias" in state_dict:
        out["bias"] = jnp.asarray(np.asarray(state_dict[prefix + ".bias"]))
    return out


def _torch_ln(state_dict, prefix):
    return {
        "scale": jnp.asarray(np.asarray(state_dict[prefix + ".weight"])),
        "bias": jnp.asarray(np.asarray(state_dict[prefix + ".bias"])),
    }


def import_torch_checkpoint(path_or_dict, model, params,
                            strict_heads: bool = False):
    """Map a DeiT torch state_dict onto this framework's param tree.

    Handles: conv patch-embed (D,C,kh,kw) → dense (kh*kw*C, D) kernel; fused
    qkv transpose; pos-embed grid resize (reference main.py:550-571); head
    shape mismatches dropped unless strict (reference main.py:542-548).
    Accepts a path to a ``.pth`` file (torch required) or an already-loaded
    dict. Returns a new params tree.
    """
    if isinstance(path_or_dict, (str, os.PathLike)):
        import torch

        ckpt = torch.load(path_or_dict, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in path_or_dict.items()}

    p = jax.tree.map(lambda x: x, params)  # shallow copy structure

    def put(dst_path, value):
        node = p
        for k in dst_path[:-1]:
            node = node[k]
        if dst_path[-1] in node and node[dst_path[-1]].shape != value.shape:
            raise ValueError(
                f"shape mismatch at {dst_path}: {node[dst_path[-1]].shape} vs "
                f"{value.shape}")
        node[dst_path[-1]] = value

    # patch embed: torch conv (D, C, kh, kw) -> (kh, kw, C, D) -> (kh*kw*C, D)
    w = np.asarray(sd["patch_embed.proj.weight"])
    D, C, kh, kw = w.shape
    kernel = w.transpose(2, 3, 1, 0).reshape(kh * kw * C, D)
    put(("patch_embed", "proj", "kernel"), jnp.asarray(kernel))
    put(("patch_embed", "proj", "bias"),
        jnp.asarray(np.asarray(sd["patch_embed.proj.bias"])))

    # tokens + pos embed (resized if grids differ)
    put(("cls_token",), jnp.asarray(np.asarray(sd["cls_token"])))
    if "dist_token" in sd and "dist_token" in p:
        put(("dist_token",), jnp.asarray(np.asarray(sd["dist_token"])))
    pos = jnp.asarray(np.asarray(sd["pos_embed"]))
    if pos.shape != p["pos_embed"].shape:
        from ..models.vit import resize_pos_embed

        num_extra = p["pos_embed"].shape[1] - model.num_patches
        new_grid = int(model.num_patches ** 0.5)
        pos = resize_pos_embed(pos, num_extra, new_grid)
    put(("pos_embed",), pos)

    # blocks
    depth = model.depth
    for i in range(depth):
        tp = f"blocks.{i}"
        dst = f"blocks_{i}"
        for ln in ("norm1", "norm2"):
            for k, v in _torch_ln(sd, f"{tp}.{ln}").items():
                put((dst, ln, k), v)
        for lin, dst_lin in (("attn.qkv", ("attn", "qkv")),
                             ("attn.proj", ("attn", "proj"))):
            for k, v in _torch_linear(sd, f"{tp}.{lin}").items():
                put((dst,) + dst_lin + (k,), v)
        if f"{tp}.mlp.fc1.weight" in sd:  # dense MLP
            for lin in ("fc1", "fc2"):
                for k, v in _torch_linear(sd, f"{tp}.mlp.{lin}").items():
                    put((dst, "mlp", lin, k), v)

    # final norm + heads
    for k, v in _torch_ln(sd, "norm").items():
        put(("norm", k), v)
    # timm pre-logits (Sequential fc+tanh — vision_transformer.py:744-755)
    if "pre_logits.fc.weight" in sd and "pre_logits" in p:
        for k, v in _torch_linear(sd, "pre_logits.fc").items():
            put(("pre_logits", k), v)
    for head in ("head", "head_dist"):
        if f"{head}.weight" in sd and head in p:
            hw = np.asarray(sd[f"{head}.weight"])
            if hw.shape[0] != p[head]["kernel"].shape[1]:
                if strict_heads:
                    raise ValueError(f"{head} class-count mismatch")
                # reference drops mismatched heads (main.py:542-548)
                continue
            for k, v in _torch_linear(sd, head).items():
                put((head, k), v)
    return p


def import_flax_npz(path: str, model, params):
    """Load an original jax-ViT ``.npz`` checkpoint (the format the reference's
    ``_load_weights`` reads, ``vision_transformer.py:888-1005``)."""
    w = np.load(path)

    def g(name):
        return jnp.asarray(w[name])

    p = jax.tree.map(lambda x: x, params)
    prefix = ""
    if "opt/target/embedding/kernel" in w:
        prefix = "opt/target/"

    emb = g(prefix + "embedding/kernel")  # (kh, kw, C, D)
    kh, kw, C, D = emb.shape
    p["patch_embed"]["proj"]["kernel"] = emb.reshape(kh * kw * C, D)
    p["patch_embed"]["proj"]["bias"] = g(prefix + "embedding/bias")
    p["cls_token"] = g(prefix + "cls")
    pos = g(prefix + "Transformer/posembed_input/pos_embedding")
    if pos.shape != p["pos_embed"].shape:
        from ..models.vit import resize_pos_embed

        num_extra = p["pos_embed"].shape[1] - model.num_patches
        pos = resize_pos_embed(pos, num_extra, int(model.num_patches ** 0.5))
    p["pos_embed"] = pos

    for i in range(model.depth):
        bp = f"{prefix}Transformer/encoderblock_{i}/"
        dst = p[f"blocks_{i}"]
        dst["norm1"]["scale"] = g(bp + "LayerNorm_0/scale")
        dst["norm1"]["bias"] = g(bp + "LayerNorm_0/bias")
        dst["norm2"]["scale"] = g(bp + "LayerNorm_2/scale")
        dst["norm2"]["bias"] = g(bp + "LayerNorm_2/bias")
        ap = bp + "MultiHeadDotProductAttention_1/"
        D_model = dst["attn"]["qkv"]["kernel"].shape[0]
        qkv_k = jnp.stack([
            g(ap + f"{n}/kernel").reshape(D_model, -1) for n in
            ("query", "key", "value")
        ], axis=1).reshape(D_model, -1)
        qkv_b = jnp.stack([
            g(ap + f"{n}/bias").reshape(-1) for n in ("query", "key", "value")
        ]).reshape(-1)
        dst["attn"]["qkv"]["kernel"] = qkv_k
        dst["attn"]["qkv"]["bias"] = qkv_b
        dst["attn"]["proj"]["kernel"] = g(ap + "out/kernel").reshape(-1, D_model)
        dst["attn"]["proj"]["bias"] = g(ap + "out/bias")
        mp = bp + "MlpBlock_3/"
        dst["mlp"]["fc1"]["kernel"] = g(mp + "Dense_0/kernel")
        dst["mlp"]["fc1"]["bias"] = g(mp + "Dense_0/bias")
        dst["mlp"]["fc2"]["kernel"] = g(mp + "Dense_1/kernel")
        dst["mlp"]["fc2"]["bias"] = g(mp + "Dense_1/bias")

    p["norm"]["scale"] = g(prefix + "Transformer/encoder_norm/scale")
    p["norm"]["bias"] = g(prefix + "Transformer/encoder_norm/bias")
    # representation (pre-logits) layer — reference _load_weights
    # vision_transformer.py:966-973 loads it only when both the model has it
    # and the checkpoint carries the tensors.
    if prefix + "pre_logits/kernel" in w and "pre_logits" in p:
        p["pre_logits"]["kernel"] = g(prefix + "pre_logits/kernel")
        p["pre_logits"]["bias"] = g(prefix + "pre_logits/bias")
    if prefix + "head/kernel" in w and "head" in p:
        hk = g(prefix + "head/kernel")
        if hk.shape == p["head"]["kernel"].shape:
            p["head"]["kernel"] = hk
            p["head"]["bias"] = g(prefix + "head/bias")
    return p
