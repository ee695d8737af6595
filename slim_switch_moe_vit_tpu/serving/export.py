"""Model export + serving predictor (beyond-reference capability).

The reference has no deployment story: inference is ``main.py --eval`` inside
the training repo (``/root/reference/main.py:796``, ``engine.py:89``), which
needs the full model code, timm, and a torch checkpoint at serving time. This
module gives the rebuilt framework a real one, the TPU way:

- ``export_model`` serializes the *eval forward* (on-device normalize + model
  apply) as versioned StableHLO artifacts via ``jax.export`` — one artifact
  per batch bucket, because TPU serving wants static shapes (a bucket set
  replaces dynamic batch dims; XLA compiles each exactly once). The artifact
  directory is self-contained: serialized functions + an Orbax params payload
  + a JSON manifest.
- ``load_predictor`` reloads that directory in a fresh process **without the
  model code** and serves batched predictions: requests are chunked over the
  largest bucket and the tail is padded into the smallest bucket that fits.

Platform note: kernel selection (Pallas vs XLA paths) happens at trace time
by ``jax.default_backend()``, so an artifact is exported for the platform it
was traced on; ``jax.export`` then enforces that platform at call time. The
manifest records it so a mismatch is a clear error, not a silent mis-lower.
"""
from __future__ import annotations

import json
import os
import typing as typ

import jax
import jax.numpy as jnp
import numpy as np

SERVING_FORMAT_VERSION = 1
_MANIFEST = "manifest.json"
_PARAMS_DIR = "params"


def _fn_file(batch: int) -> str:
    return f"serve_b{batch}.stablehlo"


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _plain_tree(tree):
    """Normalize param containers to plain nested dicts of jnp arrays.

    The exported function's calling convention pins the input pytree
    STRUCTURE; flax may hand back FrozenDicts while Orbax restores plain
    dicts, so both export and load go through this canonical form."""
    if isinstance(tree, typ.Mapping):
        return {k: _plain_tree(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def make_serve_fn(model, with_preprocess: bool = True) -> typ.Callable:
    """The serving forward: (variables, images) -> logits.

    ``variables`` is ``{"params": ...}`` plus, for gated models (resmoe —
    learned token-skip thresholds live in a separate ``gates`` collection,
    mirroring the reference's buffer state), ``{"gates": ...}`` — the same
    collections the eval step feeds (``engine.make_eval_step``).

    With preprocessing, images are raw uint8 NHWC batches (what the data
    loader delivers) and the ImageNet normalize runs on device, fused into
    the export — the serving host does no float math. Without, images are
    already normalized arrays in the model's compute dtype.
    """
    if with_preprocess:
        from ..data.device_aug import build_eval_normalize

        normalize = build_eval_normalize(dtype=model.dtype)
    else:
        normalize = lambda x: x  # noqa: E731

    def serve(variables, images):
        return model.apply(variables, normalize(images), deterministic=True)

    return serve


def export_model(model, params, out_dir: str, *,
                 gates=None,
                 batch_sizes: typ.Sequence[int] = (1, 8, 32),
                 with_preprocess: bool = True,
                 model_name: str = "",
                 manifest_extra: typ.Optional[dict] = None) -> dict:
    """Serialize the eval forward for each batch bucket into ``out_dir``.

    Returns the manifest dict. ``params`` should be the weights to serve
    (pass the EMA shadow for a trained model — the reference evaluates the
    EMA copy too, ``/root/reference/main.py:884-891``). ``gates`` is the
    gate-threshold collection for gated (resmoe) models — required for
    them, exactly as the eval step requires it.
    """
    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive ints: {batch_sizes}")

    serve = make_serve_fn(model, with_preprocess=with_preprocess)
    img = int(model.img_size)
    in_dtype = jnp.uint8 if with_preprocess else model.dtype
    variables = {"params": _plain_tree(params)}
    if gates:
        variables["gates"] = _plain_tree(gates)
    v_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)

    from jax import export as jexport

    for b in batch_sizes:
        x_spec = jax.ShapeDtypeStruct((b, img, img, 3), in_dtype)
        exp = jexport.export(jax.jit(serve))(v_spec, x_spec)
        with open(os.path.join(out_dir, _fn_file(b)), "wb") as f:
            f.write(exp.serialize())

    _ckptr().save(os.path.join(out_dir, _PARAMS_DIR), variables, force=True)

    manifest = {
        "format_version": SERVING_FORMAT_VERSION,
        "model_name": model_name or type(model).__name__,
        "img_size": img,
        "num_classes": int(getattr(model, "num_classes", 0)),
        "compute_dtype": jnp.dtype(model.dtype).name,
        "input_dtype": jnp.dtype(in_dtype).name,
        "with_preprocess": bool(with_preprocess),
        "batch_sizes": batch_sizes,
        "platform": jax.default_backend(),
        "jax_version": jax.__version__,
    }
    if manifest_extra:
        manifest.update(manifest_extra)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class Predictor:
    """Bucketed-batch inference over a loaded export.

    ``predict`` accepts any request size: full buckets are dispatched at the
    largest exported batch; the tail pads up to the smallest bucket that
    fits (padding rows are sliced off the result). Each bucket compiles
    exactly once, on first use.
    """

    def __init__(self, fns: typ.Dict[int, typ.Callable], variables,
                 manifest: dict):
        self._fns = dict(fns)
        self._buckets = sorted(self._fns)
        variables = _plain_tree(variables)
        if "params" not in variables:  # bare param tree
            variables = {"params": variables}
        self._variables = variables
        self.manifest = dict(manifest)
        self._in_dtype = jnp.dtype(self.manifest["input_dtype"])

    @property
    def batch_sizes(self) -> typ.List[int]:
        return list(self._buckets)

    def _bucket_for(self, n: int) -> int:
        fits = [b for b in self._buckets if b >= n]
        return min(fits) if fits else self._buckets[-1]

    def predict(self, images: np.ndarray) -> np.ndarray:
        """images: (n, H, W, 3) in the manifest's input dtype convention
        (raw uint8 when the export carries preprocessing). Returns (n,
        num_classes) float32 logits."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        n = images.shape[0]
        if n == 0:
            return np.zeros((0, self.manifest["num_classes"]), np.float32)
        out = []
        i = 0
        while i < n:
            b = self._bucket_for(n - i)
            take = min(n - i, b)
            chunk = images[i:i + take]
            if take < b:
                pad = np.zeros((b - take,) + chunk.shape[1:], chunk.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            logits = self._fns[b](
                self._variables, jnp.asarray(chunk, self._in_dtype))
            out.append(np.asarray(logits, np.float32)[:take])
            i += take
        return np.concatenate(out, axis=0)

    def top_k(self, images: np.ndarray, k: int = 5):
        """Returns (classes (n,k) int, probs (n,k) float32) by softmax."""
        logits = self.predict(images)
        k = min(k, logits.shape[1])
        idx = np.argsort(-logits, axis=1)[:, :k]
        z = logits - logits.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        return idx, np.take_along_axis(p, idx, axis=1)


def load_predictor(path: str) -> Predictor:
    """Load an export directory. Needs only jax + orbax — no model code."""
    path = os.path.abspath(path)
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest["format_version"] > SERVING_FORMAT_VERSION:
        raise ValueError(
            f"artifact format {manifest['format_version']} is newer than "
            f"this library ({SERVING_FORMAT_VERSION})")
    if manifest["platform"] != jax.default_backend():
        raise ValueError(
            f"artifact was exported for platform '{manifest['platform']}' "
            f"but the current backend is '{jax.default_backend()}' — "
            "kernel lowering is platform-specific; re-export on this "
            "platform")

    from jax import export as jexport

    fns = {}
    for b in manifest["batch_sizes"]:
        with open(os.path.join(path, _fn_file(b)), "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        fns[b] = jax.jit(exp.call)
    params = _ckptr().restore(os.path.join(path, _PARAMS_DIR))
    return Predictor(fns, params, manifest)


# ---------------------------------------------------------------------------
# CLI: python -m slim_switch_moe_vit_tpu.serving.export ...
# ---------------------------------------------------------------------------

def _cli_parser():
    import argparse

    p = argparse.ArgumentParser(
        description="Export a model's eval forward as a serving artifact")
    p.add_argument("--model", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default="",
                   help="training checkpoint to serve (Orbax dir)")
    p.add_argument("--use-ema", action="store_true",
                   help="serve the EMA shadow from the checkpoint")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--batch-sizes", default="1,8,32")
    p.add_argument("--no-preprocess", action="store_true")
    return p


def main(argv=None):
    args = _cli_parser().parse_args(argv)
    from ..models import create_model
    from ..train_state import create_train_state

    model = create_model(args.model, num_classes=args.num_classes,
                         img_size=args.img_size,
                         dtype=jnp.dtype(args.dtype))
    state = create_train_state(model, (1, args.img_size, args.img_size, 3))
    params = _plain_tree(state.params)
    gates = _plain_tree(state.gates) if state.gates else None
    if args.checkpoint:
        raw = _ckptr().restore(os.path.abspath(args.checkpoint))
        if args.use_ema:
            tree = raw.get("ema_params")
            if tree is None:
                raise ValueError(
                    "--use-ema: checkpoint has no EMA shadow (trained "
                    "without --model-ema?) — refusing to silently serve "
                    "the raw weights")
        else:
            tree = raw["params"]
        tree = _plain_tree(tree)
        # template-free Orbax restore: validate against the model's skeleton
        ref_leaves = jax.tree.leaves(params)
        got_leaves = jax.tree.leaves(tree)
        if len(ref_leaves) != len(got_leaves):
            raise ValueError(
                f"checkpoint param tree has {len(got_leaves)} leaves; "
                f"model '{args.model}' expects {len(ref_leaves)}")
        # serve at a different resolution than the checkpoint was trained
        # at: bicubic pos-embed grid resize, same as the reference's
        # finetune path (/root/reference/main.py:550-571)
        if ("pos_embed" in tree and "pos_embed" in params
                and tree["pos_embed"].shape != params["pos_embed"].shape):
            from ..models.vit import resize_pos_embed

            num_extra = params["pos_embed"].shape[1] - model.num_patches
            tree["pos_embed"] = resize_pos_embed(
                jnp.asarray(tree["pos_embed"]), num_extra,
                int(model.num_patches ** 0.5))
        params = jax.tree.map(
            lambda r, g: jnp.asarray(g, r.dtype).reshape(r.shape),
            params, tree)
        if gates is not None and raw.get("gates"):
            gates = jax.tree.map(
                lambda r, g: jnp.asarray(g, r.dtype).reshape(r.shape),
                gates, _plain_tree(raw["gates"]))
    batch_sizes = [int(b) for b in args.batch_sizes.split(",") if b]
    manifest = export_model(
        model, params, args.output, gates=gates, batch_sizes=batch_sizes,
        with_preprocess=not args.no_preprocess, model_name=args.model,
        manifest_extra={"checkpoint": args.checkpoint})
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
