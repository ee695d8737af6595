"""cfg1 LN-operand layout-copy experiments (VERDICT r3 #4; run on real TPU).

The r3 trace of deit-tiny b256 eval shows a 0.79 ms/fwd {2,1,0}->{2,0,1}
layout copy feeding the fused-LN pallas_call operand (BASELINE.md cfg1
table). r3 established the seam is NOT the proj->LN boundary (folding proj
into the MHA kernel left the copy in place and was itself slower). Variants
here probe the layout-assignment seam directly:

  base     — fused-LN eval forward (control; expect the copy in the trace).
             NOTE: since the r4 `profitable()` policy, ln_impl='auto' routes
             D=192 to XLA LN, so base/barrier pass ln_impl='fused'
             explicitly to keep measuring the fused-kernel graph this
             experiment is about.
  barrier  — fused LN + optimization_barrier between attn-proj and norm
             operand (pins the operand as a jit-internal value XLA may lay
             out differently)
  xla_ln   — ln_impl='xla': the production 'auto' choice at D=192 since r4
             (how much dropping the kernel + copy nets at this shape).

OUTCOME (r4 window, real v5e): base 12.355, xla_ln 10.356, barrier 13.079
ms/fwd — the barrier makes it WORSE and xla_ln wins 19%, which is why
`auto` now excludes non-128-aligned widths (ops/fused_ln.py::profitable).
A planned flat2d variant (feed the LN a (B*N, C) reshape) was never wired
into the model and is superseded by that policy fix.

Usage (TPU): python scripts/bench_ln_layout_r4.py [--reps 5] [--trace DIR]
Prints ms/fwd per variant; with --trace, writes a profiler trace per variant
for utils.profiling.summarize_trace.
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def _measure(fn, x, K=40, reps=5):
    @jax.jit
    def k_evals(x):
        def body(c, _):
            logits = fn(c)
            c = c + (logits.mean() * 0.0).astype(c.dtype)
            return c, logits[0, 0]

        c, outs = jax.lax.scan(body, x, None, length=K)
        return outs[-1]

    _ = float(k_evals(x))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(k_evals(x))
        times.append(time.perf_counter() - t0)
    return min(times) / K * 1e3  # ms per forward


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--trace", default="")
    args = p.parse_args()

    from slim_switch_moe_vit_tpu import create_model
    from slim_switch_moe_vit_tpu.train_state import create_train_state

    img = 224
    x = jnp.asarray(np.random.RandomState(0).randn(args.batch, img, img, 3),
                    jnp.bfloat16)

    variants = {}

    def add(name, **model_kwargs):
        model = create_model("deit_tiny_patch16_224", num_classes=1000,
                             img_size=img, dtype=jnp.bfloat16, **model_kwargs)
        state = create_train_state(model, (1, img, img, 3))
        variables = {"params": state.params}
        variants[name] = lambda c, m=model, v=variables: m.apply(
            v, c, deterministic=True)

    # explicit 'fused': the r4 auto policy routes D=192 to XLA LN, which
    # would otherwise make base/barrier measure the same graph as xla_ln
    add("base", ln_impl="fused")
    add("xla_ln", ln_impl="xla")
    # barrier: SSMV_LN_BARRIER=1 pins the LN pallas operand's layout at the
    # producer (models/layers.py reads the env at trace time) — probes
    # whether the {2,1,0}->{2,0,1} copy is assignment-driven or mandatory
    add("barrier", ln_impl="fused")

    import os

    for name, fn in variants.items():
        os.environ["SSMV_LN_BARRIER"] = "1" if name == "barrier" else "0"
        if args.trace:
            with jax.profiler.trace(f"{args.trace}/{name}"):
                ms = _measure(fn, x, reps=args.reps)
        else:
            ms = _measure(fn, x, reps=args.reps)
        print(f"{name:10s} {ms:7.3f} ms/fwd  "
              f"({args.batch / ms * 1e3:,.0f} img/s)")


if __name__ == "__main__":
    main()
