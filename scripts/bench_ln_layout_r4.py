"""cfg1 LN-operand layout-copy experiments (VERDICT r3 #4; run on real TPU).

The r3 trace of deit-tiny b256 eval shows a 0.79 ms/fwd {2,1,0}->{2,0,1}
layout copy feeding the fused-LN pallas_call operand (BASELINE.md cfg1
table). r3 established the seam is NOT the proj->LN boundary (folding proj
into the MHA kernel left the copy in place and was itself slower). Variants
here probe the layout-assignment seam directly:

  base     — production eval forward (control; expect the copy in the trace)
  barrier  — optimization_barrier between attn-proj and norm operand (pins
             the operand as a jit-internal value XLA may lay out differently)
  flat2d   — run the model with fused-LN consuming (B*N, C) via reshape
             (the GEMM producer is (B*N, C) internally; if XLA elides both
             reshapes no rank-3 layout choice exists at the seam). NOTE the
             TRAIN-shape 2-D variant cost 1.4 ms in copies at b128 (ledger);
             eval b256/tiny may differ — measure, don't assume.
  xla_ln   — ln_impl='xla' control: how much the copy + kernel win nets vs
             plain XLA LN at this shape.

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

    add("base")
    add("xla_ln", ln_impl="xla")
    # barrier: SSMV_LN_BARRIER=1 pins the LN pallas operand's layout at the
    # producer (models/layers.py reads the env at trace time) — probes
    # whether the {2,1,0}->{2,0,1} copy is assignment-driven or mandatory
    add("barrier")

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
