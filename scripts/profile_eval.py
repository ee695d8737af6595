"""Profile the dense eval forward (BASELINE cfg1: deit_tiny, b256, bf16) on
the real chip; print the per-op table (VERDICT r2 #3 — cfg1 was the worst
artifact ratio with no floor decomposition).

Usage: python scripts/profile_eval.py [model] [batch] [K]
"""
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from slim_switch_moe_vit_tpu import create_model
    from slim_switch_moe_vit_tpu.train_state import create_train_state
    from slim_switch_moe_vit_tpu.utils.profiling import trace, summarize_trace

    name = sys.argv[1] if len(sys.argv) > 1 else "deit_tiny_patch16_224"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    img = 224

    model = create_model(name, num_classes=1000, img_size=img,
                         dtype=jnp.bfloat16)
    state = create_train_state(model, (1, img, img, 3))
    variables = {"params": state.params}
    x = jnp.asarray(np.random.RandomState(0).randn(batch, img, img, 3),
                    jnp.float32)

    # variables as a jit argument, not a closure: baked-in constants push
    # the serialized program past the axon remote_compile body limit for
    # ≥base-sized models (bench.py::_measure_eval has the same note).
    @jax.jit
    def k_evals(variables, x):
        def body(c, _):
            logits = model.apply(variables, c, deterministic=True)
            c = c + logits.mean() * 0.0
            return c, logits[0, 0]

        c, outs = jax.lax.scan(body, x, None, length=K)
        return outs[-1]

    _ = float(k_evals(variables, x))
    t0 = time.perf_counter()
    _ = float(k_evals(variables, x))
    dt = time.perf_counter() - t0
    print(f"{batch * K / dt:.1f} img/s  ({dt / K * 1000:.3f} ms/forward)")

    with tempfile.TemporaryDirectory() as td:
        with trace(td):
            _ = float(k_evals(variables, x))
        rows = summarize_trace(td, top=30, steps=K)
    for ms, n, label in rows:
        print(f"{ms:9.3f}  {n:6d}  {label}")


if __name__ == "__main__":
    main()
