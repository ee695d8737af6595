"""Serving-path benchmark on the real chip: batch-1 latency + bucketed
throughput through the exported artifact (serving/export.py).

Prints one JSON line:
  {"model": ..., "batch1_p50_ms": ..., "batch1_p90_ms": ...,
   "throughput_images_per_sec_b256": ..., "export_s": ..., "load_s": ...}

Measurement notes (axon tunnel): every predict() already fetches the logits
to host (np.asarray), so each call is a genuine round-trip — batch-1 latency
INCLUDES the ~27 ms tunnel RTT, which dominates on this link; the throughput
line amortizes it over the largest bucket. Run on real serving hardware for
co-located numbers.

Usage: python scripts/bench_serving.py [model] [img]
"""
import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax.numpy as jnp

    from slim_switch_moe_vit_tpu import create_model
    from slim_switch_moe_vit_tpu.serving import export_model, load_predictor
    from slim_switch_moe_vit_tpu.train_state import create_train_state

    name = sys.argv[1] if len(sys.argv) > 1 else "deit_tiny_patch16_224"
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    buckets = (1, 32, 256)

    model = create_model(name, num_classes=1000, img_size=img,
                         dtype=jnp.bfloat16)
    state = create_train_state(model, (1, img, img, 3))

    d = tempfile.mkdtemp()
    t0 = time.perf_counter()
    export_model(model, state.params, d, batch_sizes=buckets,
                 model_name=name)
    export_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    pred = load_predictor(d)
    load_s = time.perf_counter() - t0

    rs = np.random.RandomState(0)
    one = rs.randint(0, 256, (1, img, img, 3)).astype(np.uint8)
    big = rs.randint(0, 256, (256, img, img, 3)).astype(np.uint8)

    pred.predict(one)  # compile b1
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        pred.predict(one)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()

    pred.predict(big)  # compile b256
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        pred.predict(big)
    thr = 256 * reps / (time.perf_counter() - t0)

    print(json.dumps({
        "model": name, "img": img,
        "batch1_p50_ms": round(lat[len(lat) // 2], 2),
        "batch1_p90_ms": round(lat[int(0.9 * (len(lat) - 1))], 2),
        "throughput_images_per_sec_b256": round(thr, 1),
        "export_s": round(export_s, 1), "load_s": round(load_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
