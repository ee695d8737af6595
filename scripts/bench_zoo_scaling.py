"""Model-scaling sweep on one real v5e chip (r5 final session).

The five graded configs all use tiny/small backbones; this sweep shows the
zoo scales to the larger registrations (reference
``models/vision_transformer.py:1083-1490``) — eval throughput tiny->large
plus a deit_base train step — each with its bf16 MXU roofline for context
(eval rooflines at 100% MXU on forward FLOPs; like the cfg1 analysis in
BASELINE.md, sub-256 widths cap real lane fill well below that, so ratios
are NOT comparable across widths and are printed as context, not graded).

Run:  python scripts/bench_zoo_scaling.py            (one TPU process at a
time; ~10 min incl. compiles, cached afterwards via the repo .xla_cache)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the scanned-eval / per-step-train harness)
from slim_switch_moe_vit_tpu.ops.flops import vit_flops  # noqa: E402

PEAK = bench.PEAK

EVAL = [
    # (model, batch, dim, depth) — batch halves as params 4x; all fit 16 GB
    ("deit_tiny_patch16_224", 256, 192, 12),
    ("deit_small_patch16_224", 128, 384, 12),
    ("deit_base_patch16_224", 64, 768, 12),
    ("vit_large_patch16_224", 32, 1024, 24),
]


def main():
    rows = []
    for name, batch, dim, depth in EVAL:
        ips = bench._measure_eval(name, batch=batch, K=20, reps=3)
        fwd = vit_flops(1, 224, 16, dim, depth)
        rows.append({"model": name, "mode": "eval", "batch": batch,
                     "images_per_sec": round(ips, 1),
                     "mxu_roofline_ips": round(PEAK / fwd, 1)})
        print(json.dumps(rows[-1]))

    t0 = time.perf_counter()
    ips = bench._measure_train("deit_base_patch16_224", batch=64, K=20,
                               reps=3)
    rows.append({"model": "deit_base_patch16_224", "mode": "train",
                 "batch": 64, "images_per_sec": round(ips, 1),
                 "mxu_roofline_ips": round(
                     bench._roofline_train_ips(vit_flops(1, 224, 16, 768,
                                                         12)), 1),
                 "wall_s": round(time.perf_counter() - t0, 1)})
    print(json.dumps(rows[-1]))
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
