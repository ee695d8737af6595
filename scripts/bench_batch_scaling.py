"""Flagship batch-scaling sweep: img/s at b128/b256/b512 x layout {256,512}.

VERDICT r4 #3: the 512-row dropless layout's fixed padding
(E*(512-256) rows) is +4.4% of rows at b128 — measured net-zero there —
but dilutes with batch size while the 512-row backward's 7.7%/row dw win
does not. This sweep measures the crossover on silicon so
``ops/moe.py::layout_rows_policy`` can pick per T*k.

One TPU process at a time; ~6 configs x (compile + 3 reps). Prints one
JSON line per (batch, layout) and a policy recommendation at the end.

Usage (TPU): python scripts/bench_batch_scaling.py [--batches 128,256,512]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (repo-root bench harness; sets the compile cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,256,512")
    ap.add_argument("--layouts", default="256,512")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    results = {}
    for batch in [int(b) for b in args.batches.split(",")]:
        # keep each timed span ~3-5 s: 40 steps at b128, fewer at larger b
        K = max(10, 40 * 128 // batch)
        for layout in [int(l) for l in args.layouts.split(",")]:
            os.environ["SSMV_LAYOUT_ROWS"] = str(layout)
            try:
                ips = bench._measure_train("moe_small_patch16_224_expert8",
                                           batch=batch, K=K, reps=args.reps)
            except Exception as e:  # noqa: BLE001 - print and continue
                print(f"# b{batch}/l{layout} failed: {e}", file=sys.stderr)
                continue
            finally:
                os.environ.pop("SSMV_LAYOUT_ROWS", None)
            tk = batch * 197 * 2
            results[(batch, layout)] = ips
            print(json.dumps({
                "metric": f"train_images_per_sec_vit_s16_switch8e_224_bf16_"
                          f"b{batch}_layout{layout}",
                "value": round(ips, 2), "unit": "images/sec",
                "vs_baseline": None,
                "detail": f"T*k={tk}, step={batch / ips * 1000:.2f} ms",
            }), flush=True)

    for batch in sorted({b for b, _ in results}):
        pair = {l: results.get((batch, l)) for l in (256, 512)}
        if pair[256] and pair[512]:
            win = 512 if pair[512] > pair[256] else 256
            print(f"# b{batch}: layout {win} wins "
                  f"({pair[512] / pair[256] - 1:+.2%} for 512)", flush=True)


if __name__ == "__main__":
    main()
