"""Host-pipeline bench: native C++ crop+resize vs the PIL fallback.

Measures the loader hot path the native tier exists for — per-sample
RandomResizedCrop-style crop + bicubic resize to 224 (the reference's torch
DataLoader workers do this in PIL, ``/root/reference/datasets.py:290-322``)
— as images/sec on this host, single-sample and threaded-batch. CPU-only;
safe to run without the TPU. Prints one JSON line per variant.

Usage: python scripts/bench_native_loader.py [--n 256] [--reps 5]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="images per rep")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()

    from PIL import Image

    from slim_switch_moe_vit_tpu.data.native_loader import (
        batch_crop_resize, crop_resize, native_available,
    )

    rs = np.random.RandomState(0)
    # typical ImageNet-ish source sizes; crops ~= RandomResizedCrop draws
    imgs = [rs.randint(0, 256, (rs.randint(256, 512), rs.randint(256, 512),
                                3), np.uint8) for _ in range(args.n)]
    crops = []
    for img in imgs:
        h, w = img.shape[:2]
        ch, cw = int(h * 0.7), int(w * 0.7)
        top, left = rs.randint(0, h - ch), rs.randint(0, w - cw)
        crops.append((top, left, ch, cw))
    crops_arr = np.asarray(crops, np.int32)

    def timed(fn):
        fn()  # warmup
        best = min(
            (lambda t0: (fn(), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(args.reps))
        return args.n / best

    def pil_run():
        for img, (top, left, ch, cw) in zip(imgs, crops):
            Image.fromarray(img).crop(
                (left, top, left + cw, top + ch)).resize(
                (args.size, args.size), Image.BICUBIC)

    results = {"pil_single_thread": timed(pil_run)}

    if native_available():
        def native_single():
            for img, (top, left, ch, cw) in zip(imgs, crops):
                crop_resize(img, top, left, ch, cw, args.size)

        results["native_single_thread"] = timed(native_single)
        for nt in (1, 2, 4):
            results[f"native_batch_threads{nt}"] = timed(
                lambda nt=nt: batch_crop_resize(imgs, crops_arr, args.size,
                                                num_threads=nt))
    else:
        print("# native lib not built (make -C native); PIL only",
              file=sys.stderr)

    for name, ips in results.items():
        print(json.dumps({
            "metric": f"host_crop_resize_images_per_sec_{name}",
            "value": round(ips, 1), "unit": "images/sec",
            "vs_baseline": (round(ips / results["pil_single_thread"], 3)
                            if name != "pil_single_thread" else 1.0),
        }), flush=True)


if __name__ == "__main__":
    main()
