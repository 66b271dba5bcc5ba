#!/usr/bin/env python3
"""Host input-pipeline throughput: JPEG decode + RandomResizedCrop + collate.

The flagship train step consumes bs128 in ~221.6 ms = ~578 imgs/s per chip
(docs/STATUS.md); the reference instead spends this budget in torchvision
DataLoader workers (dataset/__init__.py transforms).  This measures whether
TrainLoader's thread-pool decode path sustains the chip's demand — if the
host is the bottleneck, the MFU number is fiction at production scale.

Synthetic noise JPEGs are a CONSERVATIVE proxy: noise maximizes JPEG entropy,
so real photographs decode faster than what is measured here.

    python scripts/profile_pipeline.py [--bs 128] [--n 2048] [--src 480]
        [--res 224] [--workers 4 8 16 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--n", type=int, default=2048,
                    help="train images (one epoch is n/bs batches)")
    ap.add_argument("--src", type=int, default=480,
                    help="source JPEG resolution on disk")
    ap.add_argument("--res", type=int, default=224,
                    help="crop/train resolution")
    ap.add_argument("--workers", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--chip_imgs_per_sec", type=float, default=577.7,
                    help="the train step's consumption rate to beat "
                         "(bs128 fused, docs/STATUS.md)")
    args = ap.parse_args()

    from leccr_tpu.data.datasets import ImageTrainDataset
    from leccr_tpu.data.pipeline import TrainLoader
    from leccr_tpu.data.synthetic import make_image_dataset
    from leccr_tpu.data.tokenizers import WordPieceTokenizer

    with tempfile.TemporaryDirectory(prefix="leccr_pipe_") as root:
        t0 = time.perf_counter()
        data = make_image_dataset(root, n_train=args.n, n_eval=8,
                                  caps_per_image=1, image_res=args.src,
                                  seed=0)
        gen_s = time.perf_counter() - t0
        sizes = [os.path.getsize(os.path.join(root, "images", f))
                 for f in os.listdir(os.path.join(root, "images"))[:64]]
        print(f"dataset: {args.n} JPEGs @{args.src}px "
              f"(mean {np.mean(sizes) / 1024:.0f} KiB, noise = worst-case "
              f"decode), generated in {gen_s:.1f}s")

        tok = WordPieceTokenizer(data.text_vocab, lowercase=data.lowercase)
        ncpu = len(os.sched_getaffinity(0))
        print(f"host cpus: {ncpu} (thread scaling is bounded by this; "
              "production TPU-VM hosts have 100-240)")

        results = {}
        for fast in (False, True):
            data.fast_decode = fast
            ds = ImageTrainDataset(data, args.res)
            label = "fast_decode" if fast else "exact"
            for w in args.workers:
                loader = TrainLoader(ds, tok, data, batch_size=args.bs,
                                     num_workers=w)
                it = loader.epoch(0)
                next(it)  # warm the pool / fill the queue
                t0 = time.perf_counter()
                nb = 0
                for _ in it:
                    nb += 1
                dt = time.perf_counter() - t0
                rate = nb * args.bs / dt
                results[(label, w)] = rate
                print(f"{label:11s} workers={w:3d}: {rate:8.1f} imgs/s "
                      f"({dt / nb * 1000:6.1f} ms/batch @bs{args.bs}, "
                      f"{dt / nb / args.bs * 1000 * min(w, ncpu):5.2f} "
                      f"core-ms/img) "
                      f"-> {rate / args.chip_imgs_per_sec:5.2f}x chip demand")

        (label, best_w) = max(results, key=results.get)
        print(json.dumps({
            "metric": "host_pipeline_imgs_per_sec",
            "value": round(results[(label, best_w)], 1),
            "unit": "imgs/s",
            "mode": label,
            "workers": best_w,
            "host_cpus": ncpu,
            "vs_chip_demand": round(results[(label, best_w)]
                                    / args.chip_imgs_per_sec, 2),
        }))


if __name__ == "__main__":
    main()
