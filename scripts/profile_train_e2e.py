#!/usr/bin/env python3
"""Host-fed sustained training, end to end on one chip.

Every train-step headline so far (578 pairs/s/chip, bs128 fused,
docs/DESIGN.md phase 3) times a device-resident batch: the host loop —
JPEG decode → RandomResizedCrop → tokenized collate → host-to-device
transfer — never runs during the timed window.  The reference's regime
is the opposite: its DataLoader workers sit on the step's critical path
(image_Retrieval_caption.py:42-61 iterates a torchvision loader
per step).  This script measures OUR composed regime: the production
Trainer + TrainLoader (offline native tokenization, threaded decode,
`fast_decode` DCT-prescaled JPEG path, async device_prefetch) feeding
≥200 consecutive steps of the flagship model from a reference-layout
JPEG corpus on disk, and reports

  - sustained image-text pairs/s/chip (epochs after the compile epoch),
  - occupancy vs the device-resident ceiling (--ceiling, default the
    BENCH-recorded 578.1), i.e. how much of the chip's demand the host
    pipeline actually holds.

Caveat this host: a single schedulable core (docs/DESIGN.md "Input
pipeline" — ~5 cores of fast_decode feed one chip), so the number here
is a 1-core floor for the host leg, not a production projection; the
measurement still proves the overlap architecture (wall ≈
max(loader, chip), not their sum) and records the composed number the
device-resident headline must be discounted by on a given host.

    python scripts/profile_train_e2e.py [--steps 200] [--bs 128]
        [--src 480] [--workers 8] [--no-fast] [--ceiling 578.1]
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
    ap.add_argument("--steps", type=int, default=200,
                    help="minimum consecutive measured steps (after one "
                         "warmup/compile epoch)")
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--epoch_steps", type=int, default=20,
                    help="steps per epoch (corpus = epoch_steps*bs JPEGs)")
    ap.add_argument("--src", type=int, default=480,
                    help="source JPEG resolution on disk (train crop 384)")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--no-fast", action="store_true",
                    help="disable data.fast_decode (pure-PIL exact path)")
    ap.add_argument("--ceiling", type=float, default=578.1,
                    help="device-resident pairs/s/chip to report occupancy "
                         "against (BENCH_r05 train value)")
    ap.add_argument("--root", default=None,
                    help="reuse an existing corpus dir (skips generation)")
    args = ap.parse_args()

    from leccr_tpu.config import LECCRConfig
    from leccr_tpu.data.synthetic import make_image_dataset
    from leccr_tpu.train.trainer import Trainer

    n_train = args.epoch_steps * args.bs
    epochs = 1 + -(-args.steps // args.epoch_steps)  # warmup + measured

    root = args.root or tempfile.mkdtemp(prefix="leccr_e2e_corpus_")
    if not os.path.isdir(os.path.join(root, "images")):
        t0 = time.perf_counter()
        make_image_dataset(root, n_train=n_train, n_eval=8,
                           caps_per_image=1, image_res=args.src, seed=0)
        sizes = [os.path.getsize(os.path.join(root, "images", f))
                 for f in sorted(os.listdir(os.path.join(root, "images")))[:64]]
        print(f"corpus: {n_train} noise JPEGs @{args.src}px "
              f"(mean {np.mean(sizes)/1024:.0f} KiB, worst-case decode) "
              f"in {time.perf_counter()-t0:.0f}s -> {root}", flush=True)
    cfg = LECCRConfig()
    cfg.output_dir = tempfile.mkdtemp(prefix="leccr_e2e_out_")
    cfg.model.vision.image_res = 384
    cfg.model.dtype = "bfloat16"
    cfg.model.text.fused_attention = True
    cfg.model.vision.fused_attention = True
    d = cfg.data
    d.dataset = "multi30k"
    d.root_dir = root
    d.train_file = ["TextData/train_enc.caption.txt",
                    "TextData/train_enc2de.caption.txt"]
    d.val_file = {"de": "TextData/val_enc.caption.txt"}
    d.test_file = {"de": "TextData/test_enc.caption.txt"}
    d.image_root = os.path.join(root, "images")
    d.generated_caption_dir = os.path.join(root, "caption")
    d.text_vocab = os.path.join(root, "vocab.txt")
    # flagship token bucket: Multi30K captions bucket to 64 (bench.py)
    d.max_tokens = 64
    d.token_buckets = [64]
    d.num_workers = args.workers
    d.fast_decode = not args.no_fast
    cfg.train.batch_size_train = args.bs
    cfg.train.schedular.epochs = epochs
    cfg.train.log_every = 10
    cfg.parallel.data = 1

    t0 = time.perf_counter()
    tr = Trainer(cfg)
    print(f"trainer built in {time.perf_counter()-t0:.0f}s "
          f"(offline tokenization included); steps/epoch "
          f"{tr.steps_per_epoch}", flush=True)
    assert tr.steps_per_epoch == args.epoch_steps, tr.steps_per_epoch

    walls = []
    for e in range(epochs):
        t0 = time.perf_counter()
        tr.train_epoch(e)
        walls.append(time.perf_counter() - t0)
        rate = args.epoch_steps * args.bs / walls[-1]
        print(f"epoch {e}: {walls[-1]:.1f}s = {rate:.1f} pairs/s"
              + ("  (warmup/compile, excluded)" if e == 0 else ""),
              flush=True)

    measured_steps = (epochs - 1) * args.epoch_steps
    total = sum(walls[1:])
    rate = measured_steps * args.bs / total
    occ = rate / args.ceiling
    print(json.dumps({
        "metric": "train_pairs_per_sec_per_chip_host_fed",
        "value": round(rate, 1),
        "unit": f"image-text pairs/s/chip sustained, host pipeline on the "
                f"critical path ({measured_steps} steps, bs{args.bs}, "
                f"src {args.src}px JPEG -> 384 crop, "
                f"{'fast' if d.fast_decode else 'exact'}_decode, "
                f"{args.workers} decode threads, "
                f"{os.cpu_count()} visible / 1 schedulable core)",
        "occupancy_vs_device_resident": round(occ, 3),
        "ceiling_pairs_per_sec": args.ceiling,
    }))


if __name__ == "__main__":
    main()
