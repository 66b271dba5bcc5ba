"""Chip-scale train-to-convergence on the learnable synthetic dataset.

The CI-scale recipe check lives in tests/test_convergence.py (tiny towers,
CPU, ~minutes).  This variant runs the same concept-structured data
(data/synthetic.py, learnable=True) through PRODUCTION-scale towers on the
real chip — flagship ViT-B/32 @ 384² + mBERT-base dims, bf16, fused flash
attention — so the full-size numerics (bf16 matmuls, Pallas kernels,
dropout, the 5-loss blend at reference weights) are exercised end-to-end
by an actual learning run, not just a timed step.

It validates the loop the reference trusts implicitly — per-epoch eval +
best-sumR selection (image_Retrieval_caption.py:441-504) — at full model
width: held-out test sumR must climb from ~chance toward its ceiling
(600 at 8 eval images: 6 recalls × 100, R@5/10 saturated).

Usage: python scripts/train_convergence_tpu.py [epochs] [--bf16-moments]
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

from leccr_tpu.config import LECCRConfig

EPOCHS = int(next((a for a in sys.argv[1:] if a.isdigit()), 12))


def main():
    from leccr_tpu.train.trainer import Trainer

    cfg = LECCRConfig()
    cfg.output_dir = tempfile.mkdtemp(prefix="leccr_conv_")
    cfg.model.vision.image_res = 384
    cfg.model.dtype = "bfloat16"
    cfg.model.text.fused_attention = True
    cfg.model.vision.fused_attention = True
    if "--bf16-moments" in sys.argv:
        cfg.train.optimizer.moment_dtype = "bfloat16"
    if "--ema" in sys.argv:
        # A/B harness for the ema_decay default: eval + best-gating run
        # on the EMA weights (train.ema_eval), so held-out sumR compares
        # EMA quality directly against the raw-params baseline (--ema 0)
        cfg.train.ema_decay = float(sys.argv[sys.argv.index("--ema") + 1])
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_learnable = True
    cfg.data.synthetic_size = 64
    cfg.data.synthetic_eval_images = 8
    cfg.data.synthetic_captions_per_image = 2
    cfg.data.num_workers = 2
    cfg.data.token_buckets = [16]
    cfg.data.max_tokens = 16
    cfg.train.batch_size_train = 16
    cfg.train.batch_size_test = 8
    cfg.train.batch_size_test_text = 16
    cfg.train.schedular.epochs = EPOCHS
    # full-width towers move slower per step than the tiny CI config at
    # lr 1e-3; 1e-4 converges on this corpus without destabilizing bf16
    cfg.train.optimizer.lr = 1e-4
    cfg.parallel.data = 1

    t0 = time.time()
    trainer = Trainer(cfg, devices=jax.devices()[:1])
    last = trainer.fit()
    final = float(last["de_test_sumr_sum"])
    best = trainer.ckpt.best_info()
    print(f"finished {EPOCHS} epochs in {time.time()-t0:.0f}s; "
          f"final test sumR={final:.1f} (ceiling 600), "
          f"best={best['metrics']['sumr_sum'] if best else None}")
    if final < 580.0:
        print("WARNING: did not reach the 580 convergence bar — "
              "inspect log.txt; more epochs may be needed at this lr")


if __name__ == "__main__":
    main()
