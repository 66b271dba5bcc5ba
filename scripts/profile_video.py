"""Video-retrieval train-step throughput on the real chip (BASELINE.json
config #4): MSR-VTT-scale model — 4096-d precomputed frame features through
the 1-layer temporal tower + mBERT-base text/caption towers, num_queries 2
(reference configs/cclm-base-ft/Retrieval_msrvtt.yaml:27-50).  Reports
video-text pairs/sec/chip.

Usage: python scripts/profile_video.py [batch] [--frames N] [--gc M]
                                       [--bf16-moments]

--gc M runs GradCache (trainer._grad_cache_grads): two-pass exact
gradients over M microbatches, bounding tower-activation HBM at bs/M —
the single-chip path to the reference's global bs128 (dense bs128
exceeds one chip's HBM; DESIGN.md).  --bf16-moments halves optimizer
state traffic (OptimConfig.moment_dtype).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

import numpy as np
import optax

from leccr_tpu.config import LECCRConfig
from leccr_tpu.models.leccr import LECCRModel
from leccr_tpu.models.losses import compute_losses
from leccr_tpu.train.optim import build_optimizer
from leccr_tpu.train.schedule import linear_warmup_decay

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
FRAMES = (int(sys.argv[sys.argv.index("--frames") + 1])
          if "--frames" in sys.argv else 32)
GC = int(sys.argv[sys.argv.index("--gc") + 1]) if "--gc" in sys.argv else 0
WIDTH = 64  # token bucket
VOCAB = 119547  # mBERT


def main():
    cfg = LECCRConfig()
    m = cfg.model
    m.vision.kind = "temporal"
    m.vision.frame_feat_dim = 4096
    m.vision.num_layers = 1
    m.vision.num_heads = 8
    m.vision.max_frames = FRAMES
    m.num_queries = 2
    m.caption_ca_layer = 2
    m.caption_interaction_layer = 2
    m.video_cv_mask_frames = False  # reference unmasked frame mean
    m.dtype = "bfloat16"
    if "--bf16-moments" in sys.argv:
        cfg.train.optimizer.moment_dtype = "bfloat16"
    model = LECCRModel(m)

    rs = np.random.RandomState(0)
    n_valid = rs.randint(FRAMES // 2, FRAMES + 1, BS)
    mask = (np.arange(FRAMES)[None, :] < n_valid[:, None])
    batch = {
        "vision": rs.randn(BS, FRAMES, 4096).astype(np.float32),
        "vision_mask": mask,
        "text_ids_s": rs.randint(1, VOCAB, (BS, WIDTH)).astype(np.int32),
        "text_mask_s": np.ones((BS, WIDTH), np.int32),
        "text_ids_t": rs.randint(1, VOCAB, (BS, WIDTH)).astype(np.int32),
        "text_mask_t": np.ones((BS, WIDTH), np.int32),
        "caption_ids": rs.randint(1, VOCAB, (BS, WIDTH)).astype(np.int32),
        "caption_mask": np.ones((BS, WIDTH), np.int32),
        "idx": np.arange(BS, dtype=np.int32),
    }
    t0 = time.time()
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {k: v for k, v in batch.items() if k != "idx"})["params"]
    print(f"init {time.time()-t0:.1f}s; params "
          f"{sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M "
          f"(bs={BS}, frames={FRAMES}"
          + (f", GradCache m={GC}" if GC > 1 else "") + ")")
    sched = linear_warmup_decay(1e-5, 10000, 0.1)
    tx = build_optimizer(cfg.train.optimizer, params, sched)
    opt_state = tx.init(params)

    def step(params, opt_state, batch, rng):
        idx = batch.pop("idx")

        def forward(p, mb_in, fl, k):
            drop = rng if k is None else jax.random.fold_in(rng, k)
            return model.apply({"params": p}, mb_in, deterministic=False,
                               rngs={"dropout": drop})

        def loss_from_emb(emb):
            # video loss wiring mirrors trainer.py: cv loss is LOCAL
            losses = compute_losses(
                emb, idx, weight_caption_loss=m.weight_caption_loss,
                weight_reg_loss=m.weight_reg_loss,
                weight_dstl_loss=m.weight_dstl_loss,
                weight_cv_loss=m.weight_cv_loss,
                cv_loss_local=True)
            return losses["total"], losses

        if GC > 1:
            from leccr_tpu.train.trainer import _grad_cache_grads

            losses, grads = _grad_cache_grads(
                forward, loss_from_emb, params, batch, None, GC)
        else:
            (_, losses), grads = jax.value_and_grad(
                lambda p: loss_from_emb(forward(p, batch, None, None)),
                has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses

    jstep = jax.jit(step, donate_argnums=(0, 1))
    rng = jax.random.key(0, impl=cfg.train.rng_impl)
    try:
        cost = jstep.lower(params, opt_state, dict(batch),
                           rng).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
    except Exception:
        step_flops = 0.0
    t0 = time.time()
    params, opt_state, losses = jstep(params, opt_state, dict(batch), rng)
    _ = float(losses["total"])  # value fetch = real barrier over the tunnel
    print(f"compile+first step: {time.time()-t0:.1f}s")

    dev_batch = jax.device_put(dict(batch))
    n = 10
    params, opt_state, losses = jstep(params, opt_state, dict(dev_batch), rng)
    _ = float(losses["total"])
    t0 = time.time()
    for i in range(n):
        params, opt_state, losses = jstep(params, opt_state, dict(dev_batch),
                                          jax.random.fold_in(rng, i))
    _ = float(losses["total"])
    dt = (time.time() - t0) / n
    print(f"step (device-resident batch): {dt*1000:.1f} ms  -> "
          f"{BS/dt:.1f} video-text pairs/s/chip")
    if step_flops:
        achieved = step_flops / dt
        print(f"XLA-counted step FLOPs: {step_flops/1e12:.2f} TF  -> "
              f"{achieved/1e12:.1f} TF/s achieved")
    print({k: float(v) for k, v in losses.items() if k.startswith('loss')})


if __name__ == "__main__":
    main()
