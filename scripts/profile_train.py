"""Train-step throughput on the real chip: flagship Multi30K config
(ViT-B/32 @ 384² + mBERT-base, global batch configurable).  Reports
image-text pairs/sec/chip — the BASELINE.json tracked training metric."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

import jax.numpy as jnp
import numpy as np

from leccr_tpu.config import LECCRConfig
from leccr_tpu.data.images import preprocess_train_images
from leccr_tpu.models.leccr import LECCRModel
from leccr_tpu.models.losses import compute_losses
from leccr_tpu.train.optim import build_optimizer
from leccr_tpu.train.schedule import linear_warmup_decay

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
WIDTH = 64  # token bucket
RES, VOCAB = 384, 119547


def main():
    cfg = LECCRConfig()
    cfg.model.vision.image_res = RES
    cfg.model.dtype = "bfloat16"
    cfg.model.scan_layers = "--scan" in sys.argv
    cfg.model.remat = cfg.model.scan_layers or "--remat" in sys.argv
    if "--fused" in sys.argv:
        cfg.model.text.fused_attention = True
        cfg.model.vision.fused_attention = True
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    batch = {
        "vision": rs.randint(0, 255, (BS, RES, RES, 3)).astype(np.uint8),
        "flip": rs.rand(BS) < 0.5,
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
        {k: v for k, v in batch.items() if k not in ("idx", "flip")})["params"]
    print(f"init {time.time()-t0:.1f}s; params "
          f"{sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M")
    sched = linear_warmup_decay(1e-5, 10000, 0.1)
    tx = build_optimizer(cfg.train.optimizer, params, sched)
    opt_state = tx.init(params)

    mc = cfg.model

    def step(params, opt_state, batch, rng):
        idx = batch.pop("idx")
        flip = batch.pop("flip")

        def loss_fn(p):
            mb = dict(batch)
            mb["vision"] = preprocess_train_images(mb["vision"], flip)
            emb = model.apply({"params": p}, mb, deterministic=False,
                              rngs={"dropout": rng})
            losses = compute_losses(
                emb, idx, weight_caption_loss=mc.weight_caption_loss,
                weight_reg_loss=mc.weight_reg_loss,
                weight_dstl_loss=mc.weight_dstl_loss,
                weight_cv_loss=mc.weight_cv_loss)
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses

    jstep = jax.jit(step, donate_argnums=(0, 1))
    rng = jax.random.key(0, impl=cfg.train.rng_impl)
    # XLA's own FLOP count for the step -> measured MFU below
    try:
        cost = jstep.lower(params, opt_state, dict(batch),
                           rng).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
    except Exception:
        step_flops = 0.0
    t0 = time.time()
    params, opt_state, losses = jstep(params, opt_state, dict(batch), rng)
    # value fetch = real barrier (block_until_ready is lazy over the
    # axon tunnel)
    _ = float(losses["total"])
    print(f"compile+first step: {time.time()-t0:.1f}s")
    n = 10
    t0 = time.time()
    for i in range(n):
        params, opt_state, losses = jstep(params, opt_state, dict(batch),
                                          jax.random.fold_in(rng, i))
    _ = float(losses["total"])
    dt = (time.time() - t0) / n
    print(f"step (incl. host->device transfer): {dt*1000:.1f} ms  -> "
          f"{BS/dt:.1f} pairs/s/chip (bs={BS}, tokens={WIDTH})")

    # compute-only: batch resident on device (the trainer overlaps transfer
    # with compute via async dispatch + prefetch)
    dev_batch = jax.device_put(dict(batch))
    params, opt_state, losses = jstep(params, opt_state, dict(dev_batch), rng)
    _ = float(losses["total"])
    t0 = time.time()
    for i in range(n):
        params, opt_state, losses = jstep(params, opt_state, dict(dev_batch),
                                          jax.random.fold_in(rng, i))
    _ = float(losses["total"])
    dt = (time.time() - t0) / n
    print(f"step (device-resident batch): {dt*1000:.1f} ms  -> "
          f"{BS/dt:.1f} pairs/s/chip")
    if step_flops:
        achieved = step_flops / dt
        peak = 197e12  # TPU v5e bf16 peak
        print(f"XLA-counted step FLOPs: {step_flops/1e12:.2f} TF  -> "
              f"{achieved/1e12:.1f} TF/s achieved, "
              f"MFU {100*achieved/peak:.1f}% of v5e bf16 peak")
    print({k: float(v) for k, v in losses.items() if k.startswith('loss')})


if __name__ == "__main__":
    main()
