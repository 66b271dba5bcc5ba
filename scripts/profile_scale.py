"""Per-chip step measurement for the scale_vitl_32k config (BASELINE.json
config #5): ViT-L/14 @336 + XLM-R-large towers at a per-chip batch slice.

One chip cannot run the 32k global batch or the ICI ring; what it CAN
measure honestly is the per-chip tower+head+optimizer cost at the per-chip
batch (32k global / N chips), which dominates the step.  The ring-loss cost
is measured separately by scripts/validate_pallas_tpu.py (fused InfoNCE
blocks) and scales O(B_local x B_global / block) with ppermute latency
overlapped.  docs/STATUS.md records the composed projection.

Usage: python scripts/profile_scale.py [per_chip_batch] [--no-remat]
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
from leccr_tpu.data.images import preprocess_train_images
from leccr_tpu.models.leccr import LECCRModel
from leccr_tpu.models.losses import compute_losses
from leccr_tpu.train.optim import build_optimizer
from leccr_tpu.train.schedule import linear_warmup_decay

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
WIDTH = 64  # token bucket of the scale config
RES, VOCAB = 336, 250002


def main():
    cfg = LECCRConfig()
    m = cfg.model
    m.vision.variant = "ViT-L/14"
    m.vision.image_res = RES
    m.text.kind = "xlmr"
    m.text.vocab_size = VOCAB
    m.text.hidden_size = 1024
    m.text.num_layers = 24
    m.text.num_heads = 16
    m.text.intermediate_size = 4096
    m.text.type_vocab_size = 1
    m.caption_ca_layer = 3
    m.caption_interaction_layer = 2
    m.dtype = "bfloat16"
    m.remat = "--no-remat" not in sys.argv
    if "--fused" in sys.argv or "--fused-text" in sys.argv:
        m.text.fused_attention = True
        # 577 tokens -> chunked/tiled kernels; measured SLOWER than XLA at
        # ViT-L under remat (1462.8 vs 885 ms @ bs32) — see DESIGN.md
        m.vision.fused_attention = "--fused" in sys.argv
    model = LECCRModel(m)

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
    n_par = sum(x.size for x in jax.tree.leaves(params))
    print(f"init {time.time()-t0:.1f}s; params {n_par/1e6:.1f}M "
          f"(remat={m.remat})")
    sched = linear_warmup_decay(1e-5, 10000, 0.1)
    tx = build_optimizer(cfg.train.optimizer, params, sched)
    opt_state = tx.init(params)

    def step(params, opt_state, batch, rng):
        idx = batch.pop("idx")
        flip = batch.pop("flip")

        def loss_fn(p):
            mb = dict(batch)
            mb["vision"] = preprocess_train_images(mb["vision"], flip)
            emb = model.apply({"params": p}, mb, deterministic=False,
                              rngs={"dropout": rng})
            losses = compute_losses(
                emb, idx, weight_caption_loss=m.weight_caption_loss,
                weight_reg_loss=m.weight_reg_loss,
                weight_dstl_loss=m.weight_dstl_loss,
                weight_cv_loss=m.weight_cv_loss)
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
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
    dev = jax.device_put(dict(batch))
    t0 = time.time()
    params, opt_state, losses = jstep(params, opt_state, dict(dev), rng)
    _ = float(losses["total"])
    print(f"compile+first step: {time.time()-t0:.1f}s")
    n = 5
    t0 = time.time()
    for i in range(n):
        params, opt_state, losses = jstep(params, opt_state, dict(dev),
                                          jax.random.fold_in(rng, i))
    _ = float(losses["total"])
    dt = (time.time() - t0) / n
    print(f"step (device-resident batch): {dt*1000:.1f} ms -> "
          f"{BS/dt:.1f} pairs/s/chip (per-chip bs={BS}, tokens={WIDTH})")
    if step_flops:
        mfu = step_flops / dt / 197e12
        print(f"XLA step FLOPs: {step_flops/1e12:.2f} TF -> "
              f"{step_flops/dt/1e12:.1f} TF/s, MFU {mfu*100:.1f}%")
    try:
        stats = jax.local_devices()[0].memory_stats()
        print(f"peak HBM: {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB")
    except Exception:
        pass


if __name__ == "__main__":
    main()
