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
# --gc M: GradCache two-pass exact gradients over M microbatches
# (trainer._grad_cache_grads) — decouples the negative pool from
# activation HBM, enabling per-chip batches far past the dense bs128
GC = int(sys.argv[sys.argv.index("--gc") + 1]) if "--gc" in sys.argv else 0
# --ema: advance a params EMA in the step (train.ema_decay), measuring its
# marginal HBM-pass cost at flagship scale
EMA = "--ema" in sys.argv


def main():
    cfg = LECCRConfig()
    cfg.model.vision.image_res = RES
    cfg.model.dtype = "bfloat16"
    cfg.model.scan_layers = "--scan" in sys.argv
    cfg.model.remat = cfg.model.scan_layers or "--remat" in sys.argv
    if "--fused" in sys.argv:
        cfg.model.text.fused_attention = "--xla-text" not in sys.argv
        cfg.model.vision.fused_attention = True
    if "--bf16-moments" in sys.argv:
        cfg.train.optimizer.moment_dtype = "bfloat16"
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
          f"{sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M"
          + (f"; GradCache m={GC}" if GC > 1 else ""))
    sched = linear_warmup_decay(1e-5, 10000, 0.1)
    tx = build_optimizer(cfg.train.optimizer, params, sched)
    opt_state = tx.init(params)

    mc = cfg.model

    ema0 = jax.tree.map(jnp.copy, params) if EMA else None

    def step(params, opt_state, ema, batch, rng):
        idx = batch.pop("idx")
        flip = batch.pop("flip")

        def forward(p, mb_in, fl, k):
            mb = dict(mb_in)
            mb["vision"] = preprocess_train_images(mb["vision"], fl)
            drop = rng if k is None else jax.random.fold_in(rng, k)
            return model.apply({"params": p}, mb, deterministic=False,
                               rngs={"dropout": drop})

        def loss_from_emb(emb):
            losses = compute_losses(
                emb, idx, weight_caption_loss=mc.weight_caption_loss,
                weight_reg_loss=mc.weight_reg_loss,
                weight_dstl_loss=mc.weight_dstl_loss,
                weight_cv_loss=mc.weight_cv_loss)
            return losses["total"], losses

        if GC > 1:
            from leccr_tpu.train.trainer import _grad_cache_grads

            losses, grads = _grad_cache_grads(
                forward, loss_from_emb, params, batch, flip, GC)
        else:
            (_, losses), grads = jax.value_and_grad(
                lambda p: loss_from_emb(forward(p, batch, flip, None)),
                has_aux=True)(params)
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if EMA:
            ema = jax.tree.map(lambda e, q: e * 0.999 + q * 0.001, ema,
                               new_params)
        return new_params, opt_state, ema, losses

    jstep = jax.jit(step, donate_argnums=(0, 1, 2))
    rng = jax.random.key(0, impl=cfg.train.rng_impl)
    # XLA's own FLOP count for the step -> measured MFU below
    try:
        cost = jstep.lower(params, opt_state, ema0, dict(batch),
                           rng).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
    except Exception:
        step_flops = 0.0
    if GC > 1 and step_flops:
        # XLA's cost analysis counts each lax.scan BODY once, not x
        # trip-count, so a GradCache step (two scans over GC microbatches)
        # is undercounted by (GC-1) copies of the pass-1 forward and the
        # pass-2 microbatch vjp.  Cost-analyze those two bodies at
        # microbatch size (client-side HLO analysis; no device compile)
        # and add the missing copies back.
        try:
            def lowered_flops(lowered):
                # Lowered.cost_analysis() (client-side) returns None on
                # some backends (axon tunnel) -> fall back to compiling.
                cost = lowered.cost_analysis()
                if cost is None:
                    cost = lowered.compile().cost_analysis()
                return float(cost.get("flops", 0.0))

            mb_bs = BS // GC
            mb = {k: v[:mb_bs] for k, v in batch.items()
                  if k not in ("idx", "flip")}
            fl_mb = batch["flip"][:mb_bs]

            def fwd_body(p, mb_in, fl):
                b = dict(mb_in)
                b["vision"] = preprocess_train_images(b["vision"], fl)
                return model.apply({"params": p}, b, deterministic=False,
                                   rngs={"dropout": rng})

            f_fwd = lowered_flops(jax.jit(fwd_body).lower(params, mb, fl_mb))

            emb_shape = jax.eval_shape(fwd_body, params, mb, fl_mb)
            ct = jax.tree.map(lambda s: jnp.ones(s.shape, s.dtype),
                              emb_shape)

            def vjp_body(p, mb_in, fl, cot):
                _, f = jax.vjp(lambda q: fwd_body(q, mb_in, fl), p)
                return f(cot)

            f_vjp = lowered_flops(
                jax.jit(vjp_body).lower(params, mb, fl_mb, ct))
            step_flops += (GC - 1) * (f_fwd + f_vjp)
            print(f"GradCache FLOP correction: scan bodies fwd "
                  f"{f_fwd/1e12:.2f} TF + vjp {f_vjp/1e12:.2f} TF x "
                  f"{GC - 1} missing trips added to XLA's count")
        except Exception as e:
            print(f"GradCache FLOP correction unavailable ({e!r}); "
                  f"MFU below UNDERCOUNTS by ~{GC}x (scan bodies "
                  f"counted once)")
    t0 = time.time()
    params, opt_state, ema0, losses = jstep(params, opt_state, ema0,
                                            dict(batch), rng)
    # value fetch = real barrier (block_until_ready is lazy over the
    # axon tunnel)
    _ = float(losses["total"])
    print(f"compile+first step: {time.time()-t0:.1f}s")
    n = 10
    t0 = time.time()
    for i in range(n):
        params, opt_state, ema0, losses = jstep(
            params, opt_state, ema0, dict(batch), jax.random.fold_in(rng, i))
    _ = float(losses["total"])
    dt = (time.time() - t0) / n
    print(f"step (incl. host->device transfer): {dt*1000:.1f} ms  -> "
          f"{BS/dt:.1f} pairs/s/chip (bs={BS}, tokens={WIDTH})")

    # compute-only: batch resident on device (the trainer overlaps transfer
    # with compute via async dispatch + prefetch)
    dev_batch = jax.device_put(dict(batch))
    params, opt_state, ema0, losses = jstep(params, opt_state, ema0,
                                            dict(dev_batch), rng)
    _ = float(losses["total"])
    t0 = time.time()
    for i in range(n):
        params, opt_state, ema0, losses = jstep(
            params, opt_state, ema0, dict(dev_batch),
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
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0)
    lim = stats.get("bytes_limit", 0)
    if peak:
        print(f"peak HBM: {peak/2**30:.2f} GiB of {lim/2**30:.2f} GiB limit")

    if "--trace" in sys.argv:
        import shutil

        logdir = "/tmp/leccr_trace"
        shutil.rmtree(logdir, ignore_errors=True)
        jax.profiler.start_trace(logdir)
        for i in range(3):
            params, opt_state, losses = jstep(
                params, opt_state, dict(dev_batch),
                jax.random.fold_in(rng, 100 + i))
        _ = float(losses["total"])
        jax.profiler.stop_trace()
        print_hlo_stats(logdir)


def print_hlo_stats(logdir, top=40):
    """Offline xprof: top HLO ops by self device time over the traced steps."""
    import csv
    import glob
    import io

    from xprof.convert import raw_to_tool_data as conv

    paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    data, _ = conv.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = list(csv.reader(io.StringIO(data)))
    head = rows[0]
    if "Total time (us)" not in head:
        print("hlo_stats columns:", head)
        t_candidates = [i for i, c in enumerate(head) if "time" in c.lower()]
        t_col = t_candidates[0]
    else:
        t_col = head.index("Total time (us)")
    occ_col = head.index("#Occurrences") if "#Occurrences" in head else None
    cat_col = head.index("HLO op category") if "HLO op category" in head else 0
    name_col = head.index("HLO op expression") if "HLO op expression" in head \
        else min(2, len(head) - 1)
    body = sorted(rows[1:], key=lambda r: -float(r[t_col] or 0))
    total = sum(float(r[t_col] or 0) for r in body)
    print(f"hlo_stats: {total/3:.0f} us/step device total over 3 steps")
    for r in body[:top]:
        occ = f" x{r[occ_col]}" if occ_col else ""
        print(f"{float(r[t_col])/3:9.1f} us  {r[cat_col][:28]:28s}{occ}  "
              f"{r[name_col][:110]}")


if __name__ == "__main__":
    main()
