#!/usr/bin/env python3
"""Chip measurement of the COMPOSED scale stack (BASELINE config #5).

`profile_scale.py` measured the ViT-L/14@336 + XLM-R-large towers alone;
the full `scale_vitl_32k` recipe also layers remat + GradCache +
streamed losses + ring_fused global negatives + FSDP.  This script runs
the REAL Trainer step — the exact `_make_train_step` program production
uses, GradCache scan included — on one chip at the per-chip batch slice
and reports step time, pairs/s/chip, and HBM highwater for the stack,
not just the towers.

What one chip can and cannot compose honestly:
  - remat, GradCache microbatching, streamed dstl/cv row blocks, the
    optimizer family: REAL here (they are per-chip programs).
  - ring_fused and FSDP: degenerate at mesh data=1 (the ring has no
    rotations, FSDP has nothing to shard over).  Their cost at pod
    scale is a COMMUNICATION budget, printed analytically below from
    the ring's wire format ([b_local, E] block + idx per rotation,
    leccr_tpu/parallel/ring.py:75-79) — plus an on-chip measurement of
    the per-device blockwise-logits compute leg (one [b_local, B_global]
    fused InfoNCE pass), which is what each rotation's matmul streams
    through and what the ppermute must overlap with.

Usage: python scripts/profile_scale_stack.py [--bs 64] [--gc_m 2]
           [--pod_chips 512] [--global_negatives 32768]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

import jax.numpy as jnp
import numpy as np

RES, WIDTH, VOCAB, E = 336, 64, 250002, 256


def build_cfg(bs: int, gc_m: int, out: str):
    from leccr_tpu.config import LECCRConfig

    cfg = LECCRConfig()
    cfg.output_dir = out
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
    m.text.pad_token_id = 1
    m.caption_ca_layer = 3
    m.caption_interaction_layer = 2
    m.dtype = "bfloat16"
    m.remat = True
    # the yaml ships unfused (XLA attention wins under remat at ViT-L)
    m.text.fused_attention = False
    m.vision.fused_attention = False
    m.weight_dstl_loss = 0.5
    m.weight_cv_loss = 0.01
    d = cfg.data
    d.dataset = "synthetic"
    d.synthetic_size = bs
    d.synthetic_eval_images = 8
    d.max_tokens = WIDTH
    d.token_buckets = [WIDTH]
    d.num_workers = 2
    cfg.train.batch_size_train = bs
    cfg.train.grad_cache_microbatches = gc_m
    # one chip must hold the full 890.6M-param optimizer state that FSDP
    # shards away at pod scale (fp32 params 3.6G + fp32 mu/nu 7.1G +
    # the bs64 gc_m=2 program 7.3G = 18G > 15.75G HBM, measured OOM).
    # bf16 moments are the scale config's shipped throughput lever
    # (OptimConfig.moment_dtype) and close exactly that gap; at pod
    # scale with FSDP the state is 128-way sharded and this is moot.
    cfg.train.optimizer.moment_dtype = "bfloat16"
    cfg.parallel.data = 1
    cfg.parallel.model = 1
    cfg.parallel.negatives = "ring_fused"      # degenerate at data=1
    cfg.parallel.stream_loss_block_rows = 256
    cfg.parallel.fsdp = True                   # degenerate at data=1
    return cfg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64,
                    help="per-chip batch slice (32k global / 512 chips = "
                         "64/chip at the data=128 x model=4 pod layout)")
    ap.add_argument("--gc_m", type=int, default=2,
                    help="GradCache microbatches (scale dryrun value)")
    ap.add_argument("--pod_chips", type=int, default=512)
    ap.add_argument("--model_par", type=int, default=4)
    ap.add_argument("--global_negatives", type=int, default=32768)
    ap.add_argument("--ici_gbps", type=float, default=45.0,
                    help="per-link ICI bandwidth assumption for the budget")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", jax.default_backend()

    from leccr_tpu.train.trainer import Trainer

    cfg = build_cfg(args.bs, args.gc_m,
                    tempfile.mkdtemp(prefix="leccr_stack_"))
    t0 = time.time()
    tr = Trainer(cfg)
    n_par = sum(x.size for x in jax.tree.leaves(tr.state.params))
    print(f"trainer built {time.time()-t0:.0f}s; params {n_par/1e6:.1f}M "
          f"(remat gc_m={args.gc_m} stream=256 ring_fused fsdp)", flush=True)

    rs = np.random.RandomState(0)
    bs = args.bs
    batch = {
        "vision": rs.randint(0, 255, (bs, RES, RES, 3)).astype(np.uint8),
        "flip": rs.rand(bs) < 0.5,
        "text_ids_s": rs.randint(2, 4000, (bs, WIDTH)).astype(np.int32),
        "text_mask_s": np.ones((bs, WIDTH), np.int32),
        "text_ids_t": rs.randint(2, 4000, (bs, WIDTH)).astype(np.int32),
        "text_mask_t": np.ones((bs, WIDTH), np.int32),
        "caption_ids": rs.randint(2, 4000, (bs, WIDTH)).astype(np.int32),
        "caption_mask": np.ones((bs, WIDTH), np.int32),
        "idx": np.arange(bs, dtype=np.int32),
    }
    dev = jax.device_put(batch)
    params, opt_state, ema = (tr.state.params, tr.state.opt_state,
                              tr.state.ema_params)
    t0 = time.time()
    params, opt_state, ema, losses = tr._train_step(
        params, opt_state, ema, dict(dev), np.int32(0))
    _ = float(losses["total"])
    print(f"compile+first step {time.time()-t0:.0f}s", flush=True)
    # settle the donation/allocator transient before timing (bench.py
    # measured 2-6x first-steps on chip)
    for i in range(2):
        params, opt_state, ema, losses = tr._train_step(
            params, opt_state, ema, dict(dev), np.int32(1 + i))
        _ = float(losses["total"])
    n = 5
    t0 = time.time()
    for i in range(n):
        params, opt_state, ema, losses = tr._train_step(
            params, opt_state, ema, dict(dev), np.int32(10 + i))
    _ = float(losses["total"])
    dt = (time.time() - t0) / n
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 2 ** 30
    print(f"composed stack step: {dt*1000:.1f} ms -> {bs/dt:.1f} "
          f"pairs/s/chip (per-chip bs={bs}, gc_m={args.gc_m}); "
          f"peak HBM {peak:.2f} GiB", flush=True)

    # ---- on-chip compute leg of the ring: one [b_local, B_global] fused
    # blockwise InfoNCE pass (what the rotations' matmuls add up to)
    from leccr_tpu.ops.infonce import infonce_stats

    bg = args.global_negatives
    data_par = args.pod_chips // args.model_par
    b_local = bg // data_par
    a = jnp.asarray(rs.randn(b_local, E), jnp.float32)
    kstack = jnp.asarray(rs.randn(data_par, b_local, E), jnp.float32)
    istack = jnp.arange(bg, dtype=jnp.int32).reshape(data_par, b_local)
    idx_q = istack[0]

    @jax.jit
    def ring_fwd(a, kstack, istack):
        # the exact per-rotation program _ring_half_fused_fwd runs
        # (fused InfoNCE stats kernel + logaddexp merge), minus the
        # ppermute — i.e. the compute each rotation must overlap with
        def body(carry, kb):
            k_s, i_s = kb
            lse_b, ps_b, pc_b = infonce_stats(
                a, k_s, idx_q, i_s, jnp.float32(1.0 / 0.05), "auto", False)
            lse, ps, pc = carry
            return (jnp.logaddexp(lse, lse_b), ps + ps_b, pc + pc_b), None

        init = (jnp.full((b_local,), -jnp.inf, jnp.float32),
                jnp.zeros((b_local,), jnp.float32),
                jnp.zeros((b_local,), jnp.float32))
        (lse, ps, pc), _ = jax.lax.scan(body, init, (kstack, istack))
        return jnp.mean(lse - ps / jnp.maximum(pc, 1.0))

    try:
        _ = float(ring_fwd(a, kstack, istack))
        t0 = time.time()
        for _ in range(10):
            r = ring_fwd(a, kstack, istack)
        _ = float(r)
        leg = (time.time() - t0) / 10
        print(f"ring compute leg (forward: {data_par} rotations of the "
              f"fused [{b_local}x{b_local}] InfoNCE stats kernel = "
              f"[{b_local}, {bg}] logits blockwise): {leg*1000:.2f} ms "
              f"(backward re-ring ~2x this)")
    except Exception as exc:  # keep the budget even if the kernel varies
        leg = None
        print(f"ring compute leg measurement skipped: {exc!r}")

    # ---- analytic ICI budget at pod scale (ring wire format:
    # [b_local, E] f32 block + int32 idx per rotation, 3 ITC rings/step,
    # forward + the reverse-permute backward)
    rotations = data_par - 1
    bytes_rot = b_local * E * 4 + b_local * 4
    rings = 3                      # itc_vs, itc_vt, itc_st
    total = rotations * bytes_rot * rings * 2  # fwd + bwd
    wire_s = total / (args.ici_gbps * 1e9)
    print(f"ICI budget @pod data={data_par} model={args.model_par}: "
          f"{rotations} rotations x {bytes_rot/1024:.0f} KiB x {rings} "
          f"rings x fwd+bwd = {total/2**20:.1f} MiB/step/device -> "
          f"{wire_s*1000:.2f} ms at {args.ici_gbps:.0f} GB/s/link"
          + (f"; overlap: fwd+bwd ring compute ~{3*leg*1000:.2f} ms "
             f"{'covers' if 3 * leg > wire_s else 'does NOT cover'} the "
             "wire time" if leg else ""))


if __name__ == "__main__":
    main()
