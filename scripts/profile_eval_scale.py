"""MSCOCO-scale streaming ranker timing on the real chip.

bench.py measures the full Multi30K eval (1000x5000).  MSCOCO-CN's test
sim-matrix is 25x bigger (5000 images x 25010 texts, 5 gt per image) — this
times the O(N^2) part alone, `eval/retrieval.py::retrieval_ranks`, the
streaming two-pass on-device ranker that never materializes the matrix on
host, at that scale (plus the video minmax-fusion variant with slots).

Usage: python scripts/profile_eval_scale.py [n_img] [n_txt]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import jax

if os.environ.get("LECCR_FORCE_CPU") == "1":
    # CPU smoke mode (e.g. while the TPU tunnel is down): must pin the
    # platform BEFORE backend init, and must NOT enable the persistent
    # cache (XLA:CPU AOT reload can SIGABRT — see the verify skill)
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

import jax.numpy as jnp
import numpy as np

from leccr_tpu.eval.retrieval import retrieval_ranks

N_IMG = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
N_TXT = int(sys.argv[2]) if len(sys.argv) > 2 else 25010
N_GT, E, N_SLOTS = 5, 256, 4


def main():
    rs = np.random.RandomState(0)
    img = rs.randn(N_IMG, E).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt = rs.randn(N_TXT, E).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    slots = rs.randn(N_IMG, N_SLOTS, E).astype(np.float32)
    img2txt = np.full((N_IMG, N_GT), -1, np.int64)
    txt2img = np.zeros((N_TXT,), np.int64)
    for t in range(N_TXT):
        i = t % N_IMG
        txt2img[t] = i
        col = t // N_IMG
        if col < N_GT:
            img2txt[i, col] = t
    di, dt_, ds, d_t2i, d_i2t = (
        jax.device_put(x) for x in (img, txt, slots,
                                    txt2img.astype(np.int32),
                                    img2txt.astype(np.int32)))

    for fusion in ("none", "minmax"):
        t0 = time.time()
        r_i2t, r_t2i = retrieval_ranks(
            di, dt_, d_t2i, d_i2t, slots=ds, fusion=fusion)
        _ = (np.asarray(r_t2i)[:3], np.asarray(r_i2t)[:3])  # fetch barrier
        compile_s = time.time() - t0
        # queue n dispatches, fetch once: device programs run back-to-back
        # and the tunnel round trip amortizes (same discipline as bench.py's
        # train leg — over this transport one RTT is ~25 ms, 20x the
        # ranker's device time)
        n = 10
        t0 = time.time()
        for _ in range(n):
            r_i2t, r_t2i = retrieval_ranks(
                di, dt_, d_t2i, d_i2t, slots=ds, fusion=fusion,
                as_numpy=False)
        _ = np.asarray(r_t2i)[0]
        wall = (time.time() - t0) / n
        pairs = N_IMG * N_TXT / wall
        print(f"fusion={fusion}: ranker {wall*1000:.1f} ms for "
              f"{N_IMG}x{N_TXT} ({pairs/1e6:.0f} M pairs/s/chip; "
              f"compile+first {compile_s:.1f}s)")
        assert r_i2t.shape == (N_IMG,) and r_t2i.shape == (N_TXT,)


if __name__ == "__main__":
    main()
