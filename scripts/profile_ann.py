"""IVF approximate-NN serving benchmark on the chip (leccr_tpu/serve_ann).

Measures, at a corpus size where exact search starts to hurt (default 1M
rows × embed_dim):

- spherical k-means build wall (C ≈ 4√N clusters, 15 Lloyd iterations)
- exact single-query / batch-8 search latency (the serve.py brute path)
- IVF latency at nprobe ∈ {4, 8, 16, 32} through the same
  single-dispatch embed→search program
- recall@10 vs exact at each nprobe on concept-clustered vectors (the
  structure real retrieval embeddings have; random text queries exercise
  only the latency path since a random corpus has no neighbors to find)
- the int8-quantized IVF bank (4× less probe HBM read)

Usage: python scripts/profile_ann.py [n_rows] [--int8]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

import numpy as np

from leccr_tpu.config import LECCRConfig
from leccr_tpu.data.synthetic import make_image_dataset
from leccr_tpu.serve import Embedder, ImageIndex
from leccr_tpu.serve_ann import (_ivf_topk, build_ivf_index, quantize_ivf,
                                 search_texts_ivf)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
VOCAB = 119547


def clustered(n, e, n_concepts, rs, cents=None, noise_norm=0.6):
    """Concept-mixture rows with a FIXED total noise norm (0.6 ⇒ cos-sim
    ≈0.86 to the concept direction) — per-dim spread must shrink with
    √e or high-dim noise swamps the cluster structure entirely."""
    if cents is None:
        cents = rs.randn(n_concepts, e)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    spread = noise_norm / np.sqrt(e)
    x = cents[rs.randint(0, n_concepts, n)] + spread * rs.randn(n, e)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32), cents


def timed(fn, n=30):
    fn()  # warm
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
    return (time.time() - t0) / n


def device_throughput(fn, n=100):
    """Steady-state device wall: queue n dispatches, block once — the
    transport round trip (~70 ms/query over this tunnel, which dominates
    ANY single-query latency here) amortizes away, leaving chip time."""
    jax.block_until_ready(fn())  # warm/compile
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    cfg = LECCRConfig()
    cfg.model.dtype = "bfloat16"
    from leccr_tpu.models.leccr import LECCRModel

    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    width = 32
    init_batch = {
        "text_ids_s": rs.randint(1, VOCAB, (2, width)).astype(np.int32),
        "text_mask_s": np.ones((2, width), np.int32),
        "text_ids_t": rs.randint(1, VOCAB, (2, width)).astype(np.int32),
        "text_mask_t": np.ones((2, width), np.int32),
        "caption_ids": rs.randint(1, VOCAB, (2, width)).astype(np.int32),
        "caption_mask": np.ones((2, width), np.int32),
        "vision": rs.randint(0, 255, (2, cfg.model.vision.image_res,
                                      cfg.model.vision.image_res, 3)
                             ).astype(np.uint8),
    }
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, init_batch)["params"]
    import tempfile

    synth = make_image_dataset(tempfile.mkdtemp(), n_train=2, n_eval=2,
                               image_res=64)
    cfg.data.text_vocab = synth.text_vocab
    emb = Embedder(cfg, params)

    e = cfg.model.embed_dim
    n_concepts = max(64, int(np.sqrt(N_ROWS)))
    feats, cents = clustered(N_ROWS, e, n_concepts, rs)
    index = ImageIndex(feats=jax.device_put(feats), slots=None,
                       ids=[str(i) for i in range(N_ROWS)])

    t0 = time.time()
    ivf = build_ivf_index(index)
    jax.block_until_ready(ivf.packed)
    build_s = time.time() - t0
    print(f"corpus {N_ROWS}x{e} ({index.feats.nbytes / 2**20:.0f} MiB); "
          f"IVF build {build_s:.1f}s (incl. one-time compiles) -> "
          f"C={ivf.n_clusters} cap={ivf.capacity} "
          f"(bank {ivf.packed.nbytes / 2**20:.0f} MiB)")

    # transport-inclusive single-query latency (the interactive number;
    # ~one tunnel round trip floor either way)
    queries = ["a dog runs across the grass"] * 8
    lat = timed(lambda: emb.search_texts(queries[:1], index, k=10))
    ilat = timed(lambda: search_texts_ivf(emb, queries[:1], ivf, k=10,
                                          nprobe=8))
    print(f"single-query latency (transport-inclusive): "
          f"exact {lat * 1000:.1f} ms, ivf@8 {ilat * 1000:.1f} ms")

    # recall + device-side batch-8 throughput on pre-embedded queries
    qv, _ = clustered(64, e, n_concepts, np.random.RandomState(7),
                      cents=cents)
    qv8 = jax.device_put(qv[:8])
    qv = jax.device_put(qv)
    exact_top = jax.jit(lambda q, f: jax.lax.top_k(q @ f.T, 10))
    exact_ids = np.asarray(exact_top(qv, index.feats)[1])
    wall = device_throughput(lambda: exact_top(qv8, index.feats))
    print(f"exact device wall: {wall * 1e3:.3f} ms/batch-8 "
          f"({8 / wall:.0f} QPS/chip)")

    variants = [("f32", ivf)]
    if "--int8" in sys.argv:
        variants.append(("int8", quantize_ivf(ivf)))
    for name, v in variants:
        arrays = (v.centroids, v.packed, v.valid, v.rows, v.scale)
        for nprobe in (4, 8, 16, 32):
            if nprobe > v.n_clusters:
                continue
            # arrays as ARGUMENTS, not closure constants — a closed-over
            # GiB-scale bank would be baked into the HLO as a literal
            raw = jax.jit(_ivf_topk, static_argnums=(2, 3))
            core = lambda q, r=raw, a=arrays, np_=nprobe: r(q, a, 10, np_)
            ids = np.asarray(core(qv)[1])
            recall = np.mean([len(set(a) & set(b)) / 10.0
                              for a, b in zip(ids, exact_ids)])
            wall = device_throughput(lambda: core(qv8))
            print(f"ivf[{name}] nprobe={nprobe:3d}: "
                  f"device {wall * 1e3:.3f} ms/batch-8 "
                  f"({8 / wall:.0f} QPS/chip); recall@10 {recall:.3f}")

    if "--maintain" in sys.argv:
        # incremental maintenance at scale: add 1% new rows / remove 1%,
        # then check recall at nprobe=8 against the post-maintenance
        # exact ranker (centroids are not re-fit on add — this measures
        # how much the stale partition costs at a realistic add size)
        from leccr_tpu.serve_ann import add_to_ivf, remove_from_ivf

        n_add = max(8, N_ROWS // 100)
        newf, _ = clustered(n_add, e, n_concepts,
                            np.random.RandomState(11), cents=cents)
        newi = ImageIndex(feats=jax.device_put(newf), slots=None,
                          ids=[f"new{i}" for i in range(n_add)])
        t0 = time.time()
        merged = add_to_ivf(ivf, newi)
        jax.block_until_ready(merged.packed)
        add_s = time.time() - t0
        t0 = time.time()
        pruned = remove_from_ivf(merged, [str(i) for i in
                                          range(0, N_ROWS, 100)])
        jax.block_until_ready(pruned.valid)
        rm_s = time.time() - t0
        import jax.numpy as jnp

        allf = jnp.concatenate([index.feats, newi.feats])
        exact_ids = np.asarray(exact_top(qv, allf)[1])
        arrays = (merged.centroids, merged.packed, merged.valid,
                  merged.rows, merged.scale)
        ids = np.asarray(jax.jit(_ivf_topk, static_argnums=(2, 3))(
            qv, arrays, 10, 8)[1])
        recall = np.mean([len(set(a) & set(b)) / 10.0
                          for a, b in zip(ids, exact_ids)])
        print(f"maintain: add_to_ivf {n_add} rows {add_s:.2f}s "
              f"(cap {ivf.capacity} -> {merged.capacity}), "
              f"remove_from_ivf {len(range(0, N_ROWS, 100))} rows "
              f"{rm_s:.2f}s; post-add recall@10@nprobe=8 {recall:.3f}")


if __name__ == "__main__":
    main()
