"""Online-serving benchmark on the chip: text-query -> top-k image search
latency/QPS against a device-resident image index (leccr_tpu/serve.py).

The reference has no serving story (its eval loop is offline batch
ranking); this measures the beyond-reference serving path at flagship
scale: mBERT query embed + fused top-k against N indexed images.

Usage: python scripts/profile_serve.py [n_index_images] [--int8] [--frontend]

--int8 additionally measures the same queries against the int8-quantized
index (serve.quantize_index): 4× less index HBM and an int8×int8 MXU
matmul — the win scales with index size (search is index-bandwidth-bound
past ~1M rows; a 10M×256 index is 2.6 GB int8 vs 10.2 GB f32).
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

N_IMG = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
VOCAB = 119547


def main():
    cfg = LECCRConfig()
    cfg.model.dtype = "bfloat16"
    model_cfg = cfg.model

    # random-weight flagship towers (weights don't affect timings)
    from leccr_tpu.models.leccr import LECCRModel

    model = LECCRModel(model_cfg)
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

    # synthetic vocab file for the tokenizer (content immaterial to timing)
    import tempfile

    synth = make_image_dataset(tempfile.mkdtemp(), n_train=2, n_eval=2,
                               image_res=64)
    cfg.data.text_vocab = synth.text_vocab

    emb = Embedder(cfg, params)
    # synthetic pre-embedded index (the index build path itself is the
    # bench.py image-embed measurement; here we measure query serving)
    feats = rs.randn(N_IMG, cfg.model.embed_dim).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    index = ImageIndex(feats=jax.device_put(feats), slots=None,
                       ids=[str(i) for i in range(N_IMG)])

    queries = ["a dog runs across the grass"] * 8

    # warm compiles
    _ = emb.search_texts(queries[:1], index, k=10)
    _ = emb.search_texts(queries, index, k=10)

    t0 = time.time()
    n = 50
    for _ in range(n):
        results = emb.search_texts(queries[:1], index, k=10)
    lat = (time.time() - t0) / n
    t0 = time.time()
    for _ in range(n):
        results = emb.search_texts(queries, index, k=10)
    lat8 = (time.time() - t0) / n
    assert len(results) == 8 and len(results[0]) == 10
    print(f"index={N_IMG} images ({index.feats.nbytes/2**20:.0f} MiB); "
          f"single-query latency {lat*1000:.1f} ms "
          f"({1/lat:.0f} QPS); batch-8 {lat8*1000:.1f} ms "
          f"({8/lat8:.0f} QPS)")

    if "--int8" in sys.argv:
        from leccr_tpu.serve import quantize_index

        qdx = quantize_index(index)
        _ = emb.search_texts(queries[:1], qdx, k=10)
        _ = emb.search_texts(queries, qdx, k=10)
        t0 = time.time()
        for _ in range(n):
            results = emb.search_texts(queries[:1], qdx, k=10)
        qlat = (time.time() - t0) / n
        t0 = time.time()
        for _ in range(n):
            results = emb.search_texts(queries, qdx, k=10)
        qlat8 = (time.time() - t0) / n
        assert len(results) == 8 and len(results[0]) == 10
        print(f"int8 index ({qdx.feats.nbytes/2**20:.0f} MiB): "
              f"single-query latency {qlat*1000:.1f} ms "
              f"({1/qlat:.0f} QPS); batch-8 {qlat8*1000:.1f} ms "
              f"({8/qlat8:.0f} QPS)")

    # double-sim (video) serving: feature sim blended with per-slot caption
    # sim (fusion="minmax", the video evaluator's ranking) over a
    # slot-carrying index — MSR-VTT-test-x10 scale
    n_vid = min(N_IMG, 10_000)
    n_slots = 4
    slots = rs.randn(n_vid, n_slots, cfg.model.embed_dim).astype(np.float32)
    slots /= np.linalg.norm(slots, axis=-1, keepdims=True)
    vindex = ImageIndex(feats=jax.device_put(feats[:n_vid]),
                        slots=jax.device_put(slots),
                        ids=[str(i) for i in range(n_vid)])
    _ = emb.search_texts(queries[:1], vindex, k=10, fusion="minmax")
    _ = emb.search_texts(queries, vindex, k=10, fusion="minmax")
    t0 = time.time()
    for _ in range(n):
        results = emb.search_texts(queries[:1], vindex, k=10,
                                   fusion="minmax")
    vlat = (time.time() - t0) / n
    t0 = time.time()
    for _ in range(n):
        results = emb.search_texts(queries, vindex, k=10, fusion="minmax")
    vlat8 = (time.time() - t0) / n
    assert len(results) == 8 and len(results[0]) == 10
    print(f"video index={n_vid} ({n_slots} slots, minmax double-sim); "
          f"single-query latency {vlat*1000:.1f} ms ({1/vlat:.0f} QPS); "
          f"batch-8 {vlat8*1000:.1f} ms ({8/vlat8:.0f} QPS)")

    if "--frontend" in sys.argv:
        # dynamic-batching frontend under concurrent single-query load:
        # 32 client threads each fire sequential 1-query requests; the
        # batcher coalesces them into shared dispatches.  Compare achieved
        # QPS against the sequential single-query loop above (1/lat).
        import threading

        from leccr_tpu.serve_frontend import DynamicBatcher

        n_clients, per_client = 32, 12
        with DynamicBatcher(emb, index, max_delay=0.01) as b:
            _ = b.search(queries[:1], k=10)  # warm
            lats: list = []
            lock = threading.Lock()

            def client():
                for _ in range(per_client):
                    t = time.time()
                    r = b.search(["a dog runs across the grass"], k=10)
                    dt = time.time() - t
                    assert len(r) == 1 and len(r[0]) == 10
                    with lock:
                        lats.append(dt)

            threads = [threading.Thread(target=client)
                       for _ in range(n_clients)]
            t0 = time.time()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.time() - t0
            total = n_clients * per_client
            print(f"frontend ({n_clients} concurrent clients, "
                  f"mean batch {b.stats.dispatched_queries / b.stats.dispatches:.1f}): "
                  f"{total / wall:.0f} QPS "
                  f"(sequential baseline {1 / lat:.0f}); "
                  f"p50 latency {sorted(lats)[len(lats) // 2] * 1000:.1f} ms, "
                  f"p95 {sorted(lats)[int(len(lats) * .95)] * 1000:.1f} ms")


if __name__ == "__main__":
    main()
