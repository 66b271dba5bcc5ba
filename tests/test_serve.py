"""Serving API smoke test: embed, index, top-k search round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from leccr_tpu.config import tiny_test_config
from leccr_tpu.data.tokenizers import write_tiny_wordpiece_vocab
from leccr_tpu.models.leccr import LECCRModel
from leccr_tpu.serve import Embedder, ImageIndex


# the shared `embedder` fixture lives in conftest.py (also used by
# tests/test_serve_frontend.py)


def test_embed_and_search(embedder):
    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(1)
    images = rs.randint(0, 255, (6, res, res, 3)).astype(np.uint8)
    captions = [f"a man rides his red bike {i}" for i in range(6)]
    index = embedder.build_image_index(images, captions,
                                       ids=[f"img{i}" for i in range(6)])
    assert index.feats.shape == (6, cfg.model.embed_dim)
    assert index.slots.shape[0] == 6

    txt = embedder.embed_texts(["a man rides", "red dog", "field"])
    assert txt.shape == (3, cfg.model.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(txt, axis=-1), 1.0, atol=1e-5)

    hits = embedder.search_texts(["a man rides his bike"], index, k=3)
    assert len(hits) == 1 and len(hits[0]) == 3
    assert all(h[0].startswith("img") for h in hits[0])
    # scores sorted descending
    scores = [h[1] for h in hits[0]]
    assert scores == sorted(scores, reverse=True)

    i2t = embedder.search_images(index, ["a man", "red bike", "dog", "x a"],
                                 k=2)
    assert len(i2t) == 6 and len(i2t[0]) == 2


@pytest.fixture(scope="module")
def video_embedder(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_video")
    vocab = tmp / "vocab.txt"
    write_tiny_wordpiece_vocab(
        str(vocab), "a man rides his red bike dog field".split())
    cfg = tiny_test_config()
    cfg.data.text_vocab = str(vocab)
    m = cfg.model
    m.vision.kind = "temporal"
    m.vision.frame_feat_dim = 32
    m.vision.num_layers = 1
    m.vision.num_heads = 4
    m.vision.max_frames = 6
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    batch = {
        "vision": jnp.asarray(rs.rand(1, 6, 32), jnp.float32),
        "vision_mask": jnp.ones((1, 6), bool),
        "text_ids_s": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "text_mask_s": jnp.ones((1, 8), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "text_mask_t": jnp.ones((1, 8), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "caption_mask": jnp.ones((1, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return Embedder(cfg, params, batch_size=4)


def test_video_index_and_fused_search(video_embedder):
    """build_video_index pads ragged frame lists; fusion='minmax' search
    ranks by the double-sim blend the video evaluator uses."""
    emb = video_embedder
    cfg = emb.cfg
    rs = np.random.RandomState(2)
    # ragged per-video frame features: 3..8 frames (8 > max_frames=6)
    frames = [rs.rand(t, 32).astype(np.float32) for t in (3, 6, 8, 4, 5)]
    caps = [f"a man rides his red bike {i}" for i in range(5)]
    index = emb.build_video_index(frames, caps,
                                  ids=[f"vid{i}" for i in range(5)])
    assert index.feats.shape == (5, cfg.model.embed_dim)
    assert index.slots.shape[0] == 5

    queries = ["a man rides", "red dog"]
    for fusion in ("raw", "minmax"):
        hits = emb.search_texts(queries, index, k=5, fusion=fusion,
                                alpha=0.8)
        # numpy oracle of the same blend (eval/retrieval.py fuse())
        q = emb.embed_texts(queries)
        f = np.asarray(index.feats)
        sl = np.asarray(index.slots)
        s = q @ f.T
        c = np.einsum("nke,be->bnk", sl, q).max(-1)
        if fusion == "raw":
            fused = 0.8 * s + 0.2 * c
        else:
            def norm(x):
                return (x - x.max()) / max(x.max() - x.min(), 1e-12)
            fused = 0.8 * norm(s) + 0.2 * norm(c)
        want = np.argsort(-fused, axis=1)
        for b, row in enumerate(hits):
            got_ids = [h[0] for h in row]
            assert got_ids == [f"vid{j}" for j in want[b]]
            np.testing.assert_allclose(
                [h[1] for h in row], np.sort(fused[b])[::-1], atol=1e-5)

    # pad queries must not shift minmax normalization: a solo query (3 pad
    # rows in the compiled batch) matches the oracle computed over ONLY its
    # own score row — pads are masked out of the min/max
    solo = emb.search_texts(queries[:1], index, k=5, fusion="minmax",
                            alpha=0.8)
    q1 = emb.embed_texts(queries[:1])
    s1 = q1 @ np.asarray(index.feats).T
    c1 = np.einsum("nke,be->bnk", np.asarray(index.slots), q1).max(-1)

    def norm1(x):
        return (x - x.max()) / max(x.max() - x.min(), 1e-12)

    fused1 = 0.8 * norm1(s1) + 0.2 * norm1(c1)
    assert [h[0] for h in solo[0]] == [
        f"vid{j}" for j in np.argsort(-fused1[0])]
    np.testing.assert_allclose(
        [h[1] for h in solo[0]], np.sort(fused1[0])[::-1], atol=1e-5)


@pytest.mark.slow
def test_sharded_index_matches_single_device(embedder):
    """shard_index over the 8-device mesh: per-shard top-k + global merge
    returns exactly the single-device results (ids and scores), for the
    feature-only path and both slot fusions, with a row count that does
    not divide the mesh (pad rows masked) and query batches above
    batch_size (chunked path)."""
    from jax.sharding import Mesh

    from leccr_tpu.serve import shard_index

    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(3)
    images = rs.randint(0, 255, (10, res, res, 3)).astype(np.uint8)
    captions = [f"a man rides his red bike {i}" for i in range(10)]
    index = embedder.build_image_index(images, captions,
                                       ids=[f"img{i}" for i in range(10)])

    devs = jax.devices()[:8]
    mesh = Mesh(np.asarray(devs), axis_names=("data",))
    sharded = shard_index(index, mesh)
    assert sharded.feats.shape[0] == 16  # padded 10 -> 2 rows x 8 shards
    assert sharded.n_valid == 10

    # one compiled chunk on both paths (minmax normalizes per dispatch
    # batch, so the chunking must match for score comparison)
    queries = ["a man rides", "red dog", "field", "his bike"]
    for fusion in ("none", "raw", "minmax"):
        want = embedder.search_texts(queries, index, k=4, fusion=fusion,
                                     alpha=0.8)
        got = embedder.search_texts(queries, sharded, k=4, fusion=fusion,
                                    alpha=0.8)
        for w_row, g_row in zip(want, got):
            assert [h[0] for h in w_row] == [h[0] for h in g_row]
            np.testing.assert_allclose([h[1] for h in w_row],
                                       [h[1] for h in g_row], atol=1e-5)

    # chunk-independent fusions also match across DIFFERENT chunkings:
    # 5 queries run unsharded as one 5-row dispatch but sharded as 4+1
    many = queries + ["a dog"]
    want = embedder.search_texts(many, index, k=4, fusion="raw", alpha=0.8)
    got = embedder.search_texts(many, sharded, k=4, fusion="raw", alpha=0.8)
    for w_row, g_row in zip(want, got):
        assert [h[0] for h in w_row] == [h[0] for h in g_row]
        np.testing.assert_allclose([h[1] for h in w_row],
                                   [h[1] for h in g_row], atol=1e-5)

    # k larger than the per-shard row count (2): the merged pool must
    # still produce the exact global top-k, and pad rows never appear
    want = embedder.search_texts(queries[:2], index, k=7)
    got = embedder.search_texts(queries[:2], sharded, k=7)
    for w_row, g_row in zip(want, got):
        assert [h[0] for h in w_row] == [h[0] for h in g_row]
        assert all(h[0].startswith("img") for h in g_row)


def test_index_save_load_roundtrip(embedder, tmp_path):
    """save_index/load_index: identical search results after reload, both
    unsharded and re-sharded over the mesh at load time."""
    from jax.sharding import Mesh

    from leccr_tpu.serve import load_index, save_index

    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(4)
    images = rs.randint(0, 255, (6, res, res, 3)).astype(np.uint8)
    captions = [f"a red dog in the field {i}" for i in range(6)]
    index = embedder.build_image_index(images, captions,
                                       ids=[f"img{i}" for i in range(6)])
    save_index(index, str(tmp_path / "idx"))

    want = embedder.search_texts(["a red dog"], index, k=4, fusion="raw")
    loaded = load_index(str(tmp_path / "idx"))
    assert loaded.ids == index.ids and loaded.slots is not None
    got = embedder.search_texts(["a red dog"], loaded, k=4, fusion="raw")
    assert [(h[0], round(h[1], 5)) for h in want[0]] == \
           [(h[0], round(h[1], 5)) for h in got[0]]

    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    sharded = load_index(str(tmp_path / "idx"), mesh=mesh)
    assert sharded.mesh is mesh and sharded.n_valid == 6
    got = embedder.search_texts(["a red dog"], sharded, k=4, fusion="raw")
    assert [h[0] for h in want[0]] == [h[0] for h in got[0]]

    # a feature-only index (no slots file) loads and serves
    feat_only = ImageIndex(feats=index.feats, slots=None, ids=index.ids)
    save_index(feat_only, str(tmp_path / "idx2"))
    loaded2 = load_index(str(tmp_path / "idx2"))
    assert loaded2.slots is None
    hits = embedder.search_texts(["a red dog"], loaded2, k=2)
    assert len(hits[0]) == 2


def test_search_rejects_unknown_fusion(embedder):
    with pytest.raises(ValueError):
        embedder.search_texts(["a"], None, fusion="bogus")


@pytest.mark.slow
def test_from_checkpoint_random_init(tmp_path):
    """Embedder.from_checkpoint with no checkpoint: random init, still
    serves end-to-end."""
    from leccr_tpu.config import tiny_test_config

    vocab = tmp_path / "vocab.txt"
    write_tiny_wordpiece_vocab(str(vocab), "a man rides bike dog".split())
    cfg = tiny_test_config()
    cfg.output_dir = str(tmp_path / "out")
    cfg.data.text_vocab = str(vocab)
    cfg_path = tmp_path / "cfg.json"
    cfg.save(str(cfg_path))

    emb = Embedder.from_checkpoint(str(cfg_path), batch_size=2)
    res = cfg.model.vision.image_res
    images = np.random.RandomState(0).randint(
        0, 255, (3, res, res, 3)).astype(np.uint8)
    index = emb.build_image_index(images, ["a man", "a dog", "a bike"])
    hits = emb.search_texts(["man rides"], index, k=2)
    assert len(hits[0]) == 2

    # the fast path pads to batch_size: varying query counts must reuse ONE
    # compiled program (each recompile would sit on the latency path)
    emb.search_texts(["a"], index, k=2)
    emb.search_texts(["a", "b"], index, k=2)
    assert emb._embed_and_topk._cache_size() == 1


def test_profiling_utils(tmp_path):
    from leccr_tpu.utils.profiling import step_timer, trace_context

    with trace_context(None):
        pass  # no-op path
    t = step_timer()
    t.tick()
    t.tick()
    t.tick()
    s = t.summary()
    assert s["steps"] == 2 and s["steps_per_sec"] > 0


@pytest.mark.slow
def test_quantized_index_matches_fp32(embedder, tmp_path):
    """int8 per-row index quantization (quantize_index): scores stay
    within quantization tolerance of fp32 on every fusion path, the
    sharded int8 search is EXACTLY the single-device int8 search, the
    quantized index survives save/load bit-for-bit, and image->text
    works through the transposed text-side path."""
    from jax.sharding import Mesh

    from leccr_tpu.serve import (load_index, quantize_index, save_index,
                                 shard_index)

    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(5)
    images = rs.randint(0, 255, (10, res, res, 3)).astype(np.uint8)
    captions = [f"a man rides his red bike {i}" for i in range(10)]
    index = embedder.build_image_index(images, captions,
                                       ids=[f"img{i}" for i in range(10)])
    qdx = quantize_index(index)
    assert qdx.quantized and qdx.feats.dtype == jnp.int8
    assert qdx.slots.dtype == jnp.int8 and qdx.scale.shape == (10,)
    # storage really is 4x smaller per element
    assert qdx.feats.nbytes * 4 == index.feats.nbytes

    queries = ["a man rides", "red dog", "field", "his bike"]
    for fusion, atol in (("none", 0.03), ("raw", 0.03)):
        want = embedder.search_texts(queries, index, k=10, fusion=fusion)
        got = embedder.search_texts(queries, qdx, k=10, fusion=fusion)
        for w_row, g_row in zip(want, got):
            w = dict(w_row)
            for item, s in g_row:
                np.testing.assert_allclose(s, w[item], atol=atol)
    # minmax normalizes by the batch score range; smoke-level check
    hits = embedder.search_texts(queries, qdx, k=3, fusion="minmax")
    assert all(len(r) == 3 and np.isfinite([h[1] for h in r]).all()
               for r in hits)

    # sharded int8 == single-device int8, exactly (same integer math)
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    sq = shard_index(qdx, mesh)
    assert sq.feats.dtype == jnp.int8 and sq.scale.shape[0] == 16
    for fusion in ("none", "raw", "minmax"):
        want = embedder.search_texts(queries, qdx, k=5, fusion=fusion)
        got = embedder.search_texts(queries, sq, k=5, fusion=fusion)
        for w_row, g_row in zip(want, got):
            assert [h[0] for h in w_row] == [h[0] for h in g_row]
            np.testing.assert_allclose([h[1] for h in w_row],
                                       [h[1] for h in g_row], atol=1e-5)

    # save/load round trip keeps the int8 payload + scales
    save_index(qdx, str(tmp_path / "qidx"))
    loaded = load_index(str(tmp_path / "qidx"))
    assert loaded.quantized and loaded.feats.dtype == jnp.int8
    want = embedder.search_texts(queries[:2], qdx, k=4)
    got = embedder.search_texts(queries[:2], loaded, k=4)
    assert [(h[0], round(h[1], 6)) for h in want[0]] == \
           [(h[0], round(h[1], 6)) for h in got[0]]

    # image->text transposed path
    i2t_w = embedder.search_images(index, queries, k=2)
    i2t_g = embedder.search_images(qdx, queries, k=2)
    for w_row, g_row in zip(i2t_w, i2t_g):
        for (wi, ws), (gi, gs) in zip(w_row, g_row):
            np.testing.assert_allclose(gs, ws, atol=0.03)

    # quantize after shard is an error; double-quantize is a no-op
    with pytest.raises(ValueError):
        quantize_index(shard_index(index, mesh))
    assert quantize_index(qdx) is qdx


def test_search_images_sharded_has_no_pad_rows(embedder):
    """image->text over a ROW-SHARDED index: exactly n_valid result rows
    (the shard padding appended by shard_index must never surface as
    phantom images), each row identical to the unsharded search — f32 and
    int8 layouts both."""
    from jax.sharding import Mesh

    from leccr_tpu.serve import quantize_index, shard_index

    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(6)
    images = rs.randint(0, 255, (10, res, res, 3)).astype(np.uint8)
    captions = [f"a man rides his red bike {i}" for i in range(10)]
    index = embedder.build_image_index(images, captions)
    texts = ["a man rides", "red dog", "field"]
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))

    for idx in (index, quantize_index(index)):
        want = embedder.search_images(idx, texts, k=3)
        got = embedder.search_images(shard_index(idx, mesh), texts, k=3)
        assert len(want) == 10 and len(got) == 10  # not 16 padded rows
        for w_row, g_row in zip(want, got):
            assert [h[0] for h in w_row] == [h[0] for h in g_row]
            np.testing.assert_allclose([h[1] for h in w_row],
                                       [h[1] for h in g_row], atol=1e-5)


def test_fusion_on_slotless_index_raises(embedder):
    """A feats-only index (e.g. loaded from a save without slots.npy) must
    reject slot fusions with a clear error on the single-device path, not
    crash tracing on slots=None."""
    feats = jnp.asarray(np.random.RandomState(7).rand(6, 8), jnp.float32)
    idx = ImageIndex(feats=feats, slots=None, ids=[str(i) for i in range(6)])
    for fusion in ("raw", "minmax"):
        with pytest.raises(ValueError, match="slot-carrying"):
            embedder.search_texts(["a man"], idx, k=2, fusion=fusion)


def test_index_merge_and_remove(embedder):
    """Incremental maintenance: build once, then merge_indexes for new
    items and remove_from_index for deletions — search results identical
    to a from-scratch rebuild, on the fp32 AND the int8 layout (per-row
    scales make the merge exact)."""
    from leccr_tpu.serve import (merge_indexes, quantize_index,
                                 remove_from_index)

    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(8)
    images = rs.randint(0, 255, (9, res, res, 3)).astype(np.uint8)
    captions = [f"a man rides his red bike {i}" for i in range(9)]
    ids = [f"img{i}" for i in range(9)]
    full = embedder.build_image_index(images, captions, ids=ids)
    part = embedder.build_image_index(images[:6], captions[:6], ids=ids[:6])
    new = embedder.build_image_index(images[6:], captions[6:], ids=ids[6:])

    queries = ["a man rides", "red dog"]
    for a, b, oracle in ((part, new, full),
                         (quantize_index(part), quantize_index(new),
                          quantize_index(full))):
        merged = merge_indexes(a, b)
        assert merged.ids == ids and merged.n_valid == 9
        want = embedder.search_texts(queries, oracle, k=5, fusion="raw")
        got = embedder.search_texts(queries, merged, k=5, fusion="raw")
        for w_row, g_row in zip(want, got):
            assert [h[0] for h in w_row] == [h[0] for h in g_row]
            np.testing.assert_allclose([h[1] for h in w_row],
                                       [h[1] for h in g_row], atol=1e-5)

        # remove the middle items: equals an index built without them
        removed = remove_from_index(merged, ["img3", "img4"])
        assert removed.n_valid == 7 and "img3" not in removed.ids
        want = embedder.search_texts(queries, removed, k=7)
        assert all(h[0] not in ("img3", "img4") for h in want[0])

    # contract errors
    with pytest.raises(ValueError, match="duplicate"):
        merge_indexes(part, part)
    with pytest.raises(ValueError, match="quantized"):
        merge_indexes(part, quantize_index(new))
    with pytest.raises(ValueError, match="unknown"):
        remove_from_index(full, ["nope"])


def test_save_overwrite_drops_stale_optional_files(embedder, tmp_path):
    """Re-saving into a directory that previously held a DIFFERENT layout
    must not resurrect the old save's optional arrays: a quantized save
    followed by an fp32 save of the same corpus loads as a consistent fp32
    index (no leftover scale.npy), and a slot-carrying save overwritten by
    a feats-only one loads slotless — the manifest scopes optional files
    to the save that wrote them."""
    from leccr_tpu.serve import load_index, quantize_index, save_index

    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(9)
    images = rs.randint(0, 255, (5, res, res, 3)).astype(np.uint8)
    captions = [f"a red dog in the field {i}" for i in range(5)]
    index = embedder.build_image_index(images, captions)

    d = str(tmp_path / "idx")
    save_index(quantize_index(index), d)
    save_index(index, d)  # overwrite with the fp32 layout
    loaded = load_index(d)
    assert not loaded.quantized and loaded.scale is None
    want = embedder.search_texts(["a red dog"], index, k=3)
    got = embedder.search_texts(["a red dog"], loaded, k=3)
    assert [h[0] for h in want[0]] == [h[0] for h in got[0]]

    # slot-carrying save overwritten by a feats-only index
    feat_only = ImageIndex(feats=index.feats, slots=None, ids=index.ids)
    save_index(feat_only, d)
    loaded = load_index(d)
    assert loaded.slots is None
    with pytest.raises(ValueError, match="slot-carrying"):
        embedder.search_texts(["a red dog"], loaded, k=3, fusion="raw")


def test_search_empty_queries(embedder):
    """Zero queries return an empty result on the unsharded AND the
    row-sharded path (the latter used to np.concatenate([]))."""
    from jax.sharding import Mesh

    from leccr_tpu.serve import shard_index

    feats = jnp.asarray(np.random.RandomState(10).rand(6, 8), jnp.float32)
    idx = ImageIndex(feats=feats, slots=None,
                     ids=[str(i) for i in range(6)])
    assert embedder.search_texts([], idx, k=3) == []
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    assert embedder.search_texts([], shard_index(idx, mesh), k=3) == []


def test_build_index_caption_feats(embedder):
    """build_image_index accepts precomputed per-token caption FEATURE
    arrays (`generated_caption_type: feats`, the reference's MSCOCO-CN
    `.npy` caption path) — variable-length feats pad to one global width,
    and the result is chunking-invariant (the same corpus embedded at a
    different batch size gives identical embeddings)."""
    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    width = cfg.model.text.hidden_size
    rs = np.random.RandomState(3)
    images = rs.randint(0, 255, (5, res, res, 3)).astype(np.uint8)
    feats = [rs.rand(t, width).astype(np.float32) for t in (3, 7, 5, 2, 6)]
    index = embedder.build_image_index(images, feats,
                                       ids=[f"img{i}" for i in range(5)])
    assert index.feats.shape == (5, cfg.model.embed_dim)

    emb2 = Embedder(cfg, embedder.params, batch_size=2)
    index2 = emb2.build_image_index(images, feats,
                                    ids=[f"img{i}" for i in range(5)])
    np.testing.assert_allclose(np.asarray(index.feats),
                               np.asarray(index2.feats), atol=1e-5)
    np.testing.assert_allclose(np.asarray(index.slots),
                               np.asarray(index2.slots), atol=1e-5)

    hits = embedder.search_texts(["a man rides"], index, k=3)
    assert len(hits[0]) == 3
