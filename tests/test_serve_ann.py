"""IVF approximate-NN index: exactness anchor, recall, packing
invariants, int8 parity, persistence, and the Embedder search path."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from leccr_tpu.serve import ImageIndex
from leccr_tpu.serve_ann import (IVFIndex, build_ivf_index, load_ivf,
                                 quantize_ivf, save_ivf, search_texts_ivf)


def _clustered_feats(n, e, n_concepts, rs, spread=0.15, cents=None):
    """L2-normalized rows drawn around n_concepts random directions —
    the cluster structure real retrieval embeddings have (uniform random
    high-dim data is the known IVF worst case and not the serving
    workload).  Pass `cents` to draw queries from the SAME concept
    mixture as a corpus."""
    if cents is None:
        cents = rs.randn(n_concepts, e)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    x = cents[rs.randint(0, n_concepts, n)] + spread * rs.randn(n, e)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def corpus():
    rs = np.random.RandomState(0)
    cents = rs.randn(12, 32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    feats = _clustered_feats(512, 32, 12, rs, cents=cents)
    index = ImageIndex(feats=jnp.asarray(feats), slots=None,
                       ids=[f"item{i}" for i in range(512)])
    return feats, index, cents


@pytest.fixture(scope="module")
def ivf(corpus):
    _, index, _ = corpus
    return build_ivf_index(index, n_clusters=16, iters=10, seed=0)


def _exact_topk(feats, q, k):
    s = q @ feats.T
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def _ivf_search_embedded(ivf, q, k, nprobe):
    """Search with raw query embeddings (no text model) via the jitted
    core, mirroring what search_texts_ivf runs after embed."""
    import jax

    from leccr_tpu.serve_ann import _ivf_topk

    f = jax.jit(lambda qq: _ivf_topk(
        qq, (ivf.centroids, ivf.packed, ivf.valid, ivf.rows, ivf.scale),
        k, nprobe))
    s, i = f(jnp.asarray(q))
    return np.asarray(s), np.asarray(i)


def test_packing_places_every_row_exactly_once(ivf, corpus):
    feats = corpus[0]
    rows = np.asarray(ivf.rows)
    valid = np.asarray(ivf.valid)
    placed = rows[valid]
    assert placed.shape[0] == feats.shape[0]
    assert len(np.unique(placed)) == feats.shape[0]
    # packed bank actually holds the named rows
    packed = np.asarray(ivf.packed)
    np.testing.assert_allclose(packed[valid], feats[placed], atol=1e-6)
    # capacity is sublane-aligned
    assert ivf.capacity % 8 == 0


def test_full_probe_is_exact(ivf, corpus):
    """nprobe == n_clusters probes every cluster; every row is packed
    exactly once, so the result must equal brute-force top-k."""
    feats, _, cents = corpus
    rs = np.random.RandomState(1)
    q = _clustered_feats(9, 32, 12, rs, cents=cents)
    es, ei = _exact_topk(feats, q, k=10)
    s, i = _ivf_search_embedded(ivf, q, k=10, nprobe=ivf.n_clusters)
    np.testing.assert_allclose(s, es, atol=1e-5)
    # ids match wherever scores are untied (ties may legally reorder)
    untied = np.abs(np.diff(es, axis=1)) > 1e-6
    assert (i[:, :-1] == ei[:, :-1])[untied].mean() > 0.99


def test_partial_probe_recall(ivf, corpus):
    """On concept-clustered data a small probe budget keeps recall high
    (queries drawn from the same concept mixture as the corpus)."""
    feats, _, cents = corpus
    rs = np.random.RandomState(2)
    q = _clustered_feats(32, 32, 12, rs, cents=cents)
    _, ei = _exact_topk(feats, q, k=10)
    recall = {}
    for nprobe in (4, 8):
        _, i = _ivf_search_embedded(ivf, q, k=10, nprobe=nprobe)
        recall[nprobe] = np.mean(
            [len(set(a) & set(b)) / 10.0 for a, b in zip(i, ei)])
    assert recall[4] >= 0.9, f"recall@10={recall[4]:.3f} at nprobe=4/16"
    assert recall[8] >= 0.97, f"recall@10={recall[8]:.3f} at nprobe=8/16"
    assert recall[8] >= recall[4]


def test_blocked_build_matches_dense(corpus, monkeypatch):
    """The production build streams [blk, C] similarity blocks (the full
    [N, C] is 14.9 GiB at 1M×4000); CPU-size corpora fit one block, so
    force tiny blocks to cover the multi-block + row-padding path: the
    exactness anchor and packing invariants must hold identically, and
    pad rows (weight 0) must never be packed or reseed a centroid."""
    import leccr_tpu.serve_ann as sa

    feats, _, cents = corpus
    n = 500  # NOT a multiple of the block: exercises the padded tail
    index = ImageIndex(feats=jnp.asarray(feats[:n]), slots=None,
                       ids=[f"item{i}" for i in range(n)])
    monkeypatch.setattr(sa, "_sim_block_rows", lambda nn, c: 64)
    ivf = build_ivf_index(index, n_clusters=16, iters=10, seed=0)
    assert ivf.n_clusters == 16
    rows = np.asarray(ivf.rows)
    valid = np.asarray(ivf.valid)
    placed = rows[valid]
    assert placed.shape[0] == n and len(np.unique(placed)) == n
    assert placed.max() < n  # pad rows (>= n) never packed
    # centroids are unit-norm (a pad-row reseed would break this only if
    # a zero row sneaked in; unit check guards the weighting)
    norms = np.linalg.norm(np.asarray(ivf.centroids), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    rs = np.random.RandomState(4)
    q = _clustered_feats(9, 32, 12, rs, cents=cents)
    es, ei = _exact_topk(feats[:n], q, k=10)
    s, i = _ivf_search_embedded(ivf, q, k=10, nprobe=ivf.n_clusters)
    np.testing.assert_allclose(s, es, atol=1e-5)
    untied = np.abs(np.diff(es, axis=1)) > 1e-6
    assert (i[:, :-1] == ei[:, :-1])[untied].mean() > 0.99


def test_int8_ivf_matches_f32_ordering(ivf, corpus):
    cents = corpus[2]
    q8 = quantize_ivf(ivf)
    assert q8.packed.dtype == jnp.int8 and q8.scale.shape == (
        ivf.n_clusters, ivf.capacity)
    rs = np.random.RandomState(3)
    q = _clustered_feats(8, 32, 12, rs, cents=cents)
    sf, idf = _ivf_search_embedded(ivf, q, k=5, nprobe=ivf.n_clusters)
    sq, idq = _ivf_search_embedded(q8, q, k=5, nprobe=ivf.n_clusters)
    np.testing.assert_allclose(sq, sf, atol=5e-3)
    untied = np.abs(np.diff(sf, axis=1)) > 1e-2
    assert (idq[:, :-1] == idf[:, :-1])[untied].mean() > 0.95
    # quantize is idempotent
    assert quantize_ivf(q8) is q8


def test_calibrate_nprobe(ivf, corpus):
    """calibrate_nprobe returns the smallest nprobe meeting the target
    on the self-query sample; the stamped default drives nprobe=None
    searches; quantize/save/load carry it."""
    import dataclasses

    from leccr_tpu.serve_ann import calibrate_nprobe

    nprobe, recall = calibrate_nprobe(ivf, target_recall=0.9, k=10,
                                      sample=64, seed=3)
    assert 1 <= nprobe <= ivf.n_clusters
    assert recall >= 0.9
    # concept-clustered corpus: a fraction of the clusters suffices
    assert nprobe < ivf.n_clusters
    # minimality: one probe fewer misses the target (same sample/seed)
    if nprobe > 1:
        _, r_below = calibrate_nprobe(ivf, target_recall=recall,
                                      k=10, sample=64, seed=3)
        # re-calibrating AT the achieved recall returns the same point
        assert _ == nprobe and r_below == recall
    # a 100% target on clustered data is reachable only near full probe;
    # the ladder must still terminate and satisfy the target or hit C
    n_all, r_all = calibrate_nprobe(ivf, target_recall=1.0, k=10,
                                    sample=64, seed=3)
    assert r_all == 1.0 or n_all == ivf.n_clusters
    with pytest.raises(ValueError, match="target_recall"):
        calibrate_nprobe(ivf, target_recall=0.0)
    # stamped default is honored by nprobe=None (full-probe default on a
    # C=16 index would otherwise be min(8, C)=8 — set it to C and check
    # the None-search is exact)
    stamped = dataclasses.replace(ivf, default_nprobe=ivf.n_clusters)
    assert quantize_ivf(stamped).default_nprobe == ivf.n_clusters


def test_save_load_keeps_default_nprobe(ivf, tmp_path):
    import dataclasses

    stamped = dataclasses.replace(ivf, default_nprobe=5)
    p = str(tmp_path / "ivf_np")
    save_ivf(stamped, p)
    assert load_ivf(p).default_nprobe == 5
    # un-stamped saves load with no default
    save_ivf(ivf, p)
    assert load_ivf(p).default_nprobe is None


def test_save_load_roundtrip(ivf, tmp_path):
    p = str(tmp_path / "ivf")
    save_ivf(ivf, p)
    back = load_ivf(p)
    assert back.ids == ivf.ids
    np.testing.assert_array_equal(np.asarray(back.rows),
                                  np.asarray(ivf.rows))
    np.testing.assert_allclose(np.asarray(back.packed),
                               np.asarray(ivf.packed))
    np.testing.assert_allclose(np.asarray(back.centroids),
                               np.asarray(ivf.centroids))
    assert back.scale is None

    # int8 save keeps the scale; a second fp32 save over the same dir
    # must not resurrect it (manifest scoping, as serve.save_index)
    save_ivf(quantize_ivf(ivf), p)
    assert load_ivf(p).quantized
    save_ivf(ivf, p)
    again = load_ivf(p)
    assert not again.quantized

    # a non-ivf directory is rejected
    other = tmp_path / "notivf"
    other.mkdir()
    (other / "manifest.json").write_text(json.dumps({"optional": [],
                                                     "n": 0}))
    with pytest.raises(ValueError, match="not an IVF"):
        load_ivf(str(other))


def test_build_rejects_bad_inputs(corpus):
    from leccr_tpu.serve import quantize_index

    index = corpus[1]
    with pytest.raises(ValueError, match="fp32"):
        build_ivf_index(quantize_index(index), n_clusters=4)
    with pytest.raises(ValueError, match="n_clusters"):
        build_ivf_index(index, n_clusters=0)
    with pytest.raises(ValueError, match="n_clusters"):
        build_ivf_index(index, n_clusters=10_000)
    # capacity_factor < 1 breaks _pack's total-capacity >= N invariant;
    # reject it up front instead of crashing in the spill path
    with pytest.raises(ValueError, match="capacity_factor"):
        build_ivf_index(index, n_clusters=4, capacity_factor=0.5)


def test_k_beyond_candidate_pool(embedder):
    """k larger than nprobe·capacity must clamp (not crash the top_k),
    and rows whose probed clusters hold fewer than k live rows must come
    back SHORT — never padded with bogus (ids[0], -inf) entries."""
    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(11)
    images = rs.randint(0, 255, (24, res, res, 3)).astype(np.uint8)
    caps = [f"a man rides his red bike {i}" for i in range(24)]
    index = embedder.build_image_index(images, caps,
                                       ids=[f"img{i}" for i in range(24)])
    ivf = build_ivf_index(index, n_clusters=6, iters=5)
    assert ivf.capacity < 24  # clusters can't each hold the whole corpus
    rows = search_texts_ivf(embedder, ["a man rides"], ivf, k=24, nprobe=1)
    assert len(rows) == 1
    r = rows[0]
    assert 0 < len(r) <= ivf.capacity        # clamped to the pool
    assert all(np.isfinite(s) for _, s in r)  # pad slots dropped
    ids = [i for i, _ in r]
    assert len(set(ids)) == len(ids)         # no fake row-0 duplicates


def test_batcher_serves_ivf_index(embedder):
    """DynamicBatcher routes to the IVF search path, keys coalescing on
    nprobe, and rejects fusion (no slot bank on an IVF index)."""
    from leccr_tpu.serve_frontend import DynamicBatcher

    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(9)
    images = rs.randint(0, 255, (16, res, res, 3)).astype(np.uint8)
    caps = [f"a man rides his red bike {i}" for i in range(16)]
    index = embedder.build_image_index(images, caps,
                                       ids=[f"img{i}" for i in range(16)])
    ivf = build_ivf_index(index, n_clusters=4, iters=5)
    with DynamicBatcher(embedder, ivf) as b:
        r = b.search(["a man rides"], k=3, nprobe=4)
        assert len(r) == 1 and len(r[0]) == 3
        assert all(i.startswith("img") for i, _ in r[0])
        # default nprobe works; matches the explicit full probe vs exact
        exact = embedder.search_texts(["a man rides"], index, k=3)
        assert [i for i, _ in r[0]] == [i for i, _ in exact[0]]
        with pytest.raises(ValueError, match="slot bank"):
            b.search(["a man"], k=2, fusion="minmax")
    # nprobe on an exact index is rejected
    with DynamicBatcher(embedder, index) as b:
        with pytest.raises(ValueError, match="IVF indexes only"):
            b.search(["a man"], k=2, nprobe=2)


def test_embedder_ivf_search(embedder):
    """End to end through the text tower: IVF search at full probe equals
    the exact Embedder search on the same index."""
    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(5)
    images = rs.randint(0, 255, (24, res, res, 3)).astype(np.uint8)
    caps = [f"a man rides his red bike {i}" for i in range(24)]
    index = embedder.build_image_index(images, caps,
                                       ids=[f"img{i}" for i in range(24)])
    ivf = build_ivf_index(index, n_clusters=4, iters=5)
    queries = ["a man rides", "red dog field"]
    exact = embedder.search_texts(queries, index, k=5)
    ann = search_texts_ivf(embedder, queries, ivf, k=5,
                           nprobe=ivf.n_clusters)
    for e_row, a_row in zip(exact, ann):
        assert [i for i, _ in e_row] == [i for i, _ in a_row]
        np.testing.assert_allclose([s for _, s in e_row],
                                   [s for _, s in a_row], atol=1e-4)
    # partial probe returns well-formed results
    part = search_texts_ivf(embedder, queries, ivf, k=5, nprobe=2)
    assert len(part) == 2 and all(len(r) == 5 for r in part)
    assert search_texts_ivf(embedder, [], ivf) == []
    with pytest.raises(ValueError, match="nprobe"):
        search_texts_ivf(embedder, queries, ivf, nprobe=99)


def test_add_to_ivf_exact_after_merge(corpus):
    """Add a second shard of the corpus to an IVF built on the first:
    every row (old and new) is packed exactly once, the bank holds the
    named rows, and the full probe equals the dense ranker over the
    MERGED corpus — the same exactness anchor the build has."""
    from leccr_tpu.serve_ann import add_to_ivf

    feats, _, cents = corpus
    base = ImageIndex(feats=jnp.asarray(feats[:400]), slots=None,
                      ids=[f"item{i}" for i in range(400)])
    newi = ImageIndex(feats=jnp.asarray(feats[400:]), slots=None,
                      ids=[f"item{i}" for i in range(400, 512)])
    ivf = build_ivf_index(base, n_clusters=16, iters=10, seed=0)
    merged = add_to_ivf(ivf, newi)
    assert merged.n_valid == 512
    assert merged.ids == [f"item{i}" for i in range(512)]
    rows = np.asarray(merged.rows)
    valid = np.asarray(merged.valid)
    placed = rows[valid]
    assert placed.size == 512 and len(np.unique(placed)) == 512
    np.testing.assert_allclose(np.asarray(merged.packed)[valid],
                               feats[placed], atol=1e-6)
    rs = np.random.RandomState(7)
    q = _clustered_feats(9, 32, 12, rs, cents=cents)
    es, ei = _exact_topk(feats, q, k=10)
    s, i = _ivf_search_embedded(merged, q, k=10,
                                nprobe=merged.n_clusters)
    np.testing.assert_allclose(s, es, atol=1e-5)
    untied = np.abs(np.diff(es, axis=1)) > 1e-6
    assert (i[:, :-1] == ei[:, :-1])[untied].mean() > 0.99
    # the original index is untouched (functional update)
    assert ivf.n_valid == 400 and ivf.capacity <= merged.capacity
    # empty add is a no-op; duplicate/sharded/quantized sources rejected
    empty = ImageIndex(feats=jnp.zeros((0, 32)), slots=None, ids=[])
    assert add_to_ivf(merged, empty) is merged
    with pytest.raises(ValueError, match="duplicate"):
        add_to_ivf(merged, base)


def test_add_to_ivf_int8_keeps_existing_bytes(corpus):
    """Adding to a quantized bank is exact for existing rows: their int8
    bytes and per-row scales are bit-identical after the add, and the
    new rows are findable (each new row's fp32 vector retrieves itself
    at full probe)."""
    from leccr_tpu.serve_ann import add_to_ivf

    feats, _, _ = corpus
    base = ImageIndex(feats=jnp.asarray(feats[:400]), slots=None,
                      ids=[f"item{i}" for i in range(400)])
    newi = ImageIndex(feats=jnp.asarray(feats[400:]), slots=None,
                      ids=[f"item{i}" for i in range(400, 512)])
    q8 = quantize_ivf(build_ivf_index(base, n_clusters=16, iters=10,
                                      seed=0))
    before_packed = np.asarray(q8.packed).copy()
    before_scale = np.asarray(q8.scale).copy()
    before_valid = np.asarray(q8.valid).copy()
    merged = add_to_ivf(q8, newi)
    assert merged.quantized and merged.packed.dtype == jnp.int8
    cap0 = q8.capacity
    np.testing.assert_array_equal(
        np.asarray(merged.packed)[:, :cap0][before_valid],
        before_packed[before_valid])
    np.testing.assert_array_equal(
        np.asarray(merged.scale)[:, :cap0][before_valid],
        before_scale[before_valid])
    s, i = _ivf_search_embedded(merged, feats[400:416], k=1,
                                nprobe=merged.n_clusters)
    np.testing.assert_array_equal(i[:, 0], np.arange(400, 416))


def test_add_to_ivf_grows_capacity():
    """A full bank grows its shared capacity (8-aligned) instead of
    failing placement; invariants and exactness hold after the grow."""
    from leccr_tpu.serve_ann import add_to_ivf

    rs = np.random.RandomState(1)
    feats = _clustered_feats(76, 16, 4, rs)
    base = ImageIndex(feats=jnp.asarray(feats[:60]), slots=None,
                      ids=[f"item{i}" for i in range(60)])
    ivf = build_ivf_index(base, n_clusters=4, iters=5,
                          capacity_factor=1.0, seed=0)
    free = ivf.n_clusters * ivf.capacity - 60
    n_new = 76 - 60
    assert free < n_new  # the add below must grow the bank
    newi = ImageIndex(feats=jnp.asarray(feats[60:]), slots=None,
                      ids=[f"item{i}" for i in range(60, 76)])
    merged = add_to_ivf(ivf, newi)
    assert merged.capacity > ivf.capacity
    assert merged.capacity % 8 == 0
    rows = np.asarray(merged.rows)
    valid = np.asarray(merged.valid)
    placed = rows[valid]
    assert placed.size == 76 and len(np.unique(placed)) == 76
    np.testing.assert_allclose(np.asarray(merged.packed)[valid],
                               feats[placed], atol=1e-6)
    s, i = _ivf_search_embedded(merged, feats[:8], k=1,
                                nprobe=merged.n_clusters)
    np.testing.assert_array_equal(i[:, 0], np.arange(8))


def test_remove_from_ivf(ivf, corpus):
    """Removed items never surface, survivors renumber densely, and the
    full probe equals the dense ranker over the surviving corpus."""
    from leccr_tpu.serve_ann import remove_from_ivf

    feats, _, cents = corpus
    drop = [f"item{i}" for i in range(0, 512, 7)]
    kept = remove_from_ivf(ivf, drop)
    survivors = [i for i in range(512) if f"item{i}" not in set(drop)]
    assert kept.n_valid == len(survivors)
    assert kept.ids == [f"item{i}" for i in survivors]
    rows = np.asarray(kept.rows)
    valid = np.asarray(kept.valid)
    placed = rows[valid]
    assert placed.size == len(survivors)
    assert len(np.unique(placed)) == len(survivors)
    keep_feats = feats[survivors]
    np.testing.assert_allclose(np.asarray(kept.packed)[valid],
                               keep_feats[placed], atol=1e-6)
    rs = np.random.RandomState(8)
    q = _clustered_feats(9, 32, 12, rs, cents=cents)
    es, ei = _exact_topk(keep_feats, q, k=10)
    s, i = _ivf_search_embedded(kept, q, k=10, nprobe=kept.n_clusters)
    np.testing.assert_allclose(s, es, atol=1e-5)
    untied = np.abs(np.diff(es, axis=1)) > 1e-6
    assert (i[:, :-1] == ei[:, :-1])[untied].mean() > 0.99
    # the original index is untouched; errors and no-ops
    assert ivf.n_valid == 512
    assert remove_from_ivf(ivf, []) is ivf
    with pytest.raises(ValueError, match="unknown ids"):
        remove_from_ivf(ivf, ["nope"])
    # int8: removal is pure masking — exact on the quantized bank too
    q8 = remove_from_ivf(quantize_ivf(ivf), drop)
    sq, iq = _ivf_search_embedded(q8, q, k=10, nprobe=q8.n_clusters)
    np.testing.assert_allclose(sq, es, atol=5e-3)


def test_remove_then_add_keeps_all_rows(corpus):
    """Regression (round-4 advisor, high): remove-then-add on the same
    bank.  remove_from_ivf must compact each cluster's survivors to a
    slot prefix; without it, a later add_to_ivf (which writes new rows
    at slot indices fill..fill+count-1 with fill = valid.sum) would
    silently overwrite live rows left stranded beyond a hole.  Asserts
    the prefix invariant, the slot bookkeeping (valid.sum == n_valid,
    every global row id placed exactly once), byte integrity of every
    surviving row, and full self-retrieval — on f32 AND int8 banks."""
    from leccr_tpu.serve_ann import add_to_ivf, remove_from_ivf

    feats, _, _ = corpus
    base = ImageIndex(feats=jnp.asarray(feats[:60]), slots=None,
                      ids=[f"item{i}" for i in range(60)])
    drop = [f"item{i}" for i in range(0, 60, 8)]  # 8 scattered removals
    survivors = [i for i in range(60) if f"item{i}" not in set(drop)]
    corpus_feats = np.concatenate([feats[survivors], feats[60:64]])
    for quantize in (False, True):
        ivf = build_ivf_index(base, n_clusters=6, iters=8, seed=0)
        if quantize:
            ivf = quantize_ivf(ivf)
        kept = remove_from_ivf(ivf, drop)
        # prefix-occupancy invariant after remove: every cluster's
        # valid slots are exactly [0, fill)
        v = np.asarray(kept.valid)
        fill = v.sum(axis=1)
        for c in range(v.shape[0]):
            assert v[c, :fill[c]].all() and not v[c, fill[c]:].any()
        newi = ImageIndex(feats=jnp.asarray(feats[60:64]), slots=None,
                          ids=[f"new{i}" for i in range(4)])
        merged = add_to_ivf(kept, newi)
        v = np.asarray(merged.valid)
        rows = np.asarray(merged.rows)
        assert int(v.sum()) == merged.n_valid == len(merged.ids) == 56
        np.testing.assert_array_equal(np.sort(rows[v]), np.arange(56))
        if not quantize:
            np.testing.assert_allclose(np.asarray(merged.packed)[v],
                                       corpus_feats[rows[v]], atol=1e-6)
        # every survivor and every new row retrieves itself at full probe
        s, i = _ivf_search_embedded(merged, corpus_feats, k=1,
                                    nprobe=merged.n_clusters)
        np.testing.assert_array_equal(i[:, 0], np.arange(56))
