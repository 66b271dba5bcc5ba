"""Dynamic-batching serving frontend: coalescing, isolation, HTTP."""

import json
import pathlib
import sys
import threading
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from leccr_tpu.serve_frontend import DynamicBatcher, ServingFrontend


class FakeIndex:
    n_valid = 7


class FakeEmbedder:
    """Deterministic stand-in: result for query q is [(q, k)] repeated;
    records every dispatch so tests can assert coalescing happened."""

    def __init__(self, batch_size=8):
        self.batch_size = batch_size
        self.calls = []
        self.block_first = threading.Event()
        self.entered_first = threading.Event()
        self._first = True

    def search_texts(self, queries, index, k, fusion, alpha):
        if self._first and not self.block_first.is_set():
            self._first = False
            self.entered_first.set()
            assert self.block_first.wait(timeout=10)
        self.calls.append((list(queries), k, fusion, alpha))
        return [[(q, float(k))] for q in queries]


def test_batcher_coalesces_concurrent_requests():
    """While the worker is busy with request A, requests B/C/D pile up and
    MUST go out as one dispatch (deterministic: the fake blocks call 1)."""
    emb = FakeEmbedder()
    with DynamicBatcher(emb, FakeIndex(), max_delay=0.001) as b:
        results = {}

        def call(name):
            results[name] = b.search([name], k=3)

        ta = threading.Thread(target=call, args=("a",))
        ta.start()
        assert emb.entered_first.wait(timeout=10)  # worker inside call 1
        rest = [threading.Thread(target=call, args=(n,))
                for n in ("b", "c", "d")]
        for t in rest:
            t.start()
        # b/c/d are enqueued before call 1 returns
        while b.stats.queries < 4:
            pass
        emb.block_first.set()
        for t in [ta] + rest:
            t.join(timeout=10)

    assert results == {n: [[(n, 3.0)]] for n in "abcd"}
    assert len(emb.calls) == 2  # ["a"] then ["b","c","d"] coalesced
    assert sorted(emb.calls[1][0]) == ["b", "c", "d"]
    assert b.stats.dispatches == 2 and b.stats.dispatched_queries == 4


def test_batcher_signature_isolation_and_caps():
    """Different (k, fusion, alpha) never share a dispatch (each signature
    is its own compiled program); a single dispatch never exceeds
    max_batch queries; an oversized request still goes through alone."""
    emb = FakeEmbedder(batch_size=4)
    emb.block_first.set()  # no blocking in this test
    with DynamicBatcher(emb, FakeIndex(), max_batch=4, max_delay=0.05) as b:
        outs = []
        threads = [
            threading.Thread(target=lambda: outs.append(
                b.search([f"k3_{i}"], k=3))) for i in range(3)
        ] + [
            threading.Thread(target=lambda: outs.append(
                b.search(["k5"], k=5))),
            threading.Thread(target=lambda: outs.append(
                b.search([f"big{i}" for i in range(6)], k=3))),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
    assert len(outs) == 5
    for queries, k, fusion, alpha in emb.calls:
        assert len({k}) == 1  # homogeneous by construction of the key
        ks = {3.0 if q.startswith(("k3", "big")) else 5.0 for q in queries}
        assert ks == {float(k)}, (queries, k)
        assert len(queries) <= 4 or all(q.startswith("big") for q in queries)


def test_batcher_error_propagates_and_empty_ok():
    class Boom(FakeEmbedder):
        def search_texts(self, *a, **kw):
            raise RuntimeError("index melted")

    emb = Boom()
    with DynamicBatcher(emb, FakeIndex(), max_delay=0.001) as b:
        assert b.search([]) == []
        with pytest.raises(RuntimeError, match="melted"):
            b.search(["q"])
        assert b.stats.errors == 1


def test_http_frontend_roundtrip():
    emb = FakeEmbedder()
    emb.block_first.set()
    with DynamicBatcher(emb, FakeIndex(), max_delay=0.001) as b, \
            ServingFrontend(b) as fe:
        base = f"http://{fe.host}:{fe.port}"

        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            h = json.loads(r.read())
        assert h == {"ok": True, "index_size": 7}

        body = json.dumps({"queries": ["red dog", "field"], "k": 2}).encode()
        req = urllib.request.Request(
            base + "/search", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as r:
            out = json.loads(r.read())
        assert out == {"results": [[["red dog", 2.0]], [["field", 2.0]]]}

        bad = urllib.request.Request(
            base + "/search", data=json.dumps({"queries": "nope"}).encode())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=10)
        assert ei.value.code == 400

        with urllib.request.urlopen(base + "/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["dispatched_queries"] == 2


def test_frontend_real_embedder(embedder):
    """End-to-end through the real tiny Embedder: batched results must
    equal direct search_texts results query-for-query."""
    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(3)
    images = rs.randint(0, 255, (6, res, res, 3)).astype(np.uint8)
    captions = [f"a man rides his red bike {i}" for i in range(6)]
    index = embedder.build_image_index(images, captions,
                                       ids=[f"img{i}" for i in range(6)])
    queries = ["a man rides", "red dog", "field", "his bike"]
    want = embedder.search_texts(queries, index, k=3)

    with DynamicBatcher(embedder, index, max_delay=0.02) as b:
        got = [None] * len(queries)

        def call(i):
            got[i] = b.search([queries[i]], k=3)[0]

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
    for w, g in zip(want, got):
        assert [h[0] for h in w] == [h[0] for h in g]
        np.testing.assert_allclose([h[1] for h in w], [h[1] for h in g],
                                   rtol=1e-5)
    assert b.stats.dispatches <= len(queries)


def test_batcher_overload_sheds_and_recovers():
    """Beyond max_pending queries, search() raises BatcherOverloaded
    immediately (no unbounded queue growth while the worker is busy);
    once the backlog drains, new requests are admitted again."""
    from leccr_tpu.serve_frontend import BatcherOverloaded

    emb = FakeEmbedder()
    with DynamicBatcher(emb, FakeIndex(), max_delay=0.001,
                        max_pending=2) as b:
        results = {}

        def call(name):
            results[name] = b.search([name], k=3)

        ta = threading.Thread(target=call, args=("a",))
        ta.start()
        assert emb.entered_first.wait(timeout=10)  # worker stuck in call 1
        # "a" was already drained from the queue into the dispatch, so two
        # more fit; the third must be shed
        tb = threading.Thread(target=call, args=("b",))
        tc = threading.Thread(target=call, args=("c",))
        tb.start(), tc.start()
        while b.stats.queries < 3:
            pass
        with pytest.raises(BatcherOverloaded):
            b.search(["d"], k=3)
        assert b.stats.rejected == 1
        emb.block_first.set()
        for t in (ta, tb, tc):
            t.join(timeout=10)
        # backlog drained: admission works again
        assert b.search(["e"], k=3) == [[("e", 3.0)]]
    assert results == {n: [[(n, 3.0)]] for n in "abc"}


def test_stats_latency_percentiles():
    emb = FakeEmbedder()
    emb.block_first.set()
    with DynamicBatcher(emb, FakeIndex(), max_delay=0.0) as b:
        for i in range(5):
            b.search([f"q{i}"], k=2)
        d = b.stats_dict()
    assert d["pending_queries"] == 0
    assert d["rejected"] == 0
    assert 0 <= d["latency_p50_s"] <= d["latency_p95_s"] < 10
    assert d["dispatches"] == 5
