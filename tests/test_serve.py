"""Serving API smoke test: embed, index, top-k search round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from leccr_tpu.config import tiny_test_config
from leccr_tpu.data.tokenizers import write_tiny_wordpiece_vocab
from leccr_tpu.models.leccr import LECCRModel
from leccr_tpu.serve import Embedder


@pytest.fixture(scope="module")
def embedder(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    vocab = tmp / "vocab.txt"
    write_tiny_wordpiece_vocab(
        str(vocab), "a man rides his red bike dog field".split())
    cfg = tiny_test_config()
    cfg.data.text_vocab = str(vocab)
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    res = cfg.model.vision.image_res
    batch = {
        "vision": jnp.asarray(rs.rand(1, res, res, 3), jnp.float32),
        "text_ids_s": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "text_mask_s": jnp.ones((1, 8), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "text_mask_t": jnp.ones((1, 8), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "caption_mask": jnp.ones((1, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return Embedder(cfg, params, batch_size=4)


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
