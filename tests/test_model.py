"""End-to-end model forward tests on the tiny config (image + video)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leccr_tpu.config import tiny_test_config
from leccr_tpu.models.leccr import LECCRModel
from leccr_tpu.models.losses import compute_losses

B, LT, LC = 8, 16, 16


def _image_batch(rs, cfg):
    res = cfg.model.vision.image_res
    vocab = cfg.model.text.vocab_size
    batch = {
        "vision": jnp.asarray(rs.randn(B, res, res, 3), jnp.float32),
        "text_ids_s": jnp.asarray(rs.randint(1, vocab, (B, LT))),
        "text_mask_s": jnp.ones((B, LT), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, vocab, (B, LT))),
        "text_mask_t": jnp.ones((B, LT), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, vocab, (B, LC))),
        "caption_mask": jnp.ones((B, LC), jnp.int32),
    }
    return batch


@pytest.fixture(scope="module")
def image_setup():
    cfg = tiny_test_config()
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    batch = _image_batch(rs, cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch)["params"]
    return cfg, model, params, batch


def test_image_forward_and_losses(image_setup):
    cfg, model, params, batch = image_setup
    emb = model.apply({"params": params}, batch)
    assert emb.image_feat.shape == (B, cfg.model.embed_dim)
    assert emb.slots.shape == (B, cfg.model.num_queries, cfg.model.embed_dim)
    # features are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb.image_feat), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb.text_feat_s), axis=-1), 1.0, atol=1e-5)

    idx = jnp.asarray([0, 0, 1, 2, 3, 4, 5, 6])
    out = compute_losses(
        emb, idx,
        weight_caption_loss=cfg.model.weight_caption_loss,
        weight_reg_loss=cfg.model.weight_reg_loss,
        weight_dstl_loss=cfg.model.weight_dstl_loss,
        weight_cv_loss=cfg.model.weight_cv_loss)
    assert np.isfinite(float(out["total"]))


def test_forward_is_deterministic(image_setup):
    _, model, params, batch = image_setup
    e1 = model.apply({"params": params}, batch)
    e2 = model.apply({"params": params}, batch)
    np.testing.assert_array_equal(np.asarray(e1.image_feat),
                                  np.asarray(e2.image_feat))


def test_caption_encoder_shares_text_tower_and_is_stopgrad(image_setup):
    """mbert caption encoder = the text tower (reference
    model_retrieval_caption.py:34-36): no separate caption params exist, and
    no gradient flows into the text tower through the caption branch."""
    cfg, model, params, batch = image_setup
    assert "caption_encoder" not in params  # shared module: no extra params

    def caption_only_loss(p):
        emb = model.apply({"params": p}, batch)
        # ori_slots depend on the caption embeds (stop_gradient) and on the
        # caption-branch params (crossattn_query etc.)
        return jnp.sum(emb.ori_slots ** 2)

    grads = jax.grad(caption_only_loss)(params)
    # the text encoder gets NO grads from the caption path
    text_grad_norm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))),
        grads["text_encoder"], 0.0)
    assert text_grad_norm == 0.0
    # but the caption branch itself does
    ca_grad_norm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))),
        grads["crossattn_query"], 0.0)
    assert ca_grad_norm > 0.0


def test_eval_embeddings(image_setup):
    cfg, model, params, batch = image_setup
    img_out = model.apply({"params": params}, batch, method="embed_images")
    assert img_out["feat"].shape == (B, cfg.model.embed_dim)
    txt = model.apply({"params": params}, batch["text_ids_s"],
                      batch["text_mask_s"], method="embed_texts")
    assert txt.shape == (B, cfg.model.embed_dim)


def test_video_forward():
    cfg = tiny_test_config()
    cfg.model.vision.kind = "temporal"
    cfg.model.vision.frame_feat_dim = 48
    cfg.model.vision.num_layers = 1
    cfg.model.vision.num_heads = 4
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(1)
    T = 6
    vocab = cfg.model.text.vocab_size
    mask = np.ones((B, T), bool)
    mask[:, 4:] = False
    batch = {
        "vision": jnp.asarray(rs.randn(B, T, 48), jnp.float32),
        "vision_mask": jnp.asarray(mask),
        "text_ids_s": jnp.asarray(rs.randint(1, vocab, (B, LT))),
        "text_mask_s": jnp.ones((B, LT), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, vocab, (B, LT))),
        "text_mask_t": jnp.ones((B, LT), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, vocab, (B, LC))),
        "caption_mask": jnp.ones((B, LC), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch)["params"]
    emb = model.apply({"params": params}, batch)
    assert emb.image_feat.shape == (B, cfg.model.embed_dim)
    idx = jnp.arange(B)
    out = compute_losses(
        emb, idx, weight_caption_loss=0.01, weight_reg_loss=0.01,
        weight_dstl_loss=0.5, weight_cv_loss=0.01, num_blocks=2,
        cv_loss_local=True)
    assert np.isfinite(float(out["total"]))


def test_remat_matches_non_remat():
    """jax.checkpoint on tower blocks must not change values."""
    cfg = tiny_test_config()
    cfg.model.remat = False
    rs = np.random.RandomState(3)
    batch = _image_batch(rs, cfg)
    m1 = LECCRModel(cfg.model)
    params = m1.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    e1 = m1.apply({"params": params}, batch)

    cfg2 = tiny_test_config()
    cfg2.model.remat = True
    m2 = LECCRModel(cfg2.model)
    e2 = m2.apply({"params": params}, batch)
    np.testing.assert_allclose(np.asarray(e1.image_feat),
                               np.asarray(e2.image_feat), atol=1e-6)
    # and gradients still flow
    g = jax.grad(lambda p: float(0) + jnp.sum(
        m2.apply({"params": p}, batch).image_feat))(params)
    assert np.isfinite(
        float(jnp.sum(jnp.abs(g["text_proj"]["kernel"]))))


def test_caption_feats_path():
    """generated_caption_type='feats': precomputed per-token caption
    features bypass the caption encoder (reference
    retrieval_dataset.py:67-69 + model branch)."""
    cfg = tiny_test_config()
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(2)
    res = cfg.model.vision.image_res
    vocab = cfg.model.text.vocab_size
    T = 5
    batch = {
        "vision": jnp.asarray(rs.randn(B, res, res, 3), jnp.float32),
        "text_ids_s": jnp.asarray(rs.randint(1, vocab, (B, LT))),
        "text_mask_s": jnp.ones((B, LT), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, vocab, (B, LT))),
        "text_mask_t": jnp.ones((B, LT), jnp.int32),
        # precomputed caption features at text-tower width
        "caption_feats": jnp.asarray(
            rs.randn(B, T, cfg.model.text.hidden_size), jnp.float32),
        "caption_mask": jnp.asarray(
            np.concatenate([np.ones((B, 3)), np.zeros((B, T - 3))], 1)
            .astype(np.int32)),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    emb = model.apply({"params": params}, batch)
    assert np.isfinite(np.asarray(emb.image_feat)).all()
    # no gradient flows into anything through the caption features
    g = jax.grad(lambda p: jnp.sum(
        model.apply({"params": p}, batch).ori_slots ** 2))(params)
    assert float(sum(jnp.sum(jnp.abs(x))
                     for x in jax.tree.leaves(g["text_encoder"]))) == 0.0

    # eval path too
    out = model.apply({"params": params}, batch, method="embed_images")
    assert out["feat"].shape == (B, cfg.model.embed_dim)
