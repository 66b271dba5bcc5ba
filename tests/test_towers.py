"""Numerical parity of the towers against HuggingFace reference models
(random weights, small configs — fully offline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from leccr_tpu.config import TextConfig
from leccr_tpu.models.bert import BertEncoder
from leccr_tpu.models.clip import (
    CLIPTextTower,
    CLIPVisionTower,
    interpolate_pos_embed,
)
from leccr_tpu.models.convert import (
    bert_params,
    clip_text_params_from_hf,
    clip_vision_params_from_hf,
)


@pytest.mark.slow
def test_bert_matches_hf():
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=200, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=32, attn_implementation="eager")
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    ids = np.random.RandomState(0).randint(0, 200, (3, 10)).astype(np.int64)
    mask = np.ones((3, 10), np.int64)
    mask[:, 7:] = 0
    with torch.no_grad():
        want = hf(torch.tensor(ids),
                  attention_mask=torch.tensor(mask)).last_hidden_state

    cfg = TextConfig(vocab_size=200, hidden_size=48, num_layers=2,
                     num_heads=4, intermediate_size=96,
                     max_position_embeddings=32)
    params = bert_params(dict(hf.state_dict()), num_layers=2)
    got = BertEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_clip_vision_matches_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=48, attn_implementation="eager")
    torch.manual_seed(1)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()

    img = np.random.RandomState(1).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        out = hf.vision_model(torch.tensor(img))
        # our tower output = post_layernorm(hidden) @ proj per token
        hidden = hf.vision_model.post_layernorm(out.last_hidden_state)
        want = hf.visual_projection(hidden)

    params = clip_vision_params_from_hf(dict(hf.state_dict()), num_layers=2)
    tower = CLIPVisionTower(width=64, layers=2, heads=4, patch_size=8,
                            embed_dim=48)
    got = tower.apply({"params": params},
                      jnp.asarray(img.transpose(0, 2, 3, 1)))  # NCHW→NHWC
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)


def test_clip_text_matches_hf():
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    hf_cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        projection_dim=48, attn_implementation="eager")
    torch.manual_seed(2)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    rs = np.random.RandomState(2)
    ids = rs.randint(1, 99, (3, 16)).astype(np.int64)
    ids[:, -1] = 99  # EOT = highest id, pooled via argmax (clip/model.py:357)
    with torch.no_grad():
        out = hf.text_model(torch.tensor(ids))
        want_hidden = hf.text_projection(out.last_hidden_state)
        eot = torch.tensor(ids).argmax(dim=-1)
        want_pooled = want_hidden[torch.arange(3), eot]

    params = clip_text_params_from_hf(dict(hf.state_dict()), num_layers=2)
    tower = CLIPTextTower(width=64, layers=2, heads=4, embed_dim=48,
                          vocab_size=100, context_length=16)
    pooled, hidden = tower.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(hidden), want_hidden.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), want_pooled.numpy(),
                               atol=2e-4)


def test_clip_text_is_causal():
    tower = CLIPTextTower(width=32, layers=2, heads=4, embed_dim=16,
                          vocab_size=50, context_length=12)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 49, (2, 12)))
    params = tower.init(jax.random.PRNGKey(0), ids)["params"]
    _, h1 = tower.apply({"params": params}, ids)
    ids2 = ids.at[:, 8].set(7)  # change a late token
    _, h2 = tower.apply({"params": params}, ids2)
    np.testing.assert_allclose(np.asarray(h1[:, :8]), np.asarray(h2[:, :8]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(h1[:, 8:]), np.asarray(h2[:, 8:]))


def test_pos_embed_interpolation():
    pe = jnp.asarray(np.random.RandomState(0).randn(1 + 7 * 7, 16),
                     jnp.float32)
    # same grid = identity
    np.testing.assert_array_equal(
        np.asarray(interpolate_pos_embed(pe, 7)), np.asarray(pe))
    out = interpolate_pos_embed(pe, 12)
    assert out.shape == (1 + 12 * 12, 16)
    # class token untouched
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(pe[0]))


def test_vision_tower_at_384_resolution_shape():
    """ViT-B/32 @ 384² must emit 145 tokens of width 512 (SURVEY.md §3.2)."""
    tower = CLIPVisionTower(width=32, layers=1, heads=2, patch_size=32,
                            embed_dim=24)
    img = jnp.zeros((1, 384, 384, 3))
    params = tower.init(jax.random.PRNGKey(0), img)["params"]
    out = tower.apply({"params": params}, img)
    assert out.shape == (1, 145, 24)


def test_xlmr_matches_hf_roberta():
    """XLM-R variant: RoBERTa position-id semantics (padding_idx=1) must
    match HF XLMRobertaModel/RobertaModel numerically."""
    from transformers import RobertaConfig, RobertaModel

    hf_cfg = RobertaConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=34, type_vocab_size=1, pad_token_id=1,
        attn_implementation="eager")
    torch.manual_seed(3)
    hf = RobertaModel(hf_cfg).eval()

    ids = np.random.RandomState(4).randint(4, 119, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[:, 6:] = 0
    ids[:, 6:] = 1  # pad token
    with torch.no_grad():
        want = hf(torch.tensor(ids),
                  attention_mask=torch.tensor(mask)).last_hidden_state

    cfg = TextConfig(kind="xlmr", vocab_size=120, hidden_size=48,
                     num_layers=2, num_heads=4, intermediate_size=96,
                     max_position_embeddings=34, type_vocab_size=1,
                     pad_token_id=1)
    params = bert_params(dict(hf.state_dict()), num_layers=2)
    got = BertEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got[:, :6]), want.numpy()[:, :6],
                               atol=1e-4)


def test_bert_scan_layers_matches_hf():
    """scan_layers tower == HF numerics with stacked converted weights."""
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=150, hidden_size=48, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=32, attn_implementation="eager")
    torch.manual_seed(5)
    hf = BertModel(hf_cfg).eval()
    ids = np.random.RandomState(5).randint(0, 150, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    with torch.no_grad():
        want = hf(torch.tensor(ids),
                  attention_mask=torch.tensor(mask)).last_hidden_state

    cfg = TextConfig(vocab_size=150, hidden_size=48, num_layers=3,
                     num_heads=4, intermediate_size=96,
                     max_position_embeddings=32)
    params = bert_params(dict(hf.state_dict()), num_layers=3, scan=True)
    got = BertEncoder(cfg, scan_layers=True).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_clip_scan_layers_matches_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=48, attn_implementation="eager")
    torch.manual_seed(6)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    img = np.random.RandomState(6).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        out = hf.vision_model(torch.tensor(img))
        hidden = hf.vision_model.post_layernorm(out.last_hidden_state)
        want = hf.visual_projection(hidden)

    params = clip_vision_params_from_hf(dict(hf.state_dict()), num_layers=3,
                                        scan=True)
    tower = CLIPVisionTower(width=64, layers=3, heads=4, patch_size=8,
                            embed_dim=48, scan_layers=True)
    got = tower.apply({"params": params},
                      jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4)
