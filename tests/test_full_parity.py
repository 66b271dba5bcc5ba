"""Full-model numerical parity: our LECCRModel vs a torch oracle composed of
HF towers + torch attention blocks with IDENTICAL weights.

This mirrors the reference forward end-to-end
(model_retrieval_caption.py:154-199 up to the feature heads): vision tower →
caption encoding → interaction_with_caption → projections/normalization.
Every weight is converted with models/convert + models/weights, so this test
pins the whole conversion + architecture stack at once."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-dim torch-oracle tower parity
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from leccr_tpu.config import tiny_test_config
from leccr_tpu.models.convert import bert_params, clip_vision_params_from_hf
from leccr_tpu.models.leccr import LECCRModel
from leccr_tpu.models.weights import _convert_reference_head, _graft

D = 64  # vision width == CLIP projection dim
RES, PATCH = 32, 8
TEXT_H = 48
EMBED = 32
NQ = 3
B, L = 2, 10


class TorchOracle(torch.nn.Module):
    """Reference-equivalent forward assembled from torch/HF primitives."""

    def __init__(self):
        super().__init__()
        from transformers import (BertConfig, BertModel, CLIPVisionConfig,
                                  CLIPVisionModelWithProjection)

        torch.manual_seed(7)
        self.vis = CLIPVisionModelWithProjection(CLIPVisionConfig(
            hidden_size=D, intermediate_size=4 * D, num_hidden_layers=2,
            num_attention_heads=4, image_size=RES, patch_size=PATCH,
            projection_dim=D, attn_implementation="eager")).eval()
        self.bert = BertModel(BertConfig(
            vocab_size=200, hidden_size=TEXT_H, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=96,
            max_position_embeddings=64,
            attn_implementation="eager")).eval()
        self.caption_proj = torch.nn.Linear(TEXT_H, D)
        self.caption_proj1 = torch.nn.Linear(D, EMBED)
        self.cproj = torch.nn.Linear(D, D)
        self.vproj = torch.nn.Linear(D, D)
        self.text_proj = torch.nn.Linear(TEXT_H, EMBED)
        self.vision_proj = torch.nn.Linear(D, EMBED)
        self.queries = torch.nn.Parameter(torch.randn(NQ, 1, D) * 0.02)
        # the reference uses nhead=8 for all head attention stacks
        # (model_retrieval_caption.py:47-49)
        self.mha = torch.nn.ModuleList(
            [torch.nn.MultiheadAttention(D, 8) for _ in range(3)])
        self.lin1 = torch.nn.ModuleList(
            [torch.nn.Linear(D, D) for _ in range(3)])
        self.lin2 = torch.nn.ModuleList(
            [torch.nn.Linear(D, D) for _ in range(3)])
        self.norm = torch.nn.ModuleList(
            [torch.nn.LayerNorm(D) for _ in range(3)])

    def _block(self, i, tgt, mem, pad=None):
        # the LECCR post-LN block (reference models/attention.py:41-54),
        # seq-first layout like the reference
        a, _ = self.mha[i](tgt, mem, mem, key_padding_mask=pad)
        h = self.lin2[i](F.gelu(self.lin1[i](a)))
        return self.norm[i](tgt + h)

    @torch.no_grad()
    def forward(self, img, text_ids, text_mask, cap_ids, cap_mask):
        out = self.vis.vision_model(img)
        vis_hidden = self.vis.visual_projection(
            self.vis.vision_model.post_layernorm(out.last_hidden_state))

        cap_hidden = self.bert(cap_ids, attention_mask=cap_mask
                               ).last_hidden_state
        pad = ~cap_mask.bool()

        # seq-first like the reference interaction (:76-84)
        q = self.queries.expand(-1, img.shape[0], -1)
        cap = self.caption_proj(cap_hidden).transpose(0, 1)
        slots = self._block(0, q, cap, pad)
        fused_vis = self._block(1, vis_hidden.transpose(0, 1), slots)
        fused_slots = self._block(2, slots, vis_hidden.transpose(0, 1))

        image_feat = F.normalize(
            self.vision_proj(fused_vis.transpose(0, 1)[:, 0]), dim=-1)
        txt_hidden = self.bert(text_ids, attention_mask=text_mask
                               ).last_hidden_state
        text_feat = F.normalize(self.text_proj(txt_hidden[:, 0]), dim=-1)
        out_slots = self.caption_proj1(fused_slots.transpose(0, 1))
        return image_feat, text_feat, out_slots


@pytest.fixture(scope="module")
def oracle_and_model():
    oracle = TorchOracle()

    cfg = tiny_test_config()
    cfg.model.vision.width = D
    cfg.model.vision.depth = 2
    cfg.model.vision.image_res = RES
    cfg.model.vision.variant = "ViT-B/32"
    cfg.model.text.vocab_size = 200
    cfg.model.text.hidden_size = TEXT_H
    cfg.model.text.num_layers = 2
    cfg.model.text.num_heads = 4
    cfg.model.text.intermediate_size = 96
    cfg.model.text.max_position_embeddings = 64
    cfg.model.embed_dim = EMBED
    cfg.model.num_queries = NQ
    cfg.model.caption_ca_layer = 1
    cfg.model.caption_interaction_layer = 1
    cfg.model.dropout = 0.1  # inert at deterministic=True

    # patch: our ViT-B/32 variant has patch 32; override via a custom variant
    from leccr_tpu.models import clip as clip_mod

    clip_mod.CLIP_VARIANTS["test/8"] = clip_mod.CLIPVariant(
        D, 2, 4, PATCH, D, D, 2, 4)
    cfg.model.vision.variant = "test/8"

    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    batch = {
        "vision": jnp.asarray(rs.randn(B, RES, RES, 3), jnp.float32),
        "text_ids_s": jnp.asarray(rs.randint(1, 199, (B, L))),
        "text_mask_s": jnp.ones((B, L), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, 199, (B, L))),
        "text_mask_t": jnp.ones((B, L), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, 199, (B, L))),
        "caption_mask": jnp.asarray(
            np.concatenate([np.ones((B, 7)), np.zeros((B, L - 7))], 1)
            .astype(np.int32)),
    }
    params = jax.tree.map(
        np.asarray,
        model.init({"params": jax.random.PRNGKey(0)}, batch)["params"])

    # ---- weight conversion: towers --------------------------------------
    vis_params = clip_vision_params_from_hf(dict(oracle.vis.state_dict()), 2)
    g, bad = _graft(params["vision_tower"], vis_params)
    assert not [x for x in bad if x.startswith("shape")], bad
    bert_conv = bert_params(dict(oracle.bert.state_dict()), 2)
    g, bad = _graft(params["text_encoder"], bert_conv)
    assert not [x for x in bad if x.startswith("shape")], bad

    # ---- head: reference-style state_dict -> converter -------------------
    sd = {}
    for name in ("caption_proj", "caption_proj1", "cproj", "vproj",
                 "text_proj", "vision_proj"):
        mod = getattr(oracle, name)
        sd[f"{name}.weight"] = mod.weight.detach()
        sd[f"{name}.bias"] = mod.bias.detach()
    sd["queries"] = oracle.queries.detach()
    sd["temp"] = torch.tensor(0.07)
    for stack, i in (("crossattn_query", 0), ("crossattn", 1),
                     ("crossattn2", 2)):
        for k, v in oracle.mha[i].state_dict().items():
            sd[f"{stack}.layers.0.multihead_attn.{k}"] = v
        sd[f"{stack}.layers.0.linear1.weight"] = oracle.lin1[i].weight.detach()
        sd[f"{stack}.layers.0.linear1.bias"] = oracle.lin1[i].bias.detach()
        sd[f"{stack}.layers.0.linear2.weight"] = oracle.lin2[i].weight.detach()
        sd[f"{stack}.layers.0.linear2.bias"] = oracle.lin2[i].bias.detach()
        sd[f"{stack}.layers.0.norm2.weight"] = oracle.norm[i].weight.detach()
        sd[f"{stack}.layers.0.norm2.bias"] = oracle.norm[i].bias.detach()
    head = _convert_reference_head(sd)
    g, bad = _graft(params, head)
    assert not [x for x in bad if x.startswith("shape")], bad

    return oracle, model, params, batch


def test_full_forward_parity(oracle_and_model):
    oracle, model, params, batch = oracle_and_model
    img_t = torch.tensor(
        np.asarray(batch["vision"]).transpose(0, 3, 1, 2))
    want_img, want_txt, want_slots = oracle(
        img_t,
        torch.tensor(np.asarray(batch["text_ids_s"])),
        torch.tensor(np.asarray(batch["text_mask_s"])),
        torch.tensor(np.asarray(batch["caption_ids"])),
        torch.tensor(np.asarray(batch["caption_mask"])))

    emb = model.apply({"params": params}, batch)
    np.testing.assert_allclose(
        np.asarray(emb.image_feat), want_img.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(emb.text_feat_s), want_txt.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(emb.slots), want_slots.numpy(), atol=2e-4)
