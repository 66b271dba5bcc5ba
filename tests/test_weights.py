"""Weight-import: reference-format torch checkpoints → our param tree
(models/weights.py), verified numerically through the converted modules."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from leccr_tpu.config import tiny_test_config
from leccr_tpu.models.leccr import LECCRModel
from leccr_tpu.models.weights import (
    _convert_reference_head,
    load_reference_checkpoint_into,
)


def _reference_like_head_state(d_model=64, n_q=4, embed=32, text_w=64):
    """A torch state_dict with the reference's head module names
    (model_retrieval_caption.py:43-53, xvlm.py:167-177)."""
    torch.manual_seed(0)
    sd = {}

    def lin(name, i, o):
        layer = torch.nn.Linear(i, o)
        sd[f"{name}.weight"] = layer.weight.detach()
        sd[f"{name}.bias"] = layer.bias.detach()

    lin("caption_proj", text_w, d_model)
    lin("caption_proj1", d_model, embed)
    lin("cproj", d_model, d_model)
    lin("vproj", d_model, d_model)
    lin("text_proj", text_w, embed)
    lin("vision_proj", d_model, embed)
    sd["queries"] = torch.randn(n_q, 1, d_model)
    sd["temp"] = torch.tensor(0.07)
    for stack, layers in (("crossattn_query", 1), ("crossattn", 1),
                          ("crossattn2", 1)):
        for i in range(layers):
            mha = torch.nn.MultiheadAttention(d_model, 4)
            for k, v in mha.state_dict().items():
                sd[f"{stack}.layers.{i}.multihead_attn.{k}"] = v
            lin(f"{stack}.layers.{i}.linear1", d_model, d_model)
            lin(f"{stack}.layers.{i}.linear2", d_model, d_model)
            norm = torch.nn.LayerNorm(d_model)
            sd[f"{stack}.layers.{i}.norm2.weight"] = norm.weight.detach()
            sd[f"{stack}.layers.{i}.norm2.bias"] = norm.bias.detach()
    return sd


def test_convert_reference_head_maps_everything():
    sd = _reference_like_head_state()
    head = _convert_reference_head(sd)
    assert set(head) >= {"caption_proj", "caption_proj1", "cproj", "vproj",
                         "text_proj", "vision_proj", "queries", "temp",
                         "crossattn_query", "crossattn", "crossattn2"}
    np.testing.assert_allclose(
        head["caption_proj"]["kernel"],
        sd["caption_proj.weight"].numpy().T)
    assert head["queries"].shape == (4, 64)
    assert head["temp"].shape == ()
    layer = head["crossattn"]["layer_0"]
    assert set(layer) == {"attn", "ffn", "norm"}
    assert layer["attn"]["q_proj"]["kernel"].shape == (64, 64)


def test_load_reference_checkpoint_into_model(tmp_path):
    cfg = tiny_test_config()
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    batch = {
        "vision": jnp.asarray(rs.randn(2, 64, 64, 3), jnp.float32),
        "text_ids_s": jnp.asarray(rs.randint(1, 512, (2, 8))),
        "text_mask_s": jnp.ones((2, 8), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, 512, (2, 8))),
        "text_mask_t": jnp.ones((2, 8), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, 512, (2, 8))),
        "caption_mask": jnp.ones((2, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]

    sd = _reference_like_head_state(
        d_model=64, n_q=cfg.model.num_queries, embed=cfg.model.embed_dim,
        text_w=cfg.model.text.hidden_size)
    ckpt_path = tmp_path / "checkpoint_best.pth"
    torch.save({"model": sd}, str(ckpt_path))

    new_params = load_reference_checkpoint_into(
        jax.tree.map(np.asarray, params), str(ckpt_path), cfg)
    np.testing.assert_allclose(
        new_params["caption_proj"]["kernel"],
        sd["caption_proj.weight"].numpy().T)
    np.testing.assert_allclose(new_params["temp"], 0.07, rtol=1e-6)
    # model still runs with grafted params
    emb = model.apply({"params": new_params}, batch)
    assert np.isfinite(np.asarray(emb.image_feat)).all()


def _openai_style_clip_sd(width=64, layers=2, patch=32, embed=64, grid=2):
    """state_dict with OpenAI CLIP naming (visual.* / transformer.*)."""
    torch.manual_seed(1)
    sd = {
        "visual.conv1.weight": torch.randn(width, 3, patch, patch),
        "visual.class_embedding": torch.randn(width),
        "visual.positional_embedding": torch.randn(grid * grid + 1, width),
        "visual.proj": torch.randn(width, embed),
        "visual.ln_pre.weight": torch.ones(width),
        "visual.ln_pre.bias": torch.zeros(width),
        "visual.ln_post.weight": torch.ones(width),
        "visual.ln_post.bias": torch.zeros(width),
    }
    for i in range(layers):
        p = f"visual.transformer.resblocks.{i}"
        sd[f"{p}.attn.in_proj_weight"] = torch.randn(3 * width, width)
        sd[f"{p}.attn.in_proj_bias"] = torch.randn(3 * width)
        sd[f"{p}.attn.out_proj.weight"] = torch.randn(width, width)
        sd[f"{p}.attn.out_proj.bias"] = torch.randn(width)
        for ln in ("ln_1", "ln_2"):
            sd[f"{p}.{ln}.weight"] = torch.ones(width)
            sd[f"{p}.{ln}.bias"] = torch.zeros(width)
        sd[f"{p}.mlp.c_fc.weight"] = torch.randn(4 * width, width)
        sd[f"{p}.mlp.c_fc.bias"] = torch.randn(4 * width)
        sd[f"{p}.mlp.c_proj.weight"] = torch.randn(width, 4 * width)
        sd[f"{p}.mlp.c_proj.bias"] = torch.randn(width)
    return sd


def test_load_openai_clip_into(tmp_path):
    from leccr_tpu.models.weights import load_initial_checkpoint

    cfg = tiny_test_config()  # ViT-B/32 variant, width=64, depth=2, res=64
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    batch = {
        "vision": jnp.asarray(rs.randn(1, 64, 64, 3), jnp.float32),
        "text_ids_s": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "text_mask_s": jnp.ones((1, 8), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "text_mask_t": jnp.ones((1, 8), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "caption_mask": jnp.ones((1, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]

    # our tiny config: width 64, 2 layers, patch 32, grid @ res64 = 2
    import leccr_tpu.models.clip as clip_mod

    clip_mod.CLIP_VARIANTS["tiny/32"] = clip_mod.CLIPVariant(
        64, 2, 2, 32, 64, 64, 2, 2)
    cfg.model.vision.variant = "tiny/32"
    sd = _openai_style_clip_sd()
    path = tmp_path / "ViT-tiny.pt"
    torch.save(sd, str(path))
    new = load_initial_checkpoint(str(path), params, cfg)
    np.testing.assert_allclose(
        np.asarray(new["vision_tower"]["proj"]),
        sd["visual.proj"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new["vision_tower"]["conv1"]["kernel"]),
        sd["visual.conv1.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)


def test_load_hf_bert_into(tmp_path):
    from transformers import BertConfig, BertModel

    from leccr_tpu.models.weights import load_initial_checkpoint

    cfg = tiny_test_config()
    cfg.model.text.vocab_size = 128
    cfg.model.text.hidden_size = 64
    cfg.model.text.num_layers = 2
    cfg.model.text.num_heads = 4
    cfg.model.text.intermediate_size = 128
    cfg.model.text.max_position_embeddings = 64
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    batch = {
        "vision": jnp.asarray(rs.randn(1, 64, 64, 3), jnp.float32),
        "text_ids_s": jnp.asarray(rs.randint(1, 128, (1, 8))),
        "text_mask_s": jnp.ones((1, 8), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, 128, (1, 8))),
        "text_mask_t": jnp.ones((1, 8), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, 128, (1, 8))),
        "caption_mask": jnp.ones((1, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]

    torch.manual_seed(2)
    hf = BertModel(BertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64))
    path = tmp_path / "pytorch_model.bin"
    torch.save(hf.state_dict(), str(path))
    new = load_initial_checkpoint(str(path), params, cfg)
    np.testing.assert_allclose(
        np.asarray(new["text_encoder"]["word_embeddings"]["embedding"]),
        hf.embeddings.word_embeddings.weight.detach().numpy(), rtol=1e-6)


def test_load_hf_xlmr_roberta_into(tmp_path):
    """An XLM-R-style checkpoint (RobertaModel weights saved under the
    "roberta." prefix, as XLMRobertaForMaskedLM/-Model emit) must load
    through load_initial_checkpoint into a kind="xlmr" text tower and match
    HF RobertaModel's forward numerically — the text-tower load path of
    BASELINE configs #1/#5 (reference models/xvlm.py:91-103)."""
    from transformers import RobertaConfig, RobertaModel

    from leccr_tpu.models.weights import load_initial_checkpoint

    cfg = tiny_test_config()
    t = cfg.model.text
    t.kind = "xlmr"
    t.vocab_size = 128
    t.hidden_size = 64
    t.num_layers = 2
    t.num_heads = 4
    t.intermediate_size = 128
    t.max_position_embeddings = 66  # 64 + pad offset 2 (HF: max_pos + 2)
    t.type_vocab_size = 1
    t.pad_token_id = 1
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    batch = {
        "vision": jnp.asarray(rs.randn(1, 64, 64, 3), jnp.float32),
        "text_ids_s": jnp.asarray(rs.randint(2, 128, (1, 8))),
        "text_mask_s": jnp.ones((1, 8), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(2, 128, (1, 8))),
        "text_mask_t": jnp.ones((1, 8), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(2, 128, (1, 8))),
        "caption_mask": jnp.ones((1, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]

    torch.manual_seed(7)
    hf = RobertaModel(RobertaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        attn_implementation="eager")).eval()
    # save with the "roberta." prefix + an lm_head distractor, exactly the
    # on-disk layout of HF xlm-roberta-base's pytorch_model.bin
    sd = {f"roberta.{k}": v for k, v in hf.state_dict().items()}
    sd["lm_head.dense.weight"] = torch.zeros(64, 64)
    path = tmp_path / "pytorch_model.bin"
    torch.save(sd, str(path))

    new = load_initial_checkpoint(str(path), params, cfg)
    np.testing.assert_allclose(
        np.asarray(new["text_encoder"]["word_embeddings"]["embedding"]),
        hf.embeddings.word_embeddings.weight.detach().numpy(), rtol=1e-6)

    # end-to-end: our tower with the grafted weights == HF forward
    from leccr_tpu.models.bert import BertEncoder

    ids = np.asarray(batch["text_ids_s"])
    mask = np.ones_like(ids)
    with torch.no_grad():
        want = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
    got = BertEncoder(t).apply(
        {"params": new["text_encoder"]}, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got),
                               want.last_hidden_state.numpy(), atol=1e-4)


def _tiny_image_batch(rs, res=64):
    return {
        "vision": jnp.asarray(rs.randn(2, res, res, 3), jnp.float32),
        "text_ids_s": jnp.asarray(rs.randint(1, 512, (2, 8))),
        "text_mask_s": jnp.ones((2, 8), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, 512, (2, 8))),
        "text_mask_t": jnp.ones((2, 8), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, 512, (2, 8))),
        "caption_mask": jnp.ones((2, 8), jnp.int32),
    }


def test_export_reference_roundtrip_image(tmp_path):
    """export_reference_state_dict is the exact inverse of the (oracle-
    pinned) reference import: export our params to a reference-format
    .pth, re-import into a DIFFERENTLY-initialized tree, and every leaf
    round-trips bit-exact — migration works both ways."""
    from leccr_tpu.models.weights import (export_reference_state_dict,
                                          load_initial_checkpoint,
                                          save_reference_checkpoint)

    cfg = tiny_test_config()
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    batch = _tiny_image_batch(rs)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]

    sd = export_reference_state_dict(params, cfg)
    path = tmp_path / "exported_best.pth"
    save_reference_checkpoint(sd, str(path))
    # the reference's temp is a 0-d parameter (xvlm.py:177) — the save
    # path must not promote it to 1-d
    loaded = torch.load(str(path), map_location="cpu", weights_only=True)
    assert loaded["temp"].ndim == 0

    params2 = model.init({"params": jax.random.PRNGKey(1)}, batch)["params"]
    new = load_initial_checkpoint(str(path), params2, cfg)
    jax.tree_util.tree_map_with_path(
        lambda kp, a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(kp)),
        jax.tree.map(np.asarray, params), new)
    # the shared caption encoder appears under BOTH reference names
    assert "caption_encoder.embeddings.word_embeddings.weight" in sd
    assert "text_encoder.embeddings.word_embeddings.weight" in sd


def test_export_reference_roundtrip_video(tmp_path):
    from leccr_tpu.models.weights import (export_reference_state_dict,
                                          load_initial_checkpoint,
                                          save_reference_checkpoint)

    cfg = tiny_test_config()
    cfg.model.vision.kind = "temporal"
    cfg.model.vision.frame_feat_dim = 48
    cfg.model.vision.num_layers = 1
    cfg.model.vision.num_heads = 4
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(2)
    T = 6
    batch = {
        "vision": jnp.asarray(rs.randn(2, T, 48), jnp.float32),
        "vision_mask": jnp.ones((2, T), bool),
        "text_ids_s": jnp.asarray(rs.randint(1, 512, (2, 8))),
        "text_mask_s": jnp.ones((2, 8), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, 512, (2, 8))),
        "text_mask_t": jnp.ones((2, 8), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, 512, (2, 8))),
        "caption_mask": jnp.ones((2, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    sd = export_reference_state_dict(params, cfg)
    assert any(k.startswith("vid_encoder.layers.0.") for k in sd)
    path = tmp_path / "exported_video.pth"
    save_reference_checkpoint(sd, str(path))
    params2 = model.init({"params": jax.random.PRNGKey(3)}, batch)["params"]
    new = load_initial_checkpoint(str(path), params2, cfg)
    jax.tree_util.tree_map_with_path(
        lambda kp, a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(kp)),
        jax.tree.map(np.asarray, params), new)


@pytest.mark.slow
def test_run_export_cli(tmp_path):
    """run.py --task export emits a torch-loadable reference-format .pth."""
    import os
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    cfg = tiny_test_config()
    cfg_path = tmp_path / "config.json"
    cfg.save(str(cfg_path))
    out = tmp_path / "exported.pth"
    env = dict(os.environ, LECCR_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "run.py", "--task", "export",
         "--config", str(cfg_path), "--output_dir", str(tmp_path / "o"),
         "--export_path", str(out)],
        cwd=str(repo), env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    sd = torch.load(str(out), map_location="cpu", weights_only=True)
    assert "clip_encoder.visual.conv1.weight" in sd
    assert "temp" in sd and sd["temp"].ndim == 0
