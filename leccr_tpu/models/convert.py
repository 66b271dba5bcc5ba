"""Checkpoint import: OpenAI CLIP / HuggingFace BERT state_dicts → pytrees.

The reference loads OpenAI's torch.jit CLIP archive (clip/clip.py:94-142) and
HF `bert-base-multilingual-cased` at runtime; the equivalent here is an
offline conversion to flax param pytrees (run once, then checkpointed with
orbax).  Position-embedding interpolation for non-native resolutions mirrors
reference clip/model.py:414-419,456-481.

All functions take a flat torch-style state_dict mapping str -> array-like
(torch.Tensor or numpy); torch is only imported inside the loaders so the
package itself has no torch dependency.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from leccr_tpu.models.clip import interpolate_pos_embed


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _dense(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Linear -> flax Dense (kernel is transposed)."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _embed(sd: Mapping[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {"embedding": _np(sd[key])}


def _clip_block(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """One CLIP ResidualAttentionBlock → _ResidualBlock params."""
    return {
        "attn": {
            "in_proj": {
                "kernel": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{prefix}.attn.in_proj_bias"]),
            },
            "out_proj": _dense(sd, f"{prefix}.attn.out_proj"),
        },
        "ln_1": _layernorm(sd, f"{prefix}.ln_1"),
        "ln_2": _layernorm(sd, f"{prefix}.ln_2"),
        "c_fc": _dense(sd, f"{prefix}.mlp.c_fc"),
        "c_proj": _dense(sd, f"{prefix}.mlp.c_proj"),
    }


def _stack_layers(layer_dicts):
    """Per-layer param trees → one tree with a leading layer axis (for
    scan_layers towers)."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *layer_dicts)


def clip_vision_params(
    sd: Mapping[str, Any],
    num_layers: int,
    target_grid: int | None = None,
    prefix: str = "visual",
    scan: bool = False,
) -> Dict[str, Any]:
    """OpenAI CLIP `visual.*` state_dict → CLIPVisionTower params.

    target_grid: patch-grid side at the training resolution (e.g. 12 for
    384/32); the 224-native position embedding is bicubically resampled
    (reference clip/model.py:414-419)."""
    import jax.numpy as jnp

    pos = _np(sd[f"{prefix}.positional_embedding"])
    if target_grid is not None:
        pos = np.asarray(
            interpolate_pos_embed(jnp.asarray(pos), target_grid))
    # torch conv OIHW -> flax HWIO
    conv = _np(sd[f"{prefix}.conv1.weight"]).transpose(2, 3, 1, 0)
    params: Dict[str, Any] = {
        "conv1": {"kernel": conv},
        "class_embedding": _np(sd[f"{prefix}.class_embedding"]),
        "positional_embedding": pos,
        "proj": _np(sd[f"{prefix}.proj"]),
        "ln_pre": _layernorm(sd, f"{prefix}.ln_pre"),
        "ln_post": _layernorm(sd, f"{prefix}.ln_post"),
        "transformer": _clip_transformer(
            [_clip_block(sd, f"{prefix}.transformer.resblocks.{i}")
             for i in range(num_layers)], scan),
    }
    return params


def _clip_transformer(blocks, scan: bool) -> Dict[str, Any]:
    if scan:
        return {"resblocks": {"block": _stack_layers(blocks)}}
    return {f"resblock_{i}": b for i, b in enumerate(blocks)}


def clip_text_params(sd: Mapping[str, Any], num_layers: int,
                     scan: bool = False) -> Dict[str, Any]:
    """OpenAI CLIP text-transformer state_dict → CLIPTextTower params."""
    return {
        "token_embedding": _embed(sd, "token_embedding.weight"),
        "positional_embedding": _np(sd["positional_embedding"]),
        "text_projection": _np(sd["text_projection"]),
        "ln_final": _layernorm(sd, "ln_final"),
        "transformer": _clip_transformer(
            [_clip_block(sd, f"transformer.resblocks.{i}")
             for i in range(num_layers)], scan),
    }


def bert_params(
    sd: Mapping[str, Any], num_layers: int, prefix: str = "",
    scan: bool = False,
) -> Dict[str, Any]:
    """HF BertModel state_dict → BertEncoder params.

    Accepts keys with an optional leading prefix (e.g. "bert.")."""
    p = prefix
    params: Dict[str, Any] = {
        "word_embeddings": _embed(sd, f"{p}embeddings.word_embeddings.weight"),
        "position_embeddings": _embed(
            sd, f"{p}embeddings.position_embeddings.weight"),
        "token_type_embeddings": _embed(
            sd, f"{p}embeddings.token_type_embeddings.weight"),
        "embeddings_ln": _layernorm(sd, f"{p}embeddings.LayerNorm"),
    }
    layers = []
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}"
        layers.append({
            "attention": {
                "query": _dense(sd, f"{lp}.attention.self.query"),
                "key": _dense(sd, f"{lp}.attention.self.key"),
                "value": _dense(sd, f"{lp}.attention.self.value"),
                "out": _dense(sd, f"{lp}.attention.output.dense"),
                "out_ln": _layernorm(sd, f"{lp}.attention.output.LayerNorm"),
            },
            "intermediate": _dense(sd, f"{lp}.intermediate.dense"),
            "output": _dense(sd, f"{lp}.output.dense"),
            "output_ln": _layernorm(sd, f"{lp}.output.LayerNorm"),
        })
    if scan:
        params["layers"] = {"layer": _stack_layers(layers)}
    else:
        for i, layer in enumerate(layers):
            params[f"layer_{i}"] = layer
    return params


def _hf_clip_block(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """HF CLIPEncoderLayer → _ResidualBlock params (separate q/k/v packed
    into the in_proj layout)."""
    qw = _np(sd[f"{prefix}.self_attn.q_proj.weight"]).T
    kw = _np(sd[f"{prefix}.self_attn.k_proj.weight"]).T
    vw = _np(sd[f"{prefix}.self_attn.v_proj.weight"]).T
    qb = _np(sd[f"{prefix}.self_attn.q_proj.bias"])
    kb = _np(sd[f"{prefix}.self_attn.k_proj.bias"])
    vb = _np(sd[f"{prefix}.self_attn.v_proj.bias"])
    return {
        "attn": {
            "in_proj": {"kernel": np.concatenate([qw, kw, vw], axis=1),
                        "bias": np.concatenate([qb, kb, vb])},
            "out_proj": _dense(sd, f"{prefix}.self_attn.out_proj"),
        },
        "ln_1": _layernorm(sd, f"{prefix}.layer_norm1"),
        "ln_2": _layernorm(sd, f"{prefix}.layer_norm2"),
        "c_fc": _dense(sd, f"{prefix}.mlp.fc1"),
        "c_proj": _dense(sd, f"{prefix}.mlp.fc2"),
    }


def clip_vision_params_from_hf(
    sd: Mapping[str, Any],
    num_layers: int,
    target_grid: int | None = None,
    prefix: str = "vision_model",
    projection_key: str = "visual_projection.weight",
    scan: bool = False,
) -> Dict[str, Any]:
    """HF CLIPVisionModel(WithProjection) state_dict → CLIPVisionTower."""
    import jax.numpy as jnp

    pos = _np(sd[f"{prefix}.embeddings.position_embedding.weight"])
    if target_grid is not None:
        pos = np.asarray(interpolate_pos_embed(jnp.asarray(pos), target_grid))
    conv = _np(sd[f"{prefix}.embeddings.patch_embedding.weight"]).transpose(
        2, 3, 1, 0)
    if projection_key in sd:
        proj = _np(sd[projection_key]).T
    else:  # no projection head: identity
        width = conv.shape[-1]
        proj = np.eye(width, dtype=np.float32)
    return {
        "conv1": {"kernel": conv},
        "class_embedding": _np(sd[f"{prefix}.embeddings.class_embedding"]),
        "positional_embedding": pos,
        "proj": proj,
        "ln_pre": _layernorm(sd, f"{prefix}.pre_layrnorm"),
        "ln_post": _layernorm(sd, f"{prefix}.post_layernorm"),
        "transformer": _clip_transformer(
            [_hf_clip_block(sd, f"{prefix}.encoder.layers.{i}")
             for i in range(num_layers)], scan),
    }


def clip_text_params_from_hf(
    sd: Mapping[str, Any],
    num_layers: int,
    prefix: str = "text_model",
    projection_key: str = "text_projection.weight",
) -> Dict[str, Any]:
    """HF CLIPTextModel(WithProjection) state_dict → CLIPTextTower."""
    emb = _np(sd[f"{prefix}.embeddings.token_embedding.weight"])
    if projection_key in sd:
        proj = _np(sd[projection_key]).T
    else:
        proj = np.eye(emb.shape[1], dtype=np.float32)
    return {
        "token_embedding": {"embedding": emb},
        "positional_embedding": _np(
            sd[f"{prefix}.embeddings.position_embedding.weight"]),
        "text_projection": proj,
        "ln_final": _layernorm(sd, f"{prefix}.final_layer_norm"),
        "transformer": {
            f"resblock_{i}": _hf_clip_block(sd, f"{prefix}.encoder.layers.{i}")
            for i in range(num_layers)
        },
    }


def mha_params_from_torch(mha_state: Mapping[str, Any], d_model: int
                          ) -> Dict[str, Any]:
    """torch nn.MultiheadAttention → ops.MultiHeadAttention params
    (packed in_proj split into q/k/v)."""
    w = _np(mha_state["in_proj_weight"])
    b = _np(mha_state["in_proj_bias"])
    qw, kw, vw = w[:d_model], w[d_model:2 * d_model], w[2 * d_model:]
    qb, kb, vb = b[:d_model], b[d_model:2 * d_model], b[2 * d_model:]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": {"kernel": _np(mha_state["out_proj.weight"]).T,
                     "bias": _np(mha_state["out_proj.bias"])},
    }


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint file (plain or torch.jit archive, as used by
    OpenAI CLIP downloads — reference clip/clip.py:126-136)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        return dict(model.state_dict())
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict) and "model" in ckpt:
            ckpt = ckpt["model"]
        if hasattr(ckpt, "state_dict"):
            ckpt = ckpt.state_dict()
        return dict(ckpt)
