"""Initial-weight loading: orbax dirs, OpenAI CLIP archives, HF BERT, and
reference-format torch checkpoints.

Capability parity with the reference init paths: `clip.load('ViT-B/32')`
(models/xvlm.py:83-88), `BertModel.from_pretrained` (:91-103), the
`--checkpoint` strict=False load of a trained LECCR state_dict
(image_Retrieval_caption.py:384-387), and `load_pretrained`'s pos-embed
surgery (models/xvlm.py:106-147).  Loading is partial by design: any subtree
found in the source is converted and grafted; everything else keeps its
fresh initialization, and a summary of missing/unexpected keys is printed
(mirroring the reference's msg.missing_keys report)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np

from leccr_tpu.config import LECCRConfig
from leccr_tpu.models.clip import CLIP_VARIANTS
from leccr_tpu.models.convert import (
    _dense,
    _np,
    bert_params,
    clip_text_params,
    clip_vision_params,
    load_torch_state_dict,
    mha_params_from_torch,
)


def _graft(dst: Dict[str, Any], src: Dict[str, Any], path=""):
    """Copy matching leaves of src into dst; return lists of grafted and
    shape-mismatched paths."""
    grafted, bad = [], []
    for key, val in src.items():
        if key not in dst:
            bad.append(f"unexpected: {path}{key}")
            continue
        if isinstance(val, dict):
            g, b = _graft(dst[key], val, f"{path}{key}/")
            grafted += g
            bad += b
        else:
            if np.shape(dst[key]) != np.shape(val):
                bad.append(
                    f"shape: {path}{key} {np.shape(val)} vs "
                    f"{np.shape(dst[key])}")
            else:
                dst[key] = np.asarray(val, np.float32)
                grafted.append(path + key)
    return grafted, bad


def _n_resblocks(sd: Dict[str, Any], prefix: str, fallback: int) -> int:
    """Layer count of a CLIP transformer stack, inferred from the
    state_dict itself (depth-overridden configs — tests, exported tiny
    towers — carry fewer resblocks than the published variant)."""
    import re

    pat = re.compile(re.escape(prefix) + r"\.resblocks\.(\d+)\.")
    ns = {int(m.group(1)) for k in sd if (m := pat.match(k))}
    return max(ns) + 1 if ns else fallback


def load_openai_clip_into(params: Dict[str, Any], clip_path: str,
                          cfg: LECCRConfig) -> Dict[str, Any]:
    """Load an OpenAI CLIP archive into the vision tower (and the clip text
    tower when it is the caption encoder)."""
    sd = load_torch_state_dict(clip_path)
    var = CLIP_VARIANTS[cfg.model.vision.variant]
    grid = cfg.model.vision.image_res // var.patch_size
    vision = clip_vision_params(
        sd, _n_resblocks(sd, "visual.transformer", var.vision_layers),
        target_grid=grid)
    import jax

    params = jax.tree.map(np.asarray, params)
    g, b = _graft(params["vision_tower"], vision)
    print(f"### CLIP vision: grafted {len(g)} tensors; issues: {b[:5]}")
    if "clip_text_tower" in params:
        text = clip_text_params(
            sd, _n_resblocks(sd, "transformer", var.text_layers))
        g2, b2 = _graft(params["clip_text_tower"], text)
        print(f"### CLIP text: grafted {len(g2)} tensors; issues: {b2[:5]}")
    return params


def load_hf_bert_into(params: Dict[str, Any], bert_path: str,
                      cfg: LECCRConfig) -> Dict[str, Any]:
    """Load a HF BERT-family checkpoint (pytorch_model.bin / dir) into the
    text tower.  Covers BertModel ("bert." or bare prefix) AND
    RobertaModel/XLMRobertaModel ("roberta." or bare prefix, e.g.
    xlm-roberta-base/large — the text tower of the XLM-R BASELINE configs;
    reference models/xvlm.py:91-103).  The RoBERTa position-id offset
    (padding_idx=1, 514-row table) is an architecture property handled by
    TextConfig(kind="xlmr") in models/bert.py:143-148; the weight layout
    is identical to BERT's."""
    path = Path(bert_path)
    if path.is_dir():
        cands = list(path.glob("pytorch_model*.bin")) + list(
            path.glob("*.safetensors"))
        assert cands, f"no checkpoint file under {bert_path}"
        path = cands[0]
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        sd = load_file(str(path))
    else:
        sd = load_torch_state_dict(str(path))
    prefix = next((p for p in ("bert.", "roberta.")
                   if any(k.startswith(p) for k in sd)), "")
    converted = bert_params(sd, cfg.model.text.num_layers, prefix)
    import jax

    params = jax.tree.map(np.asarray, params)
    g, b = _graft(params["text_encoder"], converted)
    print(f"### BERT: grafted {len(g)} tensors; issues: {b[:5]}")
    return params


def _convert_reference_head(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference LECCR state_dict's head modules onto our tree."""
    out: Dict[str, Any] = {}

    def has(k):
        return k in sd

    for ours, theirs in [("caption_proj", "caption_proj"),
                         ("caption_proj1", "caption_proj1"),
                         ("cproj", "cproj"), ("vproj", "vproj"),
                         ("text_proj", "text_proj"),
                         ("vision_proj", "vision_proj")]:
        if has(f"{theirs}.weight"):
            out[ours] = _dense(sd, theirs)
    if has("queries"):
        q = _np(sd["queries"])  # [n, 1, d] -> [n, d]
        out["queries"] = q.reshape(q.shape[0], q.shape[-1])
    if has("temp"):
        out["temp"] = _np(sd["temp"]).reshape(())

    def stack_layers(stack):
        layers = {}
        i = 0
        while has(f"{stack}.layers.{i}.linear1.weight"):
            p = f"{stack}.layers.{i}"
            d_model = _np(sd[f"{p}.linear1.weight"]).shape[0]
            layers[f"layer_{i}"] = {
                "attn": mha_params_from_torch(
                    {"in_proj_weight": sd[f"{p}.multihead_attn.in_proj_weight"],
                     "in_proj_bias": sd[f"{p}.multihead_attn.in_proj_bias"],
                     "out_proj.weight": sd[f"{p}.multihead_attn.out_proj.weight"],
                     "out_proj.bias": sd[f"{p}.multihead_attn.out_proj.bias"]},
                    d_model),
                "ffn": {"linear1": _dense(sd, f"{p}.linear1"),
                        "linear2": _dense(sd, f"{p}.linear2")},
                "norm": {"scale": _np(sd[f"{p}.norm2.weight"]),
                         "bias": _np(sd[f"{p}.norm2.bias"])},
            }
            i += 1
        return layers

    for stack in ("crossattn_query", "crossattn", "crossattn2"):
        layers = stack_layers(stack)
        if layers:
            out[stack] = layers

    # video temporal encoder (reference video_model_retrieval_caption.py:27:
    # SelfAttention(d_model=vision_width) named vid_encoder; same block
    # family — multihead_attn/linear1/linear2/norm2)
    vid = stack_layers("vid_encoder")
    if vid:
        out["vision_tower"] = {"encoder": vid}
    return out


def load_reference_checkpoint_into(
    params: Dict[str, Any], ckpt_path: str, cfg: LECCRConfig
) -> Dict[str, Any]:
    """Load a reference `checkpoint_best.pth` (torch) into our tree:
    towers + caption branch + projections (strict=False semantics)."""
    sd = load_torch_state_dict(ckpt_path)
    import jax

    params = jax.tree.map(np.asarray, params)

    clip_keys = {k[len("clip_encoder."):]: v for k, v in sd.items()
                 if k.startswith("clip_encoder.")}
    if clip_keys:
        var = CLIP_VARIANTS[cfg.model.vision.variant]
        grid = cfg.model.vision.image_res // var.patch_size
        vis = clip_vision_params(
            clip_keys,
            _n_resblocks(clip_keys, "visual.transformer", var.vision_layers),
            target_grid=grid)
        g, b = _graft(params["vision_tower"], vis)
        print(f"### ref ckpt vision: {len(g)} tensors; issues: {b[:5]}")
        if "clip_text_tower" in params:
            # caption_encoder_name == "clip": the vendored CLIP text branch
            # is the caption encoder (model_retrieval_caption.py:57-63)
            txt = clip_text_params(
                clip_keys,
                _n_resblocks(clip_keys, "transformer", var.text_layers))
            g, b = _graft(params["clip_text_tower"], txt)
            print(f"### ref ckpt clip text: {len(g)} tensors; "
                  f"issues: {b[:5]}")

    bert_keys = {k[len("text_encoder."):]: v for k, v in sd.items()
                 if k.startswith("text_encoder.")}
    if bert_keys:
        conv = bert_params(bert_keys, cfg.model.text.num_layers)
        g, b = _graft(params["text_encoder"], conv)
        print(f"### ref ckpt text: {len(g)} tensors; issues: {b[:5]}")

    head = _convert_reference_head(sd)
    g, b = _graft(params, head)
    print(f"### ref ckpt head: {len(g)} tensors; issues: {b[:5]}")
    return params


def load_initial_checkpoint(path: str, params: Any,
                            cfg: LECCRConfig) -> Any:
    """Dispatch on the checkpoint flavor; returns a new params pytree.
    hdfs:// paths are staged to a local temp file first (reference
    utils/torch_io.py:15-31 semantics)."""
    import jax

    if path.startswith("hdfs://"):
        import tempfile

        from leccr_tpu.utils import io as lio

        local = Path(tempfile.mkdtemp(prefix="leccr_ckpt_")) / Path(path).name
        lio.copy(path, str(local))
        path = str(local)
    p = Path(path)
    if p.is_dir() and (p / "_CHECKPOINT_METADATA").exists():
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            str(p), jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params))
        return restored
    sd_probe = load_torch_state_dict(str(p))
    keys = list(sd_probe.keys())
    if any(k.startswith("clip_encoder.") or k.startswith("text_encoder.")
           for k in keys):
        return load_reference_checkpoint_into(params, str(p), cfg)
    if any(k.startswith("visual.") for k in keys):
        return load_openai_clip_into(params, str(p), cfg)
    if any("encoder.layer." in k for k in keys):
        return load_hf_bert_into(params, str(p), cfg)
    raise ValueError(f"unrecognized checkpoint flavor: {path}")


# --------------------------------------------------------------- export


def _torch_dense(dst: Dict[str, Any], prefix: str, p: Dict[str, Any]):
    dst[f"{prefix}.weight"] = np.asarray(p["kernel"], np.float32).T
    if "bias" in p:
        dst[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _torch_ln(dst: Dict[str, Any], prefix: str, p: Dict[str, Any]):
    dst[f"{prefix}.weight"] = np.asarray(p["scale"], np.float32)
    dst[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _unstack_blocks(tree: Dict[str, Any], stacked_key: str,
                    inner_key: str, flat_prefix: str) -> Dict[int, Any]:
    """{flat_prefix}_{i} blocks, or a scan-stacked {stacked_key: {inner_key:
    leaves-with-leading-layer-axis}} tree, → {i: block_params}."""
    if stacked_key in tree:
        import jax

        stacked = tree[stacked_key][inner_key]
        n = np.shape(jax.tree.leaves(stacked)[0])[0]
        return {i: jax.tree.map(lambda x: np.asarray(x)[i], stacked)
                for i in range(n)}
    out = {}
    i = 0
    while f"{flat_prefix}_{i}" in tree:
        out[i] = tree[f"{flat_prefix}_{i}"]
        i += 1
    return out


def _export_clip_blocks(sd: Dict[str, Any], transformer: Dict[str, Any],
                        prefix: str) -> None:
    blocks = _unstack_blocks(transformer, "resblocks", "block", "resblock")
    for i, b in blocks.items():
        p = f"{prefix}.resblocks.{i}"
        sd[f"{p}.attn.in_proj_weight"] = np.asarray(
            b["attn"]["in_proj"]["kernel"], np.float32).T
        sd[f"{p}.attn.in_proj_bias"] = np.asarray(
            b["attn"]["in_proj"]["bias"], np.float32)
        _torch_dense(sd, f"{p}.attn.out_proj", b["attn"]["out_proj"])
        _torch_ln(sd, f"{p}.ln_1", b["ln_1"])
        _torch_ln(sd, f"{p}.ln_2", b["ln_2"])
        _torch_dense(sd, f"{p}.mlp.c_fc", b["c_fc"])
        _torch_dense(sd, f"{p}.mlp.c_proj", b["c_proj"])


def _export_mha(sd: Dict[str, Any], prefix: str, attn: Dict[str, Any]):
    """ops.MultiHeadAttention params → torch nn.MultiheadAttention keys
    (exact inverse of convert.mha_params_from_torch)."""
    qw = np.asarray(attn["q_proj"]["kernel"], np.float32).T
    kw = np.asarray(attn["k_proj"]["kernel"], np.float32).T
    vw = np.asarray(attn["v_proj"]["kernel"], np.float32).T
    sd[f"{prefix}.in_proj_weight"] = np.concatenate([qw, kw, vw], axis=0)
    sd[f"{prefix}.in_proj_bias"] = np.concatenate(
        [np.asarray(attn[k]["bias"], np.float32)
         for k in ("q_proj", "k_proj", "v_proj")])
    _torch_dense(sd, f"{prefix}.out_proj", attn["out_proj"])


def _export_block_stack(sd: Dict[str, Any], stack_params: Dict[str, Any],
                        torch_name: str) -> None:
    """Our cross/self-attention stack → reference `{name}.layers.{i}`
    (models/attention.py block family: multihead_attn/linear1/linear2/
    norm2; the blocks' other norms are dead on the live path and keep the
    reference's init under its strict=False load)."""
    layers = _unstack_blocks(stack_params, "layers", "layer", "layer")
    for i, layer in layers.items():
        p = f"{torch_name}.layers.{i}"
        _export_mha(sd, f"{p}.multihead_attn", layer["attn"])
        _torch_dense(sd, f"{p}.linear1", layer["ffn"]["linear1"])
        _torch_dense(sd, f"{p}.linear2", layer["ffn"]["linear2"])
        _torch_ln(sd, f"{p}.norm2", layer["norm"])


def export_reference_state_dict(params: Dict[str, Any],
                                cfg: LECCRConfig) -> Dict[str, Any]:
    """Trained params → a reference-format torch-style state_dict (numpy
    values; pass through torch.save for a `.pth` the reference's
    strict=False `--checkpoint` load consumes, image_Retrieval_caption.py
    :384-387).  Exact inverse of `load_reference_checkpoint_into` /
    `_convert_reference_head` — migration works BOTH ways: reference
    users can bring trained checkpoints here, and models trained here
    can go back into reference-based eval/deploy stacks.  Only the live
    reference modules are emitted; its dead params (itm_head, unused
    block norms, …) keep their init under strict=False."""
    import jax

    params = jax.tree.map(np.asarray, params)
    sd: Dict[str, Any] = {}

    # towers -------------------------------------------------------------
    if cfg.model.vision.kind == "temporal":
        _export_block_stack(sd, params["vision_tower"]["encoder"],
                            "vid_encoder")
    else:
        v = params["vision_tower"]
        p = "clip_encoder.visual"
        sd[f"{p}.conv1.weight"] = np.asarray(
            v["conv1"]["kernel"], np.float32).transpose(3, 2, 0, 1)
        sd[f"{p}.class_embedding"] = np.asarray(
            v["class_embedding"], np.float32)
        sd[f"{p}.positional_embedding"] = np.asarray(
            v["positional_embedding"], np.float32)
        sd[f"{p}.proj"] = np.asarray(v["proj"], np.float32)
        _torch_ln(sd, f"{p}.ln_pre", v["ln_pre"])
        _torch_ln(sd, f"{p}.ln_post", v["ln_post"])
        _export_clip_blocks(sd, v["transformer"], f"{p}.transformer")

    if "clip_text_tower" in params:
        # caption_encoder_name == "clip": the vendored CLIP text branch
        t = params["clip_text_tower"]
        sd["clip_encoder.token_embedding.weight"] = np.asarray(
            t["token_embedding"]["embedding"], np.float32)
        sd["clip_encoder.positional_embedding"] = np.asarray(
            t["positional_embedding"], np.float32)
        sd["clip_encoder.text_projection"] = np.asarray(
            t["text_projection"], np.float32)
        _torch_ln(sd, "clip_encoder.ln_final", t["ln_final"])
        _export_clip_blocks(sd, t["transformer"], "clip_encoder.transformer")

    if "text_encoder" in params:
        te = params["text_encoder"]
        for name in ("text_encoder", "caption_encoder"):
            # the reference registers the SHARED caption encoder as its own
            # submodule (model_retrieval_caption.py:34-36): emit both names
            p = name
            sd[f"{p}.embeddings.word_embeddings.weight"] = np.asarray(
                te["word_embeddings"]["embedding"], np.float32)
            sd[f"{p}.embeddings.position_embeddings.weight"] = np.asarray(
                te["position_embeddings"]["embedding"], np.float32)
            sd[f"{p}.embeddings.token_type_embeddings.weight"] = np.asarray(
                te["token_type_embeddings"]["embedding"], np.float32)
            _torch_ln(sd, f"{p}.embeddings.LayerNorm", te["embeddings_ln"])
            for i, layer in _unstack_blocks(te, "layers", "layer",
                                            "layer").items():
                lp = f"{p}.encoder.layer.{i}"
                a = layer["attention"]
                _torch_dense(sd, f"{lp}.attention.self.query", a["query"])
                _torch_dense(sd, f"{lp}.attention.self.key", a["key"])
                _torch_dense(sd, f"{lp}.attention.self.value", a["value"])
                _torch_dense(sd, f"{lp}.attention.output.dense", a["out"])
                _torch_ln(sd, f"{lp}.attention.output.LayerNorm", a["out_ln"])
                _torch_dense(sd, f"{lp}.intermediate.dense",
                             layer["intermediate"])
                _torch_dense(sd, f"{lp}.output.dense", layer["output"])
                _torch_ln(sd, f"{lp}.output.LayerNorm", layer["output_ln"])

    # head ----------------------------------------------------------------
    for ours, theirs in [("caption_proj", "caption_proj"),
                         ("caption_proj1", "caption_proj1"),
                         ("cproj", "cproj"), ("vproj", "vproj"),
                         ("text_proj", "text_proj"),
                         ("vision_proj", "vision_proj")]:
        if ours in params:
            _torch_dense(sd, theirs, params[ours])
    if "queries" in params:
        q = np.asarray(params["queries"], np.float32)  # [n, d] -> [n, 1, d]
        sd["queries"] = q[:, None, :]
    if "temp" in params:
        sd["temp"] = np.asarray(params["temp"], np.float32).reshape(())
    for stack in ("crossattn_query", "crossattn", "crossattn2"):
        if stack in params:
            _export_block_stack(sd, params[stack], stack)
    return sd


def save_reference_checkpoint(sd: Dict[str, Any], path: str) -> None:
    """torch.save an exported state_dict.  torch.tensor (not from_numpy)
    copies, so read-only JAX-backed arrays are fine, and it preserves 0-d
    shapes — the reference's `temp` is a scalar parameter (xvlm.py:177)
    that np.ascontiguousarray would promote to 1-d."""
    import torch

    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
               path)
