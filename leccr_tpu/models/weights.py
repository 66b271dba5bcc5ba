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


def load_openai_clip_into(params: Dict[str, Any], clip_path: str,
                          cfg: LECCRConfig) -> Dict[str, Any]:
    """Load an OpenAI CLIP archive into the vision tower (and the clip text
    tower when it is the caption encoder)."""
    sd = load_torch_state_dict(clip_path)
    var = CLIP_VARIANTS[cfg.model.vision.variant]
    grid = cfg.model.vision.image_res // var.patch_size
    vision = clip_vision_params(sd, var.vision_layers, target_grid=grid)
    import jax

    params = jax.tree.map(np.asarray, params)
    g, b = _graft(params["vision_tower"], vision)
    print(f"### CLIP vision: grafted {len(g)} tensors; issues: {b[:5]}")
    if "clip_text_tower" in params:
        text = clip_text_params(sd, var.text_layers)
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
        vis = clip_vision_params(clip_keys, var.vision_layers,
                                 target_grid=grid)
        g, b = _graft(params["vision_tower"], vis)
        print(f"### ref ckpt vision: {len(g)} tensors; issues: {b[:5]}")
        if "clip_text_tower" in params:
            # caption_encoder_name == "clip": the vendored CLIP text branch
            # is the caption encoder (model_retrieval_caption.py:57-63)
            txt = clip_text_params(clip_keys, var.text_layers)
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
