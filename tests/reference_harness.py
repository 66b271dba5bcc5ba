"""Machinery for running the ACTUAL reference code (/root/reference/LECCR)
offline at tiny scale, for end-to-end trajectory parity.

The reference cannot run as shipped in this environment: it wants
torchvision/timm/ruamel (absent), `transformers.optimization.AdamW`
(removed in transformers>=4.46), network weight downloads, and its
`dataset/__init__.py` imports a module that does not exist in the repo
(SURVEY.md §2b).  Everything here works around that WITHOUT editing the
reference: import stubs, a faithful reimplementation of the historical
transformers AdamW (the optimizer the reference's requirements.txt pins),
and monkeypatched tower builders that construct the reference's OWN model
classes (vendored clip.model.CLIP, HF BertModel) at tiny dims with no
network access.

Used by reference_driver.py (a subprocess, so the reference's top-level
package names `models`/`utils`/`clip`/`dataset` never pollute the test
process) and by tests/test_trajectory_parity.py.
"""

from __future__ import annotations

import importlib.machinery
import math
import sys
import types

REFERENCE_ROOT = "/root/reference/LECCR"

# Dims shared by the reference model and the leccr_tpu config in the parity
# test.  vision_width doubles as the CLIP projection dim (the reference's
# build_clip_encoder reports the projection width as vision_width,
# models/xvlm.py:83-88).
DIMS = dict(
    image_res=32, patch=8, vision_width=64, vision_layers=2,
    vocab=512, text_h=64, text_layers=2, text_heads=4, text_inter=128,
    max_pos=64,
    embed=32, n_queries=3, ca_layer=1, interaction_layer=1,
    seq=12, batch=8, steps=8,
    lr=2e-4, weight_decay=0.02, warmup=2,
    w_caption=0.01, w_reg=0.01, w_dstl=0.5, w_cv=0.01,
    eval_images=8, captions_per_image=2, eval_batch=4,
)


def _mkmod(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = m
    return m


def install_stubs() -> None:
    """Make `import image_Retrieval_caption` (and the model stack) work.

    Must be called BEFORE /root/reference/LECCR is added to sys.path is
    used for imports.  Imports transformers first so its optional-dependency
    probing runs while timm is genuinely absent.
    """
    import torch.nn as nn
    import transformers
    import transformers.optimization as topt

    # ruamel.yaml — only touched by the reference __main__ blocks
    ruamel = _mkmod("ruamel")
    ruamel.yaml = _mkmod("ruamel.yaml")

    # torchvision — the reference only needs transform constructors at
    # import time; our fake loaders supply ready tensors at run time
    tv = _mkmod("torchvision")
    tr = _mkmod("torchvision.transforms")

    class _IM:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    for n in ("Compose", "RandomResizedCrop", "RandomHorizontalFlip",
              "ToTensor", "Normalize", "Resize", "CenterCrop"):
        setattr(tr, n, lambda *a, **k: None)
    tr.InterpolationMode = _IM
    tv.transforms = tr

    # timm — needed only so models/vit.py and models/swin_transformer.py
    # (dead fork residue, SURVEY.md §2b) import cleanly
    _mkmod("timm")
    _mkmod("timm.models")
    tmv = _mkmod("timm.models.vision_transformer")
    tmv._cfg = lambda *a, **k: {}
    tmv.PatchEmbed = type("PatchEmbed", (), {})
    tmr = _mkmod("timm.models.registry")
    tmr.register_model = lambda f: f
    tml = _mkmod("timm.models.layers")
    tml.trunc_normal_ = lambda *a, **k: None
    tml.DropPath = nn.Identity
    tml.to_2tuple = lambda x: (x, x)

    # the module dataset/__init__.py:22 imports but the repo doesn't ship
    pdm = _mkmod("dataset.pretrain_dataset_multilingual")
    for n in ("ImageMultiTextDataset", "RegionMultiTextDataset",
              "ImageMonoTextDataset", "ParaTextDataset"):
        setattr(pdm, n, type(n, (), {}))

    # pkg_resources (removed with setuptools>=81) — clip/clip.py only does
    # `from pkg_resources import packaging` for a version compare
    try:
        import pkg_resources  # noqa: F401
    except ImportError:
        import packaging
        import packaging.version  # noqa: F401

        pr = _mkmod("pkg_resources")
        pr.packaging = packaging

    # ftfy — clip/simple_tokenizer.py imports it; the mbert caption path
    # exercised here never tokenizes through CLIP BPE at run time
    try:
        import ftfy  # noqa: F401
    except ImportError:
        ftfy = _mkmod("ftfy")
        ftfy.fix_text = lambda s: s

    # the optimizer the reference pins (transformers 4.12) — removed from
    # modern transformers; reinstate the historical semantics
    if not hasattr(topt, "AdamW"):
        topt.AdamW = _make_historical_adamw()

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def _historical_adamw_step(self):
    """The transformers<=4.x AdamW update: bias-corrected Adam step, then
    decoupled weight decay applied AFTER the step at rate lr*wd (differs
    from torch.optim.AdamW only at O(lr^2*wd))."""
    import torch

    with torch.no_grad():
        for group in self.param_groups:
            for p in group["params"]:
                if p.grad is None:
                    continue
                g = p.grad
                st = self.state[p]
                if not st:
                    st["step"] = 0
                    st["m"] = torch.zeros_like(p)
                    st["v"] = torch.zeros_like(p)
                m, v = st["m"], st["v"]
                b1, b2 = group["betas"]
                st["step"] += 1
                m.mul_(b1).add_(g, alpha=1.0 - b1)
                v.mul_(b2).addcmul_(g, g, value=1.0 - b2)
                denom = v.sqrt().add_(group["eps"])
                step_size = group["lr"]
                if group["correct_bias"]:
                    step_size *= (math.sqrt(1.0 - b2 ** st["step"])
                                  / (1.0 - b1 ** st["step"]))
                p.addcdiv_(m, denom, value=-step_size)
                if group["weight_decay"] > 0.0:
                    p.add_(p, alpha=-group["lr"] * group["weight_decay"])


def _make_historical_adamw():
    import torch

    class HistoricalAdamW(torch.optim.Optimizer):
        def __init__(self, params, lr=1e-3, betas=(0.9, 0.999), eps=1e-6,
                     weight_decay=0.0, correct_bias=True):
            super().__init__(params, dict(
                lr=lr, betas=betas, eps=eps, weight_decay=weight_decay,
                correct_bias=correct_bias))

        def step(self, closure=None):
            _historical_adamw_step(self)

    return HistoricalAdamW


def ref_config(dims=DIMS) -> dict:
    """The YAML-equivalent config dict the reference entry point builds."""
    return {
        "embed_dim": dims["embed"],
        "temp": 0.07,
        "max_tokens": dims["seq"],
        "use_one_cl_proj_only": False,
        "caption_encoder_name": dims.get("caption_encoder", "mbert"),
        "generated_caption_type": "text",
        "num_queries": dims["n_queries"],
        "caption_ca_layer": dims["ca_layer"],
        "caption_interaction_layer": dims["interaction_layer"],
        "weight_caption_loss": dims["w_caption"],
        "weight_reg_loss": dims["w_reg"],
        "weight_dstl_loss": dims["w_dstl"],
        "weight_cv_loss": dims["w_cv"],
        "batch_size_test_text": 8,
    }


def build_reference_model(dims=DIMS, seed: int = 0):
    """Construct the reference RetrievalModel with tiny OFFLINE towers.

    Replaces models/xvlm.py:83-103 (which hard-code ViT-B/32 downloads and
    bert-base-multilingual-cased) with the same classes at toy dims; all
    dropout is zeroed afterwards so torch-vs-JAX trajectories are
    deterministic and comparable.
    """
    import torch
    from transformers import BertConfig, BertModel

    import clip.model as clip_model
    import models.xvlm as xvlm

    def tiny_clip(config=None):
        torch.manual_seed(seed + 1)
        m = clip_model.CLIP(
            embed_dim=dims["vision_width"],
            image_resolution=dims["image_res"],
            vision_layers=dims["vision_layers"],
            vision_width=dims["vision_width"],
            vision_patch_size=dims["patch"],
            context_length=16, vocab_size=64,
            transformer_width=32, transformer_heads=2, transformer_layers=1)
        return m.float(), dims["vision_width"]

    def tiny_bert(config=None):
        torch.manual_seed(seed + 2)
        cfgb = BertConfig(
            vocab_size=dims["vocab"], hidden_size=dims["text_h"],
            num_hidden_layers=dims["text_layers"],
            num_attention_heads=dims["text_heads"],
            intermediate_size=dims["text_inter"],
            max_position_embeddings=dims["max_pos"],
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            attn_implementation="eager")
        return BertModel(cfgb), dims["text_h"]

    xvlm.build_clip_encoder = tiny_clip
    xvlm.build_text_encoder = tiny_bert

    from models.model_retrieval_caption import RetrievalModel

    torch.manual_seed(seed)
    model = RetrievalModel(ref_config(dims))
    model.init_caption_encoder()
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0
    return model


CLIP_CAPTION_DIMS = dict(
    DIMS,
    caption_encoder="clip",
    clip_ctx=16,    # tiny vendored-CLIP context_length
    clip_vocab=64,  # tiny vendored-CLIP vocab; EOT = highest id per row
)


def make_clip_caption_rows(dims, rows, rs):
    """Replace each batch's caption keys' rows with CLIP-token rows:
    [tokens..., EOT(=vocab-1), 0-padding]; the vendored encode_text pools
    at argmax(ids) (clip/model.py:348-365) and the pad id is 0."""
    import numpy as np

    ctx, vocab = dims["clip_ctx"], dims["clip_vocab"]
    clip_rows = {}
    for key in rows:
        if not key.startswith(("cap", "ec")):
            continue
        length = int(rs.randint(3, ctx))  # leaves room for EOT
        ids = np.zeros(ctx, np.int32)
        ids[:length] = rs.randint(2, vocab - 1, length)
        ids[length] = vocab - 1  # EOT
        clip_rows[key] = ids
    return clip_rows


VIDEO_DIMS = dict(
    DIMS,
    frames=6, frame_dim=64,  # vision_width of the video tower
    vision_layers=1,
    eval_batch=4,
    # the reference's double-sim eval reshapes slot-text sims to
    # [n, B, B] (video_…py:175) — #texts must equal #videos
    captions_per_image=1,
)


def ref_video_config(dims=VIDEO_DIMS) -> dict:
    cfg = ref_config(dims)
    cfg["vision_width"] = dims["frame_dim"]
    cfg["vision_layer"] = dims["vision_layers"]
    return cfg


def build_reference_video_model(dims=VIDEO_DIMS, seed: int = 0):
    """The reference video RetrievalModel with a tiny offline text tower.

    The reference's video path needs two repairs even to import
    (SURVEY.md §2b): models/__init__.py comments out the XVLMBase_video
    export, and models/xvlm_video.py imports the absent models.box_ops.
    Both are supplied here without touching the reference tree."""
    import torch
    from transformers import BertConfig, BertModel

    _mkmod("models.box_ops")  # absent from the repo; only dead bbox losses use it
    import models as ref_models
    import models.xvlm_video as xv

    def tiny_bert(config=None):
        torch.manual_seed(seed + 2)
        cfgb = BertConfig(
            vocab_size=dims["vocab"], hidden_size=dims["text_h"],
            num_hidden_layers=dims["text_layers"],
            num_attention_heads=dims["text_heads"],
            intermediate_size=dims["text_inter"],
            max_position_embeddings=dims["max_pos"],
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            attn_implementation="eager")
        return BertModel(cfgb), dims["text_h"]

    xv.build_text_encoder = tiny_bert
    ref_models.XVLMBase_video = xv.XVLMBase_video

    from models.video_model_retrieval_caption import RetrievalModel

    torch.manual_seed(seed)
    model = RetrievalModel(ref_video_config(dims))
    model.init_caption_encoder()
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0
    return model


def make_video_batches(dims=VIDEO_DIMS, seed: int = 321):
    """Fixed video train batches + eval set (frame features + masks)."""
    import numpy as np

    train_batches, eval_data, rows = make_batches(dims, seed)
    rs = np.random.RandomState(seed + 1)
    B, T, Dv = dims["batch"], dims["frames"], dims["frame_dim"]
    for b in train_batches:
        b["vision"] = rs.randn(B, T, Dv).astype(np.float32)
        mask = np.zeros((B, T), bool)
        for i in range(B):
            mask[i, : rs.randint(2, T + 1)] = True
        b["vision_mask"] = mask
    n = dims["eval_images"]
    eval_data["vision"] = rs.randn(n, T, Dv).astype(np.float32)
    mask = np.zeros((n, T), bool)
    for i in range(n):
        mask[i, : rs.randint(2, T + 1)] = True
    eval_data["vision_mask"] = mask
    return train_batches, eval_data, rows


class TokBatch:
    def __init__(self, input_ids, attention_mask):
        self.input_ids = input_ids
        self.attention_mask = attention_mask

    def to(self, device, **kw):
        return self


class FakeTokenizer:
    """Maps opaque per-sample key strings to pre-tokenized rows, so the
    reference train/eval loops (which call tokenizer(list_of_strings, ...))
    consume exactly the token ids the parity test fixed up front."""

    def __init__(self, rows):
        # rows: key -> (ids[int32 L], mask[int32 L])
        self.rows = rows

    def __call__(self, texts, **kw):
        import numpy as np
        import torch

        ids = np.stack([self.rows[t][0] for t in texts])
        mask = np.stack([self.rows[t][1] for t in texts])
        return TokBatch(torch.tensor(ids, dtype=torch.long),
                        torch.tensor(mask, dtype=torch.long))


def make_batches(dims=DIMS, seed: int = 123):
    """Fixed numpy train batches + eval set, shared by both sides.

    Returns (train_batches, eval_data, rows) where rows feeds FakeTokenizer.
    Images are uint8 HWC; each side applies the CLIP normalization
    ((x/255)-mean)/std itself — asserted identical in the parity test.
    idx contains a duplicate pair per batch to exercise the soft-label ITC
    path (reference models/xvlm.py:283-291).
    """
    import numpy as np

    rs = np.random.RandomState(seed)
    B, L, K = dims["batch"], dims["seq"], dims["steps"]
    vocab = dims["vocab"]
    rows = {}

    def tok_rows(prefix, n, min_len=4):
        keys = []
        for i in range(n):
            length = int(rs.randint(min_len, L + 1))
            ids = np.zeros(L, np.int32)
            ids[:length] = rs.randint(4, vocab, length)
            mask = np.zeros(L, np.int32)
            mask[:length] = 1
            key = f"{prefix}:{i}"
            rows[key] = (ids, mask)
            keys.append(key)
        return keys

    train_batches = []
    for k in range(K):
        idx = np.arange(k * B, (k + 1) * B).astype(np.int32)
        idx[-1] = idx[-3]  # duplicate pair -> soft labels
        train_batches.append({
            "vision": rs.randint(
                0, 256,
                (B, dims["image_res"], dims["image_res"], 3)).astype(np.uint8),
            "text_s": tok_rows(f"ts{k}", B),
            "text_t": tok_rows(f"tt{k}", B),
            "caption": tok_rows(f"cap{k}", B),
            "idx": idx,
        })

    n_img = dims["eval_images"]
    cpi = dims["captions_per_image"]
    eval_data = {
        "vision": rs.randint(
            0, 256,
            (n_img, dims["image_res"], dims["image_res"], 3)).astype(np.uint8),
        "texts": tok_rows("et", n_img * cpi),
        "captions": tok_rows("ec", n_img),
        "txt2img": {t: t // cpi for t in range(n_img * cpi)},
        "img2txt": {i: list(range(i * cpi, (i + 1) * cpi))
                    for i in range(n_img)},
    }
    return train_batches, eval_data, rows
