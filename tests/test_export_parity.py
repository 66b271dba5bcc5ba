"""Export-direction parity vs the ACTUAL reference code.

The mirror image of tests/test_trajectory_parity.py: instead of importing
the reference's init into leccr_tpu, EXPORT leccr_tpu params to a
reference-format .pth, load it into the actual reference model
(tests/reference_driver.py --check-export → its strict=False checkpoint
path + evaluation_coarse + itm_eval, image_Retrieval_caption.py:83-163,
261-317, 384-387), and require the reference's eval scores/metrics to
match the exporting params' own eval.  This pins `run.py --task export`
end to end through reference code: a user can train here and deploy the
checkpoint in a reference-based stack with identical retrieval behavior.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

import reference_harness as rh
from test_trajectory_parity import _my_config, _stack

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(rh.REFERENCE_ROOT),
    reason="reference checkout not available")]


def test_exported_checkpoint_matches_in_reference_eval(tmp_path):
    from leccr_tpu.models.leccr import LECCRModel
    from leccr_tpu.models.weights import (export_reference_state_dict,
                                          save_reference_checkpoint)

    dims = rh.DIMS
    cfg = _my_config(dims)
    model = LECCRModel(cfg.model)

    rs = np.random.RandomState(31)
    seq = dims["seq"]
    init_batch = {
        "vision": rs.randn(2, dims["image_res"], dims["image_res"],
                           3).astype(np.float32),
        "text_ids_s": rs.randint(1, dims["vocab"], (2, seq), np.int32),
        "text_mask_s": np.ones((2, seq), np.int32),
        "text_ids_t": rs.randint(1, dims["vocab"], (2, seq), np.int32),
        "text_mask_t": np.ones((2, seq), np.int32),
        "caption_ids": rs.randint(1, dims["vocab"], (2, seq), np.int32),
        "caption_mask": np.ones((2, seq), np.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(11)},
                        init_batch)["params"]

    sd = export_reference_state_dict(params, cfg)
    ckpt = tmp_path / "exported.pth"
    save_reference_checkpoint(sd, str(ckpt))

    env = dict(os.environ, HF_HUB_OFFLINE="1")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "reference_driver.py"),
         "--out", str(tmp_path), "--check-export", str(ckpt)],
        capture_output=True, text=True, timeout=900, env=env)
    assert "REF_EXPORT_OK" in r.stdout, (
        f"driver failed\n--- stdout:\n{r.stdout[-4000:]}"
        f"\n--- stderr:\n{r.stderr[-4000:]}")
    ref_scores = np.load(tmp_path / "ref_export_eval.npz")
    ref_itm = json.loads((tmp_path / "ref_export_itm.json").read_text())

    # our own eval with the exporting params on the same shared data
    from leccr_tpu.data.images import CLIP_MEAN, CLIP_STD
    from leccr_tpu.eval.retrieval import (itm_metrics_from_ranks,
                                          retrieval_ranks)

    _, eval_data, rows = rh.make_batches(dims)
    vis = ((eval_data["vision"].astype(np.float32) / 255.0 - CLIP_MEAN)
           / CLIP_STD)
    cap_ids = _stack(rows, eval_data["captions"], 0)
    cap_mask = _stack(rows, eval_data["captions"], 1)

    feats = []
    eb = dims["eval_batch"]
    for i in range(0, vis.shape[0], eb):
        emb = model.apply(
            {"params": params},
            {"vision": vis[i:i + eb], "caption_ids": cap_ids[i:i + eb],
             "caption_mask": cap_mask[i:i + eb]},
            method="embed_images")
        feats.append(np.asarray(emb["feat"]))
    img_embeds = np.concatenate(feats)
    txt_embeds = np.asarray(model.apply(
        {"params": params},
        _stack(rows, eval_data["texts"], 0),
        _stack(rows, eval_data["texts"], 1),
        method="embed_texts"))

    scores = img_embeds @ txt_embeds.T
    np.testing.assert_allclose(scores, ref_scores["scores_i2t"],
                               rtol=1e-3, atol=2e-3)

    i2t, t2i = retrieval_ranks(img_embeds, txt_embeds,
                               eval_data["txt2img"], eval_data["img2txt"])
    mine = itm_metrics_from_ranks(i2t, t2i)
    for key, want in ref_itm.items():
        assert mine[key] == pytest.approx(want, abs=1e-9), (
            key, mine[key], want)


def _norm_score(s):
    # video_…py:87-91: operates on negated scores, returns negated back
    t = -s
    t = t - t.min()
    t = t / t.max()
    return -t


def test_exported_video_checkpoint_matches_in_reference_eval(tmp_path):
    """Video-model export direction: an exported .pth loaded into the
    actual reference video model reproduces our double-sim eval through
    its own evaluation_coarse (alpha=0.9 min-max fusion) + itm_eval."""
    from leccr_tpu.config import tiny_test_config
    from leccr_tpu.models.leccr import LECCRModel
    from leccr_tpu.models.weights import (export_reference_state_dict,
                                          save_reference_checkpoint)

    dims = rh.VIDEO_DIMS
    cfg = tiny_test_config()
    m = cfg.model
    m.vision.kind = "temporal"
    m.vision.frame_feat_dim = dims["frame_dim"]
    m.vision.num_layers = dims["vision_layers"]
    m.vision.num_heads = 8  # reference vid_encoder nhead=8
    m.vision.max_frames = dims["frames"]
    m.text.vocab_size = dims["vocab"]
    m.text.hidden_size = dims["text_h"]
    m.text.num_layers = dims["text_layers"]
    m.text.num_heads = dims["text_heads"]
    m.text.intermediate_size = dims["text_inter"]
    m.text.max_position_embeddings = dims["max_pos"]
    m.embed_dim = dims["embed"]
    m.num_queries = dims["n_queries"]
    m.caption_ca_layer = dims["ca_layer"]
    m.caption_interaction_layer = dims["interaction_layer"]
    model = LECCRModel(m)

    rs = np.random.RandomState(17)
    seq, T = dims["seq"], dims["frames"]
    init_batch = {
        "vision": rs.randn(2, T, dims["frame_dim"]).astype(np.float32),
        "vision_mask": np.ones((2, T), bool),
        "text_ids_s": rs.randint(1, dims["vocab"], (2, seq), np.int32),
        "text_mask_s": np.ones((2, seq), np.int32),
        "text_ids_t": rs.randint(1, dims["vocab"], (2, seq), np.int32),
        "text_mask_t": np.ones((2, seq), np.int32),
        "caption_ids": rs.randint(1, dims["vocab"], (2, seq), np.int32),
        "caption_mask": np.ones((2, seq), np.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(23)},
                        init_batch)["params"]
    sd = export_reference_state_dict(params, cfg)
    ckpt = tmp_path / "exported_video.pth"
    save_reference_checkpoint(sd, str(ckpt))

    env = dict(os.environ, HF_HUB_OFFLINE="1")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "reference_driver.py"),
         "--out", str(tmp_path), "--video", "--check-export", str(ckpt)],
        capture_output=True, text=True, timeout=900, env=env)
    assert "REF_EXPORT_OK" in r.stdout, (
        f"driver failed\n--- stdout:\n{r.stdout[-4000:]}"
        f"\n--- stderr:\n{r.stderr[-4000:]}")
    ref_scores = np.load(tmp_path / "ref_export_eval.npz")
    ref_itm = json.loads((tmp_path / "ref_export_itm.json").read_text())

    from leccr_tpu.eval.retrieval import (itm_metrics_from_ranks,
                                          retrieval_ranks)

    _, eval_data, rows = rh.make_video_batches(dims)
    feats, slots = [], []
    eb = dims["eval_batch"]
    n = eval_data["vision"].shape[0]
    for i in range(0, n, eb):
        emb = model.apply(
            {"params": params},
            {"vision": eval_data["vision"][i:i + eb],
             "vision_mask": eval_data["vision_mask"][i:i + eb],
             "caption_ids": _stack(rows, eval_data["captions"][i:i + eb], 0),
             "caption_mask": _stack(rows, eval_data["captions"][i:i + eb],
                                    1)},
            method="embed_images")
        feats.append(np.asarray(emb["feat"]))
        slots.append(np.asarray(emb["slots"]))
    vid_embeds = np.concatenate(feats)
    vid_slots = np.concatenate(slots)
    txt_embeds = np.asarray(model.apply(
        {"params": params},
        _stack(rows, eval_data["texts"], 0),
        _stack(rows, eval_data["texts"], 1),
        method="embed_texts"))

    # reference blended score matrix (video_…py:163-183)
    s = vid_embeds @ txt_embeds.T
    c = np.max(np.einsum("bnd,td->nbt", vid_slots, txt_embeds), axis=0)
    blended = 0.9 * _norm_score(s) + 0.1 * _norm_score(c)
    np.testing.assert_allclose(blended, ref_scores["scores_i2t"],
                               rtol=1e-3, atol=2e-3)

    i2t, t2i = retrieval_ranks(
        vid_embeds, txt_embeds, eval_data["txt2img"], eval_data["img2txt"],
        slots=vid_slots, fusion="minmax", alpha=0.9)
    mine = itm_metrics_from_ranks(i2t, t2i)
    for key, want in ref_itm.items():
        assert mine[key] == pytest.approx(want, abs=1e-9), (
            key, mine[key], want)
