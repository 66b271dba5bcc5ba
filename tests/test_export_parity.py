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

pytestmark = pytest.mark.skipif(
    not os.path.isdir(rh.REFERENCE_ROOT),
    reason="reference checkout not available")


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
