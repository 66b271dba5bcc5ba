"""End-to-end trajectory parity vs the ACTUAL reference VIDEO trainer
(video_Retrieval_caption_double_sim.py: train():29-85, double-sim
evaluation_coarse():94-190, itm_eval():194-247), mirroring
tests/test_trajectory_parity.py for the video model family: temporal
self-attention tower over frame features, masked mean pooling, and the
alpha=0.9 min-max double-sim eval fusion."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

import reference_harness as rh
from leccr_tpu.config import tiny_test_config

LOSS_KEYS = ("loss_itc_vs", "loss_itc_vt", "loss_itc_st",
             "loss_itc_c", "loss_reg_c")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(rh.REFERENCE_ROOT),
    reason="reference checkout not available")]


@pytest.fixture(scope="module")
def ref_results(tmp_path_factory):
    out = tmp_path_factory.mktemp("refvideo")
    env = dict(os.environ, HF_HUB_OFFLINE="1")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "reference_driver.py"),
         "--out", str(out), "--video"],
        capture_output=True, text=True, timeout=900, env=env)
    assert "REF_DRIVER_OK" in r.stdout, (
        f"driver failed\n--- stdout:\n{r.stdout[-4000:]}"
        f"\n--- stderr:\n{r.stderr[-4000:]}")
    data = np.load(out / "ref_results.npz")
    itm = json.loads((out / "ref_itm.json").read_text())
    return out, data, itm


def _my_config(dims, out_dir):
    from leccr_tpu.data.synthetic import make_video_dataset

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
    m.text.hidden_dropout = 0.0
    m.text.attention_dropout = 0.0
    m.embed_dim = dims["embed"]
    m.num_queries = dims["n_queries"]
    m.caption_ca_layer = dims["ca_layer"]
    m.caption_interaction_layer = dims["interaction_layer"]
    m.dropout = 0.0
    m.temp = 0.07
    m.weight_caption_loss = dims["w_caption"]
    m.weight_reg_loss = dims["w_reg"]
    m.weight_dstl_loss = dims["w_dstl"]
    m.weight_cv_loss = dims["w_cv"]
    # reproduce the reference's unmasked frame mean in the cv loss
    m.video_cv_mask_frames = False

    cfg.data = make_video_dataset(
        os.path.join(out_dir, "vds"),
        n_train=dims["batch"] * dims["steps"], n_eval=8, caps_per_video=1,
        feat_dim=dims["frame_dim"], frames_per_video=dims["frames"] - 1)
    cfg.data.max_tokens = dims["seq"]
    cfg.data.token_buckets = [dims["seq"]]
    cfg.train.batch_size_train = dims["batch"]
    cfg.train.schedular.epochs = 1
    cfg.train.schedular.num_warmup_steps = dims["warmup"]
    cfg.train.optimizer.lr = dims["lr"]
    cfg.train.optimizer.weight_decay = dims["weight_decay"]
    cfg.train.optimizer.legacy_eps = True
    cfg.train.grad_clip = 0.0
    cfg.parallel.data = 1
    return cfg


def _stack(rows, keys, which):
    return np.stack([rows[k][which] for k in keys])


@pytest.fixture(scope="module")
def my_results(ref_results, tmp_path_factory):
    from leccr_tpu.models.weights import load_reference_checkpoint_into
    from leccr_tpu.train.trainer import Trainer

    out, _, _ = ref_results
    dims = rh.VIDEO_DIMS
    run_dir = str(tmp_path_factory.mktemp("myvideo"))
    cfg = _my_config(dims, run_dir)
    cfg.output_dir = run_dir
    trainer = Trainer(cfg, devices=jax.devices()[:1])
    assert trainer.is_video
    assert trainer.steps_per_epoch == dims["steps"]

    params = load_reference_checkpoint_into(
        jax.tree.map(np.asarray, trainer.state.params),
        str(out / "ref_init.pth"), cfg)
    opt_state = jax.jit(trainer.tx.init)(params)

    batches, eval_data, rows = rh.make_video_batches(dims)
    losses = []
    for k, b in enumerate(batches):
        batch = {
            "vision": b["vision"],
            "vision_mask": b["vision_mask"],
            "text_ids_s": _stack(rows, b["text_s"], 0),
            "text_mask_s": _stack(rows, b["text_s"], 1),
            "text_ids_t": _stack(rows, b["text_t"], 0),
            "text_mask_t": _stack(rows, b["text_t"], 1),
            "caption_ids": _stack(rows, b["caption"], 0),
            "caption_mask": _stack(rows, b["caption"], 1),
            "idx": b["idx"],
        }
        params, opt_state, _ema, ls = trainer._train_step(
            params, opt_state, None, batch, np.int32(k))
        losses.append([float(ls[key]) for key in LOSS_KEYS])

    return trainer, params, np.array(losses), eval_data, rows


def test_video_loss_trajectory_matches_reference(ref_results, my_results):
    _, data, _ = ref_results
    _, _, losses, _, _ = my_results
    ref = np.asarray(data["losses"])
    assert ref.shape == losses.shape
    np.testing.assert_allclose(losses[0], ref[0], atol=3e-4)
    env = np.abs(np.asarray(data["losses_perturbed"]) - ref).max(axis=1)
    # PIN the envelope itself (VERDICT r4 #5): tol derives from a
    # perturbed-init reference rerun at test time, so without a ceiling
    # a harness regression could widen the envelope and parity would
    # still "pass".  Calibrated on this host round 5: max per-step env
    # 1.24e-3; the cap carries ~8-9x drift headroom, and AT the cap the
    # derived 40x tolerance is still <=10% of the ~4.0 loss scale.
    assert env.max() <= 1e-2, f"chaos envelope widened: {env}"
    tol = np.maximum(3e-4, 40.0 * env)
    diff = np.abs(losses - ref).max(axis=1)
    assert (diff <= tol).all(), (
        f"\nper-step |mine-ref|: {diff}\nallowed: {tol}"
        f"\nmine:\n{losses}\nref:\n{ref}")


def _norm_score(s):
    # video_…py:87-91: operates on negated scores, returns negated back
    t = -s
    t = t - t.min()
    t = t / t.max()
    return -t


def test_video_double_sim_eval_matches_reference(ref_results, my_results):
    from leccr_tpu.eval.retrieval import (itm_metrics_from_ranks,
                                          retrieval_ranks)

    _, data, ref_itm = ref_results
    trainer, params, _, eval_data, rows = my_results
    dims = rh.VIDEO_DIMS

    feats, slots = [], []
    eb = dims["eval_batch"]
    n = eval_data["vision"].shape[0]
    for i in range(0, n, eb):
        emb = trainer.model.apply(
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

    txt_embeds = np.asarray(trainer.model.apply(
        {"params": params},
        _stack(rows, eval_data["texts"], 0),
        _stack(rows, eval_data["texts"], 1),
        method="embed_texts"))

    # reference blended score matrix (video_…py:163-183)
    s = vid_embeds @ txt_embeds.T
    c = np.max(np.einsum("bnd,td->nbt", vid_slots, txt_embeds), axis=0)
    blended = 0.9 * _norm_score(s) + 0.1 * _norm_score(c)
    np.testing.assert_allclose(blended, data["scores_i2t"],
                               rtol=1e-3, atol=2e-3)

    i2t, t2i = retrieval_ranks(
        vid_embeds, txt_embeds, eval_data["txt2img"], eval_data["img2txt"],
        slots=vid_slots, fusion="minmax", alpha=0.9)
    mine = itm_metrics_from_ranks(i2t, t2i)
    for key, want in ref_itm.items():
        assert mine[key] == pytest.approx(want, abs=1e-9), (
            key, mine[key], want)
