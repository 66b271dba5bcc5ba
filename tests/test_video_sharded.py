"""Multi-chip dry run of the VIDEO retrieval recipe on the 8-device
virtual CPU mesh (BASELINE.json config #4 family): temporal frame-feature
tower + mBERT text/caption towers, data=4 x model=2 with ring_fused global
negatives, full epoch + double-sim eval.  Completes the sharding coverage
for SURVEY §2 #19 — the image/scale recipes have their own dryruns
(__graft_entry__, tests/test_scale_dryrun.py) but the temporal tower +
video loss wiring (local cv loss, masked pooling) was never exercised on a
mesh before round 3.
"""

import pathlib
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # video trainer epochs on the 8-device virtual mesh

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _video_cfg(out_dir: str, negatives: str):
    from leccr_tpu.config import tiny_test_config
    from leccr_tpu.data.synthetic import make_video_dataset

    cfg = tiny_test_config()
    cfg.output_dir = out_dir
    m = cfg.model
    m.vision.kind = "temporal"
    m.vision.frame_feat_dim = 32
    m.vision.num_layers = 1
    m.vision.num_heads = 4
    m.vision.max_frames = 6
    m.video_cv_mask_frames = False  # reference unmasked frame mean
    m.text.hidden_dropout = 0.0
    m.text.attention_dropout = 0.0
    m.dropout = 0.0
    cfg.data = make_video_dataset(
        str(pathlib.Path(out_dir) / "vds"), n_train=32, n_eval=6,
        caps_per_video=1, feat_dim=32, frames_per_video=5)
    cfg.data.num_workers = 2
    cfg.train.batch_size_train = 16
    cfg.train.batch_size_test = 4
    cfg.train.batch_size_test_text = 8
    cfg.train.schedular.epochs = 1
    cfg.parallel.model = 2
    cfg.parallel.data = 4
    cfg.parallel.negatives = negatives
    return cfg


def _run(cfg):
    from leccr_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, devices=jax.devices()[:8])
    assert trainer.is_video
    stats = trainer.train_epoch(0)
    lang = list(trainer.test_ds)[0]
    metrics = trainer.evaluate(trainer.test_ds[lang])
    return stats, metrics


@pytest.fixture(scope="module")
def ring_run(tmp_path_factory):
    return _run(_video_cfg(str(tmp_path_factory.mktemp("vid8ring")),
                           "ring_fused"))


def test_video_mesh_epoch_and_eval_finite(ring_run):
    stats, metrics = ring_run
    losses = {k: float(v) for k, v in stats.items() if k.startswith("loss")}
    assert losses and all(np.isfinite(v) for v in losses.values()), losses
    assert losses["loss_itc_vs"] > 0.0
    # double-sim (minmax) eval path produced a real score
    assert np.isfinite(metrics["sumr_sum"]) and metrics["sumr_sum"] > 0.0


def test_video_ring_matches_dense_gather(ring_run, tmp_path_factory):
    """ring_fused == XLA dense-gather negatives on the same 4x2 mesh, same
    data/seed (dropout off), to f32 ring-reduction tolerance."""
    stats_ring, _ = ring_run
    stats_dense, _ = _run(
        _video_cfg(str(tmp_path_factory.mktemp("vid8dense")), "gather"))
    for k in stats_ring:
        if not k.startswith("loss"):
            continue
        a, b = float(stats_ring[k]), float(stats_dense[k])
        assert abs(a - b) <= 5e-4 * max(1.0, abs(b)), (k, a, b)
