"""Recipe-level convergence: train the full production loop (schedule x
loss blending x per-epoch eval x best-checkpoint gating) on the learnable
synthetic dataset until held-out retrieval reaches its ceiling.

This is the check the reference gets implicitly from its 50-70-epoch
train/eval/best-sumR loop (image_Retrieval_caption.py:441-504,
run_multi30k.sh:5): if any recipe wiring silently breaks learning — LR
schedule, loss weights, eval fusion, checkpoint gating — the loss can still
"decrease" while retrieval never rises.  Here the synthetic data carries a
learnable color<->word concept structure (data/synthetic.py, learnable=True)
so a correct recipe drives test sumR from ~350 (near chance) to 600
(perfect) within ~13 tiny-tower epochs; calibration in PROGRESS notes.

VERDICT r3 missing #2.  A chip-scale flagship variant lives in
scripts/train_convergence_tpu.py.
"""

import jax
import pytest

from leccr_tpu.config import tiny_test_config


@pytest.mark.slow
def test_synthetic_train_to_convergence(tmp_path):
    from leccr_tpu.train.trainer import Trainer

    cfg = tiny_test_config()
    cfg.output_dir = str(tmp_path)
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_learnable = True
    cfg.data.synthetic_size = 32
    cfg.data.synthetic_eval_images = 8  # one per concept -> ceiling = 600
    cfg.data.synthetic_captions_per_image = 2
    cfg.data.num_workers = 2
    cfg.train.batch_size_train = 8
    cfg.train.batch_size_test = 8
    cfg.train.batch_size_test_text = 16
    cfg.train.schedular.epochs = 16
    cfg.train.optimizer.lr = 1e-3
    cfg.parallel.data = 1

    trainer = Trainer(cfg, devices=jax.devices()[:1])
    last = trainer.fit()

    # the recipe must LEARN: held-out test sumR near its 600 ceiling
    # (chance is ~350 here because R@10 saturates at 8 eval images; a
    # 16-epoch run converges to 600 with margin — calibrated at 600 by
    # epoch 13, threshold 580 absorbs seed-level wiggle)
    final = float(last["de_test_sumr_sum"])
    assert final >= 580.0, f"recipe failed to converge: sumR={final}"

    # best-checkpoint gating tracked the rise and recorded the best metric
    info = trainer.ckpt.best_info()
    assert info, "no best checkpoint recorded"
    best = float(info["metrics"]["sumr_sum"])
    assert best >= final - 1e-6, (best, final)
    assert best >= 580.0

    # the JSONL epoch log recorded a (weakly) rising trajectory: the last
    # logged epoch beats the first by a wide margin
    import json

    rows = [json.loads(line)
            for line in (tmp_path / "log.txt").read_text().splitlines()]
    curve = [r["de_test_sumr_sum"] for r in rows if "de_test_sumr_sum" in r]
    assert len(curve) == cfg.train.schedular.epochs
    assert curve[-1] - curve[0] >= 150.0, curve
