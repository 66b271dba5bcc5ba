"""Integration: full Trainer on a synthetic on-disk dataset
(SURVEY.md §4 item 4) — loss decreases, eval metrics computed, checkpoint
round-trips, resume works, optimizer policy correct."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from leccr_tpu.config import tiny_test_config
from leccr_tpu.train.optim import classify_params
from leccr_tpu.train.schedule import linear_warmup_decay, resolve_warmup


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    from leccr_tpu.train.trainer import Trainer

    out = tmp_path_factory.mktemp("run")
    cfg = tiny_test_config()
    cfg.output_dir = str(out)
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_size = 16
    cfg.data.synthetic_eval_images = 6
    cfg.data.synthetic_captions_per_image = 2
    cfg.data.num_workers = 2
    cfg.train.batch_size_train = 8
    cfg.train.batch_size_test = 4
    cfg.train.batch_size_test_text = 8
    cfg.train.schedular.epochs = 2
    cfg.train.optimizer.lr = 5e-4
    cfg.parallel.data = 1
    return Trainer(cfg, devices=jax.devices()[:1])


@pytest.mark.slow
def test_eval_device_cache_reused_and_equal(trainer):
    """Second eval of the same split must hit the HBM-resident batch cache
    (data.cache_eval_on_device_mb) and produce identical metrics."""
    lang = list(trainer.test_ds)[0]
    ds = trainer.test_ds[lang]
    first = trainer.evaluate(ds)
    assert id(ds) in trainer._eval_device_cache
    pinned, cached_batches = trainer._eval_device_cache[id(ds)]
    assert pinned is ds  # entry pins the dataset against id() reuse
    assert all(hasattr(b["vision"], "devices")  # device-resident, not host
               for b, _ in cached_batches)
    second = trainer.evaluate(ds)
    assert first == second

    # the budget is GLOBAL and admission is first-come with no eviction:
    # once exhausted, later splits never cache — but they must still
    # evaluate CORRECTLY through the uncached path every time (VERDICT r3
    # weak #5)
    trainer._eval_cache_bytes = (
        trainer.cfg.data.cache_eval_on_device_mb * 2 ** 20)
    other = trainer.val_ds[lang]
    uncached_1 = trainer.evaluate(other)
    assert id(other) not in trainer._eval_device_cache
    uncached_2 = trainer.evaluate(other)  # still uncached, still correct
    assert uncached_1 == uncached_2
    # restore budget: the same split now admits, metrics unchanged
    trainer._eval_cache_bytes = sum(
        v.nbytes for b, _ in cached_batches for v in b.values())
    cached_now = trainer.evaluate(other)  # this call collects + admits
    assert id(other) in trainer._eval_device_cache
    assert trainer.evaluate(other) == cached_now == uncached_1
    # drop the extra split again so later tests see the original state
    _, other_batches = trainer._eval_device_cache.pop(id(other))
    trainer._eval_cache_bytes -= sum(
        v.nbytes for b, _ in other_batches for v in b.values())


@pytest.mark.slow
def test_train_two_epochs_loss_decreases_and_ckpt(trainer):
    losses = []
    orig = trainer.train_epoch
    for epoch in range(2):
        stats = orig(epoch)
        losses.append(float(stats["loss_itc_vs"]))
    assert trainer.state.step == 2 * trainer.steps_per_epoch

    # eval produces a sane metric dict
    lang = list(trainer.test_ds)[0]
    metrics = trainer.evaluate(trainer.test_ds[lang])
    assert 0.0 <= metrics["txt_r1"] <= 100.0
    assert metrics["sumr_sum"] > 0.0

    # checkpoint round-trip
    trainer.ckpt.save(trainer.state.step, trainer.state.params,
                      trainer.state.opt_state, epoch=1,
                      metrics={"sumr_sum": metrics["sumr_sum"]}, is_best=True)
    trainer.ckpt.wait()
    abstract = {"params": trainer.state.params,
                "opt_state": trainer.state.opt_state,
                "meta": {"step": 0, "epoch": 0}}
    params, _, _ema, meta = trainer.ckpt.restore(abstract)
    assert int(meta["step"]) == trainer.state.step
    lhs = jax.tree.leaves(params)
    rhs = jax.tree.leaves(trainer.state.params)
    for a, b in zip(lhs, rhs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_training_actually_learns(tmp_path):
    """A few steps on a fixed batch must reduce the total loss."""
    from leccr_tpu.train.trainer import Trainer

    cfg = tiny_test_config()
    cfg.output_dir = str(tmp_path)
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_size = 8
    cfg.data.synthetic_eval_images = 4
    cfg.train.batch_size_train = 8
    cfg.train.schedular.epochs = 8
    cfg.train.schedular.num_warmup_steps = 0
    cfg.train.optimizer.lr = 1e-3
    cfg.parallel.data = 1
    tr = Trainer(cfg, devices=jax.devices()[:1])
    first = last = None
    for epoch in range(6):
        stats = tr.train_epoch(epoch)
        total = sum(float(stats[k]) for k in
                    ("loss_itc_vs", "loss_itc_vt", "loss_itc_st"))
        if first is None:
            first = total
        last = total
    assert last < first, (first, last)


def test_optimizer_param_groups():
    params = {
        "dense": {"kernel": jnp.zeros((2, 2)), "bias": jnp.zeros((2,))},
        "norm": {"scale": jnp.ones((2,)), "bias": jnp.zeros((2,))},
        "clip_text_tower": {"w": {"kernel": jnp.zeros((2, 2))}},
        "temp": jnp.zeros(()),
    }
    labels = classify_params(params, lr_mult_paths=("temp",),
                             frozen_paths=("clip_text_tower",))
    assert labels["dense"]["kernel"] == "base_decay"
    assert labels["dense"]["bias"] == "base_no_decay"
    assert labels["norm"]["scale"] == "base_no_decay"
    assert labels["clip_text_tower"]["w"]["kernel"] == "frozen"
    assert labels["temp"] == "mult_decay"


def test_legacy_eps_matches_historical_adamw():
    """OptimConfig.legacy_eps reproduces the transformers<4.46 AdamW update
    (eps on uncorrected sqrt(v), bias-corrected step size, decoupled wd) —
    the optimizer the reference pins (requirements.txt; optim.py:63)."""
    import math

    from leccr_tpu.config import OptimConfig
    from leccr_tpu.train.optim import build_optimizer

    rs = np.random.RandomState(3)
    p0 = rs.randn(5, 4).astype(np.float32)
    grads_seq = [rs.randn(5, 4).astype(np.float32) * 10 ** rs.randint(-6, 1)
                 for _ in range(4)]
    lr, wd, b1, b2, eps = 1e-3, 0.02, 0.9, 0.98, 1e-8

    # numpy re-derivation of the historical update
    p = p0.copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads_seq, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        step_size = lr * math.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        p = p - step_size * m / (np.sqrt(v) + eps)
        p = p - lr * wd * p
    want = p

    cfg = OptimConfig(lr=lr, weight_decay=wd, betas=[b1, b2], eps=eps,
                      legacy_eps=True)
    params = {"dense": {"kernel": jnp.asarray(p0)}}
    tx = build_optimizer(cfg, params, lambda s: lr)
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(
            {"dense": {"kernel": jnp.asarray(g)}}, state, params)
        import optax

        params = optax.apply_updates(params, updates)
    got = np.asarray(params["dense"]["kernel"])
    # wd ordering (pre- vs post-update params) differs at O(lr^2 wd)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-7)


def test_bf16_adam_moments():
    """optimizer.moment_dtype='bfloat16' stores mu/nu at half width (the
    round-4 MFU lever: halves optimizer-state HBM traffic) while staying
    numerically close to the f32 trajectory — math runs in f32, only the
    moment storage rounds."""
    import optax

    from leccr_tpu.config import OptimConfig
    from leccr_tpu.train.optim import build_optimizer

    rs = np.random.RandomState(7)
    p0 = rs.randn(16, 8).astype(np.float32) * 0.1
    grads_seq = [rs.randn(16, 8).astype(np.float32) * 0.01
                 for _ in range(20)]

    results = {}
    for dtype in ("float32", "bfloat16"):
        for legacy in (False, True):
            cfg = OptimConfig(lr=1e-3, weight_decay=0.01, legacy_eps=legacy,
                              moment_dtype=dtype)
            params = {"dense": {"kernel": jnp.asarray(p0)}}
            tx = build_optimizer(cfg, params, lambda s: cfg.lr)
            state = tx.init(params)
            if dtype == "bfloat16":
                # moment trees really stored at bf16 (legacy: mu AND nu;
                # optax path: mu only — adamw has no nu_dtype)
                mus = [x for x in jax.tree.leaves(state)
                       if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
                assert len(mus) >= (2 if legacy else 1), (legacy, state)
            for g in grads_seq:
                updates, state = tx.update(
                    {"dense": {"kernel": jnp.asarray(g)}}, state, params)
                params = optax.apply_updates(params, updates)
            results[(dtype, legacy)] = np.asarray(params["dense"]["kernel"])

    for legacy in (False, True):
        f32, bf16 = results[("float32", legacy)], results[("bfloat16", legacy)]
        # same trajectory up to moment rounding: updates are O(lr)=1e-3 per
        # step, bf16 moment noise perturbs each step by ~0.4% of it
        np.testing.assert_allclose(bf16, f32, atol=5e-4,
                                   err_msg=f"legacy={legacy}")
        assert not np.array_equal(bf16, f32)  # it did round somewhere


def test_schedule_shape():
    sched = linear_warmup_decay(1e-4, total_steps=100, num_warmup_steps=0.1)
    assert resolve_warmup(0.1, 100) == 10
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 0.5e-4)
    np.testing.assert_allclose(float(sched(10)), 1e-4)
    np.testing.assert_allclose(float(sched(55)), 0.5e-4)
    assert float(sched(100)) == 0.0


@pytest.mark.slow
def test_dryrun_multichip_8():
    """The driver's multi-chip dry run: dp=4 x tp=2 mesh, ring negatives,
    one real step of the full Trainer."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_video_trainer_end_to_end(tmp_path):
    """vtr_caption path: synthetic BigFile dataset -> temporal tower ->
    double-sim eval (reference video_Retrieval_caption_double_sim.py)."""
    from leccr_tpu.data.synthetic import make_video_dataset
    from leccr_tpu.train.trainer import Trainer

    data_cfg = make_video_dataset(str(tmp_path / "vds"), n_train=8, n_eval=4,
                                  feat_dim=32, frames_per_video=5)
    cfg = tiny_test_config()
    cfg.output_dir = str(tmp_path / "out")
    cfg.model.vision.kind = "temporal"
    cfg.model.vision.frame_feat_dim = 32
    cfg.model.vision.num_layers = 1
    cfg.model.vision.num_heads = 4
    cfg.model.vision.max_frames = 6
    cfg.model.num_queries = 2  # reference msrvtt config
    cfg.data = data_cfg
    cfg.train.batch_size_train = 8
    cfg.train.batch_size_test = 4
    cfg.train.batch_size_test_text = 8
    cfg.train.schedular.epochs = 1
    cfg.parallel.data = 1
    tr = Trainer(cfg, devices=jax.devices()[:1])
    assert tr.is_video
    stats = tr.train_epoch(0)
    assert np.isfinite(float(stats["loss_itc_vs"]))
    lang = list(tr.test_ds)[0]
    metrics = tr.evaluate(tr.test_ds[lang])  # minmax double-sim fusion
    assert 0.0 <= metrics["txt_r1"] <= 100.0
    assert metrics["sumr_sum"] > 0


@pytest.mark.slow
def test_fit_loop_and_cli_smoke(tmp_path):
    """Trainer.fit(): full epoch->eval->best-ckpt->log.txt loop, then the
    run.py CLI end-to-end on the synthetic dataset."""
    import json
    import subprocess
    import sys

    from leccr_tpu.train.trainer import Trainer

    cfg = tiny_test_config()
    cfg.output_dir = str(tmp_path / "fit")
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_size = 8
    cfg.data.synthetic_eval_images = 4
    cfg.train.batch_size_train = 8
    cfg.train.batch_size_test = 4
    cfg.train.batch_size_test_text = 8
    cfg.train.schedular.epochs = 1
    cfg.parallel.data = 1
    tr = Trainer(cfg, devices=jax.devices()[:1])
    stats = tr.fit()
    assert "de_test_sumr_sum" in stats
    log = (tmp_path / "fit" / "log.txt").read_text().strip().splitlines()
    assert len(log) >= 2  # epoch record + best record
    assert "de_test_txt_r1" in json.loads(log[0])
    # best checkpoint was written
    assert tr.ckpt.latest_step() is not None
    assert tr.ckpt.best_info() is not None

    # CLI: config file -> run.py --evaluate --resume on the same output dir
    cfg_path = tmp_path / "cli.json"
    cfg.train.resume = True
    cfg.save(str(cfg_path))
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["LECCR_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "run.py", "--task", "itr_caption",
         "--config", str(cfg_path), "--output_dir", str(tmp_path / "fit"),
         "--evaluate", "--resume"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # the eval-only run appends another record to log.txt
    log2 = (tmp_path / "fit" / "log.txt").read_text().strip().splitlines()
    assert len(log2) > len(log), (proc.stdout[-800:], proc.stderr[-400:])


@pytest.mark.slow
def test_sharded_eval_matches_single_device(tmp_path):
    """Eval with batches sharded over an 8-way data mesh must produce
    identical metrics to single-device eval."""
    from leccr_tpu.train.trainer import Trainer

    def build(out, data, devices):
        cfg = tiny_test_config()
        cfg.output_dir = str(out)
        cfg.data.dataset = "synthetic"
        cfg.data.synthetic_size = 8
        cfg.data.synthetic_eval_images = 8
        cfg.train.batch_size_train = 8
        cfg.train.batch_size_test = 8
        cfg.train.batch_size_test_text = 16
        cfg.train.schedular.epochs = 1
        cfg.parallel.data = data
        return Trainer(cfg, devices=devices)

    t1 = build(tmp_path / "one", 1, jax.devices()[:1])
    t8 = build(tmp_path / "eight", 8, jax.devices())
    lang = list(t1.test_ds)[0]
    m1 = t1.evaluate(t1.test_ds[lang])
    # same seed → same params; same synthetic data → same metrics
    m8 = t8.evaluate(t8.test_ds[lang])
    assert m1 == m8, (m1, m8)


@pytest.mark.slow
def test_fused_negatives_trainer(tmp_path):
    """negatives: fused — the blockwise InfoNCE (XLA path on CPU) drives the
    train step end-to-end."""
    from leccr_tpu.train.trainer import Trainer

    cfg = tiny_test_config()
    cfg.output_dir = str(tmp_path)
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_size = 8
    cfg.data.synthetic_eval_images = 4
    cfg.train.batch_size_train = 8
    cfg.train.schedular.epochs = 1
    cfg.parallel.data = 1
    cfg.parallel.negatives = "fused"
    tr = Trainer(cfg, devices=jax.devices()[:1])
    stats = tr.train_epoch(0)
    assert np.isfinite(float(stats["loss_itc_vs"]))


@pytest.mark.slow
def test_ring_fused_negatives_trainer(tmp_path):
    """negatives: ring_fused — the Pallas-block ring InfoNCE (XLA block path
    on CPU) drives the jitted train step over an 8-way data mesh."""
    from leccr_tpu.train.trainer import Trainer

    cfg = tiny_test_config()
    cfg.output_dir = str(tmp_path)
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_size = 16
    cfg.data.synthetic_eval_images = 4
    cfg.train.batch_size_train = 16
    cfg.train.schedular.epochs = 1
    cfg.parallel.data = 8
    cfg.parallel.negatives = "ring_fused"
    tr = Trainer(cfg)
    stats = tr.train_epoch(0)
    assert np.isfinite(float(stats["loss_itc_vs"]))


@pytest.mark.slow
def test_resume_continues_training(tmp_path):
    """Preemption recovery: train 2 epochs (with mid-epoch step snapshots),
    then construct a fresh Trainer with resume=True and a longer schedule —
    it must restore the newest checkpoint, continue from the next epoch with
    a monotonically advancing step counter, and keep the best-sumR record."""
    from leccr_tpu.train.trainer import Trainer

    def make_cfg(epochs):
        cfg = tiny_test_config()
        cfg.output_dir = str(tmp_path)
        cfg.data.dataset = "synthetic"
        cfg.data.synthetic_size = 16
        cfg.data.synthetic_eval_images = 4
        cfg.train.batch_size_train = 8
        cfg.train.batch_size_test = 4
        cfg.train.batch_size_test_text = 8
        cfg.train.schedular.epochs = epochs
        cfg.train.checkpoint_every_steps = 3  # mid-epoch snapshots
        cfg.parallel.data = 1
        return cfg

    tr1 = Trainer(make_cfg(2), devices=jax.devices()[:1])
    tr1.fit()
    steps_done = tr1.state.step
    per_epoch = tr1.steps_per_epoch
    assert steps_done == 2 * per_epoch
    best1 = tr1.ckpt.best_info()
    assert best1 is not None

    cfg2 = make_cfg(3)
    cfg2.train.resume = True
    tr2 = Trainer(cfg2, devices=jax.devices()[:1])
    tr2.fit()
    # one extra epoch ran on top of the restored state
    assert tr2.state.step == steps_done + per_epoch
    # log.txt accumulated records from both runs
    log = (tmp_path / "log.txt").read_text().strip().splitlines()
    assert len(log) >= 3


@pytest.mark.slow
def test_resume_mid_epoch_exact(tmp_path):
    """Resuming from a MID-epoch snapshot continues at the exact batch
    position: no epoch replay, the optimizer's internal schedule count and
    the step counter agree, and the total step count lands exactly."""
    from leccr_tpu.train.trainer import Trainer

    def make_cfg():
        cfg = tiny_test_config()
        cfg.output_dir = str(tmp_path)
        cfg.data.dataset = "synthetic"
        cfg.data.synthetic_size = 16
        cfg.data.synthetic_eval_images = 4
        cfg.train.batch_size_train = 8
        cfg.train.batch_size_test = 4
        cfg.train.batch_size_test_text = 8
        cfg.train.schedular.epochs = 2
        cfg.parallel.data = 1
        return cfg

    tr1 = Trainer(make_cfg(), devices=jax.devices()[:1])
    spe = tr1.steps_per_epoch
    assert spe >= 4
    tr1.train_epoch(0)
    # consume 2 batches of epoch 1 through the real step, then "preempt"
    import numpy as _np

    from jax.sharding import NamedSharding, PartitionSpec as _P

    from leccr_tpu.data.pipeline import device_prefetch
    sharding = NamedSharding(tr1.mesh, _P("data"))
    it = device_prefetch(tr1.train_loader.epoch(1), sharding, depth=1)
    for _ in range(2):
        batch = next(it)
        p, o, _ema, _ls = tr1._train_step(tr1.state.params,
                                          tr1.state.opt_state, None,
                                    batch, _np.int32(tr1.state.step))
        tr1.state = type(tr1.state)(p, o, tr1.state.step + 1)
    del it
    mid_step = tr1.state.step
    assert mid_step == spe + 2
    tr1.ckpt.save(mid_step, tr1.state.params, tr1.state.opt_state, epoch=1)
    tr1.ckpt.wait()

    cfg2 = make_cfg()
    cfg2.train.resume = True
    tr2 = Trainer(cfg2, devices=jax.devices()[:1])
    tr2.fit()
    # epoch 1 completed from batch 2 (no replay): exactly 2*spe total steps
    assert tr2.state.step == 2 * spe


@pytest.mark.slow
def test_resume_on_different_mesh_size(tmp_path):
    """Elastic recovery beyond the reference (SURVEY.md §5: reference has a
    fixed world size — `utils/__init__.py:306-328` — and any change of GPU
    count invalidates `checkpoint_best.pth` resume): a checkpoint written on
    one mesh restores onto a DIFFERENT device count, including growing onto
    more chips with FSDP-sharded params/opt-state.  The global batch size is
    a config property (not per-device), so steps_per_epoch — and therefore
    the exact-resume position arithmetic — is mesh-independent."""
    from leccr_tpu.train.trainer import Trainer

    def make_cfg(epochs, data, fsdp=False):
        cfg = tiny_test_config()
        cfg.output_dir = str(tmp_path)
        cfg.data.dataset = "synthetic"
        cfg.data.synthetic_size = 16
        cfg.data.synthetic_eval_images = 4
        cfg.train.batch_size_train = 8
        cfg.train.batch_size_test = 4
        cfg.train.batch_size_test_text = 8
        cfg.train.schedular.epochs = epochs
        cfg.parallel.data = data
        cfg.parallel.fsdp = fsdp
        if fsdp:
            cfg.parallel.fsdp_min_size = 0  # shard everything divisible
        return cfg

    # train 1 epoch on 4 devices, checkpoint at the epoch boundary
    tr1 = Trainer(make_cfg(1, 4), devices=jax.devices()[:4])
    tr1.fit()
    spe = tr1.steps_per_epoch
    assert tr1.state.step == spe
    saved = jax.device_get(tr1.state.params)

    # SHRINK: resume the same run on 2 devices; params must restore
    # value-exact across the resharding and training must continue
    cfg2 = make_cfg(2, 2)
    cfg2.train.resume = True
    tr2 = Trainer(cfg2, devices=jax.devices()[:2])
    abstract = {"params": tr2.state.params, "opt_state": tr2.state.opt_state,
                "meta": {"step": 0, "epoch": 0, "steps_per_epoch": 0}}
    params, _opt, _ema, meta = tr2.ckpt.restore(abstract)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 jax.device_get(params), saved)
    assert int(meta["step"]) == spe
    tr2.fit()
    assert tr2.state.step == 2 * spe

    # GROW: resume on 8 devices with FSDP (params + Adam moments sharded
    # over the new, larger data axis) — orbax reshards on restore
    cfg3 = make_cfg(3, 8, fsdp=True)
    cfg3.train.resume = True
    tr3 = Trainer(cfg3, devices=jax.devices()[:8])
    # before training further, the restored params equal the step-spe*2
    # state?  tr2 advanced past the save, so instead pin the restore path
    # directly: a fresh resume-only trainer restores tr2's final params
    abstract = {"params": tr3.state.params, "opt_state": tr3.state.opt_state,
                "meta": {"step": 0, "epoch": 0, "steps_per_epoch": 0}}
    params, _opt, _ema, meta = tr3.ckpt.restore(abstract)
    got = jax.device_get(params)
    want = jax.device_get(tr2.state.params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), got, want)
    assert int(meta["step"]) == 2 * spe
    tr3.fit()
    assert tr3.state.step == 3 * spe


def test_lr_mult_scales_updates():
    """A configured lr_mult path really gets lr x mult (VERDICT r1 #6):
    with identical grads and fresh Adam moments, the update magnitude of a
    matched param must be lr_mult x that of an unmatched one."""
    from leccr_tpu.config import OptimConfig
    from leccr_tpu.train.optim import build_optimizer

    cfg = OptimConfig(lr=1e-3, weight_decay=0.0, lr_mult=3.0,
                      lr_mult_paths=["head"])
    params = {"head": {"kernel": jnp.ones((4,))},
              "body": {"kernel": jnp.ones((4,))}}
    tx = build_optimizer(cfg, params, schedule=lambda s: cfg.lr,
                         lr_mult_paths=tuple(cfg.lr_mult_paths))
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    ratio = float(updates["head"]["kernel"][0]
                  / updates["body"]["kernel"][0])
    np.testing.assert_allclose(ratio, 3.0, rtol=1e-5)


def test_best_checkpoint_survives_rotation(tmp_path):
    """ADVICE r1: periodic snapshots must never evict the best checkpoint.
    Save a best at step 1, then 3 periodic saves with keep=2 — the best
    state must still restore bit-exact."""
    from leccr_tpu.train.checkpoints import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path), keep=2)
    best_params = {"w": jnp.full((3,), 7.0)}
    opt = {"m": jnp.zeros((3,))}
    ckpt.save(1, best_params, opt, epoch=0, metrics={"sumr_sum": 9.0},
              is_best=True)
    for step in (2, 3, 4):
        ckpt.save(step, {"w": jnp.full((3,), float(step))}, opt, epoch=0)
    ckpt.wait()
    # rotation kept only the 2 newest periodic steps
    assert ckpt.latest_step() == 4
    abstract = {"params": best_params, "opt_state": opt,
                "meta": {"step": 0, "epoch": 0}}
    params, _, _ema, meta = ckpt.restore_best(abstract)
    np.testing.assert_array_equal(np.asarray(params["w"]),
                                  np.full((3,), 7.0))
    assert meta["step"] == 1
    info = ckpt.best_info()
    assert info["step"] == 1 and info["metrics"]["sumr_sum"] == 9.0


@pytest.mark.slow
def test_ema_tracks_and_checkpoints(tmp_path):
    """train.ema_decay: the step advances an exact EMA of the params
    (verified against the recurrence), eval runs on the EMA weights,
    checkpoints round-trip it, and toggling the flag across resume is
    tolerated (seed-from-params on, ignore on off)."""
    import numpy as _np

    from leccr_tpu.train.trainer import Trainer

    def make_cfg(out, decay, epochs=1, resume=False):
        cfg = tiny_test_config()
        cfg.output_dir = str(out)
        cfg.data.dataset = "synthetic"
        cfg.data.synthetic_size = 16
        cfg.data.synthetic_eval_images = 4
        cfg.train.batch_size_train = 8
        cfg.train.batch_size_test = 4
        cfg.train.batch_size_test_text = 8
        cfg.train.schedular.epochs = epochs
        cfg.train.ema_decay = decay
        cfg.train.resume = resume
        cfg.parallel.data = 1
        return cfg

    d = 0.5
    tr = Trainer(make_cfg(tmp_path, d), devices=jax.devices()[:1])
    assert tr.state.ema_params is not None
    # manual recurrence oracle over 2 steps
    want = jax.tree.map(_np.asarray, tr.state.params)
    params, opt_state, ema = (tr.state.params, tr.state.opt_state,
                              tr.state.ema_params)
    for k, batch in enumerate(tr.train_loader.epoch(0)):
        if k == 2:
            break
        params, opt_state, ema, _ = tr._train_step(
            params, opt_state, ema, batch, _np.int32(k))
        want = jax.tree.map(
            lambda e, p: e * d + _np.asarray(p) * (1 - d), want, params)
    jax.tree.map(lambda a, b: _np.testing.assert_allclose(
        _np.asarray(a), b, rtol=2e-6, atol=1e-7), ema, want)

    # eval_params returns the EMA tree when enabled
    tr.state = type(tr.state)(params, opt_state, 2, ema_params=ema)
    assert tr.eval_params is ema
    tr.cfg.train.ema_eval = False
    assert tr.eval_params is params
    tr.cfg.train.ema_eval = True

    # full fit: checkpoint carries the EMA; resume restores it exactly
    tr2 = Trainer(make_cfg(tmp_path / "run2", d), devices=jax.devices()[:1])
    tr2.fit()
    saved_ema = jax.tree.map(_np.asarray, tr2.state.ema_params)
    tr3 = Trainer(make_cfg(tmp_path / "run2", d, epochs=2, resume=True),
                  devices=jax.devices()[:1])
    abstract = tr3._restore_abstract()
    _, _, ema3, _ = tr3.ckpt.restore(abstract)
    jax.tree.map(lambda a, b: _np.testing.assert_array_equal(
        _np.asarray(a), b), ema3, saved_ema)

    # toggle OFF across resume: restore works, EMA ignored
    tr4 = Trainer(make_cfg(tmp_path / "run2", 0.0, epochs=2, resume=True),
                  devices=jax.devices()[:1])
    tr4.fit()
    assert tr4.state.ema_params is None

    # toggle ON over a non-EMA checkpoint: EMA seeded from restored params
    tr5 = Trainer(make_cfg(tmp_path / "run5", 0.0), devices=jax.devices()[:1])
    tr5.fit()
    tr6 = Trainer(make_cfg(tmp_path / "run5", d, epochs=2, resume=True),
                  devices=jax.devices()[:1])
    tr6.fit()
    assert tr6.state.ema_params is not None
