"""Fully-sharded data parallel (ZeRO-3): params + Adam moments sharded
over the `data` mesh axis (ParallelConfig.fsdp).

The reference has no analog (fp32 replicated DDP, SURVEY §2c); this is the
TPU-native answer to its video model's memory wall — params+moments are
~11 GB fp32 on one chip (DESIGN.md), so per-chip batch scaling needs the
state sharded.  Spec tests pin which dims shard; the integration test runs
the REAL trainer on the 8-device virtual CPU mesh and asserts fsdp
training is numerically the same program as replicated training.
"""

import pytest

pytestmark = pytest.mark.slow  # real Trainer epochs on the 8-device virtual mesh

import pathlib
import sys

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from leccr_tpu.config import ParallelConfig, tiny_test_config
from leccr_tpu.parallel.mesh import make_mesh, params_shardings


def test_fsdp_partition_specs():
    mesh = make_mesh(ParallelConfig(data=4, model=2))
    params = {
        "enc": {
            "c_fc": {"kernel": np.zeros((256, 1024), np.float32),
                     "bias": np.zeros((1024,), np.float32)},
            "out": {"kernel": np.zeros((1024, 256), np.float32)},
        },
        "embeddings": {"embedding": np.zeros((4096, 64), np.float32)},
        "odd": {"kernel": np.zeros((514, 1026), np.float32)},
    }
    sh = params_shardings(mesh, params, fsdp=True)
    # model axis from tensor parallelism, data axis on the largest free dim
    assert sh["enc"]["c_fc"]["kernel"].spec == P("data", "model")
    assert sh["enc"]["out"]["kernel"].spec == P("model", "data")
    assert sh["embeddings"]["embedding"].spec == P("data", "model")
    # small params stay replicated (gather latency > memory saved)
    assert sh["enc"]["c_fc"]["bias"].spec == P()
    # indivisible dims (514, 1026 vs data=4/model=2): 1026 % 2 == 0 so
    # model sharding sticks; 514 % 4 != 0 and the other dim is taken -> no
    # data axis
    assert sh["odd"]["kernel"].spec in (P(None, "model"), P())

    # fsdp=False keeps the old behavior
    sh0 = params_shardings(mesh, params, fsdp=False)
    assert sh0["enc"]["c_fc"]["kernel"].spec == P(None, "model")
    assert sh0["embeddings"]["embedding"].spec == P(None, "model")


def _run_epoch(tmp, fsdp: bool):
    from leccr_tpu.train.trainer import Trainer

    cfg = tiny_test_config()
    # tiny-tower params are all below the production FSDP size floor;
    # drop it so the test actually shards them
    cfg.parallel.fsdp_min_size = 1
    cfg.output_dir = str(tmp)
    cfg.model.dropout = 0.0
    cfg.model.text.hidden_dropout = 0.0
    cfg.model.text.attention_dropout = 0.0
    cfg.data.num_workers = 0
    cfg.train.batch_size_train = 16
    cfg.train.schedular.epochs = 1
    cfg.parallel.data = 4
    cfg.parallel.model = 2
    cfg.parallel.fsdp = fsdp
    trainer = Trainer(cfg, devices=jax.devices()[:8])
    if fsdp:
        specs = [x.sharding.spec
                 for x in jax.tree.leaves(trainer.state.params)]
        n_data = sum("data" in tuple(s) for s in specs)
        assert n_data > 10, f"only {n_data} params picked up the data axis"
    stats = trainer.train_epoch(0)
    lang = list(trainer.test_ds)[0]
    metrics = trainer.evaluate(trainer.test_ds[lang])
    return stats, metrics


def test_fsdp_epoch_matches_replicated(tmp_path_factory):
    """One real epoch + eval on the 8-dev virtual mesh: fsdp=True must
    reproduce the replicated run's losses (same program, different layout;
    only reduction order differs) and produce identical retrieval ranks.
    Both runs happen in THIS test, same process — a persisted baseline
    (pytest cache) could go stale across code revisions or be skipped by
    -k/--lf/xdist selection and compare apples to oranges."""
    def run(fsdp):
        stats, metrics = _run_epoch(
            tmp_path_factory.mktemp(f"fsdp_{fsdp}"), fsdp)
        losses = {k: float(v) for k, v in stats.items()
                  if k.startswith("loss")}
        assert losses and all(np.isfinite(v) for v in losses.values()), losses
        return losses, {k: float(v) for k, v in metrics.items()}

    base_losses, base_metrics = run(False)
    fsdp_losses, fsdp_metrics = run(True)
    for k, v in fsdp_losses.items():
        np.testing.assert_allclose(v, base_losses[k], rtol=2e-3, atol=1e-4,
                                   err_msg=f"loss {k} diverged under fsdp")
    for k, v in fsdp_metrics.items():
        np.testing.assert_allclose(v, base_metrics[k], rtol=1e-6,
                                   err_msg=f"metric {k} diverged under fsdp")
