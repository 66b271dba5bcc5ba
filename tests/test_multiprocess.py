"""True multi-process (multi-host) integration test.

Launches TWO separate JAX processes (gloo CPU collectives, 2 local devices
each -> a 4-device global mesh) running Trainer.fit() on a shared synthetic
dataset, and a single-process run of the same config on a 4-device mesh.
Verifies the multi-host path end to end: per-process batch slices assembled
with make_array_from_process_local_data, sharded eval, collective orbax
checkpointing, and replicated metrics — the capability the reference gets
from torch.distributed.launch + NCCL DDP (run_multi30k.sh:1-5,
image_Retrieval_caption.py:330-352), rebuilt as single-controller SPMD.

Loss parity note: the global batch in the multi-process run is a row
permutation of the single-process one (shard_indices interleaves), and every
loss is invariant to joint row permutation (soft labels ride on `idx`), so
train losses must agree up to reduction-order float noise.
"""

import pytest

pytestmark = pytest.mark.slow  # two real JAX processes + gloo

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path



REPO = Path(__file__).resolve().parents[1]

WORKER = textwrap.dedent("""
    import json, os, sys
    pid, nproc, port, cfg_path, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        sys.argv[4], sys.argv[5])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc and jax.device_count() == 2 * nproc
    from leccr_tpu.config import load_config
    from leccr_tpu.train.trainer import Trainer
    cfg = load_config(cfg_path)
    stats = Trainer(cfg).fit()
    with open(f"{out_path}.{pid}", "w") as f:
        json.dump(stats, f)
    # the coordination-service Shutdown:: barrier can time out under heavy
    # host load (seen in full-suite runs) AFTER all real work is done and
    # verified via the stats files -- tolerate it instead of failing
    try:
        jax.distributed.shutdown()
    except Exception as e:  # barrier timeout / peer disconnect
        print("ignoring shutdown flake:", e)
    os._exit(0)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_fit_matches_single_process(tmp_path):
    from leccr_tpu.config import tiny_test_config
    from leccr_tpu.data.synthetic import make_image_dataset

    # shared dataset, generated once by the parent (no generation race)
    synth = make_image_dataset(str(tmp_path / "ds"), n_train=16, n_eval=4,
                               caps_per_image=2, image_res=64, seed=0)
    cfg = tiny_test_config()
    cfg.data.dataset = "multi30k"
    for field in ("root_dir", "train_file", "val_file", "test_file",
                  "image_root", "generated_caption_dir", "text_vocab"):
        setattr(cfg.data, field, getattr(synth, field))
    # dropout masks are position-dependent, so zero them for exact parity
    # between the (row-permuted) multi-process batch and the single one
    cfg.model.text.hidden_dropout = 0.0
    cfg.model.text.attention_dropout = 0.0
    cfg.model.dropout = 0.0  # interaction-head dropout
    cfg.data.randaugment = False
    cfg.train.batch_size_train = 8
    cfg.train.batch_size_test = 4
    cfg.train.batch_size_test_text = 8
    cfg.train.schedular.epochs = 1
    cfg.parallel.data = 4
    cfg.parallel.model = 1

    # --- two real processes, 2 local CPU devices each -------------------
    cfg.output_dir = str(tmp_path / "mp")
    cfg_path = tmp_path / "cfg_mp.json"
    cfg_path.write_text(cfg.to_json())
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out = tmp_path / "stats"
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port),
         str(cfg_path), str(out)],
        env=env, cwd=str(REPO), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in (0, 1)]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        if p.returncode != 0:
            # The coordination service's shutdown barrier can time out
            # under heavy host load and its error-polling thread then
            # LOG(FATAL)s the worker from C++ (client.h:80), bypassing
            # the worker's Python-level try/except -- but only AFTER all
            # real work finished (the stats file below is written before
            # shutdown, and its contents are fully verified).  Tolerate
            # exactly that failure; anything else is a real crash.
            assert ((tmp_path / f"stats.{pid}").exists()
                    and "Shutdown barrier has failed" in log), \
                f"worker failed:\n{log[-4000:]}"
    mp0 = json.loads((tmp_path / "stats.0").read_text())
    mp1 = json.loads((tmp_path / "stats.1").read_text())

    # every process computes identical replicated stats
    assert mp0 == mp1
    assert "de_test_sumr_sum" in mp0
    # collective checkpoint landed (written once, by process 0)
    assert (tmp_path / "mp" / "checkpoints" / "best.json").exists()

    # --- single-process oracle: same config, 4-device mesh --------------
    cfg.output_dir = str(tmp_path / "sp")
    cfg_path2 = tmp_path / "cfg_sp.json"
    cfg_path2.write_text(cfg.to_json())
    sp = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(f"""
            import json, os
            os.environ["XLA_FLAGS"] = (
                "--xla_force_host_platform_device_count=4")
            import jax
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_default_matmul_precision", "highest")
            from leccr_tpu.config import load_config
            from leccr_tpu.train.trainer import Trainer
            stats = Trainer(load_config({str(cfg_path2)!r})).fit()
            json.dump(stats, open({str(out)!r} + ".sp", "w"))
        """)],
        env=env, cwd=str(REPO), capture_output=True, timeout=900)
    assert sp.returncode == 0, sp.stdout.decode()[-2000:] + \
        sp.stderr.decode()[-2000:]
    single = json.loads((tmp_path / "stats.sp").read_text())

    for key in ("train_loss_itc_vs", "train_loss_itc_vt",
                "train_loss_itc_st", "train_loss_itc_c",
                "train_loss_reg_c"):
        a, b = float(mp0[key]), float(single[key])
        assert abs(a - b) <= 5e-3 * max(1.0, abs(b)), (key, a, b)
