"""run.py --task serve end-to-end: saved index -> HTTP service answers."""

import pytest

pytestmark = pytest.mark.slow  # full CLI subprocess pipeline (train->index->serve)

import json
import os
import pathlib
import subprocess
import sys
import threading
import urllib.error
import urllib.request

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def test_run_serve_cli(embedder, tmp_path):
    from leccr_tpu.serve import save_index

    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(5)
    images = rs.randint(0, 255, (4, res, res, 3)).astype(np.uint8)
    captions = [f"a red dog in the field {i}" for i in range(4)]
    index = embedder.build_image_index(
        images, captions, ids=[f"img{i}" for i in range(4)])
    idx_dir = tmp_path / "index"
    save_index(index, str(idx_dir))
    cfg_path = tmp_path / "config.json"
    cfg.save(str(cfg_path))

    env = dict(os.environ, LECCR_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "run.py", "--task", "serve",
         "--config", str(cfg_path), "--output_dir", str(tmp_path / "out"),
         "--index", str(idx_dir), "--port", "0", "--serve_bs", "4"],
        cwd=str(REPO), env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    killer = threading.Timer(600, proc.kill)
    killer.start()
    lines = []
    try:
        base = None
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("### serving on "):
                base = line.split()[3]
                break
        assert base, "server never came up:\n" + "".join(lines)

        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h == {"ok": True, "index_size": 4}

        body = json.dumps({"queries": ["a red dog", "field"],
                           "k": 2}).encode()
        req = urllib.request.Request(
            base + "/search", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert len(out["results"]) == 2
        for hits in out["results"]:
            assert len(hits) == 2
            assert all(hid.startswith("img") for hid, _ in hits)
            scores = [s for _, s in hits]
            assert scores == sorted(scores, reverse=True)

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        # warmup dispatch + our search
        assert stats["dispatches"] >= 2 and stats["errors"] == 0
    finally:
        killer.cancel()
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=30)


def test_run_full_pipeline_train_build_index_serve(tmp_path):
    """The complete production pipeline from one CLI: train on the tiny
    synthetic dataset, build a serving index from the trained checkpoint
    (--task build_index), then serve it (--task serve) and query over
    HTTP.  The reference has no serving story; this pins the beyond-
    reference train->deploy path end to end."""
    env = dict(os.environ, LECCR_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    out = tmp_path / "run"

    def cli(*extra, timeout=900):
        return subprocess.run(
            [sys.executable, "run.py", "--config", "configs/tiny_synth.yaml",
             "--output_dir", str(out), *extra],
            cwd=str(REPO), env=env, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    r = cli("--task", "itr_caption", "--epoch", "1")
    assert r.returncode == 0, r.stdout[-3000:]

    idx_dir = tmp_path / "index"
    r = cli("--task", "build_index", "--index", str(idx_dir),
            "--serve_bs", "4", "--int8")
    assert r.returncode == 0, r.stdout[-3000:]
    assert "### built index:" in r.stdout and "(int8)" in r.stdout

    # IVF build with recall calibration persists the operating point
    ivf_dir = tmp_path / "ivf"
    r = cli("--task", "build_index", "--index", str(ivf_dir),
            "--serve_bs", "4", "--ivf", "--ivf_clusters", "3",
            "--ivf_recall", "0.9")
    assert r.returncode == 0, r.stdout[-3000:]
    assert "### calibrated nprobe=" in r.stdout
    assert "### built IVF index:" in r.stdout
    from leccr_tpu.serve_ann import load_ivf

    assert load_ivf(str(ivf_dir)).default_nprobe in (1, 2, 3)

    # incremental maintenance from the CLI, both index families: drop
    # two items, then --add_new syncs them back (they are still in the
    # split) — embedding ONLY the missing two.  Exercises the int8
    # merge path (idx_dir is int8) and the IVF add path.
    from leccr_tpu.serve import load_index

    all_ids = load_index(str(idx_dir)).ids
    nprobe_before = load_ivf(str(ivf_dir)).default_nprobe
    for d in (idx_dir, ivf_dir):
        r = cli("--task", "update_index", "--index", str(d),
                "--serve_bs", "4", "--remove_ids", ",".join(all_ids[:2]))
        assert r.returncode == 0, r.stdout[-3000:]
        assert f"{len(all_ids)} -> {len(all_ids) - 2} items" in r.stdout
        extra = ("--ivf_recall", "0.9") if d is ivf_dir else ()
        r = cli("--task", "update_index", "--index", str(d),
                "--serve_bs", "4", "--add_new", *extra)
        assert r.returncode == 0, r.stdout[-3000:]
        assert f"-> {len(all_ids)} items (+2 -0)" in r.stdout
    back = load_index(str(idx_dir))
    assert sorted(back.ids) == sorted(all_ids) and back.quantized
    ivf_back = load_ivf(str(ivf_dir))
    assert sorted(ivf_back.ids) == sorted(all_ids)
    # the remove-then-add round trip must not clobber live rows
    # (round-4 advisor): every row survives in the slot bookkeeping —
    # item count alone can't detect overwritten packed slots
    v = np.asarray(ivf_back.valid)
    assert int(v.sum()) == ivf_back.n_valid
    np.testing.assert_array_equal(np.sort(np.asarray(ivf_back.rows)[v]),
                                  np.arange(ivf_back.n_valid))
    # the operating point survives the round trip: the plain update kept
    # the stamped nprobe; the --ivf_recall update re-measured it on the
    # maintained bank
    assert nprobe_before in (1, 2, 3)
    assert r.stdout.count("### recalibrated nprobe=") == 1
    assert ivf_back.default_nprobe in (1, 2, 3)

    proc = subprocess.Popen(
        [sys.executable, "run.py", "--task", "serve",
         "--config", str(out / "config.json"), "--output_dir", str(out),
         "--index", str(idx_dir), "--port", "0", "--serve_bs", "4"],
        cwd=str(REPO), env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    killer = threading.Timer(600, proc.kill)
    killer.start()
    lines = []
    try:
        base = None
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("### serving on "):
                base = line.split()[3]
                break
        assert base, "server never came up:\n" + "".join(lines)
        body = json.dumps({"queries": ["ein mann"], "k": 2}).encode()
        req = urllib.request.Request(
            base + "/search", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            hits = json.loads(r.read())["results"][0]
        assert len(hits) == 2
        scores = [s for _, s in hits]
        assert scores == sorted(scores, reverse=True)
    finally:
        killer.cancel()
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=30)


def test_run_serve_ivf_cli(embedder, tmp_path):
    """--task serve auto-detects an IVF save and answers /search with a
    per-request nprobe."""
    from leccr_tpu.serve_ann import build_ivf_index, save_ivf

    cfg = embedder.cfg
    res = cfg.model.vision.image_res
    rs = np.random.RandomState(11)
    images = rs.randint(0, 255, (12, res, res, 3)).astype(np.uint8)
    captions = [f"a red dog in the field {i}" for i in range(12)]
    index = embedder.build_image_index(
        images, captions, ids=[f"img{i}" for i in range(12)])
    ivf = build_ivf_index(index, n_clusters=3, iters=4)
    idx_dir = tmp_path / "ivf_index"
    save_ivf(ivf, str(idx_dir))
    cfg_path = tmp_path / "config.json"
    cfg.save(str(cfg_path))

    env = dict(os.environ, LECCR_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "run.py", "--task", "serve",
         "--config", str(cfg_path), "--output_dir", str(tmp_path / "out"),
         "--index", str(idx_dir), "--port", "0", "--serve_bs", "4"],
        cwd=str(REPO), env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    killer = threading.Timer(600, proc.kill)
    killer.start()
    lines = []
    try:
        base = None
        saw_ivf = False
        for line in proc.stdout:
            lines.append(line)
            saw_ivf |= line.startswith("### IVF index:")
            if line.startswith("### serving on "):
                base = line.split()[3]
                break
        assert base, "server never came up:\n" + "".join(lines)
        assert saw_ivf, "serve did not detect the IVF save:\n" + "".join(lines)

        body = json.dumps({"queries": ["a red dog"], "k": 3,
                           "nprobe": 3}).encode()
        req = urllib.request.Request(
            base + "/search", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            hits = json.loads(r.read())["results"][0]
        assert len(hits) == 3
        assert all(hid.startswith("img") for hid, _ in hits)

        # fusion against an IVF index is a client error (400), not a hang
        body = json.dumps({"queries": ["a dog"], "fusion": "minmax"}).encode()
        req = urllib.request.Request(
            base + "/search", data=body,
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        killer.cancel()
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=30)
