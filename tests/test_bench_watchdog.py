"""bench.py outage-proofing: on a half-dead tunnel a dispatch hangs
forever inside native code, so every phase runs under a hard deadline
enforced by a daemon timer thread that prints ONE structured JSON line
(carrying every already-measured leg) and exits.  VERDICT r4 weak #1:
two of four BENCH_r* artifacts were red because nothing bounded the
measurement legs once the startup probe passed."""

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _last_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in output: {stdout[-2000:]!r}"
    return json.loads(lines[-1])


def test_watchdog_emits_partial_record_and_exits():
    """The core mechanism, end to end in a subprocess (the watchdog
    os._exit()s, so it cannot run in-process): a phase deadline expiring
    while the main thread is stuck in a never-returning call still
    produces one parseable line that retains the completed eval leg."""
    code = (
        "import time, bench\n"
        "rec = {'metric': 'train_pairs_per_sec_per_chip', 'value': 0.0,\n"
        "       'unit': 'NOT MEASURED', 'vs_baseline': 0.0}\n"
        "dog = bench._PhaseWatchdog(rec)\n"
        "dog.phase('eval', 60)\n"
        "rec['eval'] = {'metric': 'eval', 'value': 123.4}\n"
        "dog.phase('train', 1.0)\n"
        "time.sleep(600)  # simulated hung dispatch\n"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=str(REPO),
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 1, (r.returncode, r.stdout, r.stderr)
    rec = _last_json_line(r.stdout)
    assert rec["error"] == "tpu_stalled"
    assert "train" in rec["detail"]
    assert rec["eval"]["value"] == 123.4  # completed leg survived
    assert rec["value"] == 0.0


def test_bench_cli_stall_knob_bounded():
    """Full bench.py run with the simulated-stall env knob: the eval
    phase hangs at entry, the process still exits within the deadline
    with a parseable structured line (VERDICT r4 'done' criterion:
    kill the data plane mid-run and BENCH exits <120 s parseable)."""
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",  # bounded probe comes up on CPU
        "LECCR_BENCH_SIMULATE_STALL": "eval",
        "LECCR_BENCH_TIMEOUT_EVAL": "3",
    })
    r = subprocess.run([sys.executable, "bench.py", "--quick"],
                       cwd=str(REPO), env=env, capture_output=True,
                       text=True, timeout=110)
    assert r.returncode == 1, (r.returncode, r.stdout, r.stderr)
    rec = _last_json_line(r.stdout)
    assert rec["error"] == "tpu_stalled"
    assert rec["metric"] == "train_pairs_per_sec_per_chip"
    assert "eval" in rec["detail"]


def test_bench_eval_exception_still_emits_one_line():
    """A leg that RAISES (OOM, transient dispatch error) must also leave
    one parseable record — the round-3 artifact shipped a bare traceback
    (rc=1, parsed=null) for exactly this case."""
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "LECCR_BENCH_SIMULATE_FAIL": "eval",
    })
    r = subprocess.run(
        [sys.executable, "bench.py", "--quick", "--skip-train",
         "--skip-baseline"],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=110)
    rec = _last_json_line(r.stdout)
    assert rec["error"] == "eval_failed"
    assert "simulated eval failure" in rec["detail"]
    assert rec["metric"] == "train_pairs_per_sec_per_chip"
