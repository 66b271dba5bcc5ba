"""XLA compiler-flag sweep for the flagship train step (VERDICT round-3
"one new MFU lever" item): re-runs scripts/profile_train.py in a child
process per flag combination (XLA_FLAGS must be set before backend init)
and tabulates the device-resident step wall.

Candidate levers target the attributed residue (docs/DESIGN.md round-3
phase 2): matmul-epilogue serialization and custom-call DMA overhead —
the latency-hiding scheduler reorders async copies around compute, and a
larger scoped-VMEM budget lets fusions carry bigger tiles so the GELU /
LayerNorm epilogues amortize over more MXU work.  --bf16-moments rides
along as the optimizer-HBM lever (halves mu/nu read+write traffic).

Usage: python scripts/sweep_xla_flags.py [BS] [--fused]
"""
import re
import subprocess
import sys
from pathlib import Path

BS = next((a for a in sys.argv[1:] if a.isdigit()), "128")
EXTRA = [a for a in sys.argv[1:] if not a.isdigit()] or ["--fused"]

SWEEP = [
    ("baseline", "", []),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true", []),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768", []),
    ("vmem48m", "--xla_tpu_scoped_vmem_limit_kib=49152", []),
    ("lhs+vmem32m",
     "--xla_tpu_enable_latency_hiding_scheduler=true "
     "--xla_tpu_scoped_vmem_limit_kib=32768", []),
    ("bf16-moments", "", ["--bf16-moments"]),
    ("bf16-moments+best", None, ["--bf16-moments"]),  # flags filled below
]

STEP_RE = re.compile(
    r"step \(device-resident batch\): ([0-9.]+) ms")
MFU_RE = re.compile(r"MFU ([0-9.]+)%")


def run_one(flags: str, extra_args):
    env = dict(__import__("os").environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    # each variant compiles a different program: keep the persistent cache
    # (keyed by flags) but bound the run.  A hung variant (exactly what an
    # experimental --xla_tpu_* flag can cause) must not abort the sweep —
    # report it FAILED and move on to the remaining variants.
    try:
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).parent / "profile_train.py"),
             BS, *EXTRA, *extra_args],
            capture_output=True, text=True, timeout=1800, env=env)
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace")
               if isinstance(e.stdout, bytes) else (e.stdout or ""))
        return None, None, f"timeout after 1800s\n{out.strip()[-400:]}"
    out = proc.stdout + proc.stderr
    m = STEP_RE.search(out)
    mfu = MFU_RE.search(out)
    if proc.returncode != 0 or not m:
        tail = "\n".join(out.strip().splitlines()[-8:])
        return None, None, tail
    return float(m.group(1)), (float(mfu.group(1)) if mfu else None), None


def main():
    results = []
    best_flags = ""
    best_ms = None
    for name, flags, extra in SWEEP:
        if flags is None:  # combo slot: best pure-flag variant so far
            flags = best_flags
            name = f"bf16-moments+{best_flags or 'baseline'}"
        ms, mfu, err = run_one(flags, extra)
        if err is not None:
            print(f"{name:<28} FAILED\n{err}\n")
            continue
        print(f"{name:<28} {ms:8.1f} ms  "
              f"{float(BS)/ms*1000:7.1f} pairs/s  "
              + (f"MFU {mfu:.1f}%" if mfu else ""), flush=True)
        results.append((name, ms, mfu))
        if not extra and (best_ms is None or ms < best_ms):
            best_ms, best_flags = ms, flags
    if results:
        name, ms, mfu = min(results, key=lambda r: r[1])
        print(f"\nbest: {name} at {ms:.1f} ms"
              + (f" (MFU {mfu:.1f}%)" if mfu else ""))


if __name__ == "__main__":
    main()
