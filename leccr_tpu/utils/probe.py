"""Bounded accelerator probing shared by the driver entry points.

``jax.devices()`` hangs for MINUTES in-process when the remote TPU tunnel
is dead (round-3 shipped a BENCH rc=1 traceback and a MULTICHIP rc=124
timeout because of exactly this), so any "is a backend up?" question must
be asked in a short-timeout subprocess the caller can abandon.  bench.py
and __graft_entry__.py both route through here — one implementation, one
place to fix probe behavior.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional

# env override so an operator (or the driver) can tighten/loosen the
# bound without touching code
_TIMEOUT_ENV = "LECCR_PROBE_TIMEOUT"


def bounded_probe(code: str, timeout_s: float) -> Optional[str]:
    """Run ``code`` in a subprocess with a hard timeout; return the LAST
    stdout line on success (rc == 0), None on any failure — timeout,
    crash, empty output.  Callers treat None as "no backend"."""
    timeout_s = float(os.environ.get(_TIMEOUT_ENV, timeout_s))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s)
        if proc.returncode == 0 and proc.stdout.strip():
            return proc.stdout.strip().splitlines()[-1]
    except Exception:
        pass
    return None


def probe_backend(timeout_s: float = 45.0) -> Optional[str]:
    """Default-backend platform name ("tpu"/"cpu"/...), or None when no
    backend comes up within the bound."""
    return bounded_probe(
        "import jax; jax.devices(); print(jax.default_backend())",
        timeout_s)


def probe_physical_devices(timeout_s: float = 30.0) -> int:
    """Physical accelerator count, 0 when unconfirmable — callers fall
    through to a virtual-CPU mesh, which needs no accelerator at all."""
    out = bounded_probe(
        "import jax; print(len(jax.devices()))", timeout_s)
    try:
        return int(out) if out is not None else 0
    except ValueError:
        return 0
