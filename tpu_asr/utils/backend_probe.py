"""Subprocess-based JAX backend probing.

A dead axon TPU tunnel HANGS backend init for hours (observed round 3,
2026-08-17), and a hung init poisons the probing process itself:
``jax.extend.backend.clear_backends`` deadlocks behind the stuck init
lock.  So liveness must be probed from a THROWAWAY subprocess that can be
killed on timeout.  Shared by ``__graft_entry__`` (compile-check CPU
fallback) and ``bench.py`` (outage-proof retry loop across the bench
deadline).

``TPU_ASR_FORCE_BACKEND_DOWN=1`` makes every probe report 0 devices
without spawning anything — the outage-simulation hook for tests.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Callable

FORCE_DOWN_ENV = "TPU_ASR_FORCE_BACKEND_DOWN"


def _forced_down() -> bool:
    return os.environ.get(FORCE_DOWN_ENV, "") not in ("", "0")


def probe_backend(timeout_s: float = 150.0) -> int:
    """Device count of the DEFAULT jax backend per a subprocess probe.

    Returns 0 on init failure, nonzero exit, or timeout (the hung-tunnel
    case: the child is killed, this process stays clean).
    """
    if _forced_down():
        return 0
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            timeout=timeout_s, capture_output=True, text=True)
        return int(r.stdout.strip() or 0) if r.returncode == 0 else 0
    except Exception:  # noqa: BLE001  (TimeoutExpired, OSError, ...)
        return 0


def wait_for_backend(deadline_ts: float,
                     probe_timeout_s: float = 150.0,
                     interval_s: float = 30.0,
                     log: Callable[[str], None] | None = None) -> int:
    """Retry subprocess probes until one succeeds or ``time.time()``
    passes ``deadline_ts``.

    Returns the device count — immediately on the first healthy probe
    (measurement starts the moment the tunnel heals), 0 if the budget is
    exhausted without the backend ever answering.
    """
    if _forced_down():
        if log:
            log(f"backend forced down via ${FORCE_DOWN_ENV}")
        return 0
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline_ts - time.time()
        if remaining <= 5.0:
            if log:
                log(f"backend wait budget exhausted after {attempt - 1} "
                    f"probes")
            return 0
        t0 = time.time()
        n = probe_backend(min(probe_timeout_s, remaining))
        if n > 0:
            if log and attempt > 1:
                log(f"backend healed on probe #{attempt}")
            return n
        if log:
            log(f"backend probe #{attempt} failed "
                f"({time.time() - t0:.0f}s; {remaining:.0f}s budget left)")
        time.sleep(min(interval_s, max(0.0, deadline_ts - time.time())))
