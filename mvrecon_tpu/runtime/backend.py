"""Backend availability probing — the outage-proof entry protocol.

The device backend on this class of machine (a tunneled TPU) has two
distinct failure modes, and a benchmark/CLI entry point must survive
both **before** it prints anything:

1. **Init raises** — ``jax.devices()`` throws ``RuntimeError: Unable to
   initialize backend`` when the tunnel endpoint is down.
2. **Init wedges** — the probe blocks forever inside a C++ RPC; no
   exception ever surfaces, so a try/except in the same process never
   runs.

Mode 2 is why :func:`probe_backend` runs the probe in a **subprocess**
with a hard timeout: the parent never touches the device runtime until a
child has proven it alive, so the parent stays responsive and can fall
back to CPU. (An in-process ``jax.devices()`` that wedges would take the
whole benchmark with it — observed on this machine: probes hung >9 min.)

The reference has no failure story at all (it is a single-process NumPy
program); this module is part of the framework tier SURVEY.md §5 calls
"failure detection". See also :mod:`mvrecon_tpu.runtime.watchdog` (abort
on wedge mid-run) and :mod:`mvrecon_tpu.runtime.elastic` (retry +
checkpointed resume).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Any

# The child re-runs the interpreter; sitecustomize preloads jax pinned to
# the device platform, so a bare "import jax; jax.devices()" probes the
# same backend the parent would use.
_PROBE_SRC = """
import sys
import numpy as np
import jax, jax.numpy as jnp
devs = jax.devices()
x = jnp.arange(8.0)
np.asarray(jnp.ravel(x * 2.0)[:4])  # tiny compile + host fetch
print(jax.default_backend(), len(devs))
"""


def probe_backend(
    attempts: int = 3,
    timeout_s: float = 300.0,
    backoff_s: float = 20.0,
    on_attempt=None,
) -> dict[str, Any]:
    """Prove the default backend alive from a throwaway subprocess.

    Returns a machine-readable record::

        {"ok": bool, "platform": str | None, "n_devices": int | None,
         "attempts": int, "error": str | None, "probe_s": float}

    Never raises. ``timeout_s`` bounds each attempt (first compile over a
    tunneled device can take minutes — keep it generous); ``backoff_s``
    sleeps between failed attempts (transient tunnel resets recover).
    """
    t0 = time.monotonic()
    last_err: str | None = None
    for attempt in range(1, attempts + 1):
        if on_attempt is not None:
            on_attempt()  # e.g. a Watchdog.pet: each attempt IS progress
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True,
                text=True,
                timeout=timeout_s,
                env=dict(os.environ),
            )
        except subprocess.TimeoutExpired:
            last_err = f"probe timed out after {timeout_s:.0f}s (device wedge)"
        except OSError as e:  # pragma: no cover - interpreter spawn failure
            last_err = f"probe spawn failed: {e}"
        else:
            if proc.returncode == 0 and proc.stdout.strip():
                platform, n = proc.stdout.split()[-2:]
                return {
                    "ok": True,
                    "platform": platform,
                    "n_devices": int(n),
                    "attempts": attempt,
                    "error": None,
                    "probe_s": round(time.monotonic() - t0, 1),
                }
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()
            last_err = tail[-1][:500] if tail else f"probe rc={proc.returncode}"
        if attempt < attempts:
            time.sleep(backoff_s)
    return {
        "ok": False,
        "platform": None,
        "n_devices": None,
        "attempts": attempts,
        "error": last_err,
        "probe_s": round(time.monotonic() - t0, 1),
    }


def require_backend_or_cpu(
    attempts: int = 3,
    timeout_s: float = 300.0,
    backoff_s: float = 20.0,
    on_attempt=None,
) -> dict[str, Any]:
    """Probe the default backend; on failure pin this process to CPU.

    Call BEFORE any jax computation in the calling process. On probe
    failure the parent is switched with
    ``jax.config.update("jax_platforms", "cpu")`` — which only works
    because the parent has not initialized a backend yet (the probe ran
    in a child). The returned record gains a ``"fallback"`` key naming
    the platform actually in effect.
    """
    rec = probe_backend(
        attempts=attempts, timeout_s=timeout_s, backoff_s=backoff_s,
        on_attempt=on_attempt,
    )
    if not rec["ok"]:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception as e:  # backend already initialized: nothing to do
            rec["fallback_error"] = str(e)[:200]
        rec["fallback"] = "cpu"
    return rec
