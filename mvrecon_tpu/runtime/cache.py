"""Persistent XLA compilation cache.

TPU compiles are expensive (and on tunneled devices, very expensive);
every CLI/bench entry point enables the on-disk cache so recompiles are
paid once per program shape, not once per process.

Two hard-won safety rules on this image:

- **CPU backend: the cache stays off.** XLA:CPU entries embed AOT host
  machine code; on this image both loading entries serialized on a host
  with different CPU features ("Machine type used for XLA:CPU
  compilation doesn't match ... could lead to execution errors such as
  SIGILL") and the serialization itself (`put_executable_and_time`)
  have produced intermittent segfaults. CPU compiles are cheap; the
  cache buys nothing there.
- **Entries land in a per-machine subdirectory** keyed by the host CPU
  feature set and jaxlib version, so entries written by a different
  machine in earlier rounds are never visible.
"""

from __future__ import annotations

import hashlib
import os
import platform

import jax

DEFAULT_CACHE_DIR = os.environ.get("MVRECON_JAX_CACHE", "/root/.jax_cache")


def _machine_tag() -> str:
    """Stable fingerprint of (host CPU features, jaxlib version)."""
    try:
        import jaxlib

        ver = getattr(jaxlib, "__version__", "unknown")
    except Exception:
        ver = "unknown"
    flags = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    probe = f"{platform.machine()};{ver};{flags}"
    return hashlib.sha1(probe.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable the on-disk compile cache for non-CPU backends. Never raises:
    a cache is an optimization, and on this machine the backend-init probe
    inside ``jax.default_backend()`` is itself a failure point (the axon
    tunnel being down raises ``RuntimeError`` here — round 3's only bench
    artifact was that traceback). Callers that need to *know* whether the
    device is alive use :func:`mvrecon_tpu.runtime.backend.probe_backend`."""
    try:
        if jax.default_backend() == "cpu":
            return  # see module docstring: XLA:CPU AOT (de)serialization is
            # unreliable on this image, and CPU compiles are cheap anyway.
        path = os.path.join(cache_dir or DEFAULT_CACHE_DIR, _machine_tag())
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:
        import sys

        sys.stderr.write(f"[mvrecon] compilation cache disabled: {e}\n")
