"""Reference-compatible ``bundle_adjustment`` module.

API parity with ``lib/bundle_adjustment.py``: a ``BundleAdjuster`` class
with ``__init__(x, init_X, init_K, init_R, init_t, f0, visibility_index,
axis)``, ``optimize(scale_factor, delta_tol, max_iter, is_debug)`` and
``get_log()``. Internally everything runs through the functional jitted
LM core (``models/bundle_adjustment.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import LMConfig
from .models.bundle_adjustment import bundle_adjust


class BundleAdjuster:
    """Drop-in replacement for the reference class
    (``lib/bundle_adjustment.py:10-206``)."""

    # dense-core budget: beyond this coupling-block size, dispatch to the
    # chunk-streamed core (class attribute so tests can lower it)
    CHUNKED_THRESHOLD_BYTES = 1_500_000_000

    def __init__(
        self,
        x,
        init_X,
        init_K,
        init_R,
        init_t,
        f0: float = 1.0,
        visibility_index=None,
        axis: str = "x-right_z-forward",
    ):
        self._x = jnp.asarray(x)
        self._init = (
            jnp.asarray(init_X),
            jnp.asarray(init_K),
            jnp.asarray(init_R),
            jnp.asarray(init_t),
        )
        self._f0 = float(f0)
        self._axis = axis
        self._vis = None if visibility_index is None else jnp.asarray(visibility_index)
        self._log: list[dict] = []

    def optimize(
        self,
        scale_factor: float = 10.0,
        delta_tol: float = 1e-8,
        max_iter: int = 100,
        is_debug: bool = False,
    ):
        """Reference ``optimize`` (``bundle_adjustment.py:77-202``):
        returns (X, K, R, t) in the original frame."""
        config = LMConfig(
            scale_factor=float(scale_factor),
            delta_tol=float(delta_tol),
            max_iter=int(max_iter),
            record_log=bool(is_debug),
        )
        init_X, init_K, init_R, init_t = self._init

        # Auto-dispatch: the dense core materializes (P, F, 9)-class
        # tensors; beyond ~1.5 GB of coupling block switch to the
        # chunk-streamed core (identical protocol). With is_debug at
        # that scale the log degrades to the scalar error curve — the
        # full-state animation log is itself a (max_iter, P, 3)-class
        # tensor, which would defeat the chunked core's memory contract
        # (it used to silently fall back to the dense core and OOM).
        npts, nf = self._x.shape[0], init_R.shape[0]
        coupling_bytes = npts * nf * 27 * self._x.dtype.itemsize
        use_chunked = coupling_bytes > self.CHUNKED_THRESHOLD_BYTES
        if use_chunked:
            from .models.bundle_adjustment_chunked import bundle_adjust_chunked

            res = bundle_adjust_chunked(
                self._x,
                init_X,
                init_K,
                init_R,
                init_t,
                f0=self._f0,
                visibility=self._vis,
                axis=self._axis,
                config=config,
            )
        else:
            res = bundle_adjust(
                self._x,
                init_X,
                init_K,
                init_R,
                init_t,
                f0=self._f0,
                visibility=self._vis,
                axis=self._axis,
                config=config,
            )
        if is_debug and res.log is not None:
            if use_chunked:
                from .runtime.logging import scalar_log_to_records

                self._log = scalar_log_to_records(res.log, res.n_iter)
            else:
                from .runtime.logging import device_log_to_records

                self._log = device_log_to_records(res.log, res.n_iter)
        self.result = res
        return res.X, res.K, res.R, res.t

    def get_log(self):
        """Reference ``get_log`` (``bundle_adjustment.py:204-206``).

        Note: the recorded (points, basis, pos) are in the normalized gauge
        frame, matching the reference which logs pre-restore state. At
        chunked scale (see ``optimize``) each record carries only
        ``reprojection_error`` — the state trajectory is not held."""
        return self._log
