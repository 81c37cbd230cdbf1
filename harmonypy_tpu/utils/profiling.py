"""Profiling / tracing helpers.

The reference has no profiling support beyond ad-hoc time() calls in its test
harness (SURVEY.md §5). Here:

  trace(dir)        context manager around jax.profiler.trace — captures a
                    TensorBoard-viewable device trace of everything inside.
  phase_timer()     host-side wall-clock accumulator with true device sync
                    (scalar readback — plain block_until_ready can return
                    early through remote-device tunnels).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x) -> None:
    """Force a real device sync by reading one scalar back to the host."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


class phase_timer:
    """Accumulate wall-clock per named phase with device-synced boundaries.

    >>> pt = phase_timer()
    >>> with pt("cluster"):   # doctest: +SKIP
    ...     state = engine.iter_fn(state, data, params)
    >>> pt.timings            # doctest: +SKIP
    {'cluster': 0.0123}
    """

    def __init__(self):
        self.timings: dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                device_sync(sync)
            self.timings[name] = self.timings.get(name, 0.0) + time.time() - t0
