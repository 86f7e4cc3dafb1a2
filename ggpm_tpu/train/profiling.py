"""Tracing / profiling / diagnostics utilities.

The reference has none of this (SURVEY.md §5: diagnostics are stdout prints
of param/grad norms, vae_train.py:63-64,89-96).  TPU-native equivalents:

* ``trace_server`` / ``trace`` — jax.profiler integration (view in
  TensorBoard / Perfetto);
* ``named_scope`` — annotate model sections in the trace timeline;
* ``Throughput`` — steps/sec + molecules/sec meter (the BASELINE metric);
* ``enable_nan_checks`` — jax_debug_nans behind a flag (the purity-based
  "race detector" analogue for this framework);
* ``param_norm`` / ``grad_norm`` — the reference's printed diagnostics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp


def trace_server(port: int = 9999) -> None:
    """Start the profiler server; attach TensorBoard's profile plugin."""
    jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a program trace for offline inspection."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update('jax_debug_nans', enable)


def param_norm(params) -> float:
    return float(jnp.sqrt(sum(jnp.sum(x * x)
                              for x in jax.tree.leaves(params))))


def grad_norm(grads) -> float:
    return param_norm(grads)


class Throughput:
    """Rolling steps/sec and molecules/sec meter."""

    def __init__(self, window: int = 50):
        self.window = window
        self.reset()

    def reset(self) -> None:
        self.t0 = time.time()
        self.steps = 0
        self.mols = 0

    def update(self, n_mols: int) -> None:
        self.steps += 1
        self.mols += n_mols

    def rates(self) -> Dict[str, float]:
        dt = max(time.time() - self.t0, 1e-9)
        return {'steps_per_sec': self.steps / dt,
                'mols_per_sec': self.mols / dt}
