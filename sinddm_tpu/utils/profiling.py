"""Tracing / profiling hooks (the reference has none — SURVEY §5).

Two layers:
* :func:`phase_timer` — lightweight per-phase wall-clock logging with a
  device sync (``block_until_ready`` can return early on tunneled
  backends, so the sync reduces to a tiny scalar transfer);
* :func:`trace` — a ``jax.profiler.trace`` wrapper producing TensorBoard-
  loadable traces of the XLA execution.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

_LOG: Callable[[str], None] = print


def sync(x=None) -> None:
    """Force completion of all queued device work.

    A scalar device->host transfer is the only reliable barrier on
    backends where ``block_until_ready`` returns at enqueue time.
    """
    if x is not None:
        jax.device_get(jnp.asarray(x).ravel()[0])
    else:
        jax.device_get(jnp.zeros(()) + 0.0)


@contextlib.contextmanager
def phase_timer(name: str, sync_value=None, log: Optional[Callable] = None):
    """Log the wall-clock of a phase, syncing the device at exit.

    >>> with phase_timer("sample scale 3", sync_value=lambda: out):
    ...     out = run()
    """
    log = log or _LOG
    t0 = time.time()
    yield
    sync(sync_value() if callable(sync_value) else sync_value)
    log(f"[phase] {name}: {time.time() - t0:.3f}s")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard)."""
    with jax.profiler.trace(log_dir):
        yield
