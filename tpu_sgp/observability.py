"""Observability: timing, profiling, NaN guards, solver logging.

TPU-native replacements for the reference's auxiliary hooks (SURVEY §5):
wall-clock ``times`` arrays -> block_until_ready timing + jax.profiler
traces; the np.errstate overflow guard -> opt-in jax debug_nans/debug_infs;
per-iteration convergence lines in ``sgp.log`` (reference sgp.py:104,
398-411) -> post-hoc series logging from the returned discrepancy buffer.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Callable, Optional

import jax
import numpy as np


def _sync(tree):
    """Force device completion. jax.block_until_ready is a no-op on some
    tunneled backends (axon), so completion is forced by materializing every
    leaf on the host."""
    jax.tree.map(np.asarray, tree)
    return tree


def timed(fn: Callable, *args, repeats: int = 1, **kw):
    """(result, best wall seconds) with device completion awaited (real
    host transfers — see _sync; transfer time is included)."""
    out = _sync(fn(*args, **kw))  # warm/compile
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = _sync(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return out, best


@contextlib.contextmanager
def profiled(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    """Opt-in NaN/Inf detection, the analog of the reference's
    np.errstate(all='raise') guard (flux_conserve_proj.py:68-72)."""
    if not enable:
        yield
        return
    prev_nan = jax.config.jax_debug_nans
    prev_inf = jax.config.jax_debug_infs
    jax.config.update('jax_debug_nans', True)
    jax.config.update('jax_debug_infs', True)
    try:
        yield
    finally:
        jax.config.update('jax_debug_nans', prev_nan)
        jax.config.update('jax_debug_infs', prev_inf)


def setup_sgp_logging(filename: str = 'sgp.log') -> logging.Logger:
    """File logger matching the reference's sgp.log sink (sgp.py:104)."""
    logging.basicConfig(filename=filename, level=logging.INFO, force=True)
    return logging.getLogger('tpu_sgp')


def log_convergence_series(discr: np.ndarray, iters: int,
                           stop_criterion: int, tol,
                           logger: Optional[logging.Logger] = None) -> None:
    """Emit the reference's per-iteration convergence lines post hoc from
    the returned discrepancy series (sgp.py:398-411)."""
    log = logger or logging.getLogger('tpu_sgp')
    for k in range(1, min(iters + 1, len(discr))):
        if stop_criterion in (0, 1):
            log.info('it %d of run (discr %g)', k, discr[k])
        elif stop_criterion == 4:
            log.info('it %d D_k %g tol %s', k, discr[k], tol)
        else:
            log.info('it %d discr %g tol %s', k, discr[k], tol)
