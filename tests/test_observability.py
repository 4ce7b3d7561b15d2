"""Observability helpers: timing, NaN guard, log series, profiler trace."""
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sgp import observability as obs


def test_timed_returns_result_and_wall():
    f = jax.jit(lambda x: jnp.sum(x * x))
    out, wall = obs.timed(f, jnp.arange(1000.0), repeats=2)
    assert np.isclose(float(out), float(np.sum(np.arange(1000.0) ** 2)))
    assert wall > 0


def test_nan_guard_detects():
    with pytest.raises(FloatingPointError):
        with obs.nan_guard():
            jax.block_until_ready(jnp.log(jnp.asarray(-1.0)) * 1.0)
    # guard restores prior state
    assert not jax.config.jax_debug_nans


def test_log_convergence_series(tmp_path):
    logfile = str(tmp_path / 'sgp.log')
    logger = obs.setup_sgp_logging(logfile)
    discr = np.array([1.0, 0.5, 0.25, 0.125])
    obs.log_convergence_series(discr, iters=3, stop_criterion=4, tol=1.1,
                               logger=logger)
    logging.shutdown()
    text = open(logfile).read()
    assert 'D_k' in text and text.count('it ') == 3


def test_profiled_writes_trace(tmp_path):
    d = str(tmp_path / 'trace')
    try:
        with obs.profiled(d):
            jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    except Exception as exc:  # profiler availability varies per backend
        pytest.skip(f'profiler unavailable: {exc}')
    assert os.path.isdir(d) and len(list(os.walk(d))) > 0


def test_nan_guard_disabled_is_passthrough():
    """nan_guard(enable=False) must neither trap NaNs nor touch the debug
    config — the solver wraps hot paths in it unconditionally and relies
    on the disabled path being free."""
    with obs.nan_guard(enable=False):
        v = jnp.log(jnp.asarray(-1.0)) * 1.0   # NaN, silently
        assert not jax.config.jax_debug_nans
    assert np.isnan(float(v))


def test_log_convergence_series_other_criteria(tmp_path):
    """Criterion-specific line formats (reference sgp.py:398-411): fixed
    iterations log plain discr, relative rules log discr vs tol."""
    logfile = str(tmp_path / 'sgp2.log')
    logger = obs.setup_sgp_logging(logfile)
    discr = np.array([1.0, 0.5, 0.25])
    obs.log_convergence_series(discr, iters=2, stop_criterion=1, tol=None,
                               logger=logger)
    obs.log_convergence_series(discr, iters=2, stop_criterion=3, tol=1e-4,
                               logger=logger)
    logging.shutdown()
    text = open(logfile).read()
    assert 'of run' in text          # criterion 0/1 format
    assert 'tol 0.0001' in text      # criterion 2/3 format
