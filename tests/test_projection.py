"""Flux-conserving projection: properties + differential vs NumPy oracle +
vmap consistency. The reference has no test of projectDF at all (SURVEY §4);
these close that gap."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sgp.projection.flux_projection import project_df
from oracle_numpy import project_df_np


def _problem(rng, n=200, b=50.0):
    c = rng.normal(0.0, 2.0, n)
    dia = rng.uniform(0.5, 2.0, n)
    return b, c, dia


@pytest.mark.parametrize('b', [1.0, 50.0, 1e4])
def test_constraints_satisfied(rng, b):
    _, c, dia = _problem(rng)
    x = np.asarray(project_df(b, jnp.asarray(c), jnp.asarray(dia), 1.0))
    assert (x >= 0).all()
    assert np.isclose(x.sum(), b, rtol=1e-9)


def test_matches_oracle(rng):
    for trial in range(12):
        b = float(rng.uniform(1.0, 500.0))
        _, c, dia = _problem(rng, n=150, b=b)
        ours = np.asarray(project_df(b, jnp.asarray(c), jnp.asarray(dia), 1.0))
        ref = project_df_np(b, c, dia, 1.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_matches_oracle_with_saturation(rng):
    b = 120.0
    c = rng.normal(1.0, 3.0, 100)
    dia = rng.uniform(0.5, 2.0, 100)
    sat, scaling = 4.0, 1.0
    ours = np.asarray(project_df(b, jnp.asarray(c), jnp.asarray(dia), scaling,
                                 sat_level=sat))
    ref = project_df_np(b, c, dia, scaling, sat=sat)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)
    assert (ours <= sat / scaling).all()


def test_identity_metric_projection(rng):
    """dia = 1: Euclidean projection onto the flux simplex (with x>=0)."""
    b = 10.0
    c = rng.normal(0.0, 1.0, 64)
    x = np.asarray(project_df(b, jnp.asarray(c), jnp.ones(64), 1.0))
    # KKT: x = max(0, c + lam) for the recovered lam
    lam_candidates = x[x > 0] - c[x > 0]
    assert lam_candidates.std() < 1e-8
    assert np.isclose(x.sum(), b, rtol=1e-9)


def test_already_feasible_early_exit(rng):
    c = rng.uniform(0.1, 1.0, 50)
    dia = np.ones(50)
    b = float(np.maximum(c, 0).sum())  # r(0) == 0 exactly
    x = np.asarray(project_df(b, jnp.asarray(c), jnp.asarray(dia), 1.0))
    np.testing.assert_allclose(x, np.maximum(c, 0), rtol=1e-12)


def test_vmap_matches_loop(rng):
    B, n = 8, 120
    bs = rng.uniform(5.0, 200.0, B)
    cs = rng.normal(0.0, 2.0, (B, n))
    dias = rng.uniform(0.5, 2.0, (B, n))
    batched = jax.vmap(lambda b, c, d: project_df(b, c, d, 1.0))(
        jnp.asarray(bs), jnp.asarray(cs), jnp.asarray(dias))
    for i in range(B):
        single = project_df(bs[i], jnp.asarray(cs[i]), jnp.asarray(dias[i]),
                            1.0)
        np.testing.assert_allclose(np.asarray(batched)[i],
                                   np.asarray(single), rtol=1e-9, atol=1e-12)


def test_sort_projection_matches_secant_oracle(rng):
    """The exact breakpoint-sweep projection agrees with the reference-style
    secant iteration to its own tolerance, with and without saturation."""
    import jax
    from tpu_sgp.projection.flux_projection import project_df_sort

    jitted = jax.jit(lambda b, c, d: project_df_sort(b, c, d, 1.0))
    jitted_sat = jax.jit(
        lambda b, c, d, s: project_df_sort(b, c, d, 1.0, sat_level=s,
                                           has_sat=True))
    n = 200
    for trial in range(25):
        b = float(rng.uniform(0.5, 1e4))
        c = rng.normal(rng.uniform(-2, 2), rng.uniform(0.5, 50), n)
        dia = rng.uniform(0.2, 5.0, n)
        if trial % 3 == 0:
            sat = float(rng.uniform(1.2 * b / n, 50 * b / n))
            ref = project_df_np(b, c, dia, 1.0, sat=sat)
            got = np.asarray(jitted_sat(b, jnp.asarray(c),
                                        jnp.asarray(dia), sat))
        else:
            ref = project_df_np(b, c, dia, 1.0)
            got = np.asarray(jitted(b, jnp.asarray(c), jnp.asarray(dia)))
        np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-9)
        assert np.isclose(got.sum(), b, rtol=1e-9)


def test_sort_projection_infeasible_saturates(rng):
    from tpu_sgp.projection.flux_projection import project_df_sort
    c = rng.normal(0, 1, 50)
    dia = np.ones(50)
    # capacity 50 * 0.5 = 25 < b = 100 -> everything saturates
    x = np.asarray(project_df_sort(100.0, jnp.asarray(c), jnp.asarray(dia),
                                   1.0, sat_level=0.5, has_sat=True))
    assert (x >= 0.49).all() and (x <= 0.5).all()


def test_2d_input_shape_preserved(rng):
    c = jnp.asarray(rng.normal(0.0, 1.0, (31, 31)))
    x = project_df(40.0, c, jnp.ones((31, 31)), 1.0)
    assert x.shape == (31, 31)
    assert np.isclose(float(jnp.sum(x)), 40.0, rtol=1e-9)


def test_pallas_projection_matches_bisect(rng):
    """The VMEM-resident Pallas kernel equals the XLA bisect path
    (interpret mode on CPU; compiled on TPU)."""
    import jax
    from tpu_sgp.projection.flux_projection import project_df_bisect
    from tpu_sgp.experimental.pallas_projection import project_df_pallas

    c = jnp.asarray(rng.normal(0.5, 1.0, (31, 31)))
    dia = jnp.asarray(rng.uniform(0.5, 2.0, (31, 31)))
    for sat in (None, 40.0):
        ref = project_df_bisect(500.0, c, dia, 1.0, sat_level=sat,
                                has_sat=sat is not None)
        got = project_df_pallas(500.0, c, dia, 1.0, sat_level=sat,
                                has_sat=sat is not None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)
    assert np.isclose(float(jnp.sum(got)), 500.0, rtol=1e-9)


def test_bisect_f32_flux_conservation(rng):
    """The f32 bisect stops at 28 bracket bits (flux_projection.py); flux
    conservation and the oracle distance must stay at f32 resolution."""
    from tpu_sgp.projection.flux_projection import project_df_bisect
    for trial in range(6):
        b = float(rng.uniform(10.0, 500.0))
        c = rng.normal(0.0, 2.0, 961).astype(np.float32)
        dia = rng.uniform(0.5, 2.0, 961).astype(np.float32)
        x = np.asarray(project_df_bisect(b, jnp.asarray(c),
                                         jnp.asarray(dia), 1.0))
        assert x.dtype == np.float32
        assert (x >= 0).all()
        assert abs(x.sum() - b) <= 4e-6 * b, (trial, x.sum(), b)
        ref = project_df_np(b, np.asarray(c, np.float64),
                            np.asarray(dia, np.float64), 1.0)
        np.testing.assert_allclose(x, ref, rtol=0, atol=2e-5 * abs(ref).max())


def test_bisect_f32_with_saturation_matches_oracle(rng):
    from tpu_sgp.projection.flux_projection import project_df_bisect
    b = 120.0
    c = rng.normal(1.0, 3.0, 400).astype(np.float32)
    dia = rng.uniform(0.5, 2.0, 400).astype(np.float32)
    x = np.asarray(project_df_bisect(b, jnp.asarray(c), jnp.asarray(dia),
                                     1.0, sat_level=4.0))
    ref = project_df_np(b, np.asarray(c, np.float64),
                        np.asarray(dia, np.float64), 1.0, sat=4.0)
    assert (x <= 4.0).all() and (x >= 0).all()
    assert abs(x.sum() - b) <= 4e-6 * b
    np.testing.assert_allclose(x, ref, rtol=0, atol=2e-5 * abs(ref).max())


def test_bisect_warm_matches_cold_for_any_pivot(rng):
    """The warm-started bisection must deliver the cold path's accuracy
    whatever the pivot quality: good (tight window hit), stale (window
    miss -> global-endpoint fallback), or invalid (NaN -> cold
    behavior)."""
    from tpu_sgp.projection.flux_projection import (project_df_bisect,
                                                    project_df_bisect_warm)

    for trial in range(4):
        c = jnp.asarray(rng.normal(50, 30, 400))
        dia = jnp.asarray(rng.uniform(0.5, 2.0, 400))
        b = jnp.asarray(rng.uniform(500, 5000))
        x_cold = project_df_bisect(b, c, dia, 1.0)
        err_cold = abs(float(jnp.sum(x_cold) - b)) / float(b)
        for lam_prev, dlam_prev in ((-80.0, 1e-3), (-80.0, 0.5),
                                    (40.0, 0.2), (np.nan, np.inf)):
            x_warm, lam = project_df_bisect_warm(
                b, c, dia, 1.0,
                lam_prev=jnp.asarray(lam_prev, c.dtype),
                dlam_prev=jnp.asarray(dlam_prev, c.dtype))
            err_warm = abs(float(jnp.sum(x_warm) - b)) / float(b)
            assert err_warm <= max(10 * err_cold, 1e-10), \
                (trial, lam_prev, dlam_prev, err_warm, err_cold)
            assert bool(jnp.isfinite(lam))


def test_solver_warm_projection_matches_cold(rng):
    """Full solve with warm_projection on vs off: same trajectory to
    projection-resolution roundoff (f64)."""
    from dataclasses import replace

    from tpu_sgp.config import SGPConfig
    from tpu_sgp.solvers.sgp import solve

    gn = jnp.asarray(np.maximum(
        rng.poisson(100 + 1000 * np.exp(-((np.mgrid[0:21, 0:21][0] - 10) ** 2
                    + (np.mgrid[0:21, 0:21][1] - 10) ** 2) / 8.0)), 1.0))
    psf = jnp.exp(-((jnp.arange(21)[:, None] - 10) ** 2
                    + (jnp.arange(21)[None, :] - 10) ** 2) / 6.0)
    psf = psf / psf.sum()
    bkg = jnp.full((21, 21), 100.0)
    z = jnp.zeros((21, 21))
    cfg = SGPConfig(max_iter=30, stop_criterion=3, tol_convergence=1e-6,
                    init_recon=2, proj_type=1, has_flux=False,
                    has_sat_level=False, dtype='float64')
    res_cold = solve(gn, psf, bkg, z, 0.0, z, 1.0, 1e-3, 0.0,
                     replace(cfg, warm_projection=False))
    res_warm = solve(gn, psf, bkg, z, 0.0, z, 1.0, 1e-3, 0.0,
                     replace(cfg, warm_projection=True))
    assert int(res_cold.iters) == int(res_warm.iters)
    np.testing.assert_allclose(np.asarray(res_warm.x),
                               np.asarray(res_cold.x), rtol=1e-6, atol=1e-9)
