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


def test_bisect_newton_adversarial_accuracy(rng):
    """Accuracy pins for the guarded-Newton sectioning on the adversarial
    families it was calibrated against (flux_projection.newton_passes):
    knot cluster of mass >> b at the root, binding saturation, full
    saturation, and 10-decade dynamic range. f64 must sit inside the
    reference's own 1e-11*b secant tolerance; f32 at its residual noise
    floor (~2e-3 worst on the cluster instances — equal to 60-halving deep
    bisection on the same data, i.e. intrinsic to f32, see the calibration
    notes in newton_passes)."""
    from tpu_sgp.projection.flux_projection import project_df_bisect

    n = 961

    def instances():
        # knot cluster: ~n near-identical tiny-dia pixels at the root
        c = np.concatenate([np.full(n - 10, -5.0)
                            + rng.normal(0, 1e-8, n - 10),
                            rng.normal(50, 5, 10)])
        dia = np.concatenate([np.full(n - 10, 1e-5), np.ones(10)])
        yield 30.0, c, dia, None
        # binding saturation at the root
        yield 500.0, rng.normal(50, 30, n), rng.uniform(0.5, 2.0, n), 1.2
        # huge dynamic range
        c = rng.normal(0, 1, n) * np.exp(rng.uniform(0, 10, n))
        yield 100.0, c, np.exp(rng.uniform(-4, 4, n)), None

    for b, c, dia, sat in instances():
        for dt, tol in ((np.float64, 1e-11), (np.float32, 3e-3)):
            x = np.asarray(project_df_bisect(
                b, jnp.asarray(c, dt), jnp.asarray(dia, dt), 1.0,
                sat_level=sat, has_sat=sat is not None))
            assert (x >= 0).all()
            assert abs(x.sum() - b) <= tol * b, (dt, sat, x.sum(), b)

    # full saturation (capacity < b): the correct limit is x = cap
    c = rng.normal(0, 2, 100)
    dia = rng.uniform(0.5, 2.0, 100)
    for dt in (np.float64, np.float32):
        x = np.asarray(project_df_bisect(1000.0, jnp.asarray(c, dt),
                                         jnp.asarray(dia, dt), 1.0,
                                         sat_level=0.9))
        eps = np.finfo(dt).eps
        np.testing.assert_allclose(x, 0.9 - eps, rtol=50 * eps)


def test_solver_bisect_quality_matches_secant(rng):
    """End-to-end guard for the fast projection path: full f64 solves with
    projection_method='bisect' (guarded-Newton, static trips) vs 'secant'
    (reference-faithful iteration). The BB/line-search trajectory is
    chaotic (a one-ULP projection difference flips branches), so
    iterate-level equality is the wrong criterion; what the fast path must
    preserve is restoration QUALITY vs ground truth and flux conservation
    of the returned iterate. This is the test that caught a round-4
    prototype whose fixed-trip warm schedule silently degraded early-
    iteration projections and stalled stop rule 3."""
    from dataclasses import replace

    from conftest import synthetic_stamp
    from tpu_sgp.config import SGPConfig
    from tpu_sgp.solvers.sgp import solve

    cfg = SGPConfig(max_iter=60, stop_criterion=3, tol_convergence=1e-5,
                    init_recon=2, proj_type=1, has_flux=False,
                    has_sat_level=False, dtype='float64')
    errs_b, errs_s = [], []
    for seed in range(6):
        g = np.random.default_rng(seed)
        img, psf, bkg_v, truth = synthetic_stamp(g, size=25)
        gn = jnp.asarray(img)
        psf_j = jnp.asarray(psf)
        bkg = jnp.full(img.shape, bkg_v)
        z = jnp.zeros(img.shape)
        res_sec = solve(gn, psf_j, bkg, z, 0.0, z, 1.0, 1e-3, 0.0,
                        replace(cfg, projection_method='secant'))
        res_bis = solve(gn, psf_j, bkg, z, 0.0, z, 1.0, 1e-3, 0.0,
                        replace(cfg, projection_method='bisect'))
        x_s, x_b = np.asarray(res_sec.x), np.asarray(res_bis.x)
        errs_s.append(np.linalg.norm(x_s - truth) / np.linalg.norm(truth))
        errs_b.append(np.linalg.norm(x_b - truth) / np.linalg.norm(truth))
        flux = float(jnp.sum(gn - bkg))
        assert abs(x_b.sum() - flux) / flux < 1e-9, \
            (seed, abs(x_b.sum() - flux) / flux)
    assert np.mean(errs_b) <= np.mean(errs_s) * 1.05 + 1e-6, \
        (np.mean(errs_b), np.mean(errs_s), errs_b, errs_s)


def test_bisect_analytic_anchor_counterexamples():
    """Two Hypothesis-found instances that defeated pure
    bracket-narrowing (the global endpoints are loose by the dia/c
    dynamic range; eight halving passes could not recover):
    (1) one dia=513 pixel stretches hi = max(b*dia - c) to ~32,000x the
        root; (2) a flat activation shelf left of the root plus a steep
        tiny-dia cliff at it strands every data-driven candidate on the
        shelf. Both are collapsed by the analytic probe anchors
        (flux_projection._ladder_machinery): the all-active upper bound
        max(-c) + b/sum(1/dia) and the guaranteed lower bound
        (b - sum(max(0,c)/dia))/sum(1/dia)."""
    from tpu_sgp.projection.flux_projection import project_df_bisect

    n = 64
    # (1) single huge-dia pixel
    c1 = np.zeros(n); c1[-1] = 1.0
    d1 = np.ones(n); d1[-2] = 513.0
    # (2) flat shelf + tiny-dia cliff
    c2 = np.zeros(n); c2[1] = 137.0; c2[2] = -1.0
    d2 = np.ones(n); d2[1] = 89.0; d2[n // 2:] = 0.0078125

    for c, dia, b in ((c1, d1, 320.0), (c2, d2, 160.0)):
        x = np.asarray(project_df_bisect(b, jnp.asarray(c),
                                         jnp.asarray(dia), 1.0,
                                         sat_level=10.0))
        assert (x >= 0).all() and (x <= 10.0).all()
        assert abs(x.sum() - b) <= 1e-8 * b, (b, x.sum())
        x32 = np.asarray(project_df_bisect(
            b, jnp.asarray(c, jnp.float32), jnp.asarray(dia, jnp.float32),
            1.0, sat_level=10.0))
        assert abs(float(x32.sum()) - b) <= 2e-6 * b, (b, x32.sum())


def test_section_projection_matches_oracle_and_solver_accepts_it(rng):
    """'section' (the round-3 cold K-way sectioned bisection, kept as the
    interleaved-A/B control for the guided-secant default) reaches the
    same dual root as the reference-style secant oracle, and the solver
    dispatches it end to end."""
    from tpu_sgp.projection.flux_projection import project_df_section

    n = 150
    for trial in range(8):
        b = float(rng.uniform(1.0, 500.0))
        c = rng.normal(0.0, 2.0, n)
        dia = rng.uniform(0.5, 2.0, n)
        if trial % 2 == 0:
            sat = float(rng.uniform(2 * b / n, 40 * b / n))
            ref = project_df_np(b, c, dia, 1.0, sat=sat)
            got = np.asarray(project_df_section(
                b, jnp.asarray(c), jnp.asarray(dia), 1.0, sat_level=sat))
        else:
            ref = project_df_np(b, c, dia, 1.0)
            got = np.asarray(project_df_section(
                b, jnp.asarray(c), jnp.asarray(dia), 1.0))
        np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-9)

    # end-to-end: solver accepts projection_method='section' and matches
    # the default-path solve to stop-rule accuracy
    from tpu_sgp import SGPConfig
    from tpu_sgp.simulate import synthetic_star_stamps
    from tpu_sgp.solvers.sgp import solve

    stamps, psf, bkgs, fluxes = synthetic_star_stamps(1, size=31, seed=3)
    z = np.zeros_like(stamps[0])
    base = dict(max_iter=30, stop_criterion=1, init_recon=2, proj_type=1,
                has_flux=True, has_sat_level=True, dtype='float64')
    args = (jnp.asarray(stamps[0]), jnp.asarray(psf),
            jnp.full(stamps[0].shape, float(bkgs[0])), jnp.asarray(z),
            float(fluxes[0]), jnp.asarray(z), 65000.0, 1e-3, 0.0)
    xa = np.asarray(solve(*args, SGPConfig(projection_method='section',
                                           **base)).x)
    xb = np.asarray(solve(*args, SGPConfig(projection_method='bisect',
                                           **base)).x)
    np.testing.assert_allclose(xa, xb, rtol=1e-6, atol=1e-9)
