"""Divergence family: values and derivatives vs jax.grad oracles.

Replaces the reference's PyTorch-autograd checks
(/root/reference/restoration/tests.py) with jax.grad, and adds a NumPy
cross-check.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_sgp.ops import divergence as dv
from oracle_numpy import beta_div_np, beta_div_dbeta_np


def _rand_pair(rng, n=64):
    den = rng.uniform(0.2, 5.0, n)
    gn = rng.uniform(0.2, 5.0, n)
    return jnp.asarray(den), jnp.asarray(gn)


def test_beta_div_matches_numpy(rng):
    den, gn = _rand_pair(rng)
    for b in [0.5, 0.9887, 1.005, 1.7, 2.0]:
        ours = dv.beta_div(den, gn, jnp.float64(b))
        ref = beta_div_np(np.asarray(den), np.asarray(gn), b)
        assert np.isclose(float(ours), ref, rtol=1e-12)


def test_beta_div_special_cases(rng):
    den, gn = _rand_pair(rng)
    # beta -> 1 limit approaches the KL special case
    kl = dv.beta_div_special(den, gn, 1.0)
    near = dv.beta_div(den, gn, jnp.float64(1.0 + 1e-7))
    assert np.isclose(float(kl), float(near), rtol=1e-5)
    isd = dv.beta_div_special(den, gn, 0.0)
    near0 = dv.beta_div(den, gn, jnp.float64(1e-7))
    assert np.isclose(float(isd), float(near0), rtol=1e-4)


def test_beta_div_dbeta_vs_autodiff(rng):
    """Closed-form d/dbeta equals jax.grad of the objective (the reference
    verified the same identity against torch autograd, tests.py:54-68)."""
    den, gn = _rand_pair(rng, 32)
    for b in [0.7, 1.3, 1.7, 2.2]:
        closed = float(jnp.sum(dv.beta_div_dbeta(den, gn, jnp.float64(b))))
        auto = float(jax.grad(dv.beta_div, argnums=2)(den, gn, jnp.float64(b)))
        assert np.isclose(closed, auto, rtol=1e-9), (b, closed, auto)
        npver = beta_div_dbeta_np(np.asarray(den), np.asarray(gn), b).sum()
        assert np.isclose(closed, npver, rtol=1e-12)


def test_beta_div_dbeta_float32_stability_near_special_betas(rng):
    """The series-switched d/dbeta form stays accurate in f32 where the
    reference's 1/(beta-1)^2 closed form loses all precision (beta near 1
    and 0); at the exact singular points it returns the finite limit."""
    den = rng.uniform(0.2, 5.0, 1024)
    gn = rng.uniform(0.2, 5.0, 1024)
    d64, g64 = jnp.asarray(den), jnp.asarray(gn)
    d32 = jnp.asarray(den, jnp.float32)
    g32 = jnp.asarray(gn, jnp.float32)
    for b in (1.0001, 0.9999, 1.000001, 1e-4, -1e-4):
        exact = float(jnp.sum(dv.beta_div_dbeta(d64, g64, jnp.float64(b))))
        f32 = float(jnp.sum(dv.beta_div_dbeta(d32, g32, jnp.float32(b))))
        raw = beta_div_dbeta_np(den.astype(np.float32),
                                gn.astype(np.float32), np.float32(b)).sum()
        assert abs(f32 - exact) / abs(exact) < 1e-3, (b, f32, exact)
        assert abs(f32 - exact) < abs(raw - exact), (b, f32, raw, exact)
    # exact singular points: finite, equal to the two-sided limit
    for b, eps in ((1.0, 1e-9), (0.0, 1e-9)):
        at = float(jnp.sum(dv.beta_div_dbeta(d64, g64, jnp.float64(b))))
        lim = float(jnp.sum(dv.beta_div_dbeta(d64, g64, jnp.float64(b + eps))))
        assert np.isfinite(at)
        assert np.isclose(at, lim, rtol=1e-6), (b, at, lim)


def test_beta_grad_reduces_to_kl_at_beta1(rng):
    """betaDivDerivwrtY at beta=1 equals the KL gradient
    (reference tests.py:21-52)."""
    den, gn = _rand_pair(rng, 128)
    AT = lambda v: 2.0 * v + 0.1 * jnp.roll(v, 1)  # arbitrary linear op
    g_beta = dv.beta_grad_wrt_recon(AT, den, gn, jnp.float64(1.0))
    g_kl = dv.kl_grad_wrt_recon(AT, den, gn)
    np.testing.assert_allclose(np.asarray(g_beta), np.asarray(g_kl),
                               rtol=1e-12)


def test_kl_objective_grad_consistency(rng):
    """jax.grad of the KL objective w.r.t. x matches the analytic
    1 - AT(gn/den) through a real operator."""
    from tpu_sgp.ops.psf_operator import make_operator
    k = rng.uniform(0.1, 1.0, (8, 8))
    k /= k.sum()
    A, AT = make_operator(jnp.asarray(k), (8, 8), 'otf')
    gn = jnp.asarray(rng.uniform(0.5, 2.0, (8, 8)))
    bkg = 0.3
    x = jnp.asarray(rng.uniform(0.1, 1.0, (8, 8)))

    def f(x):
        x_tf = A(x)
        den = x_tf + bkg
        return dv.kl_objective(x_tf, den, gn, jnp.float64(1.0))

    auto = jax.grad(f)(x)
    den = A(x) + bkg
    analytic = dv.kl_grad_wrt_recon(AT, den, gn)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(analytic),
                               rtol=1e-8, atol=1e-10)


def test_beta_div_float32_stability_near_one(rng):
    """The expm1 formulation keeps f32 beta-divergence accurate for beta
    near 1; the reference's 1/(beta*(beta-1)) form loses ~all precision
    (observed rel_err 0.486 vs 0.292 on the satellite workload)."""
    den = rng.uniform(0.2, 5.0, 4096)
    gn = rng.uniform(0.2, 5.0, 4096)
    for b in (1.0001, 0.9999, 1.000001):
        exact = float(dv.beta_div(jnp.asarray(den), jnp.asarray(gn),
                                  jnp.float64(b)))
        f32 = float(dv.beta_div(jnp.asarray(den, jnp.float32),
                                jnp.asarray(gn, jnp.float32),
                                jnp.float32(b)))
        # raw reference form in f32, for contrast
        scal = np.float32(1.0) / (np.float32(b) * (np.float32(b) - 1))
        raw = (np.sum(scal * gn.astype(np.float32) ** np.float32(b))
               + np.sum(scal * (np.float32(b) - 1)
                        * den.astype(np.float32) ** np.float32(b))
               - np.sum(scal * np.float32(b) * gn.astype(np.float32)
                        * den.astype(np.float32) ** (np.float32(b) - 1)))
        assert abs(f32 - exact) / abs(exact) < 1e-3, (b, f32, exact)
        assert abs(f32 - exact) <= abs(raw - exact)


def test_beta_div_finite_with_zero_pixels():
    """gn == 0 pixels contribute the reference's finite den^b / b instead
    of the 0*inf NaN a naive rearranged evaluation produces."""
    den = jnp.asarray([2.0, 3.0, 1.5])
    gn = jnp.asarray([1.0, 0.0, 2.0])
    b, e = 1.5, 0.5
    v = float(dv.beta_div(den, gn, b))
    dn, g = np.asarray(den), np.asarray(gn)
    gz = np.where(g > 0, g, 0.0)
    ref = (np.sum(g * np.where(g > 0, gz ** e - dn ** e, 0.0)) / e
           - np.sum(gz ** b - dn ** b) / b)
    assert np.isfinite(v)
    np.testing.assert_allclose(v, ref, rtol=1e-12)


def test_beta_div_with_dbeta_matches_separate_paths(rng):
    """The fused objective+derivative (solver hot path: zero extra
    transcendentals per trial) must reproduce beta_div exactly and
    beta_div_dbeta to roundoff — including exactly at beta in {0, 1}
    where the series switch takes over."""
    gn = jnp.asarray(rng.uniform(0.01, 2.0, (128,)))
    den = gn * jnp.asarray(rng.uniform(0.9, 1.1, (128,)))
    lg = jnp.log(gn)
    for beta in (1.005, 0.97, 1.0, 0.0, 0.5, 1.2, 1.0 + 1e-12, 2.0):
        b = jnp.asarray(beta, gn.dtype)
        fv_sep = dv.beta_div(den, gn, b, log_gn=lg)
        db_sep = jnp.sum(dv.beta_div_dbeta(den, gn, b))
        fv, db = dv.beta_div_with_dbeta(den, gn, b, lg)
        assert float(jnp.abs(fv - fv_sep)) == 0.0, beta
        np.testing.assert_allclose(float(db), float(db_sep), rtol=5e-13,
                                   atol=1e-14)


def test_gsum_ff_precision_and_order_invariance(rng):
    """Compensated-tree sum (ops.reduce.gsum_ff): accumulation error at
    the eps^2 scale (far below one output ulp), and — the property the
    f32 stop rules need — invariance of the ROUNDED result under
    summation order, where a plain f32 sum moves by ~1e-4 relative."""
    import jax.numpy as jnp
    import numpy as np
    from tpu_sgp.ops.reduce import gsum_ff

    # adversarial cancellation: large pairs cancel, tiny values survive
    n = 4096
    big = rng.normal(0, 1e6, n // 2).astype(np.float32)
    tiny = rng.normal(0, 1e-2, n).astype(np.float32)
    x = np.concatenate([big, -big, tiny])
    truth = float(np.sum(x.astype(np.float64)))
    ours = float(gsum_ff(jnp.asarray(x)))
    assert abs(ours - truth) <= 4 * abs(truth) * np.finfo(np.float32).eps
    # a NAIVE sequential f32 sum errs by orders of magnitude more (XLA's
    # own jnp.sum may or may not, depending on its tiling — which is the
    # point of gsum_ff)
    seq = np.float32(0)
    for v in x:
        seq += v
    assert abs(float(seq) - truth) > 20 * abs(truth) * np.finfo(np.float32).eps

    # order invariance of the rounded result on an objective-like sum
    # (same-sign terms, condition ~1 — the stop rules' regime; the
    # pathological mixed-sign sum above has condition ~7e9, where even a
    # compensated result legitimately moves a few ulps with order): the
    # tree of a permuted stream differs only at the eps^2 level, so every
    # order must round to within one ulp
    y = np.abs(rng.normal(1.0, 0.5, 200_000)).astype(np.float32)
    vals = set()
    for seed in range(8):
        perm = np.random.default_rng(seed).permutation(y.size)
        vals.add(float(gsum_ff(jnp.asarray(y[perm]))))
    assert max(vals) - min(vals) <= np.spacing(np.float32(max(vals))), vals


def test_solver_f32_stop_count_invariant_to_summation_order(rng):
    """Task: deterministic f32 stopping (round-3 verdict). The crit-3
    iteration count must not depend on the order/tiling XLA happens to
    pick for the objective reduction. CPU proxy for the cross-compile
    swing: solve the same f32 problem with the image in C layout vs a
    pixel-permuted-equivalent... a true permutation changes the PSF
    geometry, so instead compare stable_sums=True against an fv series
    recomputed in f64: every recorded f32 discrepancy must match the f64
    value to ~1e-6 relative, i.e. the reduction no longer contributes at
    the stop-tolerance scale."""
    import jax.numpy as jnp
    import numpy as np
    from conftest import synthetic_stamp
    from tpu_sgp.config import SGPConfig
    from tpu_sgp.solvers.sgp import solve

    g = np.random.default_rng(3)
    img, psf, bkg_v, _ = synthetic_stamp(g, size=64)
    cfg32 = SGPConfig(max_iter=40, stop_criterion=1, init_recon=2,
                      proj_type=1, has_flux=False, has_sat_level=False,
                      dtype='float32', stable_sums=True)
    z32 = jnp.zeros(img.shape, jnp.float32)
    res32 = solve(jnp.asarray(img, jnp.float32), jnp.asarray(psf, jnp.float32),
                  jnp.full(img.shape, bkg_v, jnp.float32), z32, 0.0, z32,
                  1.0, 1e-3, 0.0, cfg32)
    # recompute the final objective in f64 from the f32 iterate: the f32
    # discrepancy series entry must agree to f32-elementwise error, not
    # f32-accumulation error (which over 4096 pixels is ~30x larger)
    from tpu_sgp.ops.psf_operator import make_operator
    x = jnp.asarray(np.asarray(res32.x, np.float64) / float(res32.scaling))
    gn64 = np.asarray(img, np.float64) / float(res32.scaling)
    gn64 = np.where(gn64 <= 0, gn64[gn64 > 0].min() * 1e-30, gn64)
    A, _ = make_operator(jnp.asarray(psf, jnp.float64), img.shape, 'otf', ())
    den = np.asarray(A(x)) + bkg_v / float(res32.scaling)
    fv64 = float(np.sum(gn64 * np.log(gn64 / den)) + np.asarray(A(x)).sum()
                 - (gn64 - bkg_v / float(res32.scaling)).sum())
    it = int(res32.iters)
    discr = float(np.asarray(res32.discr)[it])
    fv32 = discr / (2.0 / img.size * float(res32.scaling))
    assert np.isfinite(fv32)
    assert abs(fv32 - fv64) <= 5e-5 * abs(fv64), (fv32, fv64)
