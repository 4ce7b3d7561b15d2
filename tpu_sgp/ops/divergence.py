"""Divergence objectives and gradients.

Unifies the reference's KL objective (inlined at
/root/reference/restoration/sgp.py:265,334) and beta-divergence family
(/root/reference/restoration/sgp.py:441-499) behind one module. All
functions are pure jnp and differentiable, so ``jax.grad`` doubles as the
test oracle the reference validated against PyTorch autograd
(/root/reference/restoration/tests.py:54-68).

Conventions (matching the reference):
  * ``den``  — model prediction A(x) + bkg   (the "y" of betaDiv)
  * ``gn``   — observed image                 (the "x" of betaDiv)
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .reduce import gsum, gsum_ff


def kl_objective(x_tf: jnp.ndarray, den: jnp.ndarray, gn: jnp.ndarray,
                 flux: jnp.ndarray, axes=(), stable: bool = False
                 ) -> jnp.ndarray:
    """KL data-fidelity value used by the KL-SGP solver.

    fv = sum(gn * log(gn/den)) + sum(A(x)) - flux
    (reference sgp.py:265,334). Differs from ``beta_div`` at beta=1 by a
    constant (-flux vs -sum(gn)+sum(bkg)); the constant matters for the
    relative-decrease stop rule, so both forms are kept.

    ``stable``: compensated-tree reduction (reduce.gsum_ff) so the
    objective — the input of stop rules 3/4 — does not inherit XLA's
    compile-dependent summation order (config.stable_sums).
    """
    red = gsum_ff if stable else gsum
    return red(gn * jnp.log(gn / den), axes) + red(x_tf, axes) - flux


def beta_div(den: jnp.ndarray, gn: jnp.ndarray, beta: jnp.ndarray,
             axes=(), log_gn: jnp.ndarray | None = None,
             stable: bool = False) -> jnp.ndarray:
    """beta-divergence D_beta(gn || den), generic-beta branch.

    Mathematically equal to the reference ``betaDiv(y=den, x=gn, betaParam)``
    for beta not in {0, 1} (sgp.py:456-458), but algebraically rearranged for
    numerical stability near beta = 1 AND near den = gn:

        D = sum gn*(gn^e - den^e)/e - sum (gn^b - den^b)/b,   e = beta-1
          = sum gn^b * [ -expm1(e*d)/e + expm1(b*d)/b ],      d = log(den/gn)

    using den^b = gn^b * exp(b*d). The reference's 1/(beta*(beta-1)) form
    catastrophically cancels in float32 for beta near 1 (e.g. the satellite
    workload's frozen beta=1.0001 degraded rel_err from 0.292 to 0.486 on
    TPU); both expm1 factors are exact in their limits and continuous
    through beta = 1, and the second also removes the gn^b - den^b
    cancellation when den is close to gn (the converged regime). beta = 0
    remains singular (Itakura-Saito is the separate special case below,
    matching the reference's exact-equality dispatch).

    ``log_gn``: optional precomputed log(gn). The observed image is
    loop-invariant while this objective runs on every line-search trial, so
    the solver hoists the log — with it, each evaluation costs one log
    (the ratio d), one exp and two expm1 instead of three log + two exp.

    gn == 0 pixels contribute their finite reference value den^b / b
    (every gn^.. term of betaDiv vanishes) rather than the 0 * inf NaN a
    naive evaluation of the rearranged form would produce. The solver
    itself floors gn > 0, so inside the hot loop the guard is branch-free
    dead weight that fuses away.
    """
    e = beta - 1.0
    pos = gn > 0
    gn_safe = jnp.where(pos, gn, 1.0)
    d = jnp.log(den / gn_safe)            # == log(den) where gn == 0
    lg = jnp.log(gn_safe) if log_gn is None else log_gn
    gn_b = jnp.exp(beta * lg)
    # The singular-point switches fire while the LIMIT form r_t = d is
    # still exact to machine precision — |t| < eps/512 keeps the dropped
    # O(t*d/2) term below eps for any |d| up to the exp range (~700 in
    # f64) — NOT merely below the smallest normal: XLA flushes subnormal
    # PRODUCTS to zero, so with t itself normal but t*d subnormal (found
    # by Hypothesis at beta = 2.225e-308, den/gn = 2) the closed form
    # silently evaluates expm1(0)/t = 0 instead of d and the divergence
    # goes NEGATIVE. Above the switch, a flushed t*d implies |d| <
    # tiny/t, where 0 is the correct answer anyway.
    t_small = jnp.finfo(jnp.result_type(den)).eps / 512.0
    e_sing = jnp.abs(e) < t_small
    safe_e = jnp.where(e_sing, 1.0, e)
    r1 = jnp.where(e_sing, d, jnp.expm1(e * d) / safe_e)
    b_sing = jnp.abs(beta) < t_small
    safe_b = jnp.where(b_sing, 1.0, beta)
    r2 = jnp.where(b_sing, d, jnp.expm1(beta * d) / safe_b)
    # gn == 0: D contributes den^b / b = (expm1(b*log den) + 1)/b = r2 + 1/b
    elem = jnp.where(pos, gn_b * (r2 - r1), r2 + 1.0 / safe_b)
    return (gsum_ff if stable else gsum)(elem, axes)


def _e2_from_expm1(s: jnp.ndarray, em: jnp.ndarray) -> jnp.ndarray:
    """E2(s) = (s*e^s - expm1(s)) / s^2 given a precomputed em = expm1(s).
    Series-switched for |s| < 0.25 exactly like ``_dpow_kernel`` — but
    TRANSCENDENTAL-FREE in the closed branch (e^s = em + 1)."""
    small = jnp.abs(s) < 0.25
    safe_s = jnp.where(small, 1.0, s)
    e2_closed = (safe_s * (em + 1.0) - em) / (safe_s * safe_s)
    e2_series = jnp.zeros_like(s) + _E2_COEFFS[-1]
    for c in _E2_COEFFS[-2::-1]:
        e2_series = e2_series * s + c
    return jnp.where(small, e2_series, e2_closed)


def beta_div_with_dbeta(den: jnp.ndarray, gn: jnp.ndarray, beta: jnp.ndarray,
                        log_gn: jnp.ndarray, axes=(), stable: bool = False):
    """(beta_div value, elementwise-summed d betaDiv / d beta) in ONE pass.

    The solver's beta-adaptation evaluates the objective AND its
    beta-derivative on the same (den, gn) every backtracking trial
    (sgp.py bt_body). Computed separately that costs ~2 logs + 4 exps +
    4 expm1 per pixel per trial on top of the objective's own 1 log +
    1 exp + 2 expm1. But with the objective factored as

        phi = gn^b * (r2 - r1),  r_t = expm1(t*d)/t,  d = log(den/gn),

    the beta-derivative is an algebraic function of the SAME intermediates:

        dphi/dbeta = gn^b * [ log_gn*(r2 - r1) + d^2*(E2(b*d) - E2(e*d)) ],
        E2(s) = (s*e^s - expm1(s))/s^2,   e^s = expm1(s) + 1,

    where expm1(t*d) = t*r_t is already in hand — the derivative adds ZERO
    transcendentals (only the E2 polynomial/ratio). Values match
    ``beta_div_dbeta`` (and the jax.grad oracle) to roundoff; continuous
    through beta in {0, 1} via the same series switch.

    Solver-loop fast path: assumes gn > 0 (the solver floors gn at
    vmin*eps^2 during conditioning, sgp.py), so the gn == 0 guard of
    ``beta_div`` is omitted. Returns (sum phi over ``axes``-local pixels
    reduced with gsum, local sum of dphi — caller psums / divides by n).
    """
    e = beta - 1.0
    d = jnp.log(den / gn)
    gn_b = jnp.exp(beta * log_gn)
    # |t| < eps/512 switches (not t == 0, and not tiny): see beta_div —
    # XLA flushes subnormal t*d PRODUCTS to zero while t itself compares
    # normal, and the limit form is exact to machine precision throughout
    # the widened window
    t_small = jnp.finfo(jnp.result_type(den)).eps / 512.0
    e_sing = jnp.abs(e) < t_small
    safe_e = jnp.where(e_sing, 1.0, e)
    em_e = jnp.expm1(e * d)
    r1 = jnp.where(e_sing, d, em_e / safe_e)
    b_sing = jnp.abs(beta) < t_small
    safe_b = jnp.where(b_sing, 1.0, beta)
    em_b = jnp.expm1(beta * d)
    r2 = jnp.where(b_sing, d, em_b / safe_b)
    diff = r2 - r1
    fv = (gsum_ff if stable else gsum)(gn_b * diff, axes)
    e2b = _e2_from_expm1(beta * d, em_b)
    e2e = _e2_from_expm1(e * d, em_e)
    dphi = gn_b * (log_gn * diff + (d * d) * (e2b - e2e))
    return fv, jnp.sum(dphi)


def beta_div_special(den: jnp.ndarray, gn: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Exact beta in {0,1} branches of the reference betaDiv (sgp.py:452-455)."""
    if beta == 0:
        return jnp.sum(gn / den) - jnp.sum(jnp.log(gn / den)) - gn.size
    if beta == 1:
        return jnp.sum(gn * jnp.log(gn / den)) - jnp.sum(gn) + jnp.sum(den)
    raise ValueError('only beta 0 or 1')


def beta_div_value(den, gn, beta):
    """Python-level dispatcher mirroring reference betaDiv exactly (for
    concrete float beta; used by tests and host-side code)."""
    if isinstance(beta, float) and beta in (0.0, 1.0):
        return beta_div_special(den, gn, beta)
    return beta_div(den, gn, beta)


# Taylor coefficients of E2(s) = (s*exp(s) - expm1(s)) / s**2
#   = sum_{m>=0} (m+1)/(m+2)! * s**m  (E2(0) = 1/2).
_E2_COEFFS = tuple((m + 1) / float(math.factorial(m + 2)) for m in range(11))


def _dpow_kernel(t: jnp.ndarray, v: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """d/dt [ (e^{t*u} - e^{t*v}) / t ]  with u = v + delta, evaluated
    without cancellation at small t (and exact in the t -> 0 limit, where it
    equals (u^2 - v^2)/2).

    Factoring e^{t*v} and writing s = t*delta gives
        e^{t*v} * delta * ( v * expm1(s)/s + delta * E2(s) ),
        E2(s) = (s*e^s - expm1(s)) / s^2.
    E2 is the only cancelling piece; it switches to its Taylor series for
    |s| < 0.25 (truncation ~1e-16 relative there, and the closed form is
    well-conditioned above it).
    """
    s = t * delta
    em = jnp.expm1(s)                     # shared by e1 AND E2's closed form
    # |s| < tiny, not s == 0: a subnormal s can flush to zero inside
    # expm1 while comparing != 0 (see beta_div), giving em/s = 0/s with
    # inconsistent flushing; the limit e1 = 1 is exact to O(s) there
    s_sing = jnp.abs(s) < jnp.finfo(jnp.result_type(s)).tiny
    safe_s = jnp.where(s_sing, 1.0, s)
    e1 = jnp.where(s_sing, 1.0, em / safe_s)
    e2 = _e2_from_expm1(s, em)            # ONE series/switch implementation
    return jnp.exp(t * v) * delta * (v * e1 + delta * e2)


def beta_div_dbeta(den: jnp.ndarray, gn: jnp.ndarray, beta: jnp.ndarray,
                   log_den: jnp.ndarray | None = None,
                   log_ratio: jnp.ndarray | None = None) -> jnp.ndarray:
    """Elementwise d betaDiv / d beta (reference ``betaDivDeriv``, sgp.py:462-495).

    The reference uses a SymPy-derived closed form whose 1/(beta-1)^2 and
    1/beta^2 terms catastrophically cancel in float32 near beta = 1 (and 0).
    Writing the divergence as
        phi(beta) = gn * (gn^e - den^e)/e - (gn^b - den^b)/b,
        e = beta - 1, b = beta,
    each term's beta-derivative is ``_dpow_kernel`` above, which is
    cancellation-free and continuous through beta in {0, 1}:
        dphi/dbeta = gn * K(e) - K(b),  K(t) = _dpow_kernel(t, log den, log(gn/den)).
    Values agree with the reference closed form to f64 roundoff for generic
    beta; ``jax.grad(beta_div, argnums=2)`` is the test oracle (replacing the
    reference's PyTorch-autograd check, tests.py:54-68).

    ``log_den`` / ``log_ratio`` (= log(gn/den)) may be supplied when the
    caller already computed them — the solver's line search evaluates the
    objective on the same (den, gn) pair, so passing its logs saves two
    transcendental passes per backtracking trial.
    """
    v = jnp.log(den) if log_den is None else log_den
    delta = jnp.log(gn / den) if log_ratio is None else log_ratio
    return gn * _dpow_kernel(beta - 1.0, v, delta) - _dpow_kernel(beta, v, delta)


def beta_grad_wrt_recon(AT, den: jnp.ndarray, gn: jnp.ndarray,
                        beta: jnp.ndarray) -> jnp.ndarray:
    """Gradient of betaDiv w.r.t. the reconstruction through den = A(x)+bkg:
    g = den^(beta-1) - AT(gn * den^(beta-2))
    (reference ``betaDivDerivwrtY``, sgp.py:498-499). At beta=1 this reduces
    to the KL gradient 1 - AT(gn/den).

    den^(beta-2) is computed once and den^(beta-1) derived as its product
    with den — pow lowers to exp(log) on the VPU and this is a per-pixel
    per-iteration term, so sharing the transcendental halves its cost
    (equal to the two-pow form to 1 ulp)."""
    p2 = den ** (beta - 2.0)
    return p2 * den - AT(gn * p2)


def kl_grad_wrt_recon(AT, den: jnp.ndarray, gn: jnp.ndarray) -> jnp.ndarray:
    """KL gradient g = 1 - AT(gn/den) (reference sgp.py:264,342)."""
    return 1.0 - AT(gn / den)


def lr_schedule(init_lr, k, epoch):
    """Exponentially decayed beta-adaptation learning rate
    (reference ``lr_schedule``, sgp.py:502-503)."""
    return init_lr * jnp.exp(-k * epoch)
