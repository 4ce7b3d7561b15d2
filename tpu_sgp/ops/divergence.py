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

import jax
import jax.numpy as jnp

from .reduce import gsum


def kl_objective(x_tf: jnp.ndarray, den: jnp.ndarray, gn: jnp.ndarray,
                 flux: jnp.ndarray, axes=()) -> jnp.ndarray:
    """KL data-fidelity value used by the KL-SGP solver.

    fv = sum(gn * log(gn/den)) + sum(A(x)) - flux
    (reference sgp.py:265,334). Differs from ``beta_div`` at beta=1 by a
    constant (-flux vs -sum(gn)+sum(bkg)); the constant matters for the
    relative-decrease stop rule, so both forms are kept.
    """
    return gsum(gn * jnp.log(gn / den), axes) + gsum(x_tf, axes) - flux


def beta_div(den: jnp.ndarray, gn: jnp.ndarray, beta: jnp.ndarray,
             axes=()) -> jnp.ndarray:
    """beta-divergence D_beta(gn || den), generic-beta branch.

    Matches reference ``betaDiv(y=den, x=gn, betaParam)`` for beta not in
    {0, 1} (reference sgp.py:456-458). The special cases beta=0
    (Itakura-Saito) and beta=1 (KL) are separate functions below because the
    reference dispatches on exact float equality; inside the solver beta is
    a traced value that never hits them exactly when adapting.
    """
    scal = 1.0 / (beta * (beta - 1.0))
    return (gsum(scal * gn ** beta, axes)
            + gsum(scal * (beta - 1.0) * den ** beta, axes)
            - gsum(scal * beta * gn * den ** (beta - 1.0), axes))


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


def beta_div_dbeta(den: jnp.ndarray, gn: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Elementwise d betaDiv / d beta (reference ``betaDivDeriv``, sgp.py:462-495).

    The reference uses a SymPy-derived closed form; here the same closed form
    is expressed with hoisted subterms. ``jax.grad(beta_div, argnums=2)``
    is the oracle (tests verify they agree, replacing the reference's
    PyTorch-autograd check).
    """
    b = beta
    bm1 = b - 1.0
    log_d = jnp.log(den)
    log_g = jnp.log(gn)
    d_bm1 = den ** bm1
    g_b = gn ** b
    d_b = den ** b
    return (-gn * d_bm1 * log_d / bm1
            + gn * d_bm1 / (bm1 * bm1)
            + g_b * log_g / (b * bm1)
            - g_b / (b * bm1 * bm1)
            + d_b * log_d / b
            - g_b / (b * b * bm1)
            - d_b / (b * b))


def beta_grad_wrt_recon(AT, den: jnp.ndarray, gn: jnp.ndarray,
                        beta: jnp.ndarray) -> jnp.ndarray:
    """Gradient of betaDiv w.r.t. the reconstruction through den = A(x)+bkg:
    g = den^(beta-1) - AT(gn * den^(beta-2))
    (reference ``betaDivDerivwrtY``, sgp.py:498-499). At beta=1 this reduces
    to the KL gradient 1 - AT(gn/den)."""
    return den ** (beta - 1.0) - AT(gn * den ** (beta - 2.0))


def kl_grad_wrt_recon(AT, den: jnp.ndarray, gn: jnp.ndarray) -> jnp.ndarray:
    """KL gradient g = 1 - AT(gn/den) (reference sgp.py:264,342)."""
    return 1.0 - AT(gn / den)


def lr_schedule(init_lr, k, epoch):
    """Exponentially decayed beta-adaptation learning rate
    (reference ``lr_schedule``, sgp.py:502-503)."""
    return init_lr * jnp.exp(-k * epoch)
