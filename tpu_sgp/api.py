"""NumPy-facing compatibility API.

``sgp`` and ``sgp_beta_div`` mirror the reference entry points
(/root/reference/restoration/sgp.py:41-47 and :506-513): same argument
names, same return tuple ``(x, iters, discr, times, err)``. They are thin
hosts around the jitted functional core in ``solvers.sgp``.

Host-side responsibilities kept out of the compiled core:
  * PSF normalization check (raises ValueError, reference sgp.py:97-102)
  * init_recon==1 seeded Gaussian init (np.random.seed(42), sgp.py:168-170)
  * wall-clock timing (the reference's per-iteration ``times`` array cannot
    be measured inside a compiled loop; the total wall time is reported in
    the last slot, zeros elsewhere)
"""
from __future__ import annotations

from timeit import default_timer as timer

import jax
import jax.numpy as jnp
import numpy as np

from .config import SGPConfig
from .solvers.sgp import SGPResult, solve

PSF_NORM_TOL_FACTOR = 1e4  # * eps, reference sgp.py:99


def check_psf_normalized(psf: np.ndarray) -> None:
    """|sum(psf) - 1| <= 1e4*eps (reference sgp.py:97-102), with eps taken
    at the PSF's own precision: a float32 PSF (the TPU fast path) was
    normalized in float32 arithmetic and cannot be held to float64 eps."""
    psf = np.asarray(psf)
    eps = np.finfo(psf.dtype if np.issubdtype(psf.dtype, np.floating)
                   else np.float64).eps
    check = abs(float(np.sum(psf, dtype=np.float64)) - 1.0)
    tol = PSF_NORM_TOL_FACTOR * eps
    # `check > tol` would be False for a NaN sum: a PSF with non-finite
    # entries must fail this check loudly, not slide through a NaN
    # comparison (the reference's `if check > tol` form, sgp.py:99, lets a
    # NaN PSF pass silently — a deliberate deviation).
    if not (check <= tol):
        raise ValueError(
            f'PSF is not normalized! Provide a normalized PSF! '
            f'\n\tsum(psf) - 1. = {check}, tolerance = {tol}')


def _default_dtype() -> str:
    return 'float64' if jax.config.jax_enable_x64 else 'float32'


def _validate_inputs(gn, bkg, flux, proj_type) -> None:
    """Loudly reject degenerate inputs the compiled solver would turn into
    silent NaNs. The reference fails on the same inputs, but with a cryptic
    zero-size-reduction ValueError from deep inside its null-pixel floor /
    projectDF (sgp.py:201-204, flux_conserve_proj.py:20-26); non-finite
    pixels it propagates silently. Host-side and O(pixels): negligible next
    to the solve."""
    if not np.isfinite(gn).all():
        raise ValueError('gn contains non-finite pixels; mask or repair '
                         'them before deconvolution.')
    bkg = np.asarray(bkg, np.float64)
    if not np.isfinite(bkg).all():
        raise ValueError('bkg contains non-finite values.')
    if not gn.any():
        raise ValueError('gn is identically zero — nothing to restore.')
    if proj_type == 1:
        resolved = (float(np.sum(gn - np.broadcast_to(bkg, gn.shape)))
                    if flux is None else float(flux))
        if not resolved > 0.0:
            hint = ' (computed as sum(gn - bkg))' if flux is None else ''
            raise ValueError(
                'flux-conserving projection (proj_type=1) needs a positive '
                f'total flux, got {resolved!r}{hint}.')


def _run(gn, psf, bkg, cfg: SGPConfig, flux, obj, beta0, lr0, sat_level):
    gn = np.asarray(gn)
    psf = np.asarray(psf)
    check_psf_normalized(psf)
    _validate_inputs(gn, bkg, flux, cfg.proj_type)
    if cfg.save:
        import os

        from .image import write_fits
        from .solvers.sgp import SAVE_DIR
        os.makedirs(SAVE_DIR, exist_ok=True)
        scaled = gn / np.max(gn) if cfg.scale_data else gn
        write_fits(os.path.join(SAVE_DIR, 'orig.fits'), scaled)
    bkg_arr = jnp.asarray(np.broadcast_to(np.asarray(bkg, dtype=np.float64),
                                          gn.shape).copy(), cfg.jnp_dtype)
    if cfg.init_recon == 1:
        np.random.seed(42)
        x0 = np.random.randn(*gn.shape)
    else:
        x0 = np.zeros(gn.shape)
    flux_in = 0.0 if flux is None else float(np.sum(flux))
    obj_in = np.zeros(gn.shape) if obj is None else np.asarray(obj)
    sat_in = 0.0 if sat_level is None else float(sat_level)

    t0 = timer()
    res: SGPResult = solve(jnp.asarray(gn, cfg.jnp_dtype),
                           jnp.asarray(psf, cfg.jnp_dtype),
                           bkg_arr,
                           jnp.asarray(x0, cfg.jnp_dtype),
                           flux_in, jnp.asarray(obj_in, cfg.jnp_dtype),
                           beta0, lr0, sat_in, cfg)
    res = jax.tree.map(np.asarray, jax.block_until_ready(res))
    wall = timer() - t0

    iters = int(res.iters)
    discr = res.discr[:iters + 1]
    times = np.zeros(iters + 1)
    times[-1] = wall
    err = res.err[:iters + 1] if cfg.errflag else None
    return res.x, iters, discr, times, err, res


def sgp(gn, psf, bkg, init_recon=0, proj_type=0, stop_criterion=0, MAXIT=500,
        gamma=1e-4, beta=0.4, alpha=1.3, alpha_min=1e-5, alpha_max=1e5,
        M_alpha=3, tau=0.5, M=1, max_projs=1000, save=False, obj=None,
        verbose=True, flux=None, ccd_sat_level=None, scale_data=True,
        errflag=False, tol_convergence=1e-4, use_original_SGP_Afunction=True,
        dtype=None, operator='auto'):
    """KL-SGP restoration; drop-in for the reference ``sgp``."""
    if errflag and obj is None:
        raise ValueError('errflag was set to True but no ground-truth was passed.')
    gn = np.asarray(gn)
    if not use_original_SGP_Afunction and operator == 'auto':
        operator = 'linear'
    if tuple(np.shape(psf)) != tuple(gn.shape):
        operator = 'linear'
    cfg = SGPConfig(
        max_iter=MAXIT, stop_criterion=stop_criterion,
        tol_convergence=tol_convergence, init_recon=init_recon,
        proj_type=proj_type, max_projs=max_projs, gamma=gamma,
        bt_factor=beta, m_mem=M, alpha_init=alpha, alpha_min=alpha_min,
        alpha_max=alpha_max, m_alpha=M_alpha, tau_init=tau,
        scale_data=scale_data, divergence='kl', errflag=errflag,
        save=save, verbose=verbose, has_flux=flux is not None,
        has_sat_level=ccd_sat_level is not None,
        dtype=dtype or _default_dtype(), operator=operator)
    x, iters, discr, times, err, _ = _run(
        gn, psf, bkg, cfg, flux, obj, 1.0, 1e-3, ccd_sat_level)
    return x, iters, discr, times, err


def sgp_beta_div(gn, psf, bkg, init_recon=0, proj_type=0, stop_criterion=0,
                 MAXIT=500, gamma=1e-4, beta=0.4, alpha=1.3, alpha_min=1e-5,
                 alpha_max=1e5, M_alpha=3, tau=0.5, M=1, max_projs=1000,
                 save=False, obj=None, verbose=True, flux=None,
                 ccd_sat_level=None, scale_data=True, errflag=False,
                 adapt_beta=True, betaParam=1.005, lr=1e-3, lr_exp_param=0.1,
                 schedule_lr=False, tol_convergence=1e-4,
                 use_original_SGP_Afunction=True, dtype=None,
                 operator='auto'):
    """beta-SGP restoration; drop-in for the reference ``sgp_betaDiv``.

    One capability EXTENSION over the reference: ``errflag=True`` tracks the
    per-iteration relative error vs ``obj`` and returns the series as the
    fifth tuple element. The reference accepts the flag but never implements
    it — its own TODO (/root/reference/restoration/sgp.py:514) — and always
    returns ``err=None``; the unified core here computes the identical
    series for both divergences, so the wrapper simply exposes it.
    """
    if errflag and obj is None:
        raise ValueError('errflag was set to True but no ground-truth was passed.')
    gn = np.asarray(gn)
    if not use_original_SGP_Afunction and operator == 'auto':
        operator = 'linear'
    if tuple(np.shape(psf)) != tuple(gn.shape):
        operator = 'linear'
    cfg = SGPConfig(
        max_iter=MAXIT, stop_criterion=stop_criterion,
        tol_convergence=tol_convergence, init_recon=init_recon,
        proj_type=proj_type, max_projs=max_projs, gamma=gamma,
        bt_factor=beta, m_mem=M, alpha_init=alpha, alpha_min=alpha_min,
        alpha_max=alpha_max, m_alpha=M_alpha, tau_init=tau,
        scale_data=scale_data, divergence='beta', adapt_beta=adapt_beta,
        schedule_lr=schedule_lr, lr_exp_param=lr_exp_param, errflag=errflag,
        save=save, verbose=verbose, has_flux=flux is not None,
        has_sat_level=ccd_sat_level is not None,
        dtype=dtype or _default_dtype(), operator=operator)
    x, iters, discr, times, err, _ = _run(
        gn, psf, bkg, cfg, flux, obj, betaParam, lr, ccd_sat_level)
    return x, iters, discr, times, err


# Alias matching the reference spelling.
sgp_betaDiv = sgp_beta_div
