"""SGP / beta-SGP solver core: one functional, jittable, vmappable loop.

Re-design of the reference's twin ~400-line solvers ``sgp`` and
``sgp_betaDiv`` (/root/reference/restoration/sgp.py:41-438, 506-895) as a
single ``lax.while_loop`` over a state tuple. The reference README itself
flags the duplicated pair as debt; here KL and beta-divergence share one loop
and differ only in the (statically selected) objective/gradient functions.

Preserved observable behaviour (checkable against the reference line by line):
  * init modes 0/1/2/3 (sgp.py:165-177; mode 1's seeded randn is produced by
    the host-side wrapper in api.py, the core takes ``x0``)
  * max-scaling of gn/bkg/x, null-pixel floor gn<=0 -> vmin*eps^2, flux
    default sum(gn-bkg) (sgp.py:192-211)
  * Armijo backtracking on the FFT-free linearized objective
    fv(x + lam d) via x_tf + lam*d_tf (sgp.py:328-349) — one A and one AT
    application per outer iteration, never more
  * Barzilai-Borwein alpha1/alpha2 with memory M_alpha, adaptive-tau
    alternation, min(Valpha) for the first 20 iterations (sgp.py:354-387)
  * scaling matrix X = clip(x, bounds from flux/(flux+bkg)*AT(gn)), widened
    10x when the bound ratio < 50 (sgp.py:267-273)
  * stop rules 1-4 and the MAXIT cap; on exit the solver reverts to the
    previous iterate (sgp.py:398-414, 424-425) — including the quirk that
    criterion 2's tolerance is squared only when verbose=True (sgp.py:291-294)
  * beta adaptation on every line-search reject with the den of the rejected
    trial, and the per-epoch exponential lr schedule (sgp.py:797-801, 842-844)

Deliberate deviations (documented, not silent):
  * per-iteration wall-times cannot be measured inside a compiled loop; the
    ``times`` output is produced by the host wrapper (total wall in the last
    slot).
  * the reference writes err[iter_] after incrementing iter_, skipping
    err[1] and overflowing its buffer at iter == MAXIT (sgp.py:394-396);
    here err[k] is the error after k updates.
  * the save=True residual dump floors x at 0 inside the sqrt and
    nan_to_num's the result (``_dump_iteration``): the reference's
    (x-gn)/sqrt(x) writes inf/nan pixels into res_k.fits wherever x <= 0
    (sgp.py:419-421); here those pixels are 0 so the FITS stays finite.
  * a line search that exhausts ``max_backtracks`` without meeting Armijo
    is a config error rejected up front (SGPConfig refuses bt_factor /
    max_backtracks pairs whose smallest trial steplength exceeds the
    reference's 1e-12 rescue floor, sgp.py:336) — the reference has no
    trip cap at all and would loop to the floor.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SGPConfig
from ..ops import divergence as dv
from ..ops.psf_operator import make_operator
from ..ops.reduce import gmax, gmean, gmin, gsum, gsum_ff
from ..projection.flux_projection import (project_df, project_df_bisect,
                                          project_df_bisect_warm,
                                          project_df_section,
                                          project_df_sort)


class SGPResult(NamedTuple):
    x: jnp.ndarray          # reconstruction, unscaled, image-shaped
    iters: jnp.ndarray      # number of completed iterations (reference iter_-1)
    discr: jnp.ndarray      # discrepancy series, fixed (max_iter+1,) buffer
    err: jnp.ndarray        # rel-err series vs obj (zeros when errflag=False)
    beta: jnp.ndarray       # final beta parameter (beta mode)
    fv: jnp.ndarray         # final objective value
    scaling: jnp.ndarray    # data scaling that was applied


class SGPState(NamedTuple):
    """Full loop state: checkpoint this pytree and resume a solve exactly
    (SURVEY §5 checkpoint/resume — everything else is recomputed
    deterministically from the inputs).

    The scaling matrix X is deliberately NOT part of the state: it is a
    pure function of the accepted iterate (clip(x, bounds), ones on the
    very first iteration of an init_recon=0 run) and recomputing it at the
    top of the loop body fuses into the descent step for free, while
    carrying it would cost a full extra array write+read per iteration —
    the hot loop is HBM-bound, not FLOP-bound."""
    keep: jnp.ndarray       # loop-continue flag
    it: jnp.ndarray         # reference iter_ counter (starts at 1)
    x: jnp.ndarray          # accepted iterate (never reverted — see x_prev)
    x_prev: jnp.ndarray     # previous iterate; the reference returns THIS on
                            # exit (sgp.py:424-425), applied at finalize so
                            # the state stays resumable
    converged: jnp.ndarray  # a stop RULE fired (as opposed to the MAXIT cap)
    g: jnp.ndarray          # gradient
    x_tf: jnp.ndarray       # A(x) cache
    fv: jnp.ndarray
    alpha: jnp.ndarray
    tau: jnp.ndarray
    valpha: jnp.ndarray
    fold: jnp.ndarray
    beta_p: jnp.ndarray
    lr: jnp.ndarray
    discr: jnp.ndarray
    err: jnp.ndarray
    lam_dual: jnp.ndarray   # previous flux-projection dual root (NaN until
                            # the first in-loop projection; warm-start pivot)
    dlam_dual: jnp.ndarray  # |lam_k - lam_{k-1}| — sizes the warm window


SAVE_DIR = 'SGP_reconstructed_images'


def _dump_iteration(x, gn, it) -> None:
    """Host-side per-iteration dump (working units, like the reference)."""
    import os

    import numpy as np

    from ..image import write_fits

    os.makedirs(SAVE_DIR, exist_ok=True)
    k = int(it) - 1
    x = np.asarray(x)
    write_fits(os.path.join(SAVE_DIR, f'rec_{k}.fits'), x)
    with np.errstate(all='ignore'):
        res = (x - np.asarray(gn)) / np.sqrt(np.maximum(x, 0.0))
    write_fits(os.path.join(SAVE_DIR, f'res_{k}.fits'),
               np.nan_to_num(res))


def _use_stable(cfg: SGPConfig) -> bool:
    """Resolve cfg.stable_sums for this solve. 'auto' = compensated
    reductions for f32 (where XLA's compile-dependent summation order
    measurably swings stop-rule iteration counts — config.stable_sums)
    but plain sums for f64, whose roundoff sits far below every stop
    tolerance and whose differential tests compare trajectories against
    the NumPy oracle's plain-sum order. The batch layer additionally
    resolves 'auto' to False for vmapped stamps (restore_stamps)."""
    if cfg.stable_sums == 'auto':
        return cfg.jnp_dtype != jnp.float64
    return cfg.stable_sums


def _objective(cfg: SGPConfig, x_tf, den, gn, flux, beta, log_gn=None):
    stable = _use_stable(cfg)
    if cfg.divergence == 'kl':
        return dv.kl_objective(x_tf, den, gn, flux, cfg.axis_names,
                               stable=stable)
    return dv.beta_div(den, gn, beta, cfg.axis_names, log_gn=log_gn,
                       stable=stable)


def _gradient(cfg: SGPConfig, AT, den, gn, beta):
    if cfg.divergence == 'kl':
        return dv.kl_grad_wrt_recon(AT, den, gn)
    return dv.beta_grad_wrt_recon(AT, den, gn, beta)


def _solve_impl(gn, psf, bkg, x0, flux_in, obj, beta0, lr0, sat_level,
                cfg: SGPConfig, rstate=None):
    """Shared implementation; with ``rstate`` the preamble recomputes the
    constants and the loop continues from the checkpointed state."""
    dt = cfg.jnp_dtype
    gn = jnp.asarray(gn, dt)
    psf = jnp.asarray(psf, dt)
    bkg = jnp.asarray(bkg, dt)
    shape = gn.shape
    eps = jnp.finfo(dt).eps

    A, AT = make_operator(psf, shape, cfg.operator, cfg.axis_names)
    ax = cfg.axis_names
    # global pixel count (psum of local sizes when sharded)
    if ax:
        n = jax.lax.psum(jnp.asarray(gn.size, dt), ax)
    else:
        n = gn.size

    # ---- initialization (reference init modes) ---------------------------
    if cfg.init_recon == 0:
        x = jnp.zeros(shape, dt)
    elif cfg.init_recon == 1:
        x = jnp.asarray(x0, dt)
    elif cfg.init_recon == 2:
        x = gn
    elif cfg.init_recon == 3:
        if cfg.has_flux:
            x = jnp.broadcast_to(jnp.asarray(flux_in, dt) / n, shape)
        else:
            x = jnp.broadcast_to(gsum(gn - bkg, ax) / n, shape)
    else:
        raise ValueError('init_recon must be 0..3')

    # ---- stop tolerance (criterion 4 uses the raw image mean) ------------
    if cfg.stop_criterion == 4:
        tol = 1.0 + 1.0 / gmean(gn, ax)
    else:
        tol = jnp.asarray(cfg.tol_convergence, dt)
    if cfg.stop_criterion == 2 and cfg.verbose:
        tol = tol * tol  # reference quirk: squared only under verbose

    # ---- scaling + data conditioning -------------------------------------
    if cfg.scale_data:
        scaling = gmax(gn, ax)
        gn = gn / scaling
        bkg = bkg / scaling
        x = x / scaling
    else:
        scaling = jnp.asarray(1.0, dt)

    vmin = gmin(jnp.where(gn > 0, gn, jnp.inf), ax)
    gn = jnp.where(gn <= 0, vmin * eps * eps, gn)

    if cfg.has_flux:
        flux = jnp.asarray(flux_in, dt) / scaling
    else:
        flux = gsum(gn - bkg, ax)

    discr_coeff = 2.0 / n * scaling
    valpha = jnp.full((cfg.m_alpha,), cfg.alpha_max, dt)
    fold = jnp.full((cfg.m_mem,), -1e30, dt)

    sat = jnp.asarray(sat_level, dt)

    # Effective projection method after device/lockstep remaps — computed
    # ONCE so the warm-start gate below sees the same answer proj() acts on
    # (testing the raw cfg value used to silently drop warm_projection for
    # e.g. a sharded 'pallas' config that remaps to bisect).
    method_eff = cfg.projection_method
    if method_eff in ('sort', 'pallas') and ax:
        method_eff = 'bisect'  # these need the whole vector on one device
    if cfg.sync_axes and method_eff == 'secant':
        # secant trip counts are data-dependent; its per-evaluation psum
        # would desynchronize device groups — bisect is trip-static
        method_eff = 'bisect'

    def proj(point, dia):
        if cfg.proj_type == 0:
            return jnp.maximum(point, 0.0)
        method = method_eff
        if method == 'pallas':
            from ..experimental.pallas_projection import project_df_pallas
            return project_df_pallas(flux, point, dia, scaling,
                                     sat_level=(sat if cfg.has_sat_level
                                                else None),
                                     has_sat=cfg.has_sat_level)
        if method == 'bisect':
            return project_df_bisect(flux, point, dia, scaling,
                                     sat_level=(sat if cfg.has_sat_level
                                                else None),
                                     has_sat=cfg.has_sat_level, axes=ax)
        if method == 'section':
            return project_df_section(flux, point, dia, scaling,
                                      sat_level=(sat if cfg.has_sat_level
                                                 else None),
                                      has_sat=cfg.has_sat_level, axes=ax)
        if method == 'sort':
            return project_df_sort(flux, point, dia, scaling,
                                   sat_level=(sat if cfg.has_sat_level
                                              else None),
                                   has_sat=cfg.has_sat_level)
        return project_df(flux, point, dia, scaling,
                          sat_level=sat if cfg.has_sat_level else None,
                          max_projs=cfg.max_projs,
                          has_sat=cfg.has_sat_level, axes=ax)

    # Initial projection uses the identity metric (reference sgp.py:248-253).
    if cfg.proj_type == 0:
        x = jnp.maximum(x, 0.0)
    else:
        x = proj(x, jnp.ones(shape, dt))

    # ---- error tracking ---------------------------------------------------
    # Disabled buffers shrink to (1,) so the loop carries (and under vmap,
    # scatter-writes) nothing it will not output.
    if cfg.errflag:
        err = jnp.zeros((cfg.max_iter + 1,), dt)
        obj_s = jnp.asarray(obj, dt) / scaling
        obj_sum = gsum(obj_s * obj_s, ax)
        e0 = x - obj_s
        err = err.at[0].set(jnp.sqrt(gsum(e0 * e0, ax) / obj_sum))
    else:
        err = jnp.zeros((1,), dt)
        obj_s = jnp.zeros(shape, dt)
        obj_sum = jnp.asarray(1.0, dt)

    # ---- initial objective / gradient -------------------------------------
    beta_p = jnp.asarray(beta0, dt)
    lr = jnp.asarray(lr0, dt)
    # the observed image is loop-invariant but its log enters every
    # beta-objective evaluation (line-search trials included) — hoist it
    log_gn = jnp.log(gn) if cfg.divergence == 'beta' else None
    x_tf = A(x)
    den = x_tf + bkg
    g = _gradient(cfg, AT, den, gn, beta_p)
    fv = _objective(cfg, x_tf, den, gn, flux, beta_p, log_gn)

    # ---- scaling-matrix bounds --------------------------------------------
    y_b = (flux / (flux + bkg)) * AT(gn)
    x_lb = gmin(jnp.where(y_b > 0, y_b, jnp.inf), ax)
    x_ub = gmax(y_b, ax)
    widen = x_ub / x_lb < 50.0
    x_lb = jnp.where(widen, x_lb / 10.0, x_lb)
    x_ub = jnp.where(widen, x_ub * 10.0, x_ub)

    if cfg.track_discr:
        discr = jnp.zeros((cfg.max_iter + 1,), dt)
        discr = discr.at[0].set(discr_coeff * fv)
    else:
        discr = jnp.zeros((1,), dt)

    def scaling_matrix(x, it):
        """X = clip(x, bounds) (reference sgp.py:267-288) — recomputed from
        the iterate rather than carried (see SGPState). init_recon=0 starts
        from X = ones (reference sgp.py:283)."""
        xm = jnp.clip(x, x_lb, x_ub)
        if cfg.init_recon == 0:
            xm = jnp.where(it == 1, jnp.ones(shape, dt), xm)
        return xm

    alpha = jnp.asarray(cfg.alpha_init, dt)
    tau = jnp.asarray(cfg.tau_init, dt)
    gamma = jnp.asarray(cfg.gamma, dt)
    bt = jnp.asarray(cfg.bt_factor, dt)

    # ---- main loop ---------------------------------------------------------
    def _any_over_sync(flag):
        """OR-reduce a continue flag over cfg.sync_axes so every device
        group in a multi-image mesh runs the same trip count (collectives
        inside the loop must execute in lockstep across the mesh)."""
        return jax.lax.psum(flag.astype(jnp.int32), cfg.sync_axes) > 0

    def cond(state):
        if cfg.sync_axes:
            return _any_over_sync(state[0])
        return state[0]

    # Warm-started projection: carries the previous dual root across
    # iterations (the projection problem drifts slowly with the iterate),
    # cutting the cold ~10 bracket sweeps to a probe plus a few. Restricted
    # to the single-device-group bisect path: under sync_axes the sweep
    # count must stay lockstep across device groups, and other methods
    # have no bracket to warm.
    use_warm = (cfg.proj_type != 0 and method_eff == 'bisect'
                and cfg.warm_projection and not cfg.sync_axes)

    def body(state):
        (_, it, x, _, _, g, x_tf, fv, alpha, tau, valpha, fold,
         beta_p, lr, discr, err, lam_dual, dlam_dual) = state
        x_prev = x
        x_mat = scaling_matrix(x, it)

        valpha = valpha.at[:-1].set(valpha[1:])
        fold = fold.at[:-1].set(fold[1:]).at[-1].set(fv)

        # Descent direction with scaled projection (D = 1/X for proj_type 1).
        y = x - alpha * x_mat * g
        if cfg.proj_type == 0:
            y = jnp.maximum(y, 0.0)
        elif use_warm:
            d_metric = 1.0 / x_mat
            y, lam_new = project_df_bisect_warm(
                flux, y * d_metric, d_metric, scaling,
                sat_level=(sat if cfg.has_sat_level else None),
                has_sat=cfg.has_sat_level, axes=ax,
                lam_prev=lam_dual, dlam_prev=dlam_dual)
            dlam_dual = jnp.where(jnp.isfinite(lam_dual),
                                  jnp.abs(lam_new - lam_dual),
                                  jnp.asarray(jnp.inf, dt))
            lam_dual = lam_new
        else:
            d_metric = 1.0 / x_mat
            y = proj(y * d_metric, d_metric)
        d = y - x

        gd = gsum(d * g, ax)
        d_tf = A(d)
        fr = jnp.max(fold)

        # Backtracking on the linearized transform: no FFT inside this loop.
        # Post-acceptance trips are idempotent (ok stays True, lam/bp frozen),
        # so OR-reducing the continue flag over sync_axes is result-neutral.
        def bt_cond(c):
            lam, fv_t, bp, accepted, k = c
            not_done = (~accepted) & (k < cfg.max_backtracks)
            if cfg.sync_axes:
                return _any_over_sync(not_done)
            return not_done

        def bt_body(c):
            lam, _, bp, _, k = c
            x_tf_try = x_tf + lam * d_tf
            den_t = x_tf_try + bkg
            if cfg.divergence == 'beta' and cfg.adapt_beta:
                # objective + mean d(betaDiv)/dbeta in ONE fused pass: the
                # derivative is an algebraic function of the objective's
                # own expm1 intermediates (beta_div_with_dbeta) — zero
                # extra transcendentals per trial. The series-switched form
                # is cancellation-free and CONTINUOUS through beta in
                # {0, 1}; jax.grad of the objective was used before and is
                # WRONG at exactly beta = 1 (autodiff routes through the
                # where(e == 0, ...) guard's constant branch and drops the
                # d^2/2 term; the reference short-circuits its singular
                # SymPy form to 0 there, sgp.py:493-494 — an artifact, not
                # the true derivative; deviation noted in PARITY.md).
                fv_t, local_grad = dv.beta_div_with_dbeta(
                    den_t, gn, bp, log_gn, ax, stable=_use_stable(cfg))
                ok = (fv_t <= fr + gamma * lam * gd) | (lam < 1e-12)
                bgrad = (jax.lax.psum(local_grad, ax) if ax
                         else local_grad) / n
                bp_rej = bp - lr * bgrad
            else:
                fv_t = _objective(cfg, x_tf_try, den_t, gn, flux, bp,
                                  log_gn)
                ok = (fv_t <= fr + gamma * lam * gd) | (lam < 1e-12)
                bp_rej = bp
            lam_next = jnp.where(ok, lam, lam * bt)
            bp_next = jnp.where(ok, bp, bp_rej)
            if cfg.sync_axes:
                # lanes kept alive only for collective lockstep must not
                # move (matters for a lane that exited via the k cap with
                # ok still False — its lam would keep shrinking)
                lam, fv_prev, bp_prev, acc_prev, _ = c
                done = acc_prev | (k >= cfg.max_backtracks)
                lam_next = jnp.where(done, lam, lam_next)
                bp_next = jnp.where(done, bp_prev, bp_next)
                fv_t = jnp.where(done, fv_prev, fv_t)
                ok = jnp.where(done, acc_prev, ok)
            return (lam_next, fv_t, bp_next, ok, k + 1)

        lam0 = jnp.asarray(1.0, dt)
        if cfg.max_backtracks == 0:
            # Line search explicitly disabled: take the full lam = 1 step,
            # but still evaluate the objective there — fv feeds Fold, the
            # discr series, and stop rules 3/4, which would otherwise see
            # the initial-point objective for the whole solve (rule 3
            # would read a zero decrease and stop after one iteration).
            lam = lam0
            den_t = x_tf + d_tf + bkg
            fv_new = _objective(cfg, x_tf + d_tf, den_t, gn, flux,
                                beta_p, log_gn)
        else:
            lam, fv_new, beta_p, bt_accepted, _ = jax.lax.while_loop(
                bt_cond, bt_body, (lam0, fv, beta_p, jnp.bool_(False),
                                   jnp.int32(0)))
            # On a max_backtracks-cap exit (possible only when bt_factor
            # is large enough that lam never reaches the 1e-12 accept —
            # rejected by SGPConfig, but kept safe here), the carried lam
            # has been shrunk one factor PAST the last evaluated trial
            # while fv_new belongs to that trial. Undo the final shrink so
            # (x_new, fv_new) stay a consistent pair (the discr/Fold/
            # stop-rule inputs); accepted exits are already consistent.
            lam = jnp.where(bt_accepted, lam,
                            jnp.minimum(lam / bt, lam0))

        x_new = x + lam * d
        sk = lam * d
        x_tf_new = x_tf + lam * d_tf
        den_new = x_tf_new + bkg
        g_new = _gradient(cfg, AT, den_new, gn, beta_p)
        yk = g_new - g

        # Scaling matrix + BB steplengths.
        x_mat_new = jnp.clip(x_new, x_lb, x_ub)
        d_metric = 1.0 / x_mat_new
        sk2 = sk * d_metric
        yk2 = yk * x_mat_new
        bk = gsum(sk2 * yk, ax)
        ck = gsum(yk2 * sk, ax)
        alpha1 = jnp.where(
            bk <= 0,
            jnp.minimum(10.0 * alpha, cfg.alpha_max),
            jnp.clip(gsum(sk2 * sk2, ax) / jnp.where(bk <= 0, 1.0, bk),
                     cfg.alpha_min, cfg.alpha_max))
        alpha2 = jnp.where(
            ck <= 0,
            jnp.minimum(10.0 * alpha, cfg.alpha_max),
            jnp.clip(ck / jnp.where(ck <= 0, 1.0, gsum(yk2 * yk2, ax)),
                     cfg.alpha_min, cfg.alpha_max))
        valpha = valpha.at[-1].set(alpha2)

        use_min = (it <= 20) | (alpha2 / alpha1 < tau)
        alpha_new = jnp.where(use_min, jnp.min(valpha), alpha1)
        tau_new = jnp.where(
            it <= 20, tau,
            jnp.where(alpha2 / alpha1 < tau, tau * 0.9, tau * 1.1))

        if cfg.divergence == 'beta' and cfg.schedule_lr:
            # epoch == it (pre-increment); init_lr is the captured lr0.
            lr = dv.lr_schedule(jnp.asarray(lr0, dt), cfg.lr_exp_param,
                                it.astype(dt))

        it_new = it + 1
        if cfg.track_discr:
            discr = discr.at[it_new - 1].set(discr_coeff * fv_new)
        if cfg.errflag:
            e = x_new - obj_s
            err = err.at[it_new - 1].set(
                jnp.sqrt(gsum(e * e, ax) / obj_sum))

        # Stop rules (reference sgp.py:398-414).
        if cfg.stop_criterion in (0, 1):
            rule_keep = jnp.bool_(True)
        elif cfg.stop_criterion == 2:
            red = gsum_ff if _use_stable(cfg) else gsum
            normstep = red(sk * sk, ax) / red(x_new * x_new, ax)
            rule_keep = normstep > tol
        elif cfg.stop_criterion == 3:
            reldecrease = (fold[-1] - fv_new) / fv_new
            rule_keep = (reldecrease > tol) & (reldecrease >= 0)
        elif cfg.stop_criterion == 4:
            rule_keep = discr_coeff * fv_new > tol
        else:
            raise ValueError('stop_criterion must be 0..4')
        keep = rule_keep & (it_new <= cfg.max_iter)

        if cfg.save:
            # per-iteration reconstruction + residual dump
            # (reference sgp.py:416-422); debug path, single-image solves
            jax.debug.callback(_dump_iteration, x_new, gn, it_new)

        # x stays the accepted iterate; the reference's revert-on-exit
        # (sgp.py:424-425) is applied at finalize from x_prev, keeping the
        # state resumable past a MAXIT checkpoint.
        new_state = SGPState(keep, it_new, x_new, x_prev, ~rule_keep,
                             g_new, x_tf_new, fv_new, alpha_new,
                             tau_new, valpha, fold, beta_p, lr, discr, err,
                             lam_dual, dlam_dual)
        if cfg.sync_axes:
            # this lane only ran for collective lockstep after stopping:
            # carry its state through unchanged (results stay per-image)
            active = state[0]
            new_state = jax.tree.map(
                lambda n, o: jnp.where(active, n, o), new_state,
                SGPState(*state))
        return new_state

    if rstate is None:
        state = SGPState(jnp.bool_(True), jnp.int32(1), x, x,
                         jnp.bool_(False), g, x_tf, fv, alpha, tau,
                         valpha, fold, beta_p, lr, discr, err,
                         jnp.asarray(jnp.nan, dt), jnp.asarray(jnp.inf, dt))
    else:
        state = SGPState(*rstate)
        # grow whichever tracked series buffers the new budget needs;
        # disabled buffers are (1,) sentinels and stay that way. Enabling
        # a series flag on a checkpoint that never tracked it cannot work
        # (the history is gone) — refuse loudly instead of scattering into
        # the sentinel and returning a bogus series.
        for name, flag in (('discr', cfg.track_discr),
                           ('err', cfg.errflag)):
            buf = getattr(state, name)
            if flag and buf.shape[0] <= 1:
                raise ValueError(
                    f'resume enables {name} tracking but the checkpoint '
                    f'was created without it (buffer shape {buf.shape}); '
                    f'resume with the flag off or re-solve from scratch')
            if flag:
                pad = cfg.max_iter + 1 - buf.shape[0]
                if pad < 0:
                    raise ValueError(
                        'resume max_iter smaller than checkpoint buffers')
                if pad > 0:
                    state = state._replace(
                        **{name: jnp.pad(buf, (0, pad))})
        # continue unless a stop rule fired; a MAXIT-capped checkpoint
        # resumes under the (possibly larger) new budget
        state = state._replace(
            keep=(~state.converged) & (state.it <= cfg.max_iter))

    state = SGPState(*jax.lax.while_loop(cond, body, state))

    # The reference returns the previous iterate on exit (sgp.py:424-425).
    result = SGPResult(x=(state.x_prev * scaling).reshape(shape),
                       iters=state.it - 1, discr=state.discr,
                       err=state.err, beta=state.beta_p, fv=state.fv,
                       scaling=scaling)
    return result, state


@partial(jax.jit, static_argnames=('cfg',))
def solve(gn, psf, bkg, x0, flux_in, obj, beta0, lr0, sat_level,
          cfg: SGPConfig) -> SGPResult:
    """Run SGP on one image. All array args share cfg.dtype; optional inputs
    (x0 / obj / flux_in / sat_level) are ignored unless the matching static
    flag in cfg enables them. Fully jit/vmap compatible."""
    return _solve_impl(gn, psf, bkg, x0, flux_in, obj, beta0, lr0,
                       sat_level, cfg)[0]


@partial(jax.jit, static_argnames=('cfg',))
def solve_with_state(gn, psf, bkg, x0, flux_in, obj, beta0, lr0, sat_level,
                     cfg: SGPConfig):
    """As ``solve`` but also returns the final SGPState for checkpointing."""
    return _solve_impl(gn, psf, bkg, x0, flux_in, obj, beta0, lr0,
                       sat_level, cfg)


@partial(jax.jit, static_argnames=('cfg',))
def resume_from_state(gn, psf, bkg, x0, flux_in, obj, beta0, lr0, sat_level,
                      rstate: SGPState, cfg: SGPConfig):
    """Continue a checkpointed solve. The original inputs must be passed
    again (constants are recomputed deterministically); iteration continues
    until cfg.max_iter or the stop rule fires."""
    return _solve_impl(gn, psf, bkg, x0, flux_in, obj, beta0, lr0,
                       sat_level, cfg, rstate=rstate)
