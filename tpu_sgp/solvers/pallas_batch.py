"""Whole-solver Pallas mega-kernel for batched small-stamp restoration.

The general batched solve (vmap of solvers.sgp.solve) executes ~100 small
XLA kernels per outer iteration; at 31x31-stamp sizes the work per kernel is
microseconds, so the solve is launch-overhead-bound (~3ms/iteration for a
1024-batch regardless of math). This kernel runs the ENTIRE solver —
operator matmuls on the MXU, flux projection, Armijo backtracking, BB
steplengths, stop rule — inside one pallas_call, with every per-lane buffer
resident in VMEM across all iterations. The grid tiles the batch; each grid
step solves TILE stamps to completion.

Scope (asserted): KL divergence, init_recon=2, proj_type=1 with saturation,
scale_data=True, precomputed flux, stop_criterion 1 or 3, shared PSF.
Everything else uses the general solver. Semantics mirror solvers/sgp.py for
this subset (same formulas; per-lane vectorized over the tile).

STATUS: EXPERIMENTAL. Validates against the general solver in interpret
mode (7.7e-7 max rel, identical iteration counts), but the axon remote
Mosaic compiler currently ICEs ("tpu_compile_helper subprocess exit code 1")
on an `add` inside the masked-commit blends, even after removing all narrow
select_n / int / bool vector ops. See NOTES.md for the investigation state;
wiring into restore_stamps/bench is deferred until the kernel compiles on
hardware. The payoff case is quantified there (the general batched solve is
kernel-launch-overhead-bound at ~3ms/iteration for a 1024-batch).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SGPConfig
from ..ops.psf_operator import build_circulant_matrix

TILE = 64           # stamps per grid step; VMEM budget ~11 MB at 31x31
_LANE_PAD = 128     # pixel-axis padding for TPU lanes


def _kernel(gn_ref, bkg_ref, flux_ref, sat_ref, c_ref, x_out, it_out, *,
            cfg: SGPConfig, n_pix: int):
    dt = gn_ref.dtype
    eps = jnp.finfo(dt).eps
    one = jnp.asarray(1.0, dt)

    gn = gn_ref[:]                      # (TILE, P) P = padded pixels
    bkg = bkg_ref[:]
    flux_in = flux_ref[:]               # (TILE, 1)
    sat = sat_ref[:]                    # (TILE, 1)
    cmat = c_ref[:]                     # (P, P) zero-padded circulant

    # padded pixels carry gn = 0 -> masked out of every reduction
    col = jax.lax.broadcasted_iota(jnp.int32, gn.shape, 1)
    valid = (col < n_pix).astype(dt)
    n = jnp.asarray(float(n_pix), dt)

    def rsum(a):
        return jnp.sum(a * valid, axis=1, keepdims=True)

    def rmax(a):
        return jnp.max(jnp.where(valid > 0, a, -jnp.inf), axis=1,
                       keepdims=True)

    def rmin_pos(a):
        return jnp.min(jnp.where((valid > 0) & (a > 0), a, jnp.inf),
                       axis=1, keepdims=True)

    def blend(pred, a, b):
        # arithmetic select: Mosaic ICEs on select_n over (TILE, 1) values
        ind = pred.astype(dt)
        return b + ind * (a - b)

    def A(x):
        # out[l] = C @ x[l]: contract x axis 1 with C axis 1
        return jax.lax.dot_general(
            x, cmat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def AT(x):
        return jax.lax.dot_general(
            x, cmat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    # ---- preamble (solvers/sgp.py semantics, per-lane vectorized) --------
    scaling = rmax(gn)
    gn = gn / scaling * valid
    bkg = bkg / scaling
    x = gn                               # init_recon == 2
    vmin = rmin_pos(gn)
    gn = jnp.where((gn <= 0) & (valid > 0), vmin * eps * eps, gn) * valid
    flux = flux_in / scaling
    cap = sat / scaling - eps

    def project(c_point, dia):
        # per-lane dual bisection (fixed 40 halvings, f32)
        def xval(lam):
            return jnp.minimum(cap, jnp.maximum((c_point + lam) / dia, 0.0)
                               ) * valid
        lo = jnp.min(jnp.where(valid > 0, -c_point, jnp.inf), axis=1,
                     keepdims=True)
        hi = jnp.maximum(rmax(flux * dia - c_point), lo + 1.0)

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            r = rsum(xval(mid)) - flux
            # arithmetic blend instead of select_n: Mosaic ICEs on selects
            # over (TILE, 1) loop carries
            ind = (r < 0).astype(dt)
            return (lo + ind * (mid - lo), mid + ind * (hi - mid))

        lo, hi = jax.lax.fori_loop(0, 40, body, (lo, hi))
        return xval(0.5 * (lo + hi))

    x = project(x, jnp.ones_like(x))

    x_tf = A(x)
    den = x_tf + bkg
    safe_den = jnp.where(valid > 0, den, 1.0)
    g = (1.0 - AT(gn / safe_den)) * valid

    def objective(x_tf_t):
        den_t = jnp.where(valid > 0, x_tf_t + bkg, 1.0)
        gn_safe = jnp.where(valid > 0, gn, 1.0)
        return (rsum(gn * jnp.log(gn_safe / den_t)) + rsum(x_tf_t) - flux)

    fv = objective(x_tf)

    y_b = (flux / (flux + bkg)) * AT(gn)
    x_lb = rmin_pos(y_b)
    x_ub = rmax(y_b)
    widen = x_ub / x_lb < 50.0
    x_lb = blend(widen, x_lb / 10.0, x_lb)
    x_ub = blend(widen, x_ub * 10.0, x_ub)

    x_mat = jnp.clip(x, x_lb, x_ub)
    alpha = jnp.full_like(flux, cfg.alpha_init)
    tau = jnp.full_like(flux, cfg.tau_init)
    # alpha memory unrolled into (TILE, 1) buffers (m_alpha == 3 asserted;
    # Mosaic rejects narrow (TILE, 3) vectors)
    v0 = jnp.full_like(flux, cfg.alpha_max)
    v1 = jnp.full_like(flux, cfg.alpha_max)
    v2 = jnp.full_like(flux, cfg.alpha_max)
    fold = jnp.full_like(flux, -1e30)    # m_mem == 1
    # keep/it as floats: Mosaic ICEs on narrow bool/int vectors in carries
    keep = jnp.ones_like(flux)
    it = jnp.ones_like(flux)
    x_prev = x

    tol = jnp.asarray(cfg.tol_convergence, dt)

    def outer(_, carry):
        (x, x_prev, x_mat, g, x_tf, fv, alpha, tau, v0, v1, v2, fold,
         keep, it) = carry
        keep_b = keep > 0.5
        x_start = x

        v0, v1 = v1, v2                  # roll the alpha memory
        fold_new = fv

        y = x - alpha * x_mat * g
        d_metric = 1.0 / jnp.where(valid > 0, x_mat, 1.0)
        y = project(y * d_metric * valid, d_metric)
        d = (y - x) * valid

        gd = rsum(d * g)
        d_tf = A(d)
        fr = fold_new                    # m_mem == 1: max(Fold) == fv

        def bt_cond(c):
            lam, fv_t, acc, k = c
            return jnp.any(~acc) & (k < cfg.max_backtracks)

        def bt_body(c):
            lam, fv_t, acc, k = c
            fv_try = objective(x_tf + lam * d_tf)
            ok = (fv_try <= fr + cfg.gamma * lam * gd) | (lam < 1e-12)
            new_lam = blend(acc | ok, lam, lam * cfg.bt_factor)
            new_fv = blend(acc, fv_t, fv_try)
            return (new_lam, new_fv, acc | ok, k + 1)

        lam, fv_new, _, _ = jax.lax.while_loop(
            bt_cond, bt_body,
            (jnp.ones_like(flux), fv, jnp.zeros_like(keep, dtype=jnp.bool_),
             jnp.int32(0)))

        x_new = (x + lam * d) * valid
        sk = lam * d
        x_tf_new = x_tf + lam * d_tf
        den_new = jnp.where(valid > 0, x_tf_new + bkg, 1.0)
        g_new = (1.0 - AT(gn / den_new)) * valid
        yk = (g_new - g) * valid

        x_mat_new = jnp.clip(x_new, x_lb, x_ub)
        dmet = 1.0 / x_mat_new
        sk2 = sk * dmet
        yk2 = yk * x_mat_new
        bk = rsum(sk2 * yk)
        ck = rsum(yk2 * sk)
        alpha1 = blend(
            bk <= 0, jnp.minimum(10.0 * alpha, cfg.alpha_max),
            jnp.clip(rsum(sk2 * sk2) / blend(bk <= 0, one, bk),
                     cfg.alpha_min, cfg.alpha_max))
        alpha2 = blend(
            ck <= 0, jnp.minimum(10.0 * alpha, cfg.alpha_max),
            jnp.clip(ck / blend(ck <= 0, one, rsum(yk2 * yk2)),
                     cfg.alpha_min, cfg.alpha_max))
        v2 = alpha2

        vmin_a = jnp.minimum(jnp.minimum(v0, v1), v2)
        ratio_lt = alpha2 / alpha1 < tau
        early = it <= 20
        use_min = early | ratio_lt
        alpha_new = blend(use_min, vmin_a, alpha1)
        tau_new = blend(early, tau,
                        blend(ratio_lt, tau * 0.9, tau * 1.1))

        it_new = it + 1.0
        if cfg.stop_criterion == 3:
            reld = (fold_new - fv_new) / fv_new
            rule = (reld > tol) & (reld >= 0)
        else:
            rule = keep_b | True
        keep_new = keep_b & rule & (it_new <= cfg.max_iter)

        # masked commit: lanes that already stopped freeze their state
        keep_f = keep

        def sel(new, old):
            return old + keep_f * (new - old)

        it_next = it + keep
        return (sel(x_new, x), sel(x_start, x_prev), sel(x_mat_new, x_mat),
                sel(g_new, g), sel(x_tf_new, x_tf), sel(fv_new, fv),
                sel(alpha_new, alpha), sel(tau_new, tau),
                sel(v0, carry[8]), sel(v1, carry[9]), sel(v2, carry[10]),
                sel(fold_new, fold), keep * keep_new.astype(dt), it_next)

    carry = (x, x_prev, x_mat, g, x_tf, fv, alpha, tau, v0, v1, v2, fold,
             keep, it)
    (x, x_prev, _, _, _, _, _, _, _, _, _, _, _, it) = jax.lax.fori_loop(
        0, cfg.max_iter, outer, carry)

    # the reference returns the previous iterate on exit
    x_out[:] = x_prev * scaling * valid
    it_out[:] = it - 1.0


def solve_stamps_pallas(gn, psf, bkgs, fluxes, sat_level,
                        cfg: SGPConfig):
    """One-kernel batched KL-SGP solve. gn (B, H, W); shared psf (H, W);
    bkgs (B,) or (B, H, W); fluxes (B,). Returns (x (B, H, W), iters (B,)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert cfg.divergence == 'kl' and cfg.init_recon == 2
    assert cfg.proj_type == 1 and cfg.has_flux and cfg.has_sat_level
    assert cfg.scale_data and cfg.m_mem == 1 and cfg.m_alpha == 3
    assert cfg.stop_criterion in (1, 3)

    dt = cfg.jnp_dtype
    gn = jnp.asarray(gn, dt)
    b, h, w = gn.shape
    n_pix = h * w
    p = -(-n_pix // _LANE_PAD) * _LANE_PAD

    pad_b = (-b) % TILE
    gn2 = jnp.zeros((b + pad_b, p), dt)
    gn2 = gn2.at[:b, :n_pix].set(gn.reshape(b, n_pix))
    # padded lanes get a benign copy of stamp 0
    if pad_b:
        gn2 = gn2.at[b:, :n_pix].set(
            jnp.broadcast_to(gn.reshape(b, n_pix)[0], (pad_b, n_pix)))

    bkgs = jnp.asarray(bkgs, dt)
    if bkgs.ndim == 1:
        bk2 = jnp.broadcast_to(bkgs[:, None], (b, n_pix))
    else:
        bk2 = bkgs.reshape(b, n_pix)
    bk_full = jnp.zeros((b + pad_b, p), dt)
    bk_full = bk_full.at[:b, :n_pix].set(bk2)
    if pad_b:
        bk_full = bk_full.at[b:, :n_pix].set(
            jnp.broadcast_to(bk2[0], (pad_b, n_pix)))

    fl = jnp.asarray(fluxes, dt).reshape(b, 1)
    fl_full = jnp.concatenate(
        [fl, jnp.broadcast_to(fl[:1], (pad_b, 1))], axis=0) if pad_b else fl
    sat_full = jnp.full((b + pad_b, 1), jnp.asarray(sat_level, dt))

    cmat = build_circulant_matrix(jnp.asarray(psf, dt))
    c_full = jnp.zeros((p, p), dt).at[:n_pix, :n_pix].set(cmat)

    grid = (b + pad_b) // TILE
    out_shape = (jax.ShapeDtypeStruct((b + pad_b, p), dt),
                 jax.ShapeDtypeStruct((b + pad_b, 1), dt))
    x_pad, iters_pad = pl.pallas_call(
        partial(_kernel, cfg=cfg, n_pix=n_pix),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((TILE, p), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shape,
        interpret=jax.default_backend() == 'cpu',
    )(gn2, bk_full, fl_full, sat_full, c_full)

    x = x_pad[:b, :n_pix].reshape(b, h, w)
    return x, iters_pad[:b, 0].astype(jnp.int32)
