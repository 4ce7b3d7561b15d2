"""Whole-solver Pallas mega-kernel for batched small-stamp restoration.

The general batched solve (vmap of solvers.sgp.solve) executes ~100 small
XLA kernels per outer iteration; at 31x31-stamp sizes the work per kernel is
microseconds, so the solve is launch-overhead-bound (~3ms/iteration for a
1024-batch regardless of math; a bare while_loop costs ~24ms fixed per
program on this tunnel while its iterations are ~8us). This kernel runs the
ENTIRE solver — operator matmuls on the MXU, dual-bisection flux projection,
Armijo backtracking, BB steplengths, stop rule, revert semantics — inside
one pallas_call, with every per-lane buffer resident in VMEM across all
iterations. The grid tiles the batch; each grid step solves TILE stamps to
completion.

Mosaic constraints shaped the implementation: per-lane "scalars" are kept at
full (TILE, 128) lane width (the remote Mosaic compiler ICEs on narrow
(TILE, 1) select/add chains in loop carries), selects are arithmetic blends,
state lives in VMEM scratch refs rather than fori-loop carries, and the
outer iteration is a scalar-counter while_loop (static fori trip counts
appear to be fully unrolled, exploding the remote compile).

Scope (asserted): KL divergence, init_recon=2, proj_type=1 with saturation,
scale_data=True, precomputed flux, stop_criterion 1 or 3, shared PSF,
m_mem=1, m_alpha=3. Everything else uses the general solver. Semantics
mirror solvers/sgp.py for this subset.

STATUS: EXPERIMENTAL — correct but not profitable on v5e. It compiles and
runs on hardware (after three Mosaic findings: narrow (TILE,1) select/int/
bool ops ICE the remote compiler; static fori trip counts are fully
unrolled, exploding compiles — use a scalar-counter while_loop; default
16 MB scoped VMEM needs CompilerParams(vmem_limit_bytes=...) for the
resident state). Measured: in-kernel dynamic while iterations cost ~100us
each on this backend, so the ~1.8k serial steps of a full solve take
~240-400ms per call vs ~45-110ms for the XLA-level general path — the
launch-overhead arithmetic that motivated the kernel does not hold once
Mosaic's own loop overhead is accounted. Kept as a validated case study
(interpret mode matches the general solver; hardware runs produce correct
iteration schedules) and for backends with cheaper kernel control flow.
Heavy stress runs once crashed the tunneled TPU worker — do not wire into
production paths on this backend.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SGPConfig
from ..ops.psf_operator import build_circulant_matrix
from ..projection.flux_projection import bracket_bits

TILE = 64           # stamps per grid step; VMEM budget ~12 MB at 31x31
_LANES = 128        # scalar-state lane width / pixel-axis padding unit


def _kernel(gn_ref, bkg_ref, flux_ref, sat_ref, c_ref, x_out, it_out,
            x_s, xp_s, xm_s, g_s, xtf_s, sc_s, *, cfg: SGPConfig,
            n_pix: int):
    dt = gn_ref.dtype
    eps = jnp.finfo(dt).eps
    one = jnp.asarray(1.0, dt)
    p = gn_ref.shape[1]
    rep = p // _LANES

    gn0 = gn_ref[:]                      # (TILE, P)
    bkg0 = bkg_ref[:]
    cmat = c_ref[:]                      # (P, P) zero-padded circulant

    col = jax.lax.broadcasted_iota(jnp.int32, gn0.shape, 1)
    valid = (col < n_pix).astype(dt)

    def wide(a):
        """(TILE, 1) -> (TILE, LANES) broadcast."""
        return jnp.broadcast_to(a, (a.shape[0], _LANES))

    def full(a):
        """(TILE, LANES) scalar state -> (TILE, P) via lane-block repeat."""
        if rep == 1:
            return a
        return jnp.concatenate([a] * rep, axis=1)

    def rsum(a):
        return wide(jnp.sum(a * valid, axis=1, keepdims=True))

    def rmax(a):
        return wide(jnp.max(jnp.where(valid > 0, a, -jnp.inf), axis=1,
                            keepdims=True))

    def rmin_pos(a):
        return wide(jnp.min(jnp.where((valid > 0) & (a > 0), a, jnp.inf),
                            axis=1, keepdims=True))

    def blend(pred, a, b):
        # arithmetic select (Mosaic ICEs on select_n chains here)
        return b + pred.astype(dt) * (a - b)

    def A(x):
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
    scaling = rmax(gn0)                  # (TILE, LANES)
    scaling_f = full(scaling)
    gn = gn0 / scaling_f * valid
    bkg = bkg0 / scaling_f
    vmin = full(rmin_pos(gn))
    gn = jnp.where((gn <= 0) & (valid > 0), vmin * eps * eps, gn) * valid
    flux = wide(flux_ref[:, :1]) / scaling    # (TILE, LANES)
    cap = wide(sat_ref[:, :1]) / scaling - eps

    def project(c_point, dia):
        cap_f = full(cap)

        def xval(lam_w):
            lam_f = full(lam_w)
            return jnp.minimum(cap_f,
                               jnp.maximum((c_point + lam_f) / dia, 0.0)
                               ) * valid

        lo = wide(jnp.min(jnp.where(valid > 0, -c_point, jnp.inf), axis=1,
                          keepdims=True))
        hi = jnp.maximum(rmax(full(flux) * dia - c_point), lo + 1.0)

        # shared narrowing budget (projection.flux_projection.bracket_bits:
        # 28 bits f32 / 54 f64) — this kernel bisects 1 bit/step
        n_proj_steps = bracket_bits(dt)

        def p_cond(c):
            return c[0] < n_proj_steps

        def p_body(c):
            k, lo, hi = c
            mid = 0.5 * (lo + hi)
            r = rsum(xval(mid)) - flux
            ind = (r < 0).astype(dt)
            return (k + 1, lo + ind * (mid - lo), mid + ind * (hi - mid))

        _, lo, hi = jax.lax.while_loop(p_cond, p_body,
                                       (jnp.int32(0), lo, hi))
        return xval(0.5 * (lo + hi))

    def objective(x_tf_t):
        den_t = jnp.where(valid > 0, x_tf_t + bkg, 1.0)
        gn_safe = jnp.where(valid > 0, gn, 1.0)
        return (rsum(gn * jnp.log(gn_safe / den_t)) + rsum(x_tf_t) - flux)

    x = project(gn, jnp.ones_like(gn))   # init_recon == 2 then projection
    x_tf = A(x)
    den = jnp.where(valid > 0, x_tf + bkg, 1.0)
    g = (1.0 - AT(gn / den)) * valid
    fv = objective(x_tf)

    y_b = (full(flux) / (full(flux) + bkg)) * AT(gn)
    x_lb0 = rmin_pos(y_b)
    x_ub0 = rmax(y_b)
    widen = x_ub0 / x_lb0 < 50.0
    x_lb = full(blend(widen, x_lb0 / 10.0, x_lb0))
    x_ub = full(blend(widen, x_ub0 * 10.0, x_ub0))

    # ---- VMEM-resident state --------------------------------------------
    x_s[:] = x
    xp_s[:] = x
    xm_s[:] = jnp.clip(x, x_lb, x_ub)
    g_s[:] = g
    xtf_s[:] = x_tf
    sc_s[0] = fv                                  # objective
    sc_s[1] = jnp.full_like(fv, cfg.alpha_init)   # alpha
    sc_s[2] = jnp.full_like(fv, cfg.tau_init)     # tau
    sc_s[3] = jnp.full_like(fv, cfg.alpha_max)    # valpha memory 0
    sc_s[4] = jnp.full_like(fv, cfg.alpha_max)    # valpha memory 1
    sc_s[5] = jnp.full_like(fv, cfg.alpha_max)    # valpha memory 2
    sc_s[6] = jnp.ones_like(fv)                   # keep flag (1.0/0.0)
    sc_s[7] = jnp.ones_like(fv)                   # iteration counter

    tol = jnp.asarray(cfg.tol_convergence, dt)

    def outer_body():
        x = x_s[:]
        x_mat = xm_s[:]
        g = g_s[:]
        x_tf = xtf_s[:]
        fv = sc_s[0]
        alpha = sc_s[1]
        tau = sc_s[2]
        v1 = sc_s[4]
        v2 = sc_s[5]
        keep = sc_s[6]
        it = sc_s[7]

        fold_new = fv

        y = x - full(alpha) * x_mat * g
        d_metric = 1.0 / jnp.where(valid > 0, x_mat, 1.0)
        y = project(y * d_metric * valid, d_metric)
        d = (y - x) * valid

        gd = rsum(d * g)
        d_tf = A(d)
        fr = fold_new                    # m_mem == 1: max(Fold) == fv

        def bt_cond(c):
            lam, fv_t, acc, k = c
            return jnp.any(acc < 0.5) & (k < cfg.max_backtracks)

        def bt_body(c):
            lam, fv_t, acc, k = c
            fv_try = objective(x_tf + full(lam) * d_tf)
            ok = ((fv_try <= fr + cfg.gamma * lam * gd)
                  | (lam < 1e-12)).astype(dt)
            done = jnp.maximum(acc, ok)
            new_lam = blend(done > 0.5, lam, lam * cfg.bt_factor)
            new_fv = blend(acc > 0.5, fv_t, fv_try)
            return (new_lam, new_fv, done, k + 1)

        if cfg.max_backtracks == 0:
            # line search explicitly disabled (mirrors solvers/sgp.py):
            # take the full unit step but still evaluate the objective
            # there — with the loop skipped, fv_new would otherwise stay
            # the PRE-step objective, and stop_criterion=3 would read a
            # zero decrease and halt every lane after one iteration
            lam = jnp.ones_like(fv)
            fv_new = objective(x_tf + d_tf)
        else:
            lam, fv_new, acc, _ = jax.lax.while_loop(
                bt_cond, bt_body,
                (jnp.ones_like(fv), fv, jnp.zeros_like(fv), jnp.int32(0)))
            # cap-exit consistency (mirrors solvers/sgp.py): a lane that
            # ran out of backtracks holds a lam one bt_factor SMALLER than
            # the lam whose objective fv_new carries — revert to the last
            # evaluated lam, capped at the initial unit step
            lam = blend(acc > 0.5, lam,
                        jnp.minimum(lam / cfg.bt_factor, jnp.ones_like(lam)))

        lam_f = full(lam)
        x_new = (x + lam_f * d) * valid
        sk = lam_f * d
        x_tf_new = x_tf + lam_f * d_tf
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
            jnp.clip(rsum(sk2 * sk2) / blend(bk <= 0, one + 0 * bk, bk),
                     cfg.alpha_min, cfg.alpha_max))
        alpha2 = blend(
            ck <= 0, jnp.minimum(10.0 * alpha, cfg.alpha_max),
            jnp.clip(ck / blend(ck <= 0, one + 0 * ck, rsum(yk2 * yk2)),
                     cfg.alpha_min, cfg.alpha_max))

        vmin_a = jnp.minimum(jnp.minimum(v1, v2), alpha2)
        ratio_lt = alpha2 / alpha1 < tau
        early = it <= 20.5
        use_min = early | ratio_lt
        alpha_new = blend(use_min, vmin_a, alpha1)
        tau_new = blend(early, tau,
                        blend(ratio_lt, tau * 0.9, tau * 1.1))

        it_new = it + 1.0
        if cfg.stop_criterion == 3:
            reld = (fold_new - fv_new) / fv_new
            rule = ((reld > tol) & (reld >= 0)).astype(dt)
        else:
            rule = jnp.ones_like(fv)
        keep_new = keep * rule * (it_new <= cfg.max_iter + 0.5).astype(dt)

        kf = keep
        kf_f = full(kf)

        # masked commits: frozen lanes keep their state; x_prev trails x by
        # one accepted iteration (the reference's revert-on-exit)
        xp_s[:] = xp_s[:] + kf_f * (x - xp_s[:])
        x_s[:] = x + kf_f * (x_new - x)
        xm_s[:] = x_mat + kf_f * (x_mat_new - x_mat)
        g_s[:] = g + kf_f * (g_new - g)
        xtf_s[:] = x_tf + kf_f * (x_tf_new - x_tf)
        sc_s[0] = fv + kf * (fv_new - fv)
        sc_s[1] = alpha + kf * (alpha_new - alpha)
        sc_s[2] = tau + kf * (tau_new - tau)
        sc_s[3] = sc_s[3] + kf * (v1 - sc_s[3])
        sc_s[4] = v1 + kf * (v2 - v1)
        sc_s[5] = v2 + kf * (alpha2 - v2)
        sc_s[6] = keep * keep_new
        sc_s[7] = it + kf

    # scalar-counter while_loop: a static fori trip count appears to be
    # fully unrolled by Mosaic, exploding the remote compile at real
    # max_iter values
    def w_cond(k):
        return k < cfg.max_iter

    def w_body(k):
        outer_body()
        return k + 1

    jax.lax.while_loop(w_cond, w_body, jnp.int32(0))

    x_out[:] = xp_s[:] * scaling_f * valid
    it_out[:] = sc_s[7] - 1.0


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
    p = -(-n_pix // _LANES) * _LANES

    pad_b = (-b) % TILE
    gn2 = jnp.zeros((b + pad_b, p), dt)
    gn2 = gn2.at[:b, :n_pix].set(gn.reshape(b, n_pix))
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
                 jax.ShapeDtypeStruct((b + pad_b, _LANES), dt))
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
                   pl.BlockSpec((TILE, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TILE, p), dt),          # x
            pltpu.VMEM((TILE, p), dt),          # x_prev
            pltpu.VMEM((TILE, p), dt),          # x_mat
            pltpu.VMEM((TILE, p), dt),          # g
            pltpu.VMEM((TILE, p), dt),          # x_tf
            pltpu.VMEM((8, TILE, _LANES), dt),  # scalar slabs
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == 'cpu',
    )(gn2, bk_full, fl_full, sat_full, c_full)

    x = x_pad[:b, :n_pix].reshape(b, h, w)
    return x, iters_pad[:b, 0].astype(jnp.int32)
