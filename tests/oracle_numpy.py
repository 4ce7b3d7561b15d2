"""Independent NumPy oracle for differential-testing the JAX solver.

This is a from-the-math float64 implementation of the published SGP /
beta-SGP algorithm (Bonettini et al. 2009; arXiv:2207.10973) used ONLY by the
test suite. The JAX core under test must agree with it to float64 roundoff.
It is intentionally written against the algorithm description, in 2D-array
form, so it is an independent check rather than a shared implementation.
"""
from __future__ import annotations

import numpy as np
from scipy.signal import fftconvolve


def project_df_np(b, c, dia, scaling, sat=None, max_projs=1000,
                  tol_lam=1e-11):
    eps = np.finfo(float).eps
    tol_r = 1e-11 * b

    def xv(lam):
        x = np.maximum(0.0, (c + lam) / dia)
        if sat is not None:
            x = np.minimum(sat / scaling - eps, x)
        return x

    def rv(lam):
        return xv(lam).sum() - b

    lam, dlam = 0.0, 1.0
    r = rv(lam)
    if abs(r) < tol_r:
        return xv(lam)
    biter = 0
    if r < 0:
        lambdal, rl = lam, r
        lam += dlam
        r = rv(lam)
        while r < 0 and biter < max_projs:
            biter += 1
            lambdal = lam
            s = max(rl / r - 1.0, 0.1)
            dlam += dlam / s
            lam += dlam
            rl = r
            r = rv(lam)
        lambdau, ru = lam, r
    else:
        lambdau, ru = lam, r
        lam -= dlam
        r = rv(lam)
        while r > 0 and biter < max_projs:
            biter += 1
            lambdau = lam
            s = max(ru / r - 1.0, 0.1)
            dlam_new = dlam + dlam / s
            if not np.isfinite(dlam_new):
                break
            dlam = dlam_new
            lam -= dlam
            ru = r
            r = rv(lam)
        lambdal, rl = lam, r
    if abs(ru) < tol_r:
        return xv(lambdau)
    if abs(rl) < tol_r:
        return xv(lambdal)

    s = 1.0 - rl / ru
    dlam = dlam / s
    lam = lambdau - dlam
    r = rv(lam)
    siter = 0
    maxit_s = max_projs - biter
    while abs(r) > tol_r and dlam > tol_lam * (1.0 + abs(lam)) and siter < maxit_s:
        siter += 1
        if r > 0:
            if s <= 2:
                lambdau, ru = lam, r
                s = 1.0 - rl / ru
                dlam = (lambdau - lambdal) / s
                lam = lambdau - dlam
            else:
                s = max(ru / r - 1.0, 0.1)
                dlam = (lambdau - lam) / s
                lam_new = max(lam - dlam, 0.75 * lambdal + 0.25 * lam)
                lambdau, ru = lam, r
                lam = lam_new
        else:
            if s >= 2:
                lambdal, rl = lam, r
                s = 1.0 - rl / ru
                dlam = (lambdau - lambdal) / s
                lam = lambdau - dlam
            else:
                s = max(rl / r - 1.0, 0.1)
                dlam = (lam - lambdal) / s
                lam_new = min(lam + dlam, 0.75 * lambdau + 0.25 * lam)
                lambdal, rl = lam, r
                lam = lam_new
                s = (lambdau - lambdal) / (lambdau - lam)
        r = rv(lam)
    return xv(lam)


def beta_div_np(den, gn, b):
    if b == 0:
        return np.sum(gn / den) - np.sum(np.log(gn / den)) - gn.size
    if b == 1:
        return np.sum(gn * np.log(gn / den)) - np.sum(gn) + np.sum(den)
    scal = 1.0 / (b * (b - 1.0))
    return (np.sum(scal * gn ** b) + np.sum(scal * (b - 1.0) * den ** b)
            - np.sum(scal * b * gn * den ** (b - 1.0)))


def beta_div_dbeta_np(den, gn, b):
    bm1 = b - 1.0
    return (-gn * den ** bm1 * np.log(den) / bm1
            + gn * den ** bm1 / bm1 ** 2
            + gn ** b * np.log(gn) / (b * bm1)
            - gn ** b / (b * bm1 ** 2)
            + den ** b * np.log(den) / b
            - gn ** b / (b ** 2 * bm1)
            - den ** b / b ** 2)


def make_ops_np(psf, image_shape):
    """Circular conv (same-shape) or zero-padded linear conv operators."""
    if psf.shape == tuple(image_shape):
        tf = np.fft.fftn(np.fft.fftshift(psf))
        ctf = np.conj(tf)

        def A(x):
            return np.real(np.fft.ifftn(tf * np.fft.fftn(x)))

        def AT(x):
            return np.real(np.fft.ifftn(ctf * np.fft.fftn(x)))
    else:
        k = psf / psf.sum()
        kt = np.conj(k).T
        kt = kt / kt.sum()

        def A(x):
            return fftconvolve(x, k, mode='same')

        def AT(x):
            return fftconvolve(x, kt, mode='same')
    return A, AT


def oracle_solve(gn, psf, bkg, *, init_recon=0, proj_type=0,
                 stop_criterion=0, maxit=500, gamma=1e-4, bt=0.4, alpha=1.3,
                 alpha_min=1e-5, alpha_max=1e5, m_alpha=3, tau=0.5, M=1,
                 max_projs=1000, flux=None, sat=None, scale_data=True,
                 divergence='kl', beta_param=1.0, lr=1e-3, adapt_beta=False,
                 schedule_lr=False, lr_exp_param=0.1, tol=1e-4, verbose=True,
                 x0=None, obj=None):
    gn = np.array(gn, np.float64)
    bkg = np.broadcast_to(np.asarray(bkg, np.float64), gn.shape).copy()
    A, AT = make_ops_np(np.asarray(psf, np.float64), gn.shape)
    n = gn.size
    eps = np.finfo(float).eps
    init_lr = lr

    if init_recon == 0:
        x = np.zeros_like(gn)
    elif init_recon == 1:
        x = np.array(x0, np.float64)
    elif init_recon == 2:
        x = gn.copy()
    elif init_recon == 3:
        x = np.full_like(gn, (np.sum(gn - bkg) if flux is None else flux) / n)

    if stop_criterion == 4:
        tol = 1.0 + 1.0 / np.mean(gn)
    if stop_criterion == 2 and verbose:
        tol = tol * tol

    scaling = np.max(gn) if scale_data else 1.0
    gn, bkg, x = gn / scaling, bkg / scaling, x / scaling
    vmin = np.min(gn[gn > 0])
    gn[gn <= 0] = vmin * eps * eps
    flux = np.sum(gn - bkg) if flux is None else flux / scaling

    valpha = np.full(m_alpha, alpha_max)
    fold = np.full(M, -1e30)
    dcoeff = 2.0 / n * scaling

    if proj_type == 0:
        x = np.maximum(x, 0.0)
    else:
        x = project_df_np(flux, x, np.ones_like(x), scaling, sat, max_projs)

    def objective(x_tf, den, bp):
        if divergence == 'kl':
            return np.sum(gn * np.log(gn / den)) + np.sum(x_tf) - flux
        return beta_div_np(den, gn, bp)

    def gradient(den, bp):
        if divergence == 'kl':
            return 1.0 - AT(gn / den)
        return den ** (bp - 1.0) - AT(gn * den ** (bp - 2.0))

    x_tf = A(x)
    den = x_tf + bkg
    g = gradient(den, beta_param)
    fv = objective(x_tf, den, beta_param)

    yb = (flux / (flux + bkg)) * AT(gn)
    xlb, xub = np.min(yb[yb > 0]), np.max(yb)
    if xub / xlb < 50:
        xlb, xub = xlb / 10.0, xub * 10.0

    discr = [dcoeff * fv]
    if obj is not None:
        obj_s = np.asarray(obj, np.float64) / scaling
        obj_norm = np.sqrt(np.sum(obj_s * obj_s))
        err = [np.sqrt(np.sum((x - obj_s) ** 2)) / obj_norm]
    xmat = np.ones_like(x) if init_recon == 0 else np.clip(x, xlb, xub)

    it = 1
    loop = True
    while loop:
        prev_x = x.copy()
        valpha[:-1] = valpha[1:]
        fold[:-1] = fold[1:]
        fold[-1] = fv

        y = x - alpha * xmat * g
        if proj_type == 0:
            y = np.maximum(y, 0.0)
        else:
            dmet = 1.0 / xmat
            y = project_df_np(flux, y * dmet, dmet, scaling, sat, max_projs)
        d = y - x
        gd = np.sum(d * g)
        d_tf = A(d)
        fr = np.max(fold)

        lam = 1.0
        while True:
            den = x_tf + lam * d_tf + bkg
            fv = objective(x_tf + lam * d_tf, den, beta_param)
            if fv <= fr + gamma * lam * gd or lam < 1e-12:
                break
            if divergence == 'beta' and adapt_beta:
                beta_param = beta_param - lr * np.mean(
                    beta_div_dbeta_np(den, gn, beta_param))
            lam *= bt

        x = x + lam * d
        sk = lam * d
        x_tf = x_tf + lam * d_tf
        den = x_tf + bkg
        gnew = gradient(den, beta_param)
        yk = gnew - g
        g = gnew

        xmat = np.clip(x, xlb, xub)
        dmet = 1.0 / xmat
        sk2, yk2 = sk * dmet, yk * xmat
        bk, ck = np.sum(sk2 * yk), np.sum(yk2 * sk)
        a1 = (min(10 * alpha, alpha_max) if bk <= 0
              else min(alpha_max, max(alpha_min, np.sum(sk2 * sk2) / bk)))
        a2 = (min(10 * alpha, alpha_max) if ck <= 0
              else min(alpha_max, max(alpha_min, ck / np.sum(yk2 * yk2))))
        valpha[-1] = a2
        if it <= 20:
            alpha = np.min(valpha)
        elif a2 / a1 < tau:
            alpha = np.min(valpha)
            tau *= 0.9
        else:
            alpha = a1
            tau *= 1.1

        if divergence == 'beta' and schedule_lr:
            lr = init_lr * np.exp(-lr_exp_param * it)

        it += 1
        discr.append(dcoeff * fv)
        if obj is not None:
            err.append(np.sqrt(np.sum((x - obj_s) ** 2)) / obj_norm)

        if stop_criterion == 2:
            loop = np.sum(sk * sk) / np.sum(x * x) > tol
        elif stop_criterion == 3:
            rd = (fold[-1] - fv) / fv
            loop = rd > tol and rd >= 0
        elif stop_criterion == 4:
            loop = discr[-1] > tol
        if it > maxit:
            loop = False
        if not loop:
            x = prev_x

    if obj is not None:
        # err[k] = relative error after k updates (scale-invariant); 5-tuple
        # only when a ground truth was supplied, so existing 4-way callers
        # are untouched
        return x * scaling, it - 1, np.array(discr), beta_param, np.array(err)
    return x * scaling, it - 1, np.array(discr), beta_param
