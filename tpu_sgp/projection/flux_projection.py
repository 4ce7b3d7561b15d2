"""Flux-conserving projection onto {x >= 0, sum(x) = b, x <= sat}.

Solves  min 0.5 x' diag(dia) x - c' x   s.t. sum(x) = b, x >= 0  by a secant
root-find in the dual variable lambda, with a geometric bracketing phase —
the same dual method as the reference ``projectDF``
(/root/reference/restoration/flux_conserve_proj.py:7-144, after Bonettini et
al. 2009), re-built as bounded ``lax.while_loop``s so it jits, vmaps across a
stamp batch (JAX's while_loop batching masks per-lane early exit), and
differentiates where needed.

Faithfully preserved reference behaviours:
  * per-evaluation primal recovery x = clip((c+lambda)/dia, 0, sat/scaling-eps)
  * tolerances tol_r = 1e-11*b, tol_lam = 1e-11, max_projs evaluation cap
  * the asymmetric safeguarded-secant updates, including the branch where the
    reference updates ``s`` on the r<0 side only (flux_conserve_proj.py:122
    clobbers a temp on the r>0 side instead — reproduced by NOT updating s
    there)
  * the overflow break in the downward bracketing loop
    (flux_conserve_proj.py:67-72), expressed as an isfinite guard

One deliberate difference: the reference's upward bracketing loop is
unbounded; here every loop carries an iteration cap (max_projs) so the
compiled program always terminates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.reduce import gmax, gmin, gsum


def project_df(b, c, dia, scaling, sat_level=None, max_projs: int = 1000,
               tol_lam: float = 1e-11, has_sat: bool | None = None,
               axes=()):
    """Project onto the flux-conserving set.

    Args:
      b: target flux (scalar).
      c: linear term (the scaled point to project), any shape.
      dia: diagonal metric (same shape as c, or scalar 1s).
      scaling: data scaling applied upstream (sat ceiling is sat/scaling-eps).
      sat_level: optional CCD saturation level; ``has_sat`` may force the
        static presence decision when sat_level is a traced value.
      max_projs: cap on total lambda evaluations.

    Returns: the projected x with the same shape as c.
    """
    if has_sat is None:
        has_sat = sat_level is not None
    # The reference casts to float64 unconditionally
    # (flux_conserve_proj.py:14-16) so its 1e-11 tolerances are meaningful.
    # Mirror that when float64 exists (CPU parity mode); on f32-only
    # backends (TPU) floor the tolerances at the dtype's own resolution —
    # otherwise |r| and dlam plateau at f32 roundoff, neither tolerance
    # ever fires, and every projection runs to the full iteration caps
    # (up to max_projs collectives per call when sharded).
    in_dtype = jnp.result_type(c)
    dtype = (jnp.float64 if jax.config.read('jax_enable_x64')
             else in_dtype)
    c = jnp.asarray(c, dtype)
    dia = jnp.asarray(dia, dtype)
    b = jnp.asarray(b, dtype)
    eps = jnp.finfo(dtype).eps
    tol_r = jnp.maximum(1e-11, 100.0 * eps) * b
    tol_lam = max(tol_lam, 100.0 * float(eps))

    if has_sat:
        cap = jnp.asarray(sat_level, dtype) / scaling - eps

        def xval(lam):
            return jnp.minimum(cap, jnp.maximum(0.0, (c + lam) / dia))
    else:
        def xval(lam):
            return jnp.maximum(0.0, (c + lam) / dia)

    def rval(lam):
        # global flux residual; psum over mesh axes when the image is
        # sharded (every lambda evaluation is one collective)
        return gsum(xval(lam), axes) - b

    zero = jnp.asarray(0.0, dtype)
    one = jnp.asarray(1.0, dtype)
    r0 = rval(zero)
    done0 = jnp.abs(r0) < tol_r

    # ---- bracketing phase -------------------------------------------------
    # The whole bracket+secant machinery lives under a cond on done0: the
    # reference returns immediately when r(0) is already within tolerance
    # (flux_conserve_proj.py:27-28), and the bracket carries + secant prep
    # each cost a full-image reduction (a psum per mesh axis when sharded)
    # that a converged call would otherwise pay for nothing. Under vmap the
    # cond lowers to a select (both branches run) — exactly the previous
    # behavior; unbatched callers skip 2+ wasted collectives.
    def _lam_trivial(_):
        return zero

    def _lam_full(_):
        return _bracket_and_secant()

    def _bracket_and_secant():
        def bracket_up(_):
            # r0 < 0: grow lambda until r >= 0.
            lam = one
            carry = (jnp.int32(0), zero, r0, lam, one, rval(lam))

            def cond(s5):
                biter, _, _, _, dlam, r = s5
                return (r < 0) & (biter < max_projs) & jnp.isfinite(dlam) & ~done0

            def body(s5):
                biter, lambdal, rl, lam, dlam, r = s5
                s = jnp.maximum(rl / r - 1.0, 0.1)
                dlam = dlam + dlam / s
                new_lam = lam + dlam
                return (biter + 1, lam, r, new_lam, dlam, rval(new_lam))

            biter, lambdal, rl, lam, dlam, r = jax.lax.while_loop(cond, body, carry)
            return lambdal, rl, lam, r, dlam, biter

        def bracket_down(_):
            # r0 >= 0: shrink lambda until r <= 0. Mirrors the reference's
            # overflow break: if dlam overflows the loop exits with
            # lambdal == lambdau == current lambda.
            lam = -one
            carry = (jnp.int32(0), zero, r0, lam, one, rval(lam), jnp.bool_(False))

            def cond(s7):
                biter, _, _, _, _, r, broke = s7
                return (r > 0) & (biter < max_projs) & ~broke & ~done0

            def body(s7):
                biter, lambdau, ru, lam, dlam, r, _ = s7
                s = jnp.maximum(ru / r - 1.0, 0.1)
                dlam_new = dlam + dlam / s
                ok = jnp.isfinite(dlam_new)
                new_lam = jnp.where(ok, lam - dlam_new, lam)
                new_ru = jnp.where(ok, r, ru)
                new_r = jnp.where(ok, rval(new_lam), r)
                return (biter + 1, lam, new_ru, new_lam,
                        jnp.where(ok, dlam_new, dlam), new_r, ~ok)

            biter, lambdau, ru, lam, dlam, r, _ = jax.lax.while_loop(
                cond, body, carry)
            # exit state: lambdal = lam, rl = r
            return lam, r, lambdau, ru, dlam, biter

        lambdal, rl, lambdau, ru, dlam, biter = jax.lax.cond(
            r0 < 0, bracket_up, bracket_down, operand=None)

        doneu = jnp.abs(ru) < tol_r
        donel = jnp.abs(rl) < tol_r
        early = done0 | doneu | donel

        # ---- secant phase -----------------------------------------------------
        s = 1.0 - rl / ru
        dlam = dlam / s
        lam = lambdau - dlam
        r = rval(lam)
        maxit_s = max_projs - biter

        def scond(st):
            lambdal, lambdau, rl, ru, lam, dlam, r, s, siter = st
            return ((jnp.abs(r) > tol_r)
                    & (dlam > tol_lam * (1.0 + jnp.abs(lam)))
                    & (siter < maxit_s) & ~early)

        def sbody(st):
            lambdal, lambdau, rl, ru, lam, dlam, r, s, siter = st

            # r > 0, s <= 2: plain secant through the upper bracket.
            u1_lambdau, u1_ru = lam, r
            u1_s = 1.0 - rl / u1_ru
            u1_dlam = (u1_lambdau - lambdal) / u1_s
            u1_lam = u1_lambdau - u1_dlam
            # r > 0, s > 2: safeguarded step (reference keeps s = max(ru/r-1, .1)).
            u2_s = jnp.maximum(ru / r - 1.0, 0.1)
            u2_dlam = (lambdau - lam) / u2_s
            u2_lam = jnp.maximum(lam - u2_dlam, 0.75 * lambdal + 0.25 * lam)
            u2_lambdau, u2_ru = lam, r

            pos_hi = s <= 2.0
            p_lambdal, p_rl = lambdal, rl
            p_lambdau = jnp.where(pos_hi, u1_lambdau, u2_lambdau)
            p_ru = jnp.where(pos_hi, u1_ru, u2_ru)
            p_s = jnp.where(pos_hi, u1_s, u2_s)
            p_dlam = jnp.where(pos_hi, u1_dlam, u2_dlam)
            p_lam = jnp.where(pos_hi, u1_lam, u2_lam)

            # r <= 0, s >= 2: plain secant through the lower bracket.
            l1_lambdal, l1_rl = lam, r
            l1_s = 1.0 - l1_rl / ru
            l1_dlam = (lambdau - l1_lambdal) / l1_s
            l1_lam = lambdau - l1_dlam
            # r <= 0, s < 2: safeguarded step; here the reference DOES refresh s.
            l2_s0 = jnp.maximum(rl / r - 1.0, 0.1)
            l2_dlam = (lam - lambdal) / l2_s0
            l2_lam = jnp.minimum(lam + l2_dlam, 0.75 * lambdau + 0.25 * lam)
            l2_lambdal, l2_rl = lam, r
            l2_s = (lambdau - l2_lambdal) / (lambdau - l2_lam)

            neg_hi = s >= 2.0
            n_lambdau, n_ru = lambdau, ru
            n_lambdal = jnp.where(neg_hi, l1_lambdal, l2_lambdal)
            n_rl = jnp.where(neg_hi, l1_rl, l2_rl)
            n_s = jnp.where(neg_hi, l1_s, l2_s)
            n_dlam = jnp.where(neg_hi, l1_dlam, l2_dlam)
            n_lam = jnp.where(neg_hi, l1_lam, l2_lam)

            pos = r > 0
            lambdal = jnp.where(pos, p_lambdal, n_lambdal)
            lambdau = jnp.where(pos, p_lambdau, n_lambdau)
            rl = jnp.where(pos, p_rl, n_rl)
            ru = jnp.where(pos, p_ru, n_ru)
            s = jnp.where(pos, p_s, n_s)
            dlam = jnp.where(pos, p_dlam, n_dlam)
            lam = jnp.where(pos, p_lam, n_lam)

            return (lambdal, lambdau, rl, ru, lam, dlam, rval(lam), s, siter + 1)

        st = (lambdal, lambdau, rl, ru, lam, dlam, r, s, jnp.int32(0))
        lambdal, lambdau, rl, ru, lam, dlam, r, s, _ = jax.lax.while_loop(
            scond, sbody, st)


        # reference's early-return order among the bracket exits
        return jnp.where(doneu, lambdau,
                         jnp.where(donel, lambdal, lam))

    lam_sel = jax.lax.cond(done0, _lam_trivial, _lam_full, operand=None)
    return xval(lam_sel).astype(in_dtype)

# Interior points per sectioning step of project_df_bisect. K=3 narrows
# the bracket 2 bits/step at one (K, N) sweep per step. Round 3 re-measured
# the whole ladder with per-K compiled programs (an earlier probe was
# invalidated by jit caching): K=1/3/5/7/15/31 ->
# 53.8/67.2/65.7/64.9/59.8/49.4k stamps/s at B=6144 — the sweep is
# ARITHMETIC-bound (total work K*ceil(bits/log2(K+1))*N is minimized near
# K=3), while K=1's 28 sequential steps pay too much per-step overhead.
_K_PTS = 3


def bracket_bits(dtype) -> int:
    """Default bracket-narrowing budget (bits) for the sectioned bisection
    — THE policy, shared by the XLA and Pallas implementations: enough
    halvings to push the bracket below dtype resolution. Past ~mantissa
    bits of relative bracket width, the primal recovery
    x = clip((c+lam)/dia) is itself rounding at every pixel, so extra steps
    only re-derive the same floating-point x (28 > 24 keeps a 16x safety
    margin below f32 resolution; 54 > 53 likewise for f64)."""
    return 54 if jnp.dtype(dtype) == jnp.float64 else 28


def _sectioning_machinery(b, c, dia, scaling, sat_level, has_sat, n_iters,
                          axes):
    """Shared K-way sectioning machinery for the bisection projections —
    ONE implementation of the primal recovery, the guaranteed global
    bracket, and the residual sign-census sweep, so the cold and warm
    paths (whose trajectories must agree to bracket resolution) cannot
    drift apart.

    K-way sectioning evaluates the residual at K interior points per pass
    (one fused broadcast + reduction), narrowing the bracket by a factor
    K+1 per step. The plain 1-point bisection is launch-latency bound on
    TPU (~40us/step for ~3us of memory traffic), so trading K x the
    arithmetic for fewer sequential steps wins. Sharded images pay one
    psum per sweep STEP: K=7 (3 bits/step) keeps the collective rounds at
    10 instead of K=3's 14; single-device sweeps are arithmetic-bound and
    take the smaller K (see _K_PTS).

    The sweep runs on RAVELED pixels: a (K, H, W) block tiles as T(8,128)
    over the trailing dims (31x31 pads 4.3x and every sweep pays it),
    while (K, H*W) pads only 961 -> 1024. The multiply by a hoisted 1/dia
    replaces K divides per pixel per step with one; with saturation the
    clip happens in the dia-scaled domain, saving a second (K, N) pass:
    min(cap, z/dia) == min(cap*dia, z)/dia (dia > 0).

    Returns ``(xval, sweep, lo, hi, k_pts, n_steps)`` where
    ``sweep(lo, width)`` counts the interior points of [lo, lo+width]
    whose residual is < 0 (the root-segment index).
    """
    dtype = jnp.result_type(c)
    if n_iters is None:
        n_iters = bracket_bits(dtype)
    c = jnp.asarray(c, dtype)
    dia = jnp.asarray(dia, dtype)
    b = jnp.asarray(b, dtype)
    eps = jnp.finfo(dtype).eps

    if has_sat:
        cap = jnp.asarray(sat_level, dtype) / scaling - eps

        def xval(lam):
            return jnp.minimum(cap, jnp.maximum(0.0, (c + lam) / dia))
    else:
        def xval(lam):
            return jnp.maximum(0.0, (c + lam) / dia)

    # guaranteed bracket: r(min(-c)) = -b < 0 (all pixels inactive); at
    # hi = max(b*dia - c) the maximizing pixel alone contributes >= b
    lo = gmin(-c, axes)
    hi = jnp.maximum(gmax(b * dia - c, axes), lo + 1.0)

    k_pts = 7 if axes else _K_PTS
    n_steps = int(np.ceil(n_iters / np.log2(k_pts + 1)))
    fracs_b = (jnp.arange(1, k_pts + 1, dtype=dtype) / (k_pts + 1))[:, None]

    c_flat = c.reshape(-1)
    inv_flat = ((1.0 / dia) * jnp.ones_like(c)).reshape(-1)
    cap_term = ((cap * dia) * jnp.ones_like(c)).reshape(-1) \
        if has_sat else None

    def sweep(lo, width):
        mids = lo + width * fracs_b                       # (K, 1)
        xs = jnp.maximum(c_flat[None] + mids, 0.0)        # (K, N): x * dia
        if has_sat:
            xs = jnp.minimum(xs, cap_term[None])
        r = jnp.sum(xs * inv_flat[None], axis=-1)         # (K,)
        if axes:
            r = jax.lax.psum(r, axes)
        return jnp.sum((r - b) < 0)

    return xval, sweep, lo, hi, k_pts, n_steps


def project_df_section(b, c, dia, scaling, sat_level=None,
                       has_sat: bool | None = None,
                       n_iters: int | None = None, axes=()):
    """Cold K-way sectioned bisection on the dual variable — the round-3
    projection, kept as a supported method (``projection_method='section'``)
    so the guided-secant default (:func:`project_df_bisect`) can be
    interleaved-A/B'd against it on identical solver configs.

    The residual r(lambda) = sum(clip((c+lambda)/dia, 0, cap)) - b is
    monotone nondecreasing, so sectioning from the guaranteed global
    bracket converges unconditionally; ``bracket_bits(dtype)`` bits of
    narrowing push the bracket below dtype resolution. Trip count is
    static: under vmap nothing serializes to the slowest lane, and when
    the image is sharded each sectioning step is exactly one psum.
    Reference semantics: flux_conserve_proj.py:20-142 (same dual root,
    found by sign census instead of secant iteration).
    """
    if has_sat is None:
        has_sat = sat_level is not None
    xval, sweep, lo, hi, k_pts, n_steps = _sectioning_machinery(
        b, c, dia, scaling, sat_level, has_sat, n_iters, axes)

    def body(_, carry):
        lo, hi = carry
        width = hi - lo
        nbelow = sweep(lo, width)                         # root segment
        seg = width / (k_pts + 1)
        new_lo = lo + nbelow * seg
        return (new_lo, new_lo + seg)

    lo, hi = jax.lax.fori_loop(0, n_steps, body, (lo, hi))
    return xval(0.5 * (lo + hi))


def newton_passes(dtype) -> int:
    """Main-pass budget for the guided-secant sectioning
    (:func:`project_df_bisect`) — calibrated on 645 solver-generated
    instances (recorded from instrumented NumPy-oracle runs of the
    star-stamps workload, KL + beta) plus 120 adversarial instances (knot
    clusters of mass >> b at the root, binding saturation, full
    saturation, 10-decade dynamic range):

      f32: probe + 5 main + finish -> worst 8.6e-7 relative flux error on
           real instances (the f32 residual-evaluation noise floor;
           pass 6+ measures identical), vs 7.9e-6 for round 3's 14-sweep
           sign-only sectioning — 10x tighter at 7/15 the passes.
           Adversarial worst 1.6e-3 equals the deep-bisection f32 floor
           on the same instance (60 halvings: 1.4e-3) — intrinsic to f32
           residual evaluation, not schedule error.
      f64: probe + 8 main + finish -> 1.5e-15 real / 1.9e-12 adversarial,
           inside the reference's own 1e-11*b secant tolerance
           (flux_conserve_proj.py:18) at 10/28 the passes.
    """
    return 8 if jnp.dtype(dtype) == jnp.float64 else 5


def _ladder_machinery(b, c, dia, scaling, sat_level, has_sat, axes):
    """Primal recovery, guaranteed global bracket, and the residual
    evaluation shared by the guided-secant projection.

    Pixels are RAVELED ((P, H*W) pads 961 -> 1024 where (P, 31, 31) tiles
    4.3x); the multiply by a hoisted 1/dia replaces P divides per pixel
    with one, and with saturation the clip happens in the dia-scaled
    domain: min(cap, z/dia) == min(cap*dia, z)/dia (dia > 0). When the
    image is sharded, each evaluation is exactly ONE psum of the (P,)
    residual vector.

    Returns ``(xval, evalr, lo, hi, anl_lo, anl_hi, b_t)`` where
    ``evalr(lam)`` maps one (per-lane scalar) lambda to its residual and
    ``anl_lo``/``anl_hi`` are the analytic root anchors (see below).
    """
    dtype = jnp.result_type(c)
    c = jnp.asarray(c, dtype)
    dia = jnp.asarray(dia, dtype)
    b = jnp.asarray(b, dtype)
    eps = jnp.finfo(dtype).eps

    if has_sat:
        cap = jnp.asarray(sat_level, dtype) / scaling - eps

        def xval(lam):
            return jnp.minimum(cap, jnp.maximum(0.0, (c + lam) / dia))
    else:
        def xval(lam):
            return jnp.maximum(0.0, (c + lam) / dia)

    # guaranteed bracket: r(min(-c)) = -b < 0 (all pixels inactive); at
    # hi = max(b*dia - c) the maximizing pixel alone contributes >= b
    lo = gmin(-c, axes)
    hi = jnp.maximum(gmax(b * dia - c, axes), lo + 1.0)

    c_flat = c.reshape(-1)
    inv_flat = ((1.0 / dia) * jnp.ones_like(c)).reshape(-1)
    cap_term = ((cap * dia) * jnp.ones_like(c)).reshape(-1) \
        if has_sat else None

    # Analytic root anchors (one setup pass; they collapse the probe
    # bracket by orders of magnitude where the worst-case endpoints are
    # loose by the dia/c dynamic range — two Hypothesis counterexamples
    # each defeated eight halving passes before these existed):
    #   upper: at lam = max(-c) + b/sum(1/dia) every pixel is active and
    #     (without caps) sum(x) >= b exactly; with caps it is merely an
    #     excellent probe point — the ladder keeps correctness either way.
    #   lower: x_i <= (max(0,c_i) + max(0,lam))/dia_i for any lam, so at
    #     lam = (b - sum(max(0,c)/dia))/sum(1/dia) the residual is <= 0 —
    #     caps only LOWER the residual, so this bound holds with
    #     saturation too: a guaranteed lower anchor.
    inv_sum = gsum(inv_flat, axes)
    anl_hi = gmax(-c, axes) + b / inv_sum
    anl_lo = (b - gsum(jnp.maximum(c_flat, 0.0) * inv_flat, axes)) \
        / inv_sum

    def evalr(lam):
        xs = jnp.maximum(c_flat + lam, 0.0)               # (N,)
        if has_sat:
            xs = jnp.minimum(xs, cap_term)
        r = jnp.sum(xs * inv_flat)
        if axes:
            r = jax.lax.psum(r, axes)
        return r - b

    return xval, evalr, lo, hi, anl_lo, anl_hi, b


def _ladder_update(qs, vs, state):
    """Scalar-chain root-segment selection over a SORTED residual ladder.

    ``qs``/``vs`` are per-lane scalars (ascending lambdas, nondecreasing
    residuals); ``state`` carries (lo, hi, r_lo, r_hi, sl_lo, sl_hi).
    By monotonicity the root segment is [last negative, first
    nonnegative]; the adjacent segments' chord slopes become the local-
    secant slope surrogates for the next pass's Newton-like candidates.
    Implemented as pure scalar where-chains — no stacked (K,) ladder
    arrays: a (B, K, N) candidate tensor under vmap was assigned a
    T(4,128) tile layout (half the VPU sublanes idle) and measured ~2.4x
    slower end-to-end than this form, whose rows are plain (B, N)
    T(8,128) kernels and whose bookkeeping fuses into them.
    """
    _, _, _, _, sl_lo_prev, sl_hi_prev = state
    L = len(qs)

    def slope(i, j):
        dl = qs[j] - qs[i]
        return jnp.where(dl > 0, (vs[j] - vs[i]) / jnp.where(dl > 0, dl,
                                                             1.0), 0.0)

    # ascending: new_lo = LAST ladder point with r < 0 (qs[0] always
    # qualifies except in degenerate b <= 0 inputs — keep it as the seed)
    lo, r_lo, sl_lo = qs[0], vs[0], sl_lo_prev
    for i in range(1, L - 1):
        neg = vs[i] < 0
        lo = jnp.where(neg, qs[i], lo)
        r_lo = jnp.where(neg, vs[i], r_lo)
        sl_lo = jnp.where(neg, slope(i - 1, i), sl_lo)
    # descending: new_hi = FIRST point with r >= 0; if everything is
    # negative (full saturation) the top point stays (walks to hi)
    hi, r_hi, sl_hi = qs[-1], vs[-1], sl_hi_prev
    for i in range(L - 2, 0, -1):
        pos = vs[i] >= 0
        hi = jnp.where(pos, qs[i], hi)
        r_hi = jnp.where(pos, vs[i], r_hi)
        sl_hi = jnp.where(pos, slope(i, i + 1), sl_hi)
    return lo, hi, r_lo, r_hi, sl_lo, sl_hi


def project_df_bisect(b, c, dia, scaling, sat_level=None,
                      has_sat: bool | None = None,
                      n_iters: int | None = None, axes=()):
    """Guided-secant sectioning on the dual variable — the TPU fast path.

    Replaces the reference's data-dependent bracket+secant iteration
    (flux_conserve_proj.py:20-142) with a STATIC-trip schedule (under vmap
    nothing serializes to the slowest lane; sharded images pay one psum
    per candidate row, always the same number):

      1. one probe pass over the ladder {lo + w/64, lo + w/8, mid, hi}
         (geometric points near lo because the dual root generically sits
         close to the activation knots of the background pixels, far below
         the conservative hi = max(b*dia - c));
      2. ``newton_passes(dtype)`` main passes, each evaluating the sorted
         candidate ladder {endpoint chord, Newton-from-lo, Newton-from-hi,
         midpoint}, where the Newton slopes are LOCAL SECANTS of the
         ladder segments adjacent to the bracket (free by-products of the
         previous pass — measured equal to true r' slopes at one extra
         pass, at half the per-pass arithmetic and none of the extra
         reductions). The chord handles the smooth regime; the local-
         secant candidates snap across knot clusters (the generic hard
         case: ~N background pixels' activation knots sit exactly at the
         root, so the slope varies ~100x inside any bracket and endpoint
         interpolation alone stalls); the midpoint guarantees at least
         halving on adversarial instances;
      3. a finish pass {chord, Newton-lo, Newton-hi} + a secant
         interpolation inside the tightest sign-changing segment —
         exact whenever that segment is knot-free (r is piecewise linear).

    Accuracy (see :func:`newton_passes`): at the f32/f64 residual noise
    floor on solver-generated instances, within the reference's 1e-11*b
    tolerance in f64, and 10x tighter than round 3's 14-sweep sign-only
    sectioning at ~half the passes.

    If the saturation capacity is below b, every residual stays negative,
    the ladder walks to hi, and the clipped finish returns hi — full
    saturation, the same limit the reference reaches. ``n_iters``
    overrides the number of main passes (None = dtype policy).
    """
    if has_sat is None:
        has_sat = sat_level is not None
    return _guided_root(b, c, dia, scaling, sat_level, has_sat, n_iters,
                        axes)[0]


def _guided_root(b, c, dia, scaling, sat_level, has_sat, n_iters, axes):
    dtype = jnp.result_type(c)
    s_main = newton_passes(dtype) if n_iters is None else int(n_iters)
    (xval, evalr, lo, hi, anl_lo, anl_hi,
     b_t) = _ladder_machinery(b, c, dia, scaling, sat_level, has_sat,
                              axes)
    eps = jnp.finfo(dtype).eps
    zero = jnp.asarray(0.0, dtype)

    def rows(pts):
        # one (N,)-row reduction per candidate — kept as SEPARATE (B, N)
        # kernels under vmap (see _ladder_update for why a stacked
        # (B, K, N) tensor is the wrong shape on TPU); XLA sibling-fuses
        # the rows that share inputs
        return [evalr(p) for p in pts]

    # ---- probe pass (analytic anchors + midpoint + hi; r(lo) = -b known
    # for free) --------------------------------------------------------------
    w = hi - lo
    eps_w = eps * w
    ql = jnp.clip(anl_lo, lo + eps_w, hi - eps_w)
    qh = jnp.clip(anl_hi, ql, hi - eps_w)         # anchors are ordered
    mid = lo + 0.5 * w
    # 3-element min/max sort network (ql <= qh; mid anywhere)
    p0 = jnp.minimum(ql, mid)
    p2 = jnp.maximum(qh, mid)
    p1 = jnp.minimum(qh, jnp.maximum(ql, mid))
    pts = [p0, p1, p2, hi]
    vs = [-b_t] + rows(pts)
    state = (lo, hi, -b_t, vs[-1], zero, zero)
    state = _ladder_update([lo] + pts, vs, state)

    def candidates(state, with_mid):
        lo, hi, r_lo, r_hi, sl_lo, sl_hi = state
        w = hi - lo
        mid = lo + 0.5 * w
        den = r_hi - r_lo
        chord = jnp.where(den > 0, lo - r_lo * w / jnp.where(den > 0, den,
                                                             1.0), mid)
        nl = jnp.where(sl_lo > 0,
                       lo - r_lo / jnp.where(sl_lo > 0, sl_lo, 1.0), mid)
        nh_raw = jnp.where(sl_hi > 0,
                           hi - r_hi / jnp.where(sl_hi > 0, sl_hi, 1.0),
                           mid)
        # an out-of-bracket Newton (the adjacent slope belongs to a
        # saturated plateau or a flat activation shelf) would clip to the
        # bracket EDGE and waste its row; spend it on a deep geometric
        # point instead (the root skews toward lo — see the probe)
        nh = jnp.where((nh_raw > lo) & (nh_raw < hi), nh_raw,
                       lo + w / 16.0)
        # sort the 3 candidates with an explicit min/max network —
        # the ladder update needs monotone points. Main passes use
        # {chord, Newton-from-hi, mid}: calibration showed the
        # Newton-from-lo candidate adds NOTHING on real or adversarial
        # instances (the hard knot-cluster case is always entered from
        # the steep high side), so its row is spent nowhere; the finish
        # pass keeps it (3 rows there regardless) for the final secant's
        # segment choice.
        third = nl if not with_mid else mid
        a, b2 = jnp.minimum(chord, nh), jnp.maximum(chord, nh)
        srt = [jnp.minimum(a, third),
               jnp.minimum(b2, jnp.maximum(a, third)),
               jnp.maximum(b2, third)]
        eps_w = eps * w
        return [jnp.clip(p, lo + eps_w, hi - eps_w) for p in srt]

    # ---- main passes (UNROLLED: s_main is static and small; straight-
    # line scalar chains fuse into the row kernels) -------------------------
    for _ in range(s_main):
        lo, hi, r_lo, r_hi, _, _ = state
        pts = candidates(state, True)
        vs = [r_lo] + rows(pts) + [r_hi]
        state = _ladder_update([lo] + pts + [hi], vs, state)

    # ---- finish pass + segment secant -------------------------------------
    lo, hi, r_lo, r_hi, _, _ = state
    pts = candidates(state, False)
    vs = [r_lo] + rows(pts) + [r_hi]
    l0, l1, v0, v1, _, _ = _ladder_update([lo] + pts + [hi], vs,
                                          (lo, hi, r_lo, r_hi, zero, zero))
    den = v1 - v0
    lam = jnp.where(den > 0,
                    jnp.clip(l0 - v0 * (l1 - l0)
                             / jnp.where(den > 0, den, 1.0), l0, l1),
                    l1)
    return xval(lam), lam


def project_df_bisect_warm(b, c, dia, scaling, sat_level=None,
                           has_sat: bool | None = None,
                           n_iters: int | None = None, axes=(),
                           lam_prev=None, dlam_prev=None):
    """K-way sectioned bisection with a WARM-STARTED bracket; returns
    ``(x, lam)`` so the caller can carry the dual across solver iterations.

    The solver calls the projection once per iteration with a slowly
    drifting problem (the metric X and the point move less and less as the
    iterate converges), yet the cold path reopens the global bracket
    [gmin(-c), gmax(b*dia-c)] every time and spends ceil(bits/3) fixed
    sweeps narrowing it — ~10 sweeps x ~290k cycles dominated the KL hot
    loop (docs/PERFORMANCE.md). Here one PROBE sweep sections a window of
    half-width ``4*|dlam_prev| + target`` around the previous root: a hit
    yields a true bracket of 1/4 the window per probe segment, after which
    standard sweeps run only until the bracket is below the cold path's
    own final width (a while_loop — trips shrink as the solver converges).
    A miss (root outside the window) falls back to the guaranteed global
    endpoints on the missed side, costing one extra sweep vs cold.

    Correctness: every post-probe bracket [lo, hi] satisfies r(lo) < 0 <=
    r(hi) (probe fallback uses the global endpoints, where r(gmin(-c)) =
    -b < 0 and the max-knot endpoint contributes >= b), and the loop exits
    only at/below the cold final width — so warm results match cold to the
    bracket-resolution the policy already accepts (bracket_bits).
    """
    if has_sat is None:
        has_sat = sat_level is not None
    dtype = jnp.result_type(c)
    eps = jnp.finfo(dtype).eps
    xval, sweep, cold_lo, cold_hi, k_pts, n_steps = _sectioning_machinery(
        b, c, dia, scaling, sat_level, has_sat, n_iters, axes)
    width_cold = cold_hi - cold_lo
    # cold final width; the dtype-resolution floor is applied inside the
    # loop cond at the CURRENT bracket location (see below)
    target = width_cold * (k_pts + 1.0) ** (-n_steps)

    # ---- probe: section the warm window, fall back to global endpoints ----
    ok = (jnp.isfinite(lam_prev) & jnp.isfinite(dlam_prev)
          & (dlam_prev < width_cold))
    w = 4.0 * jnp.abs(dlam_prev) + jnp.maximum(
        target, 2.0 * eps * jnp.abs(lam_prev))
    w_lo = jnp.where(ok, jnp.clip(lam_prev - w, cold_lo, cold_hi), cold_lo)
    w_hi = jnp.where(ok, jnp.clip(lam_prev + w, w_lo, cold_hi), cold_hi)
    w_width = w_hi - w_lo
    nb = sweep(w_lo, w_width)
    seg = w_width / (k_pts + 1)
    # nb==0: root below the first interior point — the global lower
    # endpoint is the only guaranteed negative-residual anchor; nb==K:
    # symmetric on the high side.
    lo = jnp.where(nb == 0, cold_lo, w_lo + nb * seg)
    hi = jnp.where(nb == k_pts, cold_hi,
                   jnp.where(nb == 0, w_lo + seg, w_lo + (nb + 1.0) * seg))

    def cond(carry):
        lo, hi, t = carry
        # the ulp floor must be evaluated where the bracket currently
        # sits: the global endpoints can be orders of magnitude larger
        # than the root, and a floor at THEIR resolution returned lambdas
        # ~100x coarser than the cold path's ulp-converged value
        # (measurably degrading f32 whole-frame convergence)
        floor = 0.75 * eps * (jnp.abs(lo) + jnp.abs(hi))
        return ((hi - lo > jnp.maximum(target, floor))
                & (t < n_steps + 2))

    def body(carry):
        lo, hi, t = carry
        width = hi - lo
        nb = sweep(lo, width)
        seg = width / (k_pts + 1)
        new_lo = lo + nb * seg
        return (new_lo, new_lo + seg, t + 1)

    lo, hi, _ = jax.lax.while_loop(cond, body, (lo, hi, jnp.int32(0)))
    lam = 0.5 * (lo + hi)
    return xval(lam), lam


def project_df_sort(b, c, dia, scaling, sat_level=None,
                    has_sat: bool | None = None):
    """Exact flux projection by breakpoint sweep — the TPU-native fast path.

    The dual residual r(lambda) = sum_i clip((c_i+lambda)/dia_i, 0, cap) - b
    is piecewise-linear and nondecreasing: each pixel contributes slope
    1/dia_i between its activation knot (-c_i) and saturation knot
    (cap*dia_i - c_i). Sorting the knots and prefix-summing slopes yields
    r at every knot in closed form; the root lies in the first segment where
    r crosses zero and is recovered by linear interpolation. One sort + one
    cumsum of fixed shape replaces the reference's up-to-1000-step sequential
    bracket/secant iteration (flux_conserve_proj.py:20-142) — under vmap the
    sequential version serializes to the max trip count over the whole batch,
    while this path is a single fused kernel.

    Agrees with the secant solver to its own tolerance (|sum(x) - b| <=
    1e-11*b) since that tolerance is effectively exact. Not usable when the
    image is sharded (the sweep needs a global sort) — the distributed path
    keeps the secant solver whose per-step residual is one psum.
    """
    if has_sat is None:
        has_sat = sat_level is not None
    dtype = jnp.result_type(c)
    c_in = jnp.asarray(c, dtype)
    out_shape = c_in.shape
    c = c_in.ravel()
    dia_full = jnp.broadcast_to(jnp.asarray(dia, dtype), out_shape).ravel()
    b = jnp.asarray(b, dtype)
    eps = jnp.finfo(dtype).eps
    inv = 1.0 / dia_full

    act = -c                                   # activation knots
    if has_sat:
        cap = jnp.asarray(sat_level, dtype) / scaling - eps
        sat_k = cap * dia_full - c             # saturation knots (> act)
        knots = jnp.concatenate([act, sat_k])
        dslope = jnp.concatenate([inv, -inv])
    else:
        knots = act
        dslope = inv

    order = jnp.argsort(knots)
    t = knots[order]
    slope = jnp.cumsum(dslope[order])          # slope on [t_k, t_{k+1})
    dt = jnp.diff(t)
    # r at each knot: r(t_0) = -b (the smallest knot is an activation, where
    # its pixel contributes exactly 0)
    r = -b + jnp.concatenate([jnp.zeros((1,), dtype),
                              jnp.cumsum(slope[:-1] * dt)])
    # first knot with r >= 0; the root lies in segment [t_{k-1}, t_k]
    k = jnp.searchsorted(r, jnp.asarray(0.0, dtype), side='left')
    k = jnp.clip(k, 1, t.shape[0] - 1)
    r0, r1 = r[k - 1], r[k]
    t0, t1 = t[k - 1], t[k]
    denom = r1 - r0
    lam = jnp.where(jnp.abs(denom) > 0, t0 - r0 * (t1 - t0)
                    / jnp.where(denom == 0, 1.0, denom), t0)
    # r still < 0 at the last knot: without saturation the residual keeps
    # rising at slope sum(1/dia) — extrapolate; with saturation the slope
    # beyond the last knot is 0 (b > capacity) — pin at full saturation.
    if has_sat:
        lam_past = t[-1]
    else:
        lam_past = t[-1] - r[-1] / slope[-1]
    lam = jnp.where(r[-1] < 0, lam_past, lam)
    # b <= 0: clamp at the smallest knot (x = 0)
    lam = jnp.where(r[0] >= 0, t[0], lam)

    x = jnp.maximum(0.0, (c + lam) * inv)
    if has_sat:
        x = jnp.minimum(cap, x)
    return x.reshape(out_shape)
