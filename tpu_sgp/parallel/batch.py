"""Batched stamp restoration: vmap over the solver core, sharded over chips.

The reference's star-stamp workload restores ~1,121 independent 31x31 cutouts
in a serial Python loop (/root/reference/restoration/
application_sgp_star_stamps.py:33-148). Here the whole batch is one program:
``vmap(solve)`` compiles to batched MXU matmuls (dense circulant operator)
and, given a device mesh, shards the batch axis across chips with
``NamedSharding`` — XLA GSPMD needs no collectives for this embarrassingly
parallel axis, so scaling is linear over ICI-connected chips.

Per-lane early stopping (stop criteria 2-4) works under vmap because JAX's
while_loop batching masks converged lanes; the batch finishes when its
slowest stamp does.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SGPConfig
from ..solvers.sgp import SGPResult, solve


@partial(jax.jit, static_argnames=('cfg', 'per_stamp_psf'))
def _batched_solve(stamps, psf, bkgs, x0, fluxes, obj, beta0, lr0, sat,
                   cfg: SGPConfig, per_stamp_psf: bool) -> SGPResult:
    """Module-level jitted vmap of the solver (stable cache key: one
    compilation per (cfg, shapes), not per call site)."""
    if cfg.save:
        raise ValueError('cfg.save (per-iteration FITS dump) is a '
                         'single-image debug path; lanes of a batch would '
                         'overwrite each other')
    return jax.vmap(
        lambda g, p, bk, z, f, o, bp, lr, s: solve(g, p, bk, z, f, o, bp,
                                                   lr, s, cfg),
        in_axes=(0, 0 if per_stamp_psf else None, 0, 0, 0, 0, 0, 0, 0),
    )(stamps, psf, bkgs, x0, fluxes, obj, beta0, lr0, sat)


@partial(jax.jit, static_argnames=('cfg', 'per_stamp_psf', 'phase1_iters',
                                   'tail_bucket'))
def _batched_solve_two_phase(stamps, psf, bkgs, x0, fluxes, obj, beta0, lr0,
                             sat, cfg: SGPConfig, per_stamp_psf: bool,
                             phase1_iters: int,
                             tail_bucket: int) -> SGPResult:
    """Convergence-compacted batched solve.

    A batched while_loop runs every lane to the SLOWEST lane's iteration
    count (median 25, max ~41 on the stamps workload), so the convergence
    tail sets the whole batch's cost. Three exact phases fix that:

      1. run the full batch capped at ``phase1_iters`` (~p85 of the
         iteration distribution);
      2. gather the lanes that hit the cap (device-side argsort of the
         converged flags — no host round-trip) into a ``tail_bucket``-size
         batch and resume them to cfg.max_iter via the exact
         checkpoint/resume path, then scatter the state back. TWO rounds:
         the unconverged count swings with compile-to-compile f32
         roundoff (~±1% of lanes), so a tail estimate that is right on
         one compile can spill a few lanes on the next — a second
         gather/resume absorbs up to another tail_bucket of spill at
         tail width (measured −13% on the stamps bench when a 5-lane
         spill instead hit the full-width catch-up; a no-spill second
         round costs one gather/scatter plus an immediately-exiting
         while_loop);
      3. resume the FULL batch once more: normally every lane has now
         stopped and the while_loop exits after one predicate check, but if
         more than 2×tail_bucket lanes were unconverged (adversarial data)
         the leftovers finish here — correctness never depends on the
         tail estimate.

    Per-lane iteration schedules are identical to the single-phase solve
    and lanes that finish inside phase 1 are bit-exact; resumed lanes agree
    to solver precision (~1e-12 relative in f64 — the resume program's
    fusion reassociates ULPs). Worth ~20% on the stamps benchmark.
    """
    from ..solvers.sgp import resume_from_state, solve_with_state

    if cfg.save:
        raise ValueError('cfg.save (per-iteration FITS dump) is a '
                         'single-image debug path; lanes of a batch would '
                         'overwrite each other')

    in_ax = (0, 0 if per_stamp_psf else None, 0, 0, 0, 0, 0, 0, 0)
    cfg1 = cfg.replace(max_iter=phase1_iters)
    _, st = jax.vmap(
        lambda g, p, bk, z, f, o, bp, lr, s:
            solve_with_state(g, p, bk, z, f, o, bp, lr, s, cfg1),
        in_axes=in_ax,
    )(stamps, psf, bkgs, x0, fluxes, obj, beta0, lr0, sat)

    # pad the phase-1 iteration buffers up to the full budget so the
    # resumed tail state can be scattered back elementwise; disabled
    # series buffers are (B, 1) sentinels and need no padding
    pad = cfg.max_iter - phase1_iters
    if cfg.track_discr:
        st = st._replace(discr=jnp.pad(st.discr, ((0, 0), (0, pad))))
    if cfg.errflag:
        st = st._replace(err=jnp.pad(st.err, ((0, 0), (0, pad))))

    resume_ax = in_ax + (0,)
    for _ in range(2):
        # workable lanes first (False sorts before True; stable ties).
        # NOT just ~converged: a lane that ran to cfg.max_iter without
        # meeting tolerance keeps converged=False forever (sgp.py:79), so
        # after round 1 it would crowd spilled-but-workable lanes out of
        # round 2's bucket and send them to the full-width catch-up.
        done = st.converged | (st.it > cfg.max_iter)
        idx = jnp.argsort(done)[:tail_bucket]
        take = lambda a: jnp.take(a, idx, axis=0)
        st_tail = jax.tree.map(take, st)
        args_tail = [take(a) for a in (stamps, bkgs, x0, fluxes, obj, beta0,
                                       lr0, sat)]
        psf_tail = take(psf) if per_stamp_psf else psf

        _, st_tail = jax.vmap(
            lambda g, p, bk, z, f, o, bp, lr, s, rs:
                resume_from_state(g, p, bk, z, f, o, bp, lr, s, rs, cfg),
            in_axes=resume_ax,
        )(args_tail[0], psf_tail, *args_tail[1:], st_tail)

        st = jax.tree.map(lambda full, part: full.at[idx].set(part),
                          st, st_tail)

    res, _ = jax.vmap(
        lambda g, p, bk, z, f, o, bp, lr, s, rs:
            resume_from_state(g, p, bk, z, f, o, bp, lr, s, rs, cfg),
        in_axes=resume_ax,
    )(stamps, psf, bkgs, x0, fluxes, obj, beta0, lr0, sat, st)
    return res


def _prep(stamps, psf, bkgs, fluxes, x0, obj, beta0, lr0, sat_level, dtype):
    stamps = jnp.asarray(stamps, dtype)
    b, h, w = stamps.shape
    psf = jnp.asarray(psf, dtype)
    per_stamp_psf = psf.ndim == 3

    bkgs = jnp.asarray(bkgs, dtype)
    if bkgs.ndim == 0:
        bkgs = jnp.broadcast_to(bkgs, (b,))
    # scalar per-stamp backgrounds stay (B,): each vmap lane sees a scalar
    # that broadcasts in-register inside the solver (den = A(x) + bkg three
    # times per iteration), instead of a materialized (B, H, W) map the
    # loop re-reads — only true background MAPS keep the full shape

    fluxes = (jnp.zeros((b,), dtype) if fluxes is None
              else jnp.broadcast_to(jnp.asarray(fluxes, dtype), (b,)))
    x0 = (jnp.zeros((b, h, w), dtype) if x0 is None
          else jnp.asarray(x0, dtype))
    obj = (jnp.zeros((b, h, w), dtype) if obj is None
           else jnp.asarray(obj, dtype))
    beta0 = jnp.broadcast_to(jnp.asarray(beta0, dtype), (b,))
    lr0 = jnp.broadcast_to(jnp.asarray(lr0, dtype), (b,))
    sat = jnp.broadcast_to(jnp.asarray(sat_level, dtype), (b,))
    return stamps, psf, per_stamp_psf, bkgs, fluxes, x0, obj, beta0, lr0, sat


def suggest_compaction(iters, batch_size: Optional[int] = None,
                       margin: float = 1.25) -> dict:
    """Pick convergence-compaction parameters from a pilot run.

    ``iters`` is the per-lane iteration array of a representative solve
    (``result.iters`` — run a pilot batch once without compaction).
    Returns ``{'phase1_iters': p1, 'tail_bucket': tb}`` ready to splat
    into ``restore_stamps``/``RestorationSession``, chosen to minimize
    modeled lane-iterations B*p1 + tails, under the hard-learned safety
    rule: the two tail rounds (capacity ``2*tail_bucket``) must clear the
    unconverged-at-p1 count with ``margin`` headroom, because that count
    swings with compile-to-compile f32 roundoff and a spill past both
    rounds runs the full-width catch-up phase (measured -13% on the
    stamps bench when 1029 unconverged lanes met a 1024 bucket).

    ``batch_size`` scales the unconverged counts when production batches
    differ from the pilot (distribution assumed comparable). The model is
    deliberately simple — compaction is a throughput knob whose worst
    case is time, never correctness.
    """
    iters = np.asarray(iters)
    if iters.size == 0:
        raise ValueError('iters is empty — run a pilot solve first')
    n = iters.size
    b = n if batch_size is None else int(batch_size)
    scale = b / n
    max_it = int(iters.max())
    best = None
    for p1 in range(int(iters.min()), max_it + 1):
        u1 = int(np.ceil((iters > p1).sum() * scale * margin))
        if u1 == 0:
            break                      # p1 covers everything: no compaction
        # smallest power-of-two tail whose two rounds clear u1
        tb = 1
        while 2 * tb < u1:
            tb *= 2
        if tb >= b:
            continue                   # tail as big as the batch: pointless
        # modeled lane-iterations: full batch to p1, then ceil(u1/tb)
        # tail rounds each running to the distribution max
        rounds = int(np.ceil(u1 / tb))
        cost = b * p1 + rounds * tb * (max_it - p1)
        if best is None or cost < best[0]:
            best = (cost, p1, tb)
    if best is None:
        return {'phase1_iters': None, 'tail_bucket': 1024}
    _, p1, tb = best
    return {'phase1_iters': p1, 'tail_bucket': tb}


def _bucket_size(b: int) -> int:
    """Round a batch size up to a compile-cache-friendly bucket: powers of
    two up to 256, then multiples of 256. Workload batch sizes vary with
    detection filtering; bucketing means re-runs (and the candidate-grid vs
    final solves) reuse compiled programs instead of paying a fresh
    multi-minute XLA compile per distinct batch shape."""
    if b <= 256:
        n = 1
        while n < b:
            n *= 2
        return n
    return -(-b // 256) * 256


def _bucket_target(b: int, mesh: Optional[Mesh]) -> int:
    """Bucket size for a batch, rounded up so a sharded batch axis divides
    the mesh device count."""
    target = _bucket_size(b)
    if mesh is not None:
        ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        target = -(-target // ndev) * ndev
    return target


def _pad_lead(a, pad: int, b_orig: int):
    """Host-pad a batch-leading array by repeating row 0 (NumPy — novel
    eager device shapes cost seconds on tunneled backends). Scalars,
    ``None``, and arrays whose leading axis is not the batch pass through
    (they are broadcast to the padded batch later)."""
    if a is None or np.ndim(a) == 0 or np.shape(a)[0] != b_orig:
        return a
    a = np.asarray(a)
    return np.concatenate([a, np.repeat(a[:1], pad, axis=0)], axis=0)


def _pad_args_to_bucket(mesh, stamps, bkgs, fluxes=None, x0=None, obj=None,
                        beta0=None, lr0=None, sat_level=None, psf=None):
    """THE bucket-padding policy (single implementation — the serving
    session and the batch API must not drift): host-pad every batch-leading
    argument up to the mesh-divisible bucket size. Returns the padded
    argument tuple plus the original batch size."""
    b = int(np.shape(stamps)[0])
    pad = _bucket_target(b, mesh) - b
    if pad:
        stamps, bkgs, fluxes, x0, obj, beta0, lr0, sat_level = (
            _pad_lead(a, pad, b)
            for a in (stamps, bkgs, fluxes, x0, obj, beta0, lr0, sat_level))
        if psf is not None and np.ndim(psf) == 3:  # per-stamp PSFs (a 2-D
            psf = _pad_lead(psf, pad, b)  # PSF whose height equals B is shared)
    return (stamps, bkgs, fluxes, x0, obj, beta0, lr0, sat_level, psf), b


def restore_stamps(stamps, psf, bkgs, cfg: SGPConfig, *, fluxes=None,
                   x0=None, obj=None, beta0=1.0, lr0=1e-3, sat_level=0.0,
                   mesh: Optional[Mesh] = None,
                   batch_axis: str = 'batch',
                   bucket: bool = False,
                   phase1_iters: Optional[int] = None,
                   tail_bucket: int = 1024,
                   flatten: bool = False) -> SGPResult:
    """Restore a batch of stamps in one compiled program.

    Args:
      stamps: (B, H, W) observed cutouts.
      psf: (H, W) shared PSF or (B, H, W) per-stamp PSFs. With a shared PSF
        and small stamps the dense-matmul operator is built once and batched
        over the MXU; per-stamp PSFs vmap the operator construction too.
      bkgs: scalar, (B,) or (B, H, W) background levels.
      cfg: solver configuration (``has_flux``/``has_sat_level`` select
        whether fluxes / sat_level are honored).
      mesh: optional ``jax.sharding.Mesh``; the batch axis is sharded over
        ``mesh.axis_names`` entry ``batch_axis`` and the PSF replicated.
      bucket: pad the batch up to a standard bucket size (duplicating the
        first stamp) so distinct batch sizes reuse compiled programs; the
        padding is sliced off the result. Padding happens HOST-side (numpy,
        pulling device-resident inputs back if needed) so the device only
        ever sees bucket shapes — eager device ops at arbitrary pre-pad
        sizes would each compile-and-load a new tiny program, which costs
        seconds per novel batch size on tunneled backends.
      phase1_iters: enable convergence compaction (stop criteria 2-4,
        sharded or not): run the batch capped here (~p85 of the expected
        iteration distribution), finish the unconverged tail as a
        ``tail_bucket``-size batch, then a full-batch catch-up resume
        guarantees correctness regardless of the tail estimate. Identical
        iteration schedules, solver-precision agreement, ~20% faster on
        the stamps benchmark.

    Returns a batched SGPResult (leading axis B on every field).
    """
    if cfg.has_flux and fluxes is None:
        raise ValueError(
            'cfg.has_flux=True but fluxes=None: the flux-conserving '
            'projection would target sum(x)=0 and every reconstruction '
            'would be identically zero. Pass per-stamp fluxes (e.g. the '
            'background-subtracted sums) or use a config with '
            'has_flux=False.')
    if cfg.errflag and obj is None:
        # reference parity (sgp.py raises the same misuse): obj would
        # default to zeros, obj_sum to 0, and the err series to all-inf
        raise ValueError('cfg.errflag=True but obj=None: the relative-'
                         'error series needs the ground truth. Pass obj '
                         'or use a config with errflag=False.')
    if cfg.has_sat_level and np.ndim(sat_level) == 0 \
            and float(sat_level) <= 0:
        raise ValueError(
            f'cfg.has_sat_level=True with sat_level={sat_level}: the '
            f'saturation cap would clamp every pixel to ~0. Pass the CCD '
            f'saturation level or use a config with has_sat_level=False.')
    if cfg.stable_sums == 'auto':
        # Resolve 'auto' HERE (the solver core treats 'auto' as True):
        # per-lane stop-rule scalars of a vmapped batch are aggregated
        # statistically, and the compensated tree's log2(n) extra levels
        # per objective evaluation are measurable at B ~ 10^4 — batches
        # default to plain sums; single-image (science) solves keep the
        # reproducible compensated path. Explicit True/False pass through.
        cfg = cfg.replace(stable_sums=False)
    dtype = cfg.jnp_dtype
    b_orig = int(np.shape(stamps)[0])
    if bucket:
        ((stamps, bkgs, fluxes, x0, obj, beta0, lr0, sat_level, psf),
         b_orig) = _pad_args_to_bucket(mesh, stamps, bkgs, fluxes, x0, obj,
                                       beta0, lr0, sat_level, psf)
    pad = int(np.shape(stamps)[0]) - b_orig

    (stamps, psf, per_stamp_psf, bkgs, fluxes, x0, obj, beta0, lr0,
     sat) = _prep(stamps, psf, bkgs, fluxes, x0, obj, beta0, lr0, sat_level,
                  dtype)

    img_shape = stamps.shape[1:]
    if flatten:
        # ravel each stamp: a (B, 31, 31) array tiles as T(8,128) over the
        # trailing dims (31->32 x 31->128, a 4.3x pad) while (B, 961) pads
        # only to 1024 lanes. With the raveled K-point projection sweep this
        # measured consistently faster on v5e (2.0 vs 2.7 ms/iter at
        # B=6144, interleaved min-of-10); bench.py uses it. Requires the
        # shared dense operator; the matmul contraction order changes, so
        # f32 trajectories are rounding-equivalent rather than bitwise (f64
        # agrees to ULPs).
        if per_stamp_psf:
            raise ValueError('flatten requires a shared PSF')
        if cfg.operator not in ('auto', 'matmul', 'matmul_flat',
                                'matmul_split'):
            raise ValueError('flatten requires the dense matmul operator')
        if cfg.operator != 'matmul_split':
            cfg = cfg.replace(operator='matmul_flat')
        stamps, bkgs, x0, obj = (a.reshape(a.shape[0], -1)
                                 for a in (stamps, bkgs, x0, obj))

    if mesh is not None:
        shard = NamedSharding(mesh, P(batch_axis))
        repl = NamedSharding(mesh, P())
        stamps = jax.device_put(stamps, shard)
        psf = jax.device_put(psf, shard if per_stamp_psf else repl)
        bkgs = jax.device_put(bkgs, shard)
        x0 = jax.device_put(x0, shard)
        fluxes = jax.device_put(fluxes, shard)
        obj = jax.device_put(obj, shard)
        beta0 = jax.device_put(beta0, shard)
        lr0 = jax.device_put(lr0, shard)
        sat = jax.device_put(sat, shard)

    # Compaction works sharded too: the tail gather/scatter compiles to
    # GSPMD collectives over the batch axis and the resumed tail batch is
    # redistributed by the partitioner (sharded == unsharded result,
    # asserted in tests/test_batch.py).
    two_phase = (phase1_iters is not None
                 and cfg.stop_criterion not in (0, 1)
                 and phase1_iters < cfg.max_iter
                 and int(stamps.shape[0]) > tail_bucket)
    if two_phase:
        res = _batched_solve_two_phase(stamps, psf, bkgs, x0, fluxes, obj,
                                       beta0, lr0, sat, cfg, per_stamp_psf,
                                       phase1_iters, tail_bucket)
    else:
        res = _batched_solve(stamps, psf, bkgs, x0, fluxes, obj, beta0, lr0,
                             sat, cfg, per_stamp_psf)
    if pad:
        res = _unpad(res, b_orig)
    if flatten:
        res = res._replace(x=res.x.reshape((res.x.shape[0],) + img_shape))
    return res


@partial(jax.jit, static_argnames=('n',))
def _unpad(res: SGPResult, n: int) -> SGPResult:
    """Slice bucket padding off every result field in ONE device program
    (eager per-field slices would compile-and-load 7 tiny programs per novel
    (bucket, batch) pair — seconds on tunneled backends)."""
    return jax.tree.map(lambda a: a[:n], res)


BETA_SEEDS = (0, 42, 951, 93, 810)


def default_beta_candidates() -> np.ndarray:
    """The reference's five seeded N(1, 0.05) beta-init draws
    (application_sgp_star_stamps.py:69-75) — THE candidate grid, defined
    once and shared by ``beta_init_search`` and the workloads
    (np.random.seed + normal in the reference equals RandomState here)."""
    return np.array([np.random.RandomState(s).normal(loc=1.0, scale=0.05)
                     for s in BETA_SEEDS])


def beta_init_search(stamps, psf, bkgs, cfg: SGPConfig, *, fluxes=None,
                     beta_candidates=None, lr0=1e-3, sat_level=0.0,
                     mesh: Optional[Mesh] = None, scorer='catalog',
                     phase1_iters: Optional[int] = None,
                     bucket: bool = False) -> tuple:
    """Vectorized beta-init selection.

    The reference runs 5 full solves per stamp serially and keeps the beta
    whose restoration minimizes the flux fractional difference — measured
    on the restored CATALOG's brightest source
    (application_sgp_star_stamps.py:68-105). Here the (stamp x candidate)
    grid is flattened into one batch: B*K solves in a single compiled
    program, then an argmin per stamp.

    ``scorer`` selects the flux entering FFD = 1 - F_rest/F_orig:
      * 'catalog' (default, the reference's criterion): brightest-source
        segment flux from the batched catalog pipeline
        (catalog.batched.brightest_catalog_fluxes; host-side, one
        vectorized pass over all B*K restorations);
      * 'flux_sum': background-subtracted pixel-sum proxy — device-side,
        no host round-trip; a documented fast path that can pick a
        different beta on blended stamps;
      * a callable ``f(grid_x (B,K,H,W) np.ndarray) -> (B,K) ffd``.

    ``phase1_iters`` forwards to restore_stamps (convergence compaction
    for the candidate grid).

    Returns (best_beta (B,), best_x (B,H,W), result for the full grid).
    """
    if beta_candidates is None:
        beta_candidates = default_beta_candidates()
    # grid construction is pure HOST NumPy: eager jnp.repeat/tile at the
    # novel pre-pad shape would compile-and-load tiny device programs and
    # round-trip the ~B*K-stamp grid through the device before the bucket
    # padding pulled it back anyway (restore_stamps stages the final
    # shapes itself)
    beta_candidates = np.asarray(beta_candidates)
    k = beta_candidates.shape[0]
    stamps = np.asarray(stamps)
    b, h, w = stamps.shape

    rep = lambda a: np.repeat(a, k, axis=0)
    stamps_g = rep(stamps)
    bkgs = np.asarray(bkgs)
    if bkgs.ndim == 0:
        bkgs = np.broadcast_to(bkgs, (b,))
    bkgs_g = rep(bkgs)
    fluxes_g = None if fluxes is None else rep(np.asarray(fluxes))
    psf_g = rep(np.asarray(psf)) if np.ndim(psf) == 3 else psf
    beta_g = np.tile(beta_candidates, b)

    res = restore_stamps(stamps_g, psf_g, bkgs_g, cfg, fluxes=fluxes_g,
                         beta0=beta_g, lr0=lr0, sat_level=sat_level,
                         mesh=mesh, phase1_iters=phase1_iters,
                         bucket=bucket)

    # Flux fractional difference per (stamp, candidate): 1 - F_rest/F_orig
    # with F_orig the background-subtracted stamp sum (map backgrounds sum
    # over their pixels; (B,) backgrounds are per-pixel levels).
    x_g = res.x.reshape(b, k, h, w)
    if fluxes is not None:
        f_orig = np.asarray(fluxes, np.float64)[:, None]
    else:
        bkg_tot = (bkgs.sum(axis=(1, 2)) if bkgs.ndim == 3
                   else h * w * bkgs)
        f_orig = (stamps.sum(axis=(1, 2)) - bkg_tot)[:, None]
    if scorer == 'flux_sum':
        f_rest = jnp.sum(x_g, axis=(2, 3))
        ffd = 1.0 - f_rest / jnp.asarray(f_orig, cfg.jnp_dtype)
        # a diverged (NaN) candidate must never win the argmin
        ffd = jnp.where(jnp.isfinite(ffd), ffd, jnp.inf)
        best = jnp.argmin(ffd, axis=1)
    else:
        if scorer == 'catalog':
            from ..catalog.batched import brightest_catalog_fluxes
            f_np = brightest_catalog_fluxes(
                np.asarray(res.x).reshape(b * k, h, w)).reshape(b, k)
            ffd_np = 1.0 - f_np / f_orig
        elif callable(scorer):
            ffd_np = np.asarray(scorer(np.asarray(x_g)))
        else:
            raise ValueError(f'unknown scorer {scorer!r}')
        ffd_np = np.where(np.isfinite(ffd_np), ffd_np, np.inf)
        best = jnp.asarray(np.argmin(ffd_np, axis=1))
    best_beta = jnp.asarray(beta_candidates, cfg.jnp_dtype)[best]
    best_x = x_g[jnp.arange(b), best]
    return best_beta, best_x, res
