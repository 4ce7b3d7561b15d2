"""Batched restoration + sharding: vmapped batch equals per-stamp solves,
mesh-sharded run equals unsharded, beta-init search picks argmin."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tpu_sgp import SGPConfig
from tpu_sgp.parallel.batch import restore_stamps, beta_init_search
from tpu_sgp.simulate import synthetic_star_stamps
from tpu_sgp.api import sgp


def _cfg(**kw):
    base = dict(max_iter=12, stop_criterion=1, init_recon=2, proj_type=1,
                has_flux=True, has_sat_level=True, dtype='float64')
    base.update(kw)
    return SGPConfig(**base)


def test_batch_matches_reference_wrapper():
    stamps, psf, bkgs, _ = synthetic_star_stamps(6, size=31, seed=3)
    fluxes = stamps.sum(axis=(1, 2)) - 961 * bkgs
    res = restore_stamps(stamps, psf, bkgs, _cfg(), fluxes=fluxes,
                         sat_level=65000.0)
    for i in range(6):
        x, iters, _, _, _ = sgp(stamps[i], psf, bkgs[i], init_recon=2,
                                proj_type=1, stop_criterion=1, MAXIT=12,
                                flux=fluxes[i], ccd_sat_level=65000.0)
        np.testing.assert_allclose(np.asarray(res.x)[i], x, rtol=1e-9,
                                   atol=1e-9)


def test_batch_sharded_matches_unsharded():
    stamps, psf, bkgs, _ = synthetic_star_stamps(16, size=16, seed=4)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=6)
    plain = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                           sat_level=65000.0)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=('batch',))
    sharded = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                             sat_level=65000.0, mesh=mesh)
    # GSPMD may reassociate reductions; a one-ULP difference can flip a
    # bisection branch in the flux projection, so equality is to solver
    # precision, not bitwise.
    np.testing.assert_allclose(np.asarray(plain.x), np.asarray(sharded.x),
                               rtol=1e-6, atol=1e-6)
    devs = {s.device for s in sharded.x.addressable_shards}
    assert len(devs) == 8


def test_per_stamp_psf_batch():
    stamps, psf, bkgs, _ = synthetic_star_stamps(4, size=16, seed=5)
    psfs = np.stack([np.roll(psf, i, axis=0) for i in range(4)])
    res = restore_stamps(stamps, psfs, bkgs, _cfg(max_iter=5, proj_type=0,
                                                  has_sat_level=False),
                         fluxes=stamps.sum(axis=(1, 2)))
    assert np.isfinite(np.asarray(res.x)).all()
    # different PSFs must give different restorations
    assert not np.allclose(np.asarray(res.x)[0], np.asarray(res.x)[1])


def test_beta_init_search_selects_argmin():
    stamps, psf, bkgs, fl = synthetic_star_stamps(3, size=16, seed=6)
    cfg = _cfg(max_iter=8, divergence='beta', adapt_beta=True,
               schedule_lr=True)
    cands = np.array([0.95, 1.0, 1.05])
    best_beta, best_x, grid = beta_init_search(
        stamps, psf, bkgs, cfg, fluxes=stamps.sum(axis=(1, 2)) - 256 * bkgs,
        beta_candidates=cands, sat_level=65000.0)
    assert best_beta.shape == (3,)
    assert set(np.asarray(best_beta).tolist()) <= set(cands.tolist())
    assert best_x.shape == (3, 16, 16)


def test_default_beta_candidates_match_reference_seeds():
    """Reference seeds [0,42,951,93,810] with N(1,0.05) draws
    (application_sgp_star_stamps.py:69-75) — the LIBRARY grid must equal
    the draws the reference's global-seed idiom produces."""
    from tpu_sgp.parallel.batch import BETA_SEEDS, default_beta_candidates
    assert BETA_SEEDS == (0, 42, 951, 93, 810)
    got = default_beta_candidates()
    want = []
    for seed in BETA_SEEDS:
        # the reference's np.random.seed + normal equals RandomState
        np.random.seed(seed)
        want.append(np.random.normal(loc=1.0, scale=0.05))
    np.testing.assert_array_equal(got, np.array(want))


def test_bucketed_batch_matches_unbucketed():
    stamps, psf, bkgs, _ = synthetic_star_stamps(5, size=16, seed=9)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=6)
    plain = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                           sat_level=65000.0)
    padded = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                            sat_level=65000.0, bucket=True)
    assert padded.x.shape[0] == 5          # padding sliced off
    np.testing.assert_allclose(np.asarray(plain.x), np.asarray(padded.x),
                               rtol=1e-12, atol=1e-12)
    from tpu_sgp.parallel.batch import _bucket_size
    assert _bucket_size(5) == 8
    assert _bucket_size(256) == 256
    assert _bucket_size(300) == 512
    assert _bucket_size(2525) == 2560


def test_bucketed_batch_accepts_scalar_flux_and_beta():
    """Scalar fluxes/beta0 broadcast fine without bucketing; host-side
    bucket padding must pass them through untouched (regression: padding a
    0-d array raised IndexError)."""
    stamps, psf, bkgs, _ = synthetic_star_stamps(5, size=16, seed=9)
    cfg = _cfg(max_iter=4)
    res = restore_stamps(stamps, psf, bkgs, cfg, fluxes=123.0,
                         sat_level=65000.0, bucket=True)
    assert res.x.shape[0] == 5
    plain = restore_stamps(stamps, psf, bkgs, cfg, fluxes=123.0,
                           sat_level=65000.0)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(plain.x),
                               rtol=1e-12, atol=1e-12)


@__import__('pytest').mark.filterwarnings(
    'ignore:RestorationSession')
def test_restoration_session_mesh_divisible_buckets():
    """Session bucketing must round the pad target up to the mesh device
    count (regression: batch 3 -> bucket 4 crashed an 8-device sharding)."""
    import jax
    from jax.sharding import Mesh
    from tpu_sgp.parallel.session import RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(3, size=16, seed=13)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=4, dtype='float64')
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=('batch',))
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16), mesh=mesh)
    res = sess.restore(stamps, bkgs, fluxes=fluxes)
    assert res.x.shape == (3, 16, 16)
    assert np.isfinite(np.asarray(res.x)).all()


def test_restoration_session_warmup_normalizes_buckets_to_policy_grid():
    """warmup() must warm the buckets the padding policy actually serves:
    on a 6-device mesh an explicit/default bucket like 4 is not a policy
    output (and not device-count divisible — the sharded device_put
    rejected it outright); it must normalize to bucket 6, which a real
    batch of 1..6 then hits without a serve-time compile warning."""
    import warnings
    import jax
    from jax.sharding import Mesh
    from tpu_sgp.parallel.batch import _bucket_target
    from tpu_sgp.parallel.session import RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(3, size=16, seed=21)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=4, dtype='float64')
    mesh = Mesh(np.array(jax.devices()[:6]), axis_names=('batch',))
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16), mesh=mesh)
    sess.warmup(buckets=(4,))  # crashed before: 4 % 6 != 0
    assert sess._warmed == {(_bucket_target(3, mesh), 'plain')} \
        == {(6, 'plain')}
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        res = sess.restore(stamps, bkgs, fluxes=fluxes)
    assert res.x.shape == (3, 16, 16)
    assert np.isfinite(np.asarray(res.x)).all()


@__import__('pytest').mark.filterwarnings(
    'ignore:RestorationSession')
def test_restoration_session_serves_buckets():
    from tpu_sgp.parallel.session import RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(10, size=16, seed=12)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=5, dtype='float64')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(buckets=(4,))
    res = sess.restore(stamps, bkgs, fluxes=fluxes)
    assert res.x.shape == (10, 16, 16)
    assert np.isfinite(np.asarray(res.x)).all()
    # streaming: two batches through the generator
    outs = list(sess.restore_stream([
        (stamps[:4], bkgs[:4], fluxes[:4]),
        (stamps[4:8], bkgs[4:8], fluxes[4:8])]))
    assert len(outs) == 2
    np.testing.assert_allclose(np.asarray(outs[0].x),
                               np.asarray(res.x)[:4], rtol=1e-9, atol=1e-9)
    # more batches than lookahead: the backpressure drain must preserve
    # request order and results (lookahead=1 forces mid-stream yields)
    reqs = [(stamps[i:i + 2], bkgs[i:i + 2], fluxes[i:i + 2])
            for i in range(0, 10, 2)]
    outs = list(sess.restore_stream(iter(reqs), lookahead=1))
    assert len(outs) == 5
    got = np.concatenate([np.asarray(o.x) for o in outs])
    np.testing.assert_allclose(got, np.asarray(res.x), rtol=1e-9, atol=1e-9)
    # shape mismatch is rejected
    import pytest
    with pytest.raises(ValueError):
        sess.restore(np.zeros((2, 8, 8)), np.zeros(2))


def test_restoration_session_warns_on_unwarmed_bucket():
    import pytest
    from tpu_sgp.parallel.batch import _bucket_target
    from tpu_sgp.parallel.session import RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(10, size=16, seed=12)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=4, dtype='float64')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    # warmup(max_batch=N) covers every bucket the policy produces for 1..N
    sess.warmup(max_batch=6)
    # f64 + track_discr sessions take the 'plain' path
    assert sess._warmed == {(_bucket_target(b, None), 'plain')
                            for b in range(1, 7)}
    with pytest.warns(UserWarning, match='not warmed'):
        sess.restore(stamps, bkgs, fluxes=fluxes)   # 10 -> bucket 16
    # the bucket is now compiled: serving it again is silent
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        sess.restore(stamps, bkgs, fluxes=fluxes)


def test_batched_errflag_tracking():
    stamps, psf, bkgs, _ = synthetic_star_stamps(3, size=16, seed=21)
    truths = stamps - bkgs[:, None, None]  # rough truth stand-in
    cfg = _cfg(max_iter=6, proj_type=0, has_sat_level=False, errflag=True)
    res = restore_stamps(stamps, psf, bkgs, cfg,
                         fluxes=stamps.sum(axis=(1, 2)), obj=truths)
    err = np.asarray(res.err)
    assert err.shape == (3, 7)
    assert np.isfinite(err).all()
    assert (err > 0).all()


def test_two_phase_compaction_matches_single_phase():
    """Convergence compaction (phase-1 cap + tail resume + catch-up resume)
    must reproduce the single-phase batched solve: identical per-lane
    iteration schedules, per-pixel agreement to solver precision (the
    resumed lanes run through differently-compiled programs whose fusion
    reassociates ULPs — measured ~1e-12 relative), and lanes that finish
    in phase 1 bit-exact. Includes a tail bucket too small for the tail,
    so the catch-up pass does real work."""
    stamps, psf, bkgs, _ = synthetic_star_stamps(24, size=16, seed=3)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=60, stop_criterion=3, tol_convergence=1e-4,
               dtype='float64')
    single = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                            sat_level=65000.0)
    it_single = np.asarray(single.iters)
    assert it_single.min() < it_single.max()  # schedules genuinely differ
    cap = int(np.median(it_single))
    for tail in (16, 2):   # 2 => overflow lanes exercise the catch-up pass
        two = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                             sat_level=65000.0, phase1_iters=cap,
                             tail_bucket=tail)
        np.testing.assert_array_equal(np.asarray(two.iters), it_single)
        np.testing.assert_allclose(np.asarray(two.x), np.asarray(single.x),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f'tail={tail}')
        # lanes that never left phase 1 are bit-exact
        done_in_p1 = it_single <= cap
        assert done_in_p1.any()
        np.testing.assert_array_equal(np.asarray(two.x)[done_in_p1],
                                      np.asarray(single.x)[done_in_p1])


def test_restoration_session_with_compaction():
    """A session configured with phase1_iters serves identical results
    (big batches route through the two-phase solve, small ones don't)."""
    from tpu_sgp.parallel.session import RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(40, size=16, seed=17)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=60, stop_criterion=3, tol_convergence=1e-4,
               dtype='float64')
    plain = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    compact = RestorationSession(psf, cfg, stamp_shape=(16, 16),
                                 phase1_iters=20, tail_bucket=8)
    a = plain.restore(stamps, bkgs, fluxes=fluxes)
    b = compact.restore(stamps, bkgs, fluxes=fluxes)
    np.testing.assert_array_equal(np.asarray(b.iters), np.asarray(a.iters))
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                               rtol=1e-6, atol=1e-6)


def test_flatten_matches_2d_layout():
    """flatten=True ravels stamps for TPU tiling; the matmul contraction
    order changes, so f64 agreement is to ULP accumulation, and the
    operator itself is mathematically identical."""
    from tpu_sgp.ops.psf_operator import (make_matmul_flat_operator,
                                          make_matmul_operator)
    stamps, psf, bkgs, _ = synthetic_star_stamps(6, size=16, seed=19)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=10)
    a = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                       sat_level=65000.0)
    b = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                       sat_level=65000.0, flatten=True)
    assert b.x.shape == (6, 16, 16)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                               rtol=1e-8, atol=1e-8)
    # operator equivalence (exact reshape identity)
    k = np.asarray(psf, np.float64)
    A2, AT2 = make_matmul_operator(jnp.asarray(k))
    A1, AT1 = make_matmul_flat_operator(jnp.asarray(k))
    v = np.asarray(stamps[0], np.float64)
    np.testing.assert_allclose(np.asarray(A1(jnp.asarray(v.ravel()))),
                               np.asarray(A2(jnp.asarray(v))).ravel(),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(AT1(jnp.asarray(v.ravel()))),
                               np.asarray(AT2(jnp.asarray(v))).ravel(),
                               rtol=1e-13, atol=1e-13)


def test_two_phase_compaction_per_stamp_psfs():
    """The tail gather must also gather per-stamp PSFs."""
    stamps, psf, bkgs, _ = synthetic_star_stamps(12, size=16, seed=23)
    psfs = np.stack([np.roll(psf, i % 3, axis=0) for i in range(12)])
    psfs /= psfs.sum(axis=(1, 2), keepdims=True)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=50, stop_criterion=3, tol_convergence=1e-4,
               dtype='float64', operator='otf')
    single = restore_stamps(stamps, psfs, bkgs, cfg, fluxes=fluxes,
                            sat_level=65000.0)
    two = restore_stamps(stamps, psfs, bkgs, cfg, fluxes=fluxes,
                         sat_level=65000.0, phase1_iters=10, tail_bucket=4)
    np.testing.assert_array_equal(np.asarray(two.iters),
                                  np.asarray(single.iters))
    np.testing.assert_allclose(np.asarray(two.x), np.asarray(single.x),
                               rtol=1e-6, atol=1e-6)


def test_two_phase_compaction_sharded_equals_unsharded():
    """Compaction under a NamedSharding mesh: the tail gather/scatter
    compiles to GSPMD collectives and the result equals the unsharded
    two-phase solve (and the single-phase iteration schedules)."""
    from jax.sharding import Mesh

    stamps, psf, bkgs, _ = synthetic_star_stamps(24, size=16, seed=3)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=60, stop_criterion=3, tol_convergence=1e-4,
               dtype='float64')
    single = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                            sat_level=65000.0)
    cap = int(np.median(np.asarray(single.iters)))
    plain = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                           sat_level=65000.0, phase1_iters=cap,
                           tail_bucket=8)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=('batch',))
    sharded = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                             sat_level=65000.0, phase1_iters=cap,
                             tail_bucket=8, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(sharded.iters),
                                  np.asarray(single.iters))
    np.testing.assert_allclose(np.asarray(sharded.x), np.asarray(plain.x),
                               rtol=1e-9, atol=1e-9)


def test_flatten_compaction_sharded_combined():
    """The bench.py multi-chip path: flat (B, H*W) layout + two-phase
    compaction + NamedSharding mesh, all at once, equals the plain solve."""
    from jax.sharding import Mesh

    stamps, psf, bkgs, _ = synthetic_star_stamps(24, size=16, seed=9)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=60, stop_criterion=3, tol_convergence=1e-4,
               dtype='float64')
    plain = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                           sat_level=65000.0)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=('batch',))
    combo = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                           sat_level=65000.0, flatten=True,
                           phase1_iters=int(np.median(
                               np.asarray(plain.iters))),
                           tail_bucket=8, mesh=mesh)
    assert combo.x.shape == plain.x.shape
    np.testing.assert_array_equal(np.asarray(combo.iters),
                                  np.asarray(plain.iters))
    # the flat layout reorders the matmul contraction, so trajectories are
    # rounding-equivalent rather than bitwise (measured ~3e-5 absolute on
    # ~1e3-scale pixels after ~25 f64 iterations; schedules identical)
    np.testing.assert_allclose(np.asarray(combo.x), np.asarray(plain.x),
                               rtol=1e-5, atol=1e-3)


def test_restore_stamps_rejects_missing_flux_and_bad_sat():
    """cfg.has_flux without fluxes used to silently produce all-zero
    reconstructions (projection target sum(x)=0); likewise has_sat_level
    with sat_level<=0 clamps everything. Both now raise."""
    import pytest
    stamps, psf, bkgs, _ = synthetic_star_stamps(4, size=16, seed=0)
    cfg = _cfg(max_iter=5, stop_criterion=1, dtype='float64')
    with pytest.raises(ValueError, match='has_flux'):
        restore_stamps(stamps, psf, bkgs, cfg)
    with pytest.raises(ValueError, match='sat_level'):
        restore_stamps(stamps, psf, bkgs, cfg,
                       fluxes=stamps.sum(axis=(1, 2)), sat_level=0.0)
    # errflag without ground truth: obj would default to zeros and the
    # err series to all-inf (api.sgp raises the same misuse)
    with pytest.raises(ValueError, match='errflag'):
        restore_stamps(stamps, psf, bkgs, cfg.replace(errflag=True),
                       fluxes=stamps.sum(axis=(1, 2)))


@__import__('pytest').mark.filterwarnings(
    'ignore:RestorationSession')
def test_restoration_session_packed_path_equivalence():
    """Single-device sessions serve through the packed single-transfer
    program (one H2D buffer, one fused program, one D2H buffer — each
    extra array costs a full link round trip on tunneled rigs). The
    packed result must carry every SGPResult field faithfully and match
    the legacy multi-array path to refusion roundoff."""
    from tpu_sgp.parallel.batch import restore_stamps
    from tpu_sgp.parallel.session import RestorationSession

    stamps, psf, bkgs, _ = synthetic_star_stamps(8, size=16, seed=21)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=12, track_discr=False)
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(buckets=(8,))
    assert sess._packed_progs, 'packed path was not exercised'
    r = sess.restore(stamps, bkgs, fluxes=fluxes)
    plain = restore_stamps(
        stamps.astype(np.float64), sess.psf, bkgs.astype(np.float64), cfg,
        fluxes=fluxes.astype(np.float64), beta0=sess.beta0, lr0=sess.lr0,
        sat_level=sess.sat_level, bucket=False, flatten=sess.flatten,
        tail_bucket=sess.tail_bucket)
    np.testing.assert_array_equal(r.iters, np.asarray(plain.iters))
    np.testing.assert_allclose(r.x, np.asarray(plain.x), rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(r.fv, np.asarray(plain.fv), rtol=1e-9)
    np.testing.assert_allclose(r.beta, np.asarray(plain.beta), rtol=1e-12)
    np.testing.assert_allclose(r.scaling, np.asarray(plain.scaling),
                               rtol=1e-12)
    # flux conservation survives the packed round trip
    fc = np.abs(r.x.sum(axis=(1, 2)) - fluxes) / np.abs(fluxes)
    assert fc.max() < 1e-8
    # a track_discr config must NOT use the packed path (it drops series)
    cfg2 = _cfg(max_iter=6, track_discr=True)
    sess2 = RestorationSession(psf, cfg2, stamp_shape=(16, 16))
    sess2.warmup(buckets=(8,))
    assert not sess2._packed_progs
    r2 = sess2.restore(stamps, bkgs, fluxes=fluxes)
    assert r2.discr.shape[1] > 1


@__import__('pytest').mark.filterwarnings(
    'ignore:RestorationSession')
def test_restoration_session_packed_guards():
    """The packed path must not swallow the missing-fluxes error and must
    route background MAPS through the plain multi-array path."""
    import pytest
    from tpu_sgp.parallel.session import RestorationSession

    stamps, psf, bkgs, _ = synthetic_star_stamps(4, size=16, seed=23)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=4, track_discr=False)
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    with pytest.raises(ValueError, match='has_flux'):
        sess.restore(stamps, bkgs)
    bkg_maps = np.broadcast_to(bkgs[:, None, None], stamps.shape).copy()
    r = sess.restore(stamps, bkg_maps, fluxes=fluxes)
    assert not sess._packed_progs           # map request took the plain path
    assert np.isfinite(r.x).all()


@__import__('pytest').mark.filterwarnings(
    'ignore:RestorationSession')
def test_restoration_session_packed_beta_divergence():
    """The packed layout carries a per-request beta0 column — a
    beta-divergence session must honor it."""
    from tpu_sgp.parallel.session import RestorationSession

    stamps, psf, bkgs, _ = synthetic_star_stamps(4, size=16, seed=29)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=8, divergence='beta', adapt_beta=True,
               schedule_lr=True, track_discr=False)
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16), beta0=1.01)
    sess.warmup(buckets=(4,))
    assert sess._packed_progs
    r1 = sess.restore(stamps, bkgs, fluxes=fluxes)
    r2 = sess.restore(stamps, bkgs, fluxes=fluxes, beta0=0.97)
    assert np.isfinite(r1.x).all() and np.isfinite(r2.x).all()
    # a different beta0 must actually change the result
    assert not np.allclose(r1.x, r2.x)
    np.testing.assert_allclose(r1.beta, 1.01 * np.ones(4), rtol=0.05)


def test_beta_init_search_background_maps():
    """(B, H, W) background maps with fluxes=None must work and use the
    map's PIXEL SUM as F_orig (review regression: the old h*w*bkgs formula
    both mis-shaped and mis-valued map backgrounds)."""
    stamps, psf, bkgs, _ = synthetic_star_stamps(3, size=16, seed=31)
    bkg_maps = np.broadcast_to(bkgs[:, None, None], stamps.shape).copy()
    cfg = _cfg(max_iter=6, divergence='beta', has_flux=False,
               has_sat_level=False, track_discr=False)
    cands = np.array([0.98, 1.0, 1.02])
    bb_map, bx_map, _ = beta_init_search(
        stamps, psf, bkg_maps, cfg, beta_candidates=cands,
        scorer='flux_sum')
    # equivalent scalar-per-stamp backgrounds must select identically
    bb_vec, bx_vec, _ = beta_init_search(
        stamps, psf, bkgs, cfg, beta_candidates=cands, scorer='flux_sum')
    np.testing.assert_array_equal(np.asarray(bb_map), np.asarray(bb_vec))
    np.testing.assert_allclose(np.asarray(bx_map), np.asarray(bx_vec),
                               rtol=1e-6)
    # a callable scorer never touches F_orig and must also run with maps
    bb_c, _, _ = beta_init_search(
        stamps, psf, bkg_maps, cfg, beta_candidates=cands,
        scorer=lambda xg: np.abs(xg.sum(axis=(2, 3)) - 1.0))
    assert np.isfinite(np.asarray(bb_c)).all()


def test_beta_init_search_flux_sum_ignores_nonfinite_candidates():
    """The flux_sum scorer must never let a non-finite FFD lane win the
    argmin (jnp.argmin selects NaN lanes); an all-background stamp drives
    F_orig to 0 and the FFD non-finite, and the search must still return
    the first candidate with finite outputs rather than NaN garbage."""
    stamps, psf, bkgs, _ = synthetic_star_stamps(2, size=16, seed=33)
    stamps[1] = bkgs[1]                     # pure background: F_orig == 0
    cfg = _cfg(max_iter=4, divergence='beta', has_flux=False,
               has_sat_level=False, track_discr=False)
    cands = np.array([0.99, 1.01])
    bb, bx, _ = beta_init_search(stamps, psf, bkgs, cfg,
                                 beta_candidates=cands, scorer='flux_sum')
    assert np.isfinite(np.asarray(bb)).all()
    assert float(np.asarray(bb)[1]) == cands[0]  # deterministic fallback


@__import__('pytest').mark.filterwarnings('ignore:RestorationSession')
def test_session_warmup_exact_buckets_and_batch_axis():
    """warmup(max_batch=...) must compile each produced bucket at EXACTLY
    its own size (review regression: the dummy batch was re-run through
    the padding policy, double-rounding e.g. bucket 6 -> 12 on a 6-device
    mesh so bucket 6 never warmed), and a mesh whose axis is not named
    'batch' must be usable via batch_axis=."""
    from tpu_sgp.parallel.batch import _bucket_target
    from tpu_sgp.parallel.session import RestorationSession

    stamps, psf, bkgs, _ = synthetic_star_stamps(2, size=16, seed=35)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    mesh = Mesh(np.array(jax.devices()[:6]), ('dp',))
    cfg = _cfg(max_iter=4, track_discr=False)
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16), mesh=mesh,
                              batch_axis='dp')
    sess.warmup(max_batch=4)
    needed = {(_bucket_target(b, mesh), 'plain') for b in range(1, 5)}
    assert needed <= sess._warmed, (needed, sess._warmed)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('error')      # a non-warmed bucket would warn
        r = sess.restore(stamps, bkgs, fluxes=fluxes)
    assert r.x.shape == stamps.shape
    assert np.isfinite(r.x).all()


def test_restore_stream_propagates_request_errors_and_recovers():
    """A malformed request inside the stream surfaces as the original
    ValueError (raised from the worker thread, not a deadlock or a silent
    skip), results already in flight are yielded first, and the session
    stays usable afterwards."""
    from tpu_sgp.parallel.session import RestorationSession
    from tpu_sgp.simulate import synthetic_star_stamps

    stamps, psf, bkgs, _ = synthetic_star_stamps(32, size=31, seed=1)
    cfg = SGPConfig(max_iter=10, stop_criterion=1, init_recon=2,
                    proj_type=0, has_flux=False, has_sat_level=False,
                    dtype='float64')
    sess = RestorationSession(psf, cfg)

    def reqs():
        yield (stamps[:16], bkgs[:16], None)
        yield (stamps[:16, :7, :9], bkgs[:16], None)   # wrong stamp shape
        yield (stamps[16:], bkgs[16:], None)

    import pytest

    got = []
    with pytest.raises(ValueError, match=r'\(7, 9\)'):
        for r in sess.restore_stream(reqs()):
            got.append(r)
    assert len(got) >= 1          # the good request before the bad one
    assert np.asarray(got[0].x).shape == (16, 31, 31)
    out = sess.restore(stamps[:8], bkgs[:8])
    assert np.isfinite(np.asarray(out.x)).all()


@__import__('pytest').mark.filterwarnings('ignore:RestorationSession')
def test_restore_stream_coalesce_matches_per_request():
    """Dynamic batching: coalesce=2 folds consecutive requests into one
    device call; results re-split per request, in order, equal to the
    sequential restore() answers (lanes are independent, so coalescing is
    exact up to solver roundoff)."""
    from tpu_sgp.parallel.session import RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(10, size=16, seed=12)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=5, dtype='float64')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(buckets=(4, 8))
    ref = sess.restore(stamps, bkgs, fluxes=fluxes)
    # 5 requests of 2 stamps; coalesce=2 -> groups of (4, 4, 2); the odd
    # tail group exercises the partial-group flush
    reqs = [(stamps[i:i + 2], bkgs[i:i + 2], fluxes[i:i + 2])
            for i in range(0, 10, 2)]
    outs = list(sess.restore_stream(iter(reqs), lookahead=1, coalesce=2))
    assert len(outs) == 5
    for i, o in enumerate(outs):
        assert np.asarray(o.x).shape == (2, 16, 16)
        np.testing.assert_allclose(np.asarray(o.x),
                                   np.asarray(ref.x)[2 * i:2 * i + 2],
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_array_equal(np.asarray(o.iters),
                                      np.asarray(ref.iters)[2 * i:2 * i + 2])
    # scalar-background requests broadcast into the coalesced batch
    outs2 = list(sess.restore_stream(
        [(stamps[:2], float(bkgs[0]), fluxes[:2]),
         (stamps[2:4], float(bkgs[2]), fluxes[2:4])], coalesce=2))
    assert len(outs2) == 2
    exp0 = sess.restore(stamps[:2], np.full(2, float(bkgs[0])),
                        fluxes=fluxes[:2])
    np.testing.assert_allclose(np.asarray(outs2[0].x), np.asarray(exp0.x),
                               rtol=1e-9, atol=1e-9)


def test_restore_stream_coalesce_rejects_mixed_and_bad_groups():
    import pytest
    from tpu_sgp.parallel.session import RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(4, size=16, seed=12)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=3, dtype='float64')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(buckets=(4,))
    # mixed with/without fluxes in one group
    with pytest.raises(ValueError, match='coalesce'):
        list(sess.restore_stream(
            [(stamps[:2], bkgs[:2], fluxes[:2]),
             (stamps[2:], bkgs[2:], None)], coalesce=2))
    # per-pixel background maps cannot be coalesced
    maps = np.broadcast_to(bkgs[:2, None, None], (2, 16, 16))
    with pytest.raises(ValueError, match='coalesce=1'):
        list(sess.restore_stream(
            [(stamps[:2], maps, fluxes[:2]),
             (stamps[2:], bkgs[2:], fluxes[2:])], coalesce=2))
    # a wrong stamp shape in a coalesced group surfaces the session error
    with pytest.raises(ValueError, match=r'\(7, 9\)'):
        list(sess.restore_stream(
            [(stamps[:2], bkgs[:2], fluxes[:2]),
             (stamps[2:, :7, :9], bkgs[2:], fluxes[2:])], coalesce=2))


@__import__('pytest').mark.filterwarnings('ignore:RestorationSession')
def test_micro_batch_server_coalesces_and_matches():
    """Concurrent single requests through MicroBatchServer coalesce into
    shared device calls and return exactly the per-request restore()
    results (validated by slicing equality); a request bigger than
    max_batch still serves (solo)."""
    from tpu_sgp.parallel.session import MicroBatchServer, RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(12, size=16, seed=12)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=5, dtype='float64')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(buckets=(4, 8, 16))
    ref = sess.restore(stamps, bkgs, fluxes=fluxes)

    with MicroBatchServer(sess, max_batch=8, max_delay_s=0.5) as srv:
        # four 2-stamp requests submitted back-to-back: the 0.5 s window
        # lets the worker coalesce them into (at most) two 8-stamp calls
        futs = [srv.submit(stamps[i:i + 2], bkgs[i:i + 2],
                           fluxes=fluxes[i:i + 2])
                for i in range(0, 8, 2)]
        outs = [f.result(timeout=120) for f in futs]
        for i, o in enumerate(outs):
            np.testing.assert_allclose(np.asarray(o.x),
                                       np.asarray(ref.x)[2 * i:2 * i + 2],
                                       rtol=1e-9, atol=1e-9)
            np.testing.assert_array_equal(
                np.asarray(o.iters), np.asarray(ref.iters)[2 * i:2 * i + 2])
        assert srv.batches_served < len(futs)  # coalescing really happened
        assert srv.requests_served == len(futs)
        # oversized request (12 > max_batch=8) serves solo
        big = srv.restore(stamps, bkgs, fluxes=fluxes)
        np.testing.assert_allclose(np.asarray(big.x), np.asarray(ref.x),
                                   rtol=1e-9, atol=1e-9)
    # closed server refuses new work
    import pytest
    with pytest.raises(RuntimeError, match='closed'):
        srv.submit(stamps[:2], bkgs[:2], fluxes=fluxes[:2])
    srv.close()   # idempotent


def test_micro_batch_server_validates_on_caller_thread():
    """Malformed requests raise at submit() — they never reach the worker
    or poison other clients' batches."""
    import pytest
    from tpu_sgp.parallel.session import MicroBatchServer, RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(4, size=16, seed=12)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=3, dtype='float64')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(buckets=(4,))
    with MicroBatchServer(sess, max_batch=8, max_delay_s=0.05) as srv:
        with pytest.raises(ValueError, match='stamps'):
            srv.submit(stamps[:, :7, :9], bkgs)
        with pytest.raises(ValueError, match='has_flux'):
            srv.submit(stamps, bkgs)               # fluxes required by cfg
        with pytest.raises(ValueError, match='micro-batched'):
            srv.submit(stamps,
                       np.broadcast_to(bkgs[:, None, None], (4, 16, 16)),
                       fluxes=fluxes)
        # a good request still works after the rejected ones
        ok = srv.restore(stamps, bkgs, fluxes=fluxes)
        assert np.isfinite(np.asarray(ok.x)).all()


@__import__('pytest').mark.filterwarnings('ignore:RestorationSession')
def test_micro_batch_server_threaded_clients():
    """8 client threads x 3 requests each, all racing the same server;
    every client gets exactly its own stamps back."""
    from concurrent.futures import ThreadPoolExecutor
    from tpu_sgp.parallel.session import MicroBatchServer, RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(24, size=16, seed=5)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=5, dtype='float64')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(max_batch=24)
    ref = sess.restore(stamps, bkgs, fluxes=fluxes)

    def client(i):
        out = []
        for j in range(3):
            k = (i * 3 + j) % 24
            r = srv.restore(stamps[k:k + 1], bkgs[k:k + 1],
                            fluxes=fluxes[k:k + 1])
            out.append((k, r))
        return out

    with MicroBatchServer(sess, max_batch=16, max_delay_s=0.02) as srv:
        with ThreadPoolExecutor(max_workers=8) as pool:
            results = [r for f in [pool.submit(client, i) for i in range(8)]
                       for r in f.result(timeout=300)]
    for k, r in results:
        np.testing.assert_allclose(np.asarray(r.x), np.asarray(ref.x)[k:k + 1],
                                   rtol=1e-9, atol=1e-9)
    assert srv.requests_served == 24
    assert srv.batches_served < 24     # some coalescing under contention


@__import__('pytest').mark.filterwarnings('ignore:RestorationSession')
def test_restore_stream_per_request_beta0():
    """4-tuple stream requests carry their own beta0 (per-stamp beta
    columns make it exact under coalescing too)."""
    from tpu_sgp.parallel.session import RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(4, size=16, seed=12)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=6, dtype='float64', divergence='beta')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(buckets=(2, 4))
    b0, b1 = 0.9, 1.1
    exp0 = sess.restore(stamps[:2], bkgs[:2], fluxes=fluxes[:2], beta0=b0)
    exp1 = sess.restore(stamps[2:], bkgs[2:], fluxes=fluxes[2:], beta0=b1)
    assert not np.allclose(np.asarray(exp0.beta), np.asarray(exp1.beta))
    for coalesce in (1, 2):
        outs = list(sess.restore_stream(
            [(stamps[:2], bkgs[:2], fluxes[:2], b0),
             (stamps[2:], bkgs[2:], fluxes[2:], b1)], coalesce=coalesce))
        np.testing.assert_allclose(np.asarray(outs[0].x), np.asarray(exp0.x),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(outs[1].x), np.asarray(exp1.x),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(outs[1].beta),
                                   np.asarray(exp1.beta), rtol=1e-12)


@__import__('pytest').mark.filterwarnings('ignore:RestorationSession')
def test_micro_batch_server_cancelled_future_does_not_poison_batch():
    """A Future cancelled while queued is dropped at batch-take time; the
    other requests of its batch still resolve normally."""
    from tpu_sgp.parallel.session import MicroBatchServer, RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(6, size=16, seed=5)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=4, dtype='float64')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(max_batch=6)
    ref = sess.restore(stamps, bkgs, fluxes=fluxes)
    # the 0.3 s window keeps the batch open long enough that the cancel
    # usually races ahead of the worker taking the batch; the assertion
    # branches on which side won, so the test is race-tolerant
    srv = MicroBatchServer(sess, max_batch=6, max_delay_s=0.3)
    f1 = srv.submit(stamps[:2], bkgs[:2], fluxes=fluxes[:2])
    f2 = srv.submit(stamps[2:4], bkgs[2:4], fluxes=fluxes[2:4])
    f3 = srv.submit(stamps[4:], bkgs[4:], fluxes=fluxes[4:])
    cancelled = f2.cancel()   # may race the worker; only assert when it won
    r1, r3 = f1.result(timeout=120), f3.result(timeout=120)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(ref.x)[:2],
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(r3.x), np.asarray(ref.x)[4:],
                               rtol=1e-9, atol=1e-9)
    if cancelled:
        assert f2.cancelled()
    else:
        np.testing.assert_allclose(np.asarray(f2.result().x),
                                   np.asarray(ref.x)[2:4],
                                   rtol=1e-9, atol=1e-9)
    srv.close()


def test_micro_batch_server_rejects_length_mismatch_at_submit():
    """bkgs/fluxes/beta0 whose lengths don't broadcast to the stamp count
    fail on the caller's thread, never on a shared batch."""
    import pytest
    from tpu_sgp.parallel.session import MicroBatchServer, RestorationSession
    stamps, psf, bkgs, _ = synthetic_star_stamps(4, size=16, seed=12)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=3, dtype='float64')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(buckets=(4,))
    with MicroBatchServer(sess, max_batch=8, max_delay_s=0.02) as srv:
        with pytest.raises(ValueError, match='bkgs'):
            srv.submit(stamps[:2], bkgs, fluxes=fluxes[:2])     # bkgs (4,)
        with pytest.raises(ValueError, match='fluxes'):
            srv.submit(stamps[:2], bkgs[:2], fluxes=fluxes[:3])
        with pytest.raises(ValueError, match='beta0'):
            srv.submit(stamps[:2], bkgs[:2], fluxes=fluxes[:2],
                       beta0=np.ones(3))
        ok = srv.restore(stamps, bkgs, fluxes=fluxes)
        assert np.isfinite(np.asarray(ok.x)).all()


def test_two_phase_compaction_with_maxiter_exhausted_lanes():
    """Lanes that run to cfg.max_iter without meeting tolerance keep
    converged=False; the tail rounds must not re-gather them at the
    expense of workable spilled lanes (and results must still equal the
    single-phase solve when spill exceeds both rounds)."""
    stamps, psf, bkgs, _ = synthetic_star_stamps(24, size=16, seed=3)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    # at max_iter=60 these lanes converge in 25..41 iterations; capping at
    # 27 exhausts the >27 majority (converged stays False, iters caps at
    # 27) while the 25-27 lanes genuinely converge
    cfg = _cfg(max_iter=27, stop_criterion=3, tol_convergence=1e-4,
               dtype='float64')
    single = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                            sat_level=65000.0)
    it_single = np.asarray(single.iters)
    assert (it_single >= cfg.max_iter).any()      # capped/exhausted lanes
    assert (it_single < cfg.max_iter).any()       # early-converged lanes
    cap = 10   # every lane spills phase 1
    for tail in (8, 2):   # 2 => spill exceeds both rounds, catch-up works
        two = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                             sat_level=65000.0, phase1_iters=cap,
                             tail_bucket=tail)
        np.testing.assert_array_equal(np.asarray(two.iters), it_single)
        np.testing.assert_allclose(np.asarray(two.x), np.asarray(single.x),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f'tail={tail}')


def test_suggest_compaction_headroom_and_integration():
    """suggest_compaction picks (p1, tail) whose two rounds clear the
    unconverged count with margin; the suggested config reproduces the
    single-phase solve exactly, and the bench-scale distribution recovers
    the hand-tuned neighborhood."""
    import pytest
    from tpu_sgp.parallel.batch import suggest_compaction
    stamps, psf, bkgs, _ = synthetic_star_stamps(24, size=16, seed=3)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=60, stop_criterion=3, tol_convergence=1e-4,
               dtype='float64')
    single = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                            sat_level=65000.0)
    it = np.asarray(single.iters)
    sug = suggest_compaction(it)
    p1, tb = sug['phase1_iters'], sug['tail_bucket']
    assert p1 is not None and it.min() <= p1 <= it.max()
    # safety rule: two rounds clear the unconverged count with margin
    assert 2 * tb >= np.ceil((it > p1).sum() * 1.25)
    two = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                         sat_level=65000.0, **sug)
    np.testing.assert_array_equal(np.asarray(two.iters), it)
    np.testing.assert_allclose(np.asarray(two.x), np.asarray(single.x),
                               rtol=1e-6, atol=1e-6)
    # bench-scale synthetic distribution (median 25, max ~44): the
    # suggestion must land near the hand-tuned (26, 2048) optimum and
    # never violate the headroom rule at B=12288
    rng = np.random.default_rng(0)
    pilot = np.clip(rng.normal(26, 4, size=2048).round(), 18, 44)
    sug_b = suggest_compaction(pilot, batch_size=12288)
    p1b, tbb = sug_b['phase1_iters'], sug_b['tail_bucket']
    unconv = int(np.ceil((pilot > p1b).sum() * (12288 / 2048) * 1.25))
    assert 2 * tbb >= unconv
    assert 20 <= p1b <= 32 and tbb <= 4096
    # degenerate inputs
    with pytest.raises(ValueError, match='pilot'):
        suggest_compaction(np.array([]))
    flat = suggest_compaction(np.full(64, 7))   # everything converges at 7
    assert flat['phase1_iters'] in (None, 7)


def test_session_u16_packed_ingest_exact():
    """uint16 requests take the single-buffer packed path (stamp block u16
    + f32 sidecar bit-cast as u16 pairs) and must be EXACT vs the same
    request in f32: integers <= 65535 are f32-representable and the
    sidecar round-trips bit-for-bit."""
    import warnings

    from tpu_sgp.parallel.session import RestorationSession

    stamps, psf, bkgs, _ = synthetic_star_stamps(5, size=16, seed=8)
    stamps_u16 = np.clip(stamps, 0, 65535).astype(np.uint16)
    fluxes = (stamps_u16.astype(np.float32).sum(axis=(1, 2))
              - 256 * bkgs.astype(np.float32))
    cfg = _cfg(max_iter=6, dtype='float32', track_discr=False)
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16),
                              ingest_dtypes=('float32', 'uint16'))
    sess.warmup(buckets=(8,))
    assert (8, 'packed') in sess._warmed and (8, 'packed-u16') in sess._warmed
    with warnings.catch_warnings():
        warnings.simplefilter('error')  # both kinds are warmed: no warning
        res_f32 = sess.restore(stamps_u16.astype(np.float32), bkgs,
                               fluxes=fluxes)
        res_u16 = sess.restore(stamps_u16, bkgs, fluxes=fluxes)
    np.testing.assert_array_equal(res_u16.x, res_f32.x)
    np.testing.assert_array_equal(res_u16.iters, res_f32.iters)
    # upload-byte accounting: the u16 request buffer is half the f32 one
    pk_u16, kind_u = sess._pack_request(stamps_u16, bkgs, fluxes, None)
    pk_f32, kind_f = sess._pack_request(stamps_u16.astype(np.float32),
                                        bkgs, fluxes, None)
    assert (kind_u, kind_f) == ('packed-u16', 'packed')
    assert pk_u16.nbytes * 2 < pk_f32.nbytes * 1.03


def test_session_u16_egress_quantization_bound():
    """egress_dtype='uint16' ships restored stamps as per-lane affine u16
    (half the download bytes); the dequantized result must match the f32
    egress within the documented max(x)/131070 per-pixel bound, and the
    sidecar scalars (iters/fv/beta/scaling) must round-trip bit-exactly
    through the u16 bit-cast."""
    import warnings

    from tpu_sgp.parallel.session import RestorationSession

    stamps, psf, bkgs, _ = synthetic_star_stamps(5, size=16, seed=8)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=6, dtype='float32', track_discr=False)
    s32 = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    s16 = RestorationSession(psf, cfg, stamp_shape=(16, 16),
                             egress_dtype='uint16')
    s32.warmup(buckets=(8,))
    s16.warmup(buckets=(8,))
    with warnings.catch_warnings():
        warnings.simplefilter('error')  # warmed: no bucket warnings
        r32 = s32.restore(stamps.astype(np.float32), bkgs, fluxes=fluxes)
        r16 = s16.restore(stamps.astype(np.float32), bkgs, fluxes=fluxes)
    bound = r32.x.reshape(5, -1).max(axis=1) / 131070.0 + 1e-6
    err = np.abs(r16.x - r32.x).reshape(5, -1).max(axis=1)
    assert (err <= bound).all(), (err, bound)
    np.testing.assert_array_equal(r16.iters, r32.iters)
    np.testing.assert_array_equal(r16.fv, r32.fv)
    np.testing.assert_array_equal(r16.beta, r32.beta)
    np.testing.assert_array_equal(r16.scaling, r32.scaling)
    # download-byte accounting: the u16 result buffer is ~half the f32 one
    out16 = s16._packed_prog(8, 'packed')(
        s16._pack_request(stamps.astype(np.float32)[[0] * 8],
                          np.repeat(bkgs[:1], 8),
                          np.repeat(fluxes[:1], 8), None)[0])
    out32 = s32._packed_prog(8, 'packed')(
        s32._pack_request(stamps.astype(np.float32)[[0] * 8],
                          np.repeat(bkgs[:1], 8),
                          np.repeat(fluxes[:1], 8), None)[0])
    assert np.asarray(out16).nbytes * 2 < np.asarray(out32).nbytes * 1.1
    try:
        RestorationSession(psf, cfg, egress_dtype='int8')
    except ValueError:
        pass
    else:
        raise AssertionError('bad egress_dtype must raise')


def test_microbatch_watchdog_and_drain():
    """Leak watchdog (round-3 verdict: turn the NOTES.md axon-leak advice
    into enforceable library behavior): after max_batches_per_process
    device calls the server flags recycle_recommended exactly once via
    on_limit; drain() blocks until the queue is served."""
    from tpu_sgp.parallel.session import MicroBatchServer, RestorationSession

    stamps, psf, bkgs, _ = synthetic_star_stamps(4, size=16, seed=9)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = _cfg(max_iter=4, dtype='float64')
    sess = RestorationSession(psf, cfg, stamp_shape=(16, 16))
    sess.warmup(buckets=(4,))
    hits = []
    with MicroBatchServer(sess, max_batch=2, max_delay_s=0.0,
                          max_batches_per_process=2,
                          on_limit=hits.append) as srv:
        assert srv.process_rss_mb() > 10.0     # /proc path works here
        futs = [srv.submit(stamps[i:i + 1], bkgs[i:i + 1],
                           fluxes=fluxes[i:i + 1]) for i in range(4)]
        assert srv.drain(timeout=120.0)
        for f in futs:
            assert np.isfinite(f.result().x).all()
        assert srv.batches_served >= 2
        assert srv.recycle_recommended
        assert len(hits) == 1                  # fires once per crossing
        assert hits[0]['batches_served'] >= 2
        # serving continues after the recommendation
        assert np.isfinite(srv.restore(stamps[:1], bkgs[:1],
                                       fluxes=fluxes[:1]).x).all()
        assert len(hits) == 1
