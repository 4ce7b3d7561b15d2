"""Distributed halo-sharded solve == single-device linear solve (8 CPU
devices, f64). This validates the halo exchange, the collective reductions,
and the sharded flux projection end to end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sgp import SGPConfig
from tpu_sgp.ops.psf_operator import make_operator
from tpu_sgp.parallel.distributed import make_image_mesh, solve_distributed
from tpu_sgp.simulate import synthetic_star_field
from tpu_sgp.solvers.sgp import solve


def _problem(h=96, w=96, n_stars=12, seed=5):
    img, psf, _ = synthetic_star_field(h, w, n_stars=n_stars, seed=seed,
                                       psf_size=15, fwhm=2.2)
    return img, psf


def _single(img, psf, cfg, **kw):
    z = jnp.zeros(img.shape, cfg.jnp_dtype)
    return solve(jnp.asarray(img, cfg.jnp_dtype),
                 jnp.asarray(psf, cfg.jnp_dtype),
                 jnp.full(img.shape, 150.0, cfg.jnp_dtype), z,
                 kw.get('flux', 0.0), z, kw.get('beta0', 1.0), 1e-3,
                 kw.get('sat', 0.0), cfg)


def test_halo_operator_matches_linear():
    """A/AT through the halo-sharded operator equal the linear operator."""
    img, psf = _problem()
    mesh = make_image_mesh(devices=jax.devices()[:8])
    A_lin, AT_lin = make_operator(jnp.asarray(psf), img.shape, 'linear')
    want_a = np.asarray(A_lin(jnp.asarray(img)))
    want_at = np.asarray(AT_lin(jnp.asarray(img)))

    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpu_sgp.ops.psf_operator import make_halo_operator

    def apply_dist(x):
        def f(x_local, psf_r):
            A, AT = make_halo_operator(psf_r, tuple(mesh.axis_names))
            return A(x_local), AT(x_local)
        fn = jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(P('ty', 'tx'), P()),
            out_specs=(P('ty', 'tx'), P('ty', 'tx')), check_vma=False))
        return fn(jax.device_put(jnp.asarray(img),
                                 NamedSharding(mesh, P('ty', 'tx'))),
                  jnp.asarray(psf))

    got_a, got_at = apply_dist(img)
    np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=1e-10,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_at), want_at, rtol=1e-10,
                               atol=1e-8)


def test_distributed_solve_matches_single_device_kl():
    img, psf = _problem()
    cfg = SGPConfig(max_iter=10, stop_criterion=1, init_recon=2,
                    proj_type=1, has_flux=True, has_sat_level=True,
                    dtype='float64', operator='linear')
    flux = float(img.sum() - 150.0 * img.size)
    single = _single(img, psf, cfg, flux=flux, sat=65000.0)

    mesh = make_image_mesh(devices=jax.devices()[:8])
    dist = solve_distributed(img, psf, 150.0, cfg, mesh, flux=flux,
                             sat_level=65000.0)
    np.testing.assert_allclose(np.asarray(dist.x), np.asarray(single.x),
                               rtol=1e-9, atol=1e-9)
    assert int(dist.iters) == int(single.iters)
    np.testing.assert_allclose(float(dist.fv), float(single.fv), rtol=1e-10)


def test_distributed_errflag_without_obj_raises():
    """errflag=True with no ground truth must raise like api.sgp does
    (regression: obj defaulted to zeros -> obj_sum 0 -> all-inf err
    series); and the jitted runner is cached per (cfg, mesh) instead of
    re-traced per call."""
    from tpu_sgp.parallel.distributed import (_distributed_run,
                                              solve_distributed_batch)
    img, psf = _problem(h=64, w=64, n_stars=4, seed=3)
    cfg = SGPConfig(max_iter=4, stop_criterion=1, init_recon=2,
                    dtype='float64', operator='linear', errflag=True)
    mesh = make_image_mesh(devices=jax.devices()[:8])
    with pytest.raises(ValueError, match='errflag'):
        solve_distributed(img, psf, 150.0, cfg, mesh)
    from tpu_sgp.parallel.distributed import make_batch_image_mesh
    mesh3 = make_batch_image_mesh(devices=jax.devices()[:8])
    with pytest.raises(ValueError, match='errflag'):
        solve_distributed_batch(img[None], psf, 150.0, cfg, mesh3)
    # runner cache: same (cfg, mesh) -> the SAME jitted callable
    cfg2 = cfg.replace(errflag=False, operator='halo',
                       axis_names=tuple(mesh.axis_names))
    assert _distributed_run(cfg2, mesh) is _distributed_run(cfg2, mesh)


def test_distributed_solve_matches_single_device_beta_early_stop():
    img, psf = _problem(h=64, w=64, n_stars=6, seed=7)
    cfg = SGPConfig(max_iter=80, stop_criterion=3, tol_convergence=1e-4,
                    init_recon=2, proj_type=1, has_flux=False,
                    has_sat_level=False, divergence='beta', adapt_beta=True,
                    schedule_lr=True, dtype='float64', operator='linear')
    single = _single(img, psf, cfg, beta0=1.01)

    mesh = make_image_mesh(devices=jax.devices()[:8])
    dist = solve_distributed(img, psf, 150.0, cfg, mesh, beta0=1.01)
    assert int(dist.iters) == int(single.iters)
    assert int(dist.iters) < 80
    # collective reduction order can flip a bisection branch in the flux
    # projection: agreement is to solver precision, not bitwise
    np.testing.assert_allclose(np.asarray(dist.x), np.asarray(single.x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(dist.beta), float(single.beta),
                               rtol=1e-10)


def test_distributed_batch_solve_matches_single_device():
    """3-D (batch, ty, tx) mesh: per-image results and iteration schedules
    equal the single-device linear solves."""
    from tpu_sgp.parallel.distributed import (make_batch_image_mesh,
                                              solve_distributed_batch)
    imgs, psfs = [], None
    for seed in (5, 9):
        img, psf = _problem(h=64, w=64, n_stars=8, seed=seed)
        imgs.append(img)
        psfs = psf  # shared PSF
    imgs = np.stack(imgs)
    cfg = SGPConfig(max_iter=40, stop_criterion=3, tol_convergence=1e-4,
                    init_recon=2, proj_type=1, has_flux=True,
                    has_sat_level=True, dtype='float64', operator='linear')
    fluxes = np.array([float(im.sum() - 150.0 * im.size) for im in imgs])

    singles = [_single(im, psfs, cfg, flux=fl, sat=65000.0)
               for im, fl in zip(imgs, fluxes)]

    mesh = make_batch_image_mesh(batch=2, devices=jax.devices()[:8])
    assert dict(mesh.shape) == {'batch': 2, 'ty': 2, 'tx': 2}
    dist = solve_distributed_batch(imgs, psfs, 150.0, cfg, mesh,
                                   fluxes=fluxes, sat_level=65000.0)
    assert np.asarray(dist.x).shape == imgs.shape
    its = np.asarray(dist.iters)
    for i, single in enumerate(singles):
        assert int(its[i]) == int(single.iters), i
        np.testing.assert_allclose(np.asarray(dist.x)[i],
                                   np.asarray(single.x),
                                   rtol=1e-6, atol=1e-6)
    # the two images must follow DIFFERENT schedules for this test to bite
    assert int(singles[0].iters) != int(singles[1].iters)


def test_distributed_batch_beta_per_image_beta0():
    from tpu_sgp.parallel.distributed import (make_batch_image_mesh,
                                              solve_distributed_batch)
    img, psf = _problem(h=64, w=64, n_stars=6, seed=7)
    imgs = np.stack([img, img])
    cfg = SGPConfig(max_iter=12, stop_criterion=1, init_recon=2,
                    proj_type=1, has_flux=False, has_sat_level=False,
                    divergence='beta', adapt_beta=True, schedule_lr=True,
                    dtype='float64', operator='linear')
    mesh = make_batch_image_mesh(batch=2, devices=jax.devices()[:8])
    dist = solve_distributed_batch(imgs, psf, 150.0, cfg, mesh,
                                   beta0=np.array([1.01, 0.99]))
    betas = np.asarray(dist.beta)
    # identical images, different beta0 -> different adapted betas + results
    assert betas[0] != betas[1]
    single = _single(img, psf, cfg, beta0=1.01)
    np.testing.assert_allclose(np.asarray(dist.x)[0], np.asarray(single.x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(betas[0]), float(single.beta),
                               rtol=1e-9)


def test_halo_operator_non_square_psf_adjoint():
    """Regression: the adjoint applies the TRANSPOSED kernel, so its halo
    widths and crop must follow (kw, kh) — a forward-shaped crop silently
    corrupted AT for non-square PSFs."""
    img, _ = _problem(h=48, w=48, n_stars=6, seed=11)
    rng = np.random.default_rng(0)
    psf = np.abs(rng.standard_normal((3, 5))) + 0.1
    psf /= psf.sum()
    mesh = make_image_mesh(devices=jax.devices()[:8])
    A_lin, AT_lin = make_operator(jnp.asarray(psf), img.shape, 'linear')

    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpu_sgp.ops.psf_operator import make_halo_operator

    def f(x_local, psf_r):
        A, AT = make_halo_operator(psf_r, tuple(mesh.axis_names))
        return A(x_local), AT(x_local)

    fn = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P('ty', 'tx'), P()),
        out_specs=(P('ty', 'tx'), P('ty', 'tx')), check_vma=False))
    got_a, got_at = fn(jax.device_put(jnp.asarray(img),
                                      NamedSharding(mesh, P('ty', 'tx'))),
                       jnp.asarray(psf))
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(A_lin(jnp.asarray(img))),
                               rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_at), np.asarray(AT_lin(jnp.asarray(img))),
                               rtol=1e-10, atol=1e-8)
    # even-dimension PSFs are rejected loudly, not silently mis-cropped
    import pytest
    with pytest.raises(ValueError, match='odd'):
        make_halo_operator(jnp.ones((4, 5)) / 20.0, ('ty', 'tx'))


def test_distributed_autopad_matches_single_device_on_padded_problem():
    """Non-divisible shapes are auto-padded with background sky and cropped:
    the result equals the single-device solve of the SAME padded problem."""
    from tpu_sgp.parallel.distributed import pad_to_mesh
    img, psf = _problem(h=90, w=94, n_stars=10, seed=13)  # 2x4 mesh: 90%2=0, 94%4=2
    cfg = SGPConfig(max_iter=8, stop_criterion=1, init_recon=2,
                    proj_type=0, has_flux=False, has_sat_level=False,
                    dtype='float64', operator='linear')
    mesh = make_image_mesh(devices=jax.devices()[:8])
    dist = solve_distributed(img, psf, 150.0, cfg, mesh)
    assert np.asarray(dist.x).shape == img.shape

    bkg = jnp.full(img.shape, 150.0, jnp.float64)
    gp, bp, (hp, wp) = pad_to_mesh(jnp.asarray(img, jnp.float64), bkg, 2, 4,
                                   max(psf.shape) // 2)
    assert (hp, wp) == (90, 96)
    z = jnp.zeros((hp, wp), jnp.float64)
    single = solve(gp, jnp.asarray(psf, jnp.float64), bp, z, 0.0, z,
                   1.0, 1e-3, 0.0, cfg)
    np.testing.assert_allclose(np.asarray(dist.x),
                               np.asarray(single.x)[:90, :94],
                               rtol=1e-9, atol=1e-9)
    # padded margin reconstructs to ~source-free sky: tiny flux vs the image
    pad_flux = float(np.asarray(single.x)[:, 94:].sum())
    assert pad_flux < 1e-3 * float(np.asarray(single.x).sum())


def test_distributed_batch_autopad_batch_axis():
    """B not divisible by the batch mesh axis: lanes are repeated then
    cropped, and real-lane results are unchanged (lanes are independent)."""
    from tpu_sgp.parallel.distributed import (make_batch_image_mesh,
                                              solve_distributed_batch)
    imgs = []
    for seed in (5, 9, 11):
        img, psf = _problem(h=64, w=64, n_stars=8, seed=seed)
        imgs.append(img)
    imgs = np.stack(imgs)                      # B=3 over batch axis 2
    cfg = SGPConfig(max_iter=25, stop_criterion=3, tol_convergence=1e-4,
                    init_recon=2, proj_type=1, has_flux=True,
                    has_sat_level=True, dtype='float64', operator='linear')
    fluxes = np.array([float(im.sum() - 150.0 * im.size) for im in imgs])
    mesh = make_batch_image_mesh(batch=2, devices=jax.devices()[:8])
    dist = solve_distributed_batch(imgs, psf, 150.0, cfg, mesh,
                                   fluxes=fluxes, sat_level=65000.0)
    assert np.asarray(dist.x).shape == imgs.shape
    assert np.asarray(dist.iters).shape == (3,)
    for i in range(3):
        single = _single(imgs[i], psf, cfg, flux=float(fluxes[i]),
                         sat=65000.0)
        assert int(np.asarray(dist.iters)[i]) == int(single.iters), i
        np.testing.assert_allclose(np.asarray(dist.x)[i],
                                   np.asarray(single.x),
                                   rtol=1e-6, atol=1e-6)


def test_mesh_factorization():
    mesh = make_image_mesh(devices=jax.devices()[:8])
    assert dict(mesh.shape) in ({'ty': 2, 'tx': 4},)
    mesh6 = make_image_mesh(devices=jax.devices()[:6])
    assert mesh6.shape['ty'] * mesh6.shape['tx'] == 6
    from tpu_sgp.parallel.distributed import make_batch_image_mesh
    m8 = make_batch_image_mesh(devices=jax.devices()[:8])
    assert dict(m8.shape) == {'batch': 2, 'ty': 2, 'tx': 2}
    # prime device count: everything goes to the spatial grid
    m7 = make_batch_image_mesh(devices=jax.devices()[:7])
    assert m7.shape['batch'] == 1
    assert m7.shape['ty'] * m7.shape['tx'] == 7


def test_autopad_deviation_from_unpadded_bounded():
    """Auto-padding perturbs the global reductions with a sky margin — a
    documented approximation. This pins its magnitude vs the UNPADDED
    single-device solve (the earlier autopad tests compare against the
    padded problem, which is exact by construction)."""
    img, psf, _ = synthetic_star_field(30, 30, n_stars=4, psf_size=9,
                                       fwhm=2.0, seed=5)
    mesh = make_image_mesh(devices=jax.devices()[:8])
    cfg = SGPConfig(max_iter=80, stop_criterion=3, tol_convergence=1e-5,
                    init_recon=2, proj_type=1, has_flux=False,
                    has_sat_level=False, dtype='float64')
    dres = solve_distributed(img, psf, 150.0, cfg, mesh)
    z = jnp.zeros(img.shape)
    sres = solve(jnp.asarray(img), jnp.asarray(psf),
                 jnp.full(img.shape, 150.0), z, 0.0, z, 1.0, 1e-3, 0.0,
                 cfg.replace(operator='linear'))
    dx, sx = np.asarray(dres.x), np.asarray(sres.x)
    assert dx.shape == img.shape
    rel = np.abs(dx - sx).max() / np.abs(sx).max()
    assert rel < 1e-2, rel
    assert abs(int(dres.iters) - int(sres.iters)) <= 15


def test_gmean_under_shard_map_matches_global_mean():
    """gmean with a mesh axis: psum(total)/psum(count) over the shards must
    equal the unsharded mean (the solver's discrepancy rule divides by the
    GLOBAL pixel count)."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from tpu_sgp.ops.reduce import gmean

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), axis_names=('i',))
    x = np.arange(64.0).reshape(8, 8) + 0.25

    @partial(shard_map, mesh=mesh, in_specs=P('i', None), out_specs=P())
    def f(lx):
        return gmean(lx, axes=('i',))[None]

    got = float(np.asarray(f(jnp.asarray(x)))[0])
    assert got == pytest.approx(x.mean(), rel=1e-12)


def test_distributed_batch_optional_inputs_through_autopad():
    """x0 warm start, errflag ground truths, per-image 1-D backgrounds and
    an odd B and H/W all at once: every host-side pad branch must carry the
    optional arrays consistently with the data lanes. Exactness holds vs
    the single-device solve of the SAME padded problem (x0/objs padded with
    zeros, gn/bkg via pad_to_mesh — the entry point's own rules); the
    unpadded solve differs by the documented autopad deviation and is
    pinned separately (test_autopad_deviation_from_unpadded_bounded)."""
    from tpu_sgp.parallel.distributed import (make_batch_image_mesh,
                                              pad_to_mesh,
                                              solve_distributed_batch)
    imgs, objs = [], []
    for seed in (5, 9, 11):
        img, psf, truth = synthetic_star_field(63, 63, n_stars=6,
                                               psf_size=15, fwhm=2.2,
                                               seed=seed)
        imgs.append(img)
        objs.append(truth)
    imgs, objs = np.stack(imgs), np.stack(objs)
    bkgs = np.array([150.0, 140.0, 160.0])
    x0 = np.maximum(imgs - bkgs[:, None, None], 0.0)
    cfg = SGPConfig(max_iter=12, stop_criterion=1, init_recon=0,
                    proj_type=0, has_flux=False, has_sat_level=False,
                    dtype='float64', operator='linear', errflag=True)
    mesh = make_batch_image_mesh(batch=2, devices=jax.devices()[:8])
    dist = solve_distributed_batch(imgs, psf, bkgs, cfg, mesh, x0=x0,
                                   objs=objs)
    assert np.asarray(dist.x).shape == imgs.shape
    err = np.asarray(dist.err)
    assert err.shape[0] == 3 and np.isfinite(err[:, 1:13]).all()

    bkgs3 = np.broadcast_to(bkgs[:, None, None], imgs.shape)
    gp, bp, (hp, wp) = pad_to_mesh(imgs, bkgs3, 2, 2, max(psf.shape) // 2)
    assert (hp, wp) != (63, 63)   # the spatial pad branch really ran
    pad3 = ((0, 0), (0, hp - 63), (0, wp - 63))
    x0p, objp = np.pad(x0, pad3), np.pad(objs, pad3)
    for i in range(3):
        single = solve(jnp.asarray(gp[i]), jnp.asarray(psf),
                       jnp.asarray(bp[i]), jnp.asarray(x0p[i]), 0.0,
                       jnp.asarray(objp[i]), 1.0, 1e-3, 0.0, cfg)
        np.testing.assert_allclose(np.asarray(dist.x)[i],
                                   np.asarray(single.x)[:63, :63],
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(err[i, 1:13],
                                   np.asarray(single.err)[1:13], rtol=1e-9)


def test_distributed_batch_rejects_non_3d():
    from tpu_sgp.parallel.distributed import (make_batch_image_mesh,
                                              solve_distributed_batch)
    mesh = make_batch_image_mesh(batch=2, devices=jax.devices()[:8])
    cfg = SGPConfig(max_iter=3, dtype='float64')
    with pytest.raises(ValueError, match='B, H, W'):
        solve_distributed_batch(np.zeros((16, 16)), np.ones((5, 5)) / 25.0,
                                150.0, cfg, mesh)


def test_distributed_single_image_warm_start_and_err(rng=None):
    """solve_distributed with x0/obj: the padded optional inputs must give
    the same trajectory as the single-device solve with the same inputs."""
    from tpu_sgp.parallel.distributed import (make_image_mesh,
                                              solve_distributed)
    img, psf, truth = synthetic_star_field(60, 60, n_stars=6, psf_size=15,
                                           fwhm=2.2, seed=3)
    x0 = np.maximum(img - 150.0, 0.0)
    cfg = SGPConfig(max_iter=10, stop_criterion=1, init_recon=0,
                    proj_type=0, has_flux=False, has_sat_level=False,
                    dtype='float64', errflag=True)
    mesh = make_image_mesh(devices=jax.devices()[:8])
    dres = solve_distributed(img, psf, 150.0, cfg, mesh, x0=x0, obj=truth)
    z = jnp.zeros(img.shape)
    sres = solve(jnp.asarray(img), jnp.asarray(psf),
                 jnp.full(img.shape, 150.0), jnp.asarray(x0), 0.0,
                 jnp.asarray(truth), 1.0, 1e-3, 0.0,
                 cfg.replace(operator='linear'))
    np.testing.assert_allclose(np.asarray(dres.x), np.asarray(sres.x),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dres.err)[1:11],
                               np.asarray(sres.err)[1:11], rtol=1e-8)


def test_make_image_mesh_prime_device_count():
    mesh7 = make_image_mesh(devices=jax.devices()[:7])
    assert mesh7.shape['ty'] * mesh7.shape['tx'] == 7
    assert mesh7.shape['ty'] == 1   # prime: falls through to a 1 x n grid
