"""Checkpoint/resume: a split solve (k iters -> save -> load -> resume)
reproduces the uninterrupted solve exactly."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sgp import SGPConfig
from tpu_sgp.solvers.checkpoint import load_state, save_state
from tpu_sgp.solvers.sgp import resume_from_state, solve_with_state
from conftest import synthetic_stamp


def _args(img, psf, bkg, cfg):
    z = jnp.zeros(img.shape, cfg.jnp_dtype)
    return (jnp.asarray(img, cfg.jnp_dtype), jnp.asarray(psf, cfg.jnp_dtype),
            jnp.full(img.shape, bkg, cfg.jnp_dtype), z, 0.0, z, 1.01, 1e-3,
            0.0)


def test_resume_matches_uninterrupted(rng, tmp_path):
    img, psf, bkg, _ = synthetic_stamp(rng)
    base = dict(stop_criterion=1, init_recon=2, proj_type=1, has_flux=False,
                has_sat_level=False, dtype='float64',
                divergence='beta', adapt_beta=True, schedule_lr=True)

    full_cfg = SGPConfig(max_iter=20, **base)
    full, _ = solve_with_state(*_args(img, psf, bkg, full_cfg), full_cfg)

    half_cfg = SGPConfig(max_iter=10, **base)
    part, state = solve_with_state(*_args(img, psf, bkg, half_cfg), half_cfg)

    path = str(tmp_path / 'ckpt')
    save_state(path, state)
    restored = load_state(path)

    resumed, _ = resume_from_state(*_args(img, psf, bkg, full_cfg),
                                   restored, full_cfg)
    # The split run must land on the identical trajectory point...
    assert int(resumed.iters) == int(full.iters) == 20
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(resumed.beta), float(full.beta),
                               rtol=1e-13)
    # ...including the discrepancy history across the seam
    np.testing.assert_allclose(np.asarray(resumed.discr)[:11],
                               np.asarray(full.discr)[:11], rtol=1e-12)


def test_resume_after_early_stop_is_noop(rng):
    img, psf, bkg, _ = synthetic_stamp(rng, size=24)
    cfg = SGPConfig(max_iter=100, stop_criterion=3, tol_convergence=1e-3,
                    init_recon=2, dtype='float64', has_flux=False)
    res, state = solve_with_state(*_args(img, psf, bkg, cfg), cfg)
    assert int(res.iters) < 100
    again, _ = resume_from_state(*_args(img, psf, bkg, cfg), state, cfg)
    assert int(again.iters) == int(res.iters)
    np.testing.assert_allclose(np.asarray(again.x), np.asarray(res.x))


def test_orbax_backend_roundtrip(rng, tmp_path):
    img, psf, bkg, _ = synthetic_stamp(rng, size=16)
    cfg = SGPConfig(max_iter=4, stop_criterion=1, init_recon=2,
                    dtype='float64', has_flux=False)
    _, state = solve_with_state(*_args(img, psf, bkg, cfg), cfg)
    path = str(tmp_path / 'orbax_ckpt')
    try:
        save_state(path, state, backend='orbax')
        restored = load_state(path, backend='orbax')
    except Exception as exc:  # pragma: no cover - orbax env quirks
        import pytest
        pytest.skip(f'orbax unavailable: {exc}')
    for a, b in zip(state, restored):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resume_refuses_enabling_untracked_series(rng):
    """A checkpoint created with track_discr=False has no history; resuming
    with the flag on must raise, not return a bogus (1,) series."""
    import pytest

    img, psf, bkg, _ = synthetic_stamp(rng, size=16)
    cfg = SGPConfig(max_iter=3, stop_criterion=1, init_recon=2,
                    proj_type=0, has_flux=False, has_sat_level=False,
                    dtype='float64', track_discr=False)
    args = _args(img, psf, bkg, cfg)
    _, st = solve_with_state(*args, cfg)
    with pytest.raises(ValueError, match='without it'):
        resume_from_state(*args, st, cfg.replace(track_discr=True,
                                                 max_iter=6))


def test_load_pre_round3_checkpoint_defaults_new_fields(tmp_path):
    """Checkpoints saved before the warm-projection fields existed must
    still load (the carry cold-starts as invalid)."""
    import numpy as np

    from tpu_sgp.solvers.checkpoint import (_FIELDS, load_state_npz,
                                            save_state_npz)
    from tpu_sgp.solvers.sgp import SGPState

    state = SGPState(*[np.zeros(2) for _ in _FIELDS])
    p = str(tmp_path / 'old.npz')
    save_state_npz(p, state)
    # strip the new fields to simulate an old checkpoint
    with np.load(p) as z:
        old = {k: z[k] for k in z.files
               if k not in ('lam_dual', 'dlam_dual')}
    np.savez(p, **old)
    st = load_state_npz(p)
    assert np.isnan(np.asarray(st.lam_dual)).all()
    assert np.isposinf(np.asarray(st.dlam_dual)).all()


def test_resume_max_iter_below_checkpoint_buffers_raises(rng):
    """Shrinking max_iter below a checkpoint's tracked-series length would
    have to drop recorded history — refuse instead of truncating."""
    img, psf, bkg, _ = synthetic_stamp(rng, size=24)
    cfg10 = SGPConfig(max_iter=10, stop_criterion=1, init_recon=2,
                      dtype='float64', has_flux=False)
    _, state = solve_with_state(*_args(img, psf, bkg, cfg10), cfg10)
    cfg5 = SGPConfig(max_iter=5, stop_criterion=1, init_recon=2,
                     dtype='float64', has_flux=False)
    with pytest.raises(ValueError, match='max_iter smaller'):
        resume_from_state(*_args(img, psf, bkg, cfg5), state, cfg5)


def test_checkpoint_unknown_backend_and_missing_field(tmp_path):
    import numpy as np

    from tpu_sgp.solvers.checkpoint import (_FIELDS, load_state,
                                            load_state_npz, save_state,
                                            save_state_npz)
    from tpu_sgp.solvers.sgp import SGPState

    state = SGPState(*[np.zeros(2) for _ in _FIELDS])
    with pytest.raises(ValueError, match='backend'):
        save_state(str(tmp_path / 'x'), state, backend='pickle')
    with pytest.raises(ValueError, match='backend'):
        load_state(str(tmp_path / 'x'), backend='pickle')
    # a missing CORE field (no default) must be a loud KeyError, not a
    # silently zero-filled state
    p = str(tmp_path / 'broken.npz')
    save_state_npz(p, state)
    with np.load(p) as z:
        partial = {k: z[k] for k in z.files if k != 'fv'}
    np.savez(p, **partial)
    with pytest.raises(KeyError, match='fv'):
        load_state_npz(p)


def test_pre_round3_batched_checkpoint_resumes_under_vmap(rng, tmp_path):
    """The backfilled warm-projection fields must inherit the checkpoint's
    batch shape: a BATCHED checkpoint (vmapped solve, (B,)-leading leaves)
    saved before lam_dual/dlam_dual existed would otherwise reload with
    0-d scalars in those slots and break the vmapped resume."""
    import jax

    from tpu_sgp.solvers.checkpoint import load_state_npz, save_state_npz

    B = 3
    imgs, psfs, bkgs = [], [], []
    for _ in range(B):
        img, psf, bkg, _ = synthetic_stamp(rng, size=24)
        imgs.append(img); psfs.append(psf); bkgs.append(np.full(img.shape,
                                                                bkg))
    base = dict(stop_criterion=1, init_recon=2, has_flux=False,
                dtype='float64')
    dt = jnp.float64
    z = jnp.zeros((B,) + imgs[0].shape, dt)
    args = (jnp.asarray(np.stack(imgs), dt), jnp.asarray(np.stack(psfs), dt),
            jnp.asarray(np.stack(bkgs), dt), z, jnp.zeros(B, dt), z,
            jnp.full(B, 1.01, dt), jnp.full(B, 1e-3, dt), jnp.zeros(B, dt))

    full_cfg = SGPConfig(max_iter=14, **base)
    vsolve = jax.vmap(solve_with_state, in_axes=(0,) * 9 + (None,))
    full, _ = vsolve(*args, full_cfg)

    half_cfg = SGPConfig(max_iter=7, **base)
    vhalf = jax.vmap(solve_with_state, in_axes=(0,) * 9 + (None,))
    _, state = vhalf(*args, half_cfg)

    p = str(tmp_path / 'batched.npz')
    save_state_npz(p, state)
    with np.load(p) as zf:
        old = {k: zf[k] for k in zf.files
               if k not in ('lam_dual', 'dlam_dual')}
    np.savez(p, **old)
    restored = load_state_npz(p)
    assert np.shape(restored.lam_dual) == (B,)
    assert np.shape(restored.dlam_dual) == (B,)

    vres = jax.vmap(resume_from_state, in_axes=(0,) * 10 + (None,))
    resumed, _ = vres(*args, restored, full_cfg)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               rtol=1e-12, atol=1e-12)


def test_distributed_resume_matches_uninterrupted(tmp_path):
    """Round-3 verdict item 5: checkpoint/resume for SHARDED solves. A
    2-D-mesh whole-image solve split at iteration 6 (save -> load ->
    resume on the same virtual mesh) must land on the uninterrupted
    trajectory exactly, including the sharded image leaves."""
    import jax

    from tpu_sgp.parallel.distributed import (make_image_mesh,
                                              resume_distributed,
                                              solve_distributed)
    from tpu_sgp.simulate import synthetic_star_field

    img, psf, _ = synthetic_star_field(64, 64, n_stars=8, seed=11,
                                       psf_size=15, fwhm=2.2)
    mesh = make_image_mesh(devices=jax.devices()[:8])
    base = dict(stop_criterion=1, init_recon=2, proj_type=1,
                has_flux=False, has_sat_level=False, dtype='float64')
    kw = dict(bkg=150.0, beta0=1.0)

    full = solve_distributed(img, psf, 150.0, SGPConfig(max_iter=12, **base),
                             mesh)
    part, state = solve_distributed(img, psf, 150.0,
                                    SGPConfig(max_iter=6, **base), mesh,
                                    return_state=True)
    assert int(part.iters) == 6
    path = str(tmp_path / 'dist_ckpt')
    save_state(path, state)                      # gathers sharded leaves
    restored = load_state(path)

    resumed, _ = resume_distributed(img, psf, 150.0, restored,
                                    SGPConfig(max_iter=12, **base), mesh)
    assert int(resumed.iters) == int(full.iters) == 12
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(resumed.discr),
                               np.asarray(full.discr), rtol=1e-12)

    # geometry guard: a mismatched image must be refused loudly
    import pytest
    with pytest.raises(ValueError, match='pad'):
        resume_distributed(img[:32, :32], psf, 150.0, restored,
                           SGPConfig(max_iter=12, **base), mesh)


def test_distributed_batch_resume_matches_uninterrupted(tmp_path):
    """The 3-D (batch, ty, tx) mode: per-image iteration schedules (beta
    divergence, early stop) must survive a save/load/resume seam."""
    import jax

    from tpu_sgp.parallel.distributed import (make_batch_image_mesh,
                                              resume_distributed_batch,
                                              solve_distributed_batch)
    from tpu_sgp.simulate import synthetic_star_field

    gns = []
    for seed in (3, 4, 5):
        img, psf, _ = synthetic_star_field(48, 48, n_stars=6, seed=seed,
                                           psf_size=15, fwhm=2.2)
        gns.append(img)
    gns = np.stack(gns)
    mesh = make_batch_image_mesh(batch=2, devices=jax.devices()[:8])
    base = dict(stop_criterion=1, init_recon=2, proj_type=1,
                has_flux=False, has_sat_level=False, dtype='float64',
                divergence='beta', adapt_beta=True, schedule_lr=True)

    full = solve_distributed_batch(gns, psf, 150.0,
                                   SGPConfig(max_iter=10, **base), mesh,
                                   beta0=np.array([1.0, 1.01, 0.99]))
    part, state = solve_distributed_batch(
        gns, psf, 150.0, SGPConfig(max_iter=5, **base), mesh,
        beta0=np.array([1.0, 1.01, 0.99]), return_state=True)
    path = str(tmp_path / 'dist_batch_ckpt')
    save_state(path, state)
    restored = load_state(path)

    resumed, _ = resume_distributed_batch(
        gns, psf, 150.0, restored, SGPConfig(max_iter=10, **base), mesh,
        beta0=np.array([1.0, 1.01, 0.99]))
    np.testing.assert_array_equal(np.asarray(resumed.iters),
                                  np.asarray(full.iters))
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(resumed.beta),
                               np.asarray(full.beta), rtol=1e-13)
