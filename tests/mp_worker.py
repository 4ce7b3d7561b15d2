"""Worker for the 2-process CPU multi-process integration test.

Launched twice by tests/test_multiprocess.py (process_id 0 and 1), each
with 4 virtual CPU devices. Joins the cluster via
tpu_sgp.parallel.multiprocess.init_distributed, builds the
batch-on-DCN / spatial-on-ICI (2, 2, 2) global mesh, runs the distributed
batched solve, and checks its LOCAL shards against an in-process
single-device reference (each image solved with the 'linear' operator —
the semantics the halo operator reproduces exactly).
"""
import os
import sys

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
os.environ['TPU_SGP_NO_COMPILE_CACHE'] = '1'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

    from tpu_sgp.parallel.multiprocess import (global_device_grid,
                                               init_distributed,
                                               make_multiprocess_mesh)
    init_distributed(coordinator_address=f'localhost:{port}',
                     num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    # placement rule: the leading (batch) axis must cross processes, the
    # spatial axes must stay process-local
    grid = global_device_grid((2, 2))
    for p in range(2):
        procs = {d.process_index for d in grid[p].ravel()}
        assert procs == {p}, ('spatial axes leaked across processes', procs)

    import jax.numpy as jnp
    import numpy as np
    from tpu_sgp import SGPConfig
    from tpu_sgp.parallel.distributed import solve_distributed_batch
    from tpu_sgp.simulate import synthetic_star_field
    from tpu_sgp.solvers.sgp import solve

    mesh = make_multiprocess_mesh((2, 2))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {'batch': 2, 'ty': 2, 'tx': 2}

    imgs, psf = [], None
    for i in range(4):
        img, psf, _ = synthetic_star_field(32, 32, n_stars=4, psf_size=9,
                                           fwhm=2.0, seed=10 + i)
        imgs.append(img)
    imgs = np.stack(imgs)

    cfg = SGPConfig(max_iter=5, stop_criterion=1, init_recon=2, proj_type=1,
                    has_flux=False, has_sat_level=False, dtype='float64')
    res = solve_distributed_batch(imgs, psf, 150.0, cfg, mesh)

    # in-process single-device reference, linear operator
    cfg_lin = cfg.replace(operator='linear')
    z = jnp.zeros((32, 32), jnp.float64)
    bkg = jnp.full((32, 32), 150.0, jnp.float64)
    want = np.stack([
        np.asarray(solve(jnp.asarray(imgs[i], jnp.float64),
                         jnp.asarray(psf, jnp.float64), bkg, z, 0.0, z,
                         1.0, 1e-3, 0.0, cfg_lin).x)
        for i in range(4)])

    checked = 0
    for shard in res.x.addressable_shards:
        got = np.asarray(shard.data)
        np.testing.assert_allclose(got, want[shard.index], rtol=1e-9,
                                   atol=1e-9)
        checked += 1
    assert checked > 0
    print(f'[{pid}] OK: {checked} local shards match the single-device '
          f'reference', flush=True)


if __name__ == '__main__':
    main()
