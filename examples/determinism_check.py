"""Two-process fresh-compile determinism check for f32 whole-frame stopping.

Round-3 verdict wart: the 410x410 crit-3 iteration count swung 51-74
run-to-run because stop rules 2/3 compared f32-accumulated scalars (whose
reduction order XLA's compile-dependent tiling could reshuffle) against
1e-5 tolerances. `SGPConfig.stable_sums='auto'` now fixes the summation
order with a compensated pairwise tree for f32 single-image solves.

This script proves the fix where the test suite (CPU/f64) cannot: on the
real TPU backend, with the persistent compilation cache DISABLED so each
process compiles independently. Run it twice (the __main__ below does) and
compare the printed iteration counts.

Usage:  python examples/determinism_check.py            # orchestrates 2 runs
        python examples/determinism_check.py --solo     # one solve, print iters
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def solo() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_sgp import SGPConfig
    from tpu_sgp.simulate import synthetic_star_field
    from tpu_sgp.solvers.sgp import solve

    img, psf, _ = synthetic_star_field(410, 410, n_stars=60, psf_size=31,
                                       fwhm=3.0, seed=7)
    cfg = SGPConfig(max_iter=500, stop_criterion=3, tol_convergence=1e-5,
                    init_recon=2, proj_type=1, has_flux=False,
                    has_sat_level=False, dtype='float32', track_discr=False,
                    warm_projection=True)
    dt = jnp.float32
    gn = jax.device_put(jnp.asarray(img, dt))
    psf_d = jax.device_put(jnp.asarray(psf, dt))
    bkg = jnp.full(img.shape, 150.0, dt)
    z = jnp.zeros(img.shape, dt)
    res = solve(gn, psf_d, bkg, z, 0.0, z, 1.0, 1e-3, 0.0, cfg)
    iters = int(np.asarray(res.iters))
    fv = float(np.asarray(res.fv))
    print(f'DETERMINISM iters={iters} fv={fv:.9e}')


def orchestrate() -> int:
    env = dict(os.environ)
    # independent compiles: no persistent cache reuse between the two runs
    env['JAX_ENABLE_COMPILATION_CACHE'] = 'false'
    env['TPU_SGP_NO_COMPILE_CACHE'] = '1'
    lines = []
    for i in (1, 2):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--solo'],
            env=env, capture_output=True, text=True, cwd='/root/repo')
        marker = [l for l in out.stdout.splitlines()
                  if l.startswith('DETERMINISM')]
        if not marker:
            print(f'run {i} FAILED:\n{out.stdout}\n{out.stderr[-2000:]}')
            return 1
        print(f'run {i}: {marker[0]}')
        lines.append(marker[0])
    if lines[0] == lines[1]:
        print('OK: independently-compiled runs agree (iters + fv identical)')
        return 0
    print('MISMATCH between independently-compiled runs')
    return 2


if __name__ == '__main__':
    if '--solo' in sys.argv:
        solo()
    else:
        sys.exit(orchestrate())
