"""Fresh-compile determinism check for f32 whole-frame stopping.

Round-3 verdict wart: the 410x410 crit-3 iteration count swung 51-74
run-to-run because stop rules 2/3 compared f32-accumulated scalars (whose
reduction order XLA's compile-dependent tiling could reshuffle) against
1e-5 tolerances. `SGPConfig.stable_sums='auto'` now fixes the summation
order with a compensated pairwise tree for f32 single-image solves.

This script proves the fix where the test suite (CPU/f64) cannot: on the
real TPU backend, with the persistent compilation cache DISABLED so each
process compiles independently, and with a TILING-RELEVANT XLA flag varied
between the two compiles (two sequential same-flag compiles on one host
are themselves deterministic, so same-flag agreement alone proves nothing
— round-4 advisor finding). Each arm therefore runs:

  run A: default flags          run B: --xla_tpu_scoped_vmem_limit_kib
                                       (perturbs fusion/tiling decisions)

  * stable_sums=True  arm: iteration counts MUST agree across A/B.
  * stable_sums=False arm: the negative control — if its counts differ,
    the flag perturbation demonstrably changed the reduction order and a
    pass in the stable arm is meaningful; if they agree, the control is
    INCONCLUSIVE for this flag (reported as such, exit still keyed to the
    stable arm, but the proof is weaker).

Usage:  python examples/determinism_check.py             # orchestrates 4 runs
        python examples/determinism_check.py --solo [--unstable]
"""
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Perturbs XLA's scoped-VMEM budget, which shifts fusion/tiling choices
# (and therefore f32 reduction order) without changing any math.
_TILING_FLAG = '--xla_tpu_scoped_vmem_limit_kib=8192'


def solo(stable: bool) -> None:
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
                    warm_projection=True,
                    stable_sums=(True if stable else False))
    dt = jnp.float32
    gn = jax.device_put(jnp.asarray(img, dt))
    psf_d = jax.device_put(jnp.asarray(psf, dt))
    bkg = jnp.full(img.shape, 150.0, dt)
    z = jnp.zeros(img.shape, dt)
    res = solve(gn, psf_d, bkg, z, 0.0, z, 1.0, 1e-3, 0.0, cfg)
    iters = int(np.asarray(res.iters))
    fv = float(np.asarray(res.fv))
    print(f'DETERMINISM stable={stable} iters={iters} fv={fv:.9e}')


def _run_solo(stable: bool, extra_xla: str) -> str | None:
    env = dict(os.environ)
    # independent compiles: no persistent cache reuse between runs
    env['JAX_ENABLE_COMPILATION_CACHE'] = 'false'
    env['TPU_SGP_NO_COMPILE_CACHE'] = '1'
    if extra_xla:
        env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') + ' ' + extra_xla
                            ).strip()
    args = [sys.executable, os.path.abspath(__file__), '--solo']
    if not stable:
        args.append('--unstable')
    out = subprocess.run(args, env=env, capture_output=True, text=True,
                         cwd=_REPO)
    marker = [l for l in out.stdout.splitlines()
              if l.startswith('DETERMINISM')]
    if not marker:
        print(f'solo run FAILED (stable={stable}, flags={extra_xla!r}):\n'
              f'{out.stdout}\n{out.stderr[-2000:]}')
        return None
    return marker[0]


def orchestrate() -> int:
    results = {}
    for stable in (True, False):
        pair = []
        for flags in ('', _TILING_FLAG):
            line = _run_solo(stable, flags)
            if line is None:
                return 1
            print(f'stable={stable} flags={flags or "(default)"}: {line}')
            pair.append(line)
        results[stable] = pair[0] == pair[1]

    if results[False]:
        print('NEGATIVE CONTROL INCONCLUSIVE: stable_sums=False agreed '
              f'across {_TILING_FLAG} — the flag did not perturb this '
              'reduction order; the stable-arm pass below is necessary '
              'but weaker evidence')
    else:
        print('negative control OK: stable_sums=False DIFFERS across the '
              'tiling flag (the perturbation is real)')
    if results[True]:
        print('OK: stable_sums=True runs agree across independent compiles '
              'AND the tiling-flag perturbation')
        return 0
    print('MISMATCH: stable_sums=True differs between independently-'
          'compiled runs')
    return 2


if __name__ == '__main__':
    if '--solo' in sys.argv:
        solo(stable='--unstable' not in sys.argv)
    else:
        sys.exit(orchestrate())
