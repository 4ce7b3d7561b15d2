"""One-off chip scan of convergence-compaction settings (p1, tail_bucket)
for the bench's KL and beta stamp batches with the round-4 guided-secant
projection. Results feed the constants in bench.py — this script is a
methodology record, not part of the shipping API.

Usage: python examples/scan_compaction.py [kl|beta] [repeats]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'kl'
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from tpu_sgp import SGPConfig
    from tpu_sgp.parallel.batch import restore_stamps
    from tpu_sgp.simulate import synthetic_star_stamps

    B, size = 12288, 31
    np_stamps, np_psf, np_bkgs, _ = synthetic_star_stamps(B, size=size,
                                                          seed=42)
    # bench.py's flux convention: background-subtracted sum (the catalog-
    # flux analog), NOT the generator's noise-free truth fluxes
    np_fluxes = np_stamps.sum(axis=(1, 2)) - size * size * np_bkgs
    stamps = jax.device_put(jnp.asarray(np_stamps, jnp.float32))
    psf = jax.device_put(jnp.asarray(np_psf, jnp.float32))
    bkgs = jax.device_put(jnp.asarray(np_bkgs, jnp.float32))
    fluxes = jax.device_put(jnp.asarray(np_fluxes, jnp.float32))

    if which == 'kl':
        cfg = SGPConfig(max_iter=100, stop_criterion=3, tol_convergence=1e-4,
                        init_recon=2, proj_type=1, has_flux=True,
                        has_sat_level=True, dtype='float32', divergence='kl',
                        track_discr=False)
        extra = {}
        grid = [(26, 2048), (25, 4096), (24, 4096), (25, 3072), (26, 3072)]
    else:
        # projection_method='section': the round-5 interleaved A/B measured
        # guided-secant 1.056x SLOWER than cold sectioning on the beta
        # batch (median of 20 pair ratios, iqr 0.028) — beta keeps the r3
        # projection, KL keeps guided-secant
        cfg = SGPConfig(max_iter=100, stop_criterion=3, tol_convergence=1e-4,
                        init_recon=2, proj_type=1, has_flux=True,
                        has_sat_level=True, dtype='float32',
                        divergence='beta', adapt_beta=True, schedule_lr=True,
                        projection_method='section', track_discr=False)
        extra = dict(beta0=1.005, lr0=1e-3)
        # the round-5 iteration census put unconv@28 at ~2350 of 12288 —
        # over the 2048 tail, so (28, 2048) always pays the second tail
        # round; probe higher p1 (shrinks the tail population) and wider
        # single-round tails alongside the r3-era setting
        grid = [(28, 2048), (29, 2048), (30, 2048), (28, 3072),
                (30, 1024), (26, 2048), (27, 3072)]

    for p1, tail in grid:
        fused = jax.jit(lambda s, p, b, f, p1=p1, tail=tail: restore_stamps(
            s, p, b, cfg, fluxes=f, sat_level=65000.0, flatten=True,
            phase1_iters=p1, tail_bucket=tail, **extra))
        res = fused(stamps, psf, bkgs, fluxes)
        np.asarray(res.iters)  # sync (block_until_ready no-ops on axon)
        walls = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            r = fused(stamps, psf, bkgs, fluxes)
            np.asarray(r.iters)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        iters = np.asarray(res.iters)
        unconv = int((iters >= p1).sum())
        print(f'{which} p1={p1} tail={tail}: {B / wall:,.0f} stamps/s '
              f'(wall {wall * 1e3:.1f} ms, unconverged@p1={unconv})',
              flush=True)


if __name__ == '__main__':
    main()
