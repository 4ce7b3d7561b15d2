"""Experimental whole-solver Pallas kernel vs the general solver
(interpret mode on CPU; hardware compile is blocked by a Mosaic ICE —
see the module docstring and NOTES.md)."""
import numpy as np

from tpu_sgp import SGPConfig
from tpu_sgp.parallel.batch import restore_stamps
from tpu_sgp.experimental.pallas_batch import solve_stamps_pallas
from tpu_sgp.simulate import synthetic_star_stamps


def test_pallas_solver_matches_general():
    stamps, psf, bkgs, _ = synthetic_star_stamps(4, size=16, seed=3)
    fluxes = stamps.sum(axis=(1, 2)) - 256 * bkgs
    cfg = SGPConfig(max_iter=12, stop_criterion=3, tol_convergence=1e-4,
                    init_recon=2, proj_type=1, has_flux=True,
                    has_sat_level=True, dtype='float32')
    ref = restore_stamps(stamps, psf, bkgs, cfg, fluxes=fluxes,
                         sat_level=65000.0)
    x, iters = solve_stamps_pallas(stamps, psf, bkgs, fluxes, 65000.0, cfg)
    assert (np.asarray(iters) == np.asarray(ref.iters)).all()
    d = (np.abs(np.asarray(x) - np.asarray(ref.x)).max()
         / np.abs(np.asarray(ref.x)).max())
    # the kernel's arithmetic blends (b + ind*(a-b), a Mosaic-ICE workaround
    # for select_n) add one rounding per masked commit vs the exact selects
    # of the general solver; trajectories agree to f32 working precision
    assert d < 5e-4
