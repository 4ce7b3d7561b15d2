"""End-to-end workload outcomes on the paper's bundled real M13 frames.

The reference records the restored-side science of its subdivision
benchmark: crowded detections 392 -> 321 (KL) / 407 (beta), sparse
103 -> 134 (KL) / 126 (beta), with NUM_ITERS {2, 51, 51, 43}
(/root/reference/results/*_RESTORED*.csv, *_NUM_ITERS*.npy, produced by
application_sgp_subdivisions.py:80-199).

Two layers of evidence here:

1. Catalog parity on the class of deconvolved imagery: running OUR
   detection stack on THEIR bundled restored FITS reproduces their
   restored catalogs (sparse to +-1 source, crowded within ~16%) — the
   restored-side counting machinery matches photutils.

2. The end-to-end scientific signature, deconvolving the bundled original
   frames ourselves: KL suppresses the crowded faint tail (fewer restored
   than original detections, stopping after ~1-2 iterations like the
   reference), and the beta divergence recovers it (more restored
   detections than KL). EXACT parity is impossible: the only bundled PSF
   (psf/psfccfbrd210048_1_1_img.fits) is rendered from a DIFFERENT frame
   than either subframe, and wrong-PSF deconvolution leaves ringing that
   inflates the spurious faint tail (PARITY.md). The bounds pin the
   signature and the measured round-3 values as regression guards.
"""
import os

import numpy as np
import pytest

RESULTS = '/root/reference/results'
PSF = '/root/reference/psf/psfccfbrd210048_1_1_img.fits'

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(RESULTS) and os.path.isfile(PSF)),
    reason='reference results not mounted')


def _count(img, n_pixels):
    from tpu_sgp.catalog import source_info
    scat, _ = source_info(np.asarray(img, np.float64), box_size=(60, 60),
                          n_pixels=n_pixels)
    return 0 if scat is None else len(scat)


def test_catalog_reproduces_paper_restored_counts():
    import pandas as pd

    from tpu_sgp.image import read_fits
    for name, csv, tol in (
            ('SUBDIV_RESTOREDIMG', 'SUBDIV_RESTORED', 3),
            ('SUBDIV_RESTOREDIMG_BETA', 'SUBDIV_RESTORED_BETA', 3),
            ('CROWDED_SUBDIV_RESTOREDIMG', 'CROWDED_SUBDIV_RESTORED', 65),
            ('CROWDED_SUBDIV_RESTOREDIMG_BETA',
             'CROWDED_SUBDIV_RESTORED_BETA', 65)):
        img, _ = read_fits(f'{RESULTS}/{name}.fits')
        n = _count(img, n_pixels=1)
        ref = len(pd.read_csv(f'{RESULTS}/{csv}.csv'))
        assert abs(n - ref) <= tol, (name, n, ref)


def test_crowded_frame_kl_suppresses_beta_recovers():
    """The paper's core finding on its own crowded frame: KL stops almost
    immediately (reference: 2 iterations) and loses faint sources
    (392 -> 321); beta runs tens of iterations (reference: 51 at
    betaParam 1.0248) and recovers them (-> 407). Reproduced here with
    the bundled (mismatched-frame) PSF."""
    from tpu_sgp.api import sgp_beta_div
    from tpu_sgp.catalog import source_info
    from tpu_sgp.config import DEFAULT_PARAMS
    from tpu_sgp.image import getdata
    from tpu_sgp.workloads import subdivisions

    out = subdivisions.run(
        image_path=f'{RESULTS}/CROWDED_SUBDIV_ORIGIMG.fits',
        psf_path=PSF, use_beta_div=False, crowded=True, save=False,
        dtype='float64', warm=False)
    n_orig, n_kl = out['n_orig_detections'], out['n_restored_detections']
    assert out['iters'] <= 5, out['iters']          # reference: 2
    assert n_kl < n_orig, (n_kl, n_orig)            # faint tail suppressed
    assert 280 <= n_kl <= 420, n_kl                 # measured 350 (ref 321)

    image = getdata(f'{RESULTS}/CROWDED_SUBDIV_ORIGIMG.fits')
    psf = getdata(PSF)
    psf = psf / psf.sum()
    scat, bkg = source_info(image, box_size=(60, 60), n_pixels=5)
    flux = float(np.sum(scat.to_table(['segment_flux'])
                        ['segment_flux'].value))
    mp, gamma, bt, amin, amax, alpha, ma, tau, m = DEFAULT_PARAMS
    x, iters, _, _, _ = sgp_beta_div(
        image, psf, bkg.background,
        betaParam=1.0248357076505616,        # the reference's chosen init
        lr=1e-3, lr_exp_param=0.1, schedule_lr=True, adapt_beta=False,
        init_recon=2, proj_type=1, stop_criterion=3, flux=flux,
        scale_data=True, ccd_sat_level=65000.0, tol_convergence=1e-5,
        MAXIT=100, max_projs=mp, gamma=gamma, beta=bt, alpha_min=amin,
        alpha_max=amax, alpha=alpha, M_alpha=ma, tau=tau, M=m,
        use_original_SGP_Afunction=False, dtype='float64')
    n_beta = _count(np.asarray(x), n_pixels=1)
    assert iters >= 20, iters                       # reference: 51
    assert n_beta > n_kl, (n_beta, n_kl)            # beta recovers the tail


def test_sparse_frame_kl_runs_to_convergence():
    """Sparse field: KL iterates to real convergence (reference: 51) and
    the deconvolved frame detects MORE sources than the original (blends
    split + the near-zero background drops the threshold; the reference
    shows the same 103 -> 134 direction)."""
    from tpu_sgp.workloads import subdivisions

    out = subdivisions.run(
        image_path=f'{RESULTS}/SUBDIV_ORIGIMG.fits',
        psf_path=PSF, use_beta_div=False, crowded=False, save=False,
        dtype='float64', warm=False)
    assert 10 <= out['iters'] <= 120, out['iters']  # measured 24 (ref 51)
    assert out['n_restored_detections'] > out['n_orig_detections']
