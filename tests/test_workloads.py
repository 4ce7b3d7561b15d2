"""Workload drivers + CLI, end-to-end on synthetic data (CPU)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from tpu_sgp.image import write_fits, Header
from tpu_sgp.simulate import synthetic_star_field
from tpu_sgp.workloads import star_stamps, subdivisions


def test_star_stamps_synthetic_kl(tmp_path):
    m = star_stamps.run(use_beta_div=False, n_synthetic=12, save=True,
                        out_dir=str(tmp_path))
    assert len(m['NUM_ITERS']) >= 10
    # deconvolution sharpens: FWHM ratio well below 1
    assert np.median(m['FWHM_RATIO']) < 0.7
    # flux approximately conserved through the catalog
    assert abs(np.median(m['FLUX_FRACTIONAL_DIFFERENCE'])) < 0.1
    for name in ('NUM_ITERS', 'FWHM_RATIO', 'EXEC_TIME', 'ORIG_FLUX'):
        assert os.path.exists(tmp_path / f'{name}.npy')


def test_star_stamps_synthetic_beta(tmp_path):
    m = star_stamps.run(use_beta_div=True, n_synthetic=6, save=True,
                        out_dir=str(tmp_path))
    assert len(m['NUM_ITERS']) >= 5
    assert os.path.exists(tmp_path / 'NUM_ITERS_BETA.npy')


def test_subdivisions_synthetic(tmp_path):
    out = subdivisions.run(use_beta_div=False, crowded=False,
                           out_dir=str(tmp_path), dtype='float64',
                           maxit=60, warm=False)
    assert out['iters'] >= 1
    assert out['n_restored_detections'] > 0
    assert os.path.exists(tmp_path / 'SUBDIV_NUM_ITERS.npy')
    assert os.path.exists(tmp_path / 'subdiv_restored.fits')


def test_subdivisions_synthetic_beta_candidate_search(tmp_path):
    """The beta path of the subdivision workload (reference
    application_sgp_subdivisions.py:85-112): select the beta init by
    catalog-flux FFD over the five seeded candidates, re-run at the
    winner, and persist the *_BETA artifacts + BEST_BETA_INIT.npy."""
    out = subdivisions.run(use_beta_div=True, crowded=False,
                           out_dir=str(tmp_path), dtype='float64',
                           maxit=12, warm=False)
    assert out['iters'] >= 1
    assert out['best_beta'] is not None
    # the winner must come from the reference's seeded candidate grid
    from tpu_sgp.workloads.star_stamps import _beta_candidates
    assert any(abs(out['best_beta'] - float(c)) < 1e-12
               for c in _beta_candidates())
    assert out['n_restored_detections'] > 0
    best = np.load(tmp_path / 'SUBDIV_BEST_BETA_INIT.npy')
    assert best.shape == (1,) and best[0] == out['best_beta']
    assert os.path.exists(tmp_path / 'SUBDIV_NUM_ITERS_BETA.npy')
    assert os.path.exists(tmp_path / 'SUBDIV_RESTORED_FLUX_BETA.npy')
    assert os.path.exists(tmp_path / 'subdiv_restored_BETA.fits')


@pytest.mark.slow
def test_cli_subdiv_end_to_end(tmp_path):
    image, psf, _ = synthetic_star_field(200, 200, n_stars=30, seed=11)
    hdr = Header({'GAIN': 1.22, 'SATURATE': 65000.0,
                  'CRPIX1': 100.0, 'CRPIX2': 100.0, 'CRVAL1': 250.0,
                  'CRVAL2': 36.0, 'CD1_1': -2.8e-4, 'CD2_2': 2.8e-4,
                  'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN'})
    img_path = str(tmp_path / 'sci.fits')
    psf_path = str(tmp_path / 'psf.fits')
    write_fits(img_path, image, hdr)
    write_fits(psf_path, psf, Header({'FWHM': 2.8}))

    from tpu_sgp.cli import main
    out = main(['--data_path_sciimg', img_path, '--data_path_psf', psf_path,
                '--use_subdiv', '--subdivision_size', '64',
                '--subdiv_overlap', '8', '--dtype', 'float64',
                '--output_dir', str(tmp_path / 'results')])
    d = out['deconvolved']
    assert d.shape == image.shape
    assert np.isfinite(d).all()
    rdir = tmp_path / 'results'
    assert (rdir / 'subdiv_deconvolved_sci.fits').exists()
    assert (rdir / 'deconv_bkg_sci.fits').exists()
    assert (rdir / 'deconv_bkgrms_sci.fits').exists()
    assert (rdir / 'orig_sci.fits_scat.csv').exists()
    assert (rdir / 'execution_times.txt').exists()
    assert len(out['orig_catalog']) > 10
    assert len(out['deconv_catalog']) > 5
    # world coordinates present and sane
    assert np.isfinite(out['deconv_catalog']['X_WORLD']).all()


def test_cli_whole_image(tmp_path):
    image, psf, _ = synthetic_star_field(96, 96, n_stars=8, seed=12)
    img_path = str(tmp_path / 'sci.fits')
    psf_path = str(tmp_path / 'psf.fits')
    write_fits(img_path, image, Header({'GAIN': 1.0, 'SATURATE': 65000.0}))
    write_fits(psf_path, psf)
    from tpu_sgp.cli import main
    out = main(['--data_path_sciimg', img_path, '--data_path_psf', psf_path,
                '--dtype', 'float64', '--tol_convergence', '1e-4',
                '--output_dir', str(tmp_path / 'results')])
    assert out['deconvolved'].shape == image.shape
    assert (tmp_path / 'results' / 'deconvolved_sci.fits').exists()


def test_simulation_workload_with_sampling():
    """workloads.simulation: fixture run + vectorized beta-init search."""
    import pytest
    if not os.path.exists(
            '/root/reference/restoration/simulated_test/data/NGC7027_255.mat'):
        pytest.skip('reference fixtures not mounted')
    from tpu_sgp.workloads import simulation
    x, rel, img, obj = simulation.run_kl('NGC7027_255.mat', dtype='float64')
    assert abs(rel - 0.137888) < 2e-4
    x, rel, _, _, best = simulation.run_beta(
        'NGC7027_255.mat', do_sampling=True, n_draws=3, dtype='float64')
    assert np.isfinite(rel) and rel < 0.2
    assert 0.8 < best < 1.2


def test_cli_whole_image_beta(tmp_path):
    image, psf, _ = synthetic_star_field(96, 96, n_stars=8, seed=14)
    img_path = str(tmp_path / 'sci.fits')
    psf_path = str(tmp_path / 'psf.fits')
    write_fits(img_path, image, Header({'GAIN': 1.0, 'SATURATE': 65000.0}))
    write_fits(psf_path, psf)
    from tpu_sgp.cli import main
    out = main(['--data_path_sciimg', img_path, '--data_path_psf', psf_path,
                '--use_beta_div', '--initial_beta', '1.01',
                '--dtype', 'float64',
                '--output_dir', str(tmp_path / 'results')])
    assert np.isfinite(out['deconvolved']).all()
    assert out['iters'] >= 1


def test_cli_add_bkg_precedes_deconvolved_catalog(tmp_path, monkeypatch):
    """--add_bkg_to_deconvolved must inject the artificial sky BEFORE the
    deconvolved catalog is extracted — rescuing the collapsed detection
    threshold is the flag's purpose (reference sgp.py:1126 adds it ahead
    of the deconvolved source_info at :1141). Regression: the flag used to
    run after the catalog, touching only the written FITS."""
    import tpu_sgp.cli as cli_mod
    image, psf, _ = synthetic_star_field(96, 96, n_stars=8, seed=14)
    img_path = str(tmp_path / 'sci.fits')
    psf_path = str(tmp_path / 'psf.fits')
    write_fits(img_path, image, Header({'GAIN': 1.0, 'SATURATE': 65000.0}))
    write_fits(psf_path, psf)

    events = []
    real_sky = cli_mod.artificial_sky_background
    real_si = cli_mod.source_info

    def sky(*a, **k):
        events.append('sky')
        return real_sky(*a, **k)

    def si(*a, **k):
        events.append('catalog')
        return real_si(*a, **k)

    monkeypatch.setattr(cli_mod, 'artificial_sky_background', sky)
    monkeypatch.setattr(cli_mod, 'source_info', si)
    out = cli_mod.main(['--data_path_sciimg', img_path, '--data_path_psf',
                        psf_path, '--dtype', 'float64',
                        '--add_bkg_to_deconvolved',
                        '--output_dir', str(tmp_path / 'results')])
    assert np.isfinite(out['deconvolved']).all()
    # call order: orig catalog, sky injection, deconvolved catalog
    assert events == ['catalog', 'sky', 'catalog']


def test_cli_scale_psf_and_flip(tmp_path):
    image, psf, _ = synthetic_star_field(96, 96, n_stars=6, seed=15)
    img_path = str(tmp_path / 'sci.fits')
    psf_path = str(tmp_path / 'psf.fits')
    write_fits(img_path, image, Header({'GAIN': 1.0, 'SATURATE': 65000.0}))
    write_fits(psf_path, psf, Header({'FWHM': 2.8}))
    from tpu_sgp.cli import main
    base = ['--data_path_sciimg', img_path, '--data_path_psf', psf_path,
            '--dtype', 'float64', '--output_dir']
    out1 = main(base + [str(tmp_path / 'r1')])
    out2 = main(base + [str(tmp_path / 'r2'), '--scale_psf',
                        '--psf_scale_fwhm', '2.0'])
    out3 = main(base + [str(tmp_path / 'r3'), '--flip_image'])
    for o in (out1, out2, out3):
        assert np.isfinite(o['deconvolved']).all()
    # scaled PSF and flipped image must change the result
    assert not np.allclose(out1['deconvolved'], out2['deconvolved'])
    assert not np.allclose(out1['deconvolved'], out3['deconvolved'])


def test_star_stamps_main_cli(tmp_path, capsys):
    """python -m tpu_sgp.workloads.star_stamps: argparse facade over run()
    with the summary print (reference application_sgp_star_stamps.py is a
    bare script; the facade adds flags but keeps the artifacts)."""
    m = star_stamps.main(['--n_synthetic', '8', '--out_dir', str(tmp_path),
                          '--seed', '7'])
    out = capsys.readouterr().out
    assert 'NUM_ITERS: median=' in out
    assert len(m['NUM_ITERS']) >= 6
    assert os.path.exists(tmp_path / 'NUM_ITERS.npy')


def test_simulation_run_all_and_cli(tmp_path, capsys):
    """run_all / the tpu-sgp-simulate CLI over a fixture directory: tiny
    synthetic .mat files in the SGP-dec layout (gn, psf, bg, obj), all four
    fixture/divergence combinations produce finite rel_err."""
    from scipy.io import savemat
    from tpu_sgp.workloads import simulation

    rng = np.random.default_rng(7)
    n = 16
    yy, xx = np.mgrid[:n, :n] - n // 2
    psf = np.exp(-(xx ** 2 + yy ** 2) / (2 * 1.5 ** 2))
    psf /= psf.sum()
    obj = np.zeros((n, n))
    obj[5, 6] = 900.0
    obj[11, 9] = 600.0
    bg = 10.0
    gn = np.real(np.fft.ifft2(np.fft.fft2(obj)
                              * np.fft.fft2(np.fft.ifftshift(psf)))) + bg
    gn = rng.poisson(np.maximum(gn, 0.0)).astype(np.float64)
    for name in ('NGC7027_255.mat', 'satellite_25500.mat'):
        savemat(str(tmp_path / name), {'gn': gn, 'psf': psf,
                                       'bg': np.array([[bg]]), 'obj': obj})

    results = simulation.main(['--data_dir', str(tmp_path)])
    assert set(results) == {'ngc_kl', 'sat_kl', 'ngc_beta', 'sat_beta'}
    for k, v in results.items():
        assert np.isfinite(v) and 0.0 < v < 1.0, (k, v)
    out = capsys.readouterr().out
    assert 'ngc_kl: rel_err' in out
