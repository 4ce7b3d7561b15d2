"""Spatially-varying PSF restoration using the real DIAPL coefficient file."""
import os

import numpy as np
import pytest

from tpu_sgp import SGPConfig
from tpu_sgp.psf.diapl import DiaplPSFModel
from tpu_sgp.simulate import synthetic_star_field
from tpu_sgp.workloads.spatial_psf import (render_tile_psfs,
                                           restore_with_spatial_psf)

REF_TXT = '/root/reference/psf/psfccfbrd210048_1_1.bin.txt'


def _model():
    if not os.path.exists(REF_TXT):
        pytest.skip('reference PSF coefficient file not mounted')
    return DiaplPSFModel.from_txt(REF_TXT)


def test_render_tile_psfs_vary_across_field():
    m = _model()
    centers = np.array([[20.0, 20.0], [225.0, 225.0], [430.0, 430.0]])
    psfs = render_tile_psfs(m, centers, 31)
    assert psfs.shape == (3, 31, 31)
    np.testing.assert_allclose(psfs.sum(axis=(1, 2)), 1.0, rtol=1e-10)
    assert not np.allclose(psfs[0], psfs[2])


def test_restore_with_spatial_psf_end_to_end():
    m = _model()
    image, _, _ = synthetic_star_field(200, 200, n_stars=25, seed=13,
                                       flux_range=(3e4, 9e4))
    cfg = SGPConfig(max_iter=25, stop_criterion=3, tol_convergence=1e-4,
                    init_recon=2, proj_type=1, has_flux=True,
                    has_sat_level=True, dtype='float64', operator='linear')
    mosaic, info = restore_with_spatial_psf(image, m, cfg,
                                            subdiv_shape=(64, 64),
                                            overlap=8)
    assert mosaic.shape == image.shape
    assert np.isfinite(mosaic[info['footprint'] > 0]).all()
    assert info['psfs'].shape[0] == len(info['origins'])
    assert (info['iters'] >= 1).all()
    # per-tile PSFs really differ across the frame
    assert not np.allclose(info['psfs'][0], info['psfs'][-1])


def test_spatial_psf_cli(tmp_path):
    from tpu_sgp.image import write_fits
    from tpu_sgp.workloads.spatial_psf import main

    _model()  # skip when the reference tree is absent
    image, _, _ = synthetic_star_field(128, 128, n_stars=12, seed=7,
                                       flux_range=(3e4, 9e4))
    src = str(tmp_path / 'frame.fits')
    out = str(tmp_path / 'restored.fits')
    write_fits(src, np.asarray(image, np.float32))
    info = main(['--image', src, '--psf_model', REF_TXT, '--out', out,
                 '--subdivision_size', '64', '--subdiv_overlap', '8'])
    assert os.path.exists(out)
    assert len(info['tiles']) == len(info['origins'])
