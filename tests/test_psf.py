"""DIAPL PSF model: parity against the reference's own rendered FITS."""
import os

import numpy as np
import pytest

from tpu_sgp.psf import DiaplPSFModel, PSF, scale_psf

REF_TXT = '/root/reference/psf/psfccfbrd210048_1_1.bin.txt'
REF_FITS = '/root/reference/psf/psfccfbrd210048_1_1_img.fits'


def _need_reference():
    if not os.path.exists(REF_TXT):
        pytest.skip('reference PSF files not mounted')


def test_parse_header_fields():
    _need_reference()
    m = DiaplPSFModel.from_txt(REF_TXT)
    assert m.hw == 15
    assert m.ndeg_spat == 1
    assert m.ndeg_local == 2
    assert m.ngauss == 2
    assert np.isclose(m.sigma_inc, 0.548)
    assert m.x_orig == 225
    # 2 gaussians * 6 local monomials * 3 spatial terms = 36 coefficients
    assert m.vec_coeffs.size == m.n_local * m.n_spatial == 36


def test_matrix_matches_reference_rendered_fits():
    """The rendered, normalized 31x31 matrix must equal the FITS file the
    reference itself produced from this coefficient file."""
    _need_reference()
    from tpu_sgp.image import getdata
    m = DiaplPSFModel.from_txt(REF_TXT)
    ours = m.normalized_matrix(31)
    want = getdata(REF_FITS)
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-9)


def test_vectorized_matches_scalar_loop():
    """Vectorized evaluation == literal per-pixel triple loop."""
    _need_reference()
    m = DiaplPSFModel.from_txt(REF_TXT)

    def scalar_pix(x, y):
        x1 = m.cos * x - m.sin * y
        y1 = m.sin * x + m.cos * y
        rr = m.ax * x1 * x1 + m.ay * y1 * y1
        val, icomp = 0.0, 0
        for _ in range(m.ngauss):
            f = np.exp(rr)
            a1 = 1.0
            for mm in range(m.ldeg + 1):
                a2 = 1.0
                for nn in range(m.ldeg - mm + 1):
                    val += m.vec_coeffs[icomp] * f * a1 * a2
                    icomp += 1
                    a2 *= y
                a1 *= x
            rr *= m.sigma_inc ** 2
        return val

    mat = m.matrix(31)
    for (i, j) in [(-15, -15), (0, 0), (3, -7), (14, 15)]:
        assert np.isclose(mat[i + 15, j + 15], scalar_pix(j, i), rtol=1e-12)


def test_psf_shim_api():
    _need_reference()
    p = PSF(REF_TXT)
    mat = p.normalize_psf_mat()
    assert mat.shape == (31, 31)
    assert np.isclose(mat.sum(), 1.0)


def test_local_coeffs_at_origin_is_constant_term():
    """At (x_orig, y_orig) the spatial polynomial reduces to its constant
    term: local coeffs == first n_local coefficients."""
    _need_reference()
    m = DiaplPSFModel.from_txt(REF_TXT)
    local = m.local_coeffs(m.x_orig, m.y_orig)
    np.testing.assert_allclose(local, m.vec_coeffs[:m.n_local])
    # away from the origin the PSF varies
    far = m.local_coeffs(m.x_orig + 150, m.y_orig + 150)
    assert not np.allclose(far, local)


def test_scale_psf_broadens_and_normalizes():
    from tpu_sgp.simulate import gaussian_psf
    p = gaussian_psf(31, fwhm=2.5)
    s = scale_psf(p, gaussian_fwhm=2.0)
    assert np.isclose(s.sum(), 1.0)
    assert s.max() < p.max()   # broadened core


def test_matrix_even_size_exact_shape():
    """matrix(size) must return exactly (size, size) for EVEN sizes too
    (regression: arange(-h, h+1) returned size+1 points, and the C++ twin
    overran its output buffer — heap corruption)."""
    _need_reference()
    m = DiaplPSFModel.from_txt(REF_TXT)
    for size in (30, 32, 16, 31):
        a = m.matrix(size)
        assert a.shape == (size, size)
    # odd rendering unchanged: equals an independently evaluated
    # symmetric [-15, 15] grid (matrix[i+h, j+h] = psf(x=j, y=i))
    off = np.arange(-15, 16)
    yy, xx = np.meshgrid(off, off, indexing='ij')
    np.testing.assert_array_equal(m.matrix(31), m.evaluate(xx, yy))
    # even rendering is the odd grid's [-h, h-1] sub-block
    np.testing.assert_array_equal(m.matrix(30), m.matrix(31)[:30, :30])


def test_psf_shim_full_reference_surface():
    """The reference-API shim (psf_calculate.PSF, psf_calculate.py:9-166)
    beyond normalize_psf_mat: get_psf_mat, calc_psf_pix, check_symmetric."""
    _need_reference()
    p = PSF(REF_TXT)
    mat = p.get_psf_mat()
    assert mat.shape == (31, 31)
    np.testing.assert_array_equal(mat, p.psf_mat)       # cached attribute
    np.testing.assert_array_equal(mat, p.model.matrix(31))
    # single-pixel evaluation agrees with the rendered matrix layout
    # (matrix[i+15, j+15] = psf(x=j, y=i))
    local = p.model.local_coeffs(p.x_orig, p.y_orig)
    for (i, j) in [(0, 0), (3, -7), (-15, 14)]:
        want = p.model.evaluate(np.float64(j), np.float64(i), local)
        assert np.isclose(p.calc_psf_pix(local, j, i), float(want),
                          rtol=1e-14)
    assert PSF.check_symmetric(np.eye(3))
    assert not PSF.check_symmetric(np.triu(np.ones((3, 3))))
