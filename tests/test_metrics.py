"""Metrics: radial profile values, Gaussian fits, Wasserstein, validation."""
import numpy as np

from tpu_sgp.metrics import (fit_radprof, radial_profile, relative_error,
                             validation_source, wasserstein_distance_norm)


def test_radial_profile_matches_bincount_reference():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(31, 31))
    center = (15.2, 14.8)
    prof = radial_profile(data, center)
    # independent recomputation
    x, y = np.indices(data.shape)
    r = np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2).astype(int)
    want = np.bincount(r.ravel(), data.ravel()) / np.bincount(r.ravel())
    np.testing.assert_allclose(prof, want)


def test_radial_profile_of_gaussian_decreases():
    yy, xx = np.mgrid[0:31, 0:31]
    g = np.exp(-(((xx - 15) ** 2 + (yy - 15) ** 2) / (2 * 2.5 ** 2)))
    prof = np.array(radial_profile(g, (15, 15)))
    assert prof[0] > prof[3] > prof[6]


def test_fit_radprof_recovers_gaussian():
    rng = np.random.default_rng(7)
    x = np.arange(16)
    truth = 120.0 * np.exp(-0.5 * (x / 2.0) ** 2)
    noisy = truth + rng.normal(0, 0.5, truth.shape)
    table = {'fwhm': np.array([2.0 * 2.35482])}
    fitted, perr, ok = fit_radprof(noisy, table)
    np.testing.assert_allclose(fitted, truth, rtol=0.05, atol=1.0)
    assert np.all(np.isfinite(perr))
    assert ok is True


def test_fit_radprof_fallback_is_flagged():
    # a profile the optimizer cannot fit (NaNs) triggers the seed-curve
    # fallback, which must be distinguishable via ok=False + NaN perr
    bad = np.full(16, np.nan)
    fitted, perr, ok = fit_radprof(bad, {'fwhm': np.array([3.0])})
    assert ok is False
    assert np.all(np.isnan(perr))
    assert len(fitted) == len(bad)           # seed curve, same grid


def test_wasserstein_zero_for_identical():
    p = np.exp(-np.arange(10) / 3.0)
    assert wasserstein_distance_norm(p, p) == 0.0
    assert wasserstein_distance_norm(p, p + 1.0) > 0.0


def test_relative_error():
    obj = np.ones((4, 4))
    assert np.isclose(relative_error(obj * 1.1, obj), 0.1)


def test_validation_source():
    rng = np.random.default_rng(1)
    img = 100 + rng.normal(0, 2, (200, 200))
    img[100, 100] += 500.0
    bkg = np.full_like(img, 100.0)
    rms = np.full_like(img, 2.0)
    assert validation_source(img, (100, 100), bkg, rms, size=20)
    assert not validation_source(img, (30, 30), bkg, rms, size=20)


def test_moffat_psf_properties():
    from tpu_sgp.simulate import moffat_psf, gaussian_psf
    m = moffat_psf(31, fwhm=3.0, beta=2.5)
    g = gaussian_psf(31, fwhm=3.0)
    assert np.isclose(m.sum(), 1.0)
    assert m[15, 15] == m.max()
    # Moffat has heavier wings than a Gaussian of equal FWHM
    assert m[15, 2] > g[15, 2]
