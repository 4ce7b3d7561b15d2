"""Native PSF coefficient fitting (getpsf equivalent): round-trip recovery
of the bundled reference model, .bin.txt round-trip, and robustness."""
import os

import numpy as np
import pytest

from tpu_sgp.psf import DiaplPSFModel, FitStar, fit_psf_model

REF_TXT = '/root/reference/psf/psfccfbrd210048_1_1.bin.txt'


def _truth_model():
    if not os.path.exists(REF_TXT):
        pytest.skip('reference PSF files not mounted')
    return DiaplPSFModel.from_txt(REF_TXT)


def _render_star(model, x_frame, y_frame, size=31):
    """Render the spatially-varying PSF stamp at a frame position."""
    local = model.local_coeffs(x_frame, y_frame)
    return model.matrix(size, local)


def _star_grid(model, n=4, span=360.0, size=31):
    """Stars on an n x n grid around the model origin."""
    stars = []
    offs = np.linspace(-span / 2, span / 2, n)
    for dy in offs:
        for dx in offs:
            xf, yf = model.x_orig + dx, model.y_orig + dy
            stars.append(FitStar(_render_star(model, xf, yf, size), xf, yf))
    return stars


def test_roundtrip_recovers_reference_model():
    """Render noiseless stars from the bundled reference coefficients, fit
    from getpsf.par defaults, and recover the rendered matrix to <=1e-3 rel
    (VERDICT round-trip criterion; in practice recovery is ~machine level)."""
    truth = _truth_model()
    stars = _star_grid(truth, n=4)
    fit = fit_psf_model(stars, sigma_inc=truth.sigma_inc,
                        sigma_mscale=truth.sigma_mscale,
                        x_orig=truth.x_orig, y_orig=truth.y_orig)
    for (dx, dy) in [(0, 0), (120, -80), (-150, 150)]:
        xf, yf = truth.x_orig + dx, truth.y_orig + dy
        want = _render_star(truth, xf, yf)
        got = _render_star(fit, xf, yf)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel <= 1e-3, (dx, dy, rel)


def test_fit_absorbs_flux_scale_errors():
    """Per-star scale alternation: mis-normalized stars (flux errors up to
    20%) still recover the PSF shape."""
    truth = _truth_model()
    rng = np.random.default_rng(3)
    stars = []
    for st in _star_grid(truth, n=4):
        scale = 1.0 + rng.uniform(-0.2, 0.2)
        stars.append(FitStar(st.data * scale, st.x_frame, st.y_frame))
    fit = fit_psf_model(stars, sigma_inc=truth.sigma_inc,
                        x_orig=truth.x_orig, y_orig=truth.y_orig,
                        scale_iters=8)
    want = _render_star(truth, truth.x_orig, truth.y_orig)
    got = _render_star(fit, truth.x_orig, truth.y_orig)
    # shapes are compared normalized (a global scale is unobservable when
    # every star's flux estimate may be off)
    rel = np.linalg.norm(got / got.sum() - want / want.sum()) \
        / np.linalg.norm(want / want.sum())
    assert rel <= 1e-2


def test_fit_noisy_stars_close():
    """Poisson-like noise at SNR ~100: recovered matrix within a few %."""
    truth = _truth_model()
    rng = np.random.default_rng(11)
    stars = []
    for st in _star_grid(truth, n=4):
        noisy = st.data + rng.normal(0, 1e-4, st.data.shape)
        stars.append(FitStar(noisy, st.x_frame, st.y_frame))
    fit = fit_psf_model(stars, sigma_inc=truth.sigma_inc,
                        x_orig=truth.x_orig, y_orig=truth.y_orig)
    want = _render_star(truth, truth.x_orig, truth.y_orig)
    got = _render_star(fit, truth.x_orig, truth.y_orig)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel <= 0.05


def test_bin_txt_roundtrip(tmp_path):
    """to_txt -> from_txt preserves every header field and coefficient."""
    truth = _truth_model()
    stars = _star_grid(truth, n=3)
    fit = fit_psf_model(stars, sigma_inc=truth.sigma_inc,
                        sigma_mscale=truth.sigma_mscale)
    path = str(tmp_path / 'fitted.bin.txt')
    fit.to_txt(path)
    back = DiaplPSFModel.from_txt(path)
    for k in ('hw', 'ndeg_spat', 'ndeg_local', 'ngauss', 'recenter', 'cos',
              'sin', 'ax', 'ay', 'sigma_inc', 'sigma_mscale', 'fitrad',
              'x_orig', 'y_orig'):
        assert np.isclose(getattr(back, k), getattr(fit, k),
                          rtol=0, atol=0), k
    np.testing.assert_array_equal(back.vec_coeffs, fit.vec_coeffs)
    # and the round-tripped model renders identically
    np.testing.assert_array_equal(back.matrix(31), fit.matrix(31))


def test_psf_estimation_end_to_end(tmp_path):
    """Full native pipeline (detection -> selection -> fit -> artifacts) on
    a synthetic frame rendered from the reference model: zero external
    binaries, recovered PSF within a few % of truth."""
    from tpu_sgp.psf.pipeline import psf_estimation

    truth = _truth_model()
    rng = np.random.default_rng(42)
    h = w = 450
    sky = 100.0
    img = np.full((h, w), sky) + rng.normal(0, 1.0, (h, w))
    pos = []
    for gy in np.linspace(40, h - 40, 4):
        for gx in np.linspace(40, w - 40, 4):
            x0 = gx + rng.uniform(-10, 10)
            y0 = gy + rng.uniform(-10, 10)
            pos.append((x0, y0))
    for (x0, y0) in pos:
        flux = rng.uniform(3e4, 8e4)
        local = truth.local_coeffs(x0, y0)
        cx, cy = int(round(x0)), int(round(y0))
        i = np.arange(-15, 16)
        yy, xx = np.meshgrid(i, i, indexing='ij')
        stamp = truth.evaluate(xx - (x0 - cx), yy - (y0 - cy), local)
        img[cy - 15:cy + 16, cx - 15:cx + 16] += flux * stamp \
            / max(stamp.sum(), 1e-12)

    models = psf_estimation(img, nx=1, ny=1, margin=0,
                            sigma_inc=truth.sigma_inc,
                            out_dir=str(tmp_path), name='synth')
    assert (1, 1) in models
    fit = models[(1, 1)]
    want = truth.normalized_matrix(31, truth.local_coeffs(w / 2, h / 2))
    got = fit.normalized_matrix(31, fit.local_coeffs(w / 2, h / 2))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel <= 0.05, rel
    # artifacts in the reference layout, and the .bin.txt round-trips
    import os
    assert os.path.exists(tmp_path / 'psfsynth_1_1.bin.txt')
    assert os.path.exists(tmp_path / 'psfsynth_1_1_img.fits')
    assert os.path.exists(tmp_path / 'synth_1_1.coo')
    back = DiaplPSFModel.from_txt(str(tmp_path / 'psfsynth_1_1.bin.txt'))
    np.testing.assert_array_equal(back.vec_coeffs, fit.vec_coeffs)


def test_fit_rejects_underconstrained():
    truth = _truth_model()
    star = _star_grid(truth, n=1, span=0.0)[:1]
    with pytest.raises(ValueError, match='constrain'):
        fit_psf_model(star, fitrad=2.0)     # 13 px < 36 coeffs


def test_fit_recenter_handles_offset_centroids():
    """Stars rendered off-center by a known subpixel shift are recovered
    when recenter=True estimates the centroid."""
    truth = _truth_model()
    stars = []
    for st in _star_grid(truth, n=3):
        # shift the evaluation grid: render at (x - 0.3, y + 0.2)
        local = truth.local_coeffs(st.x_frame, st.y_frame)
        h = 15
        i = np.arange(-h, h + 1)
        yy, xx = np.meshgrid(i, i, indexing='ij')
        data = truth.evaluate(xx - 0.3, yy + 0.2, local)
        stars.append(FitStar(data, st.x_frame, st.y_frame))
    fit = fit_psf_model(stars, sigma_inc=truth.sigma_inc,
                        x_orig=truth.x_orig, y_orig=truth.y_orig,
                        recenter=True)
    want = _render_star(truth, truth.x_orig, truth.y_orig)
    got = _render_star(fit, truth.x_orig, truth.y_orig)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel <= 0.05
