"""Classic baselines: Richardson-Lucy and Wiener on the shared operators."""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_sgp.metrics import relative_error
from tpu_sgp.solvers.classic import richardson_lucy, wiener
from conftest import synthetic_stamp


def test_richardson_lucy_sharpens(rng):
    img, psf, bkg, truth = synthetic_stamp(rng, size=31, flux=2e4)
    x = np.asarray(richardson_lucy(jnp.asarray(img), jnp.asarray(psf),
                                   bkg, n_iters=60))
    assert np.isfinite(x).all() and (x >= 0).all()
    # restored peak much sharper than the blurred observation
    assert x.max() > 3.0 * (img.max() - bkg)
    # flux approximately conserved; with a background term RL's total-count
    # bias decays slowly, so the tolerance is loose
    assert abs(x.sum() / (img - bkg).sum() - 1.0) < 0.2


def test_richardson_lucy_vmaps(rng):
    imgs, psfs, bkgs = [], [], []
    for i in range(3):
        img, psf, bkg, _ = synthetic_stamp(rng, size=16)
        imgs.append(img)
        psfs.append(psf)
        bkgs.append(np.full((16, 16), bkg))
    out = jax.vmap(lambda g, p, b: richardson_lucy(g, p, b, n_iters=10))(
        jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(psfs)),
        jnp.asarray(np.stack(bkgs)))
    assert out.shape == (3, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_wiener_recovers_smooth_truth(rng):
    # smooth truth, tiny noise: Wiener with small NSR nearly inverts the blur
    from tpu_sgp.simulate import gaussian_psf
    size = 64
    yy, xx = np.mgrid[0:size, 0:size]
    truth = 100 * np.exp(-((xx - 32) ** 2 + (yy - 32) ** 2) / (2 * 36.0))
    psf = gaussian_psf(size, fwhm=3.0)
    tf = np.fft.fftn(np.fft.fftshift(psf))
    blurred = np.real(np.fft.ifftn(tf * np.fft.fftn(truth)))
    x = np.asarray(wiener(jnp.asarray(blurred), jnp.asarray(psf), nsr=1e-8))
    assert relative_error(x, truth) < 0.01
