"""PSF operator backends: matmul == otf == NumPy FFT reference; adjointness;
linear path == scipy fftconvolve."""
import jax.numpy as jnp
import numpy as np
from scipy.signal import fftconvolve

from tpu_sgp.ops.psf_operator import (
    make_operator, build_circulant_matrix)


def _norm_psf(rng, shape):
    p = rng.uniform(0.0, 1.0, shape)
    p /= p.sum()
    return p


def _np_circ_ops(psf):
    tf = np.fft.fftn(np.fft.fftshift(psf))

    def A(x):
        return np.real(np.fft.ifftn(tf * np.fft.fftn(x)))

    def AT(x):
        return np.real(np.fft.ifftn(np.conj(tf) * np.fft.fftn(x)))

    return A, AT


def test_otf_matches_numpy_fft(rng):
    for shape in [(16, 16), (31, 31)]:
        psf = _norm_psf(rng, shape)
        x = rng.normal(size=shape)
        A, AT = make_operator(jnp.asarray(psf), shape, 'otf')
        Anp, ATnp = _np_circ_ops(psf)
        np.testing.assert_allclose(np.asarray(A(jnp.asarray(x))), Anp(x),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(AT(jnp.asarray(x))), ATnp(x),
                                   rtol=1e-10, atol=1e-12)


def test_matmul_matches_otf(rng):
    shape = (31, 31)
    psf = jnp.asarray(_norm_psf(rng, shape))
    x = jnp.asarray(rng.normal(size=shape))
    Am, ATm = make_operator(psf, shape, 'matmul')
    Ao, ATo = make_operator(psf, shape, 'otf')
    np.testing.assert_allclose(np.asarray(Am(x)), np.asarray(Ao(x)),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(ATm(x)), np.asarray(ATo(x)),
                               rtol=1e-9, atol=1e-11)


def test_matmul_adjoint_is_transpose(rng):
    shape = (12, 12)
    psf = jnp.asarray(_norm_psf(rng, shape))
    c = build_circulant_matrix(psf)
    u = jnp.asarray(rng.normal(size=shape))
    v = jnp.asarray(rng.normal(size=shape))
    A, AT = make_operator(psf, shape, 'matmul')
    # <A u, v> == <u, AT v>
    lhs = float(jnp.sum(A(u) * v))
    rhs = float(jnp.sum(u * AT(v)))
    assert np.isclose(lhs, rhs, rtol=1e-10)
    assert c.shape == (144, 144)


def test_otf_adjoint_property(rng):
    shape = (16, 16)
    psf = jnp.asarray(_norm_psf(rng, shape))
    A, AT = make_operator(psf, shape, 'otf')
    u = jnp.asarray(rng.normal(size=shape))
    v = jnp.asarray(rng.normal(size=shape))
    assert np.isclose(float(jnp.sum(A(u) * v)), float(jnp.sum(u * AT(v))),
                      rtol=1e-10)


def test_linear_matches_scipy_same(rng):
    img_shape = (40, 37)
    psf = _norm_psf(rng, (7, 7))
    x = rng.normal(size=img_shape)
    A, AT = make_operator(jnp.asarray(psf), img_shape, 'linear')
    want = fftconvolve(x, psf, mode='same')
    np.testing.assert_allclose(np.asarray(A(jnp.asarray(x))), want,
                               rtol=1e-8, atol=1e-10)
    want_t = fftconvolve(x, psf.T / psf.T.sum(), mode='same')
    np.testing.assert_allclose(np.asarray(AT(jnp.asarray(x))), want_t,
                               rtol=1e-8, atol=1e-10)


def test_auto_dispatch(rng):
    psf31 = jnp.asarray(_norm_psf(rng, (31, 31)))
    psf128 = jnp.asarray(_norm_psf(rng, (128, 128)))
    # small same-shape -> matmul; large -> otf; mismatched -> linear
    x31 = jnp.asarray(rng.normal(size=(31, 31)))
    Am, _ = make_operator(psf31, (31, 31), 'auto')
    Ao, _ = make_operator(psf31, (31, 31), 'otf')
    np.testing.assert_allclose(np.asarray(Am(x31)), np.asarray(Ao(x31)),
                               rtol=1e-9, atol=1e-11)
    A, _ = make_operator(psf31, (64, 64), 'auto')
    assert A(jnp.zeros((64, 64))).shape == (64, 64)
    A128, _ = make_operator(psf128, (128, 128), 'auto')
    assert A128(jnp.zeros((128, 128))).shape == (128, 128)
