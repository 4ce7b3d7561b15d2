"""Classic restoration baselines on the same operator stack.

Beyond-parity additions (the reference ships only SGP/β-SGP): the two
standard methods astronomers reach for first, built on the identical PSF
operators so they compose with the batching/sharding machinery.

  * Richardson-Lucy: the EM iteration for the same Poisson/KL model SGP
    minimizes — x <- x * AT(gn / (A(x) + bkg)) / AT(1). Useful both as a
    baseline and as a cross-check: its fixed points coincide with SGP's
    stationary points for flux-free KL.
  * Wiener filter: closed-form frequency-domain deconvolution
    X = conj(H) / (|H|^2 + nsr) * G for a circular PSF model — one rFFT
    round trip, the fastest possible restoration when a linear filter
    suffices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.psf_operator import make_operator


@partial(jax.jit, static_argnames=('n_iters', 'operator'))
def richardson_lucy(gn, psf, bkg, n_iters: int = 30,
                    operator: str = 'auto'):
    """Richardson-Lucy deconvolution. gn/psf/bkg as in the SGP solver;
    returns the restored image after ``n_iters`` multiplicative updates.
    jit/vmap-compatible; init is the flat background-subtracted flux."""
    gn = jnp.asarray(gn)
    shape = gn.shape
    bkg = jnp.broadcast_to(jnp.asarray(bkg, gn.dtype), shape)
    A, AT = make_operator(jnp.asarray(psf, gn.dtype), shape, operator)
    eps = jnp.finfo(gn.dtype).tiny

    at_one = AT(jnp.ones(shape, gn.dtype))
    # floor the flat init at the DATA scale, not float tiny: with an
    # over-subtracted background mean(gn - bkg) <= 0, and 30 multiplicative
    # O(1) updates cannot grow ~1e-38 into a physical flux (the result
    # would be silently ~zero everywhere)
    floor = jnp.maximum(jnp.finfo(gn.dtype).eps * jnp.max(jnp.abs(gn)), eps)
    x0 = jnp.full(shape, jnp.maximum(jnp.mean(gn - bkg), floor), gn.dtype)

    def body(_, x):
        den = A(x) + bkg
        ratio = gn / jnp.maximum(den, eps)
        return x * AT(ratio) / jnp.maximum(at_one, eps)

    return jax.lax.fori_loop(0, n_iters, body, x0)


@jax.jit
def wiener(gn, psf, nsr=1e-3):
    """Wiener deconvolution with a scalar (or per-frequency) noise-to-signal
    ratio; circular-convolution PSF model (same centering as the 'otf'
    operator: H = fft(fftshift(psf)))."""
    gn = jnp.asarray(gn)
    h = jnp.fft.rfft2(jnp.fft.fftshift(jnp.asarray(psf, gn.dtype)))
    g = jnp.fft.rfft2(gn)
    filt = jnp.conj(h) / (jnp.abs(h) ** 2 + nsr)
    return jnp.fft.irfft2(filt * g, s=gn.shape)
