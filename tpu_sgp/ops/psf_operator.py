"""PSF forward/adjoint operators, TPU-first.

The reference exposes two operator variants
(/root/reference/restoration/sgp.py:108-161):
  (a) same-shape circular convolution through a precomputed OTF
      ``TF = fftn(fftshift(psf))``; adjoint via ``conj(TF)``;
  (b) astropy ``convolve_fft`` zero-padded *linear* convolution for
      PSF.shape != image.shape, with the adjoint applied as convolution by
      ``psf.conj().T`` (an axis transpose, reproduced faithfully).

This module re-designs them for TPU:

  * ``otf``    — rFFT-based circular convolution. The PSF and image are real,
                 so the full complex FFT of the reference is replaced by
                 rfft2/irfft2 (half the FFT work, mathematically identical
                 because the product of Hermitian spectra is Hermitian).
  * ``matmul`` — for small stamps the circulant operator is materialized as a
                 dense (H*W, H*W) matrix living in VMEM and applied on the
                 MXU. A 31x31 stamp gives a 961x961 f32 matrix (~3.7 MB);
                 a vmapped batch of stamps becomes one large batched matmul —
                 the highest-throughput mapping of this workload onto the
                 systolic array. The adjoint is exactly the transpose.
  * ``linear`` — zero-padded linear convolution via rFFT on the padded grid,
                 'same'-cropped, kernel normalized to sum 1, matching the
                 astropy semantics of variant (b).

All builders return a pair of closures ``(A, AT)`` mapping (H, W) -> (H, W).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Operator = Callable[[jnp.ndarray], jnp.ndarray]

# Largest stamp pixel count for which the dense circulant matrix is used by
# 'auto' (64*64 = 4096 -> 64 MB f32 matrix is the ceiling; 31x31 -> 3.7 MB).
_MATMUL_MAX_PIXELS = 4096


def build_circulant_matrix(psf: jnp.ndarray) -> jnp.ndarray:
    """Dense matrix C with C @ vec(x) == vec(circular_conv(fftshift(psf), x)).

    C[(i,j),(p,q)] = k[(i-p) mod H, (j-q) mod W] with k = fftshift(psf),
    which is exactly the reference operator (a). The adjoint operator
    (conj(TF) path) is exactly C.T for a real PSF.
    """
    h, w = psf.shape
    k = jnp.fft.fftshift(psf)
    di = (jnp.arange(h)[:, None] - jnp.arange(h)[None, :]) % h   # (H, H)
    dj = (jnp.arange(w)[:, None] - jnp.arange(w)[None, :]) % w   # (W, W)
    c = k[di[:, None, :, None], dj[None, :, None, :]]            # (H, W, H, W)
    return c.reshape(h * w, h * w)


def make_matmul_operator(psf: jnp.ndarray) -> Tuple[Operator, Operator]:
    """MXU path: apply the circulant operator as a dense matmul."""
    h, w = psf.shape
    c = build_circulant_matrix(psf)
    ct = c.T
    # pin full f32 multiplies: TPU backends may otherwise lower f32 dots to
    # bf16 passes (measured free on v5e, where defaults were already exact)
    hi = jax.lax.Precision.HIGHEST

    def A(x):
        return jnp.matmul(c, x.reshape(-1), precision=hi).reshape(h, w)

    def AT(x):
        return jnp.matmul(ct, x.reshape(-1), precision=hi).reshape(h, w)

    return A, AT


def make_matmul_flat_operator(psf: jnp.ndarray) -> Tuple[Operator, Operator]:
    """MXU path on FLATTENED images: x is the (H*W,) raveled stamp.

    Identical math to ``make_matmul_operator`` without the 2-D reshapes.
    This is the batched-solver fast path: a (B, 31, 31) array tiles on TPU
    as T(8,128) over the trailing dims — 31 pads to 32 sublanes and 31 to
    128 lanes, a 4.3x memory blow-up that every elementwise pass of the
    solve pays. The raveled (B, 961) layout pads only 961 -> 1024 (7%).
    """
    c = build_circulant_matrix(psf)
    ct = c.T
    hi = jax.lax.Precision.HIGHEST

    def A(x):
        return jnp.matmul(c, x, precision=hi)

    def AT(x):
        return jnp.matmul(ct, x, precision=hi)

    return A, AT


def _split_bf16(m: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-term bf16 decomposition: m ~ hi + lo with hi = bf16(m) and
    lo = bf16(m - hi). Covers ~16 mantissa bits (vs f32's 24)."""
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def make_matmul_flat_split_operator(psf: jnp.ndarray
                                    ) -> Tuple[Operator, Operator]:
    """Compensated split-bf16 circulant matvec on FLATTENED images — the
    mixed-precision lever VERDICT r4 next-5 asks to measure.

    Both the operator matrix and the iterate are decomposed into two bf16
    terms (hi + lo); the product keeps the three significant cross terms
    (hi*hi + hi*lo + lo*hi, Ozaki-style with the ~2^-32 lo*lo term
    dropped), each accumulated in f32 on the MXU. Error vs the exact f32
    matvec is bounded by the ~2^-17 relative split residual — below the
    solver's f32 stop tolerances (1e-4) but ABOVE f32 roundoff, so this is
    an opt-in speed/accuracy trade (``operator='matmul_split'``), not the
    default. Semantics otherwise identical to ``make_matmul_flat_operator``
    (reference operator (a), /root/reference/restoration/sgp.py:108-120).
    """
    c = build_circulant_matrix(psf).astype(jnp.float32)
    c_hi, c_lo = _split_bf16(c)
    # bf16 rounding is elementwise, so the adjoint's split terms are the
    # transposes of the forward's — no second decomposition needed
    ct_hi, ct_lo = c_hi.T, c_lo.T
    f32 = jnp.float32

    def apply(mh, ml, x):
        xh = x.astype(jnp.bfloat16)
        xl = (x.astype(f32) - xh.astype(f32)).astype(jnp.bfloat16)
        y = (jnp.matmul(mh, xh, preferred_element_type=f32)
             + jnp.matmul(mh, xl, preferred_element_type=f32)
             + jnp.matmul(ml, xh, preferred_element_type=f32))
        return y.astype(x.dtype)

    def A(x):
        return apply(c_hi, c_lo, x)

    def AT(x):
        return apply(ct_hi, ct_lo, x)

    return A, AT


def make_otf_operator(psf: jnp.ndarray) -> Tuple[Operator, Operator]:
    """rFFT circular-convolution path (same PSF/image shape)."""
    shape = psf.shape
    rtf = jnp.fft.rfft2(jnp.fft.fftshift(psf))
    rctf = jnp.conj(rtf)

    def A(x):
        return jnp.fft.irfft2(rtf * jnp.fft.rfft2(x), s=shape)

    def AT(x):
        return jnp.fft.irfft2(rctf * jnp.fft.rfft2(x), s=shape)

    return A, AT


def _good_fft_size(n: int) -> int:
    """Smallest even 7-smooth integer >= n (factors only 2/3/5/7).

    TPU FFT cost depends on the radix factorization: the whole-frame
    workload's natural pad 410+31-1 = 440 = 2^3*5*11 carries an 11-radix
    and measured 0.575 ms/conv pair on the v5e, vs 0.491 ms at 448 = 2^6*7
    (~15% faster; 480 and 512 measured 0.490/0.523). Zero-padding past the
    linear-convolution length leaves the cropped result mathematically
    unchanged, so rounding up is free.
    """
    if n <= 0:
        raise ValueError(f'FFT size must be positive, got {n}')
    s = n + (n & 1)
    while True:
        m = s
        for p in (2, 3, 5, 7):
            while m % p == 0:
                m //= p
        if m == 1:
            return s
        s += 2


def _linear_conv_same(x: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded linear convolution, 'same'-cropped at the kernel center.

    Equivalent to astropy ``convolve_fft(x, kern, boundary='fill')`` up to
    roundoff (any zero-padded linear convolution is), written directly with
    rFFTs on a padded grid rounded up to an FFT-friendly (7-smooth) size.
    """
    h, w = x.shape
    kh, kw = kern.shape
    ph, pw = _good_fft_size(h + kh - 1), _good_fft_size(w + kw - 1)
    fx = jnp.fft.rfft2(x, s=(ph, pw))
    fk = jnp.fft.rfft2(kern, s=(ph, pw))
    full = jnp.fft.irfft2(fx * fk, s=(ph, pw))
    oy, ox = kh // 2, kw // 2
    return full[oy:oy + h, ox:ox + w]


def make_linear_operator(psf: jnp.ndarray,
                         image_shape: Tuple[int, int]) -> Tuple[Operator, Operator]:
    """Linear-convolution path for PSF.shape != image.shape.

    Kernel is normalized to unit sum; the adjoint convolves with the axis
    transpose of the PSF — the reference's deliberate (if unusual) choice
    (sgp.py:157) — so workload behaviour matches.
    """
    kern = psf / jnp.sum(psf)
    kern_t = jnp.conj(kern).T  # transpose preserves the unit sum

    def A(x):
        return _linear_conv_same(x, kern)

    def AT(x):
        return _linear_conv_same(x, kern_t)

    return A, AT


def _halo_exchange(x: jnp.ndarray, hy: int, hx: int, axis_y: str,
                   axis_x: str) -> jnp.ndarray:
    """Pad a device-local tile with (hy, hx) halos from mesh neighbors.

    Two-pass exchange: columns along the x mesh axis first, then rows of the
    already-extended array along the y axis — corners arrive automatically.
    Non-wrapping ppermute leaves global-boundary halos zero, which realizes
    the zero-padded *linear* convolution semantics of the reference's
    PSF != image operator (astropy boundary='fill').
    """
    def shift(arr, axis_name, direction):
        # direction +1: receive from the previous device (send to next)
        n = jax.lax.axis_size(axis_name)
        if n == 1:
            return jnp.zeros_like(arr)
        if direction > 0:
            perm = [(i, i + 1) for i in range(n - 1)]
        else:
            perm = [(i + 1, i) for i in range(n - 1)]
        return jax.lax.ppermute(arr, axis_name, perm)

    if hx > 0:
        left_halo = shift(x[:, -hx:], axis_x, +1)    # from left neighbor
        right_halo = shift(x[:, :hx], axis_x, -1)    # from right neighbor
        x = jnp.concatenate([left_halo, x, right_halo], axis=1)
    if hy > 0:
        top_halo = shift(x[-hy:, :], axis_y, +1)
        bot_halo = shift(x[:hy, :], axis_y, -1)
        x = jnp.concatenate([top_halo, x, bot_halo], axis=0)
    return x


def make_halo_operator(psf: jnp.ndarray, axis_names: Tuple[str, str]
                       ) -> Tuple[Operator, Operator]:
    """Distributed linear-convolution operator for a 2-D sharded image.

    Runs inside ``shard_map`` over mesh axes (axis_y, axis_x): each device
    gathers a PSF-half-width halo from its neighbors over ICI
    (``lax.ppermute``) and then applies a local VALID linear convolution to
    the halo-extended tile via rFFT — the TPU-native replacement for the
    reference's file-based subdivision + mosaic pipeline (SURVEY §5
    'long-context analog').

    Semantics match ``make_linear_operator`` exactly (global zero padding),
    so a sharded solve equals the single-device linear solve bit-for-bit up
    to reduction order. Requires local tile >= halo width per axis.
    """
    axis_y, axis_x = axis_names
    kern = psf / jnp.sum(psf)
    kern_t = jnp.conj(kern).T  # transpose preserves the unit sum
    if psf.shape[0] % 2 == 0 or psf.shape[1] % 2 == 0:
        raise ValueError('halo operator requires odd PSF dimensions '
                         f'(got {psf.shape}); an even kernel has no centre '
                         'pixel so the halo-extended VALID convolution '
                         'cannot reproduce the same-cropped linear operator')

    def apply(kernel, x):
        # Geometry follows the kernel being APPLIED: the adjoint kernel is
        # the axis transpose (kw, kh), so its halo widths and crop swap too
        # (a fixed forward-shaped crop silently corrupts AT for non-square
        # PSFs).
        kh, kw = kernel.shape
        th, tw = x.shape
        padded = _halo_exchange(x, kh // 2, kw // 2, axis_y, axis_x)
        # VALID linear convolution of the halo-extended tile via rFFT.
        # Wrap-around of a size-S circular convolution aliases only output
        # rows/cols below (ph + kh - 1) - S, so any S >= ph leaves the
        # VALID window [kh-1, kh-1+th) exact — the FFT size is therefore
        # free to round up to a 7-smooth radix (halo-extended tiles land
        # on awkward sizes like 235 = 5*47; see _good_fft_size).
        # (A conv_general_dilated local apply was measured ~1800x slower
        # than the FFT on the v5e at HIGHEST precision — see NOTES.md.)
        ph, pw = padded.shape
        sy, sx = _good_fft_size(ph), _good_fft_size(pw)
        circ = jnp.fft.irfft2(
            jnp.fft.rfft2(padded, s=(sy, sx))
            * jnp.fft.rfft2(kernel, s=(sy, sx)),
            s=(sy, sx))
        return circ[kh - 1:kh - 1 + th,
                    kw - 1:kw - 1 + tw].astype(x.dtype)

    def A(x):
        return apply(kern, x)

    def AT(x):
        return apply(kern_t, x)

    return A, AT


def make_operator(psf: jnp.ndarray, image_shape: Tuple[int, int],
                  method: str = 'auto',
                  axis_names: Tuple[str, str] = ()) -> Tuple[Operator, Operator]:
    """Build (A, AT) for the given PSF / image geometry.

    'auto' picks: dense matmul for small same-shape stamps (MXU), rFFT OTF for
    large same-shape images, padded linear convolution when shapes differ.
    """
    same = tuple(psf.shape) == tuple(image_shape)
    if method == 'auto':
        if same:
            method = 'matmul' if psf.size <= _MATMUL_MAX_PIXELS else 'otf'
        else:
            method = 'linear'
    if method == 'matmul':
        if not same:
            raise ValueError('matmul operator requires PSF.shape == image.shape')
        return make_matmul_operator(psf)
    if method in ('matmul_flat', 'matmul_split'):
        if len(image_shape) != 1 or psf.size != image_shape[0]:
            raise ValueError(f'{method} operates on (H*W,) raveled images '
                             f'(psf {psf.shape}, image {image_shape})')
        if method == 'matmul_split':
            return make_matmul_flat_split_operator(psf)
        return make_matmul_flat_operator(psf)
    if method == 'otf':
        if not same:
            raise ValueError('otf operator requires PSF.shape == image.shape')
        return make_otf_operator(psf)
    if method == 'linear':
        return make_linear_operator(psf, image_shape)
    if method == 'halo':
        if len(axis_names) != 2:
            raise ValueError('halo operator needs 2 mesh axis names')
        return make_halo_operator(psf, axis_names)
    raise ValueError(f'unknown operator method: {method}')
