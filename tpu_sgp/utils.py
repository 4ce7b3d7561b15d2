"""Shared host-side utilities: robust statistics and small kernels."""
from __future__ import annotations

from typing import Tuple

import numpy as np


def sigma_clip(data: np.ndarray, sigma: float = 3.0,
               maxiters: int = 5) -> np.ndarray:
    """Iterative sigma clipping; returns a boolean mask of KEPT values
    (astropy SigmaClip semantics with median center and std)."""
    d = np.asarray(data, np.float64).ravel()
    keep = np.isfinite(d)
    for _ in range(maxiters):
        vals = d[keep]
        if vals.size == 0:
            break
        med = np.median(vals)
        std = np.std(vals)
        new = keep & (np.abs(d - med) <= sigma * std)
        if new.sum() == keep.sum():
            keep = new
            break
        keep = new
    return keep.reshape(np.shape(data))


def sigma_clipped_stats(data: np.ndarray, sigma: float = 3.0,
                        maxiters: int = 5) -> Tuple[float, float, float]:
    """(mean, median, std) of sigma-clipped data (astropy equivalent)."""
    keep = sigma_clip(data, sigma=sigma, maxiters=maxiters)
    vals = np.asarray(data, np.float64)[keep]
    if vals.size == 0:
        return np.nan, np.nan, np.nan
    return float(np.mean(vals)), float(np.median(vals)), float(np.std(vals))


GAUSSIAN_FWHM_TO_SIGMA = 1.0 / 2.354820045030949


def make_2dgaussian_kernel(fwhm: float, size: int = 3,
                           oversampling: int = 10) -> np.ndarray:
    """Normalized (sum=1) 2D Gaussian kernel — photutils
    make_2dgaussian_kernel equivalent.

    photutils builds the kernel via astropy ``Gaussian2DKernel`` with
    ``mode='oversample'`` (factor 10): each pixel holds the AVERAGE of the
    Gaussian over a 10x10 subgrid, not the center sample. The integrated
    kernel is slightly wider (center weight ~0.54 vs ~0.60 at FWHM 1.2),
    which suppresses ~8% more pixel noise in the convolved detection image
    — measurable in faint-tail source counts."""
    sig = fwhm * GAUSSIAN_FWHM_TO_SIGMA
    c = (size - 1) / 2.0
    sub = (np.arange(oversampling) + 0.5) / oversampling - 0.5
    y = np.arange(size)[:, None] + sub[None, :]  # (size, oversampling)
    g1 = np.exp(-((y - c) ** 2) / (2.0 * sig ** 2)).mean(axis=1)
    k = g1[:, None] * g1[None, :]
    return k / k.sum()


def convolve2d_fill(data: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """'same' convolution with zero-fill boundary (astropy convolve
    boundary='fill' without NaN handling)."""
    from scipy.ndimage import convolve
    return convolve(np.asarray(data, np.float64), kernel, mode='constant',
                    cval=0.0)
