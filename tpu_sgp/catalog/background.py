"""2D background estimation (photutils Background2D equivalent).

The reference estimates background with
``Background2D(data, box_size, filter_size=(3,3), MedianBackground())``
(/root/reference/restoration/utils.py:236-238): sigma-clipped median per
mesh box, 3x3 median filter over the mesh, spline upsampling to full
resolution. The RMS map is the sigma-clipped std per box.

The per-box sigma clipping is fully vectorized across the mesh (one
nanmedian/nanstd per clip iteration over the whole (ny, nx, box) stack)
— the workload calls this per stamp/tile, so it is a host hot path.
"""
from __future__ import annotations

from typing import Tuple, Union

import numpy as np
from scipy.ndimage import median_filter, zoom


def _nan_median_std(work: np.ndarray):
    """Vectorized (median, std) over the last axis ignoring NaNs.

    np.nanmedian falls back to a slow masked-array path for small arrays
    (dominating stamp-sized Background2D); a sort puts NaNs last, so the
    median comes from index arithmetic on the valid count.
    """
    valid = np.isfinite(work)
    n = valid.sum(axis=-1)
    n_safe = np.maximum(n, 1)
    srt = np.sort(work, axis=-1)                      # NaNs sort to the end
    lo = (n_safe - 1) // 2
    hi = n_safe // 2
    take = np.take_along_axis
    med = 0.5 * (take(srt, lo[..., None], -1)
                 + take(srt, hi[..., None], -1))[..., 0]
    filled = np.where(valid, work, 0.0)
    mean = filled.sum(axis=-1) / n_safe
    var = (np.where(valid, (work - mean[..., None]) ** 2, 0.0).sum(axis=-1)
           / n_safe)
    std = np.sqrt(var)
    med[n == 0] = np.nan
    std[n == 0] = np.nan
    return med, std


def _clipped_box_stats(boxes: np.ndarray, sigma: float, maxiters: int):
    """(median, std) per box with iterative sigma clipping, vectorized over
    the leading axes. boxes: (..., m)."""
    work = boxes.astype(np.float64, copy=True)
    # sort-based median wins for small boxes (np.nanmedian's masked-array
    # fallback dominates stamp-sized grids); introselect-based nanmedian
    # wins for large boxes
    if boxes.shape[-1] <= 512:
        stats = _nan_median_std
    else:
        def stats(w):
            return (np.nanmedian(w, axis=-1), np.nanstd(w, axis=-1))
    with np.errstate(invalid='ignore'):
        for _ in range(maxiters):
            med, std = stats(work)
            out = (np.abs(work - med[..., None])
                   > sigma * std[..., None])
            if not np.any(out & np.isfinite(work)):
                break
            work[out] = np.nan
        med, std = stats(work)
    # boxes that clipped away entirely fall back to raw stats
    bad = ~np.isfinite(med)
    if bad.any():
        med[bad] = np.median(boxes[bad], axis=-1)
        std[bad] = np.std(boxes[bad], axis=-1)
    return med, std


class Background2D:
    def __init__(self, data: np.ndarray,
                 box_size: Union[int, Tuple[int, int]],
                 filter_size: Tuple[int, int] = (3, 3),
                 sigma: float = 3.0, maxiters: int = 10):
        data = np.asarray(data, np.float64)
        if np.isscalar(box_size):
            box_size = (int(box_size), int(box_size))
        by, bx = int(box_size[0]), int(box_size[1])
        h, w = data.shape
        ny, nx = -(-h // by), -(-w // bx)

        # pad to a whole number of boxes (edge replication)
        ph, pw = ny * by - h, nx * bx - w
        padded = np.pad(data, ((0, ph), (0, pw)), mode='edge')

        boxes = padded.reshape(ny, by, nx, bx).swapaxes(1, 2).reshape(
            ny, nx, by * bx)
        mesh_med, mesh_std = _clipped_box_stats(boxes, sigma, maxiters)

        if filter_size is not None and ny * nx > 1:
            fy = min(filter_size[0], ny)
            fx = min(filter_size[1], nx)
            if fy > 1 or fx > 1:
                mesh_med = median_filter(mesh_med, size=(fy, fx),
                                         mode='nearest')
                mesh_std = median_filter(mesh_std, size=(fy, fx),
                                         mode='nearest')

        self.background_mesh = mesh_med
        self.background_rms_mesh = mesh_std
        self.background_median = float(np.median(mesh_med))
        self.background_rms_median = float(np.median(mesh_std))

        order = 3 if min(ny, nx) >= 4 else 1
        self.background = self._upsample(mesh_med, (by, bx), (h, w), order)
        self.background_rms = self._upsample(mesh_std, (by, bx), (h, w),
                                             order)

    @staticmethod
    def _upsample(mesh, box, out_shape, order):
        if mesh.size == 1:
            return np.full(out_shape, mesh.ravel()[0])
        up = zoom(mesh, box, order=order, mode='reflect', grid_mode=True)
        # clip spline overshoot to the mesh value range (photutils
        # BkgZoomInterpolator does the same) — unclipped order-3 splines ring
        # around source-dominated boxes and can drive the RMS map negative
        up = np.clip(up, mesh.min(), mesh.max())
        return up[:out_shape[0], :out_shape[1]]
