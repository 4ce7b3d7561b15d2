"""2D background estimation (photutils Background2D equivalent).

The reference estimates background with
``Background2D(data, box_size, filter_size=(3,3), MedianBackground())``
(/root/reference/restoration/utils.py:236-238): sigma-clipped median per
mesh box, 3x3 median filter over the mesh, spline upsampling to full
resolution. The RMS map is the sigma-clipped std per box.

The per-box sigma clipping is fully vectorized across the mesh (single-sort
window narrowing, see ``_clip.py``), and the spline upsampling runs as two
separable BLAS matmuls — the workload calls this per stamp/tile and per
survey frame, so it is a host hot path at both stamp and megapixel scale.
"""
from __future__ import annotations

from typing import Tuple, Union

import numpy as np
from scipy.ndimage import median_filter, spline_filter


from ._clip import clipped_box_stats as _clipped_box_stats


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
        up = _zoom_separable(mesh, box, order)
        # clip spline overshoot to the mesh value range (photutils
        # BkgZoomInterpolator does the same) — unclipped order-3 splines ring
        # around source-dominated boxes and can drive the RMS map negative
        up = np.clip(up, mesh.min(), mesh.max())
        return up[:out_shape[0], :out_shape[1]]


def _bspline3(t: np.ndarray) -> np.ndarray:
    at = np.abs(t)
    return np.where(at <= 1.0, (4.0 - 6.0 * at * at + 3.0 * at ** 3) / 6.0,
                    np.where(at < 2.0, (2.0 - at) ** 3 / 6.0, 0.0))


def _reflect_index(j: np.ndarray, n: int) -> np.ndarray:
    """scipy 'reflect' boundary folding ((d c b a | a b c d | d c b a))."""
    if n == 1:
        return np.zeros_like(j)
    j = np.mod(j, 2 * n)
    return np.where(j >= n, 2 * n - 1 - j, j)


_ZOOM_W_CACHE: dict = {}


def _zoom_axis_weights(n_in: int, factor: int, order: int) -> np.ndarray:
    """(n_in*factor, n_in) interpolation-weight matrix for one axis of a
    grid_mode zoom: output sample i reads input coordinate
    x = (i + 0.5)/factor - 0.5 through the order-1/3 B-spline kernel with
    'reflect' folding."""
    key = (n_in, factor, order)
    w = _ZOOM_W_CACHE.get(key)
    if w is not None:
        return w
    n_out = n_in * factor
    x = (np.arange(n_out) + 0.5) / factor - 0.5
    w = np.zeros((n_out, n_in))
    if order == 1:
        base = np.floor(x).astype(np.int64)
        offsets = (0, 1)

        def kern(t):
            return np.maximum(1.0 - np.abs(t), 0.0)
    else:
        base = np.floor(x).astype(np.int64) - 1
        offsets = (0, 1, 2, 3)
        kern = _bspline3
    rows = np.arange(n_out)
    for o in offsets:
        j = base + o
        np.add.at(w, (rows, _reflect_index(j, n_in)), kern(x - j))
    _ZOOM_W_CACHE[key] = w
    return w


def _zoom_separable(mesh: np.ndarray, box, order: int) -> np.ndarray:
    """Integer-factor spline zoom (scipy ``zoom(..., mode='reflect',
    grid_mode=True)`` semantics) as two small matmuls.

    scipy's zoom evaluates the 2-D spline pointwise over the full output
    grid (~0.16 s for a 1 Mpx background map); a separable integer-factor
    zoom is (Wy @ spline_filter(mesh)) @ Wx.T with axis-weight matrices
    built once per (size, factor) — ~10 ms via BLAS. Agrees with scipy to
    roundoff (differentially tested)."""
    by, bx = int(box[0]), int(box[1])
    filt = (spline_filter(mesh, order=order, mode='reflect',
                          output=np.float64)
            if order > 1 else np.asarray(mesh, np.float64))
    wy = _zoom_axis_weights(mesh.shape[0], by, order)
    wx = _zoom_axis_weights(mesh.shape[1], bx, order)
    return wy @ filt @ wx.T
