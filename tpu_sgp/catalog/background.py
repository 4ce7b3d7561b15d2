"""2D background estimation (photutils Background2D equivalent).

The reference estimates background with
``Background2D(data, box_size, filter_size=(3,3), MedianBackground())``
(/root/reference/restoration/utils.py:236-238). The photutils pipeline this
must reproduce, step by step:

1. Pad on the top/right to a whole number of boxes with MASKED (NaN)
   pixels (``edge_method='pad'``) — not replicated data.
2. Exclude boxes with more than ``exclude_percentile`` % masked pixels
   (default 10.0); a 60px box on a 450px frame leaves half-masked edge
   boxes, ALL of which get excluded.
3. Sigma-clip the remaining boxes (``SigmaClip(3.0, maxiters=10)``) and
   take the median / std per box (``MedianBackground`` re-clips with its
   own ``SigmaClip(3.0, maxiters=5)`` — see ``_clip.clipped_box_stats``).
4. Fill the excluded mesh cells by Shepard inverse-distance weighting of
   the 10 nearest good cells (power=1) — in a crowded field this pulls the
   high interior RMS into the edge band, RAISING the edge threshold well
   above any locally-computed value.
5. Median-filter the mesh 3x3 via ``generic_filter(nanmedian,
   mode='constant', cval=nan)`` — edge windows take the median of the
   in-bounds cells only.
6. Spline-zoom (order 3, 'reflect', legacy pre-grid_mode coordinate
   mapping — see ``_zoom_separable``) to the PADDED size, then crop.

Steps 1/2/4/5 were the round-2 deviation that made the crowded-field
detection count 480 vs the paper's 392: edge-replicated padding computed a
LOCAL (low) RMS on the outer band where photutils substitutes the IDW
average of the star-covered interior.

The per-box sigma clipping is fully vectorized across the mesh (single-sort
window narrowing, see ``_clip.py``), and the spline upsampling runs as two
separable BLAS matmuls — the workload calls this per stamp/tile and per
survey frame, so it is a host hot path at both stamp and megapixel scale.
"""
from __future__ import annotations

from typing import Tuple, Union

import numpy as np
from scipy.ndimage import spline_filter
from numpy.lib.stride_tricks import sliding_window_view


from ._clip import clipped_box_stats as _clipped_box_stats


def _knn_idw_query(good: np.ndarray, n_neighbors: int = 10,
                   power: float = 1.0):
    """Shared Shepard-fill geometry: nearest good-cell indices and inverse-
    distance weights for every ``~good`` cell (photutils
    ``_interpolate_meshes`` semantics: n_neighbors=10, power=1, reg=0).
    Neighbor lookup via cKDTree like photutils' ShepardIDWInterpolator — a
    brute-force distance matrix cost 0.6 s on a megapixel frame's 205x205
    mesh, and tie-breaking must be IDENTICAL between the serial fill below
    and the batched fill in ``batched._batched_background`` (equidistant
    neighbors picked differently would make the two paths disagree at tie
    cells). Returns ((gy, gx), (by, bx), idx, w)."""
    from scipy.spatial import cKDTree

    gy, gx = np.nonzero(good)
    by_, bx_ = np.nonzero(~good)
    k = min(n_neighbors, gy.size)
    dk, idx = cKDTree(np.c_[gy, gx]).query(np.c_[by_, bx_], k=k)
    dk = dk.reshape(len(by_), k)
    idx = idx.reshape(len(by_), k)
    w = 1.0 / np.maximum(dk, 1e-30) ** power
    return (gy, gx), (by_, bx_), idx, w


def _apply_idw(mesh: np.ndarray, query) -> np.ndarray:
    """Apply a precomputed ``_knn_idw_query`` fill to one mesh."""
    (gy, gx), (by_, bx_), idx, w = query
    out = mesh.copy()
    vals = mesh[gy, gx]
    out[by_, bx_] = (w * vals[idx]).sum(axis=1) / w.sum(axis=1)
    return out


def _idw_fill(mesh: np.ndarray, good: np.ndarray, n_neighbors: int = 10,
              power: float = 1.0) -> np.ndarray:
    """Fill ``~good`` cells by Shepard inverse-distance weighting of the
    ``n_neighbors`` nearest good cells (see ``_knn_idw_query``)."""
    if good.all() or not good.any():
        return mesh
    return _apply_idw(mesh, _knn_idw_query(good, n_neighbors, power))


def _nanmedian_filter(mesh: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """photutils mesh filter: ``generic_filter(nanmedian, mode='constant',
    cval=nan)`` — edge windows use only the in-bounds cells. Operates on
    the LAST TWO axes (leading axes batch). Even window sizes use scipy's
    origin convention (window offsets [-s//2, s - s//2 - 1]); a symmetric
    pad there returned a mesh one row/column too large."""
    fy, fx = int(size[0]), int(size[1])
    pads = [(0, 0)] * (mesh.ndim - 2)
    pads += [(fy // 2, fy - 1 - fy // 2), (fx // 2, fx - 1 - fx // 2)]
    pad = np.pad(mesh, pads, mode='constant', constant_values=np.nan)
    win = sliding_window_view(pad, (fy, fx), axis=(-2, -1))
    flat = win.reshape(win.shape[:-2] + (-1,))
    with np.errstate(all='ignore'):
        return np.nanmedian(flat, axis=-1)


class Background2D:
    def __init__(self, data: np.ndarray,
                 box_size: Union[int, Tuple[int, int]],
                 filter_size: Tuple[int, int] = (3, 3),
                 sigma: float = 3.0, maxiters: int = 10,
                 exclude_percentile: float = 10.0):
        data = np.asarray(data, np.float64)
        if np.isscalar(box_size):
            box_size = (int(box_size), int(box_size))
        by, bx = int(box_size[0]), int(box_size[1])
        h, w = data.shape
        ny, nx = -(-h // by), -(-w // bx)

        # pad to a whole number of boxes with masked (NaN) pixels
        ph, pw = ny * by - h, nx * bx - w
        padded = np.pad(data, ((0, ph), (0, pw)), mode='constant',
                        constant_values=np.nan)

        boxes = padded.reshape(ny, by, nx, bx).swapaxes(1, 2).reshape(
            ny, nx, by * bx)
        nbad = (~np.isfinite(boxes)).sum(axis=-1)
        good = nbad <= (exclude_percentile / 100.0) * (by * bx)
        if not good.any():
            good = nbad == nbad.min()  # degenerate: keep the least-masked
        mesh_med, mesh_std = _clipped_box_stats(boxes, sigma, maxiters,
                                                extra_median_iters=5)
        good_med = good & np.isfinite(mesh_med)
        good_std = good & np.isfinite(mesh_std)
        if (np.array_equal(good_med, good_std) and not good_med.all()
                and good_med.any()):
            # one KNN query serves both meshes (the common case: the two
            # masks only differ when exactly one statistic went non-finite)
            q = _knn_idw_query(good_med)
            mesh_med = _apply_idw(mesh_med, q)
            mesh_std = _apply_idw(mesh_std, q)
        else:
            mesh_med = _idw_fill(mesh_med, good_med)
            mesh_std = _idw_fill(mesh_std, good_std)

        if filter_size is not None and ny * nx > 1:
            fy = min(filter_size[0], 2 * ny - 1)
            fx = min(filter_size[1], 2 * nx - 1)
            if fy > 1 or fx > 1:
                mesh_med = _nanmedian_filter(mesh_med, (fy, fx))
                mesh_std = _nanmedian_filter(mesh_std, (fy, fx))

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


def _zoom_axis_weights(n_in: int, factor: int, order: int,
                       grid_mode: bool) -> np.ndarray:
    """(n_in*factor, n_in) interpolation-weight matrix for one axis of a
    scipy zoom: output sample i reads input coordinate
    x = (i + 0.5)/factor - 0.5 (grid_mode) or x = i*(n_in-1)/(n_out-1)
    (legacy edge-aligned mapping) through the order-1/3 B-spline kernel
    with 'reflect' folding."""
    key = (n_in, factor, order, grid_mode)
    w = _ZOOM_W_CACHE.get(key)
    if w is not None:
        return w
    n_out = n_in * factor
    if grid_mode:
        x = (np.arange(n_out) + 0.5) / factor - 0.5
    else:
        x = np.arange(n_out) * ((n_in - 1) / max(n_out - 1, 1))
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


def _zoom_separable(mesh: np.ndarray, box, order: int,
                    grid_mode: bool = False) -> np.ndarray:
    """Integer-factor spline zoom (scipy ``zoom(..., mode='reflect')``
    semantics, legacy edge-aligned mapping by default) as two small
    matmuls.

    ``grid_mode=False`` reproduces the pre-scipy-1.6 zoom coordinate
    mapping that the paper-era photutils ``BkgZoomInterpolator`` used
    (photutils adopted ``grid_mode=True`` later); on the bundled crowded
    M13 frame the legacy mapping reproduces the paper's source count
    392->396 where grid_mode gives 409+ (the mesh is value-structured
    there, so the half-box coordinate shift moves thresholds).

    scipy's zoom evaluates the 2-D spline pointwise over the full output
    grid (~0.16 s for a 1 Mpx background map); a separable integer-factor
    zoom is (Wy @ spline_filter(mesh)) @ Wx.T with axis-weight matrices
    built once per (size, factor) — ~10 ms via BLAS. Agrees with scipy to
    roundoff (differentially tested)."""
    by, bx = int(box[0]), int(box[1])
    filt = (spline_filter(mesh, order=order, mode='reflect',
                          output=np.float64)
            if order > 1 else np.asarray(mesh, np.float64))
    wy = _zoom_axis_weights(mesh.shape[0], by, order, grid_mode)
    wx = _zoom_axis_weights(mesh.shape[1], bx, order, grid_mode)
    return wy @ filt @ wx.T
