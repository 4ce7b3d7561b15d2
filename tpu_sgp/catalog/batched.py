"""Batched brightest-source flux over a stack of small cutouts.

The star-stamps workload scores every (stamp, beta-candidate) restoration
by the catalog flux of its brightest source
(/root/reference/restoration/application_sgp_star_stamps.py:90-97); at the
reference's n=1121 stamps x 5 candidates that was ~5.6k serial
``source_info`` calls — the workload's host wall. Here the whole stack
runs through ONE vectorized pipeline that reproduces ``source_info``'s
stages exactly (same code paths where they are already batched, same
arithmetic where re-expressed):

  Background2D  — masked pad / exclude / clipped stats (already vectorized
                  over leading axes), fixed-geometry Shepard-IDW fill as a
                  weight matmul, batched NaN-window mesh filter, zoom as
                  einsum over the same axis-weight matrices
  convolution   — one 3-D ndimage.convolve (plane-confined kernel)
  detection     — one 3-D 8-connected label with a plane-confined
                  structure (no cross-stamp connectivity), npixels filter
  flux          — per-label sums of the background-subtracted data

Deblending cannot change which FLUX is brightest unless some segment
actually hosts >1 local-maximum plateau (the exact pre-filter of
``segmentation._deblend_one``); stamps where that happens run the real
deblender on the ALREADY-COMPUTED convolved image and labels (identical
inputs -> identical children), so selected betas are identical to the
serial loop by construction. An earlier fallback re-ran the whole
``source_info`` per multi-peak stamp — and DECONVOLVED stamps are almost
all multi-peak (ripples around the restored star), so the workload paid
~3.5k serial background estimations again; now only the per-segment
deblend runs.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage

from ..utils import make_2dgaussian_kernel
from ._clip import clipped_box_stats
from .background import (Background2D, _knn_idw_query, _nanmedian_filter,
                         _zoom_axis_weights)


def _batched_background(cutouts: np.ndarray, box: int = 5,
                        filter_size: int = 3, sigma: float = 3.0,
                        maxiters: int = 10, exclude_percentile: float = 10.0):
    """(background, rms) maps for a (N, H, W) stack — Background2D
    semantics vectorized over N (pad geometry is shared, so the exclusion
    mask and all weight matrices are computed once).

    Stamps with non-finite DATA pixels (e.g. a diverged f32 candidate
    restoration) cannot share the fixed-geometry path at all: serial
    Background2D counts data NaNs into each box's exclusion test, so a
    partially-NaN box may be excluded serially while its clipped stats
    stay finite here — those stamps are sliced out FIRST and delegated to
    the serial class, which is exact by construction (running them through
    the batched stages only to overwrite the result would pay both
    paths)."""
    from scipy.ndimage import spline_filter1d

    n, h, w = cutouts.shape
    irregular = ~np.isfinite(cutouts).all(axis=(1, 2))
    bkg = np.empty((n, h, w), np.float64)
    rms = np.empty((n, h, w), np.float64)
    reg = np.flatnonzero(~irregular)
    sub = cutouts if reg.size == n else cutouts[reg]
    if reg.size:
        m = reg.size
        ny, nx = -(-h // box), -(-w // box)
        ph, pw = ny * box - h, nx * box - w
        padded = np.pad(sub.astype(np.float64, copy=False),
                        ((0, 0), (0, ph), (0, pw)), mode='constant',
                        constant_values=np.nan)
        boxes = padded.reshape(m, ny, box, nx, box).swapaxes(2, 3).reshape(
            m, ny, nx, box * box)
        med, std = clipped_box_stats(boxes, sigma, maxiters,
                                     extra_median_iters=5)

        # geometry-only exclusion mask (the regular stamps have no NaNs)
        nbad = np.zeros((ny, nx), np.int64)
        if ph:
            nbad[-1, :] += ph * box
        if pw:
            nbad[:, -1] += pw * box
            if ph:
                nbad[-1, -1] = box * box - (box - ph) * (box - pw)
        good = nbad <= (exclude_percentile / 100.0) * (box * box)
        if not good.any():
            # degenerate geometry (e.g. cutouts narrower than a box): keep
            # the least-masked cells, exactly like the serial Background2D
            # fallback
            good = nbad == nbad.min()
        if not good.all():
            # fixed-geometry Shepard fill as ONE gather + weight
            # contraction: the neighbor sets, tie-breaks, and weights are
            # shared with the serial _idw_fill through _knn_idw_query
            _, (by_, bx_), idx, wgt = _knn_idw_query(good)
            wsum = wgt.sum(axis=1)
            gy, gx = np.nonzero(good)
            for mesh in (med, std):
                vals = mesh[:, gy, gx]                   # (m, n_good)
                mesh[:, by_, bx_] = (vals[:, idx] * wgt).sum(axis=2) / wsum
        if ny * nx > 1:
            fy = min(filter_size, 2 * ny - 1)
            fx = min(filter_size, 2 * nx - 1)
            if fy > 1 or fx > 1:
                med = _nanmedian_filter(med, (fy, fx))
                std = _nanmedian_filter(std, (fy, fx))

        order = 3 if min(ny, nx) >= 4 else 1
        wy = _zoom_axis_weights(ny, box, order, grid_mode=False)
        wx = _zoom_axis_weights(nx, box, order, grid_mode=False)
        for mesh, out in ((med, bkg), (std, rms)):
            if order > 1:
                filt = spline_filter1d(mesh, order=order, axis=1,
                                       mode='reflect', output=np.float64)
                filt = spline_filter1d(filt, order=order, axis=2,
                                       mode='reflect', output=np.float64)
            else:
                filt = mesh
            up = np.einsum('ab,nbc,dc->nad', wy, filt, wx)
            out[reg] = up[:, :h, :w]
    for i in np.flatnonzero(irregular):
        b = Background2D(cutouts[i], (box, box),
                         filter_size=(filter_size, filter_size),
                         sigma=sigma, maxiters=maxiters,
                         exclude_percentile=exclude_percentile)
        bkg[i] = b.background
        rms[i] = b.background_rms
    return bkg, rms


_PLANE8 = np.zeros((3, 3, 3), bool)
_PLANE8[1] = True
_STRUCT8 = np.ones((3, 3), bool)


def brightest_catalog_fluxes(cutouts: np.ndarray, n_pixels: int = 5,
                             sigma_threshold: float = 1.5) -> np.ndarray:
    """Brightest-source ``segment_flux`` per cutout (NaN when nothing is
    detected). Matches ``source_info(cutout)`` + argmax(segment_flux)
    exactly; see the module docstring for the fallback rule."""
    from .segmentation import SegmentationImage, deblend_sources

    cutouts = np.asarray(cutouts, np.float64)
    n, h, w = cutouts.shape
    bkg_map, rms_map = _batched_background(cutouts)
    data_sub = cutouts - bkg_map
    kern = make_2dgaussian_kernel(1.2, size=3)
    conv = ndimage.convolve(data_sub, kern[None], mode='constant', cval=0.0)
    # source_info floors the threshold at 0 (np.maximum(..., threshold_floor
    # =0.0)) — without it, regions where spline overshoot drives the RMS
    # map negative detect everything and the batched mask diverges from
    # the serial path
    mask = conv > np.maximum(sigma_threshold * rms_map, 0.0)

    lab, nlab = ndimage.label(mask, structure=_PLANE8)
    out = np.full(n, np.nan)
    if nlab == 0:
        return out
    sizes = np.bincount(lab.ravel(), minlength=nlab + 1)
    keep = sizes >= n_pixels
    keep[0] = False
    lab = np.where(keep[lab], lab, 0)
    if not keep.any():
        return out
    fluxes = ndimage.sum_labels(data_sub, lab,
                                index=np.arange(1, nlab + 1))

    # stamps where some surviving segment hosts >1 local-max plateau can
    # deblend — delegate those to the exact serial path. The screen itself
    # is fully vectorized (the labels from ndimage.label are globally
    # unique across the stack, so per-segment/per-plateau facts reduce to
    # bincounts): an earlier per-stamp, per-segment Python loop over
    # np.unique + full-stamp masks walked ~1e8 elements at workload scale.
    inseg = lab > 0
    neigh_max = ndimage.maximum_filter(np.where(inseg, conv, -np.inf),
                                       size=(1, 3, 3))
    is_max = inseg & (conv >= neigh_max)
    mlab, nplat = ndimage.label(is_max, structure=_PLANE8)

    flat = np.flatnonzero(lab.ravel())             # in-segment pixels
    seg_stamp = np.zeros(nlab + 1, np.int64)       # segment -> stamp index
    seg_stamp[lab.ravel()[flat]] = flat // (h * w)
    # each 8-connected plateau lies inside exactly ONE segment (two
    # distinct 8-connected segments are never 8-adjacent), so any of its
    # pixels names that segment
    msel = np.flatnonzero(mlab.ravel())
    plat_seg = np.zeros(nplat + 1, np.int64)       # plateau -> segment
    plat_seg[mlab.ravel()[msel]] = lab.ravel()[msel]
    npeaks = np.bincount(plat_seg[1:], minlength=nlab + 1)
    stamp_multi = np.zeros(n, bool)
    stamp_multi[seg_stamp[np.flatnonzero(npeaks > 1)]] = True

    # single-plateau stamps: brightest kept-segment flux, one scatter-max
    ids = np.flatnonzero(keep)
    best = np.full(n, -np.inf)
    np.maximum.at(best, seg_stamp[ids], fluxes[ids - 1])
    sel = ~stamp_multi & (best > -np.inf)
    out[sel] = best[sel]

    for i in np.flatnonzero(stamp_multi):
        li = lab[i]
        present = np.unique(li[li > 0])
        # deblend THIS stamp's already-computed labels on the
        # already-computed convolved image (same inputs as the serial
        # path -> same children), then take the brightest child's
        # data_sub sum — exactly SourceCatalog's segment_flux
        remap = np.zeros(int(li.max()) + 1, np.int32)
        remap[present] = np.arange(1, present.size + 1, dtype=np.int32)
        deb = deblend_sources(conv[i], SegmentationImage(remap[li]),
                              npixels=n_pixels)
        # present.size >= 1 and the deblender labels every in-segment
        # pixel, so fl always has at least one entry
        fl = ndimage.sum_labels(
            data_sub[i], deb.data,
            index=np.arange(1, int(deb.data.max()) + 1))
        out[i] = float(np.max(fl))
    return out
