"""Sorted-window sigma clipping for Background2D box statistics.

Sigma clipping removes exactly the values outside [med - s*std, med + s*std]
— a CONTIGUOUS range in sorted order. So the boxes are sorted ONCE and each
clip iteration only narrows per-box [lo, hi) index bounds, with median /
mean / var recovered from prefix sums in O(1) per box. Results are identical
to the remove-and-recompute loop over the FINITE values (all non-finite
entries are masked to NaN up front so they sort to the end — a raw -inf
would sort to the FRONT, sit inside the window with a zeroed prefix-sum
contribution, and silently skew the statistics), without re-sorting or
re-scanning per iteration. After the first pass only the boxes whose window is still
narrowing are revisited — most converge in 1-2 clips, so late iterations
touch a small active subset instead of the whole mesh.
"""
from __future__ import annotations

import numpy as np


def _window_stats(srt, s1, s2, lo, hi):
    """(median, std) of the sorted rows ``srt`` restricted to [lo, hi).
    srt: (n, m) OFFSET sorted rows (a per-box shift subtracted — see
    ``clipped_box_stats``; medians/stds are shift-invariant apart from the
    median offset the caller re-adds); s1/s2: (n, m+1) prefix sums of the
    offset values/squares; lo/hi: (n,) window bounds."""
    rows = np.arange(srt.shape[0])
    cnt = np.maximum(hi - lo, 1)
    ssum = s1[rows, hi] - s1[rows, lo]
    ssq = s2[rows, hi] - s2[rows, lo]
    mean = ssum / cnt
    var = np.maximum(ssq / cnt - mean * mean, 0.0)
    mi = lo + (cnt - 1) // 2
    hi_i = lo + cnt // 2
    med = 0.5 * (srt[rows, mi] + srt[rows, hi_i])
    return med, np.sqrt(var)


def clipped_box_stats(boxes: np.ndarray, sigma: float, maxiters: int,
                      extra_median_iters: int = 0):
    """(median, std) per box with iterative sigma clipping, vectorized over
    the leading axes. boxes: (..., m).

    ``extra_median_iters``: photutils' ``Background2D`` default estimators
    are built with ``sigma_clip=None``, but the reference passes
    ``MedianBackground()`` whose own ``SigmaClip(3.0, maxiters=5)`` re-clips
    the already-clipped boxes before taking the median
    (/root/reference/restoration/utils.py:236-237). Re-clipping converged
    data is a no-op; it only bites when the first clip hit ``maxiters``
    before converging — so the double clip is exactly "continue narrowing
    for up to 5 more iterations, but report the std from iteration
    ``maxiters``". The returned median uses ``maxiters+extra`` iterations,
    the returned std exactly ``maxiters``."""
    shape = boxes.shape[:-1]
    mdim = boxes.shape[-1]
    vals = boxes.astype(np.float64, copy=False)
    nonfin = ~np.isfinite(vals)
    if nonfin.any():
        # mask EVERY non-finite value to NaN so it sorts past the finite
        # window; -inf would otherwise sort to the front and corrupt the
        # window bounds (clipping is defined over the finite values,
        # matching utils.sigma_clip's isfinite pre-mask)
        vals = np.where(nonfin, np.nan, vals)
    srt = np.sort(vals, axis=-1)
    nbox = int(np.prod(shape)) if shape else 1
    srt = srt.reshape(nbox, mdim)
    nvalid = np.isfinite(srt).sum(axis=-1)
    finite = np.isfinite(srt)
    # Shift each box by its raw median before building prefix sums: the
    # E[x^2]-E[x]^2 variance identity cancels catastrophically when
    # mean >> std (a flat 6e4-count sky box with std 1e-5 came back 300x
    # too large), and medians/windows are shift-invariant, so working on
    # offsets makes the prefix-sum variance as accurate as the direct
    # (x-mean)^2 form. The offset is re-added to the returned medians.
    mid_lo = np.maximum((nvalid - 1) // 2, 0)
    mid_hi = np.maximum(nvalid // 2, 0)
    rows0 = np.arange(nbox)
    offset = 0.5 * (np.where(nvalid > 0, srt[rows0, mid_lo], 0.0)
                    + np.where(nvalid > 0, srt[rows0, mid_hi], 0.0))
    srt = srt - offset[:, None]
    z = np.where(finite, srt, 0.0)
    s1 = np.zeros((nbox, mdim + 1))
    s2 = np.zeros((nbox, mdim + 1))
    np.cumsum(z, axis=-1, out=s1[:, 1:])
    np.cumsum(z * z, axis=-1, out=s2[:, 1:])

    lo = np.zeros(nbox, np.int64)
    hi = nvalid.astype(np.int64)
    med, std = _window_stats(srt, s1, s2, lo, hi)
    std_out = None
    active = np.arange(nbox)
    for it in range(maxiters + extra_median_iters):
        if it == maxiters:
            std_out = std.copy()  # std is pinned at the first clip's depth
        s_a = srt[active]
        lo_val = med[active] - sigma * std[active]
        hi_val = med[active] + sigma * std[active]
        # clip x with |x - med| > sigma*std, i.e. keep lo_val <= x <= hi_val
        below = np.sum(s_a < lo_val[:, None], axis=-1)
        in_or_below = np.sum(s_a <= hi_val[:, None], axis=-1)
        new_lo = np.maximum(lo[active], below)
        new_hi = np.minimum(hi[active], in_or_below)
        new_hi = np.maximum(new_hi, new_lo)  # guard inverted windows
        changed = (new_lo != lo[active]) | (new_hi != hi[active])
        if not changed.any():
            break
        upd = active[changed]
        lo[upd] = new_lo[changed]
        hi[upd] = new_hi[changed]
        med_u, std_u = _window_stats(srt[upd], s1[upd], s2[upd],
                                     lo[upd], hi[upd])
        med[upd] = med_u
        std[upd] = std_u
        active = upd

    if std_out is not None:
        std = std_out  # continuation iterations only refined the median
    med = med + offset  # back to the input value scale
    empty = ((hi - lo) <= 0) | (nvalid == 0)
    med[empty] = np.nan
    std[empty] = np.nan
    med = med.reshape(shape)
    std = std.reshape(shape)
    # boxes that clipped away entirely fall back to raw stats over the
    # finite values (``vals`` has every non-finite entry masked to NaN)
    bad = ~np.isfinite(med)
    if bad.any():
        with np.errstate(all='ignore'):
            med[bad] = np.nanmedian(vals[bad], axis=-1)
            std[bad] = np.nanstd(vals[bad], axis=-1)
    return med, std
