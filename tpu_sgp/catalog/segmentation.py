"""Source detection and deblending (photutils segmentation equivalents).

``detect_sources``: 8-connected labeling above a (scalar or per-pixel)
threshold with a minimum pixel count — the behaviour the reference gets from
photutils SourceFinder's detection stage (utils.py:235-242).

``deblend_sources``: multi-threshold peak tree + marker-based flood, the
same approach as photutils/SExtractor deblending (nlevels exponential
sub-thresholds, children kept when their flux exceeds ``contrast`` times
the blend total). The flood is a vectorized pass-based propagation (each
unassigned pixel takes the label of its brightest assigned neighbor), not a
per-pixel Python loop — catalog extraction is a host hot path.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
from scipy import ndimage

_STRUCT8 = np.ones((3, 3), dtype=bool)

_SHIFTS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
           (1, 1)]


class SegmentationImage:
    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data, np.int32)

    @property
    def labels(self):
        lab = np.unique(self.data)
        return lab[lab > 0]

    @property
    def nlabels(self):
        return self.labels.size

    def __len__(self):
        return self.nlabels


def detect_sources(data: np.ndarray, threshold, npixels: int = 5
                   ) -> Optional[SegmentationImage]:
    mask = np.asarray(data) > threshold
    lab, n = ndimage.label(mask, structure=_STRUCT8)
    if n == 0:
        return None
    sizes = np.bincount(lab.ravel(), minlength=n + 1)
    keep = sizes >= npixels
    keep[0] = False
    if not keep.any():
        return None
    remap = np.zeros(n + 1, np.int32)
    remap[keep] = np.arange(1, int(keep.sum()) + 1, dtype=np.int32)
    return SegmentationImage(remap[lab])


def _exponential_levels(lo: float, hi: float, nlevels: int) -> np.ndarray:
    """Exponentially spaced sub-thresholds in (lo, hi), photutils-style."""
    if hi <= lo:
        return np.array([])
    t = (np.geomspace(1.0, 100.0, nlevels + 2) - 1.0) / 99.0
    return lo + (hi - lo) * t[1:-1]


def _shifted(arr, dy, dx, fill):
    out = np.full_like(arr, fill)
    h, w = arr.shape
    ys = slice(max(dy, 0), min(h + dy, h))
    yd = slice(max(-dy, 0), min(h - dy, h))
    xs = slice(max(dx, 0), min(w + dx, w))
    xd = slice(max(-dx, 0), min(w - dx, w))
    out[ys, xs] = arr[yd, xd]
    return out


def _flood_assign(vals: np.ndarray, inseg: np.ndarray,
                  markers: np.ndarray) -> np.ndarray:
    """Propagate marker labels to every in-segment pixel: each unassigned
    pixel takes the label of its brightest already-assigned 8-neighbor.
    Vectorized passes; converges in O(segment diameter) iterations."""
    assign = markers.copy()
    nv = np.where(inseg, vals, -np.inf)
    for _ in range(vals.size):
        todo = inseg & (assign == 0)
        if not todo.any():
            break
        best_val = np.full(vals.shape, -np.inf)
        best_lab = np.zeros_like(assign)
        for dy, dx in _SHIFTS:
            lab_s = _shifted(assign, dy, dx, 0)
            val_s = np.where(lab_s > 0, _shifted(nv, dy, dx, -np.inf),
                             -np.inf)
            better = val_s > best_val
            best_val = np.where(better, val_s, best_val)
            best_lab = np.where(better, lab_s, best_lab)
        update = todo & (best_lab > 0)
        if not update.any():
            break
        assign[update] = best_lab[update]
    assign[inseg & (assign == 0)] = 1
    return assign


def _deblend_one(sub: np.ndarray, inseg: np.ndarray, det_threshold: float,
                 npixels: int, nlevels: int, contrast: float):
    """Deblend one segment given its bounding-box cutout ``sub`` and
    in-segment mask. Returns the per-pixel child assignment (1..k) over the
    cutout, or None when the segment hosts a single peak."""
    values = sub[inseg]
    total_flux = values.sum()
    levels = _exponential_levels(det_threshold, values.max(), nlevels)
    if levels.size == 0:
        return None

    # cheap pre-filter: a segment with a single local-maximum plateau cannot
    # deblend — skip the 32-level sweep (most segments are single stars).
    # (Two disjoint above-level components each contain a local max, so one
    # plateau implies one component at every level — the filter is EXACT.
    # An earlier 6-of-32-level coarse screen was NOT: it missed splits that
    # only appear at unprobed levels and made this path disagree with the
    # native sweep.)
    is_max = inseg & (sub >= ndimage.maximum_filter(
        np.where(inseg, sub, -np.inf), size=3))
    _, n_peaks = ndimage.label(is_max, structure=_STRUCT8)
    if n_peaks <= 1:
        return None

    # Peak "tree" top-down: components containing >= 2 surviving markers
    # stay split; brand-new components with enough pixels and flux seed new
    # markers.
    markers = np.zeros(sub.shape, np.int32)
    next_id = 1
    for level in levels[::-1]:
        lab, n = ndimage.label(inseg & (sub > level), structure=_STRUCT8)
        for comp in range(1, n + 1):
            m = lab == comp
            ids = np.unique(markers[m])
            ids = ids[ids > 0]
            if ids.size == 0:
                if m.sum() >= npixels and sub[m].sum() > contrast * total_flux:
                    markers[m] = next_id
                    next_id += 1
            elif ids.size == 1:
                markers[m] = ids[0]        # grow the existing marker
            # >= 2 ids: merge node — keep children separate (do nothing)
    if next_id <= 2:
        return None
    return _flood_assign(sub, inseg, markers)


def deblend_sources(data: np.ndarray, segm: SegmentationImage,
                    npixels: int = 5, nlevels: int = 32,
                    contrast: float = 0.001,
                    use_native: bool = True) -> SegmentationImage:
    """Split multi-peak segments (photutils deblend_sources equivalent).

    Dispatches each candidate segment to the C++ hot loop
    (tpu_sgp/native/deblend.cpp: marker tree + exact priority-queue
    watershed) when the toolchain is available; otherwise runs the
    vectorized NumPy path."""
    data = np.asarray(data, np.float64)
    native_mod = None
    if use_native:
        try:
            from . import native as _cnative
            if _cnative.available():
                native_mod = _cnative
        except Exception:
            native_mod = None
    seg = segm.data
    if native_mod is not None:
        # whole-frame native path: segment loop, bboxes, and cutout gathers
        # all inside ONE C call (labels are contiguous from detect_sources;
        # arbitrary label sets take the per-segment path below)
        nseg = int(seg.max())
        labs = segm.labels
        if labs.size == nseg and (labs == np.arange(1, nseg + 1)).all():
            out, _ = native_mod.deblend_all(data, seg, nseg, npixels,
                                            nlevels, contrast)
            return SegmentationImage(out)
    out = np.zeros_like(seg)
    next_label = 1
    slices = ndimage.find_objects(seg)
    for lab0, sl in enumerate(slices, start=1):
        if sl is None:
            continue
        inseg = seg[sl] == lab0
        sub = data[sl]
        if native_mod is not None:
            assign = native_mod.deblend_segment(sub, inseg, npixels,
                                                nlevels, contrast)
        else:
            det_thresh = sub[inseg].min()
            assign = _deblend_one(sub, inseg, det_thresh, npixels, nlevels,
                                  contrast)
        region = out[sl]
        if assign is None:
            region[inseg] = next_label
            next_label += 1
        else:
            k = int(assign[inseg].max())
            region[inseg] = assign[inseg] + (next_label - 1)
            next_label += k
    return SegmentationImage(out)


class SourceFinder:
    """Detection + deblending pipeline (photutils SourceFinder equivalent;
    reference utils.py:235)."""

    def __init__(self, npixels: int = 5, deblend: bool = True,
                 nlevels: int = 32, contrast: float = 0.001,
                 progress_bar: bool = False, nproc: int = 1):
        self.npixels = npixels
        self.deblend = deblend
        self.nlevels = nlevels
        self.contrast = contrast

    def __call__(self, data: np.ndarray, threshold
                 ) -> Optional[SegmentationImage]:
        segm = detect_sources(data, threshold, self.npixels)
        if segm is None:
            return None
        if self.deblend:
            segm = deblend_sources(data, segm, npixels=self.npixels,
                                   nlevels=self.nlevels,
                                   contrast=self.contrast)
        return segm
