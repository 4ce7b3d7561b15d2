"""Source detection and deblending (photutils segmentation equivalents).

``detect_sources``: 8-connected labeling above a (scalar or per-pixel)
threshold with a minimum pixel count — the behaviour the reference gets from
photutils SourceFinder's detection stage (utils.py:235-242).

``deblend_sources``: multi-threshold peak tree + descending-flood watershed,
the same approach as photutils/SExtractor deblending (nlevels exponential
sub-thresholds, children kept when their flux exceeds ``contrast`` times the
blend total), implemented natively.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
from scipy import ndimage

_STRUCT8 = np.ones((3, 3), dtype=bool)


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
    sizes = ndimage.sum_labels(np.ones_like(lab), lab, range(1, n + 1))
    keep = np.flatnonzero(sizes >= npixels) + 1
    if keep.size == 0:
        return None
    out = np.zeros_like(lab)
    for new, old in enumerate(keep, start=1):
        out[lab == old] = new
    return SegmentationImage(out)


def _exponential_levels(lo: float, hi: float, nlevels: int) -> np.ndarray:
    """Exponentially spaced sub-thresholds in (lo, hi), photutils-style."""
    if hi <= lo:
        return np.array([])
    t = (np.geomspace(1.0, 100.0, nlevels + 2) - 1.0) / 99.0
    return lo + (hi - lo) * t[1:-1]


def _deblend_one(values: np.ndarray, coords, shape, det_threshold: float,
                 npixels: int, nlevels: int, contrast: float) -> np.ndarray:
    """Deblend one segment. values: pixel values; coords: (ys, xs).
    Returns per-pixel child assignment (0..k-1) or None if single source."""
    ys, xs = coords
    y0, x0 = ys.min(), xs.min()
    sub = np.full((ys.max() - y0 + 1, xs.max() - x0 + 1), -np.inf)
    sub[ys - y0, xs - x0] = values
    inseg = np.isfinite(sub)
    total_flux = values.sum()

    levels = _exponential_levels(det_threshold, values.max(), nlevels)
    if levels.size == 0:
        return None

    # Build the peak "tree" top-down: at each level (high->low), components
    # that contain >= 2 surviving markers stay split; brand-new components
    # with enough pixels and flux seed new markers.
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
    nmark = len(np.unique(markers)) - 1
    if nmark <= 1:
        return None

    # Descending flood: assign every segment pixel to the marker of its
    # brightest already-assigned neighbor (watershed on -value).
    order = np.argsort(-values, kind='stable')
    assign = markers[ys - y0, xs - x0].copy()
    pos = {(int(ys[i] - y0), int(xs[i] - x0)): i for i in range(len(ys))}
    for _ in range(4):  # a few passes handle plateaus/disconnected ridges
        changed = False
        for i in order:
            if assign[i] > 0:
                continue
            py, px = int(ys[i] - y0), int(xs[i] - x0)
            best, bestval = 0, -np.inf
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    q = pos.get((py + dy, px + dx))
                    if q is not None and assign[q] > 0 and values[q] > bestval:
                        bestval = values[q]
                        best = assign[q]
            if best > 0:
                assign[i] = best
                changed = True
        if not changed or (assign > 0).all():
            break
    assign[assign == 0] = 1
    return assign


def deblend_sources(data: np.ndarray, segm: SegmentationImage,
                    npixels: int = 5, nlevels: int = 32,
                    contrast: float = 0.001) -> SegmentationImage:
    """Split multi-peak segments (photutils deblend_sources equivalent)."""
    data = np.asarray(data, np.float64)
    out = np.zeros_like(segm.data)
    next_label = 1
    for lab in segm.labels:
        mask = segm.data == lab
        ys, xs = np.nonzero(mask)
        values = data[ys, xs]
        det_thresh = values.min()
        assign = _deblend_one(values, (ys, xs), data.shape, det_thresh,
                              npixels, nlevels, contrast)
        if assign is None:
            out[ys, xs] = next_label
            next_label += 1
        else:
            for child in np.unique(assign):
                sel = assign == child
                out[ys[sel], xs[sel]] = next_label
                next_label += 1
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
