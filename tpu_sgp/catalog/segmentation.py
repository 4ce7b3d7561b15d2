"""Source detection and deblending (photutils segmentation equivalents).

``detect_sources``: 8-connected labeling above a (scalar or per-pixel)
threshold with a minimum pixel count — the behaviour the reference gets from
photutils SourceFinder's detection stage (utils.py:235-242).

``deblend_sources``: photutils' multi-threshold segment tree + watershed.
Per blended segment: at each of ``nlevels`` geometric sub-thresholds
between the segment min and max, the above-level components that pass BOTH
``npixels`` and the ``contrast`` flux-ratio test are recorded when at
least two pass; the recorded levels are then combined top-down (higher-
level splits refine the lower components they intersect, lower-only
components join as extra markers) and the final markers flood the segment
by a brightest-frontier watershed on the convolved data. Validated against
the paper's own photutils catalogs: sparse M13 field 103/103 sources
matched <1 px, crowded core 409 detections vs the paper's 392 with 0.84
matched <2 px (tests/test_real_data_catalog.py).
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


def _deblend_levels(vmin: float, vmax: float, nlevels: int) -> np.ndarray:
    """photutils 'exponential' sub-thresholds: ``nlevels`` geometric steps
    strictly between the segment min and max (linear fallback when the
    minimum is non-positive), matching photutils deblend_sources
    mode='exponential'."""
    steps = np.arange(1.0, nlevels + 1)
    if vmin <= 0:
        return vmin + ((vmax - vmin) / (nlevels + 1)) * steps
    return vmin * ((vmax / vmin) ** (steps / (nlevels + 1)))


def _watershed_assign(vals: np.ndarray, inseg: np.ndarray,
                      markers: np.ndarray) -> np.ndarray:
    """Brightest-frontier watershed: grow marker basins over the segment by
    repeatedly expanding from the brightest queued pixel (skimage
    ``watershed(-vals, markers, mask)`` semantics, 8-connected).
    O(N log N) via a heap — replaces a pass-based flood whose worst case on
    a filamentary segment was O(diameter) full-frame sweeps."""
    import heapq

    h, w = vals.shape
    out = markers.copy()
    pq = []
    cnt = 0
    ys, xs = np.nonzero(out > 0)  # raster order, matching the C++ seeding
    for y, x in zip(ys.tolist(), xs.tolist()):
        pq.append((-float(vals[y, x]), cnt, y, x))
        cnt += 1
    heapq.heapify(pq)
    while pq:
        _, _, y, x = heapq.heappop(pq)
        lab = out[y, x]
        for dy, dx in _SHIFTS:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and inseg[ny, nx] \
                    and out[ny, nx] == 0:
                out[ny, nx] = lab
                heapq.heappush(pq, (-float(vals[ny, nx]), cnt, ny, nx))
                cnt += 1
    out[inseg & (out == 0)] = 1
    return out


def _deblend_one(sub: np.ndarray, inseg: np.ndarray, det_threshold: float,
                 npixels: int, nlevels: int, contrast: float):
    """Deblend one segment given its bounding-box cutout ``sub`` and
    in-segment mask (photutils _deblend_source tree semantics). Returns the
    per-pixel child assignment (1..k) over the cutout, or None when the
    segment hosts a single significant peak."""
    values = sub[inseg]
    total_flux = values.sum()
    vmax = values.max()
    if not (vmax > det_threshold):
        return None

    # cheap pre-filter: a segment with a single local-maximum plateau cannot
    # deblend — skip the 32-level sweep (most segments are single stars).
    # (Two disjoint above-level components each contain a local max, so one
    # plateau implies one component at every level — the filter is EXACT.)
    is_max = inseg & (sub >= ndimage.maximum_filter(
        np.where(inseg, sub, -np.inf), size=3))
    _, n_peaks = ndimage.label(is_max, structure=_STRUCT8)
    if n_peaks <= 1:
        return None

    levels = _deblend_levels(values.min(), vmax, nlevels)

    # 1. record every level whose above-level components include >= 2
    #    passing BOTH the npixels and contrast tests (the segment "tree")
    tree = []
    for level in levels:
        lab, n = ndimage.label(inseg & (sub > level), structure=_STRUCT8)
        if n < 2:
            continue
        sizes = np.bincount(lab.ravel(), minlength=n + 1)[1:]
        flux = ndimage.sum_labels(sub, lab, index=np.arange(1, n + 1))
        keep = np.nonzero((sizes >= npixels)
                          & (flux / total_flux >= contrast))[0] + 1
        if keep.size >= 2:
            tree.append(np.where(np.isin(lab, keep), lab, 0))
    if not tree:
        return None

    # 2. combine top-down: higher-level splits refine the lower-level
    #    components they intersect; lower-only components join as markers
    segm = tree[-1]
    for lower in tree[-2::-1]:
        inter = np.unique(lower[(segm > 0) & (lower > 0)])
        inter = inter[inter > 0]
        nlow = np.unique(lower[lower > 0]).size
        if nlow <= inter.size:
            continue                      # lower level adds no new peaks
        extra = np.where(np.isin(lower, inter), 0, lower)
        off = int(segm.max())
        segm = np.where(segm > 0, segm, np.where(extra > 0, extra + off, 0))

    flat = segm.ravel()
    nzv = flat[flat > 0]
    u, first = np.unique(nzv, return_index=True)
    if u.size < 2:
        return None
    # renumber children by FIRST RASTER OCCURRENCE, exactly like the C++
    # path (deblend.cpp renumbers during its raster scan) — sorted-by-value
    # numbering permuted child ids whenever lower-level-only markers joined,
    # so native and fallback catalogs disagreed on label order
    order = u[np.argsort(first)]
    remap = np.zeros(int(segm.max()) + 1, np.int32)
    remap[order] = np.arange(1, order.size + 1, dtype=np.int32)
    return _watershed_assign(sub, inseg, remap[segm])


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
