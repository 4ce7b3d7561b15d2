"""Source measurement (photutils SourceCatalog equivalent).

Computes, per labeled segment, the quantities the reference workloads read
through ``SourceCatalog(...).to_table(columns=DEFAULT_COLUMNS)``
(/root/reference/restoration/sgp.py:35-39,
application_sgp_star_stamps.py:63-66, 90-94): centroids and shape moments
(from the convolved data when provided, as photutils does), segment flux,
local background from a rectangular annulus, ellipticity and circularized
FWHM.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils import sigma_clipped_stats
from .segmentation import SegmentationImage


class Column(np.ndarray):
    """ndarray with a ``.value`` attribute (astropy Quantity-column shim)."""

    def __new__(cls, arr):
        return np.asarray(arr).view(cls)

    @property
    def value(self):
        return np.asarray(self)


class Table:
    """Minimal column-indexed table compatible with the reference's usage
    (``table['fwhm'].value[0]``, len(), iteration)."""

    def __init__(self, columns: Dict[str, np.ndarray]):
        self._cols = {k: Column(v) for k, v in columns.items()}

    def __getitem__(self, key):
        return self._cols[key]

    def __setitem__(self, key, val):
        self._cols[key] = Column(val)

    def __len__(self):
        first = next(iter(self._cols.values()), np.empty(0))
        return len(first)

    @property
    def colnames(self) -> List[str]:
        return list(self._cols)

    def to_pandas(self):
        import pandas as pd
        return pd.DataFrame({k: np.asarray(v) for k, v in self._cols.items()})

    def __repr__(self):
        return f'<Table rows={len(self)} cols={self.colnames}>'


class SourceCatalog:
    def __init__(self, data: np.ndarray, segment_img: SegmentationImage,
                 background: Optional[np.ndarray] = None,
                 convolved_data: Optional[np.ndarray] = None,
                 error: Optional[np.ndarray] = None,
                 localbkg_width: int = 0, wcs=None):
        self.data = np.asarray(data, np.float64)
        self.segm = segment_img
        self.background = background
        self.conv = (np.asarray(convolved_data, np.float64)
                     if convolved_data is not None else self.data)
        self.error = error
        self.localbkg_width = localbkg_width
        self.wcs = wcs
        self._measure()

    def _measure(self):
        seg = self.segm.data
        labels = self.segm.labels
        n = labels.size
        h, w = self.data.shape
        out = {k: np.full(n, np.nan) for k in (
            'xcentroid', 'ycentroid', 'area', 'segment_flux',
            'segment_fluxerr', 'semimajor_sigma', 'semiminor_sigma',
            'orientation', 'eccentricity', 'ellipticity', 'fwhm',
            'min_value', 'max_value', 'local_background',
            'bbox_xmin', 'bbox_xmax', 'bbox_ymin', 'bbox_ymax')}
        out['label'] = labels.astype(float)
        sky = np.full((n, 2), np.nan)

        for i, lab in enumerate(labels):
            mask = seg == lab
            ys, xs = np.nonzero(mask)
            dvals = self.data[ys, xs]
            cvals = self.conv[ys, xs]

            out['area'][i] = ys.size
            out['segment_flux'][i] = dvals.sum()
            if self.error is not None:
                out['segment_fluxerr'][i] = np.sqrt(
                    (np.asarray(self.error)[ys, xs] ** 2).sum())
            out['min_value'][i] = dvals.min()
            out['max_value'][i] = dvals.max()
            out['bbox_xmin'][i], out['bbox_xmax'][i] = xs.min(), xs.max()
            out['bbox_ymin'][i], out['bbox_ymax'][i] = ys.min(), ys.max()

            # moments on the convolved data, negative values zeroed
            wgt = np.maximum(cvals, 0.0)
            tot = wgt.sum()
            if tot <= 0:
                wgt = np.ones_like(cvals)
                tot = wgt.sum()
            xc = (wgt * xs).sum() / tot
            yc = (wgt * ys).sum() / tot
            out['xcentroid'][i], out['ycentroid'][i] = xc, yc
            mxx = (wgt * (xs - xc) ** 2).sum() / tot
            myy = (wgt * (ys - yc) ** 2).sum() / tot
            mxy = (wgt * (xs - xc) * (ys - yc)).sum() / tot
            # eigenvalues of the covariance (photutils shape params)
            t1 = 0.5 * (mxx + myy)
            t2 = np.sqrt(max(0.25 * (mxx - myy) ** 2 + mxy ** 2, 0.0))
            lam1 = max(t1 + t2, 1e-12)
            lam2 = max(t1 - t2, 1e-12)
            a, b = np.sqrt(lam1), np.sqrt(lam2)
            out['semimajor_sigma'][i] = a
            out['semiminor_sigma'][i] = b
            out['orientation'][i] = np.degrees(
                0.5 * np.arctan2(2.0 * mxy, mxx - myy))
            out['eccentricity'][i] = np.sqrt(1.0 - (lam2 / lam1))
            out['ellipticity'][i] = 1.0 - b / a
            # circularized FWHM (photutils): 2*sqrt(2 ln2 * (a^2+b^2)/2)
            out['fwhm'][i] = 2.0 * np.sqrt(np.log(2.0) * (lam1 + lam2))

            if self.localbkg_width > 0:
                out['local_background'][i] = self._local_bkg(
                    xs.min(), xs.max(), ys.min(), ys.max())
            else:
                out['local_background'][i] = 0.0

            if self.wcs is not None:
                sky[i] = self.wcs.pixel_to_world(xc, yc)

        self._props = out
        self._sky = sky

    def _local_bkg(self, x0, x1, y0, y1) -> float:
        wdt = self.localbkg_width
        h, w = self.data.shape
        yy0, yy1 = max(0, y0 - wdt), min(h, y1 + 1 + wdt)
        xx0, xx1 = max(0, x0 - wdt), min(w, x1 + 1 + wdt)
        region = self.data[yy0:yy1, xx0:xx1].copy()
        inner = np.zeros_like(region, bool)
        inner[y0 - yy0:y1 + 1 - yy0, x0 - xx0:x1 + 1 - xx0] = True
        ann = region[~inner]
        if ann.size == 0:
            return 0.0
        _, med, _ = sigma_clipped_stats(ann)
        return med

    def __len__(self):
        return self.segm.nlabels

    def to_table(self, columns: Optional[Sequence[str]] = None) -> Table:
        cols = {}
        names = columns or list(self._props)
        for name in names:
            if name == 'sky_centroid':
                cols[name] = self._sky[:, 0]  # RA (deg); NaN without WCS
            elif name in self._props:
                cols[name] = self._props[name]
            else:
                cols[name] = np.full(len(self), np.nan)
        return Table(cols)
