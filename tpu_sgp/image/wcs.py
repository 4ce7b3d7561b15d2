"""Minimal FITS WCS: linear CD/CDELT transforms + TAN projection.

Replaces the reference's astropy.wcs usage (pixel_to_skycoord in the CLI,
Cutout2D-carried WCS — reference sgp.py:957, 1041-1060) for the headers this
framework reads/writes. Supports CRPIX/CRVAL/CD (or CDELT+PC / CDELT-only)
and the RA---TAN / DEC--TAN gnomonic projection, the case used by survey
imaging; falls back to linear world coordinates for other CTYPEs.
"""
from __future__ import annotations

import warnings

import numpy as np

_WARNED_CTYPES: set = set()


class WCS:
    def __init__(self, header=None):
        h = header or {}
        self.crpix = np.array([float(h.get('CRPIX1', 1.0)),
                               float(h.get('CRPIX2', 1.0))])
        self.crval = np.array([float(h.get('CRVAL1', 0.0)),
                               float(h.get('CRVAL2', 0.0))])
        self.ctype = (str(h.get('CTYPE1', 'RA---TAN')),
                      str(h.get('CTYPE2', 'DEC--TAN')))
        if 'CD1_1' in h:
            self.cd = np.array([[float(h.get('CD1_1', 1.0)),
                                 float(h.get('CD1_2', 0.0))],
                                [float(h.get('CD2_1', 0.0)),
                                 float(h.get('CD2_2', 1.0))]])
        else:
            cdelt = np.array([float(h.get('CDELT1', 1.0)),
                              float(h.get('CDELT2', 1.0))])
            pc = np.array([[float(h.get('PC1_1', 1.0)),
                            float(h.get('PC1_2', 0.0))],
                           [float(h.get('PC2_1', 0.0)),
                            float(h.get('PC2_2', 1.0))]])
            self.cd = pc * cdelt[:, None]
        self._tan = 'TAN' in self.ctype[0]
        # Loud (once per projection code) instead of silently-linear: the
        # native WCS implements TAN and linear only; real survey headers
        # can carry SIN/ARC/ZEA/AIT... projections or SIP distortion
        # polynomials, where astropy (the reference path, sgp.py:957)
        # would be correct and a silent linear fallback subtly wrong.
        code = self.ctype[0][5:8] if len(self.ctype[0]) >= 8 else ''
        if code and code not in ('TAN', 'LIN') and not self._tan:
            if code not in _WARNED_CTYPES:
                _WARNED_CTYPES.add(code)
                warnings.warn(
                    f'WCS: unsupported projection CTYPE {self.ctype[0]!r} '
                    f'— falling back to LINEAR world coordinates; use '
                    f'astropy for exact {code} transforms', stacklevel=2)
        if any(k in h for k in ('A_ORDER', 'B_ORDER', 'AP_ORDER')):
            if 'SIP' not in _WARNED_CTYPES:
                _WARNED_CTYPES.add('SIP')
                warnings.warn(
                    'WCS: SIP distortion coefficients present in header '
                    'are IGNORED by the native WCS (astropy handles them); '
                    'positions may be off by the distortion amplitude',
                    stacklevel=2)

    # -- core transforms (0-based pixel convention, like astropy origin=0) --
    def pixel_to_world(self, x, y):
        """(x, y) 0-based pixels -> (ra, dec) or linear world, degrees."""
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        dx = x - (self.crpix[0] - 1.0)
        dy = y - (self.crpix[1] - 1.0)
        xi = self.cd[0, 0] * dx + self.cd[0, 1] * dy   # deg
        eta = self.cd[1, 0] * dx + self.cd[1, 1] * dy
        if not self._tan:
            return self.crval[0] + xi, self.crval[1] + eta
        # gnomonic deprojection
        d2r = np.pi / 180.0
        xi_r, eta_r = xi * d2r, eta * d2r
        ra0, dec0 = self.crval * d2r
        den = np.cos(dec0) - eta_r * np.sin(dec0)
        ra = ra0 + np.arctan2(xi_r, den)
        dec = np.arctan((np.sin(dec0) + eta_r * np.cos(dec0))
                        / np.sqrt(xi_r ** 2 + den ** 2))
        return (np.mod(ra / d2r, 360.0), dec / d2r)

    def world_to_pixel(self, ra, dec):
        ra = np.asarray(ra, np.float64)
        dec = np.asarray(dec, np.float64)
        if self._tan:
            d2r = np.pi / 180.0
            ra_r, dec_r = ra * d2r, dec * d2r
            ra0, dec0 = self.crval * d2r
            cosc = (np.sin(dec0) * np.sin(dec_r)
                    + np.cos(dec0) * np.cos(dec_r) * np.cos(ra_r - ra0))
            xi = np.cos(dec_r) * np.sin(ra_r - ra0) / cosc / d2r
            eta = (np.cos(dec0) * np.sin(dec_r)
                   - np.sin(dec0) * np.cos(dec_r) * np.cos(ra_r - ra0)) / cosc / d2r
        else:
            xi = ra - self.crval[0]
            eta = dec - self.crval[1]
        inv = np.linalg.inv(self.cd)
        dx = inv[0, 0] * xi + inv[0, 1] * eta
        dy = inv[1, 0] * xi + inv[1, 1] * eta
        return dx + self.crpix[0] - 1.0, dy + self.crpix[1] - 1.0

    def shifted(self, x0: float, y0: float) -> 'WCS':
        """WCS of a cutout whose (0,0) pixel is at (x0, y0) in the parent."""
        w = WCS()
        w.crpix = self.crpix - np.array([x0, y0])
        w.crval = self.crval.copy()
        w.cd = self.cd.copy()
        w.ctype = self.ctype
        w._tan = self._tan
        return w

    def to_header(self):
        from .fitsio import Header
        h = Header()
        h['CTYPE1'], h['CTYPE2'] = self.ctype
        h['CRPIX1'], h['CRPIX2'] = float(self.crpix[0]), float(self.crpix[1])
        h['CRVAL1'], h['CRVAL2'] = float(self.crval[0]), float(self.crval[1])
        h['CD1_1'], h['CD1_2'] = float(self.cd[0, 0]), float(self.cd[0, 1])
        h['CD2_1'], h['CD2_2'] = float(self.cd[1, 0]), float(self.cd[1, 1])
        return h


def pixel_to_skycoord(x, y, wcs: WCS):
    """Reference-API analog (astropy.wcs.utils.pixel_to_skycoord):
    returns (ra_deg, dec_deg)."""
    return wcs.pixel_to_world(x, y)
