"""Minimal FITS WCS: linear CD/CDELT transforms + TAN projection + SIP.

Replaces the reference's astropy.wcs usage (pixel_to_skycoord in the CLI,
Cutout2D-carried WCS — reference sgp.py:957, 1041-1060) for the headers this
framework reads/writes. Supports CRPIX/CRVAL/CD (or CDELT+PC / CDELT-only),
the RA---TAN / DEC--TAN gnomonic projection, and SIP distortion polynomials
(Shupe et al. 2005: A_p_q/B_p_q forward terms applied to intermediate pixel
offsets; AP/BP inverse terms used when present, Newton fixed-point inversion
otherwise) — the cases used by survey imaging; falls back to linear world
coordinates for other CTYPEs with a loud warning.
"""
from __future__ import annotations

import warnings

import numpy as np

_WARNED_CTYPES: set = set()


def _read_sip_block(h, prefix: str):
    """Read one SIP polynomial block ('A', 'B', 'AP', 'BP') from a header:
    returns {(p, q): coeff} or None when <prefix>_ORDER is absent."""
    key = f'{prefix}_ORDER'
    if key not in h:
        return None
    order = int(h[key])
    coeffs = {}
    for p in range(order + 1):
        for q in range(order + 1 - p):
            k = f'{prefix}_{p}_{q}'
            if k in h:
                coeffs[(p, q)] = float(h[k])
    return coeffs


def _sip_eval(coeffs, u, v):
    """Evaluate sum_pq c_pq u^p v^q (small orders: term loop fuses fine)."""
    out = np.zeros(np.broadcast(u, v).shape, np.float64)
    for (p, q), cpq in coeffs.items():
        out += cpq * (u ** p) * (v ** q)
    return out


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
        # SIP distortion (Shupe et al. 2005; astropy reads the same keys).
        # Forward: A_p_q/B_p_q corrections on intermediate pixel offsets
        # (u, v) = (x, y) - (CRPIX - 1). Inverse: AP/BP when the header
        # carries them, Newton fixed-point otherwise (world_to_pixel).
        self.sip_a = _read_sip_block(h, 'A')
        self.sip_b = _read_sip_block(h, 'B')
        self.sip_ap = _read_sip_block(h, 'AP')
        self.sip_bp = _read_sip_block(h, 'BP')
        if (self.sip_a is None) != (self.sip_b is None):
            # tolerate one-sided headers: missing block = zero polynomial
            zero = {}
            self.sip_a = self.sip_a if self.sip_a is not None else zero
            self.sip_b = self.sip_b if self.sip_b is not None else zero
        self._sip = self.sip_a is not None

    # -- core transforms (0-based pixel convention, like astropy origin=0) --
    def pixel_to_world(self, x, y):
        """(x, y) 0-based pixels -> (ra, dec) or linear world, degrees."""
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        dx = x - (self.crpix[0] - 1.0)
        dy = y - (self.crpix[1] - 1.0)
        if self._sip:
            dx, dy = (dx + _sip_eval(self.sip_a, dx, dy),
                      dy + _sip_eval(self.sip_b, dx, dy))
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
        if self._sip:
            dx, dy = self._sip_invert(dx, dy)
        return dx + self.crpix[0] - 1.0, dy + self.crpix[1] - 1.0

    def _sip_invert(self, U, V):
        """Invert (u, v) + SIP(u, v) = (U, V) for the raw offsets (u, v).

        Uses the header's AP/BP inverse polynomials as the starting guess
        when present (often accurate enough on their own), then polishes
        with fixed-point iterations u <- U - f(u, v) — SIP distortions are
        small (|df/du| << 1 across a frame), so this contracts quickly;
        astropy's all_world2pix solves the same system iteratively."""
        if self.sip_ap is not None and self.sip_bp is not None:
            u = U + _sip_eval(self.sip_ap, U, V)
            v = V + _sip_eval(self.sip_bp, U, V)
        else:
            u, v = np.array(U, np.float64), np.array(V, np.float64)
        for _ in range(6):
            u, v = (U - _sip_eval(self.sip_a, u, v),
                    V - _sip_eval(self.sip_b, u, v))
        return u, v

    def shifted(self, x0: float, y0: float) -> 'WCS':
        """WCS of a cutout whose (0,0) pixel is at (x0, y0) in the parent."""
        w = WCS()
        w.crpix = self.crpix - np.array([x0, y0])
        w.crval = self.crval.copy()
        w.cd = self.cd.copy()
        w.ctype = self.ctype
        w._tan = self._tan
        # SIP offsets are measured from CRPIX, which shifts with the
        # cutout, so the polynomials carry over unchanged
        w.sip_a, w.sip_b = self.sip_a, self.sip_b
        w.sip_ap, w.sip_bp = self.sip_ap, self.sip_bp
        w._sip = self._sip
        return w

    def to_header(self):
        from .fitsio import Header
        h = Header()
        h['CTYPE1'], h['CTYPE2'] = self.ctype
        h['CRPIX1'], h['CRPIX2'] = float(self.crpix[0]), float(self.crpix[1])
        h['CRVAL1'], h['CRVAL2'] = float(self.crval[0]), float(self.crval[1])
        h['CD1_1'], h['CD1_2'] = float(self.cd[0, 0]), float(self.cd[0, 1])
        h['CD2_1'], h['CD2_2'] = float(self.cd[1, 0]), float(self.cd[1, 1])
        if self._sip:
            for prefix, block in (('A', self.sip_a), ('B', self.sip_b),
                                  ('AP', self.sip_ap), ('BP', self.sip_bp)):
                if block is None:
                    continue
                h[f'{prefix}_ORDER'] = max((p + q for p, q in block), default=0)
                for (p, q), cpq in sorted(block.items()):
                    h[f'{prefix}_{p}_{q}'] = float(cpq)
        return h


def pixel_to_skycoord(x, y, wcs: WCS):
    """Reference-API analog (astropy.wcs.utils.pixel_to_skycoord):
    returns (ra_deg, dec_deg)."""
    return wcs.pixel_to_world(x, y)
