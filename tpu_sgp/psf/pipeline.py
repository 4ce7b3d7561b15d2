"""Native equivalents of the DIAPL PSF-pipeline binaries' functions.

The reference's PSF estimation shells out to four external C programs
(/root/reference/psf/psf_estimation.bash:84-131): ``cutfitsim`` (sub-frame
cutting), ``fwhmm`` (sky + FWHM), ``sfind`` (star list), ``getpsf``
(coefficient fitting; its *outputs* are what the workloads consume).
This module provides the same functions natively on the framework's own
stacks, including writing ``.coo`` star lists in the DIAPL column layout the
star-stamps workload reads (application_sgp_star_stamps.py:42-44).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..catalog import source_info
from ..image import Cutout2D
from ..utils import sigma_clipped_stats


def cut_subframes(image: np.ndarray, nx: int = 2, ny: int = 5,
                  margin: int = 20) -> List[Tuple[Cutout2D, Tuple[int, int]]]:
    """Cut an nx x ny grid of overlapping sub-frames with a margin
    (cutfitsim equivalent; grid geometry per psf_steps_and_params.MD:100-107).
    Returns [(cutout, (ix, iy)), ...]."""
    h, w = image.shape
    sub_h = h // ny
    sub_w = w // nx
    out = []
    for iy in range(ny):
        for ix in range(nx):
            x0 = max(0, ix * sub_w - margin)
            x1 = min(w, (ix + 1) * sub_w + margin)
            y0 = max(0, iy * sub_h - margin)
            y1 = min(h, (iy + 1) * sub_h + margin)
            cut = Cutout2D(image, ((x0 + x1) / 2, (y0 + y1) / 2),
                           size=(y1 - y0, x1 - x0))
            out.append((cut, (ix + 1, iy + 1)))
    return out


def estimate_sky_and_fwhm(image: np.ndarray,
                          max_stars: int = 50) -> Tuple[float, float]:
    """Sky level + representative stellar FWHM (fwhmm equivalent).

    Sky: sigma-clipped median. FWHM: median catalog FWHM of the brightest
    detected point sources.
    """
    _, sky, _ = sigma_clipped_stats(image)
    scat, _ = source_info(image, box_size=(64, 64))
    if scat is None or len(scat) == 0:
        return sky, np.nan
    t = scat.to_table(['segment_flux', 'fwhm', 'ellipticity'])
    flux = np.asarray(t['segment_flux'].value)
    fwhm = np.asarray(t['fwhm'].value)
    ellip = np.asarray(t['ellipticity'].value)
    # point-like: moderately round sources, brightest first
    ok = np.isfinite(fwhm) & (ellip < 0.5)
    if not ok.any():
        return sky, np.nan
    order = np.argsort(-flux[ok])[:max_stars]
    return sky, float(np.median(fwhm[ok][order]))


def find_stars(image: np.ndarray, sat_level: float = 65000.0,
               n_pixels: int = 5,
               sigma_threshold: float = 1.5) -> np.ndarray:
    """Star finding (sfind equivalent): structured array with the DIAPL
    .coo columns x, y, approx_flux, local_bkg_level,
    num_saturated_pixels_in_aperture."""
    scat, bkg = source_info(image, n_pixels=n_pixels,
                            sigma_threshold=sigma_threshold,
                            localbkg_width=5)
    if scat is None or len(scat) == 0:
        return np.zeros(0, dtype=[('x', 'f8'), ('y', 'f8'),
                                  ('approx_flux', 'f8'),
                                  ('local_bkg_level', 'f8'),
                                  ('num_saturated_pixels_in_aperture', 'i8')])
    t = scat.to_table(['xcentroid', 'ycentroid', 'segment_flux',
                       'local_background', 'bbox_xmin', 'bbox_xmax',
                       'bbox_ymin', 'bbox_ymax'])
    n = len(t)
    out = np.zeros(n, dtype=[('x', 'f8'), ('y', 'f8'), ('approx_flux', 'f8'),
                             ('local_bkg_level', 'f8'),
                             ('num_saturated_pixels_in_aperture', 'i8')])
    out['x'] = t['xcentroid'].value
    out['y'] = t['ycentroid'].value
    out['approx_flux'] = t['segment_flux'].value
    out['local_bkg_level'] = (t['local_background'].value
                              + bkg.background_median)
    for i in range(n):
        y0, y1 = int(t['bbox_ymin'].value[i]), int(t['bbox_ymax'].value[i])
        x0, x1 = int(t['bbox_xmin'].value[i]), int(t['bbox_xmax'].value[i])
        out['num_saturated_pixels_in_aperture'][i] = int(
            (image[y0:y1 + 1, x0:x1 + 1] >= sat_level).sum())
    return out


def write_coo(path: str, stars: np.ndarray,
              header_lines: Optional[List[str]] = None) -> None:
    """Write a DIAPL-layout .coo list (3 header lines then whitespace
    columns), readable by ``tpu_sgp.psf.read_coo``."""
    lines = header_lines or ['# tpu_sgp sfind-equivalent star list',
                             '# columns: x y approx_flux local_bkg_level '
                             'num_saturated_pixels_in_aperture', '#']
    with open(path, 'w') as f:
        for ln in lines[:3]:
            f.write(ln.rstrip('\n') + '\n')
        for row in stars:
            f.write(f"{row['x']:.3f} {row['y']:.3f} "
                    f"{row['approx_flux']:.2f} "
                    f"{row['local_bkg_level']:.3f} "
                    f"{row['num_saturated_pixels_in_aperture']}\n")
