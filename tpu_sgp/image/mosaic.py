"""Mosaicking: overlap-blend co-addition with background matching.

The reference reassembles deconvolved tiles by writing temp FITS files and
running ``reproject_and_coadd(..., reproject_exact, match_background=True)``
(/root/reference/restoration/utils.py:392-397). Its tiles live on the SAME
pixel grid as the parent image (Cutout2D), so exact reprojection reduces to
placement — what remains is (a) the least-squares background-offset match
between overlapping tiles and (b) footprint-weighted averaging. Both are
implemented here directly on arrays (no disk round-trip); a file-level
wrapper preserves the reference workflow for the CLI.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Sequence, Tuple

import numpy as np


def _bbox(origin, shape):
    x0, y0 = int(origin[0]), int(origin[1])
    return x0, y0, x0 + shape[1], y0 + shape[0]


def match_backgrounds(tiles: Sequence[np.ndarray],
                      origins: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Additive per-tile offsets o_i (to subtract) minimizing the pairwise
    overlap mean differences, with mean(o) = 0 — the same model as
    reproject's match_background."""
    n = len(tiles)
    rows, rhs = [], []
    for i in range(n):
        xi0, yi0, xi1, yi1 = _bbox(origins[i], tiles[i].shape)
        for j in range(i + 1, n):
            xj0, yj0, xj1, yj1 = _bbox(origins[j], tiles[j].shape)
            ox0, oy0 = max(xi0, xj0), max(yi0, yj0)
            ox1, oy1 = min(xi1, xj1), min(yi1, yj1)
            if ox0 >= ox1 or oy0 >= oy1:
                continue
            pi = tiles[i][oy0 - yi0:oy1 - yi0, ox0 - xi0:ox1 - xi0]
            pj = tiles[j][oy0 - yj0:oy1 - yj0, ox0 - xj0:ox1 - xj0]
            diff = float(np.mean(pi - pj))
            row = np.zeros(n)
            row[i], row[j] = 1.0, -1.0
            rows.append(row)
            rhs.append(diff)
    if not rows:
        return np.zeros(n)
    rows.append(np.ones(n))   # gauge: zero-mean offsets
    rhs.append(0.0)
    sol, *_ = np.linalg.lstsq(np.asarray(rows), np.asarray(rhs), rcond=None)
    return sol


def coadd_tiles(tiles: Sequence[np.ndarray],
                origins: Sequence[Tuple[int, int]],
                out_shape: Tuple[int, int],
                match_background: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Blend same-grid tiles into (mosaic, footprint).

    Pixels covered by no tile are NaN in the mosaic and 0 in the footprint.
    """
    offsets = (match_backgrounds(tiles, origins)
               if match_background and len(tiles) > 1
               else np.zeros(len(tiles)))
    acc = np.zeros(out_shape)
    w = np.zeros(out_shape)
    for tile, origin, off in zip(tiles, origins, offsets):
        x0, y0, x1, y1 = _bbox(origin, tile.shape)
        acc[y0:y1, x0:x1] += tile - off
        w[y0:y1, x0:x1] += 1.0
    with np.errstate(invalid='ignore'):
        mosaic = np.where(w > 0, acc / np.where(w > 0, w, 1.0), np.nan)
    return mosaic, w


_IDX_RE = re.compile(r'_(\d+)\.fits$')


def reconstruct_full_image_from_patches(out_shape: Tuple[int, int],
                                        string_key: str = 'image',
                                        dirname: str = 'sgp_reconstruction_results',
                                        match_background: bool = True):
    """File-level reassembly mirroring the reference workflow
    (utils.py:392-397): reads ``temp_deconvolved_{key}_*.fits`` tiles whose
    headers carry TILEX0/TILEY0 origins, blends, returns (mosaic, footprint).
    """
    from .fitsio import read_fits
    candidates = glob.glob(os.path.join(
        dirname, f'temp_deconvolved_{string_key}_*.fits'))
    # only numbered tiles participate; a stray non-numbered file matching
    # the glob must not crash the sort
    paths = sorted((p for p in candidates if _IDX_RE.search(p)),
                   key=lambda p: int(_IDX_RE.search(p).group(1)))
    tiles, origins = [], []
    for p in paths:
        data, hdr = read_fits(p)
        tiles.append(data)
        origins.append((int(hdr.get('TILEX0', 0)), int(hdr.get('TILEY0', 0))))
    return coadd_tiles(tiles, origins, out_shape,
                       match_background=match_background)
