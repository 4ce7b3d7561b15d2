"""Overlapping spatial tiling (the reference's subdivision machinery).

``calculate_slice_bboxes`` reproduces the reference tiling exactly
(/root/reference/restoration/utils.py:332-375): xyxy boxes of fixed tile
size marching with overlap, edge boxes pulled back inside the frame.
``create_subdivisions`` cuts Cutout2D tiles carrying shifted WCS
(utils.py:378-389). These feed both the host-side mosaic path and the
device-side batched tile solver.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .cutout import Cutout2D
from .wcs import WCS


def calculate_slice_bboxes(image_height: int, image_width: int,
                           slice_height: int = 512, slice_width: int = 512,
                           overlap_height_ratio: float = 0.2,
                           overlap_width_ratio: float = 0.2) -> List[List[int]]:
    """Overlapping tile bounding boxes in xyxy, identical marching order to
    the reference implementation (row-major, edge tiles shifted inward)."""
    boxes = []
    y_overlap = int(overlap_height_ratio * slice_height)
    x_overlap = int(overlap_width_ratio * slice_width)
    y_min = 0
    y_max = 0
    while y_max < image_height:
        y_max = y_min + slice_height
        x_min = x_max = 0
        while x_max < image_width:
            x_max = x_min + slice_width
            if y_max > image_height or x_max > image_width:
                xmax = min(image_width, x_max)
                ymax = min(image_height, y_max)
                boxes.append([max(0, xmax - slice_width),
                              max(0, ymax - slice_height), xmax, ymax])
            else:
                boxes.append([x_min, y_min, x_max, y_max])
            x_min = x_max - x_overlap
        y_min = y_max - y_overlap
    return boxes


def create_subdivisions(image: np.ndarray,
                        subdiv_shape: Tuple[int, int] = (100, 100),
                        overlap: int = 10,
                        wcs: Optional[WCS] = None) -> List[Cutout2D]:
    """Cut overlapping Cutout2D tiles (reference utils.py:378-389)."""
    boxes = calculate_slice_bboxes(
        image.shape[0], image.shape[1], subdiv_shape[0], subdiv_shape[1],
        overlap / subdiv_shape[0], overlap / subdiv_shape[1])
    subdivs = []
    for x0, y0, x1, y1 in boxes:
        cut = Cutout2D(image, ((x0 + x1) / 2.0, (y0 + y1) / 2.0),
                       size=subdiv_shape, wcs=wcs)
        subdivs.append(cut)
    return subdivs


def tile_origins(subdivs: List[Cutout2D]) -> np.ndarray:
    """(n, 2) array of (x0, y0) origins for a list of tiles."""
    return np.array([s.origin_original for s in subdivs], dtype=np.int64)
