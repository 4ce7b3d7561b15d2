from .background import Background2D
from .segmentation import (SegmentationImage, SourceFinder, deblend_sources,
                           detect_sources)
from .properties import Column, SourceCatalog, Table
from .source_info import source_info, source_info_batch

__all__ = [
    'Background2D', 'SegmentationImage', 'SourceFinder', 'deblend_sources',
    'detect_sources', 'Column', 'SourceCatalog', 'Table', 'source_info', 'source_info_batch',
]
