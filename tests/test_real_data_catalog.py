"""Real-data catalog parity vs the paper's own photutils outputs.

The reference bundles the two M13 subframes of its subdivision benchmark
(sparse 375x375, crowded 450x450) AND the catalogs its photutils stack
produced on them (/root/reference/results/{CROWDED_,}SUBDIV_ORIGIMG.fits,
*_ORIGCAT.csv, produced by application_sgp_subdivisions.py:62 with
box_size=60, n_pixels=5). photutils itself is not installed here, so these
artifacts are the only real-data oracle for the native detection stack.

Round 3 closed the round-2 deviation (480 vs 392 crowded detections) by
matching four photutils behaviors exactly: masked (NaN) edge padding with
exclude_percentile box exclusion + Shepard-IDW mesh fill; the oversampled
(pixel-integrated) detection kernel; the pre-grid_mode legacy zoom
coordinate mapping; and the multi-threshold segment-tree deblender with a
brightest-frontier watershed. Result: sparse field 103/103 paper sources
matched <1 px (count 105), crowded core 409 vs 392 (+4.3%) with 0.84
matched <2 px — the residual crowded deviation is centroid displacement of
heavily blended children. The bounds below pin that agreement.
"""
import os

import numpy as np
import pytest

RESULTS = '/root/reference/results'


def _catalog_for(frame_fits):
    from tpu_sgp.catalog import source_info
    from tpu_sgp.image import read_fits

    img, _ = read_fits(frame_fits)
    cat, _ = source_info(np.asarray(img, np.float64), box_size=(60, 60),
                         n_pixels=5, localbkg_width=5)
    return cat.to_table().to_pandas()


def _match(ours, ref, tol=1.0):
    from scipy.spatial import cKDTree
    tree = cKDTree(np.c_[ours['xcentroid'], ours['ycentroid']])
    d, idx = tree.query(np.c_[ref['xcentroid'], ref['ycentroid']])
    m = d < tol
    fr = ref['segment_flux'].to_numpy()[m]
    fo = ours['segment_flux'].to_numpy()[idx[m]]
    flux_rel = np.median(np.abs(fo - fr) / np.abs(fr))
    return m.mean(), flux_rel


@pytest.mark.skipif(not os.path.isdir(RESULTS),
                    reason='reference results not mounted')
def test_sparse_m13_field_matches_paper_catalog():
    import pandas as pd
    ours = _catalog_for(f'{RESULTS}/SUBDIV_ORIGIMG.fits')
    ref = pd.read_csv(f'{RESULTS}/SUBDIV_ORIGCAT.csv')
    assert abs(len(ours) - len(ref)) <= 4, (len(ours), len(ref))
    # exact regression sentinel: the stack currently detects 105; any
    # change at all to the detection chain shows up here first (the
    # parity bound above would absorb a +-4 drift silently)
    assert len(ours) == 105, len(ours)
    frac, flux_rel = _match(ours, ref)
    assert frac >= 0.97, frac            # every paper source, within 1 px
    assert flux_rel <= 0.12, flux_rel    # median matched-flux agreement


@pytest.mark.skipif(not os.path.isdir(RESULTS),
                    reason='reference results not mounted')
def test_crowded_m13_core_characterized():
    """Crowded-core agreement (tightened in round 3; re-tightened after
    the FIFO watershed tie-break landed 409 vs the paper's 392): count
    within 6%, >=0.80 of paper sources matched within 2 px (>=0.72 within
    1 px), matched fluxes to ~16% median. The residual is bounded by the
    oracle's own reproducibility floor: the bundled CSV's background map
    (reconstructed from its own max/min/flux/localbkg columns) sits
    +2.1 ADU above / ~13% RMS below anything a faithful photutils
    pipeline produces from the bundled FITS — the artifact pair came
    from different runs. The +17 count excess is faint singleton
    detections at the threshold margin, not deblending (family-size
    histograms agree). Full forensics:
    examples/diag_crowded.py:oracle_forensics."""
    import pandas as pd
    ours = _catalog_for(f'{RESULTS}/CROWDED_SUBDIV_ORIGIMG.fits')
    ref = pd.read_csv(f'{RESULTS}/CROWDED_SUBDIV_ORIGCAT.csv')
    assert abs(len(ours) - len(ref)) <= 0.06 * len(ref), \
        (len(ours), len(ref))
    # exact regression sentinel: the pipeline is deterministic NumPy/scipy
    # on a fixed frame, so pin the count exactly — single-count drifts the
    # 6% parity bound would absorb must fail loudly
    assert len(ours) == 409, len(ours)
    frac1, flux_rel = _match(ours, ref, tol=1.0)
    frac2, _ = _match(ours, ref, tol=2.0)
    assert frac1 >= 0.72, frac1
    assert frac2 >= 0.80, frac2
    assert flux_rel <= 0.16, flux_rel


@pytest.mark.skipif(not os.path.isdir(RESULTS),
                    reason='reference results not mounted')
def test_deblend_native_equals_python_on_real_data():
    """The C++ whole-frame deblend and the NumPy fallback must produce the
    same label array (exact equality) on the real crowded field."""
    from tpu_sgp.catalog.background import Background2D
    from tpu_sgp.catalog.segmentation import deblend_sources, detect_sources
    from tpu_sgp.catalog import native
    from tpu_sgp.image import read_fits
    from tpu_sgp.utils import convolve2d_fill, make_2dgaussian_kernel

    if not native.available():
        pytest.skip('native toolchain unavailable')
    img, _ = read_fits(f'{RESULTS}/CROWDED_SUBDIV_ORIGIMG.fits')
    data = np.asarray(img, np.float64)
    bkg = Background2D(data, (60, 60), filter_size=(3, 3))
    conv = convolve2d_fill(data - bkg.background,
                           make_2dgaussian_kernel(1.2, size=3))
    segm = detect_sources(conv, 1.5 * bkg.background_rms, 5)
    a = deblend_sources(conv, segm, use_native=True)
    b = deblend_sources(conv, segm, use_native=False)
    assert a.nlabels == b.nlabels
    # exact array equality: both paths renumber children by first raster
    # occurrence and share the FIFO-tie-break watershed
    np.testing.assert_array_equal(a.data, b.data)
