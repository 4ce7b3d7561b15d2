"""Catalog stack: background recovery, detection, deblending, measurements."""
import numpy as np

from tpu_sgp.catalog import (Background2D, SourceCatalog, SourceFinder,
                             detect_sources, source_info)
from tpu_sgp.simulate import gaussian_psf, synthetic_star_field
from tpu_sgp.utils import sigma_clipped_stats


def _gauss_source(img, x, y, flux, sig=1.6):
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w]
    img += flux * np.exp(-(((xx - x) ** 2 + (yy - y) ** 2) / (2 * sig ** 2))
                         ) / (2 * np.pi * sig ** 2)
    return img


def test_background_recovers_gradient(rng):
    yy, xx = np.mgrid[0:120, 0:120]
    truth = 100 + 0.2 * xx + 0.1 * yy
    img = truth + rng.normal(0, 2.0, truth.shape)
    img = _gauss_source(img, 60, 60, 5e4)  # a bright source to reject
    bkg = Background2D(img, (30, 30))
    resid = bkg.background - truth
    assert np.abs(np.median(resid)) < 1.0
    assert np.abs(resid).mean() < 3.0
    assert 1.0 < bkg.background_rms_median < 4.0


def test_sigma_clipped_stats_rejects_outliers(rng):
    vals = rng.normal(10, 1, 5000)
    vals[:50] = 1e4
    mean, med, std = sigma_clipped_stats(vals)
    assert abs(mean - 10) < 0.2
    assert abs(std - 1) < 0.2


def test_detect_single_source(rng):
    img = np.full((31, 31), 100.0) + rng.normal(0, 3, (31, 31))
    img = _gauss_source(img, 15, 15, 2e4)
    scat, bkg = source_info(img)
    assert scat is not None and len(scat) == 1
    t = scat.to_table(['xcentroid', 'ycentroid', 'segment_flux', 'fwhm',
                       'ellipticity'])
    assert abs(t['xcentroid'].value[0] - 15) < 0.5
    assert abs(t['ycentroid'].value[0] - 15) < 0.5
    # flux within 20% (aperture truncation + bkg noise)
    assert abs(t['segment_flux'].value[0] / 2e4 - 1) < 0.2
    # FWHM of sigma=1.6 Gaussian is 3.77 px (convolved slightly wider)
    assert 2.5 < t['fwhm'].value[0] < 5.5


def test_deblend_separates_double(rng):
    # at the reference's 1.5-sigma threshold a handful of correlated-noise
    # clumps also detect (photutils does the same on this field); the
    # stars must be the two BRIGHTEST children and sit on their truth
    # positions, and turning deblending off must merge exactly them
    img = np.full((41, 41), 50.0) + rng.normal(0, 1, (41, 41))
    img = _gauss_source(img, 17, 20, 3e4)
    img = _gauss_source(img, 24, 20, 3e4)
    scat, _ = source_info(img, deblend=True)
    assert scat is not None and len(scat) >= 2
    t = scat.to_table(['xcentroid', 'ycentroid', 'segment_flux'])
    order = np.argsort(t['segment_flux'].value)[::-1]
    xs = np.sort(t['xcentroid'].value[order[:2]])
    ys = t['ycentroid'].value[order[:2]]
    assert abs(xs[0] - 17) < 1.0 and abs(xs[1] - 24) < 1.0
    assert np.all(np.abs(ys - 20) < 1.0)
    # without deblending the pair merges into one source
    scat2, _ = source_info(img, deblend=False)
    assert len(scat2) == len(scat) - 1


def test_detect_sources_npixels_filter():
    img = np.zeros((20, 20))
    img[5, 5] = 10.0                  # single hot pixel
    img[10:14, 10:14] = 10.0          # 16-px source
    segm = detect_sources(img, 1.0, npixels=5)
    assert segm is not None and segm.nlabels == 1


def test_crowded_field_counts(rng):
    img, psf, truth = synthetic_star_field(200, 200, n_stars=40, seed=9,
                                           flux_range=(2e4, 8e4))
    scat, _ = source_info(img)
    assert scat is not None
    # most isolated stars found (some blend/overlap)
    assert 25 <= len(scat) <= 45


def test_ellipticity_of_elliptical_source(rng):
    img = np.full((41, 41), 10.0)
    yy, xx = np.mgrid[0:41, 0:41]
    img += 1e4 * np.exp(-((xx - 20) ** 2 / (2 * 3.0 ** 2)
                          + (yy - 20) ** 2 / (2 * 1.5 ** 2)))
    scat, _ = source_info(img)
    t = scat.to_table(['ellipticity', 'orientation', 'semimajor_sigma',
                       'semiminor_sigma'])
    assert t['ellipticity'].value[0] > 0.3
    assert abs(abs(t['orientation'].value[0])) < 15  # major axis along x


def test_native_deblend_matches_python(rng):
    """C++ deblend (marker tree + exact watershed) agrees with the NumPy
    path on child count and membership for a constructed blend."""
    from tpu_sgp.catalog import native
    from tpu_sgp.catalog.segmentation import (SegmentationImage,
                                              deblend_sources,
                                              detect_sources)
    if not native.available():
        import pytest
        pytest.skip('native toolchain unavailable')
    img = np.full((41, 41), 0.0)
    img = _gauss_source(img, 17, 20, 3e4)
    img = _gauss_source(img, 24, 20, 2e4)
    img = _gauss_source(img, 20, 31, 1.5e4)
    segm = detect_sources(img, 5.0, npixels=5)
    out_native = deblend_sources(img, segm, use_native=True)
    out_python = deblend_sources(img, segm, use_native=False)
    assert out_native.nlabels == out_python.nlabels == 3
    # both paths renumber children by first raster occurrence, so the
    # label ARRAYS (not just the partitions) must be identical
    np.testing.assert_array_equal(out_native.data, out_python.data)
    # same pixel membership per child up to label permutation: compare
    # centroid sets
    want = sorted([(17, 20), (24, 20), (20, 31)])
    for out in (out_native, out_python):
        cents = []
        for lab in out.labels:
            ys, xs = np.nonzero(out.data == lab)
            cents.append((xs.mean(), ys.mean()))
        # unweighted partition centroids shift ~1px with the watershed
        # boundary; require each true peak matched within 1.5px
        for wx, wy in want:
            assert min(abs(cx - wx) + abs(cy - wy)
                       for cx, cy in cents) < 1.5


def test_native_local_background_matches_python(rng):
    from tpu_sgp.catalog import native
    if not native.available():
        import pytest
        pytest.skip('native toolchain unavailable')
    from tpu_sgp.simulate import synthetic_star_field
    img, _, _ = synthetic_star_field(200, 200, n_stars=30, seed=4)
    scat, _ = source_info(img)
    t = scat.to_table(['bbox_xmin', 'bbox_xmax', 'bbox_ymin', 'bbox_ymax'])
    boxes = np.stack([np.asarray(t[k].value, int) for k in
                      ('bbox_xmin', 'bbox_xmax', 'bbox_ymin', 'bbox_ymax')],
                     axis=1)
    lb_native = native.local_background_batch(scat.data, boxes, 5)
    lb_python = np.array([scat._local_bkg(*b) for b in boxes])
    np.testing.assert_allclose(lb_native, lb_python, rtol=0, atol=1e-12)


def test_local_background_all_nan_annulus_parity():
    """Degenerate case: a source whose entire annulus is NaN must yield the
    same local_background (0.0 = no correction) on the native and the
    Python path — the NaN pixels are dropped BEFORE the emptiness check."""
    from tpu_sgp.catalog import native
    from tpu_sgp.catalog.properties import SourceCatalog

    img = np.full((40, 40), np.nan)
    img[15:25, 15:25] = 100.0  # the source bbox itself; annulus all NaN
    scat = SourceCatalog.__new__(SourceCatalog)
    scat.data = img
    scat.localbkg_width = 5
    boxes = np.array([[15, 24, 15, 24]], np.int32)
    lb_python = np.array([scat._local_bkg(*b) for b in boxes])
    assert lb_python[0] == 0.0
    if native.available():
        lb_native = native.local_background_batch(img, boxes, 5)
        np.testing.assert_array_equal(lb_native, lb_python)


def test_clipped_box_stats_flat_high_level_boxes():
    """Prefix-sum variance must not cancel: a flat sky box at 6e4 counts
    with std 1e-5 previously returned an RMS ~300x too large (inflating
    detection thresholds). The offset-before-prefix-sums form matches the
    direct remove-and-recompute loop."""
    from tpu_sgp.catalog._clip import clipped_box_stats
    rng = np.random.default_rng(0)
    for level, s in [(6e4, 1e-5), (1e6, 1e-3), (100.0, 1.0)]:
        x = level + rng.normal(0, s, (20, 900))
        med, std = clipped_box_stats(x, 3.0, 10)

        def direct(row):
            w = row.copy()
            for _ in range(10):
                m, sd = np.median(w), np.std(w)
                out = np.abs(w - m) > 3 * sd
                if not out.any():
                    break
                w = w[~out]
            return np.median(w), np.std(w)

        for i in range(3):
            dm, ds = direct(x[i])
            assert abs(med[i] - dm) <= 1e-12 * max(abs(dm), 1.0)
            assert abs(std[i] - ds) <= 1e-6 * max(ds, 1e-12)


def test_batched_brightest_fluxes_match_serial(rng, monkeypatch):
    """The batched scorer must equal the serial source_info path exactly —
    including on deconvolved-like stamps whose spline-overshoot RMS map
    goes negative (the threshold floor), wide stars with shallow skirts
    (review regression), and multi-peak stamps that route through the
    deblend-only fallback (blended pairs and ripple-ringed deconvolved
    stars — the dominant shape the workload scorer actually sees)."""
    from tpu_sgp.catalog import segmentation
    from tpu_sgp.catalog.batched import brightest_catalog_fluxes

    stamps = []
    for i in range(24):
        img = rng.normal(0, 0.01, (31, 31))
        y, x = rng.integers(8, 23, 2)
        img[y, x] = rng.uniform(100, 2000)        # sharp spike
        stamps.append(img)
    for i in range(8):
        img = np.full((31, 31), 5.0) + rng.normal(0, 0.5, (31, 31))
        img = _gauss_source(img, 15.5, 15.5, 2e5, sig=4.0)  # wide + skirt
        stamps.append(img)
    for i in range(6):
        # close pair -> ONE segment with two peaks (deblend fallback)
        img = np.full((31, 31), 5.0) + rng.normal(0, 0.3, (31, 31))
        img = _gauss_source(img, 13.0, 13.0, rng.uniform(500, 3000), 1.8)
        img = _gauss_source(img, 18.5, 18.0, rng.uniform(300, 2500), 1.8)
        stamps.append(img)
    for i in range(4):
        # deconvolved-star shape: central spike + sinc ripple rings
        img = rng.normal(0, 0.02, (31, 31))
        yy, xx = np.mgrid[0:31, 0:31]
        r = np.hypot(yy - 15, xx - 15)
        img += 50 * np.sinc(r / 3.0) ** 2 + 800 * np.exp(-r ** 2 / 2.0)
        stamps.append(img)
    stamps = np.asarray(stamps)
    # the scorer imports deblend_sources from .segmentation at call time,
    # so patching the segmentation module attribute counts its calls
    deblend_calls = []
    real_deblend = segmentation.deblend_sources

    def counting(*a, **k):
        deblend_calls.append(1)
        return real_deblend(*a, **k)

    monkeypatch.setattr(segmentation, 'deblend_sources', counting)
    fast = brightest_catalog_fluxes(stamps)
    monkeypatch.setattr(segmentation, 'deblend_sources', real_deblend)
    assert len(deblend_calls) >= 6   # the fallback path actually ran
    for i in range(len(stamps)):
        scat, _ = source_info(stamps[i], localbkg_width=5)
        if scat is None or len(scat) == 0:
            assert not np.isfinite(fast[i]), i
            continue
        want = float(np.max(scat.to_table(['segment_flux'])
                            ['segment_flux'].value))
        np.testing.assert_allclose(fast[i], want, rtol=1e-12, err_msg=str(i))


def test_batched_background_tolerates_nan_stamps(rng):
    """A NaN-poisoned stamp (diverged candidate restoration) must not leak
    into other stamps' background maps — and must equal the serial
    Background2D exactly (review regression: the batched box-exclusion
    mask is geometry-only, while serial counts data NaNs per box, so a
    partially-NaN box can be excluded serially but kept batched; NaN
    stamps now delegate to the serial class)."""
    from tpu_sgp.catalog.background import Background2D
    from tpu_sgp.catalog.batched import _batched_background

    stamps = np.full((4, 31, 31), 100.0) + rng.normal(0, 3, (4, 31, 31))
    stamps[2, 5:9, 5:9] = np.nan
    bkg, rms = _batched_background(stamps)
    assert np.isfinite(bkg[[0, 1, 3]]).all()
    assert np.isfinite(rms[[0, 1, 3]]).all()
    ser = Background2D(stamps[2], (5, 5), filter_size=(3, 3))
    np.testing.assert_array_equal(bkg[2], ser.background)
    np.testing.assert_array_equal(rms[2], ser.background_rms)


def test_batched_brightest_fluxes_nan_stamp_matches_serial(rng):
    """Full-scorer serial exactness for a multi-peak stamp carrying a NaN
    patch — the case where the geometry-only exclusion mask used to give a
    measurably different background (serial=1780.9677 vs 1780.9736 in the
    review fuzz) and could flip a near-tied beta-candidate argmin."""
    from tpu_sgp.catalog.batched import brightest_catalog_fluxes

    stamps = []
    for i in range(4):
        img = np.full((31, 31), 5.0) + rng.normal(0, 0.3, (31, 31))
        img = _gauss_source(img, 13.0, 13.0, rng.uniform(500, 3000), 1.8)
        img = _gauss_source(img, 18.5, 18.0, rng.uniform(300, 2500), 1.8)
        img[2:4, 2:4] = np.nan          # partially-NaN box, 4/25 bad px
        stamps.append(img)
    stamps = np.asarray(stamps)
    fast = brightest_catalog_fluxes(stamps)
    for i in range(len(stamps)):
        scat, _ = source_info(stamps[i], localbkg_width=5)
        if scat is None or len(scat) == 0:
            assert not np.isfinite(fast[i]), i
            continue
        want = float(np.max(scat.to_table(['segment_flux'])
                            ['segment_flux'].value))
        np.testing.assert_allclose(fast[i], want, rtol=1e-12, err_msg=str(i))


def test_nanmedian_filter_even_size_shape():
    from tpu_sgp.catalog.background import _nanmedian_filter
    m = np.arange(36, dtype=float).reshape(6, 6)
    out = _nanmedian_filter(m, (2, 2))
    assert out.shape == (6, 6)
    out3 = _nanmedian_filter(m[None], (3, 3))
    assert out3.shape == (1, 6, 6)


class _Deg:
    def __init__(self, v):
        self.deg = np.asarray(v, float)


class _EquatorialCoord:
    """Duck-typed astropy SkyCoord in an equatorial frame (has .ra/.dec);
    .icrs is booby-trapped to prove native-frame output is preserved."""

    def __init__(self, ra, dec):
        self.ra, self.dec = _Deg(ra), _Deg(dec)

    @property
    def icrs(self):  # pragma: no cover - must never be taken
        raise AssertionError('equatorial frames must NOT be converted')


class _GalacticCoord:
    """Duck-typed SkyCoord in a non-equatorial frame: no .ra/.dec until
    converted through .icrs."""

    def __init__(self, ra, dec):
        self._ra, self._dec = ra, dec

    @property
    def icrs(self):
        return _EquatorialCoord(self._ra, self._dec)


class _FakeWCS:
    def __init__(self, coord):
        self._coord = coord

    def pixel_to_world(self, x, y):
        return self._coord


def test_sky_centroid_skycoord_frames():
    """The astropy-SkyCoord WCS branch: equatorial frames (FK5/FK4/ICRS)
    are reported in their OWN frame (photutils semantics — no silent
    precession), while non-equatorial frames (galactic) convert via .icrs
    instead of raising AttributeError."""
    img = np.zeros((20, 20))
    img[8:12, 8:12] = 50.0
    segm = detect_sources(img, 1.0, npixels=5)

    eq = SourceCatalog(img, segm, wcs=_FakeWCS(_EquatorialCoord(10.5, -3.25)))
    np.testing.assert_allclose(eq._sky, [[10.5, -3.25]])
    t = eq.to_table(['sky_centroid'])
    np.testing.assert_allclose(np.asarray(t['sky_centroid']), [10.5])

    gal = SourceCatalog(img, segm, wcs=_FakeWCS(_GalacticCoord(200.0, 45.0)))
    np.testing.assert_allclose(gal._sky, [[200.0, 45.0]])


def test_maxval_pixel_indices():
    """maxval_{x,y}index: first raster-order pixel attaining the segment
    max of the (background-subtracted) data, per photutils semantics."""
    img = np.zeros((30, 30))
    img[5:9, 5:9] = 10.0
    img[6, 7] = 99.0               # unique peak
    img[20:24, 20:24] = 10.0       # flat plateau: first raster pixel wins
    segm = detect_sources(img, 1.0, npixels=5)
    scat = SourceCatalog(img, segm)
    t = scat.to_table(['maxval_xindex', 'maxval_yindex', 'max_value'])
    mx = np.asarray(t['maxval_xindex'], int)
    my = np.asarray(t['maxval_yindex'], int)
    mv = np.asarray(t['max_value'])
    order = np.argsort(my)
    assert (mx[order[0]], my[order[0]]) == (7, 6) and mv[order[0]] == 99.0
    assert (mx[order[1]], my[order[1]]) == (20, 20) and mv[order[1]] == 10.0


def test_source_info_batch_threaded_matches_serial(rng):
    """source_info_batch on a thread pool is order-preserving and
    bit-identical to the serial loop (pure function per frame)."""
    from tpu_sgp.catalog import source_info_batch
    frames = [synthetic_star_field(120, 120, n_stars=8, seed=s)[0]
              for s in (1, 2, 3, 4, 5, 6)]
    floors = [0.0, 0.0, 1.0, 0.0, 2.0, 0.0]
    pf = [dict(threshold_floor=f) for f in floors]
    serial = source_info_batch(frames, per_frame_kwargs=pf, n_workers=1)
    pooled = source_info_batch(frames, per_frame_kwargs=pf, n_workers=4)
    for (s_cat, s_bkg), (p_cat, p_bkg) in zip(serial, pooled):
        np.testing.assert_array_equal(s_bkg.background, p_bkg.background)
        if s_cat is None:
            assert p_cat is None
            continue
        assert len(s_cat) == len(p_cat)
        for col in ('xcentroid', 'ycentroid', 'segment_flux',
                    'local_background', 'max_value'):
            np.testing.assert_array_equal(s_cat.to_table([col])[col],
                                          p_cat.to_table([col])[col])


def test_native_deblend_thread_count_invariant(tmp_path):
    """The OpenMP deblend must produce the identical label array for any
    OMP_NUM_THREADS (relative child ids + sequential prefix-sum offsets).
    Exercised in subprocesses because libgomp reads the env at load."""
    import os
    import subprocess
    import sys

    from tpu_sgp.catalog import native
    if not native.available():
        import pytest
        pytest.skip('native toolchain unavailable')

    img, _, _ = synthetic_star_field(150, 150, n_stars=25, seed=11,
                                     flux_range=(2e4, 8e4))
    np.save(tmp_path / 'img.npy', img)
    prog = (
        "import numpy as np, sys\n"
        "from tpu_sgp.catalog.background import Background2D\n"
        "from tpu_sgp.catalog.segmentation import detect_sources, "
        "deblend_sources\n"
        "img = np.load(sys.argv[1])\n"
        "bkg = Background2D(img, (30, 30))\n"
        "segm = detect_sources(img - bkg.background, "
        "1.5 * bkg.background_rms, npixels=5)\n"
        "out = deblend_sources(img - bkg.background, segm, use_native=True)\n"
        "np.save(sys.argv[2], out.data)\n"
    )
    labs = {}
    for nt in ('1', '4'):
        env = dict(os.environ, OMP_NUM_THREADS=nt, JAX_PLATFORMS='cpu')
        outp = tmp_path / f'lab{nt}.npy'
        subprocess.run([sys.executable, '-c', prog,
                        str(tmp_path / 'img.npy'), str(outp)],
                       check=True, env=env, cwd='/root/repo',
                       capture_output=True)
        labs[nt] = np.load(outp)
    assert labs['1'].max() >= 10  # the field actually deblended into many
    np.testing.assert_array_equal(labs['1'], labs['4'])


def test_nonfinite_pixels_are_masked_like_photutils():
    """photutils automatically masks non-finite data/convolved pixels and
    excludes them from every measurement; fully-masked segments give NaN
    stats (never sentinel arithmetic garbage)."""
    from tpu_sgp.catalog.segmentation import SegmentationImage

    data = np.zeros((10, 10))
    data[2:5, 2:5] = 5.0
    data[2, 3] = 7.0
    data[3, 3] = np.nan    # masked: excluded, not propagated
    data[7:9, 7:9] = np.nan  # segment 2 fully masked
    seg = np.zeros((10, 10), np.int32)
    seg[2:5, 2:5] = 1
    seg[7:9, 7:9] = 2
    cat = SourceCatalog(data, SegmentationImage(seg),
                        convolved_data=data.copy(), error=np.ones_like(data))
    t = cat.to_table(['maxval_xindex', 'maxval_yindex', 'segment_flux',
                      'segment_fluxerr', 'max_value', 'area', 'xcentroid',
                      'bbox_xmin', 'bbox_xmax'])
    # segment 1: 8 finite pixels (7 at 5.0 + one 7.0), max at (x=3, y=2)
    assert t['area'][0] == 8
    np.testing.assert_allclose(t['segment_flux'][0], 7 * 5.0 + 7.0)
    assert t['max_value'][0] == 7.0
    assert t['maxval_xindex'][0] == 3 and t['maxval_yindex'][0] == 2
    assert np.isfinite(t['xcentroid'][0])
    # segment 1 has an error plane of ones: fluxerr = sqrt(area)
    np.testing.assert_allclose(t['segment_fluxerr'][0], np.sqrt(8.0))
    # segment 2: fully masked -> NaN stats, zero unmasked area (fluxerr too
    # — regression: it used to come out 0.0, i.e. an infinitely-precise
    # zero-flux measurement)
    assert t['area'][1] == 0
    for col in ('segment_flux', 'segment_fluxerr', 'max_value',
                'maxval_xindex', 'xcentroid'):
        assert np.isnan(t[col][1]), col
    # bboxes keep ALL segment pixels (photutils: bbox is from the segment
    # image, independent of the non-finite mask)
    assert t['bbox_xmin'][1] == 7 and t['bbox_xmax'][1] == 8


def test_set_omp_threads_roundtrip():
    """set_omp_threads returns the previous cap and restores cleanly (0 =
    native/OpenMP unavailable, also fine)."""
    from tpu_sgp.catalog import native

    prev = native.set_omp_threads(1)
    if prev == 0:  # serial build or no toolchain: documented no-op
        return
    assert native.set_omp_threads(prev) == 1
    assert native.set_omp_threads(prev) == prev


def test_source_info_batch_pool_matches_serial_with_omp_cap(rng):
    """The pooled path (which caps each worker's OpenMP team) must stay
    result-identical to the serial loop."""
    from tpu_sgp.catalog import source_info_batch

    frames = [synthetic_star_field(80, 80, n_stars=6, seed=s)[0]
              for s in (3, 4)]
    serial = source_info_batch(frames, n_workers=1)
    pooled = source_info_batch(frames, n_workers=2)
    for (sc, _), (pc, _) in zip(serial, pooled):
        np.testing.assert_array_equal(sc.to_table(['xcentroid'])['xcentroid'],
                                      pc.to_table(['xcentroid'])['xcentroid'])


def test_native_loader_recovers_from_corrupt_so(tmp_path):
    """A corrupt cached .so (fresh mtime, bad ELF) must trigger one forced
    rebuild instead of permanently disabling the native path."""
    import subprocess
    import sys

    from tpu_sgp.catalog import native
    if not native.available():
        import pytest
        pytest.skip('native toolchain unavailable')
    # corrupt a SANDBOXED copy of the .so: truncating the real file in
    # place would invalidate the mapping every other process (including
    # this pytest run) holds of that inode -> bus error
    prog = (
        "import sys\n"
        "from pathlib import Path\n"
        "import tpu_sgp.catalog.native as cn\n"
        "sand = Path(sys.argv[1]) / 'libtpusgp_deblend.so'\n"
        "sand.write_bytes(b'not an elf file')\n"
        "cn._SO = sand\n"
        "assert cn.available(), cn._load_error\n"
        "print('recovered')\n"
    )
    r = subprocess.run([sys.executable, '-c', prog, str(tmp_path)],
                       cwd='/root/repo', capture_output=True, text=True,
                       env={**__import__('os').environ,
                            'JAX_PLATFORMS': 'cpu'})
    assert r.returncode == 0, r.stderr
    assert 'recovered' in r.stdout


def test_omp_cap_is_per_thread(tmp_path):
    """The pool's team cap relies on libgomp ICVs being per-thread: capping
    one worker must not leak into another. Subprocess (libgomp reads
    OMP_NUM_THREADS at load)."""
    import os
    import subprocess
    import sys

    from tpu_sgp.catalog import native
    if not native.available() or native.set_omp_threads(0) == 0:
        import pytest
        pytest.skip('OpenMP build unavailable')
    prog = (
        "import threading\n"
        "import tpu_sgp.catalog.native as cn\n"
        "res = {}\n"
        "def worker(name, cap):\n"
        "    prev = cn.set_omp_threads(cap)\n"
        "    now = cn.set_omp_threads(cap)\n"
        "    res[name] = (prev, now)\n"
        "for name, cap in (('a', 2), ('b', 3)):\n"
        "    t = threading.Thread(target=worker, args=(name, cap))\n"
        "    t.start(); t.join()\n"
        "assert res['a'] == (4, 2), res\n"
        "assert res['b'] == (4, 3), res\n"
        "print('ok')\n"
    )
    r = subprocess.run([sys.executable, '-c', prog], cwd='/root/repo',
                       capture_output=True, text=True,
                       env={**os.environ, 'OMP_NUM_THREADS': '4',
                            'JAX_PLATFORMS': 'cpu'})
    assert r.returncode == 0, r.stderr


def test_native_deblend_fuzz_matches_python():
    """Differential fuzz: on random crowded fields the native deblender's
    label ARRAY equals the NumPy path exactly (same tree, same watershed,
    same renumbering)."""
    from tpu_sgp.catalog import native
    from tpu_sgp.catalog.segmentation import deblend_sources, detect_sources
    if not native.available():
        import pytest
        pytest.skip('native toolchain unavailable')
    n_checked = 0
    for seed in range(6):
        rng = np.random.default_rng(seed)
        img, _, _ = synthetic_star_field(
            120, 120, n_stars=int(rng.integers(15, 40)), seed=seed + 100,
            flux_range=(5e3, 9e4))
        img = img + rng.normal(0, 1.0, img.shape)
        segm = detect_sources(img - np.median(img), 5.0, npixels=5)
        if segm is None:
            continue
        a = deblend_sources(img, segm, use_native=True)
        b = deblend_sources(img, segm, use_native=False)
        np.testing.assert_array_equal(a.data, b.data)
        n_checked += 1
    assert n_checked >= 4  # the fuzz actually exercised fields


def test_detection_floor_keeps_restored_counts_sane():
    """Deconvolved frames have near-zero background RMS, so the sigma
    threshold collapses and ripple pixels register as sources — the
    reference fails the same way (/root/reference/restoration/utils.py:
    219-247 has no floor; its workaround is --add_bkg_to_deconvolved).
    The CLI anchors threshold_floor to the ORIGINAL image's noise
    (cli.py:236-239); this pins that the floor restores sane counts on a
    sparse synthetic field where the floorless pass blows up."""
    from tpu_sgp.api import sgp
    from tpu_sgp.catalog import source_info
    from tpu_sgp.simulate import synthetic_star_field

    img, psf, truth = synthetic_star_field(200, 200, n_stars=12,
                                           psf_size=31, fwhm=3.0, seed=11)
    ocat, obkg = source_info(img)
    n_orig = len(ocat)
    assert 6 <= n_orig <= 18  # the sparse field detects near-truth counts

    x, *_ = sgp(img, psf, np.full(img.shape, float(np.median(img))),
                init_recon=2, proj_type=1, stop_criterion=3,
                tol_convergence=1e-4, MAXIT=100)

    floorless_cat, _ = source_info(x)
    n_floorless = 0 if floorless_cat is None else len(floorless_cat)
    floored_cat, _ = source_info(
        x, threshold_floor=1.5 * obkg.background_rms_median)
    n_floored = 0 if floored_cat is None else len(floored_cat)

    # the blowup this guards against: floorless counts explode on the
    # near-zero restored background
    assert n_floorless > 2 * n_orig, (n_floorless, n_orig)
    # the floor brings restored counts back to the original's scale
    assert abs(n_floored - n_orig) <= max(2, n_orig // 3), \
        (n_floored, n_orig)
