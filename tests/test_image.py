"""Image subsystem: FITS round-trip (incl. reading a real reference FITS),
cutout semantics, tiling parity with the reference algorithm, mosaicking."""
import os

import numpy as np
import pytest

from tpu_sgp.image import (Cutout2D, Header, WCS, calculate_slice_bboxes,
                           coadd_tiles, create_subdivisions, getdata,
                           getheader, read_fits, write_fits)


def test_fits_roundtrip(tmp_path, rng):
    for dtype in [np.float32, np.float64, np.int16, np.int32]:
        data = (rng.normal(100, 20, (37, 53)) * 10).astype(dtype)
        hdr = Header({'GAIN': 1.22, 'SATURATE': 65000, 'FWHM': 4.5,
                      'OBJECT': 'M13 field', 'FLAG': True})
        p = str(tmp_path / f'x_{np.dtype(dtype).name}.fits')
        write_fits(p, data, hdr)
        back, h2 = read_fits(p)
        np.testing.assert_array_equal(back, data)
        assert h2['GAIN'] == 1.22
        assert h2['SATURATE'] == 65000
        assert h2['OBJECT'] == 'M13 field'
        assert h2['FLAG'] is True


def test_fits_reads_reference_psf():
    path = '/root/reference/psf/psfccfbrd210048_1_1_img.fits'
    if not os.path.exists(path):
        pytest.skip('reference tree not mounted')
    psf = getdata(path)
    assert psf.shape == (31, 31)
    assert np.isclose(psf.sum(), 1.0, atol=1e-6)


def test_fits_bscale_bzero(tmp_path):
    # write raw int16 with BSCALE/BZERO by hand-editing the header
    data = np.arange(12, dtype=np.int16).reshape(3, 4)
    p = str(tmp_path / 'scaled.fits')
    # our writer strips BSCALE/BZERO (reserved); emulate a foreign file
    write_fits(p, data)
    raw = open(p, 'rb').read()
    # patch in BSCALE/BZERO cards before END
    end_at = raw.index(b'END     ')
    card = (f'{"BSCALE":<8}= {2.0:>20}'.ljust(80)
            + f'{"BZERO":<8}= {10.0:>20}'.ljust(80)).encode()
    patched = raw[:end_at] + card + raw[end_at:end_at + 80] + raw[end_at + 240:]
    open(p, 'wb').write(patched)
    back, _ = read_fits(p)
    np.testing.assert_allclose(back, data * 2.0 + 10.0)


def test_set_header_card_preserves_file_verbatim(tmp_path):
    """set_header_card edits ONE card by raw-byte splicing: COMMENT and
    HISTORY cards (dropped by the in-memory Header), BSCALE/BZERO int16
    encoding, and the data bytes all survive untouched (regression: the
    FILTER header fix used a read/write round-trip that stripped comments
    and re-encoded archival int16 frames as float64)."""
    from tpu_sgp.image import set_header_card

    data = np.arange(12, dtype=np.int16).reshape(3, 4)
    p = str(tmp_path / 'frame.fits')
    write_fits(p, data)
    raw = open(p, 'rb').read()
    end_at = raw.index(b'END     ')
    extra = (f'{"BSCALE":<8}= {2.0:>20}'.ljust(80)
             + f'{"BZERO":<8}= {10.0:>20}'.ljust(80)
             + 'COMMENT observatory provenance'.ljust(80)
             + 'HISTORY reduced 1999-01-01'.ljust(80)).encode()
    # splice in 4 cards + END, then drop exactly len(extra) bytes of the
    # header-block padding so the file stays 2880-aligned
    open(p, 'wb').write(raw[:end_at] + extra + raw[end_at:end_at + 80]
                        + raw[end_at + 80 + len(extra):])
    assert len(open(p, 'rb').read()) % 2880 == 0
    before, _ = read_fits(p)
    np.testing.assert_allclose(before, data * 2.0 + 10.0)  # fixture sane
    data_bytes = open(p, 'rb').read()[2880:]

    set_header_card(p, 'FILTER', 'V')

    after = open(p, 'rb').read()
    assert b'COMMENT observatory provenance' in after
    assert b'HISTORY reduced 1999-01-01' in after
    assert after[-len(data_bytes):] == data_bytes      # data verbatim
    hdr = getheader(p)
    assert hdr['FILTER'] == 'V' and hdr['BITPIX'] == 16
    back, _ = read_fits(p)
    np.testing.assert_array_equal(back, before)        # scaling intact
    # replace path: editing an existing key keeps the size and comments
    size = os.path.getsize(p)
    set_header_card(p, 'FILTER', 'I')
    assert getheader(p)['FILTER'] == 'I'
    assert os.path.getsize(p) == size
    assert b'COMMENT observatory provenance' in open(p, 'rb').read()


def test_set_header_card_grows_full_header_block(tmp_path):
    """Inserting into a header whose last block is completely full must add
    one 2880-byte block (not clobber the data); replacing never grows."""
    from tpu_sgp.image import set_header_card

    data = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = str(tmp_path / 'full.fits')
    write_fits(p, data)
    raw = open(p, 'rb').read()
    end_at = raw.index(b'END     ')
    # fill the block completely: pad with KEYnnn cards so END lands on the
    # last card slot of the 2880-byte block
    free = (2880 - end_at) // 80 - 1
    filler = b''.join(f'KEY{i:<5}= {i:>20}'.ljust(80).encode()
                      for i in range(free))
    full = raw[:end_at] + filler + raw[end_at:end_at + 80] + raw[2880:]
    assert len(full) % 2880 == 0 and full.index(b'END     ') == 2800
    open(p, 'wb').write(full)
    before, _ = read_fits(p)

    set_header_card(p, 'FILTER', 'V')
    assert os.path.getsize(p) == len(full) + 2880   # one block added
    hdr = getheader(p)
    assert hdr['FILTER'] == 'V' and hdr['KEY0'] == 0
    back, _ = read_fits(p)
    np.testing.assert_array_equal(back, before)

    # replace path on the now-padded header: size stays put
    set_header_card(p, 'KEY3', 99)
    assert os.path.getsize(p) == len(full) + 2880
    assert getheader(p)['KEY3'] == 99
    back2, _ = read_fits(p)
    np.testing.assert_array_equal(back2, before)


def test_cutout_matches_astropy_arithmetic():
    img = np.arange(100 * 100, dtype=float).reshape(100, 100)
    c = Cutout2D(img, (50, 50), 31)
    assert c.data.shape == (31, 31)
    # astropy: bounds are [ceil(p - s/2), ceil(p + s/2)) = [35, 66)
    np.testing.assert_array_equal(c.data, img[35:66, 35:66])
    assert c.to_original_position((0, 0)) == (35, 35)
    assert c.to_original_position((15, 15)) == (50, 50)


def test_cutout_trim_and_partial():
    img = np.ones((40, 40))
    edge = Cutout2D(img, (2, 2), 31)           # trimmed at the edge
    assert edge.data.shape != (31, 31)
    part = Cutout2D(img, (2, 2), 31, mode='partial', fill_value=0.0)
    assert part.data.shape == (31, 31)
    assert part.data.sum() < 31 * 31           # zero-padded outside


def test_slice_bboxes_match_reference_algorithm():
    # 410x410 with 100px tiles, 10px overlap: the reference marching pattern
    boxes = calculate_slice_bboxes(410, 410, 100, 100, 0.1, 0.1)
    assert boxes[0] == [0, 0, 100, 100]
    assert boxes[1] == [90, 0, 190, 100]
    xs = sorted({b[0] for b in boxes})
    assert xs == [0, 90, 180, 270, 310]        # last tile pulled inward
    assert all(b[2] - b[0] == 100 and b[3] - b[1] == 100 for b in boxes)
    cov = np.zeros((410, 410), bool)
    for x0, y0, x1, y1 in boxes:
        cov[y0:y1, x0:x1] = True
    assert cov.all()


def test_slice_bboxes_differential_vs_marching_loop():
    """Closed-form grid == the reference's marching-loop algorithm
    (/root/reference/restoration/utils.py:332-375) across shapes/overlaps."""
    def oracle(H, W, sh, sw, ovh, ovw):
        boxes = []
        y_overlap, x_overlap = int(ovh * sh), int(ovw * sw)
        y_min = y_max = 0
        while y_max < H:
            y_max = y_min + sh
            x_min = x_max = 0
            while x_max < W:
                x_max = x_min + sw
                if y_max > H or x_max > W:
                    xm, ym = min(W, x_max), min(H, y_max)
                    boxes.append([max(0, xm - sw), max(0, ym - sh), xm, ym])
                else:
                    boxes.append([x_min, y_min, x_max, y_max])
                x_min = x_max - x_overlap
            y_min = y_max - y_overlap
        return boxes

    for H, W in [(410, 410), (410, 300), (100, 100), (99, 101), (31, 501),
                 (1024, 768), (1, 1), (250, 250)]:
        for sh, sw in [(100, 100), (64, 128), (31, 31)]:
            for ov in [0.0, 0.1, 0.2, 0.5]:
                got = calculate_slice_bboxes(H, W, sh, sw, ov, ov)
                assert got == oracle(H, W, sh, sw, ov, ov), (H, W, sh, sw, ov)


def test_create_subdivisions_shapes():
    img = np.zeros((410, 410))
    subs = create_subdivisions(img, (100, 100), overlap=10)
    assert len(subs) == 25
    assert all(s.data.shape == (100, 100) for s in subs)


def test_mosaic_background_matching(rng):
    """Tiles of a smooth image with per-tile additive offsets are blended
    seamlessly: the mosaic matches the truth up to one global constant."""
    yy, xx = np.mgrid[0:200, 0:200]
    truth = 50 + 0.1 * xx + 0.05 * yy
    subs = create_subdivisions(truth, (60, 60), overlap=12)
    tiles, origins = [], []
    for i, s in enumerate(subs):
        tiles.append(s.data + rng.normal(0, 5))   # per-tile bkg offset
        origins.append(s.origin_original)
    mosaic, foot = coadd_tiles(tiles, origins, truth.shape,
                               match_background=True)
    assert foot.min() >= 1
    resid = mosaic - truth
    assert np.nanstd(resid) < 1e-6               # constant residual only


def test_wcs_tan_roundtrip():
    hdr = {'CRPIX1': 100.5, 'CRPIX2': 120.5, 'CRVAL1': 250.42,
           'CRVAL2': 36.46, 'CD1_1': -2.8e-4, 'CD1_2': 1e-6,
           'CD2_1': 1e-6, 'CD2_2': 2.8e-4,
           'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN'}
    w = WCS(hdr)
    for xy in [(0, 0), (100, 100), (205, 17)]:
        ra, dec = w.pixel_to_world(*xy)
        x2, y2 = w.world_to_pixel(ra, dec)
        assert np.isclose(x2, xy[0], atol=1e-8)
        assert np.isclose(y2, xy[1], atol=1e-8)
    # shifted WCS of a cutout agrees with the parent
    c = WCS(hdr).shifted(30, 40)
    ra1, dec1 = w.pixel_to_world(50, 60)
    ra2, dec2 = c.pixel_to_world(20, 20)
    assert np.isclose(ra1, ra2) and np.isclose(dec1, dec2)


def test_file_level_mosaic_roundtrip(tmp_path, rng):
    """reconstruct_full_image_from_patches reads temp tile FITS files with
    TILEX0/TILEY0 origins (the reference's temp_deconvolved_* workflow)."""
    import os
    from tpu_sgp.image import reconstruct_full_image_from_patches
    yy, xx = np.mgrid[0:120, 0:120]
    truth = 20 + 0.05 * xx + 0.02 * yy
    subs = create_subdivisions(truth, (50, 50), overlap=10)
    d = str(tmp_path / 'sgp_reconstruction_results')
    os.makedirs(d)
    for i, s in enumerate(subs):
        hdr = Header({'TILEX0': int(s.origin_original[0]),
                      'TILEY0': int(s.origin_original[1])})
        write_fits(os.path.join(d, f'temp_deconvolved_image_{i}.fits'),
                   s.data + rng.normal(0, 0.5), hdr)
    mosaic, foot = reconstruct_full_image_from_patches(
        truth.shape, 'image', dirname=d)
    assert foot.min() >= 1
    assert np.nanstd(mosaic - truth) < 1e-6


def test_wcs_cdelt_pc_path():
    hdr = {'CRPIX1': 50.0, 'CRPIX2': 50.0, 'CRVAL1': 150.0, 'CRVAL2': -20.0,
           'CDELT1': -2.8e-4, 'CDELT2': 2.8e-4,
           'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN'}
    w = WCS(hdr)
    ra, dec = w.pixel_to_world(80, 30)
    x, y = w.world_to_pixel(ra, dec)
    assert np.isclose(x, 80, atol=1e-8) and np.isclose(y, 30, atol=1e-8)
    # linear (non-TAN) fallback
    lin = WCS({'CTYPE1': 'X', 'CTYPE2': 'Y', 'CDELT1': 2.0, 'CDELT2': 3.0})
    wx, wy = lin.pixel_to_world(5, 5)
    assert np.isclose(wx, 10.0) and np.isclose(wy, 15.0)


def test_header_comments_roundtrip(tmp_path):
    hdr = Header({'GAIN': 1.22})
    hdr.comments['GAIN'] = 'e-/ADU'
    p = str(tmp_path / 'c.fits')
    write_fits(p, np.zeros((4, 4)), hdr)
    _, back = read_fits(p)
    assert back['GAIN'] == 1.22
    assert back.comments.get('GAIN') == 'e-/ADU'
    h2 = back.copy()
    assert h2.comments == back.comments and h2 is not back


def test_wcs_to_header_roundtrip():
    hdr = {'CRPIX1': 100.5, 'CRPIX2': 120.5, 'CRVAL1': 250.42,
           'CRVAL2': 36.46, 'CD1_1': -2.8e-4, 'CD1_2': 1e-6,
           'CD2_1': 1e-6, 'CD2_2': 2.8e-4,
           'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN'}
    w = WCS(hdr)
    w2 = WCS(w.to_header())
    for xy in [(0, 0), (123.4, 56.7)]:
        np.testing.assert_allclose(w.pixel_to_world(*xy),
                                   w2.pixel_to_world(*xy), rtol=1e-12)


def test_write_fits_long_string_truncates_with_warning(tmp_path):
    """A string value longer than one card is truncated with a warning
    (this minimal writer has no CONTINUE cards) — and never cut in the
    middle of a doubled-quote escape, which would end the reparsed string
    early and corrupt every later card."""
    import warnings

    from tpu_sgp.image.fitsio import getheader, write_fits

    p = str(tmp_path / 'long.fits')
    # escaped value = 66*'a' + "''" = 68 chars -> cut at 67 leaves an ODD
    # trailing quote run which must be dropped too
    val = 'a' * 66 + "'"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        write_fits(p, np.zeros((2, 2)), {'LONGVAL': val, 'AFTER': 7})
    assert any('exceeds one card' in str(x.message) for x in w)
    h = getheader(p)
    assert h['LONGVAL'] == 'a' * 66      # truncated, quote run removed
    assert int(h['AFTER']) == 7          # later cards still parse


def test_read_fits_truncated_header_raises(tmp_path):
    from tpu_sgp.image.fitsio import read_fits

    p = tmp_path / 'trunc.fits'
    p.write_bytes(b'SIMPLE  =                    T' + b' ' * 100)
    with pytest.raises(ValueError, match='truncated'):
        read_fits(str(p))


def test_read_fits_naxis0_returns_empty(tmp_path):
    from tpu_sgp.image.fitsio import read_fits

    cards = [b'SIMPLE  =                    T',
             b'BITPIX  =                    8',
             b'NAXIS   =                    0',
             b'END']
    raw = b''.join(c.ljust(80) for c in cards).ljust(2880)
    p = tmp_path / 'empty.fits'
    p.write_bytes(raw)
    data, hdr = read_fits(str(p))
    assert data.size == 0
    assert int(hdr['NAXIS']) == 0


def test_write_fits_overwrite_false_raises(tmp_path):
    from tpu_sgp.image.fitsio import write_fits

    p = str(tmp_path / 'x.fits')
    write_fits(p, np.zeros((2, 2)))
    with pytest.raises(OSError, match='overwrite'):
        write_fits(p, np.ones((2, 2)), overwrite=False)


def test_write_fits_unsupported_dtype_promotes_to_f64(tmp_path):
    from tpu_sgp.image.fitsio import read_fits, write_fits

    p = str(tmp_path / 'b.fits')
    write_fits(p, np.array([[True, False], [False, True]]))
    data, hdr = read_fits(p)
    assert data.dtype == np.float64
    np.testing.assert_array_equal(data, [[1.0, 0.0], [0.0, 1.0]])
    assert int(hdr['BITPIX']) == -64


def test_set_header_card_missing_end_raises(tmp_path):
    from tpu_sgp.image.fitsio import set_header_card

    p = tmp_path / 'noend.fits'
    p.write_bytes(b' ' * 2880)
    with pytest.raises(ValueError, match='END'):
        set_header_card(str(p), 'GAIN', 1.22)


def test_cutout_error_branches():
    from tpu_sgp.image.cutout import Cutout2D

    data = np.arange(64.0).reshape(8, 8)
    with pytest.raises(ValueError, match='overlap'):
        Cutout2D(data, position=(30.0, 30.0), size=(4, 4))
    with pytest.raises(ValueError, match='mode'):
        Cutout2D(data, position=(4.0, 4.0), size=(4, 4), mode='strict')


def test_match_backgrounds_disjoint_tiles_zero_offsets():
    """Tiles with no pairwise overlap give the solver no equations — the
    offsets must come back all-zero, not crash in lstsq."""
    from tpu_sgp.image.mosaic import match_backgrounds

    t1 = np.full((4, 4), 10.0)
    t2 = np.full((4, 4), 50.0)
    off = match_backgrounds([t1, t2], [(0, 0), (100, 100)])
    np.testing.assert_array_equal(off, [0.0, 0.0])


def test_coadd_tiles_without_background_matching():
    """match_background=False blends raw tile values; offset seams stay."""
    from tpu_sgp.image.mosaic import coadd_tiles

    t1 = np.full((4, 6), 10.0)
    t2 = np.full((4, 6), 14.0)   # overlaps t1 by 2 columns, +4 offset
    mosaic, w = coadd_tiles([t1, t2], [(0, 0), (4, 0)], (4, 10),
                            match_background=False)
    np.testing.assert_array_equal(mosaic[:, :4], 10.0)
    np.testing.assert_array_equal(mosaic[:, 4:6], 12.0)  # plain average
    np.testing.assert_array_equal(mosaic[:, 6:], 14.0)
    assert w.max() == 2.0


def test_fits_multi_extension_reads_first_image_hdu(tmp_path):
    """Survey-style MEF layout: metadata-only primary + IMAGE extensions
    (the reference gets this free from astropy, sgp.py:944-958). The
    native reader must find the first image HDU by default and honor an
    explicit hdu index."""
    from tpu_sgp.image.fitsio import BLOCK, CARD, _format_card, read_fits

    img1 = (np.arange(12, dtype=np.float32).reshape(3, 4) * 1.5)
    img2 = np.ones((2, 2), np.float32) * 7

    def block(cards):
        raw = b''.join(cards) + 'END'.ljust(CARD).encode()
        return raw + b' ' * (-len(raw) % BLOCK)

    primary = block([
        _format_card('SIMPLE', True), _format_card('BITPIX', 8),
        _format_card('NAXIS', 0), _format_card('EXTEND', True),
        _format_card('TELESCOP', 'synthetic')])

    def image_ext(img, name):
        cards = [
            _format_card('XTENSION', 'IMAGE'), _format_card('BITPIX', -32),
            _format_card('NAXIS', 2),
            _format_card('NAXIS1', img.shape[1]),
            _format_card('NAXIS2', img.shape[0]),
            _format_card('PCOUNT', 0), _format_card('GCOUNT', 1),
            _format_card('EXTNAME', name)]
        payload = img.astype('>f4').tobytes()
        return block(cards) + payload + b'\x00' * (-len(payload) % BLOCK)

    p = str(tmp_path / 'mef.fits')
    with open(p, 'wb') as f:
        f.write(primary + image_ext(img1, 'SCI') + image_ext(img2, 'WHT'))

    data, hdr = read_fits(p)
    np.testing.assert_array_equal(data, img1)
    assert hdr['EXTNAME'] == 'SCI'
    data2, hdr2 = read_fits(p, hdu=2)
    np.testing.assert_array_equal(data2, img2)
    # primary by explicit index: headers only
    data0, hdr0 = read_fits(p, hdu=0)
    assert data0.size == 0 and hdr0['TELESCOP'] == 'synthetic'


def test_fits_compressed_hdu_inflates_in_place(tmp_path):
    """ZIMAGE BINTABLE HDUs used to be rejected; since round 5 read_fits
    inflates them transparently (the full codec matrix is pinned in
    tests/test_tile_compression.py — this checks the read_fits dispatch
    on a file whose primary HDU is bare metadata, the fpack layout)."""
    from tpu_sgp.image import write_fits_compressed
    from tpu_sgp.image.fitsio import read_fits

    img = np.arange(96, dtype=np.int16).reshape(8, 12) * 7
    p = str(tmp_path / 'comp.fits')
    write_fits_compressed(p, img, tile_rows=3)
    back, hdr = read_fits(p)
    np.testing.assert_array_equal(back, img)
    assert int(hdr['BITPIX']) == 16


def test_fits_uint16_bzero_roundtrip(tmp_path):
    """Raw CCD frames: uint16 data writes with the BZERO=32768 convention
    and reads back bit-exact as uint16 (not float64)."""
    from tpu_sgp.image.fitsio import read_fits, write_fits

    rng = np.random.default_rng(0)
    img = rng.integers(0, 65536, (32, 48)).astype(np.uint16)
    img[0, 0], img[-1, -1] = 0, 65535
    p = str(tmp_path / 'ccd.fits')
    write_fits(p, img)
    data, hdr = read_fits(p)
    assert data.dtype == np.uint16
    np.testing.assert_array_equal(data, img)
    assert int(hdr['BZERO']) == 32768 and int(hdr['BITPIX']) == 16
    # generic BSCALE/BZERO still decodes to float
    from tpu_sgp.image.fitsio import set_header_card
    set_header_card(p, 'BSCALE', 2.0)
    data2, _ = read_fits(p)
    assert data2.dtype == np.float64
    np.testing.assert_allclose(
        data2, (img.astype(np.int64) - 32768) * 2.0 + 32768)


def test_wcs_warns_on_unsupported_projection_and_sip():
    import warnings

    from tpu_sgp.image import wcs as wcsmod

    wcsmod._WARNED_CTYPES.clear()
    hdr = {'CTYPE1': 'RA---CSC', 'CTYPE2': 'DEC--CSC',
           'CRVAL1': 150.0, 'CRVAL2': 2.0, 'CRPIX1': 10.0, 'CRPIX2': 10.0,
           'CD1_1': -1e-4, 'CD2_2': 1e-4}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter('always')
        wcsmod.WCS(hdr)
        wcsmod.WCS(hdr)          # second instance: warned once per code
    msgs = [str(r.message) for r in rec]
    assert sum('CSC' in m for m in msgs) == 1, msgs

    # supported zenithal family (with or without SIP): silent
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        for code in ('TAN', 'SIN', 'ARC', 'STG', 'ZEA'):
            wcsmod.WCS(dict(hdr, CTYPE1=f'RA---{code}',
                            CTYPE2=f'DEC--{code}'))
        wcsmod.WCS(dict(hdr, CTYPE1='RA---TAN-SIP', CTYPE2='DEC--TAN-SIP',
                        A_ORDER=2, B_ORDER=2))


def _sip_header(with_inverse: bool):
    """Survey-like TAN-SIP header (coefficient amplitudes typical of wide
    -field imagers: quadratic ~1e-6/px, cubic ~1e-10/px -> a few tenths of
    a pixel of distortion across a 4k frame)."""
    hdr = {'CTYPE1': 'RA---TAN-SIP', 'CTYPE2': 'DEC--TAN-SIP',
           'CRVAL1': 150.0, 'CRVAL2': 2.25,
           'CRPIX1': 2048.0, 'CRPIX2': 2048.0,
           'CD1_1': -7.3e-5, 'CD1_2': 2.1e-6,
           'CD2_1': 2.0e-6, 'CD2_2': 7.28e-5,
           'A_ORDER': 3, 'A_2_0': 1.6e-6, 'A_1_1': -4.2e-7,
           'A_0_2': 9.1e-7, 'A_3_0': -2.3e-10, 'A_0_3': 1.1e-10,
           'B_ORDER': 3, 'B_2_0': -8.2e-7, 'B_1_1': 6.5e-7,
           'B_0_2': 1.3e-6, 'B_3_0': 9.4e-11, 'B_2_1': -1.9e-10}
    if with_inverse:
        # deliberately CRUDE inverse polynomials (sign-flipped forward
        # terms): the fixed-point polish must still land exactly
        hdr.update({'AP_ORDER': 2, 'AP_2_0': -1.6e-6, 'AP_1_1': 4.2e-7,
                    'AP_0_2': -9.1e-7,
                    'BP_ORDER': 2, 'BP_2_0': 8.2e-7, 'BP_1_1': -6.5e-7,
                    'BP_0_2': -1.3e-6})
    return hdr


def test_wcs_sip_forward_matches_definition():
    """pixel_to_world with SIP equals the Shupe et al. (2005) composition:
    gnomonic(CD @ (u + A(u,v), v + B(u,v))) — computed here from scratch
    against an undistorted WCS evaluated at the pre-distorted offsets."""
    from tpu_sgp.image.wcs import WCS

    hdr = _sip_header(False)
    w = WCS(hdr)
    plain = WCS({k: v for k, v in hdr.items()
                 if not k[0] in 'AB' or k[:2] in ('CD', 'CR', 'CT')})
    assert w._sip and not plain._sip
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 4096, 64)
    y = rng.uniform(0, 4096, 64)
    u, v = x - (hdr['CRPIX1'] - 1), y - (hdr['CRPIX2'] - 1)
    fu = (hdr['A_2_0'] * u**2 + hdr['A_1_1'] * u * v + hdr['A_0_2'] * v**2
          + hdr['A_3_0'] * u**3 + hdr['A_0_3'] * v**3)
    gv = (hdr['B_2_0'] * u**2 + hdr['B_1_1'] * u * v + hdr['B_0_2'] * v**2
          + hdr['B_3_0'] * u**3 + hdr['B_2_1'] * u**2 * v)
    ra, dec = w.pixel_to_world(x, y)
    ra_want, dec_want = plain.pixel_to_world(x + fu, y + gv)
    np.testing.assert_allclose(ra, ra_want, rtol=0, atol=1e-12)
    np.testing.assert_allclose(dec, dec_want, rtol=0, atol=1e-12)
    # the distortion is actually exercised (tenths of a pixel of motion)
    ra0, dec0 = plain.pixel_to_world(x, y)
    assert np.max(np.hypot((ra - ra0) / hdr['CD1_1'],
                           (dec - dec0) / hdr['CD2_2'])) > 0.1


def test_wcs_sip_roundtrip_and_cutout():
    """world_to_pixel inverts the SIP distortion to float64 resolution,
    with AND without AP/BP inverse blocks in the header; a shifted()
    cutout WCS maps the same sky; to_header() round-trips the SIP terms."""
    from tpu_sgp.image.wcs import WCS

    rng = np.random.default_rng(4)
    x = rng.uniform(0, 4096, 128)
    y = rng.uniform(0, 4096, 128)
    for with_inv in (False, True):
        w = WCS(_sip_header(with_inv))
        ra, dec = w.pixel_to_world(x, y)
        xb, yb = w.world_to_pixel(ra, dec)
        np.testing.assert_allclose(xb, x, rtol=0, atol=1e-8)
        np.testing.assert_allclose(yb, y, rtol=0, atol=1e-8)
    w = WCS(_sip_header(True))
    cut = w.shifted(100.0, 250.0)
    ra_c, dec_c = cut.pixel_to_world(x - 100.0, y - 250.0)
    ra_w, dec_w = w.pixel_to_world(x, y)
    np.testing.assert_allclose(ra_c, ra_w, rtol=0, atol=1e-12)
    np.testing.assert_allclose(dec_c, dec_w, rtol=0, atol=1e-12)
    w2 = WCS(dict(w.to_header().items()))
    ra2, dec2 = w2.pixel_to_world(x, y)
    np.testing.assert_allclose(ra2, ra_w, rtol=0, atol=1e-12)
    np.testing.assert_allclose(dec2, dec_w, rtol=0, atol=1e-12)


def test_wcs_zenithal_projections_round_trip_and_radius_law():
    """The zenithal family (TAN/SIN/ARC/STG/ZEA) round-trips
    pixel->world->pixel to float64 resolution, and each projection obeys
    its defining radius law R(s) of Calabretta & Greisen (2002, Table 13):
    a world point at true angular separation s from CRVAL lands at native
    radius R = tan(s) | sin(s) | s | 2tan(s/2) | 2sin(s/2) respectively
    (replaces the reference's astropy.wcs for these headers,
    /root/reference/restoration/sgp.py:957)."""
    laws = {'TAN': lambda s: np.tan(s), 'SIN': lambda s: np.sin(s),
            'ARC': lambda s: s, 'STG': lambda s: 2 * np.tan(s / 2),
            'ZEA': lambda s: 2 * np.sin(s / 2)}
    scale = 2.8e-4  # deg/px
    d2r = np.pi / 180.0
    for code, r_of_s in laws.items():
        hdr = {'CRPIX1': 200.0, 'CRPIX2': 150.0,
               'CRVAL1': 210.5, 'CRVAL2': -33.25,
               'CD1_1': -scale, 'CD2_2': scale,
               'CTYPE1': f'RA---{code}', 'CTYPE2': f'DEC--{code}'}
        w = WCS(hdr)
        # round trip at assorted pixels (offsets up to ~0.1 deg)
        for xy in [(0.0, 0.0), (399.0, 0.0), (123.4, 276.8), (199.0, 149.0)]:
            ra, dec = w.pixel_to_world(*xy)
            x2, y2 = w.world_to_pixel(ra, dec)
            np.testing.assert_allclose((x2, y2), xy, rtol=0, atol=1e-8,
                                       err_msg=code)
        # radius law: separation s from CRVAL (stable two-argument formula)
        ra, dec = w.pixel_to_world(340.0, 275.0)
        ra0, dec0 = 210.5 * d2r, -33.25 * d2r
        ra_r, dec_r = ra * d2r, dec * d2r
        s = np.arctan2(
            np.hypot(np.cos(dec_r) * np.sin(ra_r - ra0),
                     np.cos(dec0) * np.sin(dec_r)
                     - np.sin(dec0) * np.cos(dec_r) * np.cos(ra_r - ra0)),
            np.sin(dec0) * np.sin(dec_r)
            + np.cos(dec0) * np.cos(dec_r) * np.cos(ra_r - ra0))
        r_px = np.hypot(340.0 - 199.0, 275.0 - 149.0)
        np.testing.assert_allclose(r_of_s(s) / d2r / scale, r_px,
                                   rtol=1e-10, err_msg=code)
        # ARC analytic anchor: north along the meridian is exactly linear
        if code == 'ARC':
            _, dec_n = w.pixel_to_world(199.0, 149.0 + 1000.0)
            np.testing.assert_allclose(dec_n, -33.25 + 1000 * scale,
                                       rtol=0, atol=1e-10)


def test_wcs_shifted_cutout_preserves_projection():
    """shifted() must carry the parent's projection code: a SIN cutout
    that silently deprojected as TAN would drift by arcseconds at field
    edges (regression for the _zen-not-copied bug)."""
    hdr = {'CRPIX1': 300.0, 'CRPIX2': 300.0, 'CRVAL1': 10.0, 'CRVAL2': 45.0,
           'CD1_1': -2.8e-4, 'CD2_2': 2.8e-4,
           'CTYPE1': 'RA---SIN', 'CTYPE2': 'DEC--SIN'}
    w = WCS(hdr)
    cut = w.shifted(150.0, 100.0)
    for x, y in [(0.0, 0.0), (420.0, 480.0)]:
        np.testing.assert_allclose(cut.pixel_to_world(x - 150.0, y - 100.0),
                                   w.pixel_to_world(x, y),
                                   rtol=0, atol=1e-12)


def test_wcs_cylindrical_projections_laws_and_round_trip():
    """The cylindrical family (CAR/CEA/MER) through the general
    native<->celestial rotation (CG02 eq. 2/5, pole from eq. 8-10):
    latitude laws on the all-sky grid, analytic anchors on a ROTATED
    grid, float64 round-trips, header/cutout preservation (replaces the
    reference's astropy.wcs for these survey headers,
    /root/reference/restoration/sgp.py:957)."""
    d2r = np.pi / 180.0
    allsky = {'CRPIX1': 181.0, 'CRPIX2': 91.0, 'CRVAL1': 0.0,
              'CRVAL2': 0.0, 'CDELT1': -1.0, 'CDELT2': 1.0}
    # latitude law at eta = +50 deg on the all-sky (CRVAL=0) grid
    laws = {'CAR': 50.0,
            'CEA': np.degrees(np.arcsin(50.0 * d2r)),
            'MER': np.degrees(2 * np.arctan(np.exp(50.0 * d2r)) - np.pi / 2)}
    for code, dec_want in laws.items():
        w = WCS(dict(allsky, CTYPE1=f'RA---{code}', CTYPE2=f'DEC--{code}'))
        ra, dec = w.pixel_to_world(180.0, 90.0)         # fiducial
        np.testing.assert_allclose((ra, dec), (0.0, 0.0), rtol=0,
                                   atol=1e-12, err_msg=code)
        ra, dec = w.pixel_to_world(170.0, 140.0)        # xi=+10, eta=+50
        np.testing.assert_allclose(ra, 10.0, rtol=0, atol=1e-10,
                                   err_msg=code)
        np.testing.assert_allclose(dec, dec_want, rtol=0, atol=1e-10,
                                   err_msg=code)
        # round-trips across the frame (avoiding the pole rows, where
        # native longitude is degenerate — same sky point for every xi —
        # and staying inside CEA's |eta| <= 1/lam radian domain)
        for xy in [(10.0, 41.0), (359.0, 139.0), (123.4, 95.6)]:
            ra, dec = w.pixel_to_world(*xy)
            np.testing.assert_allclose(w.world_to_pixel(ra, dec), xy,
                                       rtol=0, atol=1e-8, err_msg=code)

    # CEA PV2_1 (lambda = 0.5): sin(theta) = lambda * eta_rad
    w = WCS(dict(allsky, CTYPE1='RA---CEA', CTYPE2='DEC--CEA', PV2_1=0.5))
    _, dec = w.pixel_to_world(180.0, 140.0)
    np.testing.assert_allclose(dec, np.degrees(np.arcsin(0.5 * 50 * d2r)),
                               rtol=0, atol=1e-10)
    x, y = w.world_to_pixel(0.0, float(dec))
    np.testing.assert_allclose((x, y), (180.0, 140.0), rtol=0, atol=1e-8)

    # rotated CAR, CRVAL=(30,45): the celestial pole solution is
    # (alpha_p, delta_p) = (210, 45) with LONPOLE default 0, so the
    # native pole (eta=+90) must land there, the fiducial at CRVAL, and
    # 90 deg along the native equator at the analytic (120, 0)
    rot = WCS(dict(allsky, CRVAL1=30.0, CRVAL2=45.0,
                   CTYPE1='RA---CAR', CTYPE2='DEC--CAR'))
    np.testing.assert_allclose(rot.pixel_to_world(180.0, 90.0),
                               (30.0, 45.0), rtol=0, atol=1e-10)
    np.testing.assert_allclose(rot.pixel_to_world(180.0, 180.0),
                               (210.0, 45.0), rtol=0, atol=1e-10)
    np.testing.assert_allclose(rot.world_to_pixel(120.0, 0.0),
                               (90.0, 90.0), rtol=0, atol=1e-8)
    for xy in [(100.5, 20.25), (300.0, 160.0), (250.0, 91.0)]:
        ra, dec = rot.pixel_to_world(*xy)
        np.testing.assert_allclose(rot.world_to_pixel(ra, dec), xy,
                                   rtol=0, atol=1e-8)
    # header round-trip and cutout preserve the rotated projection
    rot2 = WCS(dict(rot.to_header().items()))
    cut = rot.shifted(40.0, 30.0)
    for xy in [(100.5, 20.25), (300.0, 160.0)]:
        want = rot.pixel_to_world(*xy)
        np.testing.assert_allclose(rot2.pixel_to_world(*xy), want,
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(
            cut.pixel_to_world(xy[0] - 40.0, xy[1] - 30.0), want,
            rtol=0, atol=1e-12)

    # invalid headers raise instead of silently transforming wrong:
    # (a) LONPOLE whose cos has the opposite sign to sin(CRVAL2) leaves
    # no celestial-pole solution of CG02 eq. 8 (the fold onto [-90, 90]
    # used to reflect onto a constraint-violating pole — the fiducial
    # then mapped 180 deg away); (b) CEA PV2_1 outside (0, 1]
    with pytest.raises(ValueError, match='no celestial pole'):
        WCS(dict(allsky, CRVAL1=100.0, CRVAL2=-30.0, LONPOLE=0.0,
                 CTYPE1='RA---CAR', CTYPE2='DEC--CAR'))
    with pytest.raises(ValueError, match='PV2_1'):
        WCS(dict(allsky, CTYPE1='RA---CEA', CTYPE2='DEC--CEA', PV2_1=0.0))

    # southern fiducial exercises the LONPOLE-default-180 branch
    south = WCS(dict(allsky, CRVAL1=80.0, CRVAL2=-30.0,
                     CTYPE1='RA---MER', CTYPE2='DEC--MER'))
    np.testing.assert_allclose(south.pixel_to_world(180.0, 90.0),
                               (80.0, -30.0), rtol=0, atol=1e-10)
    for xy in [(150.0, 60.0), (220.0, 120.0)]:
        ra, dec = south.pixel_to_world(*xy)
        np.testing.assert_allclose(south.world_to_pixel(ra, dec), xy,
                                   rtol=0, atol=1e-8)


def test_wcs_zpn_and_azp():
    """Parameterized zenithal projections: ZPN (zenithal polynomial, the
    INT-WFC-style header family) and untilted AZP (zenithal perspective).
    Anchors: ZPN with PV2_1=1 alone IS ARC; AZP mu=0 IS TAN and mu=1 IS
    STG (projection from sphere center / far pole); a realistic cubic
    ZPN obeys its own radius law s + c3 s^3 = R at float64; all
    round-trip; invalid parameter headers raise."""
    base = {'CRPIX1': 200.0, 'CRPIX2': 150.0, 'CRVAL1': 210.5,
            'CRVAL2': -33.25, 'CD1_1': -2.8e-4, 'CD2_2': 2.8e-4}

    def w(code, **pv):
        return WCS(dict(base, CTYPE1=f'RA---{code}',
                        CTYPE2=f'DEC--{code}', **pv))

    pts = [(0.0, 0.0), (399.0, 299.0), (123.4, 276.8), (199.0, 149.0)]
    for a, b in ((w('ZPN', PV2_1=1.0), w('ARC')),
                 (w('AZP', PV2_1=0.0), w('TAN')),
                 (w('AZP', PV2_1=1.0), w('STG'))):
        for xy in pts:
            np.testing.assert_allclose(a.pixel_to_world(*xy),
                                       b.pixel_to_world(*xy), rtol=0,
                                       atol=1e-11)
            ra, dec = a.pixel_to_world(*xy)
            np.testing.assert_allclose(a.world_to_pixel(ra, dec), xy,
                                       rtol=0, atol=1e-7)

    # realistic WFC-style cubic: R = gamma + 220 gamma^3 (radians). A
    # point 500 px north of the reference pixel sits at colatitude gamma
    # solving the law for R = 500 * scale — checked along the meridian
    # where dec = CRVAL2 + gamma exactly
    zpn3 = w('ZPN', PV2_1=1.0, PV2_3=220.0)
    d2r = np.pi / 180.0
    _, dec = zpn3.pixel_to_world(199.0, 149.0 + 500.0)
    g = (dec - (-33.25)) * d2r
    np.testing.assert_allclose(g + 220.0 * g ** 3, 500 * 2.8e-4 * d2r,
                               rtol=0, atol=1e-15)
    for xy in pts:
        ra, dec = zpn3.pixel_to_world(*xy)
        np.testing.assert_allclose(zpn3.world_to_pixel(ra, dec), xy,
                                   rtol=0, atol=1e-7)
    # header + cutout round-trips keep the polynomial
    zpn3b = WCS(dict(zpn3.to_header().items()))
    cut = zpn3.shifted(40.0, 30.0)
    want = zpn3.pixel_to_world(123.4, 276.8)
    np.testing.assert_allclose(zpn3b.pixel_to_world(123.4, 276.8), want,
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(cut.pixel_to_world(83.4, 246.8), want,
                               rtol=0, atol=1e-12)

    # invalid parameters raise
    with pytest.raises(ValueError, match='ZPN'):
        w('ZPN')                        # no PV2_1
    with pytest.raises(ValueError, match='tilted'):
        w('AZP', PV2_1=2.0, PV2_2=30.0)
    with pytest.raises(ValueError, match='degenerate'):
        w('AZP', PV2_1=-1.0)


def test_wcs_conic_projections():
    """The conic family (COP/COE/COD/COO, CG02 section 5.3): every type
    is true-scale along BOTH standard parallels (C * R(theta_a -+ eta) ==
    cos(theta)); each obeys its defining differential law at arbitrary
    theta — COD equidistant |dR/dtheta| = 1, COE equal-area
    C R |dR/dtheta| = cos(theta), COO conformal C R / cos(theta) =
    |dR/dtheta|, COP linear in tan(theta - theta_a); WCS-level fiducial
    exactness and round-trips for northern, southern and eta = 0 cones;
    invalid parameters raise."""
    from tpu_sgp.image.wcs import _conic_pair

    d2r = np.pi / 180.0
    for ta_deg, eta_deg in [(45.0, 15.0), (-30.0, 10.0), (60.0, 0.0)]:
        ta, eta = ta_deg * d2r, eta_deg * d2r
        for code in ('COP', 'COE', 'COD', 'COO'):
            r_of, th_of, c_fac = _conic_pair(code, ta, eta)
            for tk in (ta - eta, ta + eta):
                np.testing.assert_allclose(c_fac * r_of(tk), np.cos(tk),
                                           rtol=0, atol=1e-13,
                                           err_msg=f'{code} {ta_deg}')
            ths = ta + np.array([-0.3, -0.05, 0.0, 0.08, 0.25])
            dd = 1e-7
            dR = (r_of(ths + dd) - r_of(ths - dd)) / (2 * dd)
            if code == 'COD':
                np.testing.assert_allclose(np.abs(dR), 1.0, atol=1e-6)
            elif code == 'COE':
                np.testing.assert_allclose(c_fac * r_of(ths) * np.abs(dR),
                                           np.cos(ths), atol=1e-5)
            elif code == 'COO':
                np.testing.assert_allclose(
                    np.abs(c_fac * r_of(ths) / np.cos(ths)), np.abs(dR),
                    rtol=1e-5)
            else:   # COP: R(theta_a + x) - R(theta_a) = -cos(eta) tan(x)
                x = np.array([-0.2, 0.1, 0.3])
                np.testing.assert_allclose(
                    r_of(ta + x) - r_of(ta),
                    -np.cos(eta) * np.tan(x), rtol=1e-12)
            np.testing.assert_allclose(th_of(r_of(ths)), ths, rtol=0,
                                       atol=1e-9, err_msg=code)

    for crval2, pv1, pv2 in [(47.0, 45.0, 15.0), (-25.0, -30.0, 10.0),
                             (60.0, 60.0, 0.0)]:
        for code in ('COP', 'COE', 'COD', 'COO'):
            w = WCS({'CTYPE1': f'RA---{code}', 'CTYPE2': f'DEC--{code}',
                     'CRPIX1': 200.0, 'CRPIX2': 150.0,
                     'CRVAL1': 120.0, 'CRVAL2': crval2,
                     'CD1_1': -2.8e-3, 'CD2_2': 2.8e-3,
                     'PV2_1': pv1, 'PV2_2': pv2})
            np.testing.assert_allclose(w.pixel_to_world(199.0, 149.0),
                                       (120.0, crval2), rtol=0, atol=1e-9,
                                       err_msg=code)
            for xy in [(0.0, 0.0), (399.0, 299.0), (123.4, 276.8)]:
                ra, dec = w.pixel_to_world(*xy)
                np.testing.assert_allclose(w.world_to_pixel(ra, dec), xy,
                                           rtol=0, atol=1e-7,
                                           err_msg=f'{code} {crval2}')
            # header + cutout round-trips keep the cone
            w2 = WCS(dict(w.to_header().items()))
            cut = w.shifted(40.0, 30.0)
            want = w.pixel_to_world(123.4, 276.8)
            np.testing.assert_allclose(w2.pixel_to_world(123.4, 276.8),
                                       want, rtol=0, atol=1e-11)
            np.testing.assert_allclose(cut.pixel_to_world(83.4, 246.8),
                                       want, rtol=0, atol=1e-11)

    with pytest.raises(ValueError, match='PV2_1'):
        WCS({'CTYPE1': 'RA---COP', 'CTYPE2': 'DEC--COP',
             'CRVAL1': 120.0, 'CRVAL2': 45.0})     # missing theta_a
    with pytest.raises(ValueError, match='standard parallels'):
        WCS({'CTYPE1': 'RA---COE', 'CTYPE2': 'DEC--COE', 'CRVAL1': 120.0,
             'CRVAL2': 45.0, 'PV2_1': 80.0, 'PV2_2': 15.0})


def test_wcs_edge_semantics_review_fixes():
    """Header-edge semantics pinned after a whole-file review:
    (a) SIN/ZEA/ARC inverses NaN off-projection radii instead of
    clipping onto the limb/antipode (clipped pixels resolve to REAL sky
    and let reprojection paint phantom flux); (b) sparse CD headers
    (any CDj_i present -> absent elements are 0 per the FITS standard)
    decode correctly and singular CD raises; (c) latitude-first axis
    order (CTYPE1='DEC--TAN') decodes identically to the equivalent
    lon-first header, incl. PV1_m parameter reads; (d) the closed
    pseudo-maps (SFL/MOL/PAR/BON/PCO, HPX equatorial band) NaN plane
    points beyond the bounding meridian instead of wrapping onto a
    second sky copy; (e) nonstandard HPX grid parameters (H, K) raise
    loudly; (f) ZPN's invertible domain is the refined stationary
    point, not a 4097-grid overshoot."""
    from tpu_sgp.image.wcs import _zpn_pair

    def hdr(code, **kw):
        base = {'CTYPE1': f'RA---{code}', 'CTYPE2': f'DEC--{code}',
                'CRVAL1': 10.0, 'CRVAL2': 5.0, 'CRPIX1': 1.0,
                'CRPIX2': 1.0, 'CDELT1': -1.0, 'CDELT2': 1.0}
        base.update(kw)
        return base

    # (a) off-projection zenithal radii
    assert np.isnan(WCS(hdr('SIN')).pixel_to_world(90.0, 0.0)[0])
    assert np.isnan(WCS(hdr('ZEA')).pixel_to_world(130.0, 0.0)[0])
    w_arc = WCS(hdr('ARC'))
    assert np.isnan(w_arc.pixel_to_world(185.0, 0.0)[0])
    assert np.isfinite(w_arc.pixel_to_world(170.0, 0.0)[0])

    # (b) sparse anti-diagonal CD (no CD1_1 key): rotation applied
    w = WCS({'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN', 'CRVAL1': 10.0,
             'CRVAL2': 5.0, 'CRPIX1': 50.0, 'CRPIX2': 50.0,
             'CD1_2': -1e-3, 'CD2_1': 1e-3})
    ra, dec = w.pixel_to_world(59.0, 49.0)
    np.testing.assert_allclose(w.world_to_pixel(ra, dec), (59.0, 49.0),
                               rtol=0, atol=1e-8)
    assert np.hypot(ra - 10.0, dec - 5.0) > 1e-4
    with pytest.raises(ValueError, match='singular'):
        WCS({'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN', 'CD1_1': 1e-3})

    # (c) latitude-first == row-swapped lon-first
    wa = WCS({'CTYPE1': 'DEC--TAN', 'CTYPE2': 'RA---TAN', 'CRVAL1': 30.0,
              'CRVAL2': 80.0, 'CRPIX1': 40.0, 'CRPIX2': 60.0,
              'CD1_1': 2e-3, 'CD1_2': 1e-4, 'CD2_1': -2e-4,
              'CD2_2': -1.8e-3})
    wb = WCS({'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN', 'CRVAL1': 80.0,
              'CRVAL2': 30.0, 'CRPIX1': 40.0, 'CRPIX2': 60.0,
              'CD1_1': -2e-4, 'CD1_2': -1.8e-3, 'CD2_1': 2e-3,
              'CD2_2': 1e-4})
    for xy in [(0.0, 0.0), (100.0, 30.0), (39.0, 59.0)]:
        np.testing.assert_allclose(wa.pixel_to_world(*xy),
                                   wb.pixel_to_world(*xy), rtol=0,
                                   atol=1e-12)
        ra, dec = wa.pixel_to_world(*xy)
        np.testing.assert_allclose(wa.world_to_pixel(ra, dec), xy,
                                   rtol=0, atol=1e-8)
    wz = WCS({'CTYPE1': 'DEC--ZPN', 'CTYPE2': 'RA---ZPN', 'CRVAL1': 30.0,
              'CRVAL2': 80.0, 'CRPIX1': 40.0, 'CRPIX2': 60.0,
              'CD1_1': 2e-3, 'CD2_2': -2e-3, 'PV1_1': 1.0})
    ra, dec = wz.pixel_to_world(10.0, 20.0)
    np.testing.assert_allclose(wz.world_to_pixel(ra, dec), (10.0, 20.0),
                               rtol=0, atol=1e-8)
    # lat-first ZPN header round-trips through to_header (PV1_m carried)
    wz2 = WCS(dict(wz.to_header().items()))
    np.testing.assert_allclose(wz2.pixel_to_world(10.0, 20.0), (ra, dec),
                               rtol=0, atol=1e-12)

    # (d) closed-map meridian bounds
    w_sfl = WCS(hdr('SFL', CRVAL1=0.0, CRVAL2=0.0))
    assert np.isnan(w_sfl.pixel_to_world(170.0, 60.0)[0])
    assert np.isfinite(w_sfl.pixel_to_world(170.0, 0.0)[0])
    assert np.isnan(WCS(hdr('MOL', CRVAL1=0.0, CRVAL2=0.0))
                    .pixel_to_world(170.0, 30.0)[0])
    w_hpx = WCS(hdr('HPX', CRVAL1=0.0, CRVAL2=0.0))
    assert np.isnan(w_hpx.pixel_to_world(185.0, 0.0)[0])
    assert np.isfinite(w_hpx.pixel_to_world(179.0, 0.0)[0])

    # (e) nonstandard HEALPix grid
    with pytest.raises(ValueError, match='HPX'):
        WCS(hdr('HPX', PV2_1=2.0))

    # (f) ZPN domain: R = g - 100 g^3 has its true maximum at
    # g = 1/sqrt(300); just inside inverts, just beyond is NaN
    _, th_of = _zpn_pair([0.0, 1.0, 0.0, -100.0])
    g_true = 1.0 / np.sqrt(300.0)
    r_max = g_true - 100.0 * g_true ** 3
    assert np.isfinite(th_of(np.array([r_max * 0.999999])))
    assert np.isnan(th_of(np.array([r_max * 1.0001])))


def test_wcs_fuzz_all_codes_roundtrip_or_nan():
    """Property fuzz across EVERY supported projection code: random
    valid headers (random fiducials, scales, rotations and projection
    parameters) must either round-trip pixel -> world -> pixel to
    sub-1e-5 px or return NaN — never silent garbage. Guards the whole
    dispatch surface (zenithal incl. slant, cylindrical,
    pseudo-cylindrical, conic, pseudo-conic, all-sky, TPV) uniformly,
    including the header write/read carry."""
    rng = np.random.default_rng(11)
    codes = ['TAN', 'SIN', 'ARC', 'STG', 'ZEA', 'ZPN', 'AZP', 'SZP',
             'TPV', 'CAR', 'CEA', 'MER', 'CYP', 'SFL', 'AIT', 'MOL',
             'PAR', 'BON', 'PCO', 'HPX', 'TSC', 'COP', 'COE', 'COD',
             'COO']
    for code in codes:
        for trial in range(3):
            crval2 = float(rng.uniform(-75.0, 75.0))
            hdr = {'CTYPE1': f'RA---{code}', 'CTYPE2': f'DEC--{code}',
                   'CRPIX1': float(rng.uniform(-20.0, 320.0)),
                   'CRPIX2': float(rng.uniform(-20.0, 320.0)),
                   'CRVAL1': float(rng.uniform(0.0, 360.0)),
                   'CRVAL2': crval2,
                   'CD1_1': float(-2e-3 * rng.uniform(0.5, 2.0)),
                   'CD1_2': float(2e-4 * rng.normal()),
                   'CD2_1': float(2e-4 * rng.normal()),
                   'CD2_2': float(2e-3 * rng.uniform(0.5, 2.0))}
            if code == 'ZPN':
                hdr['PV2_1'] = float(rng.uniform(0.5, 1.5))
                hdr['PV2_3'] = float(rng.uniform(-0.2, 0.2))
            elif code == 'AZP':
                hdr['PV2_1'] = float(rng.uniform(0.0, 4.0))
            elif code == 'SZP':
                hdr['PV2_1'] = float(rng.uniform(0.0, 3.0))
                hdr['PV2_2'] = float(rng.uniform(-180.0, 180.0))
                hdr['PV2_3'] = float(rng.uniform(30.0, 90.0))
            elif code == 'TPV':
                hdr['PV1_1'] = float(rng.uniform(0.9, 1.1))
                hdr['PV2_1'] = float(rng.uniform(0.9, 1.1))
                hdr['PV1_7'] = float(1e-3 * rng.normal())
                hdr['PV2_11'] = float(1e-3 * rng.normal())
            elif code == 'CEA':
                hdr['PV2_1'] = float(rng.uniform(0.2, 1.0))
            elif code == 'CYP':
                hdr['PV2_1'] = float(rng.uniform(0.5, 3.0))
                hdr['PV2_2'] = float(rng.uniform(0.3, 1.5))
            elif code == 'BON':
                hdr['PV2_1'] = float(rng.choice([-1.0, 1.0])
                                     * rng.uniform(10.0, 90.0))
            elif code in ('COP', 'COE', 'COD', 'COO'):
                ta = float(rng.choice([-1.0, 1.0])
                           * rng.uniform(15.0, 70.0))
                eta = float(rng.uniform(0.0, min(15.0,
                                                 88.0 - abs(ta))))
                hdr['PV2_1'], hdr['PV2_2'] = ta, eta
                # keep the fiducial reachable for the pole solver
                hdr['CRVAL2'] = float(np.clip(crval2, ta - 40.0,
                                              ta + 40.0))
            w = WCS(hdr)
            w2 = WCS(dict(w.to_header().items()))
            xs = rng.uniform(-10.0, 310.0, 40)
            ys = rng.uniform(-10.0, 310.0, 40)
            ra, dec = w.pixel_to_world(xs, ys)
            ok = np.isfinite(ra) & np.isfinite(dec)
            assert ok.sum() >= 10, (code, trial, ok.sum())
            bx, by = w.world_to_pixel(ra[ok], dec[ok])
            err = np.hypot(bx - xs[ok], by - ys[ok])
            assert np.nanmax(err) < 1e-5, (code, trial, np.nanmax(err))
            # header round-trip agrees where finite
            ra2, dec2 = w2.pixel_to_world(xs[ok], ys[ok])
            np.testing.assert_allclose(ra2, ra[ok], rtol=0, atol=1e-9,
                                       err_msg=f'{code} header carry')

    # all-sky-scale pass: 1 deg/px grids overhanging every map boundary.
    # The same round-trip-or-NaN property must hold — this is the guard
    # that catches clip-onto-the-limb / wrap-onto-a-second-sky-copy
    # classes of bug (pixels outside the projection must NaN, pixels
    # inside must invert back to themselves, never to a wrapped twin).
    allsky = ['SIN', 'ARC', 'ZEA', 'STG', 'CAR', 'CEA', 'MER', 'CYP',
              'SFL', 'AIT', 'MOL', 'PAR', 'HPX', 'TSC', 'BON', 'PCO']
    for code in allsky:
        hdr = {'CTYPE1': f'RA---{code}', 'CTYPE2': f'DEC--{code}',
               'CRPIX1': 200.0, 'CRPIX2': 100.0,
               'CRVAL1': float(rng.uniform(0.0, 360.0)),
               'CRVAL2': 0.0, 'CDELT1': -1.0, 'CDELT2': 1.0}
        if code == 'BON':
            hdr['PV2_1'] = 45.0
        w = WCS(hdr)
        xs = rng.uniform(-10.0, 410.0, 300)
        ys = rng.uniform(-10.0, 210.0, 300)
        ra, dec = w.pixel_to_world(xs, ys)
        ok = np.isfinite(ra) & np.isfinite(dec)
        assert ok.sum() >= 15, (code, ok.sum())   # SIN's disc is small
        bx, by = w.world_to_pixel(ra[ok], dec[ok])
        dx = bx - xs[ok]
        # a pixel that survives pixel_to_world must map back to ITSELF;
        # on the periodic cylinders a 360-deg x-wrapped twin (x period =
        # lambda * 360 / |CDELT| px, lambda = 1 for all four defaults)
        # is the one allowed exception
        if code in ('CAR', 'CEA', 'MER', 'CYP'):
            dx = (dx + 180.0) % 360.0 - 180.0
        err = np.hypot(dx, by - ys[ok])
        assert np.nanmax(err) < 1e-5, (code, np.nanmax(err))


def test_wcs_slant_zenithal_projections():
    """Slant orthographic (SIN with PV2_1/PV2_2 — the AIPS/CASA radio
    convention, NCP = (0, cot dec0)) and SZP (slant zenithal
    perspective, PV2_1..3): the forwards are pinned to their DEFINING
    projective geometry — slant SIN's (X - S) parallel to the fixed
    direction (xi, eta, 1) for every sphere point S, SZP's P-S-X
    collinearity through the projection point P — the inverses by
    plane->native->plane round-trips over the valid disc plus the
    larger-root branch law; exact special cases (slant(0,0) == SIN,
    SZP(mu, *, 90) == AZP(mu) for any phi_c, SZP(0) == TAN); WCS-level
    NCP and SZP header round-trips; degenerate SZP raises; plain SIN
    headers keep the radius-law path."""
    from tpu_sgp.image.wcs import _azp_pair, _slant_sin_pair, _szp_pair

    d2r = np.pi / 180.0
    rng = np.random.default_rng(5)
    phi = rng.uniform(-np.pi, np.pi, 500)
    theta = np.arcsin(rng.uniform(-1.0, 1.0, 500))
    l = np.cos(theta) * np.sin(phi)
    m = -np.cos(theta) * np.cos(phi)
    n = np.sin(theta)

    xi_s, eta_s = 0.3, -0.5
    fwd, inv = _slant_sin_pair(xi_s, eta_s)
    x, y = fwd(phi, theta)
    np.testing.assert_allclose(x - l, xi_s * (1 - n), rtol=0, atol=1e-14)
    np.testing.assert_allclose(y - m, eta_s * (1 - n), rtol=0,
                               atol=1e-14)
    xs = rng.uniform(-0.9, 0.9, 2000)
    ys = rng.uniform(-0.9, 0.9, 2000)
    p2, t2 = inv(xs, ys)
    ok = np.isfinite(p2)
    assert 0.5 < ok.mean() < 1.0        # disc boundary NaNs out
    x3, y3 = fwd(p2[ok], t2[ok])
    np.testing.assert_allclose(x3, xs[ok], rtol=0, atol=1e-12)
    np.testing.assert_allclose(y3, ys[ok], rtol=0, atol=1e-12)
    # branch law: returned sin(theta) is the quadratic's larger root
    a = 1 + xi_s ** 2 + eta_s ** 2
    u, v = xs[ok] - xi_s, ys[ok] - eta_s
    assert np.all(np.sin(t2[ok])
                  >= -(u * xi_s + v * eta_s) / a - 1e-12)

    mu, pc, tc = 1.5, 40 * d2r, 55 * d2r
    fwd, inv = _szp_pair(mu, pc, tc)
    P = np.array([-mu * np.cos(tc) * np.sin(pc),
                  mu * np.cos(tc) * np.cos(pc), -mu * np.sin(tc)])
    x, y = fwd(phi, theta)
    ok = np.isfinite(x)
    X = np.stack([x, y, np.ones_like(x)], axis=1)
    S = np.stack([l, m, n], axis=1)
    assert np.abs(np.cross(X[ok] - P, S[ok] - P)).max() < 1e-12
    p2, t2 = inv(xs, ys)
    ok2 = np.isfinite(p2)
    x3, y3 = fwd(p2[ok2], t2[ok2])
    np.testing.assert_allclose(x3, xs[ok2], rtol=0, atol=1e-11)
    np.testing.assert_allclose(y3, ys[ok2], rtol=0, atol=1e-11)

    # exact special cases
    r_azp, _ = _azp_pair(2.0)
    rr = r_azp(theta)
    for pcv in (0.0, 1.0, -2.2):
        f, _ = _szp_pair(2.0, pcv, np.pi / 2)
        xs2, ys2 = f(phi, theta)
        sel = np.isfinite(xs2)
        np.testing.assert_allclose(xs2[sel], (rr * np.sin(phi))[sel],
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(ys2[sel], (-rr * np.cos(phi))[sel],
                                   rtol=0, atol=1e-12)
    f, _ = _szp_pair(0.0, 0.7, 0.3)
    xs2, ys2 = f(phi, theta)
    sel = theta > 0.05
    np.testing.assert_allclose(
        xs2[sel], (np.cos(theta) / np.sin(theta) * np.sin(phi))[sel],
        rtol=0, atol=1e-12)
    f0, _ = _slant_sin_pair(0.0, 0.0)
    x0, y0 = f0(phi, theta)
    np.testing.assert_allclose(x0, l, rtol=0, atol=1e-15)
    np.testing.assert_allclose(y0, m, rtol=0, atol=1e-15)

    # WCS level: an NCP header and a full SZP header
    for hdr in [
            {'CTYPE1': 'RA---SIN', 'CTYPE2': 'DEC--SIN', 'CRPIX1': 256.0,
             'CRPIX2': 256.0, 'CRVAL1': 82.5, 'CRVAL2': 49.0,
             'CD1_1': -3e-4, 'CD2_2': 3e-4, 'PV2_1': 0.0,
             'PV2_2': 1.0 / np.tan(49.0 * d2r)},
            {'CTYPE1': 'RA---SZP', 'CTYPE2': 'DEC--SZP', 'CRPIX1': 256.0,
             'CRPIX2': 256.0, 'CRVAL1': 82.5, 'CRVAL2': -33.0,
             'CD1_1': -3e-4, 'CD2_2': 3e-4, 'PV2_1': 1.8, 'PV2_2': 25.0,
             'PV2_3': 70.0}]:
        w = WCS(hdr)
        for xy in [(0.0, 0.0), (511.0, 511.0), (100.3, 412.7),
                   (255.0, 255.0)]:
            ra, dec = w.pixel_to_world(*xy)
            np.testing.assert_allclose(w.world_to_pixel(ra, dec), xy,
                                       rtol=0, atol=1e-7,
                                       err_msg=str(xy))
        np.testing.assert_allclose(w.pixel_to_world(255.0, 255.0),
                                   (hdr['CRVAL1'], hdr['CRVAL2']),
                                   rtol=0, atol=1e-9)
        w2 = WCS(dict(w.to_header().items()))
        want = w.pixel_to_world(100.3, 412.7)
        np.testing.assert_allclose(w2.pixel_to_world(100.3, 412.7), want,
                                   rtol=0, atol=1e-11)
        cut = w.shifted(30.0, 40.0)
        np.testing.assert_allclose(cut.pixel_to_world(70.3, 372.7), want,
                                   rtol=0, atol=1e-11)

    # plain SIN (no PV keys) still runs the radius-law zenithal path
    w = WCS({'CTYPE1': 'RA---SIN', 'CTYPE2': 'DEC--SIN', 'CRVAL1': 82.5,
             'CRVAL2': 49.0, 'CRPIX1': 256.0, 'CRPIX2': 256.0,
             'CD1_1': -3e-4, 'CD2_2': 3e-4})
    assert w._slant is None
    ra, dec = w.pixel_to_world(100.0, 100.0)
    np.testing.assert_allclose(w.world_to_pixel(ra, dec),
                               (100.0, 100.0), rtol=0, atol=1e-8)

    with pytest.raises(ValueError, match='SZP'):
        WCS({'CTYPE1': 'RA---SZP', 'CTYPE2': 'DEC--SZP', 'CRVAL1': 10.0,
             'CRVAL2': 5.0, 'PV2_1': -1.0, 'PV2_3': 90.0})


def test_wcs_perspective_and_pseudoconic_projections():
    """CYP (cylindrical perspective, PV2_1=mu / PV2_2=lambda), PAR
    (Craster parabolic), BON (Bonne pseudo-conic, PV2_1=theta_1) and PCO
    (polyconic): f64 full-sky round-trips; CYP pinned to its exact
    special cases (Gall stereographic y = (1 + lambda) tan(theta/2) at
    mu = 1, central cylindrical y = lambda tan(theta) at mu = 0); PAR
    and BON pinned EQUAL-AREA (unit Jacobian per solid angle); BON and
    PCO pinned to true scale along every parallel and the central
    meridian, PCO additionally to its defining circular-arc parallels
    (radius cot(theta) about (0, theta + cot(theta))) and the exact
    straight equator; WCS-level rotated-fiducial round-trips,
    header/cutout carry, invalid parameters raise."""
    from tpu_sgp.image.wcs import (_bon, _bon_inv, _cyp, _cyp_inv, _par,
                                   _par_inv, _pco, _pco_inv)

    d2r = np.pi / 180.0
    rng = np.random.default_rng(3)
    phi = rng.uniform(-np.pi, np.pi, 3000)
    theta = np.arcsin(rng.uniform(-1.0, 1.0, 3000))
    for name, fwd, inv, lam in [
            ('CYP', _cyp, _cyp_inv, (1.0, np.sqrt(2) / 2)),
            ('PAR', _par, _par_inv, None),
            ('BON', _bon, _bon_inv, 40 * d2r),
            ('BON-south', _bon, _bon_inv, -30 * d2r),
            ('PCO', _pco, _pco_inv, None)]:
        xi, eta = inv(phi, theta, lam)
        p2, t2 = fwd(xi, eta, lam)
        dphi = np.abs(np.arctan2(np.sin(p2 - phi), np.cos(p2 - phi)))
        assert (dphi * np.cos(theta)).max() < 1e-7, name
        assert np.abs(t2 - theta).max() < 1e-7, name

    # CYP defaults are wcslib's mu = lambda = 1 (NOT Gall)
    w_def = WCS({'CTYPE1': 'RA---CYP', 'CTYPE2': 'DEC--CYP',
                 'CRVAL1': 10.0, 'CRVAL2': 0.0, 'CRPIX1': 50.0,
                 'CRPIX2': 50.0, 'CD1_1': -0.5, 'CD2_2': 0.5})
    w_11 = WCS({'CTYPE1': 'RA---CYP', 'CTYPE2': 'DEC--CYP',
                'CRVAL1': 10.0, 'CRVAL2': 0.0, 'CRPIX1': 50.0,
                'CRPIX2': 50.0, 'CD1_1': -0.5, 'CD2_2': 0.5,
                'PV2_1': 1.0, 'PV2_2': 1.0})
    np.testing.assert_allclose(w_def.pixel_to_world(20.0, 80.0),
                               w_11.pixel_to_world(20.0, 80.0), rtol=0,
                               atol=1e-13)

    # CYP exact special cases + the x = lambda phi law
    th = np.array([-1.1, -0.3, 0.0, 0.5, 1.2])
    x, y = _cyp_inv(np.full(5, 0.7), th, (1.0, np.sqrt(2) / 2))
    np.testing.assert_allclose(y * d2r,
                               (1 + np.sqrt(2) / 2) * np.tan(th / 2),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(x * d2r, np.sqrt(2) / 2 * 0.7, rtol=0,
                               atol=1e-13)
    x, y = _cyp_inv(np.full(5, 0.7), th, (0.0, 1.0))
    np.testing.assert_allclose(y * d2r, np.tan(th), rtol=0, atol=1e-12)

    # PAR forward law
    x, y = _par_inv(np.array([0.7]), np.array([0.9]), None)
    np.testing.assert_allclose(y * d2r, 3 * np.sin(0.3), rtol=0,
                               atol=1e-14)
    np.testing.assert_allclose(x * d2r, 0.7 * (2 * np.cos(0.6) - 1),
                               rtol=0, atol=1e-14)

    # equal-area: |d(x,y)/d(phi,theta)| / cos(theta) == 1
    def area_jac(inv, lam, phi0, th0):
        d = 1e-6
        pts = [(phi0 + d, th0), (phi0 - d, th0),
               (phi0, th0 + d), (phi0, th0 - d)]
        (x1, y1), (x0, y0), (x2, y2), (x3, y3) = [
            inv(np.array([p]), np.array([t]), lam) for p, t in pts]
        J = ((x1 - x0) * (y2 - y3) - (x2 - x3) * (y1 - y0)) / (4 * d * d)
        return (J * d2r * d2r / np.cos(th0)).item()

    for t0 in (0.1, 0.6, 1.2, 1.45):
        assert abs(area_jac(_par_inv, None, 0.4, t0) - 1.0) < 1e-4
        assert abs(area_jac(_bon_inv, 40 * d2r, 0.4, t0) - 1.0) < 1e-4

    # BON: true scale along parallels; central meridian is y = theta
    lam = 40 * d2r
    d = 1e-6
    for t0 in (-0.5, 0.2, 1.0):
        xa, ya = _bon_inv(np.array([0.3 + d]), np.array([t0]), lam)
        xb, yb = _bon_inv(np.array([0.3 - d]), np.array([t0]), lam)
        np.testing.assert_allclose(
            np.hypot(xa - xb, ya - yb) * d2r / (2 * d), np.cos(t0),
            rtol=1e-6)
    x, y = _bon_inv(np.zeros(3), np.array([-0.4, 0.3, 1.0]), lam)
    np.testing.assert_allclose(y * d2r, [-0.4, 0.3, 1.0], rtol=0,
                               atol=1e-13)
    np.testing.assert_allclose(x, 0.0, rtol=0, atol=1e-13)

    # PCO: circular-arc parallels at true scale; exact straight equator
    for t0 in (-0.8, 0.3, 1.1):
        ph = np.linspace(-2.0, 2.0, 9)
        x, y = _pco_inv(ph, np.full(9, t0), None)
        cot = 1 / np.tan(t0)
        np.testing.assert_allclose(np.hypot(x * d2r, t0 + cot - y * d2r),
                                   abs(cot), rtol=1e-12)
        xa, ya = _pco_inv(np.array([0.3 + d]), np.array([t0]), None)
        xb, yb = _pco_inv(np.array([0.3 - d]), np.array([t0]), None)
        np.testing.assert_allclose(
            np.hypot(xa - xb, ya - yb) * d2r / (2 * d), np.cos(t0),
            rtol=1e-6)
    x, y = _pco_inv(np.zeros(3), np.array([-0.7, 0.0, 1.2]), None)
    np.testing.assert_allclose(y * d2r, [-0.7, 0.0, 1.2], rtol=0,
                               atol=1e-12)
    np.testing.assert_allclose(x, 0.0, rtol=0, atol=1e-13)
    x, y = _pco_inv(np.array([1.3]), np.array([0.0]), None)
    np.testing.assert_allclose(np.concatenate([x, y]) * d2r, [1.3, 0.0],
                               rtol=0, atol=1e-12)

    # Werner's projection (BON theta_1 = 90) is a valid Bonne limit:
    # heart-shaped, equal-area, parallels about (0, pi/2)
    for t0 in (0.3, 1.0):
        assert abs(area_jac(_bon_inv, np.pi / 2, 0.4, t0) - 1.0) < 1e-4
    x, y = _bon_inv(np.linspace(-1.5, 1.5, 7), np.full(7, 0.4),
                    np.pi / 2)
    np.testing.assert_allclose(
        np.hypot(x * d2r, np.pi / 2 - y * d2r), np.pi / 2 - 0.4,
        rtol=1e-12)

    # WCS level: rotated fiducial, exact CRVAL, header/cutout carry
    for code, extra in [('CYP', {'PV2_1': 1.0, 'PV2_2': 0.8}),
                        ('PAR', {}), ('BON', {'PV2_1': 35.0}),
                        ('BON', {'PV2_1': -25.0}), ('BON',
                                                    {'PV2_1': 90.0}),
                        ('PCO', {})]:
        w = WCS(dict({'CTYPE1': f'RA---{code}', 'CTYPE2': f'DEC--{code}',
                      'CRPIX1': 200.0, 'CRPIX2': 150.0, 'CRVAL1': 123.0,
                      'CRVAL2': 8.0, 'CD1_1': -2e-2, 'CD2_2': 2e-2},
                     **extra))
        n_finite = 0
        for xy in [(0.0, 0.0), (399.0, 299.0), (150.5, 200.5)]:
            ra, dec = w.pixel_to_world(*xy)
            if not np.isfinite(ra):
                continue
            n_finite += 1
            np.testing.assert_allclose(w.world_to_pixel(ra, dec), xy,
                                       rtol=0, atol=2e-6,
                                       err_msg=f'{code} {extra} {xy}')
        assert n_finite >= 2, (code, extra)   # skips must not hide NaNs
        np.testing.assert_allclose(w.pixel_to_world(199.0, 149.0),
                                   (123.0, 8.0), rtol=0, atol=1e-8,
                                   err_msg=code)
        w2 = WCS(dict(w.to_header().items()))
        want = w.pixel_to_world(150.5, 200.5)
        np.testing.assert_allclose(w2.pixel_to_world(150.5, 200.5), want,
                                   rtol=0, atol=1e-10)
        cut = w.shifted(40.0, 30.0)
        np.testing.assert_allclose(cut.pixel_to_world(110.5, 170.5),
                                   want, rtol=0, atol=1e-10)

    with pytest.raises(ValueError, match='BON'):
        WCS({'CTYPE1': 'RA---BON', 'CTYPE2': 'DEC--BON',
             'CRVAL1': 10.0, 'CRVAL2': 5.0})      # theta_1 = 0 is SFL
    with pytest.raises(ValueError, match='CYP'):
        WCS({'CTYPE1': 'RA---CYP', 'CTYPE2': 'DEC--CYP', 'CRVAL1': 10.0,
             'CRVAL2': 5.0, 'PV2_1': -0.8, 'PV2_2': 0.8})  # mu = -lambda


def test_wcs_allsky_grid_projections():
    """HPX (HEALPix, Calabretta & Roukema 2007, standard H=4/K=3) and
    TSC (tangential spherical cube, CG02 section 5.6.1): full-sky
    round-trips at f64 precision; HPX pinned to its defining laws —
    equatorial band y = (3 pi / 8) sin(theta), the 45-deg transition at
    sin(theta) = 2/3, and a CONSTANT area Jacobian 3 pi / 8 per unit
    solid angle in both zones (HEALPix's raison d'etre); off-facet polar
    pixels NaN. TSC pinned to per-face gnomonic (face 1 is exactly
    x = 45 m / l, y = 45 n / l) and to plane continuity across the
    interior cross edges; WCS-level round-trips for both."""
    from tpu_sgp.image.wcs import _hpx, _hpx_inv, _tsc, _tsc_inv

    d2r = np.pi / 180.0
    rng = np.random.default_rng(1)
    phi = rng.uniform(-np.pi, np.pi, 2000)
    theta = np.arcsin(rng.uniform(-1.0, 1.0, 2000))
    for name, fwd, inv in (('HPX', _hpx, _hpx_inv),
                           ('TSC', _tsc, _tsc_inv)):
        xi, eta = inv(phi, theta, 1.0)
        p2, t2 = fwd(xi, eta, 1.0)
        dphi = np.abs(np.arctan2(np.sin(p2 - phi), np.cos(p2 - phi)))
        assert (dphi * np.cos(theta)).max() < 1e-9, name
        assert np.abs(t2 - theta).max() < 1e-9, name

    # HPX equatorial law + transition + pole
    th = np.arcsin(np.array([-0.6, -0.2, 0.0, 0.3, 2.0 / 3.0]))
    xi, eta = _hpx_inv(np.full(5, 0.5), th, 1.0)
    np.testing.assert_allclose(eta * d2r, 3 * np.pi / 8 * np.sin(th),
                               rtol=0, atol=1e-14)
    np.testing.assert_allclose(xi * d2r, 0.5, rtol=0, atol=1e-14)
    np.testing.assert_allclose(eta[-1], 45.0, rtol=0, atol=1e-10)
    _, eta_p = _hpx_inv(np.array([np.pi / 4]),
                        np.array([np.pi / 2 - 1e-9]), 1.0)
    np.testing.assert_allclose(eta_p, 90.0, rtol=0, atol=1e-5)

    # HPX equal-area: |d(x, y) / d(phi, theta)| / cos(theta) == 3 pi / 8
    # at latitudes spanning both zones (finite-difference Jacobian)
    def hpx_jac(phi0, th0):
        d = 1e-6
        pts = [(phi0 + d, th0), (phi0 - d, th0),
               (phi0, th0 + d), (phi0, th0 - d)]
        (x1, y1), (x0, y0), (x2, y2), (x3, y3) = [
            _hpx_inv(np.array([p]), np.array([t]), 1.0) for p, t in pts]
        J = ((x1 - x0) * (y2 - y3) - (x2 - x3) * (y1 - y0)) / (4 * d * d)
        return (J * d2r * d2r / np.cos(th0)).item()

    js = [hpx_jac(0.3, t) for t in (0.1, 0.5, 0.75, 1.0, 1.3, 1.5)]
    np.testing.assert_allclose(js, 3 * np.pi / 8, rtol=1e-4)

    # off-facet polar pixels are off-projection
    p_bad, t_bad = _hpx(np.array([89.9]), np.array([89.0]), 1.0)
    assert np.isnan(p_bad).all() and np.isnan(t_bad).all()

    # TSC face 1 is the gnomonic about (0, 0)
    ph = np.array([0.2, -0.3])
    th0 = np.array([0.1, 0.4])
    xi, eta = _tsc_inv(ph, th0, 1.0)
    l = np.cos(th0) * np.cos(ph)
    np.testing.assert_allclose(xi, 45 * np.cos(th0) * np.sin(ph) / l,
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(eta, 45 * np.sin(th0) / l, rtol=0,
                               atol=1e-12)

    # continuity across the interior cross edges (1|2, 1|0, 1|5)
    def tsc_xy(phi0, th0):
        x, y = _tsc_inv(np.array([phi0]), np.array([th0]), 1.0)
        return x.item(), y.item()

    eps = 1e-9
    for (pa, ta), (pb, tb) in [
            ((np.pi / 4 - eps, 0.3), (np.pi / 4 + eps, 0.3)),
            ((0.2, np.pi / 4 - eps), (0.2, np.pi / 4 + eps)),
            ((-0.15, -np.pi / 4 + eps), (-0.15, -np.pi / 4 - eps))]:
        a, b = tsc_xy(pa, ta), tsc_xy(pb, tb)
        assert abs(a[0] - b[0]) < 1e-5 and abs(a[1] - b[1]) < 1e-5, (a, b)

    # WCS level: all-sky header round-trips + exact fiducial. Points are
    # split into on-projection (must round-trip) and off-projection
    # (must be NaN — silently skipping NaNs would hide a forward/inverse
    # branch mismatch).
    cases = {
        # 0.36 deg/px, CRPIX (500.5, 400.5): xi = -(x - 499.5) * 0.36
        'HPX': {'good': [(400.0, 300.0), (123.0, 500.0), (700.0, 350.0)],
                'bad': [(0.0, 0.0)]},      # xi=179.8, eta=-143.8: |y|>90
        # TSC cross layout: xi in [-45, 315], |eta| <= 45 equatorial
        'TSC': {'good': [(400.0, 300.0), (620.0, 420.0), (390.0, 520.0)],
                # xi = -99.9 (past the x = -45 layout edge: wcslib NaNs
                # here; a 360-deg wrap onto face 4 would desync the
                # forward from world_to_pixel by 1800 px), and a corner
                # outside every face
                'bad': [(777.0, 400.0), (0.0, 0.0)]},
    }
    for code, pts in cases.items():
        w = WCS({'CTYPE1': f'RA---{code}', 'CTYPE2': f'DEC--{code}',
                 'CRPIX1': 500.5, 'CRPIX2': 400.5, 'CRVAL1': 0.0,
                 'CRVAL2': 0.0, 'CD1_1': -0.36, 'CD2_2': 0.36})
        for xy in pts['good']:
            ra, dec = w.pixel_to_world(*xy)
            assert np.isfinite(ra) and np.isfinite(dec), (code, xy)
            np.testing.assert_allclose(w.world_to_pixel(ra, dec), xy,
                                       rtol=0, atol=1e-7,
                                       err_msg=f'{code} {xy}')
        for xy in pts['bad']:
            ra, dec = w.pixel_to_world(*xy)
            assert np.isnan(ra) and np.isnan(dec), (code, xy, ra, dec)
        np.testing.assert_allclose(w.pixel_to_world(499.5, 399.5),
                                   (0.0, 0.0), rtol=0, atol=1e-9)


def test_wcs_tpv_distorted_tan():
    """TPV (the registered SCAMP/SWarp distorted-TAN convention): the
    40-entry term table is pinned index-by-index; default coefficients
    reproduce plain TAN exactly; the analytic Jacobian matches finite
    differences (incl. the radial r/r^3/r^5/r^7 cusp terms); a realistic
    distortion set round-trips through the Newton inverse; legacy
    CTYPE-TAN headers carrying PV keys behave identically; header and
    cutout round-trips carry the distortion."""
    from tpu_sgp.image.wcs import _tpv_eval, _tpv_jac, _TPV_TERMS

    # the published TPV sequence: degrees 0..7 in (x^a y^b) lexicographic
    # descent with the odd radial terms at indices 3, 11, 23, 39
    assert len(_TPV_TERMS) == 40
    assert _TPV_TERMS[0] == (0, 0, 0) and _TPV_TERMS[1] == (1, 0, 0)
    assert _TPV_TERMS[2] == (0, 1, 0) and _TPV_TERMS[3] == (0, 0, 1)
    assert _TPV_TERMS[4] == (2, 0, 0) and _TPV_TERMS[7] == (3, 0, 0)
    assert _TPV_TERMS[10] == (0, 3, 0) and _TPV_TERMS[11] == (0, 0, 3)
    assert _TPV_TERMS[12] == (4, 0, 0) and _TPV_TERMS[17] == (5, 0, 0)
    assert _TPV_TERMS[23] == (0, 0, 5) and _TPV_TERMS[24] == (6, 0, 0)
    assert _TPV_TERMS[31] == (7, 0, 0) and _TPV_TERMS[38] == (0, 7, 0)
    assert _TPV_TERMS[39] == (0, 0, 7)

    # each basis coefficient evaluates to its own term
    x0, y0 = 0.3, -0.7
    r0 = np.hypot(x0, y0)
    for m, (a, b, d) in enumerate(_TPV_TERMS):
        pv = np.zeros(40)
        pv[m] = 1.0
        want = r0 ** d if d else x0 ** a * y0 ** b
        np.testing.assert_allclose(_tpv_eval(pv, x0, y0), want, rtol=1e-15)

    # analytic Jacobian == finite differences on a random dense vector
    rng = np.random.default_rng(7)
    pvr = np.zeros(40)
    pvr[[0, 1, 2, 3, 5, 7, 11, 16, 23, 31, 39]] = rng.normal(size=11)
    gx, gy = _tpv_jac(pvr, x0, y0)
    dd = 1e-7
    np.testing.assert_allclose(
        gx, (_tpv_eval(pvr, x0 + dd, y0) - _tpv_eval(pvr, x0 - dd, y0))
        / (2 * dd), atol=1e-6)
    np.testing.assert_allclose(
        gy, (_tpv_eval(pvr, x0, y0 + dd) - _tpv_eval(pvr, x0, y0 - dd))
        / (2 * dd), atol=1e-6)

    base = {'CRPIX1': 100.0, 'CRPIX2': 120.0, 'CRVAL1': 210.3,
            'CRVAL2': -12.5, 'CD1_1': -7e-5, 'CD1_2': 3e-6,
            'CD2_1': 2e-6, 'CD2_2': 7.2e-5}
    xs = np.array([0.0, 50.0, 99.5, 199.0])
    ys = np.array([0.0, 111.0, 119.0, 230.0])

    # no PV keys: TPV IS TAN
    tan = WCS(dict(base, CTYPE1='RA---TAN', CTYPE2='DEC--TAN'))
    tpv0 = WCS(dict(base, CTYPE1='RA---TPV', CTYPE2='DEC--TPV'))
    np.testing.assert_allclose(tpv0.pixel_to_world(xs, ys),
                               tan.pixel_to_world(xs, ys), rtol=0,
                               atol=1e-13)

    # realistic survey-scale distortion incl. constant + radial terms
    pv = {'PV1_0': 1e-5, 'PV1_1': 1.0003, 'PV1_2': -2.1e-4, 'PV1_4': 3e-4,
          'PV1_5': -1.5e-4, 'PV1_7': 8e-4, 'PV1_11': -6e-4,
          'PV2_0': -2e-5, 'PV2_1': 0.9997, 'PV2_2': 1.8e-4, 'PV2_6': 2e-4,
          'PV2_10': -5e-4, 'PV2_11': 4e-4}
    tpv = WCS(dict(base, CTYPE1='RA---TPV', CTYPE2='DEC--TPV', **pv))
    ra, dec = tpv.pixel_to_world(xs, ys)
    assert np.abs(np.asarray(tpv.pixel_to_world(xs[1], ys[1]))
                  - np.asarray(tan.pixel_to_world(xs[1], ys[1]))).max() > 0
    bx, by = tpv.world_to_pixel(ra, dec)
    np.testing.assert_allclose(bx, xs, rtol=0, atol=1e-8)
    np.testing.assert_allclose(by, ys, rtol=0, atol=1e-8)

    # legacy convention: CTYPE 'TAN' + PV keys == TPV
    leg = WCS(dict(base, CTYPE1='RA---TAN', CTYPE2='DEC--TAN', **pv))
    np.testing.assert_allclose(leg.pixel_to_world(xs, ys), (ra, dec),
                               rtol=0, atol=1e-13)

    # ...but NOT when the keys cannot be a TPV distortion: a zero linear
    # term (e.g. a writer dumping PV2_1 = 0.0, or non-TPV PV
    # conventions) must be ignored with a warning — wcslib's tanset
    # behavior — not collapse the latitude axis to a degenerate
    # polynomial; all-default keys are silently plain TAN
    import warnings

    from tpu_sgp.image import wcs as wcsmod
    wcsmod._WARNED_CTYPES.discard('TAN+PV')
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter('always')
        degen = WCS(dict(base, CTYPE1='RA---TAN', CTYPE2='DEC--TAN',
                         PV2_1=0.0, PV1_7=8e-4))
    assert sum('PV' in str(r.message) for r in rec) == 1
    np.testing.assert_allclose(degen.pixel_to_world(xs, ys),
                               tan.pixel_to_world(xs, ys), rtol=0,
                               atol=1e-13)
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        triv = WCS(dict(base, CTYPE1='RA---TAN', CTYPE2='DEC--TAN',
                        PV1_1=1.0))
    np.testing.assert_allclose(triv.pixel_to_world(xs, ys),
                               tan.pixel_to_world(xs, ys), rtol=0,
                               atol=1e-13)

    # header write/read and cutout shift carry the distortion
    t2 = WCS(dict(tpv.to_header().items()))
    np.testing.assert_allclose(t2.pixel_to_world(xs, ys), (ra, dec),
                               rtol=0, atol=1e-13)
    cut = tpv.shifted(10.0, 20.0)
    np.testing.assert_allclose(cut.pixel_to_world(xs - 10.0, ys - 20.0),
                               (ra, dec), rtol=0, atol=1e-13)


def test_wcs_pseudo_cylindrical_projections():
    """The all-sky pseudo-cylindrical family: SFL/GLS (Sanson-Flamsteed),
    AIT (Hammer-Aitoff), MOL (Mollweide) — CG02 section 5.4 anchors plus
    world<->pixel round-trips on the all-sky CRVAL=(0,0) grid."""
    d2r = np.pi / 180.0
    allsky = {'CRPIX1': 181.0, 'CRPIX2': 91.0, 'CRVAL1': 0.0,
              'CRVAL2': 0.0, 'CDELT1': -1.0, 'CDELT2': 1.0}

    for code in ('SFL', 'GLS', 'AIT', 'MOL'):
        w = WCS(dict(allsky, CTYPE1=f'RA---{code}', CTYPE2=f'DEC--{code}'))
        # fiducial is exact; world round-trips hold across the map
        np.testing.assert_allclose(w.pixel_to_world(180.0, 90.0),
                                   (0.0, 0.0), rtol=0, atol=1e-12,
                                   err_msg=code)
        for radec in [(20.0, 35.0), (310.0, -55.0), (123.4, 5.6)]:
            x, y = w.world_to_pixel(*radec)
            ra, dec = w.pixel_to_world(float(x), float(y))
            np.testing.assert_allclose((np.mod(ra, 360), dec),
                                       (np.mod(radec[0], 360), radec[1]),
                                       rtol=0, atol=1e-8, err_msg=code)

    # SFL law: xi = phi * cos(theta) — at dec=60, a world point 10 deg
    # east sits at xi = 10 cos(60 deg) = 5 deg -> 5 px left of CRPIX
    w = WCS(dict(allsky, CTYPE1='RA---SFL', CTYPE2='DEC--SFL'))
    x, y = w.world_to_pixel(10.0, 60.0)
    np.testing.assert_allclose((x, y), (180.0 - 10 * np.cos(60 * d2r),
                                        90.0 + 60.0), rtol=0, atol=1e-9)

    # AIT analytic anchor (CG02 eq. 105-106): (phi, theta) = (90, 0) ->
    # gamma = sqrt(2/(1 + cos 45)), x = 2 gamma sin(45 deg), y = 0
    w = WCS(dict(allsky, CTYPE1='RA---AIT', CTYPE2='DEC--AIT'))
    gamma = np.sqrt(2.0 / (1.0 + np.cos(np.pi / 4)))
    x, y = w.world_to_pixel(90.0, 0.0)
    np.testing.assert_allclose(
        (x, y), (180.0 - 2 * gamma * np.sin(np.pi / 4) / d2r, 90.0),
        rtol=0, atol=1e-9)
    # off-projection pixels NaN instead of folding onto the map
    ra, dec = w.pixel_to_world(0.0, 0.0)   # far outside the AIT ellipse
    assert np.isnan(ra) and np.isnan(dec)

    # MOL anchors: the equator maps at x = 2 sqrt(2)/pi * phi (gamma=0),
    # the pole at y = sqrt(2) radians; Newton inverse round-trips near
    # both (the pole is where the Kepler-like equation degenerates)
    w = WCS(dict(allsky, CTYPE1='RA---MOL', CTYPE2='DEC--MOL'))
    x, y = w.world_to_pixel(45.0, 0.0)
    np.testing.assert_allclose(
        (x, y), (180.0 - 2 * np.sqrt(2) / np.pi * 45.0, 90.0),
        rtol=0, atol=1e-9)
    x, y = w.world_to_pixel(0.0, 90.0)
    np.testing.assert_allclose(y, 90.0 + np.sqrt(2) / d2r, rtol=0,
                               atol=1e-7)
    for dec in (89.9, -89.9, 0.001):
        x, y = w.world_to_pixel(15.0, dec)
        ra2, dec2 = w.pixel_to_world(float(x), float(y))
        np.testing.assert_allclose((ra2, dec2), (15.0, dec), rtol=0,
                                   atol=1e-7)


def _tan_wcs(crpix1, crpix2, crval1=150.0, crval2=2.0, scale=2.8e-4,
             rot_deg=0.0):
    c, s = np.cos(np.radians(rot_deg)), np.sin(np.radians(rot_deg))
    return WCS({'CRPIX1': crpix1, 'CRPIX2': crpix2,
                'CRVAL1': crval1, 'CRVAL2': crval2,
                'CD1_1': -scale * c, 'CD1_2': scale * s,
                'CD2_1': scale * s, 'CD2_2': scale * c,
                'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN'})


def test_reproject_identity_and_integer_shift(rng):
    """Same grid -> identity; a pure integer CRPIX shift -> exact placement
    (bilinear sampling lands on pixel centers in both cases)."""
    from tpu_sgp.image import reproject_to_grid

    img = rng.normal(100, 10, (24, 30))
    w = _tan_wcs(10.0, 12.0)
    proj, foot = reproject_to_grid(img, w, w, img.shape, oversample=1)
    # rtol floor: the local-Jacobian flux factor is central-differenced
    # through the trig chain (~2e-10 noise), not algebraically 1
    np.testing.assert_allclose(proj, img, rtol=1e-8)
    np.testing.assert_allclose(foot, 1.0)

    # output grid shifted 5 px right / 3 px up in pixel space
    w2 = _tan_wcs(10.0 - 5.0, 12.0 - 3.0)
    proj2, foot2 = reproject_to_grid(img, w, w2, img.shape, oversample=1)
    np.testing.assert_allclose(proj2[:-3, :-5], img[3:, 5:], rtol=1e-9)
    assert np.isnan(proj2[-1, -1]) and foot2[-1, -1] == 0.0


def test_reproject_rotated_grid_recovers_smooth_field():
    """A smooth world-coordinate field sampled on a rotated grid
    reprojects onto the unrotated grid to interpolation accuracy."""
    from tpu_sgp.image import reproject_to_grid

    w_in = _tan_wcs(32.0, 32.0, rot_deg=15.0)
    w_out = _tan_wcs(30.0, 30.0, rot_deg=0.0)

    def field(wcs, shape):
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(float)
        ra, dec = wcs.pixel_to_world(xx, yy)
        return (np.sin((ra - 150.0) * 600.0)
                + np.cos((dec - 2.0) * 500.0))

    img = field(w_in, (64, 64))
    proj, foot = reproject_to_grid(img, w_in, w_out, (56, 56),
                                   oversample=1, conserve_flux=False)
    want = field(w_out, (56, 56))
    core = np.isfinite(proj)
    core[:6, :] = core[-6:, :] = core[:, :6] = core[:, -6:] = False
    assert core.sum() > 1000
    err = np.abs(proj - want)[core]
    assert err.max() < 1e-2, err.max()   # bilinear on a smooth field


def test_reproject_flux_conservation_across_pixel_scales():
    """Constant per-pixel flux resampled onto 2x-coarser pixels carries
    4x the flux per output pixel (the reproject_exact convention)."""
    from tpu_sgp.image import reproject_to_grid

    img = np.full((40, 40), 7.0)
    w_in = _tan_wcs(20.0, 20.0, scale=1e-4)
    w_out = _tan_wcs(10.0, 10.0, scale=2e-4)
    proj, _ = reproject_to_grid(img, w_in, w_out, (18, 18), oversample=2)
    interior = proj[2:-2, 2:-2]
    np.testing.assert_allclose(interior, 28.0, rtol=1e-9)


def test_reproject_flux_conservation_on_allsky_grid():
    """A compact source at dec = 60 reprojected from its TAN tile onto
    an EQUATOR-ANCHORED all-sky CAR grid (the classic lon-lat map: its
    fiducial must sit on the equator — CRVAL2 = 60 would instead build
    an oblique, locally-undistorted CAR) keeps its TOTAL flux: the CAR
    pixel at dec 60 covers only cos(60) = half the true solid angle of
    a same-CDELT TAN pixel, so the naive global |det CD| ratio (= 1)
    inflates the summed flux ~2x — the local-Jacobian rescaling must
    hold it to <1%."""
    from tpu_sgp.image import reproject_to_grid

    w_tan = _tan_wcs(30.0, 30.0, crval1=150.0, crval2=60.0, scale=0.05)
    yy, xx = np.mgrid[0:60, 0:60].astype(float)
    tile = 100.0 * np.exp(-((xx - 29.5) ** 2 + (yy - 29.5) ** 2)
                          / (2 * 3.0 ** 2))
    flux_in = tile.sum()

    # dec 60 sits 1200 rows above the equator row of the 0.05 deg grid;
    # CRPIX2 places it at output row ~60
    w_car = WCS({'CTYPE1': 'RA---CAR', 'CTYPE2': 'DEC--CAR',
                 'CRPIX1': 61.0, 'CRPIX2': 61.0 - 1200.0,
                 'CRVAL1': 150.0, 'CRVAL2': 0.0,
                 'CDELT1': -0.05, 'CDELT2': 0.05})
    proj, foot = reproject_to_grid(tile, w_tan, w_car, (120, 120),
                                   oversample=3)
    flux_out = np.nansum(proj)
    assert abs(flux_out / flux_in - 1.0) < 0.01, flux_out / flux_in
    # and the uncorrected sum really is ~2x off (the failure this guards)
    raw, _ = reproject_to_grid(tile, w_tan, w_car, (120, 120),
                               oversample=3, conserve_flux=False)
    assert np.nansum(raw) / flux_in > 1.8


def test_wcs_nan_world_propagates_and_no_phantom_gap_data():
    """NaN world coordinates must come back as NaN pixels (the zenithal
    reference-point guard used to collapse NaN onto CRPIX-1), and —
    end-to-end — reprojecting a tile onto an HPX window inside a polar
    facet GAP must yield NaN data with zero footprint, not phantom
    copies of the tile's reference pixel."""
    from tpu_sgp.image import reproject_to_grid

    w_tan = _tan_wcs(30.0, 30.0, crval1=90.0, crval2=60.0, scale=0.05)
    xx, yy = w_tan.world_to_pixel(np.nan, np.nan)
    assert np.isnan(xx) and np.isnan(yy)
    xs, ys = w_tan.world_to_pixel(np.array([90.0, np.nan]),
                                  np.array([60.0, np.nan]))
    assert np.isfinite(xs[0]) and np.isnan(xs[1]) and np.isnan(ys[1])

    # an HPX output window centered on a north polar facet gap
    # (x = -90, y = 80 in plane degrees sits between facets)
    w_hpx = WCS({'CTYPE1': 'RA---HPX', 'CTYPE2': 'DEC--HPX',
                 'CRPIX1': 1.0 - (-90.0 - 20.0 * 0.05 * 0.0) / -0.05,
                 'CRPIX2': 1.0 - 80.0 / 0.05,
                 'CRVAL1': 0.0, 'CRVAL2': 0.0,
                 'CDELT1': -0.05, 'CDELT2': 0.05})
    # confirm the window really is off-projection
    ra_c, dec_c = w_hpx.pixel_to_world(20.0, 20.0)
    assert np.isnan(ra_c) and np.isnan(dec_c)
    tile = np.full((60, 60), 2929.0)
    proj, foot = reproject_to_grid(tile, w_tan, w_hpx, (40, 40),
                                   oversample=2)
    assert np.isnan(proj).all(), 'phantom data in an HPX facet gap'
    assert (foot == 0.0).all()


def test_reproject_coadd_matches_backgrounds_under_varying_jacobian():
    """Two same-grid TAN tiles with different constant background errors
    coadded onto a high-declination strip of an equator-anchored CAR
    grid (local flux Jacobian ~cos(dec) varying across the overlap):
    the constant-offset matching must still remove the seam, because
    matching happens in surface-brightness space BEFORE the Jacobian."""
    from tpu_sgp.image import reproject_and_coadd

    scale = 0.05
    w_a = _tan_wcs(40.0, 40.0, crval1=150.0, crval2=55.0, scale=scale)
    w_b = _tan_wcs(20.0, 40.0, crval1=150.0, crval2=55.0, scale=scale)

    def field(wcs, shape):
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(float)
        ra, dec = wcs.pixel_to_world(xx, yy)
        return 10.0 + np.sin((ra - 150.0) * 3.0) + np.cos(
            (dec - 55.0) * 2.5)

    base_a = field(w_a, (280, 80))           # tall tiles: dec 48..62
    base_b = field(w_b, (280, 80))
    w_car = WCS({'CTYPE1': 'RA---CAR', 'CTYPE2': 'DEC--CAR',
                 'CRPIX1': 51.0, 'CRPIX2': 1.0 - 48.0 / scale,
                 'CRVAL1': 150.0, 'CRVAL2': 0.0,
                 'CDELT1': -scale, 'CDELT2': scale})
    ref, foot = reproject_and_coadd([base_a, base_b], [w_a, w_b],
                                    w_car, (280, 100), oversample=2)
    err, _ = reproject_and_coadd([base_a + 3.0, base_b - 2.0],
                                 [w_a, w_b], w_car, (280, 100),
                                 oversample=2)
    # matching removes the 5-ADU difference (gauge: mean 0), leaving the
    # common mode +0.5 in surface brightness — so err - ref must equal
    # 0.5 * jac(x, y) EVERYWHERE (both tiles share the same projection
    # geometry): smooth, positive, and in particular seam-free across
    # the single-tile/overlap boundaries. Had the offsets been fitted
    # AFTER the flux Jacobian, the removed quantity would be a flux-
    # space constant, leaving a cos(dec)-modulated seam of order
    # 3 * (jac spread ~ 0.13) ~ 0.4 in this strip.
    core = foot > 0.99
    core[:4, :] = core[-4:, :] = core[:, :4] = core[:, -4:] = False
    assert core.sum() > 5000
    yy, xx = np.mgrid[0:280, 0:100].astype(float)
    _, dec = w_car.pixel_to_world(xx, yy)
    ratio = ((err - ref) / np.cos(dec * np.pi / 180.0))[core]
    assert np.nanmin(ratio) > 0.0
    # the residual TAN-scale factor varies ~2% over the strip; a broken
    # (flux-space) match would push the spread to ~50%
    assert np.nanstd(ratio) / np.nanmean(ratio) < 0.03, (
        np.nanstd(ratio) / np.nanmean(ratio))


def test_reproject_and_coadd_cross_grid(rng):
    """Two tiles on DIFFERENT grids (one rotated, one offset, each with its
    own additive background error) coadd back to the parent field with the
    offsets matched away — the capability the reference gets from
    reproject_and_coadd(reproject_exact, match_background=True)."""
    from tpu_sgp.image import reproject_and_coadd

    w_out = _tan_wcs(40.0, 40.0)

    def field(wcs, shape):
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(float)
        ra, dec = wcs.pixel_to_world(xx, yy)
        return (np.sin((ra - 150.0) * 450.0)
                + np.cos((dec - 2.0) * 400.0)) + 50.0

    # tile A covers the left-ish part (shifted grid), tile B rotated
    w_a = _tan_wcs(42.0, 41.0)
    w_b = _tan_wcs(12.0, 12.0, rot_deg=10.0)
    tile_a = field(w_a, (70, 60)) + 3.0      # +3 background error
    tile_b = field(w_b, (60, 60)) - 2.0      # -2 background error
    mosaic, foot = reproject_and_coadd([tile_a, tile_b], [w_a, w_b],
                                       w_out, (80, 80), oversample=2)
    want = field(w_out, (80, 80))
    core = foot > 0.99
    core[:4, :] = core[-4:, :] = core[:, :4] = core[:, -4:] = False
    assert core.sum() > 2000
    resid = (mosaic - want)[core]
    # the matched mosaic is offset by the (gauge) mean of the two errors,
    # spatially FLAT: the seam between the +3 and -2 tiles is gone
    assert np.nanstd(resid) < 6e-3, np.nanstd(resid)


def test_reproject_tan_tile_onto_allsky_car_grid():
    """Cross-PROJECTION reprojection: a TAN survey tile resampled onto an
    all-sky CAR grid (the new cylindrical family composing with the
    mosaicking machinery) recovers a smooth sky field on the overlap."""
    from tpu_sgp.image import reproject_to_grid

    w_tan = _tan_wcs(30.0, 30.0, crval1=150.0, crval2=2.0, scale=0.05)
    # 0.05 deg/px CAR grid centered on the same sky patch
    w_car = WCS({'CTYPE1': 'RA---CAR', 'CTYPE2': 'DEC--CAR',
                 'CRPIX1': 31.0, 'CRPIX2': 31.0,
                 'CRVAL1': 150.0, 'CRVAL2': 0.0,
                 'CDELT1': -0.05, 'CDELT2': 0.05})

    def sky(wcs, shape):
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(float)
        ra, dec = wcs.pixel_to_world(xx, yy)
        return np.sin((ra - 150.0) * 2.0) + np.cos((dec - 2.0) * 1.7) + 10.0

    tile = sky(w_tan, (60, 60))
    proj, foot = reproject_to_grid(tile, w_tan, w_car, (90, 90),
                                   oversample=2, conserve_flux=False)
    want = sky(w_car, (90, 90))
    # pixel AREAS differ between the projections (TAN vs CAR at dec~2):
    # compare per-unit-area values on well-covered pixels
    core = foot > 0.99
    assert core.sum() > 300
    resid = (proj / foot - want)[core]
    assert np.nanstd(resid) < 2e-3, np.nanstd(resid)
    assert abs(np.nanmean(resid)) < 2e-3


def test_reproject_tan_tile_onto_hpx_grid():
    """Survey tile -> HEALPix map: a TAN tile resampled onto an HPX
    all-sky grid (the session-4 grid family composing with the
    mosaicking machinery) recovers the sky field on the overlap — the
    Planck/WMAP-style product path."""
    from tpu_sgp.image import reproject_to_grid

    w_tan = _tan_wcs(30.0, 30.0, crval1=150.0, crval2=2.0, scale=0.05)
    # all-sky-style HPX grid at 0.05 deg/px with the tile's patch
    # falling in the equatorial zone
    w_hpx = WCS({'CTYPE1': 'RA---HPX', 'CTYPE2': 'DEC--HPX',
                 'CRPIX1': 41.0, 'CRPIX2': 41.0,
                 'CRVAL1': 150.0, 'CRVAL2': 0.0,
                 'CDELT1': -0.05, 'CDELT2': 0.05})

    def sky(wcs, shape):
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(float)
        ra, dec = wcs.pixel_to_world(xx, yy)
        return np.sin((ra - 150.0) * 2.0) + np.cos((dec - 2.0) * 1.7) + 10.0

    tile = sky(w_tan, (60, 60))
    proj, foot = reproject_to_grid(tile, w_tan, w_hpx, (90, 90),
                                   oversample=2, conserve_flux=False)
    want = sky(w_hpx, (90, 90))
    core = foot > 0.99
    assert core.sum() > 300
    resid = (proj / foot - want)[core]
    assert np.nanstd(resid) < 2e-3, np.nanstd(resid)
    assert abs(np.nanmean(resid)) < 2e-3
