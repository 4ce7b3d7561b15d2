"""fpack-convention tiled FITS compression: RICE_1 codec (native C++ and
pure-Python agree, anchored to hand-derived bitstreams), GZIP_1/GZIP_2,
quantized floats, and read_fits integration.

The reference gets compressed-file reading for free through astropy/cfitsio
(/root/reference/restoration/sgp.py:944-958); these tests pin the native
equivalent.
"""
import numpy as np
import pytest

from tpu_sgp.image import Header, read_fits, write_fits_compressed
from tpu_sgp.image import tile_compression as tc


def test_rice_handcrafted_bitstreams():
    """Absolute anchors derived by hand from the convention: a constant
    block emits only zero fs-codes; a tiny two-pixel block emits the exact
    Golomb-Rice bits (initial value BE, fs+1 in FSBITS bits, unary top +
    fs low bits per pixel, MSB-first)."""
    # constant int16: header 0x03E8, three blocks (32+32+6) of fs-code 0
    const = np.full(70, 1000, np.int16)
    enc = tc.rice_encode(const, blocksize=32)
    assert enc == b'\x03\xe8\x00\x00', enc.hex()
    dec = tc.rice_decode(enc, 70, bytepix=2, blocksize=32)
    np.testing.assert_array_equal(dec.view(np.int16), const)

    # [0, 1] int16: fs=0 -> '0001'; zz(0)=0 -> '1'; zz(+1)=2 -> '001'
    # bits 0001 1 001 = 0x19 after the 2-byte initial value 0
    enc2 = tc.rice_encode(np.array([0, 1], np.int16), blocksize=32)
    assert enc2 == b'\x00\x00\x19', enc2.hex()
    dec2 = tc.rice_decode(enc2, 2, bytepix=2, blocksize=32)
    np.testing.assert_array_equal(dec2.view(np.int16), [0, 1])


@pytest.mark.parametrize('dtype,bytepix', [(np.int16, 2), (np.int32, 4),
                                           (np.uint8, 1)])
def test_rice_native_and_python_agree(rng, dtype, bytepix):
    """The C++ codec and the bit-serial Python reference produce identical
    bytes and identical decodes across smooth, noisy, constant and
    direct-copy (high-entropy) regimes, including non-multiple-of-block
    lengths and extreme values."""
    if not tc.rice_native_available():
        pytest.skip('no native toolchain')
    info = np.iinfo(dtype)
    cases = [
        np.cumsum(rng.integers(-3, 4, 1000)).astype(dtype),      # smooth
        rng.integers(info.min, int(info.max) + 1, 777).astype(dtype),
        np.full(64, 7, dtype),                                   # constant
        np.array([info.min, info.max, info.min, info.max] * 20, dtype),
        rng.integers(info.min, int(info.max) + 1, 31).astype(dtype),
    ]
    for arr in cases:
        enc_native = tc.rice_encode(arr, blocksize=32)
        enc_py = tc._rice_encode_py(arr, blocksize=32)
        assert enc_native == enc_py
        dec_native = tc.rice_decode(enc_native, arr.size, bytepix, 32)
        dec_py = tc._rice_decode_py(enc_native, arr.size, bytepix, 32)
        np.testing.assert_array_equal(dec_native, dec_py)
        np.testing.assert_array_equal(dec_native.view(dtype), arr)


def test_rice_rejects_corrupt_stream():
    enc = tc.rice_encode(np.arange(100, dtype=np.int16))
    with pytest.raises(ValueError):
        tc.rice_decode(enc[:3], 100, bytepix=2)
    with pytest.raises(ValueError):
        tc.rice_decode(b'', 10, bytepix=2)


@pytest.mark.parametrize('comp', ['RICE_1', 'GZIP_1', 'GZIP_2',
                                  'NOCOMPRESS'])
def test_compressed_file_roundtrip_int(tmp_path, rng, comp):
    """Integer images round-trip losslessly through the compressed layout
    for every codec, including edge tiles (tile_rows not dividing the
    height) and the uint16 BZERO convention."""
    img16 = (rng.normal(1000, 50, (37, 23))).astype(np.int16)
    p = str(tmp_path / 'c16.fits')
    hdr = Header({'GAIN': 1.22, 'OBJECT': 'M13'})
    write_fits_compressed(p, img16, hdr, compression=comp, tile_rows=5)
    back, h = read_fits(p)
    np.testing.assert_array_equal(back, img16)
    assert h['GAIN'] == 1.22 and h['OBJECT'] == 'M13'
    assert int(h['BITPIX']) == 16

    ccd = rng.integers(0, 65536, (16, 31)).astype(np.uint16)
    p2 = str(tmp_path / 'ccd.fits')
    write_fits_compressed(p2, ccd, compression=comp, tile_rows=3)
    back2, h2 = read_fits(p2)
    assert back2.dtype == np.uint16
    np.testing.assert_array_equal(back2, ccd)


def test_compressed_file_roundtrip_float_lossless(tmp_path, rng):
    img = rng.normal(100.0, 17.0, (21, 34)).astype(np.float32)
    for comp in ('GZIP_1', 'GZIP_2'):
        p = str(tmp_path / f'f_{comp}.fits')
        write_fits_compressed(p, img, compression=comp, tile_rows=4)
        back, h = read_fits(p)
        np.testing.assert_array_equal(back, img)
        assert int(h['BITPIX']) == -32


def test_compressed_float_rice_quantized(tmp_path, rng):
    """RICE on floats is lossy linear quantization (NO_DITHER): per-tile
    ZSCALE/ZZERO columns, error bounded by quantize_scale/2."""
    img = rng.normal(500.0, 60.0, (40, 40)).astype(np.float32)
    p = str(tmp_path / 'q.fits')
    write_fits_compressed(p, img, compression='RICE_1', tile_rows=7,
                          quantize_scale=0.05)
    back, h = read_fits(p)
    assert np.abs(back - img).max() <= 0.025 + 1e-6
    # lossless float RICE is impossible: the writer says so
    with pytest.raises(ValueError, match='quantize_scale'):
        write_fits_compressed(str(tmp_path / 'x.fits'), img,
                              compression='RICE_1')


def test_compressed_reader_rejects_dither_and_unknown(tmp_path, rng):
    img = rng.normal(0, 1, (8, 8)).astype(np.float32)
    p = str(tmp_path / 'd.fits')
    write_fits_compressed(p, img, compression='RICE_1', quantize_scale=0.1)
    raw = open(p, 'rb').read()

    def patch_card(buf, key, value):
        # replace the WHOLE 80-byte card (a naive substring replace would
        # shift the 2880-byte header alignment)
        at = buf.index(key.ljust(8).encode())
        from tpu_sgp.image.fitsio import _format_card
        return buf[:at] + _format_card(key, value) + buf[at + 80:]

    open(p, 'wb').write(patch_card(raw, 'ZQUANTIZ',
                                   'SUBTRACTIVE_DITHER_1'))
    with pytest.raises(ValueError, match='dither'):
        read_fits(p)
    open(p, 'wb').write(patch_card(raw, 'ZCMPTYPE', 'PLIO_1'))
    with pytest.raises(ValueError, match='ZCMPTYPE'):
        read_fits(p)


def test_compressed_hdu_explicit_index_and_wcs_carry(tmp_path, rng):
    """hdu=1 selects the compressed extension explicitly; WCS cards written
    into the tile table reconstruct onto the image header."""
    img = (rng.normal(800, 30, (12, 18))).astype(np.int32)
    hdr = Header({'CRPIX1': 5.0, 'CRPIX2': 6.0, 'CRVAL1': 150.0,
                  'CRVAL2': 2.25, 'CD1_1': -2.8e-4, 'CD2_2': 2.8e-4,
                  'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN'})
    p = str(tmp_path / 'wcs.fits')
    write_fits_compressed(p, img, hdr, tile_rows=12)
    back, h = read_fits(p, hdu=1)
    np.testing.assert_array_equal(back, img)
    from tpu_sgp.image import WCS
    w = WCS(h)
    ra, dec = w.pixel_to_world(5.0 - 1.0, 6.0 - 1.0)
    np.testing.assert_allclose((ra, dec), (150.0, 2.25), atol=1e-12)
