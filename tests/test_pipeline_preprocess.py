"""PSF-pipeline equivalents (fwhmm/sfind/cutfitsim) + frame culling."""
import os

import numpy as np

from tpu_sgp.image import Header, write_fits
from tpu_sgp.preprocess import cull_frames
from tpu_sgp.psf import read_coo
from tpu_sgp.psf.pipeline import (cut_subframes, estimate_sky_and_fwhm,
                                  find_stars, write_coo)
from tpu_sgp.simulate import synthetic_star_field


def test_estimate_sky_and_fwhm():
    img, psf, _ = synthetic_star_field(256, 256, n_stars=25, fwhm=3.0,
                                       seed=3, bkg=200.0,
                                       flux_range=(3e4, 9e4))
    sky, fwhm = estimate_sky_and_fwhm(img)
    assert abs(sky - 200.0) < 10.0
    assert 2.0 < fwhm < 4.5        # true stellar FWHM ~3 px


def test_find_stars_and_coo_roundtrip(tmp_path):
    img, _, truth = synthetic_star_field(200, 200, n_stars=20, seed=8,
                                         flux_range=(3e4, 9e4))
    stars = find_stars(img)
    assert 12 <= len(stars) <= 25
    path = str(tmp_path / 'frame.coo')
    write_coo(path, stars)
    back = read_coo(path)
    assert len(back) == len(stars)
    np.testing.assert_allclose(back['x'].to_numpy(), stars['x'], atol=1e-3)
    np.testing.assert_allclose(back['approx_flux'].to_numpy(),
                               stars['approx_flux'], rtol=1e-4)


def test_cut_subframes_grid():
    img = np.zeros((500, 200))
    subs = cut_subframes(img, nx=2, ny=5, margin=20)
    assert len(subs) == 10
    # interior subframes carry the margin on every side
    interior = subs[2][0]
    assert interior.data.shape[0] >= 100


def test_cull_frames(tmp_path, rng):
    d = str(tmp_path)
    # 4 biases: one with 3x the noise
    for i, scale in enumerate([1.0, 1.1, 0.9, 3.0]):
        write_fits(os.path.join(d, f'bias_{i}.fits'),
                   rng.normal(100, 5 * scale, (32, 32)),
                   Header({'EXPTIME': 0.0}))
    # 2 flats: one nearly saturated
    write_fits(os.path.join(d, 'flat_good.fits'),
               rng.normal(30000, 100, (32, 32)),
               Header({'EXPTIME': 2.0, 'IMAGETYP': 'flat'}))
    write_fits(os.path.join(d, 'flat_bad.fits'),
               rng.normal(60000, 100, (32, 32)),
               Header({'EXPTIME': 2.0, 'IMAGETYP': 'flat'}))
    rep = cull_frames(d)
    assert len(rep.biases) == 4
    assert [os.path.basename(p) for p in rep.bad_biases] == ['bias_3.fits']
    assert [os.path.basename(p) for p in rep.bad_flats] == ['flat_bad.fits']
    assert os.path.exists(os.path.join(d, 'BadFrames', 'bias_3.fits'))
    assert os.path.exists(os.path.join(d, 'BadFrames', 'flat_bad.fits'))
    assert not os.path.exists(os.path.join(d, 'flat_bad.fits'))


def test_cull_frames_filter_fix_and_no_move(tmp_path, rng):
    d = str(tmp_path)
    write_fits(os.path.join(d, 'sci_1.fits'),
               rng.normal(500, 10, (16, 16)), Header({'EXPTIME': 30.0}))
    rep = cull_frames(d, move=False, default_filter='I')
    assert rep.filter_fixed == {os.path.join(d, 'sci_1.fits'): 'I'}
    assert os.path.exists(os.path.join(d, 'sci_1.fits'))  # nothing moved


def test_cull_frames_skips_blank_exptime_card(tmp_path, rng):
    """A present-but-valueless EXPTIME card parses to None; the frame must
    be skipped like any unreadable header instead of aborting the whole
    cull run with a TypeError (regression)."""
    d = str(tmp_path)
    write_fits(os.path.join(d, 'bias_0.fits'),
               rng.normal(100, 5, (16, 16)), Header({'EXPTIME': 0.0}))
    bad = os.path.join(d, 'weird.fits')
    write_fits(bad, rng.normal(100, 5, (16, 16)))
    raw = open(bad, 'rb').read()
    end_at = raw.index(b'END     ')
    card = 'EXPTIME ='.ljust(80).encode()
    open(bad, 'wb').write(raw[:end_at] + card + raw[end_at:end_at + 80]
                          + raw[end_at + 2 * 80:])
    rep = cull_frames(d, move=False)
    assert [os.path.basename(p) for p in rep.biases] == ['bias_0.fits']


def test_cull_frames_filter_fix_preserves_comment_cards(tmp_path, rng):
    """The in-place FILTER fix must not strip COMMENT/HISTORY cards or
    re-encode the data (it now splices one header card)."""
    d = str(tmp_path)
    p = os.path.join(d, 'sci_1.fits')
    write_fits(p, rng.normal(500, 10, (16, 16)).astype(np.float32),
               Header({'EXPTIME': 30.0}))
    raw = open(p, 'rb').read()
    end_at = raw.index(b'END     ')
    card = 'HISTORY archival provenance'.ljust(80).encode()
    open(p, 'wb').write(raw[:end_at] + card + raw[end_at:end_at + 80]
                        + raw[end_at + 2 * 80:])
    rep = cull_frames(d, move=False, default_filter='V')
    assert rep.filter_fixed == {p: 'V'}
    after = open(p, 'rb').read()
    assert b'HISTORY archival provenance' in after
    from tpu_sgp.image import getheader
    hdr = getheader(p)
    assert hdr['FILTER'] == 'V' and hdr['BITPIX'] == -32  # f32 untouched


def test_write_coo_pads_short_headers(tmp_path):
    """read_coo skips exactly 3 rows; a 1-line custom header must be
    padded, not silently swallow the first two stars."""
    from tpu_sgp.psf import read_coo
    from tpu_sgp.psf.pipeline import write_coo
    stars = np.zeros(2, dtype=[('x', 'f8'), ('y', 'f8'),
                               ('approx_flux', 'f8'),
                               ('local_bkg_level', 'f8'),
                               ('num_saturated_pixels_in_aperture', 'i8')])
    stars['x'] = [1.5, 2.5]
    p = str(tmp_path / 't.coo')
    write_coo(p, stars, header_lines=['# one line only'])
    assert len(read_coo(p)) == 2


def test_preprocess_main_cli(tmp_path, rng, capsys):
    """python -m tpu_sgp.preprocess <dir>: argparse facade over
    cull_frames (Automation.cl equivalent), prints the report."""
    from tpu_sgp.preprocess import main

    d = str(tmp_path)
    for i, scale in enumerate([1.0, 1.1, 3.5]):
        write_fits(os.path.join(d, f'bias_{i}.fits'),
                   rng.normal(100, 5 * scale, (16, 16)),
                   Header({'EXPTIME': 0.0}))
    write_fits(os.path.join(d, 'sci.fits'),
               rng.normal(500, 10, (16, 16)),
               Header({'EXPTIME': 30.0}))
    rep = main([d, '--no-move', '--default-filter', 'V'])
    out = capsys.readouterr().out
    assert 'biases: 3 (rejected 1)' in out
    assert [os.path.basename(p) for p in rep.bad_biases] == ['bias_2.fits']
    # --no-move: nothing relocated
    assert os.path.exists(os.path.join(d, 'bias_2.fits'))
    assert rep.filter_fixed  # sci frame had no FILTER card
