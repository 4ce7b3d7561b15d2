"""star_stamps.gather_real against a synthetic directory in the M13 layout:
frames ccfb*cS_F.fits, DIAPL .coo star lists, psf*_S_F_img.fits matrices."""
import os

import numpy as np

from tpu_sgp.image import Header, write_fits
from tpu_sgp.psf.pipeline import find_stars, write_coo
from tpu_sgp.simulate import gaussian_psf, synthetic_star_field
from tpu_sgp.workloads import star_stamps


def _make_frame(d, stem, seed):
    img, psf, _ = synthetic_star_field(180, 180, n_stars=10, seed=seed,
                                       flux_range=(3e4, 8e4))
    write_fits(os.path.join(d, f'{stem}.fits'), img, Header({'GAIN': 1.2}))
    stars = find_stars(img)
    write_coo(os.path.join(d, f'{stem}.coo'), stars)
    return img, psf


def test_gather_real_m13_layout(tmp_path):
    d = str(tmp_path)
    # two frames following the reference naming: ccfbvc310082c1_5.fits with
    # PSF psfccfbvc310082_1_5_img.fits
    for stem, seed in [('ccfbvc310082c1_5', 21), ('ccfbvc310083c4_2', 22)]:
        img, psf = _make_frame(d, stem, seed)
        sub = stem[-3:]
        psf_name = ('psf' + stem + '.fits').replace(f'c{sub}',
                                                    f'_{sub}_img')
        write_fits(os.path.join(d, psf_name), gaussian_psf(31, 2.8))

    sset = star_stamps.gather_real(d, n_images=2, seed=42)
    b = sset.stamps.shape[0]
    assert b >= 4                      # several isolated stars qualify
    assert sset.psfs.shape == (b, 31, 31)
    assert sset.fluxes.min() > 0
    assert len(sset.orig_tables) == b

    # a frame with a missing PSF file is skipped, not fatal
    _make_frame(d, 'ccfbvc310084c1_1', 23)
    sset2 = star_stamps.gather_real(d, n_images=3, seed=42)
    assert sset2.stamps.shape[0] >= b
