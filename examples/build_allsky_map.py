"""Survey tiles -> restored HEALPix map, end to end.

Demonstrates the image stack composing with the solver end to end: a
simulated sky field is observed as four dithered TAN pointings (each
blurred + Poisson-noisy with its own background error), per-pointing
backgrounds are estimated with the catalog stack (Background2D), all
four tiles are restored as ONE device batch
(`tpu_sgp.parallel.batch.restore_stamps`), and the restored tiles are
flux-conservingly coadded onto an all-sky-style HPX (HEALPix) grid —
the Planck/WMAP-style product path the reference would reach through
astropy + reproject (reference utils.py:392-397, sgp.py:944-958).

Prints the background estimates, per-tile solver iterations, the
source-free mosaic floor, and the aperture flux-conservation ratio
through the whole chain (tile truth -> observe -> restore -> HPX map).

Usage: python examples/build_allsky_map.py [tile_size]
"""
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(size=96):
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/tpu_sgp_jax_cache')
    import tpu_sgp
    from tpu_sgp.image import reproject_and_coadd
    from tpu_sgp.image.wcs import WCS
    from tpu_sgp.catalog import Background2D
    from tpu_sgp.parallel.batch import restore_stamps
    from tpu_sgp.simulate import degrade, gaussian_psf

    rng = np.random.default_rng(0)
    scale = 0.02                     # deg/px
    ra0, dec0 = 150.0, 35.0

    def tile_wcs(dra_px, ddec_px):
        return WCS({'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN',
                    'CRPIX1': size / 2 + dra_px,
                    'CRPIX2': size / 2 + ddec_px,
                    'CRVAL1': ra0, 'CRVAL2': dec0,
                    'CD1_1': -scale, 'CD2_2': scale})

    def sky(wcs, shape):
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(float)
        ra, dec = wcs.pixel_to_world(xx, yy)
        base = np.zeros(shape)
        for sra, sdec, amp in [(150.2, 35.2, 900.0), (149.8, 34.9, 600.0),
                               (150.1, 34.8, 400.0)]:
            r2 = ((ra - sra) * np.cos(dec0 * np.pi / 180)) ** 2 \
                + (dec - sdec) ** 2
            base = base + amp * np.exp(-r2 / (2 * (2.5 * scale) ** 2))
        return base

    # four overlapping pointings, quarter-tile dither: every source in
    # the central half-degree is interior to all four tiles
    q = size // 4
    offs = [(-q, -q), (q, -q), (-q, q), (q, q)]
    wcss = [tile_wcs(dx, dy) for dx, dy in offs]
    psf = np.asarray(gaussian_psf(size, fwhm=3.0))
    truths = [sky(w, (size, size)) for w in wcss]
    bkg = 20.0
    bkg_errs = [3.0, -2.0, 1.5, -0.5]   # per-tile background errors
    obs = [rng.poisson(np.maximum(degrade(t, psf) + bkg, 0.0)
                       ).astype(np.float64) + off
           for t, off in zip(truths, bkg_errs)]

    # restore all four tiles as ONE device batch
    # estimate each pointing's background with the catalog stack (this
    # absorbs the per-tile offsets), then restore with per-tile
    # backgrounds and flux targets — the real survey-pipeline flow
    stamps = np.stack(obs).astype(np.float32)
    est_bkg = np.array([Background2D(o, 16).background_median
                        for o in obs], np.float32)
    print(f'estimated backgrounds: {np.round(est_bkg, 2)} '
          f'(true {bkg} + per-tile errors {bkg_errs})')
    fluxes = (stamps - est_bkg[:, None, None]).sum(axis=(1, 2))
    res = restore_stamps(
        stamps, psf.astype(np.float32), est_bkg,
        tpu_sgp.SGPConfig(dtype='float32', stop_criterion=3,
                          tol_convergence=1e-6, max_iter=300),
        fluxes=fluxes.astype(np.float32))
    restored = np.asarray(res.x)
    print(f'restored 4 tiles of {size}x{size} as one batch; '
          f'iters={list(np.asarray(res.iters))}')

    # coadd onto an equator-anchored all-sky HPX grid; the patch row is
    # found through the projection itself (HPX's y is the equal-area
    # coordinate (3 pi / 8) sin(dec), NOT dec)
    out_shape = (2 * size, 2 * size)
    hdr_hpx = {'CTYPE1': 'RA---HPX', 'CTYPE2': 'DEC--HPX',
               'CRPIX1': 1.0, 'CRPIX2': 1.0, 'CRVAL1': ra0,
               'CRVAL2': 0.0, 'CDELT1': -scale, 'CDELT2': scale}
    x_c, y_c = WCS(hdr_hpx).world_to_pixel(ra0, dec0)
    hdr_hpx['CRPIX1'] = 1.0 + out_shape[1] / 2 - float(x_c)
    hdr_hpx['CRPIX2'] = 1.0 + out_shape[0] / 2 - float(y_c)
    w_hpx = WCS(hdr_hpx)
    mosaic, foot = reproject_and_coadd(list(restored), wcss, w_hpx,
                                       out_shape, oversample=2)

    # restored tiles are background-free (the solver separates sources
    # from bkg), so the mosaic should match the source truth; in the
    # source-free region it should sit at ~0 with no tile seams
    want_src = sky(w_hpx, out_shape)
    core = foot > 0.99
    smooth = core & (want_src < 1.0)
    resid = (mosaic - want_src)[smooth]
    print(f'coadd: {core.sum()} full-footprint px, source-free level '
          f'{np.nanmedian(resid):+.3f} +- {np.nanstd(resid):.3f} ADU '
          f'(per-tile bkg errors {bkg_errs} were absorbed upstream)')

    # flux conservation of the brightest source through the whole chain.
    # True flux is the TILE-grid aperture sum: an HPX pixel covers only
    # 8 / (3 pi) of a same-CDELT TAN pixel's solid angle, so summing
    # per-TAN-pixel values evaluated on the HPX grid would overstate
    # the truth by exactly 3 pi / 8 = 1.178 — the flux-conserving coadd
    # is what keeps the map sum equal to the true source flux.
    rr = np.hypot(*np.mgrid[0:out_shape[0], 0:out_shape[1]].astype(float)
                  [::-1] - np.array(w_hpx.world_to_pixel(150.2, 35.2)
                                    ).reshape(2, 1, 1))
    ap = rr < 12.0
    flux_map = np.nansum(np.where(ap & np.isfinite(mosaic), mosaic, 0.0))
    yy0, xx0 = np.mgrid[0:size, 0:size].astype(float)
    rr0 = np.hypot(*(np.stack([xx0, yy0])
                     - np.array(wcss[0].world_to_pixel(150.2, 35.2)
                                ).reshape(2, 1, 1)))
    flux_true = truths[0][rr0 < 12.0].sum()
    print(f'aperture flux map/true = {flux_map / flux_true:.4f}')
    return 0


if __name__ == '__main__':
    sz = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    sys.exit(main(sz))
