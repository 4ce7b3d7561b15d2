"""u16-egress quantization error on REAL science data (VERDICT r4 next-8).

Cuts the bundled crowded M13 subframe
(/root/reference/results/CROWDED_SUBDIV_ORIGIMG.fits — the frame behind
the reference's subdivision benchmark,
/root/reference/restoration/application_sgp_subdivisions.py:25) into
31x31 stamps, restores the SAME requests through two RestorationSessions
that differ only in ``egress_dtype`` ('float32' vs 'uint16'), and prints
the per-pixel error histogram of the u16-quantized results against the
f32 path, alongside the analytic bound max(x)/131070 per stamp.

Usage: python examples/u16_egress_histogram.py
"""
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

FRAME = '/root/reference/results/CROWDED_SUBDIV_ORIGIMG.fits'
PSF = '/root/reference/psf/psfccfbrd210048_1_1_img.fits'


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/tpu_sgp_jax_cache')
    from tpu_sgp.image import getdata
    from tpu_sgp.parallel.session import RestorationSession

    img = np.asarray(getdata(FRAME), np.float32)
    psf = np.asarray(getdata(PSF), np.float32)
    psf = psf / psf.sum()
    s = psf.shape[0]
    ny, nx = img.shape[0] // s, img.shape[1] // s
    stamps = np.stack([img[y * s:(y + 1) * s, x * s:(x + 1) * s]
                       for y in range(ny) for x in range(nx)])
    bkgs = np.median(stamps, axis=(1, 2)).astype(np.float32)
    fluxes = (stamps.sum(axis=(1, 2)) - s * s * bkgs).astype(np.float32)
    keep = fluxes > 0  # projection needs positive flux
    stamps, bkgs, fluxes = stamps[keep], bkgs[keep], fluxes[keep]
    n = len(stamps)
    print(f'{n} stamps of {s}x{s} from the crowded M13 frame '
          f'(flux range {fluxes.min():.0f}..{fluxes.max():.0f} ADU)')

    out = {}
    for egress in ('float32', 'uint16'):
        sess = RestorationSession(psf, egress_dtype=egress)
        # 256 is a bench-warmed bucket size (requests pad host-side), so
        # reruns reuse the persistent compile cache
        sess.warmup(buckets=(256,))
        out[egress] = np.asarray(
            sess.restore(stamps, bkgs, fluxes=fluxes).x, np.float64)
        del sess

    x32, x16 = out['float32'], out['uint16']
    err = np.abs(x16 - x32)
    # The quantization bound is exact against the u16 program's OWN
    # pre-quantization x. Comparing against the separately-compiled f32
    # program adds a cross-program fusion-roundoff term (~1e-5 relative,
    # the documented jit-boundary effect — NOTES.md round 3), so the
    # observed error may exceed the f32-max-based bound by that margin.
    mx = x32.reshape(n, -1).max(axis=1)
    bound = mx / 131070.0
    margin = 1e-4 * mx  # generous cover for the cross-program term
    worst_lane = (err.reshape(n, -1).max(axis=1) / bound)
    flat = err.ravel()
    qs = [50, 90, 99, 99.9, 100]
    print('per-pixel |u16 - f32| (ADU):')
    for q in qs:
        print(f'  p{q:>5}: {np.percentile(flat, q):.4f}')
    print(f'analytic per-stamp bound max(x)/131070: median '
          f'{np.median(bound):.4f} ADU, max {bound.max():.4f} ADU')
    print(f'max over stamps of (observed max err / stamp bound): '
          f'{worst_lane.max():.3f}  (<= 1 up to cross-program roundoff)')
    assert (err.reshape(n, -1).max(axis=1) <= bound + margin).all()
    # scientific context: detector digitization is 1 ADU; photon noise on
    # these stamps is sqrt(gain*counts) >> the quantization error
    print(f'frame photon-noise scale ~sqrt(median counts) = '
          f'{np.sqrt(np.median(stamps)):.1f} ADU')
    print('OK')


if __name__ == '__main__':
    main()
