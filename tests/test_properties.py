"""Property-based tests (Hypothesis): invariants that must hold for ALL
inputs, complementing the seeded differential suites.

Array shapes are FIXED per test (Hypothesis varies values, not shapes) so
jitted/traced code paths compile once per test, not per example.
"""
import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import jax.numpy as jnp

N = 64
SLOW = settings(deadline=None, max_examples=25,
                suppress_health_check=[HealthCheck.too_slow])
FAST = settings(deadline=None, max_examples=200)


def _vec(lo, hi):
    return st.lists(st.floats(lo, hi, allow_nan=False, allow_infinity=False),
                    min_size=N, max_size=N).map(np.array)


# ------------------------------------------------------------- projection

@SLOW
@given(c=_vec(-1e3, 1e3), dia=_vec(1e-3, 1e3),
       bfrac=st.floats(0.01, 0.95), sat=st.one_of(
           st.none(), st.floats(10.0, 1e4)))
def test_bisect_projection_invariants(c, dia, bfrac, sat):
    """For ANY (c, dia, b, sat): x >= 0, x <= cap, sum(x) = b to the
    bisection resolution, and x matches the reference-semantics NumPy
    oracle projection (flux_conserve_proj.py:7-144)."""
    from oracle_numpy import project_df_np
    from tpu_sgp.projection.flux_projection import project_df_bisect

    scaling = 1.0
    eps = np.finfo(float).eps
    cap = np.inf if sat is None else sat / scaling - eps
    capacity = N * cap if sat is not None else np.inf
    # a feasible target: strictly inside (0, total capacity)
    b = float(bfrac * min(capacity, 1e5))
    if not b > 0:
        return

    x = np.asarray(project_df_bisect(b, jnp.asarray(c), jnp.asarray(dia),
                                     scaling, sat_level=sat,
                                     has_sat=sat is not None))
    assert (x >= 0).all()
    if sat is not None:
        assert (x <= cap * (1 + 1e-12)).all()
    # feasible iff capacity >= b; otherwise the projection saturates
    if capacity >= b * (1 + 1e-9):
        assert abs(x.sum() - b) <= 1e-8 * b + 1e-12
    xo = project_df_np(b, c, dia, scaling, sat=sat)
    np.testing.assert_allclose(x, xo, rtol=1e-6, atol=1e-8 * max(b, 1.0))


@SLOW
@given(c=_vec(-1e3, 1e3), dia=_vec(1e-3, 1e3), bfrac=st.floats(0.01, 0.95))
def test_sort_projection_equals_bisect(c, dia, bfrac):
    """The exact breakpoint-sweep projection and the fixed-trip bisection
    agree everywhere on feasible problems (they solve the same dual)."""
    from tpu_sgp.projection.flux_projection import (project_df_bisect,
                                                    project_df_sort)
    b = float(bfrac * 1e4)
    xs = np.asarray(project_df_sort(b, jnp.asarray(c), jnp.asarray(dia),
                                    1.0))
    xb = np.asarray(project_df_bisect(b, jnp.asarray(c), jnp.asarray(dia),
                                      1.0))
    np.testing.assert_allclose(xs, xb, rtol=1e-6, atol=1e-8 * b)


# ------------------------------------------------------------- FFT sizing

@FAST
@given(n=st.integers(1, 20000))
def test_good_fft_size_minimal_even_7smooth(n):
    from tpu_sgp.ops.psf_operator import _good_fft_size
    m = _good_fft_size(n)
    assert m >= n and m % 2 == 0
    k = m
    for p in (2, 3, 5, 7):
        while k % p == 0:
            k //= p
    assert k == 1, f'{m} is not 7-smooth'
    # minimality: no smaller even 7-smooth integer >= n
    for cand in range(n + (n & 1), m, 2):
        k = cand
        for p in (2, 3, 5, 7):
            while k % p == 0:
                k //= p
        assert k != 1, f'{cand} < {m} is even 7-smooth and >= {n}'


# ----------------------------------------------------------------- tiling

@FAST
@given(h=st.integers(8, 400), w=st.integers(8, 400),
       tile=st.integers(4, 128), ov=st.floats(0.0, 0.8))
def test_slice_bboxes_cover_every_pixel(h, w, tile, ov):
    """Tiling must cover the full image with in-bounds, positive-area
    tiles for ANY (shape, tile size, fractional overlap)."""
    from tpu_sgp.image.tiling import calculate_slice_bboxes
    boxes = calculate_slice_bboxes(h, w, tile, tile, ov, ov)
    covered = np.zeros((h, w), bool)
    for (x1, y1, x2, y2) in boxes:
        assert 0 <= x1 < x2 <= w and 0 <= y1 < y2 <= h
        covered[y1:y2, x1:x2] = True
    assert covered.all()


# ------------------------------------------------------------- divergence

@SLOW
@given(den=_vec(1e-3, 1e3), gn=_vec(1e-3, 1e3),
       beta=st.floats(-0.5, 2.5, allow_nan=False))
def test_beta_divergence_nonnegative_and_zero_at_equality(den, gn, beta):
    """beta-divergences are Bregman divergences: >= 0 for any beta, and
    exactly 0 at den == gn."""
    from tpu_sgp.ops.divergence import beta_div
    d = float(beta_div(jnp.asarray(den), jnp.asarray(gn), beta))
    assert np.isfinite(d)
    assert d >= -1e-9 * max(1.0, abs(d))
    z = float(beta_div(jnp.asarray(gn), jnp.asarray(gn), beta))
    assert abs(z) <= 1e-9


@SLOW
@given(den=_vec(1e-2, 1e2), gn=_vec(1e-2, 1e2),
       e=st.floats(1e-9, 1e-6))
def test_beta_divergence_continuous_through_special_points(den, gn, e):
    """The series-switched kernel is continuous through the KL (beta=1)
    and Itakura-Saito (beta=0) singular points of the naive formula."""
    from tpu_sgp.ops.divergence import beta_div
    den, gn = jnp.asarray(den), jnp.asarray(gn)
    for b0 in (0.0, 1.0):
        mid = float(beta_div(den, gn, b0))
        lo = float(beta_div(den, gn, b0 - e))
        hi = float(beta_div(den, gn, b0 + e))
        scale = max(abs(mid), 1.0)
        assert abs(lo - mid) <= 1e-4 * scale
        assert abs(hi - mid) <= 1e-4 * scale


# ---------------------------------------------------------------- cutouts

@FAST
@given(h=st.integers(8, 80), w=st.integers(8, 80),
       cy=st.floats(0, 79), cx=st.floats(0, 79),
       size=st.integers(1, 41))
def test_cutout_positions_round_trip(h, w, cy, cx, size):
    """to_original_position(to_cutout_position(p)) == p for any in-bounds
    cutout geometry (trim mode clips to the image)."""
    from tpu_sgp.image import Cutout2D
    cy, cx = min(cy, h - 1.0), min(cx, w - 1.0)
    data = np.arange(h * w, dtype=float).reshape(h, w)
    try:
        cut = Cutout2D(data, (cx, cy), size=size, mode='trim')
    except ValueError:
        return  # fully outside: rejected loudly, not silently empty
    p = (cx, cy)
    q = cut.to_cutout_position(p)
    back = cut.to_original_position(q)
    assert back[0] == pytest.approx(cx) and back[1] == pytest.approx(cy)
    ox, oy = cut.origin_original          # astropy order: (x, y)
    assert np.array_equal(cut.data,
                          data[oy:oy + cut.data.shape[0],
                               ox:ox + cut.data.shape[1]])


# ------------------------------------------------------------------- FITS

_header_value = st.one_of(
    st.booleans(),
    st.integers(-10**15, 10**15),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(st.characters(min_codepoint=32, max_codepoint=126),
            max_size=40),
)


_RESERVED = ({'SIMPLE', 'BITPIX', 'NAXIS', 'END', 'BSCALE', 'BZERO',
              'EXTEND', 'COMMENT', 'HISTORY'}
             | {f'NAXIS{i}' for i in range(1, 10)})


@FAST
@given(vals=st.dictionaries(
    st.text(st.sampled_from('ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_'),
            min_size=1, max_size=8).filter(lambda k: k not in _RESERVED),
    _header_value, min_size=1, max_size=12))
def test_fits_header_values_round_trip_exactly(vals, tmp_path_factory):
    """write_fits -> getheader preserves every bool/int/float/short-string
    header value EXACTLY — floats included (shortest-round-trip repr, not
    a truncating %G)."""
    from tpu_sgp.image import Header, getheader, write_fits
    path = str(tmp_path_factory.mktemp('fits') / 'h.fits')
    write_fits(path, np.zeros((2, 2)), Header(vals))
    back = getheader(path)
    for k, v in vals.items():
        got = back[k.upper()]
        if isinstance(v, str):
            # FITS pads string values to >= 8 chars and strips trailing
            # blanks on read — the one standard-mandated lossy case
            assert got == v.rstrip() or got == v.rstrip().ljust(0)
        else:
            assert got == v and type(got) is type(v), (k, v, got)


@SLOW
@given(dtype=st.sampled_from(['uint8', 'int16', 'int32', 'int64',
                              'float32', 'float64']),
       seed=st.integers(0, 2**31 - 1))
def test_fits_data_round_trips_every_supported_dtype(dtype, seed,
                                                     tmp_path_factory):
    from tpu_sgp.image import read_fits, write_fits
    rng = np.random.default_rng(seed)
    if dtype.startswith('float'):
        data = rng.normal(0, 1e6, (5, 7)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        data = rng.integers(info.min, info.max, (5, 7),
                            dtype=dtype, endpoint=True)
    path = str(tmp_path_factory.mktemp('fits') / 'd.fits')
    write_fits(path, data)
    back, _ = read_fits(path)
    assert back.dtype == data.dtype
    np.testing.assert_array_equal(back, data)


# -------------------------------------------------------------------- WCS

@FAST
@given(crval1=st.floats(0.5, 359.5), crval2=st.floats(-75.0, 75.0),
       crpix1=st.floats(-100, 100), crpix2=st.floats(-100, 100),
       scale=st.floats(1e-5, 1e-3), rot=st.floats(0, 2 * np.pi),
       x=st.floats(0, 400), y=st.floats(0, 400))
def test_wcs_tan_round_trip(crval1, crval2, crpix1, crpix2, scale, rot,
                            x, y):
    """world_to_pixel(pixel_to_world(p)) == p for any well-conditioned TAN
    WCS (rotated CD matrix, |dec| < 75 deg, arcsec-to-arcmin scales)."""
    from tpu_sgp.image import WCS
    cd = scale * np.array([[np.cos(rot), -np.sin(rot)],
                           [np.sin(rot), np.cos(rot)]])
    w = WCS({'CRVAL1': crval1, 'CRVAL2': crval2,
             'CRPIX1': crpix1, 'CRPIX2': crpix2,
             'CD1_1': cd[0, 0], 'CD1_2': cd[0, 1],
             'CD2_1': cd[1, 0], 'CD2_2': cd[1, 1]})
    ra, dec = w.pixel_to_world(x, y)
    xb, yb = w.world_to_pixel(ra, dec)
    assert float(xb) == pytest.approx(x, abs=1e-6)
    assert float(yb) == pytest.approx(y, abs=1e-6)


# ----------------------------------------------------------------- solver

@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(seed=st.integers(0, 2**31 - 1), fwhm=st.floats(1.8, 4.0),
       flux_scale=st.floats(0.3, 1.5), bkg=st.floats(5.0, 500.0),
       sat=st.one_of(st.none(), st.just(65000.0)))
def test_solver_conserves_flux_and_nonnegativity(seed, fwhm, flux_scale,
                                                 bkg, sat):
    """End-to-end invariant for ANY stamp: under the flux-conserving
    projection the restored image is nonnegative, respects the saturation
    ceiling, and sums exactly to the requested flux (the projection's
    defining constraints survive the full solver loop)."""
    from conftest import synthetic_stamp
    from tpu_sgp import sgp

    img, psf, b, _ = synthetic_stamp(np.random.default_rng(seed), size=24,
                                     fwhm=fwhm, flux=8000.0, bkg=bkg)
    flux = float(np.sum(img - b)) * flux_scale
    if not flux > 0:
        return
    x, iters, *_ = sgp(img, psf, b, init_recon=2, proj_type=1,
                       stop_criterion=1, MAXIT=15, flux=flux,
                       ccd_sat_level=sat)
    x = np.asarray(x)
    assert (x >= 0).all()
    if sat is not None:
        assert x.max() <= sat
    assert np.sum(x) == pytest.approx(flux, rel=1e-8)


# ------------------------------------------------------------- checkpoint

# max_examples is deliberately small: every distinct cut point k compiles
# a fresh jit program (max_iter is jit-static), ~15 s/example on CPU
@settings(deadline=None, max_examples=4,
          suppress_health_check=[HealthCheck.too_slow])
@given(k=st.integers(1, 19), seed=st.integers(0, 2**31 - 1),
       beta_mode=st.booleans())
def test_resume_at_any_cut_point_matches_uninterrupted(k, seed, beta_mode,
                                                       tmp_path_factory):
    """Checkpoint/resume is exact at EVERY cut point, not just the midway
    one the directed test uses — buffer seams (discr/err series), the
    beta-adaptation carry, and the BB memory all survive a save/load at an
    arbitrary iteration."""
    from conftest import synthetic_stamp
    from tpu_sgp import SGPConfig
    from tpu_sgp.solvers.checkpoint import load_state, save_state
    from tpu_sgp.solvers.sgp import resume_from_state, solve_with_state

    img, psf, bkg, _ = synthetic_stamp(np.random.default_rng(seed), size=24)
    base = dict(stop_criterion=1, init_recon=2, proj_type=1, has_flux=False,
                has_sat_level=False, dtype='float64',
                divergence='beta' if beta_mode else 'kl',
                adapt_beta=beta_mode, schedule_lr=beta_mode)

    def args(cfg):
        z = jnp.zeros(img.shape, cfg.jnp_dtype)
        return (jnp.asarray(img, cfg.jnp_dtype),
                jnp.asarray(psf, cfg.jnp_dtype),
                jnp.full(img.shape, bkg, cfg.jnp_dtype), z, 0.0, z, 1.01,
                1e-3, 0.0)

    full_cfg = SGPConfig(max_iter=20, **base)
    full, _ = solve_with_state(*args(full_cfg), full_cfg)
    part_cfg = SGPConfig(max_iter=k, **base)
    _, state = solve_with_state(*args(part_cfg), part_cfg)
    path = str(tmp_path_factory.mktemp('ck') / 'ckpt')
    save_state(path, state)
    resumed, _ = resume_from_state(*args(full_cfg), load_state(path),
                                   full_cfg)
    assert int(resumed.iters) == int(full.iters) == 20
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(resumed.discr)[:k + 1],
                               np.asarray(full.discr)[:k + 1], rtol=1e-12)
    if beta_mode:
        assert float(resumed.beta) == pytest.approx(float(full.beta),
                                                    rel=1e-13)
