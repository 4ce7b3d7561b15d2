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
