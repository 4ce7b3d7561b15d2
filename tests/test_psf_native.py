"""Native C++ PSF evaluator vs the Python/NumPy implementation."""
import os
import time

import numpy as np
import pytest

from tpu_sgp.psf import DiaplPSFModel
from tpu_sgp.psf import native

REF_TXT = '/root/reference/psf/psfccfbrd210048_1_1.bin.txt'

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native toolchain unavailable')


def _model():
    if not os.path.exists(REF_TXT):
        pytest.skip('reference PSF files not mounted')
    return DiaplPSFModel.from_txt(REF_TXT)


def test_native_matrix_matches_python():
    m = _model()
    want = m.matrix(31)
    got = native.render_matrix(m, 31)
    np.testing.assert_allclose(got, want, rtol=1e-14)


def test_native_local_coeffs_match_python():
    m = _model()
    for pos in [(m.x_orig, m.y_orig), (10.0, 350.0), (400.0, 12.5)]:
        np.testing.assert_allclose(native.local_coeffs(m, *pos),
                                   m.local_coeffs(*pos), rtol=1e-14)


def test_native_render_grid_spatial_variation():
    m = _model()
    xs = np.array([10.0, 225.0, 400.0])
    ys = np.array([10.0, 225.0, 400.0])
    mats = native.render_grid(m, xs, ys, 31, normalize=True)
    assert mats.shape == (3, 31, 31)
    np.testing.assert_allclose(mats.sum(axis=(1, 2)), 1.0, rtol=1e-12)
    # PSF varies across the frame
    assert not np.allclose(mats[0], mats[2])
    # the matrix at the fit origin equals the constant-term render
    at_origin = native.render_grid(m, np.array([m.x_orig]),
                                   np.array([m.y_orig]), 31,
                                   normalize=False)[0]
    np.testing.assert_allclose(at_origin, m.matrix(31), rtol=1e-12)


def test_native_throughput():
    """Bulk rendering must beat the per-matrix Python loop comfortably.

    Timed with thread CPU time, not wall clock: under pytest-xdist the
    workers share the host cores and wall timing is biased AGAINST the
    long native call (a 33 ms bulk render absorbs several scheduler
    preemptions; a 0.2 ms Python call fits inside one quantum), which
    made this flake under load. Both sides run synchronously on the
    calling thread, so thread_time is exact and preemption-immune."""
    m = _model()
    n = 200
    xs = np.linspace(0, 450, n)
    ys = np.linspace(0, 450, n)
    native_cpu = min(_timed(lambda: native.render_grid(m, xs, ys, 31))
                     for _ in range(3))
    python_cpu = min(_timed(lambda: m.matrix(31)) for _ in range(5)) * n
    assert native_cpu < python_cpu


def _timed(fn):
    t0 = time.thread_time()
    fn()
    return time.thread_time() - t0


def test_native_even_size_matches_python():
    """C++ grid rendering equals Python for even sizes (regression: the
    native loop rendered (2*(size/2)+1)^2 samples into a size^2 buffer)."""
    from tpu_sgp.psf import native as pn
    if not pn.available():
        pytest.skip('native toolchain unavailable')
    m = DiaplPSFModel.from_txt(REF_TXT)
    for size in (30, 32, 16):
        g = pn.render_grid(m, np.array([m.x_orig]), np.array([m.y_orig]),
                           size=size, normalize=False)
        assert g.shape == (1, size, size)
        want = m.matrix(size, m.local_coeffs(m.x_orig, m.y_orig))
        np.testing.assert_allclose(g[0], want, rtol=1e-12, atol=1e-14)
