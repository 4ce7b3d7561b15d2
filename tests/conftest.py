"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the multi-chip "fake backend") and
float64 enabled so solver parity against the NumPy oracle is exact. Real-TPU
benchmarking lives in bench.py, not here.
"""
import os

# Raise the soft stack limit BEFORE jax/XLA spawn any threads: LLVM's
# recursive codegen passes can blow the default 8 MB thread stack while
# compiling the larger fused solver bodies late in a long suite run
# (observed as a flaky SIGSEGV inside backend_compile at ~92% of the
# suite on a 1-core box). Threads created after this inherit the raised
# default.
try:
    import resource
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 64 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY else min(_want,
                                                                 _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
except (ImportError, ValueError, OSError):
    pass

os.environ['JAX_PLATFORMS'] = 'cpu'  # force CPU even when axon/TPU is preset
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# Belt and braces: some plugin may have imported jax before this conftest ran,
# in which case the env var alone is too late but the config flag still works
# (the backend only initializes on first use).
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = '/root/reference/restoration/simulated_test/data'


@pytest.fixture()
def rng():
    # function-scoped: every test draws from a fresh seeded generator, so
    # outcomes never depend on which other tests ran first (trajectory-
    # chaotic solver tests are sensitive to their exact problem instance)
    return np.random.default_rng(42)


def load_mat_fixture(name):
    """Load one of the SGP-dec ground-truth fixtures if the reference tree is
    mounted; otherwise skip the calling test."""
    path = os.path.join(REFERENCE_DATA, name)
    if not os.path.exists(path):
        pytest.skip(f'reference fixture {name} not available')
    from scipy.io import loadmat
    return loadmat(path)


def synthetic_stamp(rng, size=31, fwhm=2.8, flux=8000.0, bkg=120.0):
    """Deterministic synthetic star stamp + matching Gaussian PSF.

    Produces the same problem class as the M13 star-stamp workload: a single
    point source blurred by a normalized PSF on a flat sky with Poisson noise.
    """
    yy, xx = np.mgrid[0:size, 0:size]
    c = (size - 1) / 2
    sig = fwhm / 2.35482
    psf = np.exp(-(((xx - c) ** 2 + (yy - c) ** 2) / (2 * sig ** 2)))
    psf /= psf.sum()
    truth = np.zeros((size, size))
    truth[int(c) + 1, int(c) - 1] = flux
    # circular convolution (operator used by same-shape solves)
    tf = np.fft.fftn(np.fft.fftshift(psf))
    blurred = np.real(np.fft.ifftn(tf * np.fft.fftn(truth)))
    img = rng.poisson(np.maximum(blurred + bkg, 0)).astype(np.float64)
    return img, psf, bkg, truth
