"""tpu_sgp — TPU-native SGP / beta-SGP astronomical image restoration.

A ground-up JAX/XLA re-design of the capabilities of the reference
Scaled-Gradient-Projection deconvolution codebase (Yash-10/beta-sgp,
mounted read-only at /root/reference): one functional solver core
(jit + vmap + shard_map), MXU-mapped PSF operators, a vectorizable
flux-conserving projection, and the surrounding framework — PSF modeling,
source catalogs, tiling/mosaicking, metrics, workloads and CLI.
"""
import os as _os


def _enable_persistent_compile_cache():
    """Point JAX at an on-disk compilation cache unless the user already
    configured one (or opted out with TPU_SGP_NO_COMPILE_CACHE=1).

    Workload walls are dominated by one-off XLA compiles of the large
    batched solves (minutes for a 2560-solve candidate grid); the persistent
    cache makes every rerun warm. JAX only caches compiles above its
    min-compile-time threshold, so small/interactive traces are unaffected.
    """
    if _os.environ.get('TPU_SGP_NO_COMPILE_CACHE'):
        return
    import jax
    if (_os.environ.get('JAX_COMPILATION_CACHE_DIR')
            or jax.config.jax_compilation_cache_dir):
        return
    # Only auto-enable for an explicitly configured non-CPU platform. On
    # CPU the cache stores AOT executables tuned to the compiling host's
    # CPU features; loading them on a different host risks SIGILL (XLA
    # E-logs exactly that warning), and CPU compiles are cheap anyway.
    platforms = (jax.config.jax_platforms
                 or _os.environ.get('JAX_PLATFORMS') or '')
    if not platforms or platforms.strip().lower().startswith('cpu'):
        return
    cache = _os.environ.get(
        'TPU_SGP_CACHE_DIR',
        _os.path.join(_os.path.expanduser('~'), '.cache', 'tpu_sgp', 'jax'))
    try:
        _os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        # persist small programs too: eager ops at workload batch shapes
        # compile in ~1s each (right at the default 1.0s threshold) and a
        # run triggers a dozen of them — caching these matters as much as
        # caching the big solves
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.1)
    except OSError:
        pass  # read-only home etc. — run without a persistent cache


def _mirror_platforms_env():
    """Mirror JAX_PLATFORMS into the jax_platforms config flag.

    Some PJRT plugin register hooks (the tunneled axon one here) overwrite
    the jax_platforms config with their own list (e.g. 'axon,cpu') and
    consult only that flag — so `JAX_PLATFORMS=cpu python ...` still waits
    on the plugin's device client (minutes, during a backend outage).
    Stock JAX semantics are that the env var IS the platform list, in the
    env's own priority order; restore them by writing the env value over
    the hook's override whenever the hook changed the DEFAULT (first)
    platform the user asked for — env 'cpu' vs hook 'axon,cpu' hangs
    waiting on the axon client during an outage, and env 'cpu,axon' vs
    hook 'axon,axon/cpu' silently initializes axon as the default. Only
    when the hook's first platform already equals the env's first (e.g.
    env 'axon', hook 'axon,cpu') is the hook's list left alone — it then
    merely appends a fallback behind the platform the user chose."""
    env = _os.environ.get('JAX_PLATFORMS')
    if not env:
        return
    import jax
    try:
        cfg = jax.config.jax_platforms
        if cfg and cfg != env:
            env_first = env.split(',')[0].strip()
            preferred = cfg.split(',')[0].strip()
            if preferred != env_first:
                jax.config.update('jax_platforms', env)
    except Exception:
        pass  # backends already initialized, or an unknown platform name


# mirror FIRST: the cache decision below keys off the effective platform
# (a cpu-forced run must not load AOT executables compiled elsewhere)
_mirror_platforms_env()
_enable_persistent_compile_cache()

from .config import SGPConfig, DEFAULT_PARAMS, DEFAULT_COLUMNS, parity_config
from .api import sgp, sgp_beta_div, sgp_betaDiv, check_psf_normalized
from .solvers.sgp import solve, solve_with_state, resume_from_state, SGPResult, SGPState
from .solvers.classic import richardson_lucy, wiener
from .projection.flux_projection import project_df

__version__ = '0.1.0'

__all__ = [
    'SGPConfig', 'DEFAULT_PARAMS', 'DEFAULT_COLUMNS', 'parity_config',
    'sgp', 'sgp_beta_div', 'sgp_betaDiv', 'check_psf_normalized',
    'solve', 'solve_with_state', 'resume_from_state', 'SGPResult',
    'SGPState', 'richardson_lucy', 'wiener', 'project_df', '__version__',
]
