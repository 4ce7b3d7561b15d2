"""tpu_sgp — TPU-native SGP / beta-SGP astronomical image restoration.

A ground-up JAX/XLA re-design of the capabilities of the reference
Scaled-Gradient-Projection deconvolution codebase (Yash-10/beta-sgp,
mounted read-only at /root/reference): one functional solver core
(jit + vmap + shard_map), MXU-mapped PSF operators, a vectorizable
flux-conserving projection, and the surrounding framework — PSF modeling,
source catalogs, tiling/mosaicking, metrics, workloads and CLI.
"""
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
