"""Solver configuration.

One frozen (hashable) dataclass carries every hyperparameter of the SGP /
beta-SGP solvers so it can be passed as a jit-static argument. This replaces
the reference's loose kwargs + ``DEFAULT_PARAMS`` tuple
(see /root/reference/restoration/sgp.py:34,41-47).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# Reference DEFAULT_PARAMS tuple, unpacked as
# (max_projs, gamma, beta, alpha_min, alpha_max, alpha, M_alpha, tau, M)
# (reference sgp.py:34). Note the drivers start with alpha=10 while the
# solver's own default is alpha=1.3.
DEFAULT_PARAMS = (1000, 1e-4, 0.4, 1e-5, 1e5, 1e1, 3, 0.5, 1)

# Catalog schema used by the star-stamp workloads (reference sgp.py:35-39).
DEFAULT_COLUMNS = [
    'label', 'xcentroid', 'ycentroid', 'sky_centroid',
    'bbox_xmin', 'bbox_xmax', 'bbox_ymin', 'bbox_ymax',
    'area', 'semimajor_sigma', 'semiminor_sigma',
    'orientation', 'eccentricity', 'min_value', 'max_value',
    'local_background', 'segment_flux', 'segment_fluxerr', 'ellipticity',
    'fwhm',
]


@dataclasses.dataclass(frozen=True)
class SGPConfig:
    """Static solver configuration (jit-static; hashable).

    Field semantics mirror the reference solver arguments
    (/root/reference/restoration/sgp.py:41-47, 506-513) so behaviour is
    checkable line by line, but the implementation is a functional JAX core.
    """

    # Iteration / stopping ------------------------------------------------
    max_iter: int = 500            # MAXIT
    stop_criterion: int = 0        # 0/1 fixed iters, 2 rel step, 3 rel f decrease, 4 discrepancy
    tol_convergence: float = 1e-4  # used by criteria 2 and 3
    # Initialization ------------------------------------------------------
    init_recon: int = 0            # 0 zeros | 1 caller-provided x0 | 2 copy gn | 3 flat flux
    # Projection ----------------------------------------------------------
    proj_type: int = 0             # 0 clip at 0 | 1 flux-conserving projection
    max_projs: int = 1000          # iteration cap inside the flux projection
    projection_method: str = 'bisect'  # 'bisect' guided-secant sectioning
                                       # (TPU fast path, sharding-safe) |
                                       # 'section' round-3 cold K-way
                                       # sectioned bisection (A/B control) |
                                       # 'pallas' sectioning as one VMEM-
                                       # resident kernel | 'sort' exact
                                       # sweep | 'secant' reference-style
                                       # iteration
    warm_projection: bool = False  # carry the dual root across iterations
                                   # and open the bisection from a warm
                                   # bracket (bisect path only). Measured
                                   # ~7% faster for SINGLE-image solves
                                   # (410x410 whole frame: 0.87 vs 0.93
                                   # ms/iter) but SLOWER under vmap (the
                                   # data-dependent sweep count runs to the
                                   # worst lane of the whole batch: 54.8k
                                   # vs 60.0k stamps/s at B=6144) — so off
                                   # by default; single-image callers opt
                                   # in by building their own SGPConfig
                                   # (the whole-frame bench does).
    stable_sums: bool | str = 'auto'
                                   # compensated-tree reduction
                                   # (ops.reduce.gsum_ff) for the scalars
                                   # the STOP RULES read — the objective fv
                                   # (rules 3/4 + the discrepancy series)
                                   # and the criterion-2 step norms — so an
                                   # f32 solve's iteration count no longer
                                   # swings with XLA's compile-dependent
                                   # reduction order (51-74 iters run-to-
                                   # run on the 410x410 frame, round 3).
                                   #   'auto' — ON for f32 single solves;
                                   #            OFF for f64 (roundoff sits
                                   #            far below every stop
                                   #            tolerance, and parity mode
                                   #            differential-tests against
                                   #            the plain-sum oracle) and
                                   #            OFF for vmapped batches
                                   #            (restore_stamps resolves
                                   #            it: the tree's log2(n)
                                   #            extra levels per objective
                                   #            evaluation are measurable
                                   #            at B ~ 10^4 and lanes are
                                   #            aggregated statistically)
                                   #   True/False — force either way
    # Line search ---------------------------------------------------------
    gamma: float = 1e-4            # Armijo penalty
    bt_factor: float = 0.4         # backtracking shrink factor ("beta" in the reference)
    m_mem: int = 1                 # non-monotone memory M (1 = monotone)
    max_backtracks: int = 60       # hard cap on backtracking steps (lam >= 0.4**60 ~ 1e-24 < 1e-12 exit)
    # Barzilai-Borwein steplength ----------------------------------------
    alpha_init: float = 1.3
    alpha_min: float = 1e-5
    alpha_max: float = 1e5
    m_alpha: int = 3               # memory for alpha2 values
    tau_init: float = 0.5          # BB alternation threshold
    # Data conditioning ---------------------------------------------------
    scale_data: bool = True
    # Divergence ----------------------------------------------------------
    divergence: str = 'kl'         # 'kl' | 'beta'
    adapt_beta: bool = True        # beta-SGP: gradient-descend beta on line-search rejects
    schedule_lr: bool = False      # beta-SGP: exponential lr decay per epoch
    lr_exp_param: float = 0.1
    # Misc ----------------------------------------------------------------
    errflag: bool = False          # track ||x - obj|| / ||obj|| per iteration
    track_discr: bool = True       # record the per-iteration discrepancy
                                   # series. Under vmap the per-lane buffer
                                   # write is a (B, max_iter+1) scatter every
                                   # iteration; serving/bench paths that never
                                   # read the series turn it off (the final
                                   # discrepancy stays available as
                                   # discr_coeff-scaled ``fv``)
    save: bool = False             # per-iteration FITS dump (debug; host callback)
    verbose: bool = True           # reference quirk: criterion-2 tol is squared only when verbose
    has_flux: bool = True          # whether a precomputed flux is supplied
    has_sat_level: bool = False    # whether a CCD saturation ceiling is enforced in the projection
    dtype: str = 'float32'         # compute dtype ('float64' for parity mode on CPU)
    operator: str = 'auto'         # 'auto' | 'otf' | 'matmul' | 'matmul_flat'
                                   # | 'matmul_split' (opt-in compensated
                                   # split-bf16 MXU matvec, ~2^-17 accurate)
                                   # | 'linear' | 'halo'
    # Mesh axis names when the solve runs inside shard_map over a 2-D image
    # grid ('halo' operator): reductions become psum/pmax/pmin collectives.
    axis_names: tuple = ()
    # Mesh axes to synchronize LOOP TRIP COUNTS over (e.g. the 'batch' axis
    # of a 3-D (batch, ty, tx) mesh). Device groups that shard different
    # images execute different iteration/backtrack counts, and a collective
    # (halo ppermute, objective psum) inside a data-dependent loop then
    # deadlocks the mesh. With sync_axes the continue flags are OR-reduced
    # over these axes and already-stopped lanes carry their state unchanged,
    # so every device executes the identical collective sequence while
    # results stay exactly per-image.
    sync_axes: tuple = ()

    def __post_init__(self):
        if self.divergence not in ('kl', 'beta'):
            raise ValueError(f"divergence must be 'kl' or 'beta', got "
                             f"{self.divergence!r}")
        if self.operator not in ('auto', 'otf', 'matmul', 'matmul_flat',
                                 'matmul_split', 'linear', 'halo'):
            raise ValueError(f'unknown operator {self.operator!r}')
        if self.projection_method not in ('bisect', 'section', 'pallas',
                                          'sort', 'secant'):
            raise ValueError(
                f'unknown projection_method {self.projection_method!r}')
        if self.stable_sums not in ('auto', True, False):
            raise ValueError(f"stable_sums must be 'auto', True or False, "
                             f'got {self.stable_sums!r}')
        if self.stop_criterion not in (0, 1, 2, 3, 4):
            raise ValueError('stop_criterion must be 0..4')
        if self.init_recon not in (0, 1, 2, 3):
            raise ValueError('init_recon must be 0..3')
        if self.proj_type not in (0, 1):
            raise ValueError('proj_type must be 0 or 1')
        if self.max_iter < 1:
            raise ValueError('max_iter must be >= 1')
        if not 0.0 < self.bt_factor < 1.0:
            raise ValueError(f'bt_factor={self.bt_factor} must be in (0, 1) '
                             f'(backtracking must shrink the steplength)')
        if (self.max_backtracks > 0
                and self.bt_factor ** (self.max_backtracks - 1) >= 1e-12):
            # The line search accepts on Armijo OR on the lam < 1e-12
            # rescue floor (reference sgp.py:336). Trials run at
            # lam = bt^0 .. bt^(max_backtracks-1), so the LAST evaluated
            # steplength must itself sit strictly below the floor; if the
            # trip cap binds before that, a capped exit would silently
            # adopt a step that failed the Armijo test — an
            # objective-increasing step the reference never takes.
            import math
            need = max(self.max_backtracks,
                       1 + math.ceil(-12.0 / math.log10(self.bt_factor)))
            while self.bt_factor ** (need - 1) >= 1e-12:
                need += 1
            raise ValueError(
                f'max_backtracks={self.max_backtracks} with '
                f'bt_factor={self.bt_factor} caps the line search at '
                f'steplength '
                f'{self.bt_factor ** (self.max_backtracks - 1):.2e} >= '
                f'1e-12, so a capped exit would adopt a non-Armijo step. '
                f'Use max_backtracks >= {need}, or 0 to disable the line '
                f'search explicitly.')

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    def replace(self, **kw) -> 'SGPConfig':
        return dataclasses.replace(self, **kw)


def parity_config(**kw) -> SGPConfig:
    """Config preset for float64 bit-parity work on CPU."""
    base = dict(dtype='float64')
    base.update(kw)
    return SGPConfig(**base)
