"""Pallas TPU kernel: the entire flux projection in one VMEM-resident pass.

The K-way sectioned bisection in ``flux_projection.project_df_bisect``
re-reads c and dia from HBM on every sectioning step (~14 steps x 2 arrays).
This kernel keeps both operands in VMEM for the whole root-find: one HBM
read of c/dia, n_steps of pure-VPU evaluation, one HBM write of the result.

The pixel vector is laid out as (rows, 128) lane tiles (rows padded to a
multiple of 8) so the kernel block shape meets the TPU (8, 128) tiling rule
and, crucially, still meets it after ``jax.vmap`` prepends a batch grid
dimension — the vmapped solver can call this per lane.

Semantics match project_df_bisect at the POLICY level: same global
bracket, same ``bracket_bits`` narrowing budget, same saturation handling.
The sectioning width differs — this kernel uses K=7 (3 bits/step, fewer
VMEM-resident sweeps) where the XLA path's default is K=3 (arithmetic-
optimal for fused HBM sweeps; see flux_projection._K_PTS) — so step counts
differ and the returned lambdas agree to projection resolution, not
bitwise (tests/test_projection.py asserts exactly that). The solver
selects it via ``projection_method='pallas'``.

Use it for SINGLE-image solves. Under ``jax.vmap`` the added grid dimension
serializes stamps over the (single) tensor core — measured 27x slower than
the XLA-fused bisect for a 256-stamp batch — so batched workloads should
keep the default 'bisect'.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_K = 7       # interior evaluation points per sectioning step
_LANES = 128
_SUBL = 8


def _kernel(c_ref, dia_ref, scal_ref, out_ref, *, n_steps: int,
            has_sat: bool):
    c = c_ref[:]
    inv = 1.0 / dia_ref[:]
    b = scal_ref[0, 0]
    cap = scal_ref[0, 3]

    def xval(lam):
        x = jnp.maximum((c + lam) * inv, 0.0)
        if has_sat:
            x = jnp.minimum(x, cap)
        return x

    def step(_, carry):
        lo, hi = carry
        seg = (hi - lo) / (_K + 1)
        nbelow = jnp.zeros((), c.dtype)
        for k in range(1, _K + 1):
            r = jnp.sum(xval(lo + seg * k))
            nbelow += jnp.where(r - b < 0, 1.0, 0.0)
        new_lo = lo + nbelow * seg
        return (new_lo, new_lo + seg)

    lo, hi = jax.lax.fori_loop(0, n_steps, step,
                               (scal_ref[0, 1], scal_ref[0, 2]))
    out_ref[:] = xval(0.5 * (lo + hi))


def project_df_pallas(b, c, dia, scaling, sat_level=None,
                      has_sat: bool | None = None,
                      n_iters: int | None = None):
    """Flux projection via the Pallas kernel. Single-device only (the
    pixel vector must be whole); vmap-compatible."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if has_sat is None:
        has_sat = sat_level is not None
    dtype = jnp.result_type(c)
    if n_iters is None:
        from ..projection.flux_projection import bracket_bits
        n_iters = bracket_bits(dtype)   # shared policy with project_df_bisect
    n_steps = int(np.ceil(n_iters / np.log2(_K + 1)))

    c_in = jnp.asarray(c, dtype)
    out_shape = c_in.shape
    cv = c_in.ravel()
    dv = jnp.broadcast_to(jnp.asarray(dia, dtype), out_shape).ravel()
    n = cv.shape[0]
    rows_needed = -(-n // _LANES)
    rows = max(-(-rows_needed // _SUBL) * _SUBL, _SUBL)
    padded = rows * _LANES
    pad = padded - n
    if pad:
        # sentinel pixels contribute exactly 0 to every residual
        cv = jnp.concatenate([cv, jnp.full((pad,), -3e38, dtype)])
        dv = jnp.concatenate([dv, jnp.ones((pad,), dtype)])
    c2 = cv.reshape(rows, _LANES)
    d2 = dv.reshape(rows, _LANES)

    b = jnp.asarray(b, dtype)
    eps = jnp.finfo(dtype).eps
    cap = (jnp.asarray(sat_level, dtype) / scaling - eps if has_sat
           else jnp.asarray(0.0, dtype))
    c_valid = cv[:n]
    d_valid = dv[:n]
    lo = jnp.min(-c_valid)
    hi = jnp.maximum(jnp.max(b * d_valid - c_valid), lo + 1.0)
    scal = jnp.stack([b, lo, hi, cap]).reshape(1, 4)

    out = pl.pallas_call(
        partial(_kernel, n_steps=n_steps, has_sat=has_sat),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == 'cpu',
    )(c2, d2, scal)
    out = out.reshape(-1)
    if pad:
        out = out[:n]
    return out.reshape(out_shape)
