"""Mesh-aware global reductions.

Inside ``shard_map`` every array is device-local; the solver's scalar
quantities (flux, objective, BB inner products, stop-rule norms) must be
reduced with collectives over the mesh axes. With ``axes=()`` these are
plain jnp reductions, so the same solver core runs single-device and
distributed (the SPMD analog of the reference's global NumPy sums,
flux_conserve_proj.py:26,102,142 and sgp.py:321-334).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gsum(x, axes=()):
    s = jnp.sum(x)
    return jax.lax.psum(s, axes) if axes else s


def gmax(x, axes=()):
    m = jnp.max(x)
    return jax.lax.pmax(m, axes) if axes else m


def gmin(x, axes=()):
    m = jnp.min(x)
    return jax.lax.pmin(m, axes) if axes else m


def gmean(x, axes=()):
    if not axes:
        return jnp.mean(x)
    total = jax.lax.psum(jnp.sum(x), axes)
    count = jax.lax.psum(jnp.asarray(x.size, x.dtype), axes)
    return total / count


def gsum_ff(x, axes=()):
    """Compensated (float-float) pairwise-tree sum: ~dtype-squared
    accumulation error, with a summation ORDER fixed by the graph itself.

    Why it exists: the f32 stop-rule scalars (objective, step norms) are
    sums over up to ~10^5 pixels. A plain ``jnp.sum`` leaves the reduction
    order to XLA's tiling choices, which can change between compiles —
    measured as a 51-74 iteration swing of the crit-3 whole-frame solve
    across bench runs (docs/PERFORMANCE.md round 3). TPUs have no f64 to
    escape to, so instead each tree level combines pairs with an exact
    two-sum (Knuth: s = a+b carries its rounding error (a-(s-bb))+(b-bb)
    exactly) and a parallel error accumulator — the result is accurate to
    O(eps^2 * n) relative, far below one f32 ulp for any image size, so
    every evaluation order XLA could pick rounds to the same scalar.

    Cost: log2(n) elementwise levels over geometrically shrinking arrays
    (~2 extra passes of total HBM traffic) — noise for single-image
    solves; the batch layer keeps plain sums for vmapped stamps where the
    extra serial depth is measurable (config.stable_sums docs).
    """
    f = x.reshape(-1)
    n = f.shape[0]
    p = 1 << max(0, int(n - 1).bit_length())
    if p != n:
        f = jnp.concatenate([f, jnp.zeros((p - n,), f.dtype)])
    hi, lo = f, jnp.zeros_like(f)
    while p > 1:
        h = p // 2
        a, b = hi[:h], hi[h:]
        s = a + b
        bb = s - a
        err = (a - (s - bb)) + (b - bb)
        lo = lo[:h] + lo[h:] + err
        hi = s
        p = h
    s = (hi + lo)[0] if n > 0 else jnp.zeros((), x.dtype)
    return jax.lax.psum(s, axes) if axes else s


