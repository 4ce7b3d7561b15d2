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


