"""Solver checkpoint / resume.

The reference has no resume capability; its only persistence is an optional
per-iteration FITS dump (sgp.py:416-422, SURVEY §5). Here the full loop
state is a pytree (solvers.sgp.SGPState), so checkpointing is exact: save
the state at any point, reload, and ``resume_from_state`` continues the
identical trajectory (constants are recomputed deterministically from the
inputs).

Two backends: orbax (production, async-capable) and plain ``.npz``.
"""
from __future__ import annotations

import os
import jax
import numpy as np

from .sgp import SGPState

_FIELDS = SGPState._fields

# Fields added after a release default on load so older checkpoints keep
# resuming (the warm-projection carry cold-starts as invalid — results
# only differ by the warm path's bracket-resolution roundoff). Defaults
# take fv's shape: batched checkpoints (vmapped solves) have (B,)-leading
# leaves, and a 0-d backfill would break a vmapped resume.
_FIELD_DEFAULTS = {
    'lam_dual': lambda st: np.full(np.shape(st['fv']), np.nan,
                                   np.asarray(st['fv']).dtype),
    'dlam_dual': lambda st: np.full(np.shape(st['fv']), np.inf,
                                    np.asarray(st['fv']).dtype),
}


def _fill_missing(items: dict) -> SGPState:
    vals = []
    for k in _FIELDS:
        if k in items:
            vals.append(items[k])
        elif k in _FIELD_DEFAULTS:
            vals.append(_FIELD_DEFAULTS[k](items))
        else:
            raise KeyError(f'checkpoint missing field {k!r} and no '
                           'default exists')
    return SGPState(*vals)


def save_state_npz(path: str, state: SGPState) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in
                      zip(_FIELDS, state)})


def load_state_npz(path: str) -> SGPState:
    with np.load(path) as z:
        return _fill_missing({k: z[k] for k in z.files})


def save_state_orbax(path: str, state: SGPState) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    # force=True: overwrite like the npz backend does — periodic
    # checkpointing to a fixed path must not abort on the second save
    ckpt.save(path, {k: np.asarray(v) for k, v in zip(_FIELDS, state)},
              force=True)
    ckpt.wait_until_finished()


def load_state_orbax(path: str) -> SGPState:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(path)
    return _fill_missing(dict(restored))


def save_state(path: str, state: SGPState, backend: str = 'npz') -> None:
    state = jax.tree.map(np.asarray, state)
    if backend == 'npz':
        save_state_npz(path if path.endswith('.npz') else path + '.npz',
                       state)
    elif backend == 'orbax':
        save_state_orbax(path, state)
    else:
        raise ValueError(f'unknown checkpoint backend {backend}')


def load_state(path: str, backend: str = 'npz') -> SGPState:
    if backend == 'npz':
        return load_state_npz(path if path.endswith('.npz')
                              else path + '.npz')
    if backend == 'orbax':
        return load_state_orbax(path)
    raise ValueError(f'unknown checkpoint backend {backend}')


def solve_checkpointed(gn, psf, bkg, x0, flux_in, obj, beta0, lr0,
                       sat_level, cfg, *, path: str, every: int,
                       backend: str = 'npz'):
    """Single-image solve that persists a checkpoint every ``every``
    iterations (the long-whole-frame recovery hook of SURVEY §5): run in
    ``every``-iteration chunks via ``solve_with_state`` /
    ``resume_from_state`` — chunked == uninterrupted exactly, because the
    full loop state (including the non-monotone line-search memory and the
    BB alpha history) rides in the SGPState — saving to ``path`` between
    chunks. If the process dies, ``load_state(path)`` +
    ``resume_from_state`` (with the ORIGINAL inputs and config) loses at
    most ``every`` iterations. Returns ``(result, state)``.

    For sharded solves use ``parallel.distributed.solve_distributed(...,
    return_state=True)`` / ``resume_distributed`` in the same chunked
    pattern (docs/DEPLOYMENT.md 'Checkpointed long solves').
    """
    from .sgp import resume_from_state, solve_with_state

    if every < 1:
        raise ValueError('every must be >= 1')
    total = cfg.max_iter
    budget = min(every, total)
    # a compiled while_loop cannot pause mid-run, so drive it in chunks:
    # the first chunk runs under a max_iter=budget config, later chunks
    # resume under growing budgets up to the real max_iter.
    res, state = solve_with_state(gn, psf, bkg, x0, flux_in, obj, beta0,
                                  lr0, sat_level,
                                  cfg.replace(max_iter=budget))
    save_state(path, state, backend=backend)
    while (not bool(np.asarray(state.converged))
           and int(np.asarray(state.it)) <= total and budget < total):
        budget = min(budget + every, total)
        res, state = resume_from_state(gn, psf, bkg, x0, flux_in, obj,
                                       beta0, lr0, sat_level, state,
                                       cfg.replace(max_iter=budget))
        save_state(path, state, backend=backend)
    return res, state
