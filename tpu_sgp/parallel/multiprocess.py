"""Multi-process / multi-slice scaffolding (SURVEY §2.3/§5).

One process per host (or per TPU slice) joins a ``jax.distributed`` cluster;
meshes are then built over the GLOBAL device list with the placement rule

  * batch-like axes span processes — independent restorations need no
    communication, so their collectives (none) ride the slow DCN for free;
  * spatial axes (``ty``/``tx`` halo exchange, per-lambda psums) stay INSIDE
    a process's devices, where XLA lowers them onto ICI.

``jax.devices()`` returns devices process-major, so reshaping the global
list to (num_processes, local_ty, local_tx) realizes exactly this placement
— `ppermute` neighbors along ty/tx are same-process (ICI) and the leading
axis crosses processes (DCN).

The reference is single-process NumPy with no distributed story at all
(SURVEY §2.3); this module is the TPU-native scale-out path. Validated by a
2-process CPU integration test (tests/test_multiprocess.py) using the same
virtual-device rig as the rest of the multi-chip suite.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None
                     ) -> None:
    """Join (or bootstrap) a multi-process JAX cluster.

    Thin, idempotent wrapper over ``jax.distributed.initialize``: call once
    per process before any backend use. With no arguments, cluster
    parameters come from the environment (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID — or a supported cluster scheduler's
    auto-detection). A no-op when the cluster is already initialized or
    when the call describes a single-process run.
    """
    import jax

    if num_processes is not None and int(num_processes) <= 1 \
            and coordinator_address is None:
        return
    state = getattr(getattr(jax._src, 'distributed', None),
                    'global_state', None)
    if state is not None and getattr(state, 'client', None) is not None:
        return  # already initialized
    kw = {}
    if coordinator_address is not None:
        kw['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kw['num_processes'] = int(num_processes)
    if process_id is not None:
        kw['process_id'] = int(process_id)
    if local_device_ids is not None:
        kw['local_device_ids'] = list(local_device_ids)
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as exc:
        # the private global_state probe above can silently stop detecting
        # initialization across JAX upgrades — treat the public "already
        # initialized" error as the idempotent no-op it is
        if 'already initialized' not in str(exc):
            raise


def global_device_grid(spatial_shape: Optional[Tuple[int, int]] = None
                       ) -> np.ndarray:
    """(num_processes, ty, tx) ndarray of global devices with the
    batch-on-DCN / spatial-on-ICI placement described in the module
    docstring. ``spatial_shape`` factors each process's local devices;
    default: closest-to-square."""
    import jax

    devs = jax.devices()
    nproc = jax.process_count()
    per = len(devs) // nproc
    if per * nproc != len(devs):
        raise ValueError(
            f'{len(devs)} global devices do not divide evenly over '
            f'{nproc} processes')
    if spatial_shape is None:
        ty = int(np.floor(np.sqrt(per)))
        while per % ty:
            ty -= 1
        spatial_shape = (ty, per // ty)
    ty, tx = spatial_shape
    if ty * tx != per:
        raise ValueError(f'spatial shape {spatial_shape} != {per} '
                         'devices per process')
    # group EXPLICITLY by process_index — jax.devices() ordering is
    # process-major on current backends but not a documented guarantee,
    # and a silently mixed row would put halo ppermutes on DCN (the exact
    # failure mode this placement exists to prevent)
    by_proc: dict = {}
    for d in devs:
        by_proc.setdefault(d.process_index, []).append(d)
    if len(by_proc) != nproc or any(len(v) != per for v in by_proc.values()):
        raise ValueError(
            f'devices are not evenly distributed over processes: '
            f'{ {p: len(v) for p, v in by_proc.items()} }')
    rows = [by_proc[p] for p in sorted(by_proc)]
    return np.array(rows, dtype=object).reshape(nproc, ty, tx)


def make_multiprocess_mesh(spatial_shape: Optional[Tuple[int, int]] = None,
                           axis_names: Tuple[str, str, str] =
                           ('batch', 'ty', 'tx')):
    """3-D (batch, ty, tx) mesh over ALL processes' devices: the leading
    axis is one mesh step per process (DCN), the spatial axes tile each
    process's local devices (ICI). Drop-in for
    ``solve_distributed_batch(..., mesh=...)``."""
    from jax.sharding import Mesh

    return Mesh(global_device_grid(spatial_shape), axis_names=axis_names)
