"""2-process CPU integration test for the multi-process mesh scaffolding
(SURVEY §2.3/§5): two subprocesses join a jax.distributed cluster (Gloo
collectives), build the batch-on-DCN / spatial-on-ICI global mesh, and run
the distributed batched solve; each checks its local shards against a
single-device reference (see tests/mp_worker.py)."""
import os
import socket
import subprocess
import sys

import pytest

from tpu_sgp.parallel.multiprocess import (global_device_grid,
                                           init_distributed,
                                           make_multiprocess_mesh)

WORKER = os.path.join(os.path.dirname(__file__), 'mp_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the workers configure their own virtual device count / platform
    env.pop('XLA_FLAGS', None)
    env.pop('JAX_PLATFORMS', None)
    return env


@pytest.mark.slow
def test_two_process_distributed_solve():
    port = _free_port()
    env = _clean_env()
    procs = [subprocess.Popen([sys.executable, WORKER, str(pid), str(port)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('multi-process workers timed out:\n' + '\n'.join(outs))
    for p, out in zip(procs, outs):
        tail = '\n'.join(out.splitlines()[-25:])
        assert p.returncode == 0, f'worker failed:\n{tail}'
        assert 'OK' in out, tail


def test_single_process_helpers():
    """In-process sanity: init is a no-op single-process, and the grid /
    mesh builders produce the documented placement on local devices."""
    import jax

    init_distributed(num_processes=1)  # must not raise or re-init
    grid = global_device_grid()
    assert grid.shape[0] == jax.process_count()
    assert grid.size == len(jax.devices())
    mesh = make_multiprocess_mesh()
    assert mesh.axis_names == ('batch', 'ty', 'tx')
    assert mesh.devices.size == len(jax.devices())
    with pytest.raises(ValueError, match='spatial shape'):
        global_device_grid((3, 5))
