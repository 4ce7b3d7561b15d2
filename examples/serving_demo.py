"""Serving demo: pre-compiled, bucketed stamp restoration with
``RestorationSession`` — warm up the canonical batch shapes once, then
serve variable-size batches (and an async stream) at device speed.

Run from the repo root:  python examples/serving_demo.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_sgp.parallel.session import RestorationSession
from tpu_sgp.simulate import synthetic_star_stamps


def main():
    stamps, psf, bkgs, _ = synthetic_star_stamps(1024, size=31, seed=1)
    fluxes = stamps.sum(axis=(1, 2)) - 31 * 31 * bkgs

    session = RestorationSession(psf)
    t0 = time.perf_counter()
    session.warmup(buckets=(32, 64, 256))
    print(f'warmup (compile 3 bucket shapes): '
          f'{time.perf_counter() - t0:.1f}s')

    # variable-size requests now land in warmed buckets: no recompiles
    for n in (17, 50, 64, 200, 256):
        t0 = time.perf_counter()
        res = session.restore(stamps[:n], bkgs[:n], fluxes=fluxes[:n])
        iters = np.asarray(res.iters)  # forces real completion
        wall = time.perf_counter() - t0
        print(f'batch {n:4d}: {wall * 1e3:6.1f} ms '
              f'({int(np.median(iters))} median iters)')

    # streaming: dispatch of batch k+1 overlaps consumption of batch k;
    # coalesce=4 folds 4 queued requests into one device call (exact —
    # lanes are independent; results re-split per request)
    chunks = [(stamps[i:i + 64], bkgs[i:i + 64], fluxes[i:i + 64])
              for i in range(0, 512, 64)]
    for coalesce in (1, 4):
        t0 = time.perf_counter()
        total = 0
        for res in session.restore_stream(chunks, coalesce=coalesce):
            total += np.asarray(res.x).shape[0]
        print(f'streamed {total} stamps (coalesce={coalesce}) in '
              f'{(time.perf_counter() - t0) * 1e3:.0f} ms')

    # micro-batching: many concurrent client threads, one device call per
    # max_delay_s window — each caller's Future gets its own slice
    from concurrent.futures import ThreadPoolExecutor

    from tpu_sgp.parallel.session import MicroBatchServer

    def client(i, srv):
        k = i * 32
        r = srv.restore(stamps[k:k + 32], bkgs[k:k + 32],
                        fluxes=fluxes[k:k + 32])
        assert np.isfinite(r.x).all()

    t0 = time.perf_counter()
    with MicroBatchServer(session, max_batch=256,
                          max_delay_s=0.01) as srv, \
            ThreadPoolExecutor(max_workers=8) as pool:
        list(f.result() for f in [pool.submit(client, i, srv)
                                  for i in range(8)])
    print(f'micro-batched 8 concurrent 32-stamp clients in '
          f'{(time.perf_counter() - t0) * 1e3:.0f} ms '
          f'({srv.batches_served} device calls)')


if __name__ == '__main__':
    main()
