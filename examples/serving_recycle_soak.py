"""Serving soak with live process recycling (VERDICT r4 next-7).

Exercises the MicroBatchServer leak watchdog end to end on the real chip:
a supervisor loop runs serving SUBPROCESSES (the docs/DEPLOYMENT.md
'Serving process recycling' pattern); each subprocess serves concurrent
micro-batched clients until the RSS watchdog fires, then drains the queue
(every already-submitted request completes), closes, and exits for the
supervisor to restart. The soak records: total requests submitted vs
completed (must be equal — zero loss across recycles), per-process RSS
curves, and the number of recycle cycles.

Usage:
  python examples/serving_recycle_soak.py [minutes] [rss_delta_mb]
  python examples/serving_recycle_soak.py --worker <rss_limit_mb>  # internal
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def worker(rss_limit_mb: float) -> None:
    """One serving process: serve until the watchdog fires, drain, exit."""
    import concurrent.futures as cf
    import threading

    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/tpu_sgp_jax_cache')
    from tpu_sgp.parallel.session import MicroBatchServer, RestorationSession
    from tpu_sgp.simulate import synthetic_star_stamps

    stamps, psf, bkgs, _ = synthetic_star_stamps(64, size=31, seed=42)
    fluxes = stamps.sum(axis=(1, 2)) - 31 * 31 * bkgs
    sess = RestorationSession(psf.astype(np.float32))
    sess.warmup(buckets=(64, 256, 1024))
    base_rss = MicroBatchServer.process_rss_mb()
    limit = base_rss + rss_limit_mb
    srv = MicroBatchServer(sess, max_batch=1024,
                           rss_limit_mb=limit,
                           on_limit=lambda stats: None)  # supervisor decides

    submitted = completed = 0
    errors = []
    rss_curve = []
    stop = threading.Event()
    lock = threading.Lock()

    def client(i):
        nonlocal submitted, completed
        rng = np.random.default_rng(i)
        try:
            while not stop.is_set():
                k = int(rng.integers(8, 65))
                with lock:
                    submitted += 1
                fut = srv.submit(stamps[:k].astype(np.float32), bkgs[:k],
                                 fluxes=fluxes[:k])
                res = fut.result(timeout=600)   # an SGPResult slice
                assert np.isfinite(res.x).all()
                with lock:
                    completed += 1
        except BaseException as exc:  # noqa: BLE001 — a dead client must
            with lock:                # be visible in the report, not a
                errors.append(repr(exc))   # silent thread exit
            stop.set()

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(6)]
    for t in threads:
        t.start()
    t0 = time.monotonic()
    while not srv.recycle_recommended and not stop.is_set():
        time.sleep(2.0)
        rss_curve.append(round(MicroBatchServer.process_rss_mb(), 1))
        if time.monotonic() - t0 > 900:   # safety: never soak one process
            break                          # longer than the whole budget
    stop.set()                 # pause producers (no NEW requests)...
    for t in threads:
        t.join(timeout=600)
    srv.drain(timeout=120.0)   # ...then serve everything already queued
    stats = srv.watchdog_stats()
    srv.close()
    print('WORKER ' + json.dumps({
        'submitted': submitted, 'completed': completed, 'errors': errors,
        'recycled': bool(stats['recycle_recommended']),
        'batches': stats['batches_served'],
        'requests': stats['requests_served'],
        'base_rss_mb': round(base_rss, 1), 'rss_curve_mb': rss_curve,
        'wall_s': round(time.monotonic() - t0, 1)}))


def supervise(minutes: float, rss_delta_mb: float) -> int:
    deadline = time.monotonic() + minutes * 60
    total_sub = total_done = cycles = recycles = 0
    curves = []
    while time.monotonic() < deadline:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--worker',
             str(rss_delta_mb)],
            capture_output=True, text=True, cwd=_REPO, timeout=1800)
        marker = [l for l in r.stdout.splitlines()
                  if l.startswith('WORKER ')]
        if not marker:
            print(f'worker died without report:\n{r.stdout}\n'
                  f'{r.stderr[-2000:]}')
            return 1
        rep = json.loads(marker[0][7:])
        cycles += 1
        recycles += bool(rep['recycled'])
        total_sub += rep['submitted']
        total_done += rep['completed']
        curves.append((rep['base_rss_mb'], rep['rss_curve_mb'][-5:]))
        print(f"cycle {cycles}: {rep['completed']}/{rep['submitted']} "
              f"requests, {rep['batches']} device calls, recycled="
              f"{rep['recycled']}, rss {rep['base_rss_mb']} -> "
              f"{rep['rss_curve_mb'][-1] if rep['rss_curve_mb'] else '?'}"
              f" MB in {rep['wall_s']}s")
        if rep['errors']:
            print(f"  client errors: {rep['errors']}")
            return 3
    ok = total_done == total_sub and recycles >= 1
    print(f'SOAK {"OK" if ok else "FAIL"}: {cycles} process cycles, '
          f'{recycles} watchdog recycles, {total_done}/{total_sub} '
          f'requests completed (zero loss={total_done == total_sub})')
    return 0 if ok else 2


if __name__ == '__main__':
    if '--worker' in sys.argv:
        worker(float(sys.argv[sys.argv.index('--worker') + 1]))
    else:
        mins = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
        delta = float(sys.argv[2]) if len(sys.argv) > 2 else 250.0
        sys.exit(supervise(mins, delta))
