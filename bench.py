"""Benchmark: batched star-stamp restorations per second on one TPU chip.

Workload mirrors the reference star-stamps benchmark configuration
(/root/reference/restoration/application_sgp_star_stamps.py:107-112):
KL-SGP, proj_type=1 (flux-conserving projection), init_recon=2,
stop_criterion=3, precomputed flux, ccd_sat_level=65000, scale_data=True —
run as ONE vmapped batch of synthetic 31x31 stamps instead of a serial
Python loop.

Baselines (BASELINE.md):
  * KL stamps: reference median 13.3 ms/stamp on CPU (results/EXEC_TIME.npy)
  * beta stamps: 20.0 ms/stamp (results/EXEC_TIME_BETA.npy)
  * 410x410 whole frame: 6.54 s / 51 iters = 128 ms/iter
    (results/SUBDIV_EXEC_TIME*.npy)

Inputs are staged in HBM before the timed region (the dev tunnel's
~50 MB/s host link would otherwise dominate — a real TPU host's PCIe moves
the same batch in ~2 ms), and every timing synchronizes through a real
transfer because jax.block_until_ready is a no-op on this backend.

Prints one JSON line per metric; the LAST line is the primary metric the
driver records:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np

BASELINE_STAMP_SECONDS = 0.0133       # reference median per-stamp wall (KL)
BASELINE_BETA_STAMP_SECONDS = 0.0200  # reference median per-stamp wall (beta)
BASELINE_FRAME_MS_PER_ITER = 128.0    # reference 410x410 sparse subframe
BATCH = 12288   # round 3 rescan with right-sized tail buckets: the earlier
                # "12288 collapse" (53.5k) was tail OVERFLOW (1440-1523
                # unconverged at p1=28 vs bucket 1024 -> full-width catch-up
                # phase); with tail 2048 the same window measured 8192 ->
                # 59.8k vs 12288 -> 70.8k (16384 flat at 70.3k)
BETA_BATCH = 12288  # same rescan: 49.8k @6144/1024 vs 58.0k @12288/2048
N_REPEATS = 30  # the tunneled chip is contention-bimodal (same build measured
                # 107-136 ms walls across windows); min over many repeats —
                # each extra repeat costs ~0.1 s, catching one uncontended
                # window is worth ~10%
SERVE_CALLS = 25
STREAM_REQ = 16
SUFFIX = 'tpu'      # 'cpu_fallback' when the TPU probe budget is exhausted
COMPACT = True      # convergence compaction (sized for the TPU batches)


def _wait_for_backend(max_wait_s: float = None) -> bool:
    """The tunneled axon backend has a full-outage mode where client
    creation hangs for minutes and then raises UNAVAILABLE; a failed
    in-process init is cached by jax and unrecoverable. Probe device init
    in SUBPROCESSES (disposable) until one succeeds, so a transient outage
    delays the bench instead of hanging or poisoning it. Costs one ~5 s
    probe on a healthy rig; returns False when the budget is exhausted.

    The budget defaults to 30 min (outages measured here last hours, so a
    longer window costs nothing on a healthy rig but can catch a recovery
    edge); override with TPU_SGP_BENCH_MAX_WAIT_S."""
    import os
    import subprocess

    if max_wait_s is None:
        max_wait_s = float(os.environ.get('TPU_SGP_BENCH_MAX_WAIT_S', 1800))
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        left = deadline - time.monotonic()
        if left <= 0:
            return False
        try:
            # the axon register hook ignores the JAX_PLATFORMS env var but
            # honors the config flag — mirror it into the config like
            # tests/conftest.py does, so a cpu-forced bench probes cpu
            r = subprocess.run(
                [sys.executable, '-c',
                 'import os, jax\n'
                 'p = os.environ.get("JAX_PLATFORMS")\n'
                 'if p: jax.config.update("jax_platforms", p)\n'
                 'jax.devices(); print("up")'],
                cwd=os.path.dirname(os.path.abspath(__file__)) or '.',
                capture_output=True, text=True,
                timeout=min(90.0, max(10.0, left)))
            if r.returncode == 0 and 'up' in r.stdout:
                return True
            # surface the actual failure — a 30-min silent retry loop on a
            # deterministic misconfiguration (bad platform name, broken
            # venv) is indistinguishable from an outage otherwise
            why = (r.stderr or r.stdout).strip().splitlines()[-3:]
        except subprocess.TimeoutExpired:
            why = ['probe timed out (client creation hang — outage mode)']
        print(f'# backend probe {attempt} failed; retrying '
              f'({left:.0f}s left): ' + ' | '.join(why), file=sys.stderr)
        time.sleep(min(20.0, max(0.0, deadline - time.monotonic())))


def _sync(res):
    """Force completion via a real transfer (block_until_ready no-ops on
    the tunneled axon backend)."""
    np.asarray(res.iters)
    return res


def _min_wall(fn, repeats=None, verbose=False):
    # N_REPEATS is read at CALL time (a def-time default would freeze the
    # value before _enter_cpu_fallback shrinks it)
    repeats = N_REPEATS if repeats is None else repeats
    fn()  # compile + warm
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    if verbose:
        print(f'# walls(ms): {[round(w * 1e3, 1) for w in walls]}',
              file=sys.stderr)
    return min(walls)


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({'metric': metric, 'value': round(value, 2),
                      'unit': unit, 'vs_baseline': round(vs_baseline, 2)}))


# Measured per-run so every round's numbers can be corrected for THIS
# window's tunnel weather (the r04 regressions were all floor-shaped —
# VERDICT r4 weak #1/#4). Keys: 'dispatch' = wall of a trivial program
# returning a BATCH-sized int32 (exactly what _sync fetches after a stamp
# solve); 'wire_256' = wall of an echo program that uploads a (256, 961)
# f32 request and downloads the same bytes (the serving round trip).
_FLOORS = {}


def _measure_floors(jax, jnp, repeats=20):
    """Dispatch+readback floor probes. min-wall like every other metric;
    the probes bracket the real programs' fixed overheads from below."""
    tiny = jax.jit(lambda a: a + 1)
    seed = jax.device_put(jnp.zeros((BATCH,), jnp.int32))
    _FLOORS['dispatch'] = _min_wall(
        lambda: np.asarray(tiny(seed)), repeats=repeats)
    echo = jax.jit(lambda a: a + 1.0)
    req = jax.device_put(jnp.zeros((256, 961), jnp.float32))
    wire = _min_wall(lambda: np.asarray(echo(req)), repeats=repeats)
    # the serving session also UPLOADS the request each call; the echo
    # probe above only times download+dispatch. Time the upload too.
    host_req = np.zeros((256, 961), np.float32)
    up = _min_wall(lambda: np.asarray(
        echo(jax.device_put(jnp.asarray(host_req)))), repeats=repeats)
    _FLOORS['wire_256'] = max(wire, up)
    print(f'# rig floors: dispatch={_FLOORS["dispatch"] * 1e3:.1f}ms '
          f'wire_256={_FLOORS["wire_256"] * 1e3:.1f}ms '
          f'(echo-only {wire * 1e3:.1f}ms)', file=sys.stderr)
    _emit(f'rig_dispatch_floor_ms_{SUFFIX}', _FLOORS['dispatch'] * 1e3,
          'ms', 1.0)


def _emit_chip_only(metric, wall, n_items, floor_key, per_item_baseline_s):
    """Companion metric with the measured rig floor subtracted — the
    round-over-round comparable series (tunnel weather cancels)."""
    floor = _FLOORS.get(floor_key)
    if floor is None or wall - floor <= 0:
        return
    rate = n_items / (wall - floor)
    _emit(f'{metric}_chip_only_{SUFFIX}', rate, 'stamps/s',
          rate * per_item_baseline_s)


def _ab_ratio(label, fn_a, fn_b, name_a, name_b, pairs=20):
    """Interleaved A/B: alternate the two programs within ONE measurement
    window and report the median of per-pair wall ratios — slow-window
    contention multiplies both sides of a pair and cancels out of the
    ratio, unlike cross-round min-wall comparisons (VERDICT r4 weak #1).
    Returns the median of wall_a / wall_b (value < 1 means A is faster)."""
    fn_a()
    fn_b()  # compile + warm both before the window
    ratios, walls_a, walls_b = [], [], []
    for _ in range(pairs):
        t0 = time.perf_counter()
        fn_a()
        wa = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn_b()
        wb = time.perf_counter() - t0
        walls_a.append(wa)
        walls_b.append(wb)
        ratios.append(wa / wb)
    ratios_s = sorted(ratios)
    med = float(np.median(ratios))
    iqr = ratios_s[(3 * len(ratios)) // 4] - ratios_s[len(ratios) // 4]
    print(f'# A/B {label}: {name_a} {min(walls_a) * 1e3:.1f}ms (min) vs '
          f'{name_b} {min(walls_b) * 1e3:.1f}ms (min); '
          f'pair ratios median={med:.4f} iqr={iqr:.4f} '
          f'n={len(ratios)}', file=sys.stderr)
    print(f'# A/B {label} ratios: {[round(r, 3) for r in ratios]}',
          file=sys.stderr)
    _emit(f'ab_{label}_wall_ratio_{SUFFIX}', med,
          f'{name_a}/{name_b} wall ratio (median of interleaved pairs)',
          1.0 / med)
    return med


def bench_beta_stamps(jnp, jax, SGPConfig, restore_stamps, stamps, psf,
                      bkgs, fluxes):
    """beta-SGP (the paper's headline algorithm) with in-backtrack beta
    adaptation + lr schedule, workload hyperparameters."""
    s, b, f = (a[:BETA_BATCH] for a in (stamps, bkgs, fluxes))
    # projection_method='section': the round-5 interleaved A/B (bench.py
    # ab-beta) measured the guided-secant default 1.056x SLOWER than the
    # r3 cold sectioning on THIS batch (median of 20 pair ratios,
    # iqr 0.028, contention-immune) — the r04 beta drop was partly real.
    # KL keeps guided-secant (where the same A/B methodology measured it
    # faster); the knob is public config.
    cfg = _beta_cfg(SGPConfig, projection_method='section')
    # p1/tail retuned in round 3: (32,512)->49.1k, (28,1024)->53.1k at
    # B=6144; B=12288 needs tail 2048 (~1650 beta lanes unconverged at
    # 28). With the two-round tail, p1=26 measured 57.0k vs 57.8k at 28
    # — beta keeps 28 (its iteration tail is heavier than KL's).
    compact = dict(phase1_iters=28, tail_bucket=2048) if COMPACT else {}
    fused = jax.jit(lambda s_, p_, b_, f_: restore_stamps(
        s_, p_, b_, cfg, fluxes=f_, beta0=1.005, lr0=1e-3,
        sat_level=65000.0, flatten=True, **compact))
    wall = _min_wall(lambda: _sync(fused(s, psf, b, f)))
    rate = BETA_BATCH / wall
    _emit(f'beta_sgp_stamp_restorations_per_second_b{BETA_BATCH}_{SUFFIX}',
          rate, 'stamps/s', rate * BASELINE_BETA_STAMP_SECONDS)
    _emit_chip_only(f'beta_sgp_stamp_restorations_per_second_b{BETA_BATCH}',
                    wall, BETA_BATCH, 'dispatch', BASELINE_BETA_STAMP_SECONDS)


def _beta_cfg(SGPConfig, **kw):
    """THE beta workload config — every beta bench metric/A/B must build
    on this one helper so a hyperparameter retune can't leave a stale
    copy measuring a different workload. kw entries override."""
    base = dict(max_iter=100, stop_criterion=3, tol_convergence=1e-4,
                init_recon=2, proj_type=1, has_flux=True,
                has_sat_level=True, dtype='float32', divergence='beta',
                adapt_beta=True, schedule_lr=True, track_discr=False)
    base.update(kw)
    return SGPConfig(**base)


def bench_ab_beta_projection(jnp, jax, SGPConfig, restore_stamps, stamps,
                             psf, bkgs, fluxes, pairs=20):
    """Interleaved A/B on the BETA stamp batch: round-4 guided-secant
    projection (the default, 'bisect') vs round-3 cold K-way sectioning
    ('section'), identical configs otherwise — settles whether BENCH_r04's
    beta drop (52.7k vs r03's 58.4k) was rig contention or a projection
    regression (VERDICT r4 next-1a). Ratio < 1 means guided-secant is
    faster."""
    s, b, f = (a[:BETA_BATCH] for a in (stamps, bkgs, fluxes))
    compact = dict(phase1_iters=28, tail_bucket=2048) if COMPACT else {}

    def fused(method):
        cfg = _beta_cfg(SGPConfig, projection_method=method)
        fn = jax.jit(lambda s_, p_, b_, f_: restore_stamps(
            s_, p_, b_, cfg, fluxes=f_, beta0=1.005, lr0=1e-3,
            sat_level=65000.0, flatten=True, **compact))
        return lambda: _sync(fn(s, psf, b, f))

    _ab_ratio('beta_guided_vs_section', fused('bisect'), fused('section'),
              'guided-secant', 'r3-sectioning', pairs=pairs)


def bench_ab_split(jnp, jax, SGPConfig, restore_stamps, stamps, psf, bkgs,
                   fluxes, pairs=20):
    """Interleaved A/B on the KL stamp batch: exact f32 dense matvec
    ('matmul_flat', HIGHEST) vs the compensated split-bf16 matvec
    ('matmul_split', 3 bf16 MXU passes) — the mixed-precision lever
    VERDICT r4 next-5 asks to measure instead of assume. Fixed iteration
    count so both programs do identical work per lane (the split residual
    would otherwise shift crit-3 stop iterations and confound the wall
    comparison with workload drift)."""
    s, b, f = (a[:BATCH] for a in (stamps, bkgs, fluxes))

    def fused(op):
        cfg = SGPConfig(max_iter=25, stop_criterion=1, init_recon=2,
                        proj_type=1, has_flux=True, has_sat_level=True,
                        dtype='float32', divergence='kl',
                        track_discr=False, operator=op)
        fn = jax.jit(lambda s_, p_, b_, f_: restore_stamps(
            s_, p_, b_, cfg, fluxes=f_, sat_level=65000.0, flatten=True))
        return lambda: _sync(fn(s, psf, b, f))

    _ab_ratio('kl_split_bf16_vs_f32', fused('matmul_split'),
              fused('matmul_flat'), 'split-bf16', 'f32-exact', pairs=pairs)


def bench_ab_beta_split(jnp, jax, SGPConfig, restore_stamps, stamps, psf,
                        bkgs, fluxes, pairs=20):
    """Interleaved A/B of the compensated split-bf16 matvec on the BETA
    config (section projection, adaptation on) — the KL A/B measured the
    lever at 0.83x; beta's heavier elementwise share (pow/log chains)
    dilutes the matvec fraction, so its ratio must be measured, not
    assumed. Fixed iteration count for identical per-lane work."""
    s, b, f = (a[:BETA_BATCH] for a in (stamps, bkgs, fluxes))

    def fused(op):
        cfg = _beta_cfg(SGPConfig, projection_method='section',
                        operator=op, max_iter=25, stop_criterion=1)
        fn = jax.jit(lambda s_, p_, b_, f_: restore_stamps(
            s_, p_, b_, cfg, fluxes=f_, beta0=1.005, lr0=1e-3,
            sat_level=65000.0, flatten=True))
        return lambda: _sync(fn(s, psf, b, f))

    _ab_ratio('beta_split_bf16_vs_f32', fused('matmul_split'),
              fused('matmul_flat'), 'split-bf16', 'f32-exact', pairs=pairs)


def bench_ab_wire(np_stamps, np_psf, np_bkgs, np_fluxes, pairs=12):
    """Interleaved A/B: f32 serving stream vs u16 full-wire stream in one
    window (VERDICT r4 next-1b) — the per-pair ratio is immune to the
    window-to-window tunnel-bandwidth swings that halved the f32 stream
    number in BENCH_r04."""
    from tpu_sgp.parallel.session import RestorationSession

    sess32 = RestorationSession(np_psf)
    sess32.warmup(buckets=(256, 4 * 256))
    sess16 = RestorationSession(np_psf, ingest_dtypes=('uint16',),
                                egress_dtype='uint16')
    sess16.warmup(buckets=(256, 4 * 256))
    s32, b, f = np_stamps[:256], np_bkgs[:256], np_fluxes[:256]
    su16 = np.clip(np.rint(s32), 0, 65535).astype(np.uint16)
    f16 = su16.astype(np.float32).sum(axis=(1, 2)) - su16[0].size * b

    def stream(sess, stamps, fl):
        def run():
            for _ in sess.restore_stream(
                    ((stamps, b, fl) for _ in range(STREAM_REQ)),
                    coalesce=4):
                pass
        return run

    _ab_ratio('stream_u16_wire_vs_f32', stream(sess16, su16, f16),
              stream(sess32, s32, f), 'u16-wire', 'f32', pairs=pairs)


def bench_kl_split(jnp, jax, SGPConfig, restore_stamps, stamps, psf, bkgs,
                   fluxes):
    """KL stamps with the opt-in compensated split-bf16 matvec
    (operator='matmul_split') at the primary metric's exact workload
    config — the measured fast mode (round-5 interleaved A/B: 0.83x the
    f32-exact wall, ~2^-17 matvec residual, science quality pinned equal
    by tests/test_operator.py). Secondary metric; the primary stays
    f32-exact for round-over-round comparability."""
    cfg = SGPConfig(max_iter=100, stop_criterion=3, tol_convergence=1e-4,
                    init_recon=2, proj_type=1, has_flux=True,
                    has_sat_level=True, dtype='float32', divergence='kl',
                    operator='matmul_split', track_discr=False)
    compact = dict(phase1_iters=26, tail_bucket=2048) if COMPACT else {}
    fused = jax.jit(lambda s, p, b, f: restore_stamps(
        s, p, b, cfg, fluxes=f, sat_level=65000.0, flatten=True, **compact))
    wall = _min_wall(lambda: _sync(fused(stamps, psf, bkgs, fluxes)))
    rate = BATCH / wall
    _emit(f'kl_sgp_split_bf16_stamp_restorations_per_second_b{BATCH}'
          f'_{SUFFIX}', rate, 'stamps/s', rate * BASELINE_STAMP_SECONDS)
    _emit_chip_only(f'kl_sgp_split_bf16_stamp_restorations_per_second'
                    f'_b{BATCH}', wall, BATCH, 'dispatch',
                    BASELINE_STAMP_SECONDS)


def bench_beta_split(jnp, jax, SGPConfig, restore_stamps, stamps, psf,
                     bkgs, fluxes):
    """beta stamps with the opt-in split-bf16 matvec at the beta metric's
    exact workload config (section projection, r3 compaction constants) —
    round-5 interleaved A/B measured 0.776x the f32-exact wall (iqr
    0.004, n=20); science quality pinned equal for the beta path by
    tests/test_operator.py::test_solver_matmul_split_quality_matches_exact.
    Secondary metric; the primary beta metric stays f32-exact."""
    s, b, f = (a[:BETA_BATCH] for a in (stamps, bkgs, fluxes))
    cfg = _beta_cfg(SGPConfig, projection_method='section',
                    operator='matmul_split')
    compact = dict(phase1_iters=28, tail_bucket=2048) if COMPACT else {}
    fused = jax.jit(lambda s_, p_, b_, f_: restore_stamps(
        s_, p_, b_, cfg, fluxes=f_, beta0=1.005, lr0=1e-3,
        sat_level=65000.0, flatten=True, **compact))
    wall = _min_wall(lambda: _sync(fused(s, psf, b, f)))
    rate = BETA_BATCH / wall
    _emit(f'beta_sgp_split_bf16_stamp_restorations_per_second_b{BETA_BATCH}'
          f'_{SUFFIX}', rate, 'stamps/s', rate * BASELINE_BETA_STAMP_SECONDS)
    _emit_chip_only(f'beta_sgp_split_bf16_stamp_restorations_per_second'
                    f'_b{BETA_BATCH}', wall, BETA_BATCH, 'dispatch',
                    BASELINE_BETA_STAMP_SECONDS)


def bench_whole_frame(jnp, jax, SGPConfig):
    """410x410 whole-frame solve (reference subdivision benchmark geometry:
    PSF 31x31 != image, linear operator).

    ms/iter is timed at a FIXED 200 iterations (crit-1): the crit-3
    iteration count is f32-roundoff-chaotic across compiles (51-82
    observed for the same problem), which made the wall/iters quotient
    swing ~30% between otherwise identical builds; the per-iteration cost
    itself is iteration-count-independent, and 200 iters also dilutes the
    rig's fixed ~28 ms dispatch floor 4x better than a ~50-iter
    converged run. The crit-3 convergence behavior is still executed and
    reported on the info line (and pinned by the test suite)."""
    from tpu_sgp.simulate import synthetic_star_field
    from tpu_sgp.solvers.sgp import solve

    img, psf, _ = synthetic_star_field(410, 410, n_stars=60, psf_size=31,
                                       fwhm=3.0, seed=7)
    base = dict(init_recon=2, proj_type=1, has_flux=False,
                has_sat_level=False, dtype='float32', track_discr=False,
                warm_projection=True)
    cfg_t = SGPConfig(max_iter=200, stop_criterion=1, **base)
    cfg_c = SGPConfig(max_iter=500, stop_criterion=3,
                      tol_convergence=1e-5, **base)
    dt = jnp.float32
    gn = jax.device_put(jnp.asarray(img, dt))
    psf_d = jax.device_put(jnp.asarray(psf, dt))
    bkg = jnp.full(img.shape, 150.0, dt)
    z = jnp.zeros(img.shape, dt)

    last = {}

    def run(cfg):
        res = solve(gn, psf_d, bkg, z, 0.0, z, 1.0, 1e-3, 0.0, cfg)
        np.asarray(res.iters)
        last['res'] = res
        return res

    # iters_c comes from the timing runs themselves (a standalone read
    # would cost one redundant full whole-frame solve)
    wall_c = _min_wall(lambda: run(cfg_c))
    iters_c = int(np.asarray(last['res'].iters))
    wall_t = _min_wall(lambda: run(cfg_t))
    # same-key series (r02-comparable): converged crit-3 wall over its own
    # iteration count — includes this rig's fixed dispatch floor and the
    # f32 run-to-run iteration swing (51-74), exactly like the reference's
    # 128 ms/iter includes ITS per-call overheads at its converged count
    ms_per_iter = wall_c * 1e3 / max(iters_c, 1)
    _emit(f'whole_frame_410_ms_per_iteration_{SUFFIX}', ms_per_iter,
          'ms/iter', BASELINE_FRAME_MS_PER_ITER / ms_per_iter)
    # marginal-cost view under its own key: fixed 200 iterations amortize
    # the ~28 ms dispatch floor away (different methodology — do not
    # compare against the converged series above)
    ms_per_iter_fixed = wall_t * 1e3 / 200.0
    _emit(f'whole_frame_410_ms_per_iteration_fixed200_{SUFFIX}',
          ms_per_iter_fixed, 'ms/iter',
          BASELINE_FRAME_MS_PER_ITER / ms_per_iter_fixed)
    # chip-only companion: this run's measured dispatch floor subtracted
    # from the converged crit-3 wall (round-over-round comparable)
    floor = _FLOORS.get('dispatch')
    if floor is not None and wall_c - floor > 0:
        ms_chip = (wall_c - floor) * 1e3 / max(iters_c, 1)
        _emit(f'whole_frame_410_ms_per_iteration_chip_only_{SUFFIX}',
              ms_chip, 'ms/iter', BASELINE_FRAME_MS_PER_ITER / ms_chip)
    print(f'# whole-frame crit-3 iters={iters_c} wall={wall_c * 1e3:.1f}ms;'
          f' fixed-200 wall={wall_t * 1e3:.1f}ms', file=sys.stderr)


def bench_serving_p50(np_stamps, np_psf, np_bkgs, np_fluxes):
    """Serving-session latency at a warmed bucket (p50 over 25 calls of a
    256-stamp request through RestorationSession.restore, host round-trip
    included)."""
    from tpu_sgp.parallel.session import RestorationSession

    sess = RestorationSession(np_psf)
    sess.warmup(buckets=(256,))
    s, b, f = np_stamps[:256], np_bkgs[:256], np_fluxes[:256]
    lats = []
    for _ in range(SERVE_CALLS):
        t0 = time.perf_counter()
        sess.restore(s, b, fluxes=f)
        lats.append(time.perf_counter() - t0)
    p50 = float(np.median(lats)) * 1e3
    # baseline: the reference restores 256 stamps serially in 256*13.3ms
    _emit(f'serving_p50_latency_256_stamps_ms_{SUFFIX}', p50, 'ms',
          256 * BASELINE_STAMP_SECONDS * 1e3 / p50)
    # chip-only companion: the request-sized wire floor (upload + dispatch
    # + download of a 256x961 f32 echo, measured THIS run) subtracted —
    # BENCH_r04's p50 doubled on pure tunnel weather (VERDICT r4 weak #4)
    floor = _FLOORS.get('wire_256')
    if floor is not None and p50 - floor * 1e3 > 0:
        p50_chip = p50 - floor * 1e3
        _emit(f'serving_p50_latency_256_stamps_ms_chip_only_{SUFFIX}',
              p50_chip, 'ms', 256 * BASELINE_STAMP_SECONDS * 1e3 / p50_chip)


def bench_serving_stream(np_stamps, np_psf, np_bkgs, np_fluxes):
    """Pipelined serving throughput: 16 consecutive 256-stamp requests
    through RestorationSession.restore_stream, which dispatches request
    N+1 while request N's result transfers back — on this tunneled rig
    the per-request dispatch+transfer floor (~30 ms + ~1 MB at ~50 MB/s)
    dominates a single 256-stamp solve, so overlapping it is the whole
    win. coalesce=4 additionally folds 4 queued requests into one device
    call (dynamic batching — lanes are independent, so per-request
    results are unchanged), dividing the per-call dispatch floor by 4;
    both pipelining depths are measured and the best throughput is
    reported. Compare with the sequential p50 metric above."""
    from tpu_sgp.parallel.session import RestorationSession

    sess = RestorationSession(np_psf, ingest_dtypes=('float32', 'uint16'))
    sess.warmup(buckets=(256, 4 * 256))
    # u16 WIRE mode: u16 ingest AND per-lane-quantized u16 egress — halves
    # the bytes in BOTH directions (error bound max(x)/131070 ~ 0.5 ADU,
    # below detector digitization; see session docstring)
    sess_wire = RestorationSession(np_psf, ingest_dtypes=('uint16',),
                                   egress_dtype='uint16')
    sess_wire.warmup(buckets=(256, 4 * 256))
    # requests carry RAW CCD ADUs as uint16 (exact: the synthetic stamps
    # are quantized like a real detector would deliver them; the reference
    # workload's ccd_sat_level=65000 fits u16) — the packed request buffer
    # ships at HALF the f32 bytes, which matters exactly here: the stream
    # is upload-bound on this rig (docs/PERFORMANCE.md). The f32 stream is
    # measured alongside for the delta.
    s32, b, f = np_stamps[:256], np_bkgs[:256], np_fluxes[:256]
    su16 = np.clip(np.rint(s32), 0, 65535).astype(np.uint16)
    f16 = su16.astype(np.float32).sum(axis=(1, 2)) - su16[0].size * b
    n_req = STREAM_REQ

    def batches(stamps, fl):
        for _ in range(n_req):
            yield (stamps, b, fl)

    rates = {}
    for kind, ss, stamps, fl in (('f32', sess, s32, f),
                                 ('u16', sess, su16, f16),
                                 ('u16_wire', sess_wire, su16, f16)):
        for _ in ss.restore_stream([(stamps, b, fl)]):  # warm the path
            pass
        best = None
        for coalesce in (1, 4):
            for _ in range(3):
                t0 = time.perf_counter()
                for _res in ss.restore_stream(batches(stamps, fl),
                                              coalesce=coalesce):
                    pass
                wall = time.perf_counter() - t0
                best = wall if best is None else min(best, wall)
        rates[kind] = n_req * 256 / best
    # baseline: the reference restores stamps serially at ~13.3 ms each
    _emit(f'serving_stream_throughput_stamps_per_s_{SUFFIX}',
          rates['f32'], 'stamps/s', rates['f32'] * BASELINE_STAMP_SECONDS)
    _emit(f'serving_stream_u16_ingest_stamps_per_s_{SUFFIX}',
          rates['u16'], 'stamps/s', rates['u16'] * BASELINE_STAMP_SECONDS)
    _emit(f'serving_stream_u16_wire_stamps_per_s_{SUFFIX}',
          rates['u16_wire'], 'stamps/s',
          rates['u16_wire'] * BASELINE_STAMP_SECONDS)


def _enter_cpu_fallback():
    """Accelerator outage (the tunneled axon backend goes fully UNAVAILABLE
    for hours at a time — NOTES.md). Rather than emit nothing, fall back to
    an HONEST reduced-size CPU run: same workloads, same reference-CPU
    baselines, metric keys suffixed `_cpu_fallback` so the series is never
    confused with chip numbers. Sizes shrink so the whole fallback stays
    within a few minutes on one host core. Must run BEFORE the first jax
    import (the axon register hook ignores the env var alone, NOTES.md —
    main() also mirrors it into the config flag after importing jax)."""
    global BATCH, BETA_BATCH, N_REPEATS, SERVE_CALLS, STREAM_REQ
    global SUFFIX, COMPACT
    import os

    print('# TPU backend unavailable after the probe budget '
          '(TPU_SGP_BENCH_MAX_WAIT_S); falling back to CPU metrics '
          'with `_cpu_fallback` keys', file=sys.stderr)
    os.environ['JAX_PLATFORMS'] = 'cpu'
    SUFFIX, COMPACT = 'cpu_fallback', False
    BATCH, BETA_BATCH, N_REPEATS = 256, 256, 3
    SERVE_CALLS, STREAM_REQ = 7, 4


def main():
    # optional A/B-only modes (VERDICT r4 next-1): `bench.py ab-beta`
    # interleaves guided-secant vs r3-sectioning on the beta batch;
    # `bench.py ab-wire` interleaves the u16-wire vs f32 streams;
    # `bench.py ab` runs both. The default (no argv) full bench is what
    # the driver runs — its LAST line stays the primary metric.
    mode = sys.argv[1] if len(sys.argv) > 1 else 'full'
    if not _wait_for_backend():
        _enter_cpu_fallback()
    import jax
    if SUFFIX == 'cpu_fallback':
        jax.config.update('jax_platforms', 'cpu')
    # the tpu_sgp import below auto-enables the persistent compilation
    # cache (~/.cache/tpu_sgp/jax) on non-CPU backends: repeated bench runs
    # skip the multi-minute XLA compile
    import jax.numpy as jnp

    from tpu_sgp import SGPConfig
    from tpu_sgp.parallel.batch import restore_stamps
    from tpu_sgp.simulate import synthetic_star_stamps

    np_stamps, np_psf, np_bkgs, _ = synthetic_star_stamps(BATCH, size=31,
                                                          seed=42)
    # Workload uses catalog flux; background-subtracted sum is the analog.
    np_fluxes = np_stamps.sum(axis=(1, 2)) - 31 * 31 * np_bkgs

    stamps = jax.device_put(jnp.asarray(np_stamps, jnp.float32))
    psf = jax.device_put(jnp.asarray(np_psf, jnp.float32))
    bkgs = jax.device_put(jnp.asarray(np_bkgs, jnp.float32))
    fluxes = jax.device_put(jnp.asarray(np_fluxes, jnp.float32))

    if mode in ('ab', 'ab-beta'):
        bench_ab_beta_projection(jnp, jax, SGPConfig, restore_stamps,
                                 stamps, psf, bkgs, fluxes)
    if mode in ('ab', 'ab-split'):
        bench_ab_split(jnp, jax, SGPConfig, restore_stamps, stamps, psf,
                       bkgs, fluxes)
    if mode in ('ab', 'ab-beta-split'):
        bench_ab_beta_split(jnp, jax, SGPConfig, restore_stamps, stamps,
                            psf, bkgs, fluxes)
    if mode in ('ab', 'ab-wire'):
        bench_ab_wire(np_stamps, np_psf, np_bkgs, np_fluxes)
    if mode != 'full':
        return

    # --- secondary metrics (every line is driver-parseable JSON) ----------
    try:
        _measure_floors(jax, jnp)
    except Exception as exc:
        print(f'# floor probe failed: {exc!r}', file=sys.stderr)
    try:
        bench_beta_stamps(jnp, jax, SGPConfig, restore_stamps, stamps, psf,
                          bkgs, fluxes)
        bench_kl_split(jnp, jax, SGPConfig, restore_stamps, stamps, psf,
                       bkgs, fluxes)
        bench_beta_split(jnp, jax, SGPConfig, restore_stamps, stamps, psf,
                         bkgs, fluxes)
        bench_whole_frame(jnp, jax, SGPConfig)
        bench_serving_p50(np_stamps, np_psf, np_bkgs, np_fluxes)
        bench_serving_stream(np_stamps, np_psf, np_bkgs, np_fluxes)
    except Exception as exc:  # secondary metrics must never kill the primary
        print(f'# secondary bench failed: {exc!r}', file=sys.stderr)

    # --- primary metric (LAST line: the driver records this one) ----------
    cfg = SGPConfig(max_iter=100, stop_criterion=3, tol_convergence=1e-4,
                    init_recon=2, proj_type=1, has_flux=True,
                    has_sat_level=True, dtype='float32', divergence='kl',
                    track_discr=False)

    # On multi-chip hardware the same batch shards over all chips (the
    # dormant path on this 1-chip rig; compaction works sharded too).
    mesh = None
    if len(jax.devices()) > 1:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()), axis_names=('batch',))
        print(f'# sharding batch over {len(jax.devices())} devices',
              file=sys.stderr)

    # convergence compaction: run all lanes to ~p95 of the iteration
    # distribution, finish the tail as a small batch (bit-equal
    # schedules; ~19% measured). flatten: raveled (B, 961) stamp layout
    # (measured faster than (B, 31, 31) with the raveled projection
    # sweep); track_discr=False drops the per-iteration series scatter
    # nobody reads here. On the single-chip path the WHOLE multi-phase
    # call is fused into one program (jit over restore_stamps): the
    # phase1/gather/tail/catch-up programs each paid a per-dispatch link
    # floor (~10 ms net; a 1-iteration batched solve still costs ~59 ms
    # of fixed overhead on this rig — see NOTES.md round 3).
    if mesh is None:
        # The two tail rounds must cover the unconverged-at-p1 count with
        # compile-roundoff margin (a spill into the full-width catch-up
        # phase cost -13% before the second round existed). Round-4
        # interleaved rescan with the guided-secant projection: p1=25
        # spills past both rounds (4491 unconverged) -> 51k; 26 -> 83.3k
        # (2960 unconverged, two rounds); 27 -> 81.9k; 28+ decays. 26
        # stays the setting.
        compact = dict(phase1_iters=26, tail_bucket=2048) if COMPACT else {}
        fused = jax.jit(lambda s, p, b, f: restore_stamps(
            s, p, b, cfg, fluxes=f, sat_level=65000.0, flatten=True,
            **compact))

        def run():
            return _sync(fused(stamps, psf, bkgs, fluxes))
    else:
        def run():
            return _sync(restore_stamps(stamps, psf, bkgs, cfg,
                                        fluxes=fluxes, sat_level=65000.0,
                                        phase1_iters=31, tail_bucket=512,
                                        flatten=True, mesh=mesh))

    last = {}

    def timed():
        last['res'] = run()

    wall = _min_wall(timed, verbose=True)
    res = last['res']
    iters = np.asarray(res.iters)
    stamps_per_s = BATCH / wall
    print(f'# batch={BATCH} wall={wall * 1e3:.1f}ms '
          f'iters median={int(np.median(iters))} max={int(iters.max())} '
          f'finite={bool(np.isfinite(np.asarray(res.x)).all())}',
          file=sys.stderr)
    _emit_chip_only(f'kl_sgp_stamp_restorations_per_second_b{BATCH}',
                    wall, BATCH, 'dispatch', BASELINE_STAMP_SECONDS)
    # primary metric LAST (the driver records the final line)
    _emit(f'kl_sgp_stamp_restorations_per_second_b{BATCH}_{SUFFIX}',
          stamps_per_s, 'stamps/s', stamps_per_s * BASELINE_STAMP_SECONDS)


if __name__ == '__main__':
    main()
