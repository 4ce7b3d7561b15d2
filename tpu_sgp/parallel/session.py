"""Serving session: pre-compiled batched restoration with stable shapes.

Production deployments restore streams of cutouts with a fixed PSF and
configuration; this wrapper owns the config, pins the device-resident PSF,
pre-compiles the bucketed batch shapes once at startup (warmup), and then
serves ``restore(stamps, ...)`` calls at device speed with no compile or
shape surprises.
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SGPConfig
from ..solvers.sgp import SGPResult
from .batch import _pad_args_to_bucket, restore_stamps


def _split_result(res: SGPResult, sizes) -> list:
    """Slice a coalesced host-side SGPResult back into per-request results
    (shared by restore_stream and MicroBatchServer so the re-split rule
    cannot drift between them)."""
    out, off = [], 0
    for n in sizes:
        out.append(SGPResult(*(f[off:off + n] for f in res)))
        off += n
    return out


class RestorationSession:
    def __init__(self, psf: np.ndarray, cfg: Optional[SGPConfig] = None,
                 stamp_shape: Tuple[int, int] = (31, 31),
                 sat_level: float = 65000.0, beta0: float = 1.005,
                 lr0: float = 1e-3, mesh=None, batch_axis: str = 'batch',
                 phase1_iters: Optional[int] = None,
                 tail_bucket: int = 512,
                 ingest_dtypes: Tuple[str, ...] = ('float32',),
                 egress_dtype: str = 'float32'):
        """``phase1_iters`` enables convergence compaction for served
        batches larger than ``tail_bucket`` (single-device sessions):
        measure your workload's iteration distribution once and pass ~its
        p95 — a bad estimate costs time, never correctness. Kept explicit
        (not auto-tuned) so ``warmup`` pre-compiles the exact programs
        serving will run; an adaptive cap would recompile at serve time.

        ``batch_axis`` names the mesh axis the served batch shards over
        (meshes whose axes are not named 'batch' need it forwarded).

        ``ingest_dtypes`` lists the request dtypes ``warmup`` pre-compiles
        for: 'float32' and/or 'uint16'. uint16 requests (raw CCD ADUs —
        the reference workload's ccd_sat_level=65000 fits u16 exactly,
        application_sgp_star_stamps.py:23) ship HALF the upload bytes of
        the f32 packed buffer: the stamp block stays u16 end-to-end and
        the three f32 sidecar columns (bkg/flux/beta) ride bit-cast as
        u16 pairs, so the whole request is still ONE buffer; the device
        converts to f32 after the transfer (exact: integers <= 65535 are
        f32-representable). Serving streams on transfer-bound links are
        upload-limited, so this is the dynamic-batching lever's sibling
        (docs/PERFORMANCE.md).

        ``egress_dtype='uint16'`` applies the same lever to the RESULT
        buffer: each restored stamp ships as uint16 on a per-lane affine
        grid (q = round(x * 65535 / max(x)); the f32 scale rides in the
        sidecar) and is dequantized to f32 host-side, at half the
        download bytes. Quantization error is bounded by max(x)/131070
        per pixel — ~0.5 ADU for a saturation-range stamp, below the
        detector's own digitization, and orders of magnitude below
        photon noise. Opt-in, packed single-device path only (the plain
        path — meshes, background maps, track_discr — always returns
        full f32)."""
        if cfg is None:
            # serving reads x/iters, never the per-iteration series:
            # track_discr=False drops a (B, max_iter+1) scatter per
            # iteration AND the series' result-transfer bytes
            cfg = SGPConfig(max_iter=100, stop_criterion=3,
                            tol_convergence=1e-4, init_recon=2, proj_type=1,
                            has_flux=True, has_sat_level=True,
                            dtype='float32', track_discr=False)
        self.cfg = cfg
        self.psf = jnp.asarray(psf, cfg.jnp_dtype)
        self.stamp_shape = tuple(stamp_shape)
        self.sat_level = sat_level
        self.beta0 = beta0
        self.lr0 = lr0
        self.mesh = mesh
        self.batch_axis = batch_axis
        self.phase1_iters = phase1_iters
        self.tail_bucket = tail_bucket
        # flat (B, H*W) stamp layout whenever the dense shared-PSF matmul
        # operator applies: a (B, 31, 31) batch tiles with a 4.3x pad that
        # every elementwise pass pays (see restore_stamps(flatten=...));
        # sessions always hold ONE shared PSF, so only the operator family
        # gates it
        from ..ops.psf_operator import _MATMUL_MAX_PIXELS
        self.flatten = (self.psf.size <= _MATMUL_MAX_PIXELS
                        and cfg.operator in ('auto', 'matmul',
                                             'matmul_flat')
                        and self.psf.shape == self.stamp_shape)
        self.ingest_dtypes = tuple(ingest_dtypes)
        for d in self.ingest_dtypes:
            if d not in ('float32', 'uint16'):
                raise ValueError(f'ingest_dtypes entries must be float32 '
                                 f'or uint16, got {d!r}')
        if egress_dtype not in ('float32', 'uint16'):
            raise ValueError(f'egress_dtype must be float32 or uint16, '
                             f'got {egress_dtype!r}')
        self.egress_dtype = egress_dtype
        self._warmed: set = set()   # {(bucket, kind)} with kind in
                                    # {'packed', 'packed-u16', 'plain'}
        self._warming = False  # warmup() in progress: its own calls must
                               # not trigger the not-warmed warning
        # single-device sessions run the PACKED path: every per-request
        # host->device array costs a full link round trip (~29 ms floor on
        # the tunneled dev box, 4 arrays = 167 ms where one packed buffer
        # = 76 ms), and every result field read back costs another — so
        # the request ships as ONE (bucket, H*W+3) buffer into ONE jitted
        # program (which also fuses the solve's phases into a single
        # dispatch) returning ONE packed result buffer.
        self._packed_progs: dict = {}

    def warmup(self, buckets: Sequence[int] = (64, 128, 256, 512, 768,
                                               1024),
               max_batch: Optional[int] = None) -> None:
        """Compile the solver for each bucket size ahead of serving.

        The defaults cover every bucket the padding policy produces for
        batches of 33..1024 (powers of two up to 256, then multiples of
        256; on a mesh, each rounded up to the device count). Pass
        ``max_batch`` to instead warm EVERY bucket the padding policy can
        produce for batches 1..max_batch — the safe choice when the
        serving batch-size ceiling is known. A request landing in a
        non-warmed bucket still works but pays a full solver compile at
        serve time (the session warns when that happens).

        Requested ``buckets`` values are normalized onto the padding
        policy's actual bucket grid — each value warms the smallest
        policy-producible bucket >= it, i.e. the bucket a batch of that
        size is actually served through. Warming the raw values would
        compile sizes the policy never routes a request to (wasted
        compiles) and, on a mesh, sizes not divisible by the device count
        (the sharded ``device_put`` rejects those outright). Each
        normalized bucket is then compiled at EXACTLY its own size (the
        dummy batch bypasses the policy): re-padding a bucket value would
        double-round it — e.g. a 6-device mesh produces bucket 6 for
        batches 1..2, but a size-6 dummy would itself pad to 12, so
        bucket 6 would never be warmed."""
        from .batch import _bucket_target
        if max_batch is not None:
            buckets = sorted({_bucket_target(b, self.mesh)
                              for b in range(1, max_batch + 1)})
        elif buckets:
            grid = sorted({_bucket_target(b, self.mesh)
                           for b in range(1, max(buckets) + 1)})
            buckets = sorted({next(g for g in grid if g >= b)
                              for b in buckets})
        h, w = self.stamp_shape
        self._warming = True
        try:
            for b in buckets:
                for kind in self.ingest_dtypes:
                    dummy = np.full((b, h, w), 100.0)
                    dummy[:, h // 2, w // 2] = 1000.0
                    if kind == 'uint16':
                        dummy = dummy.astype(np.uint16)
                    self._finish(self._restore_padded(
                        dummy, np.full(b, 100.0),
                        fluxes=(np.full(b, 900.0) if self.cfg.has_flux
                                else None),
                        _exact=True))
        finally:
            self._warming = False

    def _packed_prog(self, bucket: int, kind: str = 'packed'):
        prog = self._packed_progs.get((bucket, kind))
        if prog is not None:
            return prog
        h, w = self.stamp_shape
        n = h * w
        cfg = self.cfg
        dt = cfg.jnp_dtype

        def fn(packed):
            if kind == 'packed-u16':
                # stamp block: raw u16 ADUs -> f32 on device (exact);
                # sidecar: 3 f32 columns bit-cast as u16 pairs
                stamps = packed[:, :n].astype(dt).reshape(bucket, h, w)
                side = jax.lax.bitcast_convert_type(
                    packed[:, n:].reshape(bucket, 3, 2), jnp.float32
                ).astype(dt)
                bkgs, flux_col, beta0 = side[:, 0], side[:, 1], side[:, 2]
            else:
                stamps = packed[:, :n].reshape(bucket, h, w)
                bkgs, flux_col, beta0 = (packed[:, n], packed[:, n + 1],
                                         packed[:, n + 2])
            fluxes = flux_col if cfg.has_flux else None
            res = restore_stamps(
                stamps, self.psf, bkgs, cfg, fluxes=fluxes, beta0=beta0,
                lr0=self.lr0, sat_level=self.sat_level, bucket=False,
                phase1_iters=self.phase1_iters,
                tail_bucket=self.tail_bucket, flatten=self.flatten)
            x = res.x.reshape(bucket, -1)
            side = [jnp.broadcast_to(
                jnp.asarray(f, dt).reshape(-1, 1) if jnp.ndim(f)
                else jnp.full((bucket, 1), f, dt), (bucket, 1))
                for f in (res.iters, res.fv, res.beta, res.scaling)]
            if self.egress_dtype == 'uint16':
                # per-lane affine quantization of the restored stamp
                # (x >= 0 by the projection, so the grid needs no offset):
                # q*scale recovers x to within max(x)/131070 per pixel.
                # The f32 sidecar (scale + the 4 scalars) rides bit-cast
                # as u16 pairs so the whole result is ONE u16 buffer at
                # half the f32 download bytes.
                xm = jnp.max(x, axis=1, keepdims=True)
                scale = jnp.where(xm > 0, xm, 1.0).astype(jnp.float32) \
                    / 65535.0
                q = jnp.clip(jnp.round(x / scale), 0, 65535).astype(
                    jnp.uint16)
                side_f32 = jnp.concatenate(
                    [scale] + side, axis=1).astype(jnp.float32)
                side_u16 = jax.lax.bitcast_convert_type(
                    side_f32, jnp.uint16).reshape(bucket, 10)
                return jnp.concatenate([q, side_u16], axis=1)
            return jnp.concatenate([x] + side, axis=1)

        prog = jax.jit(fn)
        self._packed_progs[(bucket, kind)] = prog
        return prog

    def _pack_request(self, stamps, bkgs, fluxes, beta0):
        b, h, w = stamps.shape
        if stamps.dtype == np.uint16:
            # ONE u16 buffer: stamp block verbatim + the three f32
            # sidecar columns bit-cast to u16 pairs (device bitcast
            # restores them exactly) — half the upload bytes of the f32
            # layout without a second host->device array (each array
            # costs a full link round trip on tunneled rigs, NOTES.md)
            side = np.empty((b, 3), np.float32)
            side[:, 0] = bkgs
            side[:, 1] = 0.0 if fluxes is None else fluxes
            side[:, 2] = self.beta0 if beta0 is None else beta0
            packed = np.empty((b, h * w + 6), np.uint16)
            packed[:, :h * w] = stamps.reshape(b, -1)
            packed[:, h * w:] = side.view(np.uint16)
            return packed, 'packed-u16'
        dt = np.dtype(self.cfg.dtype)
        packed = np.empty((b, h * w + 3), dt)
        packed[:, :h * w] = stamps.reshape(b, -1)
        packed[:, h * w] = bkgs
        packed[:, h * w + 1] = 0.0 if fluxes is None else fluxes
        packed[:, h * w + 2] = (self.beta0 if beta0 is None else beta0)
        return packed, 'packed'

    def _unpack_result(self, out: np.ndarray, b: int, h: int,
                       w: int) -> SGPResult:
        n = h * w
        if self.egress_dtype == 'uint16':
            side = np.ascontiguousarray(out[:b, n:n + 10]).view(np.float32)
            x = (out[:b, :n].astype(np.float32)
                 * side[:, :1]).reshape(b, h, w)
            iters = side[:, 1].astype(np.int32)
            fv, beta, scaling = side[:, 2], side[:, 3], side[:, 4]
            z = np.zeros((b, 1), np.float32)
            return SGPResult(x=x, iters=iters, discr=z, err=z, beta=beta,
                             fv=fv, scaling=scaling)
        x = out[:b, :n].reshape(b, h, w)
        iters = out[:b, n].astype(np.int32)
        fv = out[:b, n + 1]
        beta = out[:b, n + 2]
        scaling = out[:b, n + 3]
        z = np.zeros((b, 1), out.dtype)
        return SGPResult(x=x, iters=iters, discr=z, err=z, beta=beta,
                         fv=fv, scaling=scaling)

    def _restore_padded(self, stamps, bkgs, fluxes=None, beta0=None,
                        _exact=False):
        """Dispatch (non-blocking): host-pad to a bucket size and run the
        pre-compiled batch program. Returns (device SGPResult at bucket
        size, original batch size). Padding host-side matters: eager device
        ops at arbitrary pre-pad sizes each compile-and-load a new tiny
        program, which costs seconds per novel batch size on tunneled
        backends. ``_exact`` (warmup only) takes the batch size as the
        bucket itself instead of running it through the padding policy."""
        stamps = np.asarray(stamps)
        if stamps.shape[1:] != self.stamp_shape:
            raise ValueError(
                f'stamps {stamps.shape[1:]} != session {self.stamp_shape}')
        if _exact:
            b = stamps.shape[0]
        else:
            (stamps, bkgs, fluxes, _, _, beta0, _, _, _), b = \
                _pad_args_to_bucket(self.mesh, stamps, bkgs, fluxes=fluxes,
                                    beta0=beta0)
        bucket = stamps.shape[0]
        kind = 'plain'
        if (self.mesh is None and not self.cfg.track_discr
                and not self.cfg.errflag and np.ndim(bkgs) <= 1):
            kind = ('packed-u16' if stamps.dtype == np.uint16 else 'packed')
        if (bucket, kind) not in self._warmed \
                and not getattr(self, '_warming', False):
            import warnings
            warnings.warn(
                f'RestorationSession: batch {b} pads to bucket {bucket} '
                f'({kind}), which was not warmed (warmed: '
                f'{sorted(self._warmed)}) — this request pays a full '
                f'solver compile. Warm it with warmup(buckets=[{bucket}]) '
                f'or warmup(max_batch=...) (u16 requests need '
                f"ingest_dtypes=('uint16',)).",
                stacklevel=3)
        if self.cfg.has_flux and fluxes is None:
            # fail HERE like restore_stamps does — the packed layout would
            # otherwise silently substitute flux 0 and serve identically
            # zero reconstructions
            raise ValueError('cfg.has_flux=True but fluxes=None: every '
                             'reconstruction would be identically zero')
        if kind != 'plain':
            # packed single-device fast path: one H2D, one program, one
            # D2H. Per-pixel background MAPS don't fit the packed layout —
            # they take the plain multi-array path below.
            packed, kind = self._pack_request(np.asarray(stamps), bkgs,
                                              fluxes, beta0)
            out = self._packed_prog(bucket, kind)(packed)
            self._warmed.add((bucket, kind))
            return ('packed', out), b
        if stamps.dtype == np.uint16:
            stamps = stamps.astype(self.cfg.dtype)
        res = restore_stamps(
            stamps, self.psf, bkgs, self.cfg, fluxes=fluxes,
            beta0=self.beta0 if beta0 is None else beta0, lr0=self.lr0,
            sat_level=self.sat_level, mesh=self.mesh,
            batch_axis=self.batch_axis, bucket=False,
            phase1_iters=self.phase1_iters, tail_bucket=self.tail_bucket,
            flatten=self.flatten)
        # only after the solve dispatched successfully — a failed request
        # must not register its bucket as warmed
        self._warmed.add((bucket, 'plain'))
        return ('plain', res), b

    def _finish(self, pending) -> SGPResult:
        """Force completion of a ``_restore_padded`` dispatch and unwrap to
        host arrays (the np.asarray transfer IS the synchronization —
        block_until_ready is a no-op on some tunneled backends). Slices the
        bucket padding off host-side; shared by restore(), restore_stream()
        and warmup() so the unwrap rule cannot drift between them."""
        (kind, res), b = pending
        if kind == 'packed':
            h, w = self.stamp_shape
            return self._unpack_result(np.asarray(res), b, h, w)
        return SGPResult(*(np.asarray(f)[:b] for f in res))

    def restore(self, stamps, bkgs, fluxes=None, beta0=None) -> SGPResult:
        """Restore a batch. Any batch size whose pad bucket was warmed
        reuses compiled device programs (the default warmup covers all
        buckets for 33..1024); the padding is sliced off host-side after
        one transfer. Returns an SGPResult of NumPy arrays (serving results
        live on the host)."""
        return self._finish(self._restore_padded(stamps, bkgs,
                                                 fluxes=fluxes,
                                                 beta0=beta0))

    @staticmethod
    def _unpack_request(item):
        """A stream request is (stamps, bkgs, fluxes) or
        (stamps, bkgs, fluxes, beta0)."""
        if len(item) == 3:
            return item[0], item[1], item[2], None
        stamps, bkgs, fluxes, beta0 = item
        return stamps, bkgs, fluxes, beta0

    def _coalesce_group(self, group):
        """Concatenate a list of request tuples into one batch. Exact by
        construction: every lane of a batched solve is independent (the
        per-stamp bkg/flux/beta columns travel with the lane), so K
        requests solved as one bucket produce the same per-request
        results as K separate solves. Returns (sizes, stamps, bkgs,
        fluxes, beta0) with sizes the per-request batch lengths for
        re-splitting."""
        sizes, all_s, all_b, all_f, all_bt = [], [], [], [], []
        for item in group:
            stamps, bkgs, fluxes, beta0 = self._unpack_request(item)
            stamps = np.asarray(stamps)
            if stamps.shape[1:] != self.stamp_shape:
                raise ValueError(f'stamps {stamps.shape[1:]} != session '
                                 f'{self.stamp_shape}')
            n = stamps.shape[0]
            bkgs = np.asarray(bkgs)
            if bkgs.ndim > 1:
                raise ValueError('per-pixel background maps cannot be '
                                 'coalesced across requests; use coalesce=1')
            sizes.append(n)
            all_s.append(stamps)
            all_b.append(np.broadcast_to(bkgs, (n,)))
            all_f.append(fluxes if fluxes is None
                         else np.broadcast_to(np.asarray(fluxes), (n,)))
            all_bt.append(np.broadcast_to(np.asarray(
                self.beta0 if beta0 is None else beta0,
                self.cfg.dtype), (n,)))
        has_f = [f is not None for f in all_f]
        if any(has_f) != all(has_f):
            raise ValueError('cannot coalesce requests with and without '
                             'fluxes in one group; use coalesce=1')
        fluxes = np.concatenate(all_f) if all(has_f) else None
        return (sizes, np.concatenate(all_s), np.concatenate(all_b), fluxes,
                np.concatenate(all_bt))

    def restore_stream(self, batches: Iterable, lookahead: int = 2,
                       coalesce: int = 1) -> Iterable[SGPResult]:
        """Generator over (stamps, bkgs, fluxes) or (stamps, bkgs, fluxes,
        beta0) tuples — pipelines up to ``lookahead`` device calls ahead of
        the one being consumed, and optionally coalesces ``coalesce``
        consecutive requests into one device call (results are re-split,
        one SGPResult per input request, in order). ``beta0`` is the
        per-request divergence parameter (scalar or per-stamp; defaults to
        the session's).

        The upload+dispatch stage runs on a worker thread: a request's
        host->device transfer BLOCKS the dispatching thread on tunneled
        links, so interleaving it inline with result readbacks serialized
        the stream (measured SLOWER than sequential restore() calls).
        With the stage on its own thread the link runs full duplex —
        request N+1 uploads while request N's result downloads — and the
        throughput approaches the slowest single stage instead of their
        sum.

        ``coalesce`` is the dynamic-batching lever: every device call pays
        a fixed per-program dispatch floor (tens of ms on tunneled rigs,
        see NOTES.md) regardless of batch size, so folding K small
        requests into one call divides that floor by K. Lanes are
        independent, so coalescing never changes per-request results —
        only latency shape (the first request of a group waits for its
        group to fill and solve). Warm the coalesced bucket sizes
        (e.g. ``warmup(buckets=[coalesce * request_size])``) or the first
        group pays a compile."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        coalesce = max(1, int(coalesce))

        def dispatch(group):
            if len(group) == 1:
                stamps, bkgs, fluxes, beta0 = self._unpack_request(group[0])
                sizes = [np.asarray(stamps).shape[0]]
                return sizes, self._restore_padded(stamps, bkgs,
                                                   fluxes=fluxes,
                                                   beta0=beta0)
            sizes, stamps, bkgs, fluxes, beta0 = self._coalesce_group(group)
            return sizes, self._restore_padded(stamps, bkgs, fluxes=fluxes,
                                               beta0=beta0)

        def finish_split(fut):
            sizes, pending = fut.result()
            yield from _split_result(self._finish(pending), sizes)

        inflight: deque = deque()
        group: list = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            for item in batches:
                group.append(item)
                if len(group) < coalesce:
                    continue
                inflight.append(pool.submit(dispatch, group))
                group = []
                while len(inflight) > max(1, int(lookahead)):
                    yield from finish_split(inflight.popleft())
            if group:
                inflight.append(pool.submit(dispatch, group))
            while inflight:
                yield from finish_split(inflight.popleft())


class MicroBatchServer:
    """Thread-safe micro-batching front-end over a ``RestorationSession``.

    Production serving rarely sees one well-sized batch per call: many
    concurrent clients each hold a handful of cutouts, and every device
    call pays a fixed dispatch floor regardless of batch size. This server
    lets any number of threads ``submit()`` independent requests; a single
    background worker drains the queue, coalesces up to ``max_batch``
    stamps into ONE device call (waiting at most ``max_delay_s`` after the
    first queued request for stragglers), and fulfils each caller's Future
    with its own slice of the result. Lanes of a batched solve are
    independent, so coalescing never changes per-request results — only
    the latency/throughput trade (``max_delay_s=0`` serves each drain of
    the queue immediately; larger values fill bigger batches).

    Request validation (stamp shape, flux presence, background kind)
    happens in ``submit`` on the CALLER's thread, so a malformed request
    raises immediately at the call site and can never poison a batch that
    other clients are riding in. A solver failure is broadcast to every
    future of its batch.

    Warm the session for the buckets the server will produce
    (``session.warmup(buckets=[...])`` covering up to ``max_batch``), or
    the first batch of a novel size pays a compile.
    """

    def __init__(self, session: RestorationSession, max_batch: int = 1024,
                 max_delay_s: float = 0.002,
                 max_batches_per_process: Optional[int] = None,
                 rss_limit_mb: Optional[float] = None,
                 on_limit=None):
        """``max_batches_per_process`` / ``rss_limit_mb`` arm the
        leak watchdog: the axon TPU plugin leaks ~1 MB of host RSS per
        device call (NOTES.md bisection — plugin-side, not repo buffers),
        so a long-lived server must recycle its worker process
        periodically. After each served batch the watchdog checks both
        limits; on the first crossing it sets ``recycle_recommended`` and
        calls ``on_limit(stats_dict)`` (default: a structured
        ``ResourceWarning``). The server keeps serving — draining and
        restarting the process is the supervisor's job (see
        docs/DEPLOYMENT.md 'Serving process recycling'); ``drain()``
        blocks until the queue is empty so the handoff loses nothing."""
        import threading

        if max_batch < 1:
            raise ValueError(f'max_batch={max_batch} must be >= 1')
        self.session = session
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_s)
        self.max_batches_per_process = max_batches_per_process
        self.rss_limit_mb = rss_limit_mb
        self.on_limit = on_limit
        self.recycle_recommended = False
        from collections import deque
        self._lock = threading.Condition()
        self._queue: deque = deque()    # [(future, request_tuple, n), ...]
        self._closed = False
        self._idle = threading.Event()
        self._idle.set()
        self.batches_served = 0         # observability: device calls made
        self.requests_served = 0
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name='tpu-sgp-microbatch')
        self._worker.start()

    @staticmethod
    def process_rss_mb() -> float:
        """Current resident set size of this process in MB (0.0 where
        /proc is unavailable)."""
        try:
            import os
            with open('/proc/self/statm') as f:
                pages = int(f.read().split()[1])
            return pages * os.sysconf('SC_PAGE_SIZE') / 1e6
        except (OSError, ValueError, IndexError):
            return 0.0

    def watchdog_stats(self) -> dict:
        return {'batches_served': self.batches_served,
                'requests_served': self.requests_served,
                'rss_mb': self.process_rss_mb(),
                'max_batches_per_process': self.max_batches_per_process,
                'rss_limit_mb': self.rss_limit_mb,
                'recycle_recommended': self.recycle_recommended}

    def _check_watchdog(self) -> None:
        if self.recycle_recommended:
            return                      # fire once per crossing
        hit = (self.max_batches_per_process is not None
               and self.batches_served >= self.max_batches_per_process)
        rss = None
        if not hit and self.rss_limit_mb is not None:
            rss = self.process_rss_mb()
            hit = rss > self.rss_limit_mb
        if not hit:
            return
        self.recycle_recommended = True
        stats = self.watchdog_stats()
        if self.on_limit is not None:
            try:
                self.on_limit(stats)
            except Exception:           # noqa: BLE001 — watchdog must not
                pass                    # kill the serving worker
        else:
            import warnings
            warnings.warn(
                f'MicroBatchServer watchdog: recycle recommended after '
                f'{stats["batches_served"]} device calls '
                f'(rss={stats["rss_mb"]:.0f} MB) — the axon plugin leaks '
                f'~1 MB host RSS per call (NOTES.md); drain() and restart '
                f'the serving process (docs/DEPLOYMENT.md).',
                ResourceWarning, stacklevel=2)

    def drain(self, timeout: Optional[float] = None) -> bool:
        """Block until every queued request has been served (the server
        stays open). Returns False on timeout. New submissions during a
        drain extend it — pause producers first for a recycle handoff."""
        import time as _time
        deadline = None if timeout is None else _time.monotonic() + timeout
        while True:
            with self._lock:
                empty = not self._queue
            if empty and self._idle.wait(
                    timeout=None if deadline is None
                    else max(0.0, deadline - _time.monotonic())):
                with self._lock:
                    if not self._queue:
                        return True
            if deadline is not None and _time.monotonic() >= deadline:
                return False

    # -- client side -------------------------------------------------------
    def submit(self, stamps, bkgs, fluxes=None, beta0=None):
        """Enqueue one request; returns a ``concurrent.futures.Future``
        resolving to its SGPResult. Validation errors raise HERE, on the
        caller's thread."""
        from concurrent.futures import Future

        stamps = np.asarray(stamps)
        if stamps.ndim != 3 or stamps.shape[1:] != self.session.stamp_shape:
            raise ValueError(f'stamps {stamps.shape} != (N,) + session '
                             f'{self.session.stamp_shape}')
        if np.ndim(bkgs) > 1:
            raise ValueError('per-pixel background maps cannot be '
                             'micro-batched; use session.restore directly')
        if self.session.cfg.has_flux and fluxes is None:
            raise ValueError('cfg.has_flux=True but fluxes=None: every '
                             'reconstruction would be identically zero')
        if not self.session.cfg.has_flux:
            fluxes = None               # uniform group: solver ignores them
        # length mismatches must also fail HERE — on the worker they would
        # surface inside _coalesce_group and be broadcast to every
        # co-batched client's Future
        n = stamps.shape[0]
        for name, a in (('bkgs', bkgs), ('fluxes', fluxes),
                        ('beta0', beta0)):
            if a is None:
                continue
            try:
                np.broadcast_to(np.asarray(a), (n,))
            except ValueError:
                raise ValueError(f'{name} shape {np.shape(a)} does not '
                                 f'broadcast to the {n}-stamp request')
        fut = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError('MicroBatchServer is closed')
            self._queue.append((fut, (stamps, bkgs, fluxes, beta0),
                                stamps.shape[0]))
            self._lock.notify()
        return fut

    def restore(self, stamps, bkgs, fluxes=None, beta0=None) -> SGPResult:
        """Blocking convenience wrapper: submit + wait."""
        return self.submit(stamps, bkgs, fluxes=fluxes,
                           beta0=beta0).result()

    # -- worker side -------------------------------------------------------
    def _take_batch(self):
        """Block for the first request, then keep draining until the batch
        is full or ``max_delay_s`` has passed since the first item."""
        import time as _time

        with self._lock:
            while not self._queue and not self._closed:
                self._lock.wait()
            if not self._queue:
                return None             # closed and drained
            # the first request is always taken, even when it alone
            # exceeds max_batch (an oversized request serves solo — the
            # bucket padding policy handles any size)
            item = self._queue.popleft()
            batch, total = [item], item[2]
            deadline = _time.monotonic() + self.max_delay_s
            while total < self.max_batch:
                if self._queue:
                    if total + self._queue[0][2] > self.max_batch:
                        break           # next request would overflow
                    item = self._queue.popleft()
                    batch.append(item)
                    total += item[2]
                    continue
                if self._closed:
                    break
                left = deadline - _time.monotonic()
                if left <= 0:
                    break
                self._lock.wait(timeout=left)
                if not self._queue:
                    break               # timed out (or spurious) and empty
            # still under the lock: a drain() that sees the queue empty
            # must also see the worker busy until this batch is served
            self._idle.clear()
            return batch

    def _run(self):
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            # a future cancelled while queued must be dropped here (the
            # standard transition: False = already cancelled); otherwise
            # set_result on it would raise InvalidStateError and poison
            # the whole batch's other clients
            batch = [item for item in batch
                     if item[0].set_running_or_notify_cancel()]
            if not batch:
                continue
            futs = [f for f, _, _ in batch]
            try:
                group = [req for _, req, _ in batch]
                sizes, stamps, bkgs, fluxes, beta0 = \
                    self.session._coalesce_group(group)
                res = self.session._finish(self.session._restore_padded(
                    stamps, bkgs, fluxes=fluxes, beta0=beta0))
                parts = _split_result(res, sizes)
                # counters BEFORE resolving: a client woken by its result
                # must observe them already updated
                self.batches_served += 1
                self.requests_served += len(batch)
                for fut, part in zip(futs, parts):
                    fut.set_result(part)
            except BaseException as exc:  # noqa: BLE001 — broadcast to batch
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(exc)
            finally:
                self._check_watchdog()
                self._idle.set()

    # -- lifecycle ---------------------------------------------------------
    def close(self, timeout: float = 60.0) -> None:
        """Stop accepting requests, serve everything already queued, join
        the worker. Idempotent."""
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._worker.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
