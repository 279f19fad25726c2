"""Serving runtime: request queue + step-level continuous batching.

Nothing like this exists in the reference (single-user ComfyUI graph
executor); this is the production-serving layer SURVEY.md §7.10 calls for.

Diffusion requests are iterative (N denoise steps over a latent), so the
natural continuous-batching unit is the *denoise step*: the engine keeps a
pool of in-flight requests, each with its own sigma cursor, stacks them
into a fixed-size batch bucket (padding with replica lanes so jit never
sees a new shape), runs ONE jitted step for the whole batch, retires
finished requests and admits queued ones between steps. Per-sample sigmas
make mixed-progress batches exact, not approximate.

The engine is model-agnostic: it drives a ``step_fn(x, s_cur, s_next,
cond) -> x_next`` supplied by the pipeline layer.
"""

from __future__ import annotations

import dataclasses
import itertools
import logging
import queue
import threading
import time
from typing import Any, Callable

import numpy as np

log = logging.getLogger(__name__)


@dataclasses.dataclass
class GenRequest:
    """One generation job (fixed resolution bucket + schedule)."""

    request_id: int
    latent: np.ndarray  # (H, W, C) initial noise
    cond: Any  # conditioning pytree (text embeddings, pooled, guidance)
    sigmas: np.ndarray  # (steps+1,) descending to 0
    submitted_at: float = dataclasses.field(default_factory=time.monotonic)
    step: int = 0
    done_event: threading.Event = dataclasses.field(
        default_factory=threading.Event)
    result: np.ndarray | None = None
    error: Exception | None = None
    cancelled: bool = False
    completed_at: float | None = None  # monotonic; for latency percentiles
    aux: Any = None  # per-request sampler state (multistep engines)

    @property
    def latency_s(self) -> float | None:
        return (None if self.completed_at is None
                else self.completed_at - self.submitted_at)

    def cancel(self):
        """Drop the request at the next engine tick (no partial result)."""
        self.cancelled = True

    @property
    def finished(self) -> bool:
        return self.step >= len(self.sigmas) - 1


@dataclasses.dataclass
class EngineStats:
    """Observability counters (role: metrics subsystem, SURVEY.md §5)."""

    submitted: int = 0
    completed: int = 0
    failed: int = 0
    cancelled: int = 0
    steps_executed: int = 0
    batches_executed: int = 0
    total_padding_lanes: int = 0
    total_step_time_s: float = 0.0
    total_latency_s: float = 0.0

    @property
    def mean_batch_occupancy(self) -> float:
        lanes = self.steps_executed + self.total_padding_lanes
        return self.steps_executed / lanes if lanes else 0.0

    @property
    def steps_per_second(self) -> float:
        return (self.steps_executed / self.total_step_time_s
                if self.total_step_time_s else 0.0)

    def snapshot(self) -> dict:
        return {
            "submitted": self.submitted,
            "completed": self.completed,
            "failed": self.failed,
            "cancelled": self.cancelled,
            "steps_executed": self.steps_executed,
            "batches_executed": self.batches_executed,
            "mean_batch_occupancy": round(self.mean_batch_occupancy, 3),
            "steps_per_second": round(self.steps_per_second, 3),
            "mean_latency_s": round(
                self.total_latency_s / self.completed, 4
            ) if self.completed else None,
        }


class ContinuousBatchEngine:
    """Step-level continuous batcher over a jitted denoise step.

    step_fn(x (B,H,W,C), s_cur (B,), s_next (B,), cond) -> x_next. The cond
    pytree must be stackable along axis 0 (the pipeline pads text to a
    fixed length per bucket).
    """

    def __init__(self, step_fn: Callable, max_batch: int = 4,
                 batch_sizes: tuple[int, ...] | None = None,
                 pipeline_depth: int = 1,
                 on_step: Callable | None = None,
                 aux_init: Callable | None = None):
        self.step_fn = step_fn
        # aux_init(latent) -> per-request sampler-state pytree. When set,
        # step_fn takes (x, s_cur, s_next, cond, aux) and returns
        # (x_next, aux_next) — aux is stacked/unstacked along axis 0 like
        # the latents and stays device-resident (multistep samplers keep
        # per-LANE history, so mixed-progress pools stay exact).
        self.aux_init = aux_init
        # on_step(requests) fires after every dispatched step with the
        # requests it advanced. r.latent is a DEVICE FUTURE at that point
        # (np.asarray(r.latent) forces a sync — previews should either
        # accept that cost or run at pipeline_depth=1); exceptions are
        # swallowed with a log so a preview bug can't kill serving.
        self.on_step = on_step
        self.max_batch = max_batch
        # fixed buckets so jit sees a closed set of shapes; max_batch is
        # always a bucket — otherwise a non-power-of-two max_batch (e.g.
        # 3) would bucket a full pool at 2, pad = -1, and silently break
        # the replica padding
        self.batch_sizes = tuple(sorted(
            set(batch_sizes) if batch_sizes else
            {b for b in (1, 2, 4, 8, 16, 32) if b <= max_batch}
            | {max_batch}
        ))
        # pipeline_depth > 1: dispatch up to D steps WITHOUT a host sync
        # between them. JAX async dispatch chains device work on futures
        # (stacking / admission / per-sample sigma advance all operate on
        # device futures), so the host round trip — ~0.45 s/tick through
        # the remote-chip tunnel vs ~0.55 s compute — is paid once per
        # window instead of once per step. A sync is forced whenever a
        # request reaches its final step (its result must come to host).
        self.pipeline_depth = max(1, pipeline_depth)
        self.queue: "queue.Queue[GenRequest]" = queue.Queue()
        self.active: list[GenRequest] = []
        self.stats = EngineStats()
        self._id = itertools.count()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        # in-flight (x_next future, [requests advanced by it]) since the
        # last host sync, oldest first; _window_lanes mirrors it with
        # (live, pad) per dispatch so stats roll back on window failure
        self._pending: list[tuple[Any, list[GenRequest]]] = []
        self._window_lanes: list[tuple[int, int]] = []
        self._window_t0: float | None = None

    # -- client API ---------------------------------------------------------

    def submit(self, latent: np.ndarray, cond, sigmas) -> GenRequest:
        req = GenRequest(request_id=next(self._id),
                         latent=np.asarray(latent), cond=cond,
                         sigmas=np.asarray(sigmas, np.float32))
        self.stats.submitted += 1
        self.queue.put(req)
        return req

    def run_until_drained(self, timeout_s: float = 600.0):
        """Synchronous engine loop: process until queue+pool empty."""
        deadline = time.monotonic() + timeout_s
        while (self.active or not self.queue.empty()):
            if time.monotonic() > deadline:
                raise TimeoutError("engine drain timed out")
            self.tick()

    def start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self, timeout_s: float = 600.0):
        self._stop.set()
        if self._thread:
            # first tick can be a multi-minute jit compile; joining past
            # it matters — running _sync() while the engine thread is
            # still inside tick() would race on _pending/active
            self._thread.join(timeout=timeout_s)
            if self._thread.is_alive():
                log.warning("engine thread still running after %.0fs; "
                            "skipping final sync (call stop() again "
                            "after it settles)", timeout_s)
                return
        self._sync()  # flush any in-flight window (engine thread is dead)

    def _loop(self):
        while not self._stop.is_set():
            if not self.active and self.queue.empty():
                time.sleep(0.001)
                continue
            self.tick()

    # -- engine core --------------------------------------------------------

    def _admit(self):
        while len(self.active) < self.max_batch:
            try:
                req = self.queue.get_nowait()
            except queue.Empty:
                return
            self.active.append(req)

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.batch_sizes[-1]

    def tick(self):
        """Admit new requests, run ONE denoise step on the stacked pool."""
        self._admit()
        dropped = [r for r in self.active if r.cancelled]
        if dropped:
            self.active = [r for r in self.active if not r.cancelled]
            for r in dropped:
                self.stats.cancelled += 1
                r.done_event.set()
        if not self.active:
            return
        batch = self.active[: self.max_batch]
        n = len(batch)
        b = self._bucket(n)
        pad = b - n

        import jax
        import jax.numpy as jnp

        # latents stay DEVICE-resident across ticks (r.latent is a jax
        # array after the first step) — one H2D per request at admission,
        # one D2H at completion; the reference-style host round trip per
        # step would cost 2x the latent bytes every tick
        x = jnp.stack([jnp.asarray(r.latent) for r in batch] +
                      [jnp.asarray(batch[-1].latent)] * pad)
        s_cur = np.array(
            [r.sigmas[r.step] for r in batch]
            + [batch[-1].sigmas[batch[-1].step]] * pad, np.float32)
        s_next = np.array(
            [r.sigmas[r.step + 1] for r in batch]
            + [batch[-1].sigmas[batch[-1].step + 1]] * pad, np.float32)
        cond = _stack_cond([r.cond for r in batch]
                           + [batch[-1].cond] * pad)

        if self._window_t0 is None:
            self._window_t0 = time.monotonic()
        if self.aux_init is not None:
            for r in batch:
                if r.aux is None:
                    r.aux = self.aux_init(r.latent)
            aux = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *([r.aux for r in batch] + [batch[-1].aux] * pad))

        try:
            # NO host sync here: x may contain futures from the previous
            # tick; the runtime chains device work. Trace/shape errors
            # still raise synchronously.
            if self.aux_init is not None:
                x_next, aux_next = self.step_fn(x, s_cur, s_next, cond, aux)
            else:
                x_next = self.step_fn(x, s_cur, s_next, cond)
        except Exception as e:  # fail the batch, keep the engine alive
            log.exception("denoise step failed; failing %d request(s)", n)
            for r in batch:
                r.error = e
                self.stats.failed += 1
                r.done_event.set()
            self.active = self.active[self.max_batch:]
            self._window_t0 = None if not self._pending else self._window_t0
            return

        self.stats.batches_executed += 1
        self.stats.steps_executed += n
        self.stats.total_padding_lanes += pad
        self._window_lanes.append((n, pad))

        finishing = False
        for i, r in enumerate(batch):
            r.latent = x_next[i]  # device future; no transfer
            if self.aux_init is not None:
                r.aux = jax.tree.map(lambda a, i=i: a[i], aux_next)
            r.step += 1
            finishing |= r.finished
        if self.on_step is not None:
            try:
                self.on_step(batch)
            except Exception:
                log.exception("on_step callback failed (ignored)")
        self._pending.append((x_next, batch))
        if finishing or len(self._pending) >= self.pipeline_depth:
            self._sync()

    def snapshot(self) -> list[dict]:
        """Host-materialized state of every unfinished request (pool +
        queue) — the worker-failure recovery hook (SURVEY.md §5 failure
        detection; the round-3/4 tunnel "queued-work wedge" is recovered
        by killing the wedged PROCESS, so in-flight work must be
        resumable in a fresh one).

        Flushes the in-flight dispatch window, then copies latent /
        sigma-cursor / sampler-aux to numpy. Feed the list to
        ``restore()`` on a NEW engine (same step_fn shapes) and the pool
        resumes from the last completed step — Euler/dpmpp-2m steps are
        deterministic, so an interrupted+restored run equals the
        uninterrupted one (tests/test_serving.py). Take snapshots
        between ticks (e.g. every N completions) — once a worker has
        wedged, device fetches hang and it is too late.

        The snapshot is plain numpy pytrees: ``np.save(path,
        np.asarray(snap, dtype=object), allow_pickle=True)`` persists it
        across processes.
        """
        import jax

        self._sync()
        host = lambda t: jax.tree_util.tree_map(
            lambda a: np.asarray(jax.device_get(a)), t)
        snap = []
        for r in self.active + list(self.queue.queue):
            if r.cancelled or r.done_event.is_set():
                continue
            snap.append({
                "latent": np.asarray(jax.device_get(r.latent)),
                "cond": host(r.cond),
                "sigmas": np.asarray(r.sigmas, np.float32),
                "step": int(r.step),
                "aux": None if r.aux is None else host(r.aux),
            })
        return snap

    def restore(self, snap: list[dict]) -> list[GenRequest]:
        """Re-enqueue snapshot() output (typically on a fresh engine in a
        fresh process); returns the new GenRequest handles in snapshot
        order."""
        reqs = []
        for s in snap:
            r = GenRequest(request_id=next(self._id),
                           latent=np.asarray(s["latent"]), cond=s["cond"],
                           sigmas=np.asarray(s["sigmas"], np.float32))
            r.step = int(s["step"])
            r.aux = s["aux"]
            self.stats.submitted += 1
            self.queue.put(r)
            reqs.append(r)
        return reqs

    def _sync(self):
        """Block on the newest in-flight step, surface async errors for
        the whole unsynced window, retire finished requests."""
        if not self._pending:
            return
        import jax

        window = self._pending
        lanes = self._window_lanes
        self._pending = []
        self._window_lanes = []
        try:
            jax.block_until_ready(window[-1][0])
        except Exception as e:
            log.exception("async denoise failure; failing window of %d "
                          "dispatch(es)", len(window))
            # the dispatched steps never completed: roll the dispatch-time
            # counters back so steps_per_second/occupancy stay honest
            for n, pad in lanes:
                self.stats.steps_executed -= n
                self.stats.batches_executed -= 1
                self.stats.total_padding_lanes -= pad
            failed = {}
            for _, batch in window:
                for r in batch:
                    # skip requests already retired (cancelled mid-window
                    # or failed synchronously) — re-failing them would
                    # double-count stats and re-fire done_event after the
                    # caller observed a final state
                    if r.done_event.is_set():
                        continue
                    failed.setdefault(id(r), r)
            for r in failed.values():
                r.error = e
                self.stats.failed += 1
                r.done_event.set()
            self.active = [r for r in self.active
                           if id(r) not in failed]
            self._window_t0 = None
            return
        dt = time.monotonic() - (self._window_t0 or time.monotonic())
        self._window_t0 = None
        self.stats.total_step_time_s += dt

        retired = set()
        for _, batch in window:
            for r in batch:
                if r.finished and id(r) not in retired:
                    retired.add(id(r))
                    r.result = np.asarray(r.latent)
                    r.completed_at = time.monotonic()
                    self.stats.completed += 1
                    self.stats.total_latency_s += (r.completed_at
                                                   - r.submitted_at)
                    r.done_event.set()
        if retired:
            self.active = [r for r in self.active if id(r) not in retired]


def _stack_cond(conds: list):
    """Stack a list of cond pytrees along axis 0 (dict/tuple/array leaves)."""
    first = conds[0]
    if isinstance(first, dict):
        return {k: _stack_cond([c[k] for c in conds]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(
            _stack_cond([c[i] for c in conds]) for i in range(len(first)))
    if first is None:
        return None
    return np.stack([np.asarray(c) for c in conds])


class EngineGroup:
    """Multi-resolution serving: routes requests to per-shape engines.

    Static XLA shapes mean one compiled step per (resolution, batch)
    bucket; the group lazily builds an engine per latent shape via
    ``engine_factory(latent_shape)`` and round-robins ticks across
    engines with work — they share the chip (and the model params, which
    live in the factory's closure), so HBM cost is one weight set.

    The reference's host queue serves mixed resolutions the same way at
    the cost of a torch recompile per shape; here it is an explicit
    bucket set.
    """

    def __init__(self, engine_factory: Callable):
        self._factory = engine_factory
        self._engines: dict[tuple, ContinuousBatchEngine] = {}

    def engine_for(self, latent_shape: tuple) -> "ContinuousBatchEngine":
        key = tuple(latent_shape)
        eng = self._engines.get(key)
        if eng is None:
            eng = self._factory(key)
            self._engines[key] = eng
        return eng

    def submit(self, latent: np.ndarray, cond, sigmas) -> GenRequest:
        return self.engine_for(np.asarray(latent).shape).submit(
            latent, cond, sigmas)

    def run_until_drained(self, timeout_s: float = 600.0):
        deadline = time.monotonic() + timeout_s
        while any(e.active or not e.queue.empty()
                  for e in self._engines.values()):
            if time.monotonic() > deadline:
                raise TimeoutError("engine group drain timed out")
            for e in self._engines.values():
                if e.active or not e.queue.empty():
                    e.tick()

    @property
    def stats(self) -> dict:
        return {shape: e.stats for shape, e in self._engines.items()}


def lane_dpmpp_2m_update(x, denoised, s_cur, s_next, aux):
    """Per-LANE DPM-Solver++(2M) update for pooled serving (data
    prediction in λ = −log σ): each batch lane carries its own multistep
    history (old denoised, previous sigma, validity), so mixed-progress
    continuous batches integrate their own schedules at 2nd order — one
    model call per lane per tick, same cost as Euler serving.

    aux = (old_denoised f32 like x, s_prev (B,), valid (B,) bool).
    Returns (x_next, aux_next). First step per lane (valid=False) and
    the final σ→0 step fall back to the order-1 exponential step (which
    lands exactly on the denoised output at σ'=0), matching
    sampling.kdiffusion.dpmpp_2m_sample_sigma.
    """
    import jax.numpy as jnp

    old_den, s_prev, valid = aux
    bshape = (x.shape[0],) + (1,) * (x.ndim - 1)
    eps = 1e-12
    s = jnp.asarray(s_cur, jnp.float32).reshape(bshape)
    sn = jnp.asarray(s_next, jnp.float32).reshape(bshape)
    sp = jnp.asarray(s_prev, jnp.float32).reshape(bshape)
    xf = x.astype(jnp.float32)
    den = denoised.astype(jnp.float32)

    h = jnp.log(jnp.maximum(s, eps)) - jnp.log(jnp.maximum(sn, eps))
    ratio = sn / jnp.maximum(s, eps)
    expm = jnp.expm1(-h)
    base = ratio * xf - expm * den

    h_last = jnp.log(jnp.maximum(sp, eps)) - jnp.log(jnp.maximum(s, eps))
    r = jnp.where(valid.reshape(bshape), h_last / h, 1.0)
    dd = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * old_den.astype(
        jnp.float32)
    ms = ratio * xf - expm * dd
    use_ms = jnp.logical_and(valid.reshape(bshape), sn > 0)
    out = jnp.where(use_ms, ms, base)

    aux_next = (den, jnp.asarray(s_cur, jnp.float32),
                jnp.ones_like(valid, bool))
    return out.astype(x.dtype), aux_next


def flow_multistep_aux_init(latent):
    """aux_init for lane_dpmpp_2m_update-based engines."""
    import jax.numpy as jnp

    return (jnp.zeros(np.asarray(latent).shape, jnp.float32),
            jnp.float32(0.0), jnp.asarray(False))


class BucketRouter:
    """Multi-RESOLUTION serving front: one ContinuousBatchEngine per
    shape bucket, created lazily from a factory.

    jit is shape-static, so a pooled batch can only hold one latent
    shape; production traffic mixes resolutions. The router keys
    engines by the latent's shape tuple — same model params (and
    compiled block kernels) behind every bucket, one extra whole-program
    compile per NEW bucket, zero cost for shapes already seen. Snap
    incoming requests to a fixed bucket list upstream if unbounded
    resolutions would compile-storm.

        router = BucketRouter(lambda shape: flux_engine(model,
                              shape[0] // 2, shape[1] // 2, txt_len))
        r = router.submit(latent_1024, cond, sigmas)   # routes by shape
        router.run_until_drained()
    """

    def __init__(self, engine_factory):
        self.engine_factory = engine_factory
        self.engines: dict[tuple, ContinuousBatchEngine] = {}

    def engine_for(self, shape: tuple) -> "ContinuousBatchEngine":
        shape = tuple(int(s) for s in shape)
        eng = self.engines.get(shape)
        if eng is None:
            log.info("BucketRouter: new shape bucket %s", shape)
            eng = self.engine_factory(shape)
            self.engines[shape] = eng
        return eng

    def submit(self, latent, cond, sigmas) -> GenRequest:
        return self.engine_for(np.asarray(latent).shape).submit(
            latent, cond, sigmas)

    def run_until_drained(self, timeout_s: float = 600.0) -> None:
        deadline = time.monotonic() + timeout_s
        # round-robin the buckets so no bucket starves while another
        # drains; each tick advances one bucket's whole pool by one step
        while any(e.active or not e.queue.empty()
                  for e in self.engines.values()):
            if time.monotonic() > deadline:
                raise TimeoutError("bucket router drain timed out")
            for eng in list(self.engines.values()):
                if eng.active or not eng.queue.empty():
                    eng.tick()

    @property
    def stats(self) -> dict:
        return {str(shape): eng.stats.snapshot()
                for shape, eng in self.engines.items()}


class ResidentModelServer:
    """Multi-MODEL serving on one chip under an HBM budget.

    The role of ComfyUI's model management (reference nodes.py:80-119
    mmap/offload lifecycle) at TPU granularity: every model's packed
    params are registered with a lifecycle.ResidencyManager (durable
    host copy + LRU device copy); each model gets a persistent engine
    whose jitted step receives params AS ARGUMENTS via a provider
    (pipeline.make_flow_engine(params_provider=...)), so an
    evict→re-place cycle swaps device buffers without any retrace or
    recompile — only the host→HBM transfer is paid.

    Draining is grouped BY MODEL (all queued work for one model runs
    before switching), because a model switch can cost an HBM swap —
    the same reason ComfyUI runs one model's queue at a time.
    """

    def __init__(self, hbm_budget: int | None = None, device=None):
        from .lifecycle import ResidencyManager

        self.manager = ResidencyManager(hbm_budget=hbm_budget,
                                        device=device)
        self._engines: dict[str, ContinuousBatchEngine] = {}

    def register(self, name: str, params, engine_factory,
                 free_source: bool = True) -> None:
        """``engine_factory(params_provider) -> ContinuousBatchEngine``.

        The provider returns the CURRENT device tree for ``name``,
        loading (and LRU-evicting others) as needed. Ticks are
        single-threaded through this object, so residency is stable for
        the duration of each engine call.

        free_source (default True): delete the device buffers of the
        caller's ``params`` once the manager's host copy exists — the
        engine must only ever touch params through the provider, and a
        still-referenced device source would keep its HBM resident
        outside the budget (the whole point of this server). Pass
        False only if the caller genuinely keeps using its own tree.
        """
        self.manager.register(name, params, free_source=free_source)

        def provider(_name=name):
            return self.manager.resident_params(_name)

        self._engines[name] = engine_factory(provider)

    def submit(self, name: str, latent, cond, sigmas) -> GenRequest:
        return self._engines[name].submit(latent, cond, sigmas)

    def run_until_drained(self, timeout_s: float = 600.0) -> None:
        deadline = time.monotonic() + timeout_s
        for name, eng in self._engines.items():
            if not (eng.active or not eng.queue.empty()):
                continue
            with self.manager.acquire(name):  # pin across this drain
                while eng.active or not eng.queue.empty():
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"drain timed out (model {name!r})")
                    eng.tick()

    @property
    def stats(self) -> dict:
        return {"models": self.manager.stats(),
                "engines": {n: e.stats.snapshot()
                            for n, e in self._engines.items()}}
