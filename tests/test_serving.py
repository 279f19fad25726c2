"""Continuous-batching engine tests: mixed-progress pools, padding buckets,
exact per-sample integration, stats."""

import numpy as np

from comfyui_gguf_tpu.sampling import linear_schedule
from comfyui_gguf_tpu.serving import ContinuousBatchEngine


def _linear_step(x, s_cur, s_next, cond):
    """dx/dσ = cond['c'] (constant per-sample velocity) — exact Euler."""
    c = cond["c"][:, None, None, None]
    return x + (s_next - s_cur)[:, None, None, None] * c


def test_single_request_exact():
    eng = ContinuousBatchEngine(_linear_step, max_batch=2)
    x0 = np.ones((4, 4, 1), np.float32) * 2.0
    req = eng.submit(x0, {"c": np.float32(3.0)}, linear_schedule(5))
    eng.run_until_drained()
    assert req.finished
    # integrates σ: 1 → 0 with velocity 3 → x0 - 3
    np.testing.assert_allclose(req.result, 2.0 - 3.0, rtol=1e-6)
    assert eng.stats.completed == 1
    assert eng.stats.steps_executed == 5


def test_mixed_progress_pool_is_exact():
    """Requests with different step counts share batches; each integrates
    its own schedule exactly."""
    eng = ContinuousBatchEngine(_linear_step, max_batch=4)
    reqs = []
    for i, steps in enumerate((3, 7, 5)):
        x0 = np.full((2, 2, 1), float(i), np.float32)
        reqs.append(eng.submit(x0, {"c": np.float32(i + 1)},
                               linear_schedule(steps)))
    eng.run_until_drained()
    for i, r in enumerate(reqs):
        np.testing.assert_allclose(r.result, float(i) - (i + 1), rtol=1e-5,
                                   atol=1e-6)
    # pool batching actually happened (fewer batches than total steps)
    assert eng.stats.batches_executed < eng.stats.steps_executed
    assert eng.stats.mean_batch_occupancy > 0.5


def test_late_arrivals_join_pool():
    eng = ContinuousBatchEngine(_linear_step, max_batch=4)
    r1 = eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(1)},
                    linear_schedule(4))
    # run two ticks, then a new request arrives mid-flight
    eng.tick()
    eng.tick()
    r2 = eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(2)},
                    linear_schedule(2))
    eng.run_until_drained()
    np.testing.assert_allclose(r1.result, -1.0, atol=1e-6)
    np.testing.assert_allclose(r2.result, -2.0, atol=1e-6)


def test_padding_buckets_power_of_two():
    eng = ContinuousBatchEngine(_linear_step, max_batch=8)
    for _ in range(3):
        eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(1)},
                   linear_schedule(1))
    eng.tick()
    # 3 live requests pad to bucket 4
    assert eng.stats.total_padding_lanes == 1
    assert eng.stats.steps_executed == 3


def test_stats_snapshot_keys():
    eng = ContinuousBatchEngine(_linear_step, max_batch=2)
    eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(1)},
               linear_schedule(1))
    eng.run_until_drained()
    snap = eng.stats.snapshot()
    assert snap["completed"] == 1
    assert snap["steps_per_second"] is not None
    assert snap["mean_latency_s"] is not None


def test_failed_batch_does_not_kill_engine():
    calls = {"n": 0}

    def flaky(x, s_cur, s_next, cond):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return _linear_step(x, s_cur, s_next, cond)

    eng = ContinuousBatchEngine(flaky, max_batch=2)
    bad = eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(1)},
                     linear_schedule(2))
    eng.tick()  # fails the first batch
    assert bad.error is not None and bad.done_event.is_set()
    ok = eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(1)},
                    linear_schedule(2))
    eng.run_until_drained()
    assert ok.finished and ok.error is None
    assert eng.stats.failed == 1 and eng.stats.completed == 1


def test_cancellation_drops_requests():
    eng = ContinuousBatchEngine(_linear_step, max_batch=4)
    keep = eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(1)},
                      linear_schedule(4))
    drop = eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(2)},
                      linear_schedule(4))
    eng.tick()
    drop.cancel()
    eng.run_until_drained()
    assert keep.finished and keep.error is None
    assert drop.cancelled and not drop.finished and drop.result is None
    assert drop.done_event.is_set()
    assert eng.stats.cancelled == 1 and eng.stats.completed == 1


def test_pipelined_window_is_exact():
    """pipeline_depth > 1 defers host syncs but must integrate each
    request's schedule exactly — results identical to depth-1."""
    eng = ContinuousBatchEngine(_linear_step, max_batch=4, pipeline_depth=3)
    reqs = []
    for i, steps in enumerate((3, 7, 5)):
        x0 = np.full((2, 2, 1), float(i), np.float32)
        reqs.append(eng.submit(x0, {"c": np.float32(i + 1)},
                               linear_schedule(steps)))
    eng.run_until_drained()
    for i, r in enumerate(reqs):
        np.testing.assert_allclose(r.result, float(i) - (i + 1), rtol=1e-5,
                                   atol=1e-6)
    assert eng.stats.completed == 3 and not eng._pending


def test_pipelined_sync_cadence():
    """Host syncs happen once per window (or at a finish), not per step."""
    eng = ContinuousBatchEngine(_linear_step, max_batch=2, pipeline_depth=4)
    syncs = {"n": 0}
    orig = eng._sync

    def counting_sync():
        if eng._pending:
            syncs["n"] += 1
        orig()

    eng._sync = counting_sync
    req = eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(1)},
                     linear_schedule(8))
    eng.run_until_drained()
    assert req.finished and req.error is None
    # 8 steps at depth 4 → one full-window sync + one finishing sync
    assert syncs["n"] == 2
    assert eng.stats.steps_executed == 8


def test_pipelined_finish_forces_sync():
    """A request hitting its last step is retired on that same tick even
    when the pipeline window is not full."""
    eng = ContinuousBatchEngine(_linear_step, max_batch=2, pipeline_depth=8)
    req = eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(2)},
                     linear_schedule(3))
    eng.tick()
    eng.tick()
    assert not req.done_event.is_set()  # mid-flight, window open
    eng.tick()  # final step → forced sync
    assert req.done_event.is_set() and req.result is not None
    np.testing.assert_allclose(req.result, -2.0, atol=1e-6)


def test_pipelined_stop_flushes_window():
    """stop() drains the in-flight window so no dispatched work is lost."""
    eng = ContinuousBatchEngine(_linear_step, max_batch=2, pipeline_depth=8)
    eng.submit(np.zeros((2, 2, 1), np.float32), {"c": np.float32(1)},
               linear_schedule(6))
    for _ in range(3):
        eng.tick()
    assert eng._pending  # window open
    eng.stop()
    assert not eng._pending
    assert eng.stats.total_step_time_s > 0


def test_engine_group_multi_resolution():
    """Requests of different latent shapes route to per-shape engines and
    all complete."""
    from comfyui_gguf_tpu.serving import EngineGroup, ContinuousBatchEngine

    def factory(shape):
        def step_fn(x, s_cur, s_next, cond):
            return x * 0.5  # trivial contraction per step
        return ContinuousBatchEngine(step_fn, max_batch=2)

    g = EngineGroup(factory)
    sig = np.array([1.0, 0.5, 0.0], np.float32)
    r1 = g.submit(np.ones((8, 8, 4), np.float32), {}, sig)
    r2 = g.submit(np.ones((16, 16, 4), np.float32), {}, sig)
    r3 = g.submit(np.ones((8, 8, 4), np.float32), {}, sig)
    g.run_until_drained(timeout_s=30)
    for r in (r1, r2, r3):
        assert r.result is not None and r.error is None
    assert r1.result.shape == (8, 8, 4)
    assert r2.result.shape == (16, 16, 4)
    np.testing.assert_allclose(r1.result, 0.25 * np.ones((8, 8, 4)),
                               rtol=1e-6)
    assert len(g.stats) == 2


def test_non_pow2_max_batch_bucket():
    """max_batch=3: the full pool must bucket at 3 (never pad=-1)."""
    eng = ContinuousBatchEngine(_linear_step, max_batch=3)
    assert eng.batch_sizes == (1, 2, 3)
    reqs = [eng.submit(np.zeros((2, 2, 1), np.float32),
                       {"c": np.float32(i + 1)}, linear_schedule(3))
            for i in range(3)]
    eng.run_until_drained()
    for i, r in enumerate(reqs):
        np.testing.assert_allclose(r.result, -(i + 1), atol=1e-6)
    assert eng.stats.total_padding_lanes >= 0


def test_snapshot_restore_resumes_exactly():
    """Failure recovery: an engine interrupted mid-pool snapshots its
    unfinished requests (host numpy), a FRESH engine restores them, and
    the drained results equal an uninterrupted run — the recovery path
    for the wedged-worker fault (kill process, relaunch, resume)."""
    def run_uninterrupted():
        eng = ContinuousBatchEngine(_linear_step, max_batch=2)
        reqs = [eng.submit(np.full((2, 2, 1), float(i), np.float32),
                           {"c": np.float32(i + 1)},
                           linear_schedule(steps))
                for i, steps in enumerate((4, 6, 3))]
        eng.run_until_drained()
        return [np.asarray(r.result) for r in reqs]

    want = run_uninterrupted()

    eng1 = ContinuousBatchEngine(_linear_step, max_batch=2)
    reqs1 = [eng1.submit(np.full((2, 2, 1), float(i), np.float32),
                         {"c": np.float32(i + 1)}, linear_schedule(steps))
             for i, steps in enumerate((4, 6, 3))]
    eng1.tick()
    eng1.tick()  # partial progress; request 2 still queued (max_batch 2)
    snap = eng1.snapshot()
    assert len(snap) == 3 and any(s["step"] > 0 for s in snap)
    assert all(isinstance(s["latent"], np.ndarray) for s in snap)

    # snapshot round-trips through a file (cross-process persistence)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "snap.npy")
        np.save(p, np.asarray(snap, dtype=object), allow_pickle=True)
        snap = list(np.load(p, allow_pickle=True))

    # "new process": a fresh engine picks the pool up mid-denoise
    eng2 = ContinuousBatchEngine(_linear_step, max_batch=2)
    reqs2 = eng2.restore(snap)
    eng2.run_until_drained()
    assert all(r.finished for r in reqs2)
    for got, ref in zip((np.asarray(r.result) for r in reqs2), want):
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_bucket_router_mixed_resolutions():
    """BucketRouter: requests of different latent shapes route to
    per-shape engines (jit is shape-static), results are exact, and
    same-shape requests POOL in one engine."""
    from comfyui_gguf_tpu.serving import BucketRouter

    made = []

    def factory(shape):
        made.append(shape)
        return ContinuousBatchEngine(_linear_step, max_batch=4)

    router = BucketRouter(factory)
    r_small = [router.submit(np.full((2, 2, 1), float(i), np.float32),
                             {"c": np.float32(i + 1)}, linear_schedule(4))
               for i in range(2)]
    r_big = router.submit(np.zeros((4, 4, 1), np.float32),
                          {"c": np.float32(5)}, linear_schedule(3))
    router.run_until_drained()

    assert made == [(2, 2, 1), (4, 4, 1)]  # lazily created, reused
    for i, r in enumerate(r_small):
        np.testing.assert_allclose(r.result, float(i) - (i + 1),
                                   atol=1e-6)
    np.testing.assert_allclose(r_big.result, -5.0, atol=1e-6)
    # same-shape requests shared one pooled engine
    small = router.engines[(2, 2, 1)]
    assert small.stats.batches_executed < small.stats.steps_executed
    assert set(router.stats) == {"(2, 2, 1)", "(4, 4, 1)"}


def test_threaded_engine_concurrent_producers():
    """The background-thread mode (engine.start()/_loop) under real
    concurrency: four producer threads submit interleaved while the
    engine thread ticks; every request completes with the exact
    integral, stats totals are consistent, and stop() flushes cleanly.
    (SURVEY §5 'race detection': the serving queue + done_event
    handshake is the framework's one threaded surface — this is its
    sanitizer.)"""
    import threading

    eng = ContinuousBatchEngine(_linear_step, max_batch=4)
    eng.start()
    results = {}

    def producer(tid):
        for i in range(8):
            c = float(tid * 8 + i + 1)
            r = eng.submit(np.zeros((2, 2, 1), np.float32),
                           {"c": np.float32(c)},
                           linear_schedule(2 + (i % 3)))
            results[(tid, i)] = (r, c)

    threads = [threading.Thread(target=producer, args=(t,))
               for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for r, _c in results.values():
        assert r.done_event.wait(timeout=60.0)
    eng.stop()

    assert eng.stats.completed == 32 and eng.stats.failed == 0
    for (tid, i), (r, c) in results.items():
        assert r.finished and r.error is None
        np.testing.assert_allclose(r.result, -c, atol=1e-5)
