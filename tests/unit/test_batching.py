"""DynamicBatcher (yolojax/serve/batching.py): fill semantics, windowing,
error propagation, shutdown. The HTTP surface riding it is covered by
tests/e2e/test_http_serve.py."""

import threading
import time

import numpy as np
import pytest

from yolojax.serve.batching import DynamicBatcher, QueueFull

DIM = 8
FILLER = np.zeros((DIM, DIM, 3), np.float32)


def _canvas(v):
    return np.full((DIM, DIM, 3), float(v), np.float32)


class RecordingInfer:
    """Fake device fn: echoes each canvas's fill value so per-slot routing
    is checkable; records every batch it saw."""

    def __init__(self, fail=False):
        self.batches = []
        self.fail = fail
        self.lock = threading.Lock()

    def __call__(self, canvases):
        with self.lock:
            self.batches.append(np.array(canvases))
        if self.fail:
            raise ValueError("device exploded")
        return {"tag": canvases[:, 0, 0, 0].copy()}


def _submit_concurrently(batcher, values):
    results = {}
    errors = {}

    def go(v):
        try:
            results[v] = batcher.submit(_canvas(v))
        except Exception as e:  # noqa: BLE001 — recorded for assertions
            errors[v] = e

    threads = [threading.Thread(target=go, args=(v,)) for v in values]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    return results, errors


def test_full_batch_dispatches_without_waiting_for_window():
    infer = RecordingInfer()
    b = DynamicBatcher(infer, batch=3, filler=FILLER, window_ms=10_000)
    t0 = time.monotonic()
    results, errors = _submit_concurrently(b, [1, 2, 3])
    assert not errors
    assert time.monotonic() - t0 < 5, "a full batch must not wait the window"
    assert len(infer.batches) == 1 and infer.batches[0].shape[0] == 3
    for v, (res, fill) in results.items():
        assert res["tag"] == pytest.approx(float(v))  # slot routing
        assert fill == 3
    b.close()


def test_partial_batch_dispatches_at_window_close_with_padding():
    infer = RecordingInfer()
    b = DynamicBatcher(infer, batch=4, filler=_canvas(-1), window_ms=150)
    results, errors = _submit_concurrently(b, [5, 6])
    assert not errors
    (batch,) = infer.batches
    assert batch.shape[0] == 4  # padded to the compiled batch size
    assert sorted(batch[:, 0, 0, 0].tolist()) == [-1.0, -1.0, 5.0, 6.0]
    assert all(fill == 2 for _, fill in results.values())
    b.close()


def test_queue_larger_than_batch_splits_into_chunks():
    infer = RecordingInfer()
    b = DynamicBatcher(infer, batch=2, filler=FILLER, window_ms=10_000)
    results, errors = _submit_concurrently(b, [1, 2, 3, 4, 5, 6])
    assert not errors and len(results) == 6
    assert len(infer.batches) == 3
    assert b.stats()["images"] == 6 and b.stats()["mean_fill"] == 2.0
    b.close()


def test_infer_error_propagates_to_every_submitter():
    infer = RecordingInfer(fail=True)
    b = DynamicBatcher(infer, batch=2, filler=FILLER, window_ms=50)
    results, errors = _submit_concurrently(b, [1, 2])
    assert not results and len(errors) == 2
    assert all("device exploded" in str(e) for e in errors.values())
    assert b.stats()["errors"] >= 1
    b.close()


def test_submit_after_close_raises():
    b = DynamicBatcher(RecordingInfer(), batch=1, filler=FILLER)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(_canvas(1))


def test_batch_one_is_passthrough():
    infer = RecordingInfer()
    b = DynamicBatcher(infer, batch=1, filler=FILLER, window_ms=10_000)
    res, fill = b.submit(_canvas(7))
    assert fill == 1 and res["tag"] == pytest.approx(7.0)
    b.close()


def test_invalid_batch_rejected():
    with pytest.raises(ValueError, match=">= 1"):
        DynamicBatcher(RecordingInfer(), batch=0, filler=FILLER)


class BlockingInfer:
    """Holds the device call open until the test releases it, so queue
    depth is controllable deterministically."""

    def __init__(self):
        self.gate = threading.Event()
        self.started = threading.Event()

    def __call__(self, canvases):
        self.started.set()
        assert self.gate.wait(30)
        return {"tag": canvases[:, 0, 0, 0].copy()}


class OverlapInfer:
    """Proves two dispatches are in flight AT THE SAME TIME: the first
    call blocks until the second arrives (bounded wait so a broken
    pipeline fails the assertion instead of deadlocking)."""

    def __init__(self, want=2):
        self.want = want
        self.inflight = 0
        self.max_inflight = 0
        self.lock = threading.Lock()
        self.reached = threading.Event()

    def __call__(self, canvases):
        with self.lock:
            self.inflight += 1
            self.max_inflight = max(self.max_inflight, self.inflight)
            if self.inflight >= self.want:
                self.reached.set()
        self.reached.wait(5)
        with self.lock:
            self.inflight -= 1
        return {"tag": canvases[:, 0, 0, 0].copy()}


def test_pipeline_depth_overlaps_dispatches():
    infer = OverlapInfer(want=2)
    b = DynamicBatcher(infer, batch=1, filler=FILLER, window_ms=0,
                       pipeline_depth=2)
    results, errors = _submit_concurrently(b, [1, 2])
    assert not errors
    assert infer.max_inflight == 2, "depth=2 must run 2 batches at once"
    for v, (res, fill) in results.items():
        assert res["tag"] == pytest.approx(float(v)) and fill == 1
    b.close()


def test_pipeline_depth_bounds_inflight_and_routes_results():
    infer = OverlapInfer(want=2)
    b = DynamicBatcher(infer, batch=1, filler=FILLER, window_ms=0,
                       pipeline_depth=2)
    results, errors = _submit_concurrently(b, [1, 2, 3, 4, 5, 6])
    assert not errors and len(results) == 6
    assert infer.max_inflight == 2, "semaphore must cap in-flight at depth"
    for v, (res, _) in results.items():
        assert res["tag"] == pytest.approx(float(v))
    s = b.stats()
    assert s["images"] == 6 and s["errors"] == 0
    b.close()


def test_pipeline_close_drains_inflight():
    infer = RecordingInfer()
    b = DynamicBatcher(infer, batch=2, filler=FILLER, window_ms=20,
                       pipeline_depth=3)
    results, errors = _submit_concurrently(b, [1, 2, 3, 4, 5])
    b.close()
    assert not errors and len(results) == 5
    assert b.stats()["images"] == 5


def test_pipeline_error_isolated_per_batch():
    """A failing batch must only poison its own submitters, also under
    pipelining."""

    class FlakyInfer:
        def __init__(self):
            self.lock = threading.Lock()

        def __call__(self, canvases):
            if float(canvases[0, 0, 0, 0]) == 13.0:
                raise ValueError("device exploded")
            return {"tag": canvases[:, 0, 0, 0].copy()}

    b = DynamicBatcher(FlakyInfer(), batch=1, filler=FILLER, window_ms=0,
                       pipeline_depth=2)
    # serialize submissions so the poison value sits alone in its batch
    ok1 = b.submit(_canvas(1))
    with pytest.raises(ValueError, match="device exploded"):
        b.submit(_canvas(13))
    ok2 = b.submit(_canvas(2))
    assert ok1[0]["tag"] == pytest.approx(1.0)
    assert ok2[0]["tag"] == pytest.approx(2.0)
    assert b.stats()["errors"] == 1
    b.close()


def test_invalid_pipeline_depth_rejected():
    with pytest.raises(ValueError, match="pipeline_depth"):
        DynamicBatcher(RecordingInfer(), batch=1, filler=FILLER,
                       pipeline_depth=0)


def test_backpressure_rejects_beyond_max_queue():
    infer = BlockingInfer()
    b = DynamicBatcher(infer, batch=1, filler=FILLER, window_ms=0,
                       max_queue=1)
    t_a = threading.Thread(target=lambda: b.submit(_canvas(1)))
    t_a.start()
    assert infer.started.wait(10)  # A is on the device, queue empty
    t_b = threading.Thread(target=lambda: b.submit(_canvas(2)))
    t_b.start()
    deadline = time.monotonic() + 10
    while b.stats()["queued"] < 1:  # B is waiting
        assert time.monotonic() < deadline
        time.sleep(0.01)
    with pytest.raises(QueueFull, match="retry later"):
        b.submit(_canvas(3))  # C: queue at capacity -> shed
    assert b.stats()["rejected"] == 1
    infer.gate.set()  # release the device; A then B complete
    t_a.join(30)
    t_b.join(30)
    assert b.stats()["images"] == 2 and b.stats()["queued"] == 0
    b.close()


def test_close_race_fails_undispatched_group_instead_of_hanging():
    """If a wedged in-flight dispatch outlives close()'s join timeout, the
    worker can wake up after the pool is shut down; its next submit must
    fail the undispatched group explicitly (error + done set) rather than
    leave those submitters blocked forever on done.wait()."""
    infer = BlockingInfer()
    b = DynamicBatcher(infer, batch=1, filler=FILLER, window_ms=0,
                       pipeline_depth=2, max_queue=8)
    outcomes = {}

    def go(v):
        try:
            outcomes[v] = ("ok", b.submit(_canvas(v)))
        except Exception as e:  # noqa: BLE001 — recorded for assertions
            outcomes[v] = ("err", e)

    threads = [threading.Thread(target=go, args=(v,)) for v in (1, 2, 3)]
    for t in threads:
        t.start()
    # both in-flight slots fill with gate-blocked dispatches; the third
    # group leaves the worker blocked on the in-flight semaphore
    assert infer.started.wait(10)
    deadline = time.monotonic() + 10
    while b.stats()["batches"] < 1 and time.monotonic() < deadline:
        time.sleep(0.01)
    # close with a join timeout shorter than the wedge: worker outlives it
    closer = threading.Thread(target=lambda: b.close(timeout=0.2))
    closer.start()
    time.sleep(0.5)  # close() is now inside pool.shutdown(wait=True)
    infer.gate.set()  # un-wedge the device; in-flight batches complete
    closer.join(30)
    for t in threads:
        t.join(30)
        assert not t.is_alive(), "a submitter hung after close()"
    errs = [v for v, (kind, _) in outcomes.items() if kind == "err"]
    oks = [v for v, (kind, _) in outcomes.items() if kind == "ok"]
    # the wedged-but-dispatched groups complete; any group the worker
    # popped after shutdown gets an explicit error, never a hang
    assert len(oks) + len(errs) == 3
    for v in errs:
        assert "closed" in str(outcomes[v][1])
