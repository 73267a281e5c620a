"""Service-runtime tests: queue flow, on_queue chaining across stages,
EOF propagation, drop-on-full, dead-worker detection, profiler averages."""

import queue
import time

import pytest

from sharkshark_tpu.runtime import (
    EOF,
    BaseService,
    Profiler,
    ServiceDeadException,
)


class Doubler(BaseService):
    def proc_job_recieved(self, job):
        return job * 2


class Failer(BaseService):
    def proc_job_recieved(self, job):
        raise RuntimeError("boom")


def test_push_and_get_result():
    s = Doubler()
    s.start()
    s.push_job(21)
    assert s.get_result(timeout=5) == 42
    s.stop()
    assert not s.is_alive


def test_on_queue_chains_stages():
    """recoder -> upscaler -> streamer style chaining: stage A's on_queue
    pushes into stage B's job queue (reference pipeline.py:61-138)."""
    a, b = Doubler(name="a"), Doubler(name="b")
    a.on_queue = b.push_job_nowait
    a.start()
    b.start()
    a.push_job(10)
    assert b.get_result(timeout=5) == 40
    a.stop()
    b.stop()


def test_eof_propagates_and_stops_stage():
    a, b = Doubler(name="a"), Doubler(name="b")
    a.on_queue = b.push_job_nowait
    a.start()
    b.start()
    a.push_job(1)
    a.push_eof()
    assert a.wait_eof(timeout=5)
    assert b.get_result(timeout=5) == 4
    got = b.get_result(timeout=5)
    assert isinstance(got, EOF)
    assert b.wait_eof(timeout=5)
    a.join()
    b.join()
    assert not a.is_alive and not b.is_alive


def test_drop_on_full():
    s = Doubler(job_queue_size=1)
    # not started: queue fills, push_job_nowait raises like the reference's
    # frame-skip policy expects (pipeline.py:103-108)
    s.push_job_nowait(1)
    with pytest.raises(queue.Full):
        s.push_job_nowait(2)


def test_dead_worker_detection():
    s = Failer()
    s.start()
    try:
        s.push_job(1)
    except ServiceDeadException:
        pass
    deadline = time.time() + 5
    while s.is_alive and time.time() < deadline:
        time.sleep(0.01)
    with pytest.raises(ServiceDeadException):
        s.check_proc()
    with pytest.raises(ServiceDeadException):
        s.push_job(2)


def test_wait_for_job_clear():
    s = Doubler()
    s.start()
    for i in range(5):
        s.push_job(i)
    s.wait_for_job_clear()
    assert s.job_queue.empty()
    s.stop()


def test_profiler_running_average():
    p = Profiler()
    p.start("region")
    time.sleep(0.01)
    e1 = p.end("region")
    assert e1 >= 0.01
    p.start("region")
    e2 = p.end("region")
    # data holds the running mean of both ticks
    assert p.data["region"] == pytest.approx((e1 + e2) / 2, rel=1e-6)
    # end without start returns -1 like the reference
    assert p.end("missing") == -1
    p.set("gauge", 7)
    assert p.data["gauge"] == 7
    assert "region" in p.dumps()


# -- in-flight device ring (D2H/compute overlap) ---------------------------


def _ring_service(depth=2):
    import numpy as np

    from sharkshark_tpu.upscale.service import BaseUpscalerService

    class FakeDispatchUpscaler(BaseUpscalerService):
        """upscale_dispatch returns immediately (the async-dispatch
        contract); _fetch is where the host would block on D2H."""

        inflight_depth = depth

        def upscale_dispatch(self, frames):
            return np.asarray(frames) * 2, len(frames)

    return FakeDispatchUpscaler(name="ring")


def test_inflight_ring_delivers_in_order():
    import numpy as np

    from sharkshark_tpu.upscale.service import UpscalerQueueEntry

    svc = _ring_service(depth=2)
    got = []
    svc.on_queue = got.append
    svc.start()
    for step in range(5):
        svc.push_job(
            UpscalerQueueEntry(frames=np.full((2, 4, 4, 3), step, np.uint8), step=step)
        )
    svc.push_eof()
    assert svc.wait_eof(timeout=10)
    svc.stop()
    entries = [e for e in got if not isinstance(e, EOF)]
    assert [e.step for e in entries] == [0, 1, 2, 3, 4]
    assert entries[3].frames[0, 0, 0, 0] == 6  # doubled payload


def test_inflight_ring_idle_drain_single_job():
    """A lone request must not wait for a successor job: the ring drains
    on the next idle poll (request/response callers, image backend)."""
    import numpy as np

    from sharkshark_tpu.upscale.service import UpscalerQueueEntry

    svc = _ring_service(depth=3)
    svc.start()
    t0 = time.time()
    svc.push_job(UpscalerQueueEntry(frames=np.ones((1, 4, 4, 3), np.uint8), step=7))
    out = svc.get_result(timeout=5)
    assert out.step == 7
    assert time.time() - t0 < 2.0
    svc.stop()


def test_inflight_ring_tracks_fetch_busy_time():
    """fetch_busy_s accumulates the wall time blocked in the host fetch —
    tools/bench_e2e.py's drift-immune link_busy_fraction depends on it."""
    import numpy as np

    from sharkshark_tpu.upscale.service import UpscalerQueueEntry

    svc = _ring_service(depth=1)
    svc.start()
    assert svc.fetch_busy_s == 0.0
    svc.push_job(UpscalerQueueEntry(frames=np.ones((1, 4, 4, 3), np.uint8), step=1))
    svc.get_result(timeout=5)
    assert svc.fetch_busy_s > 0.0
    svc.stop()


def test_dead_stage_propagates_eof_downstream():
    """A stage dying on an exception must forward EOF (fail-open) so a
    pipeline join()/wait_eof() unblocks instead of hanging forever; the
    error stays visible through check_proc()."""
    from sharkshark_tpu.runtime.service import BaseService, ServiceDeadException

    class Exploding(BaseService):
        def proc_job_recieved(self, job):
            raise RuntimeError("boom")

    class Sink(BaseService):
        pass

    up = Exploding(name="up")
    down = Sink(name="down")
    up.on_queue = lambda e: down.push_job(e)
    up.start()
    down.start()
    up.push_job(object())
    assert up.wait_eof(timeout=5), "dead stage never signalled EOF"
    assert down.wait_eof(timeout=5), "EOF not propagated downstream"
    import pytest as _pytest

    with _pytest.raises(ServiceDeadException):
        up.check_proc()
    down.stop()
