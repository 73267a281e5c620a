"""Fault injection: worker death mid-service and the backend's
restart-on-dead-worker path (the reference only documents this behavior,
SURVEY §5.3 — it has no fault tests at all)."""

import threading
import time

import httpx
import numpy as np
import pytest

from sharkshark_tpu.image_server import ImageBackend, serve_background
from sharkshark_tpu.runtime import BaseService, ServiceDeadException


class FlakyUpscaler(BaseService):
    """Dies on the first job after (re)start, succeeds afterwards."""

    instances = 0

    def __init__(self, on_queue):
        super().__init__(name=f"flaky{FlakyUpscaler.instances}")
        FlakyUpscaler.instances += 1
        self.on_queue = on_queue
        self.jobs = 0
        self.die_once = FlakyUpscaler.instances == 1

    def proc_job_recieved(self, job):
        self.jobs += 1
        if self.die_once:
            raise RuntimeError("injected fault")
        job.frames = np.repeat(np.repeat(job.frames, 4, 1), 4, 2)
        return job


def test_backend_restarts_dead_worker():
    FlakyUpscaler.instances = 0
    backend = ImageBackend(
        upscaler_factory=lambda on_queue: FlakyUpscaler(on_queue),
        job_timeout=5,
    )
    httpd = serve_background(backend.app, port=0)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.full((16, 16, 3), 99, np.uint8)).save(buf, "PNG")
        png = buf.getvalue()

        # first request hits the injected fault
        r1 = httpx.post(f"{url}/upscale/image", files={"file": png}, timeout=60)
        assert r1.status_code == 500

        # push detects the dead worker; restart_pipeline swaps it out.
        # give the dead thread a moment to be observed
        deadline = time.time() + 5
        while time.time() < deadline:
            r2 = httpx.post(
                f"{url}/upscale/image", files={"file": png}, timeout=60
            )
            if r2.status_code == 200:
                break
            time.sleep(0.2)
        assert r2.status_code == 200, r2.text
        assert FlakyUpscaler.instances >= 2  # a fresh worker was built
    finally:
        httpd.shutdown()


def test_dead_service_raises_not_hangs():
    class Dead(BaseService):
        def proc_init(self):
            raise RuntimeError("init fault")

    s = Dead()
    s.start()
    deadline = time.time() + 5
    while s.is_alive and time.time() < deadline:
        time.sleep(0.01)
    with pytest.raises(ServiceDeadException):
        s.push_job(1)
