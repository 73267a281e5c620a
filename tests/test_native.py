"""Native framepump tests: build + ring-buffer reader/paced writer via
real pipes, and integration through RawFrameSource."""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

from sharkshark_tpu.stream.native import (
    NativePump,
    NativeSink,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native framepump not buildable"
)

FAKE = [sys.executable, os.path.join(os.path.dirname(__file__), "fake_ffmpeg.py")]


def test_pump_reads_frames_in_order():
    r, w = os.pipe()
    shape = (8, 16, 3)
    nbytes = int(np.prod(shape))
    pump = NativePump(r, shape, np.uint8, capacity=4)
    for i in range(6):
        os.write(w, bytes([i]) * nbytes)
    frames = [pump.grab(timeout=5) for _ in range(6)]
    assert all(f is not None for f in frames)
    assert [int(f[0, 0, 0]) for f in frames] == list(range(6))
    os.close(w)
    # EOF
    assert pump.grab(timeout=5) is None
    assert pump.eof
    assert pump.stats["read"] == 6
    pump.terminate()
    os.close(r)


def test_pump_drop_when_full():
    r, w = os.pipe()
    nbytes = 64
    pump = NativePump(r, (64,), np.uint8, capacity=2, drop_when_full=True)
    for i in range(10):
        os.write(w, bytes([i]) * nbytes)
    os.close(w)
    time.sleep(0.2)
    got = []
    while True:
        f = pump.grab(timeout=2)
        if f is None:
            break
        got.append(int(f[0]))
    assert pump.stats["dropped"] > 0
    assert len(got) + pump.stats["dropped"] == 10
    assert got == sorted(got)  # order preserved
    pump.terminate()
    os.close(r)


def test_pump_cross_thread_shutdown_unblocks_grab():
    """shutdown() from another thread must wake a blocked grab() WITHOUT
    freeing the Pump under it (the ADVICE r3 use-after-free: terminate()
    called pump_destroy while the run thread sat inside pump_grab)."""
    import threading

    r, w = os.pipe()
    pump = NativePump(r, (64,), np.uint8, capacity=4)
    result = {}

    def worker():
        result["frame"] = pump.grab(timeout=30)

    t = threading.Thread(target=worker)
    t.start()
    time.sleep(0.2)  # worker is blocked inside pump_grab (GIL released)
    pump.shutdown()  # cross-thread: wake it, keep the ring alive
    t.join(timeout=5)
    assert not t.is_alive()
    assert result["frame"] is None
    os.close(w)  # reader sees EOF -> destroy's join is safe
    pump.terminate()
    os.close(r)


def test_pump_shutdown_keeps_buffer_drainable():
    r, w = os.pipe()
    nbytes = 64
    pump = NativePump(r, (64,), np.uint8, capacity=4)
    for i in range(3):
        os.write(w, bytes([i]) * nbytes)
    deadline = time.monotonic() + 5
    while pump.depth < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    pump.shutdown()
    got = []
    while True:
        f = pump.grab(timeout=2)
        if f is None:
            break
        got.append(int(f[0]))
    assert got == [0, 1, 2]
    os.close(w)
    pump.terminate()
    os.close(r)


def test_sink_paces_and_writes(tmp_path):
    r, w = os.pipe()
    nbytes = 128
    fps = 100.0
    sink = NativeSink(w, nbytes, fps, capacity=16, realtime=True)
    t0 = time.monotonic()
    for i in range(10):
        assert sink.put(np.full(nbytes, i, np.uint8))
    data = b""
    while len(data) < 10 * nbytes:
        data += os.read(r, 65536)
    elapsed = time.monotonic() - t0
    assert elapsed >= 9 / fps * 0.7  # paced, not burst
    assert data[0] == 0 and data[nbytes] == 1
    sink.close(drain=False)
    os.close(w)
    os.close(r)


def test_sink_offline_drains_exactly_once(tmp_path):
    r, w = os.pipe()
    nbytes = 64
    sink = NativeSink(w, nbytes, fps=1000.0, capacity=16, realtime=False)
    for i in range(5):
        sink.put(np.full(nbytes, i, np.uint8))
    sink.close(drain=True)
    os.close(w)
    data = b""
    while True:
        chunk = os.read(r, 65536)
        if not chunk:
            break
        data += chunk
    os.close(r)
    assert len(data) == 5 * nbytes  # no underrun repeats in offline mode
    assert sink.stats["underruns"] == 0


def test_raw_frame_source_uses_native(monkeypatch):
    from sharkshark_tpu.stream.ffmpeg_io import RawFrameSource, decode_video_cmd

    monkeypatch.setenv("FAKE_FFMPEG_FRAMES", "5")
    cmd = FAKE + decode_video_cmd("dummy.mp4", 64, 36, 24)[1:]
    src = RawFrameSource(
        cmd=cmd, payload_bytes=64 * 36 * 3, shape=(36, 64, 3), use_native=True
    ).start()
    frames = []
    while True:
        f = src.grab(timeout=10)
        if f is None:
            break
        frames.append(f)
    assert len(frames) == 5
    assert frames[2][0, 0, 0] == 2
    src.close()


def test_raw_frame_source_cross_thread_terminate(monkeypatch):
    """Recoder.stop() pattern: control thread terminate()s the source
    while the run thread is blocked in grab(); the run thread then
    close()s. No crash, grab returns None promptly."""
    import threading

    from sharkshark_tpu.stream.ffmpeg_io import RawFrameSource, decode_video_cmd

    monkeypatch.setenv("FAKE_FFMPEG_FRAMES", "2")
    monkeypatch.setenv("FAKE_FFMPEG_STALL", "30")  # stall after frames
    cmd = FAKE + decode_video_cmd("dummy.mp4", 64, 36, 24)[1:]
    src = RawFrameSource(
        cmd=cmd, payload_bytes=64 * 36 * 3, shape=(36, 64, 3), use_native=True
    ).start()
    results = []

    def run_thread():
        while True:
            f = src.grab(timeout=10)
            if f is None:
                break
            results.append(f)
        src.close()  # run thread owns destruction

    t = threading.Thread(target=run_thread)
    t.start()
    deadline = time.monotonic() + 10
    while len(results) < 2 and time.monotonic() < deadline:
        time.sleep(0.01)
    src.terminate()  # control thread: non-destructive shutdown
    t.join(timeout=10)
    assert not t.is_alive()
    assert len(results) == 2
