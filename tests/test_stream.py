"""Stream-layer tests with the fake-ffmpeg pipe double: grabber payload
framing, paced buffered output, recoder->streamer service flow, chat
protocol parsing, and youtube chunk reassembly."""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

from sharkshark_tpu.runtime import EOF, Profiler
from sharkshark_tpu.stream import (
    BufferedOutputStream,
    ChatStream,
    ChunkAssembler,
    ImageGrabber,
    RawStreamSink,
    Recoder,
    RecoderEntry,
    Streamer,
    StreamerEntry,
    decode_video_cmd,
    encode_cmd,
)

FAKE = [sys.executable, os.path.join(os.path.dirname(__file__), "fake_ffmpeg.py")]


def _fake_binary_cmd(cmd):
    """Replace binary argv[0] with the fake-ffmpeg invocation."""
    return FAKE + cmd[1:]


class FakeImageGrabber:
    """In-memory grabber: n deterministic frames then EOF."""

    def __init__(self, n=48, h=36, w=64):
        self.frames = [np.full((h, w, 3), i % 256, np.uint8) for i in range(n)]
        self.i = 0

    def grab(self, timeout=None):
        if self.i >= len(self.frames):
            return None
        f = self.frames[self.i]
        self.i += 1
        return f

    def terminate(self):
        pass


class FakeAudioGrabber:
    def grab(self, timeout=None):
        return np.zeros((441, 2), np.float32)

    def terminate(self):
        pass


def test_raw_frame_source_via_fake_ffmpeg(tmp_path, monkeypatch):
    monkeypatch.setenv("FAKE_FFMPEG_FRAMES", "5")
    cmd = _fake_binary_cmd(decode_video_cmd("dummy.mp4", 64, 36, 24))
    g = ImageGrabber.__new__(ImageGrabber)  # bypass URL resolution
    from sharkshark_tpu.stream.ffmpeg_io import RawFrameSource

    src = RawFrameSource(
        cmd=cmd, payload_bytes=64 * 36 * 3, shape=(36, 64, 3), dtype=np.uint8
    ).start()
    frames = []
    while True:
        # generous: grab() returns None on timeout as well as EOF, and a
        # loaded CI box (full suite + chip jobs) can stall the fake-ffmpeg
        # spawn well past 10 s — a short timeout here reads as a 0-frame EOF
        f = src.grab(timeout=60)
        if f is None:
            break
        frames.append(f)
    assert len(frames) == 5
    assert frames[3][0, 0, 0] == 3  # deterministic fill value
    src.terminate()


def test_encode_sink_receives_frames_in_order(tmp_path):
    dest = str(tmp_path / "out.raw")
    cmd = _fake_binary_cmd(encode_cmd(dest, 64, 36, 24, audio_fifo=None))
    sink = RawStreamSink.__new__(RawStreamSink)
    sink.dest, sink.width, sink.height, sink.fps = dest, 64, 36, 24
    sink.pix_fmt = "rgb24"
    sink._frame_shape = (36, 64, 3)
    sink.enable_audio = False
    sink._audio_fifo_path = None
    sink._audio_fd = None
    sink.cmd = cmd
    import threading

    sink.proc = subprocess.Popen(
        cmd, stdin=subprocess.PIPE, stdout=subprocess.DEVNULL
    )
    sink._lock = threading.Lock()
    for i in range(4):
        sink.send_video_frame(np.full((36, 64, 3), i, np.uint8))
    sink.close()
    data = open(dest, "rb").read()
    assert len(data) == 4 * 36 * 64 * 3
    assert data[0] == 0 and data[36 * 64 * 3] == 1 and data[-1] == 3


class ListSink:
    """Captures frames/audio instead of an encoder process."""

    def __init__(self):
        self.frames = []
        self.audio = []

    def send_video_frame(self, f):
        self.frames.append(np.array(f))

    def send_audio(self, l, r):
        self.audio.append((np.array(l), np.array(r)))

    def check_proc(self):
        pass

    def close(self):
        pass


def test_buffered_output_paces_at_fps():
    sink = ListSink()
    fps = 50.0
    stream = BufferedOutputStream(
        "unused", width=8, height=8, fps=fps, enable_audio=True, sink=sink
    )
    n = 10
    t0 = time.monotonic()
    for i in range(n):
        assert stream.send_video_frame(np.full((8, 8, 3), i, np.uint8), i)
    # wait for drain
    deadline = time.monotonic() + 3
    while len(sink.frames) < n and time.monotonic() < deadline:
        time.sleep(0.01)
    elapsed = time.monotonic() - t0
    assert len(sink.frames) >= n
    # 10 frames at 50 fps should take >= ~0.18 s (first frame immediate)
    assert elapsed >= (n - 1) / fps * 0.8
    # ordering preserved
    sent = [int(f[0, 0, 0]) for f in sink.frames[:n]]
    assert sent == sorted(sent)
    stream._video.stop()
    if stream._audio:
        stream._audio.stop()


def test_buffered_output_repeats_last_frame_on_underrun():
    sink = ListSink()
    stream = BufferedOutputStream(
        "unused", width=4, height=4, fps=100.0, enable_audio=False, sink=sink
    )
    stream.send_video_frame(np.full((4, 4, 3), 7, np.uint8))
    time.sleep(0.2)
    stream._video.stop()
    assert len(sink.frames) > 3  # underruns repeat the last frame
    assert all(int(f[0, 0, 0]) == 7 for f in sink.frames)
    assert stream._video.stats["underruns"] > 0


def test_recoder_to_streamer_flow():
    """End-to-end stage flow with fake grabbers and a list sink: recoder
    batches -> streamer overlay+submit, EOF drains the pipe."""
    sink = ListSink()
    stream = BufferedOutputStream(
        "unused", width=64, height=36, fps=500.0, enable_audio=True, sink=sink
    )
    streamer = Streamer(
        resolution=(36, 64), fps=24, output_stream=stream, overlay=True
    )

    def recoder_on_queue(entry):
        if isinstance(entry, EOF):
            streamer.push_eof()
            return
        streamer.push_job(
            StreamerEntry(
                frames=entry.frames,
                audio_segments=entry.audio_segment,
                step=entry.index,
                profiler=entry.profiler,
            )
        )

    rec = Recoder(
        url="fake://",
        batch_sec=1,
        fps=12,
        on_queue=recoder_on_queue,
        image_grabber=FakeImageGrabber(n=24, h=36, w=64),
        audio_grabber=FakeAudioGrabber(),
        overlay=False,
    )
    streamer.start()
    rec.start()
    assert streamer.wait_eof(timeout=20)
    rec.join()
    streamer.join()
    deadline = time.monotonic() + 3
    while len(sink.frames) < 24 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert len(sink.frames) >= 24
    assert len(sink.audio) >= 1
    assert streamer.frame_count == 24


def test_chat_protocol_parsing():
    assert ChatStream.logged_in_successful("asdf")
    assert not ChatStream.logged_in_successful(
        ":tmi.twitch.tv NOTICE * :Login unsuccessful"
    )
    assert not ChatStream.logged_in_successful(
        ":tmi.twitch.tv NOTICE * :Error logging in"
    )
    # Twitch's actual modern failure reply (the reference's `*`-quantified
    # pattern cannot match it)
    assert not ChatStream.logged_in_successful(
        ":tmi.twitch.tv NOTICE * :Login authentication failed"
    )
    msg = ChatStream.parse_message(
        ":alice!alice@alice.tmi.twitch.tv PRIVMSG #bob :hello world"
    )
    assert msg == {"channel": "#bob", "username": "alice", "message": "hello world"}
    assert ChatStream.parse_message("PING :tmi.twitch.tv") is None


def test_chat_ping_pong_and_join():
    class FakeSock:
        def __init__(self):
            self.sent = []

        def send(self, data):
            self.sent.append(data)

    c = ChatStream("bob", "oauth:x", sock=FakeSock())
    c._handle_line("PING :tmi.twitch.tv")
    # keepalive bypasses the 5 s flood-control buffer
    assert c.sock.sent == [b"PONG :tmi.twitch.tv\r\n"]
    assert c.buffer == []
    c._handle_line(":bob!bob@bob.tmi.twitch.tv JOIN #bob")
    assert c.current_channel == "bob"


def test_chunk_assembler_reorders():
    a = ChunkAssembler(chunk_size=10)
    assert a.add(10, b"b" * 10) == []
    assert a.add(20, b"c" * 10) == []
    ready = a.add(0, b"a" * 10)
    assert ready == [b"a" * 10, b"b" * 10, b"c" * 10]
    assert a.next_position == 30


def test_recoder_reconnects_on_eof():
    """max_reconnects rebuilds the grabbers after a stream drop instead of
    ending the pipeline (robustness the reference lacks)."""
    built = []

    class Flaky(Recoder):
        def proc_init(self):
            if self._image_grabber is None:
                built.append(1)
                self._image_grabber = FakeImageGrabber(n=12, h=16, w=16)
            if self._audio_grabber is None:
                self._audio_grabber = FakeAudioGrabber()

    got = []

    def on_queue(entry):
        if not isinstance(entry, EOF):
            got.append(entry)

    rec = Flaky(
        url="fake://", batch_sec=1, fps=12, on_queue=on_queue,
        overlay=False, max_reconnects=2,
        image_grabber=FakeImageGrabber(n=12, h=16, w=16),
        audio_grabber=FakeAudioGrabber(),
    )
    rec.start()
    assert rec.wait_eof(timeout=20)
    rec.join()
    # 1 initial source + 2 reconnects = 3 batches of 12 frames
    assert len(built) == 2 and rec.reconnects == 2
    assert len(got) == 3


def test_overlay_handles_planar_strided_and_readonly_frames():
    """Device-backed uint8 results can surface as channel-planar strided
    views (axon) or read-only buffers; the status overlay must normalize
    both for cv2 (regression: cv2 5.0 putText rejects non-C-contiguous)."""
    import numpy as np

    from sharkshark_tpu.stream.streamer import _overlay_status

    # planar (C, H, W) memory exposed as an (H, W, C) view
    planar = np.zeros((3, 48, 64), np.uint8).transpose(1, 2, 0)
    assert not planar.flags.c_contiguous
    out = _overlay_status(planar, processed=10, skipped=1)
    assert out.shape == (48, 64, 3) and out.max() > 0

    ro = np.zeros((48, 64, 3), np.uint8)
    ro.setflags(write=False)
    out = _overlay_status(ro, processed=10, skipped=1)
    assert out.max() > 0
