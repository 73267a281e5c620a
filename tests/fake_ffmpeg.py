#!/usr/bin/env python
"""Fake ffmpeg for stream-layer tests: speaks the same rawvideo/PCM pipe
protocol as the real binary for the exact command lines built by
sharkshark_tpu.stream.ffmpeg_io.

Decode video mode  (.. -vcodec rawvideo -):  emits FAKE_FFMPEG_FRAMES
deterministic RGB24 frames (frame i filled with value i%256) to stdout.
Decode audio mode  (-acodec pcm_f32le .. -): emits FAKE_FFMPEG_SEGMENTS
1-second f32le stereo segments of constant value.
Encode mode        (-f rawvideo .. -i - .. <dest>): reads raw frames from
stdin (draining the audio FIFO if one is given) and writes the raw
concatenation to <dest> so tests can verify frames arrived in order.
"""

import os
import sys
import threading


def parse(argv):
    args = {}
    i = 0
    inputs = []
    while i < len(argv):
        a = argv[i]
        if a == "-i":
            inputs.append(argv[i + 1])
            i += 2
            continue
        if a.startswith("-") and i + 1 < len(argv) and not argv[i + 1].startswith("-"):
            args[a] = argv[i + 1]
            i += 2
            continue
        args.setdefault("_pos", []).append(a)
        i += 1
    return args, inputs


def main():
    argv = sys.argv[1:]
    args, inputs = parse(argv)
    pos = args.get("_pos", [])

    if "-vcodec" in args and args["-vcodec"] == "rawvideo" and pos and pos[-1] == "-":
        # decode video; FAKE_FFMPEG_FPS > 0 paces emission like a live
        # source (used by tools/bench_e2e.py for sustained-rate runs)
        import time

        w, h = map(int, args["-s"].split("x"))
        n = int(os.environ.get("FAKE_FFMPEG_FRAMES", "48"))
        fps = float(os.environ.get("FAKE_FFMPEG_FPS", "0"))
        t0 = time.monotonic()
        out = sys.stdout.buffer
        for i in range(n):
            if fps > 0:
                due = t0 + i / fps
                delay = due - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
            out.write(bytes([i % 256]) * (w * h * 3))
        out.flush()
        # FAKE_FFMPEG_STALL > 0: keep the pipe open without emitting —
        # models a CDN/ad-break stall (EOF only when killed)
        stall = float(os.environ.get("FAKE_FFMPEG_STALL", "0"))
        if stall > 0:
            time.sleep(stall)
        return

    if "-acodec" in args and args["-acodec"].startswith("pcm_") and pos and pos[-1] == "-":
        # decode audio: 1-second segments
        import struct

        rate = int(args["-ar"])
        ch = int(args["-ac"])
        n = int(os.environ.get("FAKE_FFMPEG_SEGMENTS", "4"))
        out = sys.stdout.buffer
        for i in range(n):
            out.write(struct.pack("<f", i * 0.01) * (rate * ch))
        out.flush()
        return

    if "-" in inputs:
        # encode: raw frames from stdin -> concat to dest
        dest = pos[-1]
        w, h = map(int, args["-s"].split("x"))
        frame_bytes = w * h * 3
        fifo = next((p for p in inputs if p != "-" and os.path.exists(p)), None)
        if fifo:
            def drain():
                fd = os.open(fifo, os.O_RDONLY)
                while True:
                    if not os.read(fd, 65536):
                        return
            threading.Thread(target=drain, daemon=True).start()
        with open(dest, "wb") as f:
            while True:
                chunk = sys.stdin.buffer.read(frame_bytes)
                if not chunk:
                    break
                f.write(chunk)
        return

    sys.exit(f"fake_ffmpeg: unrecognized command: {argv}")


if __name__ == "__main__":
    main()
