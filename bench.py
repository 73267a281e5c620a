"""Headline benchmark: sustained production-path throughput on one chip.

Measures the reference's north-star workload (BASELINE.md): 720p -> 1440p
RealESRGAN(SRVGG general-x4v3 architecture) upscale with the full fused
post-processing (color match, output resize), micro-batch 4 — i.e. the
body of FsrcnnUpscalerService.upscale_multi — over a >= 30 s window with
run-to-run variance, plus an end-to-end sustained pipeline run (paced
fake-ffmpeg source -> thread pipeline -> sink) for the like-for-like
comparison with the reference's "24 fps sustained, 0.5 % drop"
(reference README.md:20).

Prints one JSON line per metric; the LAST line is the headline
{"metric", "value", "unit", "vs_baseline"} the driver records.

Env: SHARKSHARK_BENCH_E2E_SECONDS (default 60; 0 disables the e2e run),
SHARKSHARK_BENCH_WINDOW_SECONDS (default 30).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 24.0


def device_step_bench(window_s: float) -> None:
    from sharkshark_tpu.models import cast_params, srvgg
    from sharkshark_tpu.upscale import (
        UpscaleSpec,
        enable_persistent_cache,
        upscale_multi,
    )

    # on-disk XLA executable cache (the TRT .pts analogue): repeat runs
    # skip the multi-minute 720p compile
    enable_persistent_cache()

    cfg = srvgg.GENERAL_X4V3
    params = cast_params(
        srvgg.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16
    )
    spec = UpscaleSpec(
        lr_shape=(720, 1280),
        output_shape=(1440, 2560),
        compute_dtype=jnp.bfloat16,
    )
    batch = 4  # reference micro-batch: min(4, fps) (pipeline.py:31)

    # fast epilogue: the model emits 1440p directly (pixel-shuffle and the
    # 2x bicubic downscale fused at LR resolution — ops/fused_epilogue.py)
    fn = jax.jit(
        lambda p, f: upscale_multi(
            lambda q, x: srvgg.apply_down2(q, x, cfg=cfg), p, f, spec
        )
    )

    key = jax.random.PRNGKey(1)
    frames = jax.random.randint(key, (batch, 720, 1280, 3), 0, 256, jnp.uint8)

    # Device sync: on some transports block_until_ready returns before the
    # executable finishes; a jitted scalar reduce + host fetch is a hard
    # barrier with a 4-byte transfer.
    checksum = jax.jit(lambda o: jnp.sum(o, dtype=jnp.int32))

    # compile + warmup
    float(checksum(fn(params, frames)))
    for _ in range(2):
        float(checksum(fn(params, frames)))

    # >= window_s of 10-iteration blocks; report mean fps and spread
    block = 10
    block_fps = []
    t_start = time.perf_counter()
    while time.perf_counter() - t_start < window_s:
        t0 = time.perf_counter()
        for _ in range(block):
            out = fn(params, frames)
        float(checksum(out))
        dt = time.perf_counter() - t0
        block_fps.append(block * batch / dt)

    import numpy as np

    fps = float(np.mean(block_fps))
    std = float(np.std(block_fps))
    print(
        json.dumps(
            {
                "metric": "device_step_720p_to_1440p",
                "fps_mean": round(fps, 2),
                "fps_std": round(std, 2),
                "blocks": len(block_fps),
                "window_s": round(time.perf_counter() - t_start, 1),
            }
        ),
        flush=True,
    )
    return fps


def denoise_step_bench(window_s: float) -> float | None:
    """The north-star workload (BASELINE.md): BSVD denoise + SRVGG SR +
    full post, micro-batch 4, warm steady-state executable — recorded as
    its own driver metric (VERDICT r2 item 2)."""
    from sharkshark_tpu.models import bsvd, cast_params, srvgg
    from sharkshark_tpu.upscale import (
        UpscaleSpec,
        init_denoise_state,
        upscale_batch_denoise,
    )

    cfg = srvgg.GENERAL_X4V3
    params = {
        "sr": cast_params(srvgg.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16),
        "denoise": cast_params(bsvd.init_params(jax.random.PRNGKey(1)), jnp.bfloat16),
    }
    spec = UpscaleSpec(lr_shape=(720, 1280), output_shape=(1440, 2560),
                       compute_dtype=jnp.bfloat16)
    import numpy as np

    checksum = jax.jit(lambda o: jnp.sum(o, dtype=jnp.int32))
    fps_t4 = None
    # T=4 = the reference's live micro-batch (north-star row); T=8 with
    # SR sub-batches of 4 = the throughput configuration (--batch-size 8,
    # +1 capture window of latency; BASELINE.md round 3)
    for batch, sr_sub, metric in (
        (4, None, "denoise_720p_to_1440p_fps"),
        (8, 4, "denoise_720p_to_1440p_fps_batch8"),
    ):
        step = jax.jit(
            lambda p, s, f, sb=sr_sub: upscale_batch_denoise(
                lambda q, x: srvgg.apply_down2(q, x, cfg=cfg), p, s, f, spec,
                warm=True, sr_sub_batch=sb,
            ),
            # state donation: the warm ring FIFOs update in place only
            # when XLA may alias the carry (the service donates too)
            donate_argnums=(1,),
        )
        state = init_denoise_state(1, spec)
        frames = jax.random.randint(
            jax.random.PRNGKey(2), (batch, 720, 1280, 3), 0, 256, jnp.uint8
        )
        out, state = step(params, state, frames)
        float(checksum(out))
        block, block_fps = 5, []
        t_start = time.perf_counter()
        while time.perf_counter() - t_start < window_s:
            t0 = time.perf_counter()
            for _ in range(block):
                out, state = step(params, state, frames)
            float(checksum(out))
            block_fps.append(block * batch / (time.perf_counter() - t0))

        fps = float(np.mean(block_fps))
        fps_t4 = fps_t4 if fps_t4 is not None else fps
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(fps, 2),
                    "unit": "frames/sec",
                    "fps_std": round(float(np.std(block_fps)), 2),
                    "denoise": True,
                    "micro_batch": batch,
                    "vs_baseline": round(fps / BASELINE_FPS, 3),
                }
            ),
            flush=True,
        )
    return fps_t4


def egvsr_step_bench(window_s: float) -> None:
    """EGVSR FRNet per-frame latency at the reference's 720p envelope
    point (reference egvsr_test.py:9-11: ~45 ms @ 720x1280 TRT fp16),
    production shape (nb=10, BD bicubic flow upsample —
    egvsr_upscaler.py:26), recorded as its own driver metric."""
    import numpy as np

    from sharkshark_tpu.models import cast_params, egvsr

    cfg = egvsr.PRODUCTION
    params = cast_params(
        egvsr.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16
    )
    h, w = 720, 1280
    lr = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 3), dtype=jnp.bfloat16)
    state = egvsr.init_recurrent_state(1, h, w, cfg, jnp.bfloat16)
    fn = jax.jit(lambda p, st, x: egvsr.infer_step(p, st, x, cfg=cfg))
    checksum = jax.jit(lambda o: jnp.sum(o, dtype=jnp.float32))
    out, st = fn(params, state, lr)
    float(checksum(out))
    # warm-rep discipline (VERDICT r4 item 2): 3 discarded warm blocks
    # bring the executable, the carry layout, and the tunnel's RPC path
    # to steady state before any timed block — r4's ms_std 12.86 was a
    # cold-block artifact; value = MEDIAN of timed blocks so one tunnel
    # hiccup cannot move the recorded number
    block, block_ms = 10, []
    for _ in range(3):
        st = state
        for _ in range(block):
            out, st = fn(params, st, lr)
        float(checksum(out))
    t_start = time.perf_counter()
    while time.perf_counter() - t_start < window_s:
        t0 = time.perf_counter()
        st = state
        for _ in range(block):
            out, st = fn(params, st, lr)
        float(checksum(out))
        block_ms.append((time.perf_counter() - t0) / block * 1e3)
    ms = float(np.median(block_ms))
    print(
        json.dumps(
            {
                "metric": "egvsr_720p_ms_per_frame",
                "value": round(ms, 1),
                "unit": "ms",
                "ms_mean": round(float(np.mean(block_ms)), 1),
                "ms_std": round(float(np.std(block_ms)), 2),
                "blocks": len(block_ms),
                # reference envelope: 45 ms @ 720p (lower is better)
                "vs_baseline": round(45.0 / ms, 3),
            }
        ),
        flush=True,
    )


def e2e_bench(seconds: float, fps: str, tag: str, sink: str = "file",
              denoise: bool = False, timeout_s: float | None = None):
    """Run tools/bench_e2e.py in a subprocess (its own pipeline threads +
    jax client) and return its parsed result.  fps='24' is the stress
    row (source at the reference's rate, expect shedding with bounded
    latency); fps='auto' paces the source at the measured link ceiling
    (sustained row, expect ~0 drops) — both target >= 0.9 link
    utilization now that D2H overlaps device compute."""
    out_json = f"/tmp/ss4_bench_e2e_{tag}.json"
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "bench_e2e.py"),
        "--seconds", str(seconds), "--fps", fps,
        # device-side colorspace conversion: the encoder feed goes over
        # the host link at half width (the result line records pix_fmt +
        # the measured link ceiling for interpretation)
        "--pix-fmt", "yuv420p",
        "--json-out", out_json,
        "--sink", sink,
    ]
    if not denoise:
        cmd.append("--no-denoise")
    try:
        subprocess.run(
            cmd, check=True,
            timeout=timeout_s if timeout_s else seconds * 6 + 1500,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        with open(out_json) as f:
            res = json.load(f)
        print(json.dumps(res), flush=True)
        return res
    except Exception as ex:  # noqa: BLE001 - bench must still emit headline
        print(json.dumps({"metric": "e2e_sustained_fps", "mode": tag,
                          "error": str(ex)[:200]}),
              flush=True)
        return None


def main() -> None:
    window = float(os.environ.get("SHARKSHARK_BENCH_WINDOW_SECONDS", "30"))
    e2e_s = float(os.environ.get("SHARKSHARK_BENCH_E2E_SECONDS", "45"))
    # wall-clock budget for the WHOLE bench run (VERDICT r4 item 3: the
    # round-4 driver run was killed at rc=124 mid-e2e).  Later e2e rows
    # shrink their windows — and ultimately their subprocess timeouts —
    # to fit what remains, so the run always exits 0 with every row
    # present (a row that truly cannot fit records an "error" line
    # instead of blowing the budget).
    budget_s = float(os.environ.get("SHARKSHARK_BENCH_BUDGET_S", "1500"))
    t_bench0 = time.perf_counter()

    def remaining() -> float:
        return budget_s - (time.perf_counter() - t_bench0)

    fps = device_step_bench(window)
    headline = json.dumps(
        {
            "metric": "upscale_720p_to_1440p_fps",
            "value": round(fps, 2),
            "unit": "frames/sec",
            # headline is the SR-only production path (reference's quoted
            # RealESRGAN mode); the denoise-on north star is the separate
            # denoise_720p_to_1440p_fps line above
            "denoise": False,
            "vs_baseline": round(fps / BASELINE_FPS, 3),
        }
    )
    # emit the headline immediately (the e2e pass re-compiles through the
    # remote tunnel and can take many minutes; if the harness kills the
    # run mid-e2e the headline is already on stdout), then again last so
    # a tail parse also lands on it
    print(headline, flush=True)
    fps_denoise = denoise_step_bench(min(window, 20.0))
    egvsr_step_bench(min(window, 15.0))
    if e2e_s > 0:
        # transport-free machinery proof (VERDICT r3 item 3): full
        # recoder->upscaler->streamer pipeline at the reference's 24 fps
        # with the dev tunnel's H2D/D2H byte cost elided (--sink thumb;
        # device compute + all host machinery real) — the row that
        # corresponds to reference README.md:20 (24 fps, 0.5 % drop).
        # Each row's window and subprocess timeout fit the remaining
        # budget; compiles are served by the persistent XLA cache.
        rows = [
            (max(e2e_s, 90.0), "24", "transport_free", "thumb", False),
            (e2e_s, "auto", "sustained", "file", False),
            (e2e_s, "24", "stress", "file", False),
        ]
        if fps_denoise is not None and fps_denoise >= 23.0:
            # the north-star configuration (BASELINE.md): denoise ON at
            # the reference's 24 fps — only meaningful once the device
            # step clears the source rate (VERDICT r4 item 4)
            rows.insert(
                1, (max(e2e_s, 90.0), "24", "transport_free_denoise",
                    "thumb", True)
            )
        for want_s, src_fps, tag, sink, dn in rows:
            rem = remaining()
            # overhead per row: jax client startup + warmup + link probes
            # (~90 s with a warm persistent cache)
            run_s = min(want_s, max(30.0, rem - 150.0))
            e2e_bench(run_s, src_fps, tag, sink=sink, denoise=dn,
                      timeout_s=max(60.0, rem - 30.0))
    print(headline)


if __name__ == "__main__":
    main()
