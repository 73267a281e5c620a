#!/usr/bin/env python
"""Image-service load test.

Parity with reference src/main/tests/test_image_pipeline.py:15-92: hammer
a running /upscale/image endpoint with a directory of images from a
process/thread pool over several rounds, reporting ok/err/cache-hit rates
and requests-per-second.

Usage:
  python tools/load_test.py --url http://127.0.0.1:8086/upscale/image \
      --images ./samples --workers 64 --rounds 5
"""

from __future__ import annotations

import argparse
import os
import random
import time
from concurrent.futures import ThreadPoolExecutor

import httpx


def one_request(url: str, path: str) -> tuple[str, float]:
    t0 = time.time()
    try:
        with open(path, "rb") as f:
            data = f.read()
        r = httpx.post(url, files={"file": data},
                       params={"return_type": "url"}, timeout=120)
        if r.status_code != 200:
            return "err", time.time() - t0
        body = r.json()
        if body.get("result") != "ok":
            return "err", time.time() - t0
        return ("hit" if body.get("cache") == "hit" else "ok"), time.time() - t0
    except Exception:
        return "err", time.time() - t0


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8086/upscale/image")
    p.add_argument("--images", required=True)
    p.add_argument("--workers", type=int, default=64)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--requests-per-round", type=int, default=256)
    p.add_argument("--unique", action="store_true",
                   help="each request uses a distinct image (cache-miss "
                        "round: every request pays the real model)")
    args = p.parse_args(argv)

    files = [
        os.path.join(args.images, f)
        for f in os.listdir(args.images)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    ]
    assert files, f"no images under {args.images}"

    for rnd in range(args.rounds):
        if args.unique:
            batch = random.sample(files, min(args.requests_per_round, len(files)))
        else:
            batch = [random.choice(files) for _ in range(args.requests_per_round)]
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=args.workers) as pool:
            pairs = list(pool.map(lambda f: one_request(args.url, f), batch))
        dt = time.time() - t0
        results = [s for s, _ in pairs]
        lats = sorted(t for _, t in pairs)
        n = len(results)
        ok = results.count("ok") + results.count("hit")
        err = results.count("err")
        hit = results.count("hit")
        p50 = lats[n // 2]
        p99 = lats[min(n - 1, int(n * 0.99))]
        print(
            f"round {rnd}: rps={n / dt:.1f} ok_rate={ok / n:.3f} "
            f"err_rate={err / n:.3f} cache_rate={hit / max(ok, 1):.3f} "
            f"p50={p50:.2f}s p99={p99:.2f}s"
        )


if __name__ == "__main__":
    main()
