"""Image-service tests: both HTTP tiers live on localhost with a tiny
upscaler, caches, locks, alpha/mono handling, error paths."""

import io
import threading
import time

import httpx
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from sharkshark_tpu.image_server import (
    CacheFrontend,
    DiskImageCache,
    ImageBackend,
    LocalLockRegistry,
    MemoryImageCache,
    ReaderWriterObject,
    serve_background,
)
from sharkshark_tpu.models import srvgg
from sharkshark_tpu.upscale.service import EsrganUpscalerService

TINY = srvgg.SRVGGConfig(num_feat=16, num_conv=2)


def _tiny_upscaler(on_queue):
    svc = EsrganUpscalerService(
        lr_level=0,
        denoising=False,
        batch_size=1,
        lr_hr_resize=False,
        output_shape=None,
        on_queue=on_queue,
        compute_dtype=jnp.float32,
        srvgg_cfg=TINY,
    )
    return svc


def _png_bytes(h=24, w=32, mode="RGB", value=128):
    arr = np.full((h, w, 3), value, np.uint8)
    img = Image.fromarray(arr).convert(mode)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def backend_server():
    backend = ImageBackend(upscaler_factory=_tiny_upscaler, use_cache=True)
    httpd = serve_background(backend.app, port=0)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", backend
    httpd.shutdown()


def test_ping(backend_server):
    url, _ = backend_server
    r = httpx.get(f"{url}/upscale/ping", timeout=10)
    assert r.status_code == 200 and r.text == "pong"


def test_upscale_image_roundtrip(backend_server):
    url, _ = backend_server
    png = _png_bytes()
    r = httpx.post(
        f"{url}/upscale/image",
        files={"file": png},
        params={"return_type": "file"},
        timeout=120,
    )
    assert r.status_code == 200, r.text
    out = Image.open(io.BytesIO(r.content))
    # 24x32 is under the 64*32 pixel floor -> post_scale 1.0, so pure x4
    assert out.size == (32 * 4, 24 * 4)


def test_upscale_url_mode_and_cache_hit(backend_server):
    url, backend = backend_server
    png = _png_bytes(value=77)
    r1 = httpx.post(
        f"{url}/upscale/image", files={"file": png},
        params={"return_type": "url"}, timeout=120,
    )
    assert r1.status_code == 200
    body = r1.json()
    assert body["result"] == "ok" and body["url"].startswith("/upscale/file/")
    r2 = httpx.post(
        f"{url}/upscale/image", files={"file": png},
        params={"return_type": "url"}, timeout=120,
    )
    assert r2.json()["cache"] == "hit"
    # the cached file is servable
    r3 = httpx.get(f"{url}{body['url']}", timeout=10)
    assert r3.status_code == 200 and len(r3.content) > 0


def test_alpha_image_returns_png_with_alpha(backend_server):
    url, _ = backend_server
    arr = np.full((20, 20, 4), 100, np.uint8)
    arr[..., 3] = 200
    buf = io.BytesIO()
    Image.fromarray(arr, "RGBA").save(buf, format="PNG")
    r = httpx.post(
        f"{url}/upscale/image", files={"file": buf.getvalue()}, timeout=120
    )
    assert r.status_code == 200
    out = Image.open(io.BytesIO(r.content))
    assert out.mode == "RGBA"


def test_bad_blob_is_500(backend_server):
    url, _ = backend_server
    r = httpx.post(
        f"{url}/upscale/image", files={"file": b"not an image"}, timeout=30
    )
    assert r.status_code == 500
    assert "img is none" in r.json()["err"]


def test_forbidden_path(backend_server):
    url, _ = backend_server
    r = httpx.get(f"{url}/upscale/file/..%2Fetc", timeout=10)
    assert r.status_code in (404, 500)


def test_frontend_proxies_and_caches(backend_server):
    backend_url, _ = backend_server
    fe = CacheFrontend(backend_url=f"{backend_url}/upscale/image")
    httpd = serve_background(fe.app, port=0)
    fe_url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        png = _png_bytes(value=55)
        r1 = httpx.post(f"{fe_url}/upscale/image", files={"file": png}, timeout=120)
        assert r1.status_code == 200 and r1.json()["cache"] == "miss"
        r2 = httpx.post(f"{fe_url}/upscale/image", files={"file": png}, timeout=30)
        assert r2.json()["cache"] == "hit"
        url = r2.json()["url"]
        r3 = httpx.get(f"{fe_url}{url}", timeout=10)
        assert r3.status_code == 200
        assert r3.headers["access-control-allow-origin"] == "*"
    finally:
        httpd.shutdown()


def test_memory_cache_lru_eviction():
    c = MemoryImageCache(max_size=100)
    c.write_file("a", io.BytesIO(b"x" * 60))
    time.sleep(0.01)
    c.write_file("b", io.BytesIO(b"y" * 60))
    assert c.has_file("a") is None  # evicted
    assert c.has_file("b") is not None


def test_disk_cache(tmp_path):
    c = DiskImageCache(root=str(tmp_path), max_size=1000)
    url = c.write_file("f.png", io.BytesIO(b"data"))
    assert url == "/upscale/file/f.png"
    assert c.has_file("f.png") is not None
    assert c.read_file("f.png").getvalue() == b"data"
    # second instance claims a different storage dir
    c2 = DiskImageCache(root=str(tmp_path), max_size=1000)
    assert c2.idx != c.idx


def test_rw_lock_allows_concurrent_readers():
    obj = ReaderWriterObject({"k": 1})
    n_inside = []
    barrier = threading.Barrier(3, timeout=5)

    def reader():
        with obj.read() as v:
            barrier.wait()  # all 3 readers inside simultaneously
            n_inside.append(v["k"])

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert n_inside == [1, 1, 1]


def test_local_lock_registry_serializes():
    reg = LocalLockRegistry()
    order = []

    def work(tag):
        lock = reg.file_lock("k")
        lock.acquire()
        order.append(f"{tag}-in")
        time.sleep(0.05)
        order.append(f"{tag}-out")
        lock.release()

    t1 = threading.Thread(target=work, args=("a",))
    t2 = threading.Thread(target=work, args=("b",))
    t1.start(); t2.start(); t1.join(); t2.join()
    # no interleaving: every -in is followed by its own -out
    assert order[0][:1] == order[1][:1] and order[2][:1] == order[3][:1]


def test_concurrent_duplicate_uploads_both_succeed(backend_server):
    """Identical bytes posted concurrently must not clobber each other's
    pending-result waiters (regression: sha1-keyed registry overwrite)."""
    import concurrent.futures

    url, _ = backend_server
    png = _png_bytes(value=201)

    def post():
        return httpx.post(
            f"{url}/upscale/image", files={"file": png},
            params={"return_type": "file"}, timeout=120,
        ).status_code

    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        codes = list(pool.map(lambda _: post(), range(4)))
    assert codes == [200, 200, 200, 200], codes


class FakeRedis:
    """redis-py get/set/exists/lock surface over one shared dict — the
    coordination substrate two frontend hosts would share in production."""

    def __init__(self):
        import threading

        self._kv = {}
        self._locks = {}
        self._guard = threading.Lock()

    def get(self, k):
        return self._kv.get(k)

    def set(self, k, v):
        self._kv[k] = v

    def exists(self, k):
        return int(k in self._kv)

    def lock(self, name, timeout=None, blocking_timeout=None):
        import threading

        from sharkshark_tpu.image_server.caches import LocalLockRegistry

        with self._guard:
            reg = self._locks.setdefault("_reg", LocalLockRegistry())
        return reg.file_lock(name, timeout or 30, blocking_timeout or 10)


def test_multihost_frontends_share_redis_cache(backend_server):
    """Two frontend instances (as on two serving hosts) with one shared
    Redis: host A's miss fills the cache; host B serves the same image as
    a hit without touching the GPU backend (reference cache_frontend.py
    Redis existence check + per-file distributed lock)."""
    from sharkshark_tpu.image_server.caches import RedisImageCache

    backend_url, _ = backend_server
    shared = FakeRedis()
    fe_a = CacheFrontend(
        backend_url=f"{backend_url}/upscale/image",
        cache=RedisImageCache(client=shared),
    )
    fe_b = CacheFrontend(
        backend_url="http://127.0.0.1:1/upscale/image",  # unreachable: B must hit cache
        cache=RedisImageCache(client=shared),
    )
    ha = serve_background(fe_a.app, port=0)
    hb = serve_background(fe_b.app, port=0)
    try:
        png = _png_bytes(value=77)
        ra = httpx.post(
            f"http://127.0.0.1:{ha.server_address[1]}/upscale/image",
            files={"file": png}, timeout=120,
        )
        assert ra.status_code == 200 and ra.json()["cache"] == "miss"
        rb = httpx.post(
            f"http://127.0.0.1:{hb.server_address[1]}/upscale/image",
            files={"file": png}, timeout=30,
        )
        assert rb.status_code == 200 and rb.json()["cache"] == "hit"
        rfile = httpx.get(
            f"http://127.0.0.1:{hb.server_address[1]}{rb.json()['url']}", timeout=10
        )
        assert rfile.status_code == 200 and len(rfile.content) > 0
    finally:
        ha.shutdown()
        hb.shutdown()


def test_shape_bucketing_bounds_executables(backend_server):
    """Different request sizes inside one SHAPE_BUCKET land on the same
    device shape (bounded executable count) and the output crops back to
    exactly 4x the original size."""
    base, backend = backend_server
    seen = set()
    orig = backend._upscaler.push_job

    def spy(entry, *a, **k):
        seen.add(tuple(np.asarray(entry.frames).shape))
        return orig(entry, *a, **k)

    backend._upscaler.push_job = spy
    try:
        sizes = [(24, 32), (30, 40), (17, 50)]
        for h, w in sizes:
            r = httpx.post(
                f"{base}/upscale/image",
                content=_png_bytes(h, w, value=90),
                timeout=60,
            )
            assert r.status_code == 200
            img = Image.open(io.BytesIO(r.content))
            assert img.size == (w * 4, h * 4), (img.size, (w, h))
    finally:
        backend._upscaler.push_job = orig
    assert len(seen) == 1 and seen.pop()[1:3] == (64, 64), seen


def test_bucket_padding_respects_max_pixels(backend_server, monkeypatch):
    """ADVICE r2: SHAPE_BUCKET padding must not push the device tensor
    past the engine-tested MAX_PIXELS — near the cap the image is
    snapped DOWN to the bucket grid instead of padded up."""
    import sharkshark_tpu.image_server.backend as backend_mod

    base, backend = backend_server
    monkeypatch.setattr(backend_mod, "MAX_PIXELS", 64 * 96)
    seen = []
    orig = backend._upscaler.push_job

    def spy(entry, *a, **k):
        seen.append(tuple(np.asarray(entry.frames).shape))
        return orig(entry, *a, **k)

    backend._upscaler.push_job = spy
    try:
        # 60x90 passes the raw cap (5400 <= 6144) but buckets to 64x128
        # = 8192 without the fix
        r = httpx.post(
            f"{base}/upscale/image", content=_png_bytes(60, 90), timeout=60
        )
        assert r.status_code == 200
    finally:
        backend._upscaler.push_job = orig
    assert seen and all(s[1] * s[2] <= 64 * 96 for s in seen), seen


def test_url_return_without_cache_is_rejected():
    """return_type=url with use_cache=False must 400 (the URL contract
    needs the file cache behind it), not return raw image bytes."""
    backend = ImageBackend(upscaler_factory=_tiny_upscaler, use_cache=False)
    httpd = serve_background(backend.app, port=0)
    try:
        port = httpd.server_address[1]
        r = httpx.post(
            f"http://127.0.0.1:{port}/upscale/image",
            params={"return_type": "url"},
            files={"file": ("t.png", _png_bytes())},
            timeout=30,
        )
        assert r.status_code == 400, r.status_code
        assert "use-cache" in r.json()["err"]
    finally:
        httpd.shutdown()


def test_mono_detection_survives_rgb_convert():
    """Grayscale uploads must set is_mono (the flag was dead after the
    unconditional convert('RGB'))."""
    rgb, alpha, mono = ImageBackend._decode(_png_bytes(mode="L"))
    assert mono and rgb.ndim == 3 and rgb.shape[-1] == 3
    rgb2, _, mono2 = ImageBackend._decode(_png_bytes(mode="RGB"))
    assert not mono2
