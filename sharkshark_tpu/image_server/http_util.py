"""Minimal WSGI micro-framework for the image service.

The reference uses Flask (backend) and FastAPI+uvicorn (frontend); neither
is on the TPU-VM image, and the service surface is four routes — so this
provides just enough: a route table with path params, JSON/bytes
responses, multipart/form-data file extraction, and a threaded stdlib
server (the reference runs gunicorn with 1 worker x 256 threads, which a
ThreadingWSGIServer matches on a single host).
"""

from __future__ import annotations

import io
import json
import re
import threading
from email.parser import BytesParser
from email.policy import HTTP
from socketserver import ThreadingMixIn
from typing import Callable
from wsgiref.simple_server import WSGIServer, make_server

__all__ = ["Router", "Request", "json_response", "bytes_response", "serve", "ThreadedWSGIServer"]


class Request:
    def __init__(self, environ: dict):
        self.environ = environ
        self.method = environ["REQUEST_METHOD"]
        self.path = environ.get("PATH_INFO", "/")
        self.query = {}
        for pair in environ.get("QUERY_STRING", "").split("&"):
            if "=" in pair:
                k, v = pair.split("=", 1)
                self.query[k] = v
        self._body: bytes | None = None

    @property
    def body(self) -> bytes:
        if self._body is None:
            length = int(self.environ.get("CONTENT_LENGTH") or 0)
            self._body = self.environ["wsgi.input"].read(length)
        return self._body

    def file(self, name: str = "file") -> bytes | None:
        """Extract an uploaded file from multipart/form-data (or return the
        raw body for direct uploads)."""
        ctype = self.environ.get("CONTENT_TYPE", "")
        if not ctype.startswith("multipart/form-data"):
            return self.body or None
        # parse with the stdlib email machinery (cgi was removed in 3.13)
        headers = f"Content-Type: {ctype}\r\n\r\n".encode()
        msg = BytesParser(policy=HTTP).parsebytes(headers + self.body)
        for part in msg.iter_parts():
            disp = part.get("Content-Disposition", "")
            if f'name="{name}"' in disp:
                return part.get_payload(decode=True)
        return None


def json_response(start_response, payload: dict, status: str = "200 OK", headers=()):
    data = json.dumps(payload).encode()
    start_response(
        status,
        [("Content-Type", "application/json"), ("Content-Length", str(len(data)))]
        + list(headers),
    )
    return [data]


def bytes_response(
    start_response,
    data: bytes,
    content_type: str = "application/octet-stream",
    status: str = "200 OK",
    headers=(),
):
    start_response(
        status,
        [("Content-Type", content_type), ("Content-Length", str(len(data)))]
        + list(headers),
    )
    return [data]


class Router:
    """Tiny WSGI app: @router.route('/upscale/file/<filename>', 'GET')."""

    def __init__(self):
        self.routes: list[tuple[str, re.Pattern, Callable]] = []

    def route(self, pattern: str, method: str = "GET"):
        regex = re.compile(
            "^" + re.sub(r"<(\w+)>", r"(?P<\1>[^/]+)", pattern) + "$"
        )

        def deco(fn):
            self.routes.append((method, regex, fn))
            return fn

        return deco

    def __call__(self, environ, start_response):
        req = Request(environ)
        for method, regex, fn in self.routes:
            if method != req.method:
                continue
            m = regex.match(req.path)
            if m:
                try:
                    return fn(req, start_response, **m.groupdict())
                except Exception as ex:  # noqa: BLE001 — 500 boundary
                    import traceback

                    traceback.print_exc()
                    return json_response(
                        start_response,
                        {"result": "err", "err": repr(ex)},
                        "500 Internal Server Error",
                    )
        return json_response(
            start_response, {"result": "err", "err": "not found"}, "404 Not Found"
        )


class ThreadedWSGIServer(ThreadingMixIn, WSGIServer):
    daemon_threads = True


def serve(app, port: int, host: str = "0.0.0.0"):
    """Run a threaded WSGI server (blocking). Returns the server object
    when started in a thread via serve_background."""
    httpd = make_server(host, port, app, server_class=ThreadedWSGIServer)
    httpd.serve_forever()


def serve_background(app, port: int, host: str = "127.0.0.1"):
    httpd = make_server(host, port, app, server_class=ThreadedWSGIServer)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd
