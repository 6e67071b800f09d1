#!/usr/bin/env python
"""Minimal HTTP model server over an exported artifact (stdlib only).

Loads a `unet3d-export` StableHLO artifact and serves it:

    python examples/serving/serve.py --artifact model.u3dexp --port 8642

    GET  /health        -> JSON: artifact metadata (avals, platforms, model)
    POST /predict       -> body: one .npy (np.save) array in the artifact's
                           entry layout (channel-first (B, C, D, H, W) by
                           default; (B, D, H, W, C) for entry_layout="ndhwc"
                           artifacts — check GET /health's "entry_layout"),
                           float32; response: one .npy array, same layout

The exported program is compiled once at startup; a dynamic-batch artifact
serves any batch size the client posts. Client example:

    import io, urllib.request
    import numpy as np
    buf = io.BytesIO(); np.save(buf, x)               # x: (B, C, D, H, W) f32
    req = urllib.request.Request("http://host:8642/predict", buf.getvalue())
    out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))

No model code, config, or checkpoint exists on the serving host — only jax
and the artifact (doc/Serving.md).
"""
from __future__ import annotations

import argparse
import io
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(served, lock: threading.Lock,
                 max_body_bytes: int = 1 << 30):
    class Handler(BaseHTTPRequestHandler):
        def _respond(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/health":
                return self._respond(404, b'{"error": "not found"}',
                                     "application/json")
            body = json.dumps({"status": "ok", **served.metadata}).encode()
            self._respond(200, body, "application/json")

        def do_POST(self):
            if self.path != "/predict":
                return self._respond(404, b'{"error": "not found"}',
                                     "application/json")
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > max_body_bytes:
                    body = json.dumps({"error": f"request body {n} bytes "
                                                f"exceeds limit "
                                                f"{max_body_bytes}"}).encode()
                    return self._respond(413, body, "application/json")
                x = np.load(io.BytesIO(self.rfile.read(n)), allow_pickle=False)
            except Exception as error:  # malformed body: client's fault
                body = json.dumps({"error": f"{type(error).__name__}: "
                                            f"{error}"}).encode()
                return self._respond(400, body, "application/json")
            try:
                # one request at a time on the device; the dispatch queue
                # would serialize anyway and the lock keeps latency honest
                with lock:
                    out = np.asarray(served(x))
                buf = io.BytesIO()
                np.save(buf, out)
                self._respond(200, buf.getvalue(), "application/octet-stream")
            except (ValueError, TypeError) as error:  # wrong shape/dtype
                body = json.dumps({"error": f"{type(error).__name__}: "
                                            f"{error}"}).encode()
                self._respond(400, body, "application/json")
            except Exception as error:  # device/OOM: server's fault, not 400
                body = json.dumps({"error": f"{type(error).__name__}: "
                                            f"{error}"}).encode()
                self._respond(500, body, "application/json")

        def log_message(self, fmt, *args):
            logging.info("%s - %s", self.address_string(), fmt % args)

    return Handler


def build_server(artifact: str, host: str = "127.0.0.1", port: int = 8642,
                 max_body_bytes: int = 1 << 30):
    """Load the artifact, warm the compile, return a ready HTTPServer."""
    from unet3d_tpu.predict.export import load_exported

    served = load_exported(artifact)
    logging.info("Loaded %s: in=%s platforms=%s", artifact,
                 served.metadata.get("in_avals"),
                 served.metadata.get("platforms"))
    return ThreadingHTTPServer((host, port),
                               make_handler(served, threading.Lock(),
                                            max_body_bytes=max_body_bytes))


def main(args=None):
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--artifact", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8642)
    parser.add_argument("--max_body_mb", type=int, default=1024,
                        help="Reject /predict bodies larger than this (413).")
    namespace = parser.parse_args(args)
    server = build_server(namespace.artifact, namespace.host, namespace.port,
                          max_body_bytes=namespace.max_body_mb << 20)
    logging.info("Serving on %s:%d", *server.server_address)
    server.serve_forever()


if __name__ == "__main__":
    main()
