"""HTTP serving endpoint for segmentation inference.

Capability parity with `/root/reference/flask_app.py`: a model is loaded
once at startup; ``POST /predict`` accepts a NIfTI upload (multipart
form or raw body), runs whole-volume inference, writes the mask, and
``GET /getresult?file=`` downloads it.  Flask is not available in this
environment, so the app is a small self-contained WSGI application
(stdlib wsgiref/ThreadingHTTPServer) with a flask-compatible surface.

TPU-native serving details the reference lacks: the inference function is
jitted against a fixed input shape and warmed at startup (first-request
compile would otherwise take ~30 s), requests are handled on host threads
while a lock serializes device execution (single TPU executor queue).
"""
from __future__ import annotations

import io
import json
import os
import re
import threading
import urllib.parse
from typing import Callable, Optional

import numpy as np


def _parse_multipart(body: bytes, content_type: str):
    """Minimal multipart/form-data parser returning {name: (filename, data)}."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return {}
    boundary = b"--" + m.group(1).encode()
    parts = body.split(boundary)
    out = {}
    for part in parts:
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        header_blob, data = part.split(b"\r\n\r\n", 1)
        headers = header_blob.decode("latin1")
        name_m = re.search(r'name="([^"]+)"', headers)
        file_m = re.search(r'filename="([^"]*)"', headers)
        if name_m:
            out[name_m.group(1)] = (
                file_m.group(1) if file_m else None,
                data.rstrip(b"\r\n"),
            )
    return out


class SegServer:
    """WSGI app; construct with a loaded compat Model (or any object with
    ``inference(Volume, newSize) -> Volume``)."""

    def __init__(
        self,
        model,
        new_size=(112, 112, 128),
        upload_dir: str = "/tmp/tpuseg_uploads",
        result_dir: str = "/tmp/tpuseg_results",
        warmup: bool = True,
    ):
        self.model = model
        self.new_size = tuple(new_size)
        self.upload_dir = upload_dir
        self.result_dir = result_dir
        os.makedirs(upload_dir, exist_ok=True)
        os.makedirs(result_dir, exist_ok=True)
        self._lock = threading.Lock()  # single TPU executor queue
        if warmup:
            self._warmup()

    def _warmup(self):
        """Pre-jit the fixed-shape forward so the first request is fast."""
        from tpuseg.data.geometry import Volume

        w, h, d = self.new_size
        dummy = Volume(np.zeros((d, h, w), np.float32))
        try:
            self.model.inference(dummy, self.new_size)
        except Exception as e:  # stay up even if warmup fails
            print(f"[serving] warmup skipped: {e}")

    # --------------------------------------------------------------- WSGI
    def __call__(self, environ, start_response):
        method = environ["REQUEST_METHOD"]
        path = environ.get("PATH_INFO", "/")
        try:
            if method == "POST" and path == "/predict":
                return self._predict(environ, start_response)
            if method == "GET" and path == "/getresult":
                return self._getresult(environ, start_response)
            if method == "GET" and path == "/health":
                return self._json(start_response, {"status": "ok"})
            start_response("404 Not Found", [("Content-Type", "text/plain")])
            return [b"not found"]
        except Exception as e:
            start_response("500 Internal Server Error",
                           [("Content-Type", "text/plain")])
            return [f"error: {e}".encode()]

    def _predict(self, environ, start_response):
        from tpuseg.data.nifti import read_nifti, write_nifti

        length = int(environ.get("CONTENT_LENGTH") or 0)
        body = environ["wsgi.input"].read(length)
        ctype = environ.get("CONTENT_TYPE", "")
        filename = "upload.nii.gz"
        data = body
        if ctype.startswith("multipart/"):
            parts = _parse_multipart(body, ctype)
            for key in ("file", "image"):
                if key in parts and parts[key][0]:
                    filename, data = parts[key][0], parts[key][1]
                    break
        else:
            qs = urllib.parse.parse_qs(environ.get("QUERY_STRING", ""))
            filename = qs.get("filename", [filename])[0]
        filename = os.path.basename(filename)
        upload_path = os.path.join(self.upload_dir, filename)
        with open(upload_path, "wb") as f:
            f.write(data)

        vol = read_nifti(upload_path)
        with self._lock:
            mask = self.model.inference(vol, self.new_size)
        out_name = filename.replace(".nii", "_mask.nii")
        if not out_name.endswith((".nii", ".nii.gz")):
            out_name += "_mask.nii.gz"
        write_nifti(mask, os.path.join(self.result_dir, out_name))
        return self._json(
            start_response,
            {"message": "Segmentation Success!", "result": out_name},
        )

    def _getresult(self, environ, start_response):
        qs = urllib.parse.parse_qs(environ.get("QUERY_STRING", ""))
        name = os.path.basename(qs.get("file", [""])[0])
        path = os.path.join(self.result_dir, name)
        if not name or not os.path.isfile(path):
            start_response("404 Not Found", [("Content-Type", "text/plain")])
            return [b"no such result"]
        with open(path, "rb") as f:
            payload = f.read()
        start_response(
            "200 OK",
            [
                ("Content-Type", "application/octet-stream"),
                ("Content-Disposition", f"attachment; filename={name}"),
                ("Content-Length", str(len(payload))),
            ],
        )
        return [payload]

    @staticmethod
    def _json(start_response, obj):
        payload = json.dumps(obj).encode()
        start_response(
            "200 OK",
            [("Content-Type", "application/json"),
             ("Content-Length", str(len(payload)))],
        )
        return [payload]

    def as_flask_app(self):
        """If flask is installed in the deployment image, wrap the same
        endpoints in a real flask app (`flask_app.py` drop-in); raises
        ImportError otherwise — the WSGI server below needs nothing."""
        from flask import Flask, request, send_file  # gated import

        app = Flask("tpuseg")

        @app.route("/predict", methods=["POST"])
        def predict():
            f = request.files["file"]
            path = os.path.join(self.upload_dir, os.path.basename(f.filename))
            f.save(path)
            from tpuseg.data.nifti import read_nifti, write_nifti

            vol = read_nifti(path)
            with self._lock:
                mask = self.model.inference(vol, self.new_size)
            out_name = os.path.basename(path).replace(".nii", "_mask.nii")
            write_nifti(mask, os.path.join(self.result_dir, out_name))
            return {"message": "Segmentation Success!", "result": out_name}

        @app.route("/getresult", methods=["GET"])
        def getresult():
            name = os.path.basename(request.args["file"])
            return send_file(
                os.path.join(self.result_dir, name), as_attachment=True
            )

        return app

    def run(self, host: str = "0.0.0.0", port: int = 8000):
        """Blocking threaded server (`flask_app.py:62` equivalent)."""
        from wsgiref.simple_server import WSGIServer, WSGIRequestHandler, make_server
        import socketserver

        class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
            daemon_threads = True

        srv = make_server(host, port, self, server_class=ThreadingWSGIServer,
                          handler_class=WSGIRequestHandler)
        print(f"[serving] listening on {host}:{port}")
        srv.serve_forever()
        return srv
