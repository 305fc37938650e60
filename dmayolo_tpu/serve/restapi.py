"""REST serving demo: POST an image -> JSON detections.

Reference surface: utils/flask_rest_api/restapi.py:16-36 (Flask).  Flask is
not installed in this image, so this uses the stdlib http.server — zero
dependencies, same contract:

    curl -X POST -F image=@bus.jpg http://localhost:5000/v1/object-detection
    -> [{"xmin":..,"ymin":..,"xmax":..,"ymax":..,"confidence":..,"class":..,"name":..}, ...]

Run:  python -m dmayolo_tpu.serve.restapi --weights best.npz --port 5000
"""
from __future__ import annotations

import argparse
import io
import json
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

MODEL = None  # set in main()


def _parse_multipart(body: bytes, content_type: str):
    """Minimal multipart/form-data parser for a single file field."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return body  # raw bytes upload
    boundary = ("--" + m.group(1)).encode()
    for part in body.split(boundary):
        if b"\r\n\r\n" in part and (b"filename=" in part or b"name=\"image\"" in part):
            return part.split(b"\r\n\r\n", 1)[1].rstrip(b"\r\n-")
    return None


class Handler(BaseHTTPRequestHandler):
    def do_POST(self):
        if not self.path.startswith("/v1/object-detection"):
            self.send_error(404)
            return
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        data = _parse_multipart(body, self.headers.get("Content-Type", ""))
        if not data:
            self.send_error(400, "no image field")
            return
        from PIL import Image

        try:
            im = Image.open(io.BytesIO(data))
        except Exception:
            self.send_error(400, "undecodable image")
            return
        results = MODEL(np.asarray(im.convert("RGB")), size=640)
        df = results.pandas()
        payload = df.to_dict(orient="records")
        out = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, fmt, *args):
        print(f"[restapi] {self.address_string()} {fmt % args}")


def main(argv=None):
    global MODEL
    p = argparse.ArgumentParser("dmayolo-restapi")
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--cfg", type=str, default="yolov5s.yaml")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--device", type=str, default=None)
    opt = p.parse_args(argv)

    from ..hub import load

    MODEL = load(weights=opt.weights, cfg=opt.cfg, device=opt.device)
    server = ThreadingHTTPServer(("0.0.0.0", opt.port), Handler)
    print(f"serving on :{opt.port} (POST /v1/object-detection)")
    server.serve_forever()


if __name__ == "__main__":
    main()
