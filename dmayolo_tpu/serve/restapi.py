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

MODEL = None    # set in main()
BATCHER = None  # set in main() under --batch-serve
IMGSZ = 640     # set in main()


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
        rgb = np.asarray(im.convert("RGB"))
        try:
            if BATCHER is not None:
                # micro-batched path: concurrent requests ride one device batch
                names = BATCHER.names
                payload = [
                    {"xmin": float(x1), "ymin": float(y1), "xmax": float(x2),
                     "ymax": float(y2), "confidence": float(conf),
                     "class": int(cls), "name": names[int(cls)]}
                    for x1, y1, x2, y2, conf, cls in BATCHER(rgb, timeout=60)
                ]
            else:
                results = MODEL(rgb, size=IMGSZ)
                # reference restapi.py: results.pandas().xyxy[0].to_json()
                df = results.pandas().xyxy[0]
                payload = df.to_dict(orient="records")
        except Exception as e:  # a failed inference is a 500, not a dropped socket
            self.send_error(500, f"inference failed: {type(e).__name__}")
            return
        out = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, fmt, *args):
        print(f"[restapi] {self.address_string()} {fmt % args}")


def main(argv=None):
    global MODEL, BATCHER
    p = argparse.ArgumentParser("dmayolo-restapi")
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--cfg", type=str, default="yolov5s.yaml")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--batch-serve", type=int, default=0, metavar="MAX_BATCH",
                   help="micro-batch concurrent requests up to this device "
                        "batch (0 = per-request batch-1 like the reference)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="how long a request waits for batch co-riders")
    p.add_argument("--imgsz", type=int, default=640)
    # detection contract of the batched path, defaulted to match the
    # per-request AutoShape path (conf 0.25 / iou 0.45 / max_det 1000);
    # max-nms is the pre-NMS top-k budget (candidates above conf)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=1000)
    p.add_argument("--max-nms", type=int, default=4096)
    opt = p.parse_args(argv)

    global IMGSZ
    IMGSZ = opt.imgsz
    if opt.batch_serve > 0:
        import jax

        if opt.device:
            jax.config.update("jax_platforms", opt.device)
        from ..cli.common import load_model_from_checkpoint
        from .batcher import MicroBatcher

        model, params, stats = load_model_from_checkpoint(opt.weights, opt.cfg)
        BATCHER = MicroBatcher(model, params, stats, imgsz=opt.imgsz,
                               max_batch=opt.batch_serve,
                               max_wait_ms=opt.max_wait_ms,
                               conf_thres=opt.conf_thres,
                               iou_thres=opt.iou_thres,
                               max_det=opt.max_det, max_nms=opt.max_nms)
        print(f"micro-batching up to {opt.batch_serve} reqs/"
              f"{opt.max_wait_ms} ms; compiling batch buckets ...")
        BATCHER.warmup()
    else:
        from ..hub import load

        MODEL = load(weights=opt.weights, cfg=opt.cfg, device=opt.device)
        MODEL.conf, MODEL.iou, MODEL.max_det = (
            opt.conf_thres, opt.iou_thres, opt.max_det)
    server = ThreadingHTTPServer(("0.0.0.0", opt.port), Handler)
    print(f"serving on :{opt.port} (POST /v1/object-detection)")
    server.serve_forever()


if __name__ == "__main__":
    main()
