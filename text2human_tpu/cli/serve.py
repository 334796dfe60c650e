"""Minimal HTTP serving endpoint over the text->image pipeline.

  python -m text2human_tpu.cli.serve -opt configs/sample_from_pose.yml --port 8000

POST /generate with JSON:
  {"shape_text": "...", "texture_text": "...",
   "pose_png_b64": "<base64 densepose png>"}      # optional; random if absent
-> {"image_png_b64": ..., "parsing_png_b64": ...}

GET /healthz -> {"status": "ok", "backend": ...}

Stdlib-only (http.server); model state lives in one InteractiveSession per
process, requests are serialized (one TPU program at a time is the fast path
anyway). For real deployments put this behind a batching frontend.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(session, opt, lock):
    from PIL import Image

    from text2human_tpu.ui.session import segm_to_palette

    def png_b64(arr_uint8):
        buf = io.BytesIO()
        Image.fromarray(arr_uint8).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._send(200, {"status": "ok", "backend": jax.default_backend()})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                shape_text = req.get("shape_text", "a woman, T-shirt, pants")
                texture_text = req.get("texture_text", "pure color, pure color")
                steps = int(req.get("sample_steps", 0))

                if req.get("pose_png_b64"):
                    iuv = np.array(
                        Image.open(io.BytesIO(base64.b64decode(req["pose_png_b64"])))
                    )
                    pose_i = iuv[..., 2] if iuv.ndim == 3 else iuv
                    factor = opt.get("downsample_factor") or 2
                    pose_i = pose_i[::factor, ::factor].astype(np.float32)
                else:
                    res = (
                        opt.get("synthetic_resolution")
                        or opt.get("top_resolution")
                        or 512
                    )
                    pose_i = np.random.default_rng(0).uniform(
                        0, 24, (res, res // 2)
                    ).astype(np.float32)

                with lock:  # one TPU program at a time
                    session.feed_pose(pose_i)
                    parsing_rgb = session.generate_parsing(shape_text)
                    img01 = session.generate_human(texture_text, sample_steps=steps)

                img_u8 = np.clip(img01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
                self._send(
                    200,
                    {
                        "image_png_b64": png_b64(img_u8),
                        "parsing_png_b64": png_b64(parsing_rgb),
                    },
                )
            except Exception as e:  # report, don't kill the server
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet access logs
            pass

    return Handler


def build_server(opt, synthetic: bool, port: int):
    from text2human_tpu.cli.builders import build_pipeline
    from text2human_tpu.cli.sample import load_params
    from text2human_tpu.ui.session import InteractiveSession

    opt["model_type"] = "SampleFromPoseModel"
    pipe = build_pipeline(opt)
    params = load_params(pipe, opt, synthetic)
    session = InteractiveSession(pipe, params, seed=opt.get("manual_seed") or 0)
    handler = make_handler(session, opt, threading.Lock())
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # persistent XLA cache: warm process starts compile in seconds
    # instead of minutes (VERDICT round-1 item #9)
    from text2human_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    from text2human_tpu.config import parse

    opt = parse(args.opt, is_train=False)
    server = build_server(opt, args.synthetic, args.port)
    print(f"serving on http://127.0.0.1:{args.port}  (POST /generate)")
    server.serve_forever()


if __name__ == "__main__":
    main()
