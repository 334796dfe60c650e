"""HTTP serving endpoint test: real requests against the tiny pipeline."""

import base64
import json
import threading
import urllib.request

import numpy as np

from text2human_tpu.cli.serve import build_server
from text2human_tpu.config import parse


def test_serve_generate_roundtrip():
    opt = parse("configs/debug/sample_from_pose_debug.yml", is_train=False)
    server = build_server(opt, synthetic=True, port=0)  # ephemeral port
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(
                {
                    "shape_text": "a woman, short-sleeve T-shirt, long pants",
                    "texture_text": "pure color, denim",
                    "sample_steps": 4,
                }
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        from PIL import Image
        import io

        img = np.array(
            Image.open(io.BytesIO(base64.b64decode(out["image_png_b64"])))
        )
        assert img.ndim == 3 and img.shape[2] == 3
        parsing = np.array(
            Image.open(io.BytesIO(base64.b64decode(out["parsing_png_b64"])))
        )
        assert parsing.shape == img.shape

        # error path: malformed body -> 500 with a named error, server survives
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=b"{not json",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 500
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.shutdown()
