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

        # browser frontend: GET / serves the single-page UI with the palette
        # and the reference's 24 class names injected
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/html")
            page = r.read().decode()
        assert "Text2Human" in page and "/session/paint" in page
        assert "wrist wearing" in page and "[0, 0, 0]" in page

        # stepwise session workflow: pose -> parsing -> paint -> undo -> generate
        def post(path, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        assert "h" in post("/session/pose", {})
        p0 = post("/session/parsing", {"shape_text": "a woman, T-shirt, pants"})
        import io

        from PIL import Image

        from text2human_tpu.ui.session import palette_to_segm

        rgb0 = np.array(
            Image.open(io.BytesIO(base64.b64decode(p0["parsing_png_b64"])))
        )
        p1 = post(
            "/session/paint",
            {"cls_id": 13, "points": [[2, 2], [3, 3]], "brush": 3},
        )
        rgb1 = np.array(
            Image.open(io.BytesIO(base64.b64decode(p1["parsing_png_b64"])))
        )
        assert (palette_to_segm(rgb1)[:5, :5] == 13).any()
        undo = post("/session/undo", {})
        assert undo["ok"]
        rgb2 = np.array(
            Image.open(io.BytesIO(base64.b64decode(undo["parsing_png_b64"])))
        )
        np.testing.assert_array_equal(rgb2, rgb0)
        gen = post(
            "/session/generate", {"texture_text": "denim", "sample_steps": 4}
        )
        img2 = np.array(
            Image.open(io.BytesIO(base64.b64decode(gen["image_png_b64"])))
        )
        assert img2.ndim == 3 and img2.shape[2] == 3
    finally:
        server.shutdown()
