"""HTTP serving endpoint test: real requests against the tiny pipeline."""

import base64
import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from text2human_tpu.cli.serve import build_server
from text2human_tpu.config import parse
from text2human_tpu.pipelines.batching import DynamicBatcher, pad_batch


def test_dynamic_batcher_unit():
    """Coalescing, group separation, padding, and error propagation."""
    calls = []

    def run(items):
        calls.append(len(items))
        return [x * 2 for x in items]

    b = DynamicBatcher(run, max_batch=4, window_ms=300)
    with ThreadPoolExecutor(3) as ex:
        results = list(ex.map(b.submit, [1, 2, 3]))
    assert results == [2, 4, 6]
    assert sum(calls) == 3
    assert len(calls) <= 2  # at least two requests coalesced

    # group_key: odd/even must never share a batch
    seen = []

    def run_groups(items):
        seen.append(sorted(items))
        return items

    g = DynamicBatcher(
        run_groups, max_batch=8, window_ms=300, group_key=lambda x: x % 2
    )
    with ThreadPoolExecutor(4) as ex:
        list(ex.map(g.submit, [1, 2, 3, 4]))
    for batch in seen:
        assert len({x % 2 for x in batch}) == 1

    # a failing batch raises in every submitter and the worker survives
    def run_fail(items):
        raise ValueError("boom")

    f = DynamicBatcher(run_fail, max_batch=2, window_ms=10)
    try:
        f.submit(1, timeout=30)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

    assert pad_batch([1, 2], 4) == [1, 2, 2, 2]
    assert pad_batch([], 4) == []


def test_serve_generate_dynamic_batching():
    """Concurrent /generate requests coalesce into one padded TPU batch."""
    opt = parse("configs/debug/sample_from_pose_debug.yml", is_train=False)
    server = build_server(
        opt, synthetic=True, port=0, max_batch=4, window_ms=1000.0
    )
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        def gen(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(
                    {
                        "shape_text": "a woman, T-shirt, pants",
                        "texture_text": "pure color, denim",
                        "sample_steps": 4,
                    }
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

        with ThreadPoolExecutor(3) as ex:
            outs = list(ex.map(gen, range(3)))
        import io

        from PIL import Image

        for out in outs:
            img = np.array(
                Image.open(io.BytesIO(base64.b64decode(out["image_png_b64"])))
            )
            assert img.ndim == 3 and img.shape[2] == 3
        sizes = server.batcher.batch_sizes
        assert sum(sizes) == 3
        assert max(sizes) >= 2, sizes  # requests actually coalesced

        # observability endpoint reflects the traffic (stats are recorded
        # just after the response is flushed — poll briefly)
        import time as _time

        for _ in range(50):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=30
            ) as r:
                metrics = json.loads(r.read())
            if metrics["routes"].get("/generate", {}).get("count") == 3:
                break
            _time.sleep(0.1)
        assert metrics["routes"]["/generate"]["count"] == 3
        assert metrics["routes"]["/generate"]["errors"] == 0
        assert metrics["routes"]["/generate"]["latency_s"]["p50"] > 0
        assert metrics["batching"]["requests"] == 3
        assert metrics["batching"]["max_batch_seen"] >= 2
    finally:
        server.shutdown()


def test_serve_generate_roundtrip():
    from text2human_tpu.cli.serve import warmup

    opt = parse("configs/debug/sample_from_pose_debug.yml", is_train=False)
    server = build_server(opt, synthetic=True, port=0)  # ephemeral port
    # --warmup path: one synthetic batch compiles the pipeline pre-traffic
    assert warmup(server) > 0
    assert server.batcher.total_batches == 1
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
            assert e.code == 400  # malformed JSON is a client error

        # client-controlled sample_steps is a static jit arg: arbitrary
        # values must be rejected (recompile-DoS), the configured count and
        # 0/omitted accepted
        bad_steps = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"sample_steps": 7}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad_steps, timeout=30)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert b"sample_steps" in e.read()
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

        def expect_400(path, body):
            try:
                post(path, body)
                raise AssertionError(f"expected HTTPError for {path}")
            except urllib.error.HTTPError as e:
                assert e.code == 400, (path, e.code)

        # session-ordering violations and undecodable client bytes are
        # CLIENT errors (400), not server 500s
        expect_400("/session/parsing", {"shape_text": "a woman"})
        expect_400("/session/generate", {"texture_text": "denim"})
        expect_400(
            "/session/pose",
            {"pose_png_b64": base64.b64encode(b"not a png").decode()},
        )
        expect_400(
            "/generate",
            {"pose_png_b64": base64.b64encode(b"junk bytes").decode()},
        )

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


def test_server_stats_percentiles():
    """Nearest-rank over len-1: p50 of a two-sample window is the lower
    sample, not the max (the naive int(p*len) index is biased high)."""
    from text2human_tpu.cli.serve import ServerStats

    stats = ServerStats()
    stats.record("/x", 1.0, True)
    stats.record("/x", 3.0, True)
    snap = stats.snapshot()["routes"]["/x"]["latency_s"]
    assert snap["p50"] == 1.0
    assert snap["p99"] == 3.0
    for v in [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]:
        stats.record("/y", v, True)
    snap = stats.snapshot()["routes"]["/y"]["latency_s"]
    assert snap["p50"] == 0.5  # round(0.5 * 9) = index 4
    assert snap["p90"] == 0.9
    assert snap["p99"] == 1.0


def test_choose_pad_size():
    """Two-tier padding: light traffic -> small program, bursts -> big."""
    from text2human_tpu.cli.serve import choose_pad_size

    assert choose_pad_size(1, 16) == 4
    assert choose_pad_size(4, 16) == 4
    assert choose_pad_size(5, 16) == 16
    assert choose_pad_size(16, 16) == 16
    assert choose_pad_size(1, 4) == 4   # small == max: one program
    assert choose_pad_size(1, 1) == 1
    assert choose_pad_size(2, 2) == 2


def test_dynamic_batcher_group_key_failure_isolated():
    """A raising group_key must fail THAT request, not kill the worker
    thread (which would leave every later future hanging forever)."""
    def run(items):
        return [x * 2 for x in items]

    def key(item):
        if item == "bad":
            raise KeyError("missing field")
        return None

    b = DynamicBatcher(run, max_batch=2, window_ms=5, group_key=key)
    with pytest.raises(KeyError):
        b.submit("bad", timeout=30)
    # the worker survived and keeps serving
    assert b.submit(21, timeout=30) == 42


def test_dynamic_batcher_sheds_timed_out_requests():
    """A submit() that timed out is cancelled; the worker must skip it
    instead of burning a TPU batch on a result nobody will read."""
    import threading
    import time as _time

    started = threading.Event()
    release = threading.Event()
    ran = []

    def run(items):
        ran.append(list(items))
        started.set()
        release.wait(30)
        return list(items)

    b = DynamicBatcher(run, max_batch=1, window_ms=1)
    with ThreadPoolExecutor(2) as ex:
        first = ex.submit(b.submit, "live", 30)
        assert started.wait(10)  # worker is now blocked inside run_batch
        with pytest.raises(TimeoutError):
            b.submit("abandoned", timeout=0.05)  # times out + cancels
        release.set()
        assert first.result(30) == "live"
        # give the worker a moment to drain the abandoned entry
        deadline = _time.time() + 5
        while _time.time() < deadline and b.submit("after", 30) != "after":
            pass
    assert ["abandoned"] not in ran  # shed, never executed


def test_serve_mixed_decode_modes():
    """Per-request decode presets: faithful and fast requests in the same
    burst succeed, batch into their OWN groups (a group per compiled
    program), and invalid/disabled modes are 400s (VERDICT r3 task 5)."""
    opt = parse("configs/debug/sample_from_pose_debug.yml", is_train=False)
    server = build_server(
        opt, synthetic=True, port=0, max_batch=4, window_ms=1500.0,
        fast_steps=2,
    )
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        def gen(mode):
            body = {"shape_text": "a woman, T-shirt, pants",
                    "texture_text": "pure color, denim"}
            if mode:
                body["mode"] = mode
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        # mixed burst: 2 faithful + 2 fast, all in one collect window
        with ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(gen, ["", "fast", "faithful", "fast"]))
        assert [c for c, _ in outs] == [200] * 4
        for _, out in outs:
            assert out["image_png_b64"]
        # 4 requests ran as exactly 2 groups of 2 (one per preset/program)
        sizes = server.batcher.sizes_snapshot()
        assert sum(sizes) == 4
        assert sorted(sizes) == [2, 2], sizes

        # validation: unknown mode is a 400, steps must match the preset
        code, err = gen("turbo")
        assert code == 400 and "unknown mode" in err["error"]
        body = {"mode": "fast", "sample_steps": 3}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
    finally:
        server.shutdown()

    # a server without --fast-steps refuses the fast preset loudly
    server = build_server(opt, synthetic=True, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"mode": "fast"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
        assert "fast preset not enabled" in json.loads(ei.value.read())["error"]
    finally:
        server.shutdown()


def test_client_error_mappings_and_stats_canonicalization():
    """Malformed-but-parseable bodies and non-string text fields are 400s
    (never 500s that would fail a coalesced batch), and stats key by the
    CANONICAL route so slash-padded path variants cannot grow the maps."""
    opt = parse("configs/debug/sample_from_pose_debug.yml", is_train=False)
    server = build_server(opt, synthetic=True, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        def post(path, body: bytes):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=body,
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    return r.status
            except urllib.error.HTTPError as e:
                return e.code

        assert post("/generate", b"null") == 400
        assert post("/generate", b"[1, 2]") == 400
        assert post("/generate", json.dumps({"shape_text": 123}).encode()) == 400
        assert post("/generate", json.dumps(
            {"texture_text": ["not", "a", "string"]}).encode()) == 400

        # slash-padded variants of a real route collapse to one stats key
        for p in ("/session/undo", "//session/undo", "/session/undo/"):
            post(p, b"{}")
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=30
        ) as r:
            m = json.loads(r.read())
        undo_keys = [k for k in m["routes"] if "undo" in k]
        assert undo_keys == ["/session/undo"]
        assert m["routes"]["/session/undo"]["count"] == 3
    finally:
        server.shutdown()
