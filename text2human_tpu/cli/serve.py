"""HTTP serving endpoint + browser frontend over the text->image pipeline.

  python -m text2human_tpu.cli.serve -opt configs/sample_from_pose.yml --port 8000

GET  /          -> single-page interactive demo (text2human_tpu/ui/web.py) —
                   the browser equivalent of the reference's PyQt5 ui_demo.py
GET  /healthz   -> {"status": "ok", "backend": ...}

POST /generate with JSON (stateless one-shot):
  {"shape_text": "...", "texture_text": "...",
   "pose_png_b64": "<base64 densepose png>",      # optional; random if absent
   "mode": "faithful" | "fast"}                   # optional decode preset
-> {"image_png_b64": ..., "parsing_png_b64": ...}

"mode": "fast" runs the maskgit decode at --fast-steps (when enabled) —
faithful and fast requests batch into their own compiled programs, so a
deployment offers both side by side without recompiles.

Stepwise session API (mirrors ui.session.InteractiveSession; one session per
server process like the reference's one demo window):
  POST /session/pose      {"pose_png_b64": ...}        (synthetic if absent)
  POST /session/parsing   {"shape_text": ...}       -> {"parsing_png_b64"}
  POST /session/paint     {"cls_id", "points" [[y,x]..], "brush"}
                                                    -> {"parsing_png_b64"}
  POST /session/undo      {}                        -> {"ok", "parsing_png_b64"?}
  POST /session/generate  {"texture_text", "sample_steps"?}
                                                    -> {"image_png_b64"}

Stdlib-only (http.server). /generate runs through a dynamic batcher
(concurrent requests coalesce into one padded TPU batch, --max-batch) and
never touches the shared InteractiveSession; /session/* requests serialize
on one lock (stateful, one editing session per process like the reference's
demo window).
"""

from __future__ import annotations

import argparse
import base64
import collections
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def to_uint8(img01: "np.ndarray") -> "np.ndarray":
    """[H,W,3] floats in [0,1] -> uint8 (same rounding as cli/sample.py)."""
    return np.clip(img01 * 255.0 + 0.5, 0, 255).astype(np.uint8)


class ServerStats:
    """Per-route request counts/latencies for the /metrics endpoint."""

    def __init__(self, window: int = 1024):
        self._lock = threading.Lock()
        self._counts = collections.Counter()
        self._errors = collections.Counter()
        self._latencies = collections.defaultdict(
            lambda: collections.deque(maxlen=window)
        )
        self._start = time.time()

    def record(self, route: str, seconds: float, ok: bool):
        with self._lock:
            self._counts[route] += 1
            if not ok:
                self._errors[route] += 1
            self._latencies[route].append(seconds)

    def snapshot(self, batcher=None) -> dict:
        with self._lock:
            routes = {}
            for route, count in self._counts.items():
                lats = sorted(self._latencies[route])
                # nearest-rank over len-1: unbiased for small windows (p50 of
                # two samples is the lower one, not the max)
                q = lambda p: lats[int(round(p * (len(lats) - 1)))]
                routes[route] = {
                    "count": count,
                    "errors": self._errors.get(route, 0),
                    "latency_s": {
                        "p50": round(q(0.50), 4),
                        "p90": round(q(0.90), 4),
                        "p99": round(q(0.99), 4),
                    },
                }
            out = {"uptime_s": round(time.time() - self._start, 1), "routes": routes}
        if batcher is not None:
            sizes = batcher.sizes_snapshot()  # recent successful batches
            out["batching"] = {
                "batches": batcher.total_batches,
                "requests": batcher.total_requests,
                "mean_batch": round(sum(sizes) / len(sizes), 2) if sizes else 0.0,
                "max_batch_seen": max(sizes) if sizes else 0,
            }
        return out


def model_pose_hw(opt) -> tuple:
    """The configured pose/model geometry (H, W)."""
    res = opt.get("synthetic_resolution") or opt.get("top_resolution") or 512
    return (res, res // 2)


def synthetic_pose(opt) -> "np.ndarray":
    """Deterministic synthetic densepose I-map at the model geometry — the
    /generate fallback AND the --warmup probe (one definition so the warmup
    compiles exactly the program real synthetic requests hit)."""
    return (
        np.random.default_rng(0)
        .uniform(0, 24, model_pose_hw(opt))
        .astype(np.float32)
    )


def choose_pad_size(n: int, max_batch: int, small: int = 4) -> int:
    """Two-tier padding: light traffic runs the small program, bursts the
    big one.

    Padding every batch to ``max_batch`` makes a lone interactive request
    pay the full serving-batch latency (3.0 s at b=16 vs 0.87 s at b=4 —
    BENCHMARKS.md); two compiled programs buy a 3.5x better single-request
    p50 at the cost of one extra compile, which the warmup covers."""
    if n <= small < max_batch:
        return small
    return max_batch


def make_batched_generate(
    session, opt, lock, max_batch: int, window_ms: float
):
    """Dynamic batcher for the stateless /generate route: concurrent requests
    coalesce into one padded TPU batch (pipelines/batching.py).  Serialized
    against the interactive session's TPU calls through the same lock."""
    import jax
    import jax.numpy as jnp

    from text2human_tpu.pipelines.batching import DynamicBatcher, pad_batch
    from text2human_tpu.ui.session import normalize_densepose, segm_to_palette
    from text2human_tpu.utils.language import (
        generate_shape_attributes,
        generate_texture_attributes,
    )

    pipe, params = session.pipe, session.params
    key_state = {"key": jax.random.key((opt.get("manual_seed") or 0) + 1)}

    def run_batch(items):
        n = len(items)
        size = choose_pad_size(n, max_batch)
        pose = np.stack(pad_batch([it["pose_i"] for it in items], size))
        pose = jnp.asarray(normalize_densepose(pose), jnp.float32)[..., None]
        shape_attr = jnp.asarray(
            np.stack(
                pad_batch(
                    [generate_shape_attributes(it["shape_text"]) for it in items],
                    size,
                )
            ),
            jnp.int32,
        )
        tex = pad_batch(
            [generate_texture_attributes(it["texture_text"])[:3] for it in items],
            size,
        )
        up, lo, ou = (
            jnp.asarray([t[i] for t in tex], jnp.int32) for i in range(3)
        )
        with lock:  # one TPU program at a time (shared with /session/*)
            key_state["key"], sub = jax.random.split(key_state["key"])
            imgs, segm = pipe.sample_from_pose(
                params, sub, pose, shape_attr, up, lo, ou,
                items[0]["steps"], items[0].get("mode", ""),
            )
            # quantize to uint8 ON DEVICE (same rounding as to_uint8): the
            # device->host copy shrinks 4x — at batch 16 that is 25 MB -> 6 MB
            # per batch, a measured ~0.5 img/s of HTTP throughput on a
            # tunneled chip (BENCHMARKS.md "Serving over HTTP")
            imgs_u8 = np.asarray(
                jnp.clip(imgs[:n] * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
            )
            segm = np.asarray(segm[:n].astype(jnp.uint8))
        return [(imgs_u8[i], segm_to_palette(segm[i])) for i in range(n)]

    # the AR decode ignores sample_steps/decode_mode (it always runs one pass
    # per position) — collapse them in the group key so request variations
    # still coalesce into one batch / one compiled program
    ar = pipe.cfgs.transformer.sampler == "autoregressive"
    return DynamicBatcher(
        run_batch,
        max_batch=max_batch,
        window_ms=window_ms,
        # different pose shapes / step counts / decode modes are different
        # compiled programs — faithful and fast requests batch separately
        group_key=lambda it: (
            it["pose_i"].shape,
            (0, "") if ar else (it["steps"], it.get("mode", "")),
        ),
        # a cold start with an empty XLA cache compiles the full pipeline
        # (minutes over the serving tunnel); queued requests must outlive it
        result_timeout_s=1800.0,
    )


def make_handler(session, opt, lock, batcher, stats=None, fast_steps: int = 0):
    from PIL import Image

    from text2human_tpu.ui.session import segm_to_palette
    from text2human_tpu.ui.web import index_html

    stats = stats if stats is not None else ServerStats()

    def png_b64(arr_uint8):
        buf = io.BytesIO()
        Image.fromarray(arr_uint8).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    ar_sampler = session.pipe.cfgs.transformer.sampler == "autoregressive"

    def sanitize_decode(req):
        """Clamp client-controlled sample_steps/mode to the served presets.

        sample_steps and decode_mode are STATIC jit arguments: every distinct
        combination is a full-pipeline XLA recompile (minutes over a serving
        tunnel) executed under the shared TPU lock — leaving them open is a
        recompile-DoS and splits otherwise-identical requests across batcher
        groups.  Exactly two presets are served: ``mode: "faithful"`` (the
        configured decode, the default) and — when --fast-steps is enabled —
        ``mode: "fast"`` (maskgit at the configured fast step count).
        Anything else is a 400.  Returns the canonical (steps, decode_mode)
        pair for the batch group/program key."""
        mode = req.get("mode", "")
        steps = int(req.get("sample_steps", 0) or 0)
        default = int(session.pipe.cfgs.sample_steps)
        if mode in ("", "default", "faithful"):
            if steps in (0, default):
                return 0, ""  # one canonical key -> one program, one group
            raise ValueError(
                f"sample_steps={steps} not served (configured: {default}); "
                "distinct step counts are distinct compiled programs "
                '(use {"mode": "fast"} for the fast preset)'
            )
        if mode == "fast":
            if fast_steps <= 0:
                raise ValueError(
                    "fast preset not enabled on this server (--fast-steps)"
                )
            if ar_sampler:
                raise ValueError(
                    "fast preset unavailable: the autoregressive decode has "
                    "no step/mode knobs"
                )
            if steps in (0, fast_steps):
                return fast_steps, "maskgit"
            raise ValueError(
                f"sample_steps={steps} not served in fast mode "
                f"(configured: --fast-steps {fast_steps})"
            )
        raise ValueError(
            f"unknown mode {mode!r} (served: 'faithful' (default), 'fast')"
        )

    def decode_pose(req):
        """densepose I-channel from the request PNG, or a synthetic one."""
        if req.get("pose_png_b64"):
            from text2human_tpu.ui.session import pose_i_from_iuv

            try:
                iuv = np.array(
                    Image.open(io.BytesIO(base64.b64decode(req["pose_png_b64"])))
                )
            except Exception as e:
                # undecodable client bytes (bad base64, not a PNG, truncated)
                # are a 400, not a 500 — PIL raises UnidentifiedImageError
                # (an OSError) which would otherwise bubble as a server error
                raise ValueError(f"pose_png_b64 is not a decodable image: {e}")
            # reference demo semantics: LANCZOS to the model resolution,
            # then keep the I channel (ui_demo.py:90-95)
            return pose_i_from_iuv(iuv, model_pose_hw(opt))
        return synthetic_pose(opt)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_html(self, html: str):
            body = html.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send_html(index_html())
            elif self.path == "/healthz":
                import jax

                self._send(200, {"status": "ok", "backend": jax.default_backend()})
            elif self.path == "/metrics":
                self._send(200, stats.snapshot(batcher))
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            t0 = time.time()
            name = "_route_" + self.path.strip("/").replace("/", "_")
            route = getattr(self, name, None)
            ok = False
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    # 'null' / arrays / strings parse fine but would hit
                    # req.get(...) as an opaque 500; they are client errors
                    raise ValueError("request body must be a JSON object")
                if route is None:
                    self._send(404, {"error": "unknown path"})
                    return
                if name in ("_route_generate", "_route_session_pose"):
                    # these routes manage the TPU lock themselves: /generate
                    # coalesces inside the batch runner, /session/pose does
                    # its CPU-heavy image decode before taking the lock
                    code, payload = route(req)
                else:
                    with lock:  # one TPU program at a time
                        code, payload = route(req)
                # PNG encoding and the response write happen OUTSIDE the
                # lock: a slow-reading client must not stall other requests
                if callable(payload):
                    payload = payload()
                self._send(code, payload)
                ok = code < 400
            except ValueError as e:  # input validation -> client error
                self._send(400, {"error": str(e)})
            except Exception as e:  # report, don't kill the server
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
            finally:
                # key stats on the CANONICAL route only: raw self.path would
                # let slash-padded variants (//generate, /generate/, ...) of
                # the same resolved route grow the stats maps without bound
                stats.record(
                    "/" + self.path.strip("/") if route is not None
                    else "<unknown>",
                    time.time() - t0,
                    ok,
                )

        # -- stateless one-shot --------------------------------------------

        def _route_generate(self, req):
            shape_text = req.get("shape_text", "a woman, T-shirt, pants")
            texture_text = req.get("texture_text", "pure color, pure color")
            # validate HERE, in the handler thread: a non-string first
            # evaluated inside the batch runner would fail the whole
            # coalesced batch (500s for innocent co-batched requests)
            if not isinstance(shape_text, str) or not isinstance(texture_text, str):
                raise ValueError("shape_text/texture_text must be strings")
            steps, mode = sanitize_decode(req)
            # always served through the batcher (a max-batch-1 batcher just
            # runs singles): the stateless route must never mutate the shared
            # InteractiveSession a /session/* user is editing through
            img_u8, parsing_rgb = batcher.submit(
                {
                    "pose_i": decode_pose(req),
                    "shape_text": shape_text,
                    "texture_text": texture_text,
                    "steps": steps,
                    "mode": mode,
                }
            )
            return 200, lambda: {
                "image_png_b64": png_b64(img_u8),
                "parsing_png_b64": png_b64(parsing_rgb),
            }

        # -- stepwise session (ui_demo.py workflow) -------------------------

        def _route_session_pose(self, req):
            # decode + LANCZOS resize of a client image is pure CPU work:
            # do it BEFORE taking the lock so queued /generate batches are
            # not stalled behind it (do_POST leaves locking to this route)
            pose_i = decode_pose(req)
            with lock:
                session.feed_pose(pose_i)
            return 200, {"h": int(pose_i.shape[0]), "w": int(pose_i.shape[1])}

        def _route_session_parsing(self, req):
            rgb = session.generate_parsing(req.get("shape_text", ""))
            return 200, lambda: {"parsing_png_b64": png_b64(rgb)}

        def _route_session_paint(self, req):
            points = [(int(y), int(x)) for y, x in req.get("points", [])]
            session.paint(
                int(req.get("cls_id", 0)), points, brush=int(req.get("brush", 3))
            )
            # snapshot under the lock: paint mutates segm in place and the
            # PNG encode runs after the lock is released
            segm = session.segm.copy()
            return 200, lambda: {"parsing_png_b64": png_b64(segm_to_palette(segm))}

        def _route_session_undo(self, req):
            undone = session.undo()
            segm = None if session.segm is None else session.segm.copy()

            def payload():
                out = {"ok": undone}
                if segm is not None:
                    out["parsing_png_b64"] = png_b64(segm_to_palette(segm))
                return out

            return 200, payload

        def _route_session_generate(self, req):
            steps, mode = sanitize_decode(req)
            img01 = session.generate_human(
                req.get("texture_text", ""),
                sample_steps=steps,
                decode_mode=mode,
            )
            img_u8 = to_uint8(img01)
            return 200, lambda: {"image_png_b64": png_b64(img_u8)}

        def log_message(self, fmt, *args):  # quiet access logs
            pass

    return Handler


def serving_batch_tiers(max_batch: int) -> tuple:
    """The distinct padded batch sizes the batcher can produce."""
    return tuple(sorted({choose_pad_size(1, max_batch), max_batch}))


def build_server(
    opt,
    synthetic: bool,
    port: int,
    max_batch: int = 1,
    window_ms: float = 30.0,
    bf16_sampler: bool = False,
    aot_path: str = "",
    fast_steps: int = 0,
):
    """/generate is always served through the dynamic batcher (so it never
    touches the shared interactive session); ``max_batch > 1`` lets
    concurrent requests coalesce into one padded TPU batch (the throughput
    sweet spot is b=16, BENCHMARKS.md). /session/* stays sequential (it is
    stateful)."""
    from text2human_tpu.cli.builders import build_pipeline
    from text2human_tpu.cli.sample import load_params
    from text2human_tpu.ui.session import InteractiveSession

    opt["model_type"] = "SampleFromPoseModel"
    pipe = build_pipeline(opt)
    params = load_params(pipe, opt, synthetic)
    if bf16_sampler:
        # halve the sampler trunk's HBM footprint (speed-neutral on v5e;
        # BENCHMARKS.md) for deployments co-locating several models per chip
        from text2human_tpu.pipelines.sample import cast_sampler_params

        params = cast_sampler_params(params)
    if aot_path:
        # boot from pre-built executables when the artifact exists (first
        # deployment exports it via --prime-cache; uncovered shapes fall
        # back to jit)
        from text2human_tpu.pipelines.aot import maybe_load_serving

        n = maybe_load_serving(pipe, aot_path)
        if n:
            print(f"AOT: loaded {n} pre-built programs from {aot_path}")
    session = InteractiveSession(pipe, params, seed=opt.get("manual_seed") or 0)
    lock = threading.Lock()
    batcher = make_batched_generate(session, opt, lock, max_batch, window_ms)
    handler = make_handler(
        session, opt, lock, batcher, fast_steps=fast_steps
    )
    class Server(ThreadingHTTPServer):
        # the stdlib default listen backlog of 5 resets connections the
        # moment a burst of concurrent clients exceeds it (measured: 32
        # simultaneous /generate posts against a 3 s batch -> ECONNRESET);
        # batched serving exists precisely for such bursts
        request_queue_size = 128

    server = Server(("127.0.0.1", port), handler)
    server.batcher = batcher  # observability (tests, ops)
    server.opt = opt  # warmup() needs the configured geometry
    server.session = session  # AOT export needs pipe + params
    server.fast_steps = (
        0 if pipe.cfgs.transformer.sampler == "autoregressive" else fast_steps
    )  # warmup/AOT need the served presets (AR has none)
    return server


def warmup(server) -> float:
    """Push synthetic requests through the /generate batcher so the pipeline
    compiles (and lands in the persistent XLA cache) BEFORE the server starts
    answering real traffic — one single request (the small-padded program)
    and, when the batcher is two-tier, one max_batch burst (the big one);
    both again for the fast preset when --fast-steps is enabled.  Returns
    the elapsed seconds."""

    def item(steps=0, mode=""):
        return {
            "pose_i": synthetic_pose(server.opt),
            "shape_text": "a woman, T-shirt, pants",
            "texture_text": "pure color, pure color",
            "steps": steps,
            "mode": mode,
        }

    presets = [(0, "")]
    if server.fast_steps > 0:
        presets.append((server.fast_steps, "maskgit"))
    t0 = time.time()
    mb = server.batcher.max_batch
    for steps, mode in presets:
        server.batcher.submit(item(steps, mode))
        if choose_pad_size(1, mb) != mb:
            # call the batch runner DIRECTLY with a full max_batch burst:
            # going through submit() lets the collect window split the burst
            # into sub-batches that all pad to the small tier and re-run the
            # already-compiled small program, leaving the big program to
            # compile (minutes, under the TPU lock) on the first real burst
            server.batcher.run_batch([item(steps, mode) for _ in range(mb)])
    return time.time() - t0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument(
        "--max-batch",
        type=int,
        default=4,
        help="dynamic batching for /generate: coalesce up to N concurrent "
        "requests into one padded TPU batch (1 = one request per batch; "
        "the batcher itself is always on)",
    )
    parser.add_argument(
        "--batch-window-ms",
        type=float,
        default=30.0,
        help="how long the first queued request waits for company",
    )
    parser.add_argument(
        "--fast-steps",
        type=int,
        default=0,
        help="serve a second decode preset: requests with {'mode': 'fast'} "
        "run the maskgit schedule at this step count (e.g. 32) alongside "
        "the configured faithful decode — each preset is its own compiled "
        "program and batch group (0 = faithful only)",
    )
    parser.add_argument(
        "--bf16-sampler",
        action="store_true",
        help="store the sampler trunk's weights in bfloat16 (halves its HBM "
        "footprint; measured speed-neutral — BENCHMARKS.md)",
    )
    parser.add_argument(
        "--warmup",
        action="store_true",
        help="compile the /generate pipeline with one synthetic batch "
        "before accepting traffic (first real request then serves at "
        "steady-state latency)",
    )
    parser.add_argument(
        "--cache-dir",
        default="",
        help="persistent XLA compilation-cache directory (default: "
        "$T2H_COMPILE_CACHE or ~/.cache/text2human_tpu/xla). Ship this "
        "directory with a deployment and a fresh process boots in seconds "
        "instead of recompiling for minutes (BENCHMARKS.md 'Serving cold "
        "start')",
    )
    parser.add_argument(
        "--prime-cache",
        action="store_true",
        help="build the server, compile both /generate pad tiers into the "
        "cache (implies --warmup), and EXIT — produces the warm-boot "
        "artifact for --cache-dir without serving traffic",
    )
    parser.add_argument(
        "--aot",
        default="",
        help="AOT executable artifact (pipelines/aot.py): with --prime-cache "
        "the compiled serving programs are EXPORTED here after warmup; on a "
        "normal boot an existing artifact is LOADED, skipping trace/lower/"
        "compile entirely (backend-specific, like any compiled binary)",
    )
    parser.add_argument(
        "--ckpt",
        default="",
        help="pipeline checkpoint directory (convert/assemble-pipeline); "
        "overrides the YAML's pipeline_checkpoint — serve trained weights "
        "without editing the config",
    )
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # persistent XLA cache: warm process starts compile in seconds
    # instead of minutes (VERDICT round-1 item #9)
    from text2human_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache(args.cache_dir)

    from text2human_tpu.config import parse

    opt = parse(args.opt, is_train=False)
    if args.ckpt:
        opt["pipeline_checkpoint"] = args.ckpt
    server = build_server(
        opt, args.synthetic, args.port,
        max_batch=args.max_batch, window_ms=args.batch_window_ms,
        bf16_sampler=args.bf16_sampler,
        aot_path="" if args.prime_cache else args.aot,
        fast_steps=args.fast_steps,
    )
    if args.warmup or args.prime_cache:
        print("warmup: compiling the /generate pipeline…")
        print(f"warmup done in {warmup(server):.1f} s")
    if args.prime_cache:
        if args.aot:
            from text2human_tpu.pipelines.aot import export_serving

            t0 = time.time()
            n = export_serving(
                server.session.pipe, server.session.params, args.aot,
                batch_sizes=serving_batch_tiers(args.max_batch),
                extra_presets=(
                    [(server.fast_steps, "maskgit")]
                    if server.fast_steps > 0 else []
                ),
            )
            print(f"AOT: exported {n} programs -> {args.aot} "
                  f"({time.time() - t0:.1f} s)")
        # both pad tiers are now in the persistent cache; the artifact is the
        # cache directory itself
        print("cache primed; exiting (--prime-cache)")
        return
    print(f"serving on http://127.0.0.1:{args.port}  (UI at /, POST /generate)")
    server.serve_forever()


if __name__ == "__main__":
    main()
