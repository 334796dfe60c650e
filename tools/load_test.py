"""Concurrent load driver for the /generate serving endpoint.

Fires N requests from C concurrent clients at a running
`python -m text2human_tpu.cli.serve` instance, optionally mixing the two
served decode presets ({"mode": "faithful"} and {"mode": "fast"},
cli/serve.py sanitize_decode), and prints ONE JSON line with sustained
throughput and per-mode latency percentiles.  This is the committed form
of the ad-hoc harness behind BENCHMARKS.md "Serving over HTTP".

  python -m text2human_tpu.cli.serve -opt configs/sample_from_pose.yml \
      --port 8000 --max-batch 16 --warmup --fast-steps 32 &
  python tools/load_test.py --requests 96 --clients 32 --fast-frac 0.5

Stdlib only (urllib + threads), mirroring the server's own stdlib stance.
"""

from __future__ import annotations

import argparse
import json
import math
import threading
import time
import urllib.error
import urllib.request


def percentile(xs, q):
    if not xs:
        return float("nan")
    xs = sorted(xs)
    # nearest-rank on the sorted sample (small-n friendly, no interpolation
    # optimism at the tail)
    k = max(0, min(len(xs) - 1, math.ceil(q / 100.0 * len(xs)) - 1))
    return xs[k]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--requests", type=int, default=96)
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--fast-frac", type=float, default=0.0,
                   help="fraction of requests sent with mode='fast' "
                        "(interleaved deterministically)")
    p.add_argument("--shape-text", default="a woman, T-shirt, pants")
    p.add_argument("--texture-text", default="pure color, pure color")
    p.add_argument("--timeout", type=float, default=600.0,
                   help="per-request HTTP timeout (s)")
    args = p.parse_args(argv)

    n = args.requests
    # deterministic interleave: request i is fast when the running quota
    # floor((i+1)*frac) advances — spreads fast requests evenly through the
    # burst instead of front-loading them
    modes = [
        "fast" if math.floor((i + 1) * args.fast_frac)
        > math.floor(i * args.fast_frac) else "faithful"
        for i in range(n)
    ]
    body = {
        "shape_text": args.shape_text,
        "texture_text": args.texture_text,
    }

    results = []  # (mode, latency_s) for successes
    errors = []
    lock = threading.Lock()
    next_i = [0]

    def client():
        while True:
            with lock:
                i = next_i[0]
                if i >= n:
                    return
                next_i[0] += 1
            payload = json.dumps({**body, "mode": modes[i]}).encode()
            req = urllib.request.Request(
                args.url.rstrip("/") + "/generate", data=payload,
                headers={"Content-Type": "application/json"},
            )
            t0 = time.time()
            try:
                with urllib.request.urlopen(req, timeout=args.timeout) as r:
                    resp = json.loads(r.read())
                if "image_png_b64" not in resp:
                    raise ValueError(f"no image in response: {list(resp)}")
                with lock:
                    results.append((modes[i], time.time() - t0))
            except Exception as e:  # noqa: BLE001 — recorded, not hidden
                with lock:
                    errors.append(f"req {i} ({modes[i]}): {e!r}")

    t_start = time.time()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t_start

    by_mode = {}
    for mode in ("faithful", "fast"):
        lats = [s for m, s in results if m == mode]
        if lats:
            by_mode[mode] = {
                "n": len(lats),
                "p50_s": round(percentile(lats, 50), 3),
                "p90_s": round(percentile(lats, 90), 3),
            }
    out = {
        "requests": n,
        "clients": args.clients,
        "ok": len(results),
        "errors": len(errors),
        "wall_s": round(wall, 2),
        "throughput_img_per_s": round(len(results) / wall, 3) if wall else 0,
        "by_mode": by_mode,
    }
    print(json.dumps(out))
    for e in errors[:10]:
        print(f"# {e}")
    return 0 if not errors else 1


if __name__ == "__main__":
    raise SystemExit(main())
