"""Multi-controller (multi-host) training, executed virtually.

Two OS processes, each owning 4 virtual CPU devices, form one 8-device dp
mesh via ``jax.distributed.initialize`` (gloo collectives) — the same
multi-controller SPMD model a TPU pod uses, with one process per host.
Covers per-host batch sharding (each process device_puts only its
addressable shards — parallel/mesh._put), a real dp train step over the
global mesh, the orbax multihost checkpoint save, and a sharded
checkpoint restore via --resume.  Loss parity with a single-process run of
the same config/seed pins the semantics, not just liveness.
"""

import json
import os
import shutil
import socket
import subprocess
import sys

import numpy as np
import pytest

CFG = "configs/debug/parsing_token_mh_debug.yml"
EXP = "experiments/parsing_token_mh_debug"


@pytest.fixture(autouse=True)
def _isolated(isolated_root):
    """Every test runs in a tmp experiments root (conftest.isolated_root);
    the spawned processes inherit T2H_ROOT + cwd."""
    yield


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_env() -> dict:
    """Spawned trainers run with cwd = the tmp isolated root, so the repo
    must be on PYTHONPATH explicitly (same as tests/test_aot.py) — a bare
    ``python -m pytest`` from any cwd must stay green."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # skip the axon plugin bootstrap entirely: it would override
    # JAX_PLATFORMS at interpreter start and block on a wedged tunnel
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = os.pathsep.join([REPO, env.get("PYTHONPATH", "")])
    return env


def _launch(process_id: int, port: int, extra=()):
    env = _child_env()
    # 4 local devices per process -> 8 global on the 2-process mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return subprocess.Popen(
        [sys.executable, "-m", "text2human_tpu.cli.train",
         "-opt", CFG, "--synthetic", "--cpu", "--dp",
         "--coordinator", f"127.0.0.1:{port}",
         "--num-processes", "2", "--process-id", str(process_id), *extra],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _run_pair(extra=()):
    port = _free_port()
    procs = [_launch(i, port, extra) for i in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            f"rank {procs.index(p)} failed:\n{out[-4000:]}"
        )
    return outs


def _losses(path: str):
    """total_loss series from a metrics.jsonl (key name is trainer-prefixed)."""
    out = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            m = json.loads(line)
            out.append(next(v for k, v in m.items() if "total_loss" in k))
    return out


def test_two_process_dp_train_checkpoint_resume():
    # ---- reference leg: single process, one 8-device mesh.  Runs FIRST so
    # the persistent compile cache is warm for the 2-process legs: gloo's
    # sub-communicator setup has a fixed 30 s key-exchange deadline, and two
    # ranks cold-compiling concurrently on a loaded host can skew past it.
    env = _child_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, "-m", "text2human_tpu.cli.train",
         "-opt", CFG, "--synthetic", "--cpu", "--dp"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    sp = _losses(f"{EXP}/metrics.jsonl")
    assert sp and all(np.isfinite(v) for v in sp)
    shutil.rmtree(EXP)

    # ---- leg 1: fresh 2-process run (2 epochs, val + checkpoint each) ----
    _run_pair()
    mh = _losses(f"{EXP}/metrics.jsonl")
    # per-host sharded dp reproduces the single-process trajectory
    np.testing.assert_allclose(
        mh, sp, rtol=1e-5,
        err_msg="2-process dp diverged from single-process dp",
    )
    # per-epoch checkpoints landed (epoch-named dirs written by orbax from
    # both ranks collectively)
    assert os.path.isdir(f"{EXP}/models/0")
    assert os.path.isdir(f"{EXP}/models/final")
    # rank 1 wrote its own log, no jsonl/visuals (host IO is rank-0's)
    assert os.path.exists(f"{EXP}/train_parsing_token_mh_debug.p1.log")

    # ---- leg 2: 2-process --resume restores the sharded checkpoint ----
    outs = _run_pair(("--resume",))
    assert "resumed from" in outs[0]
