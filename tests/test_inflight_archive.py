"""Reset-proof in-flight campaign archiving (VERDICT r4 weak #4).

Covers the two halves of mid-stage crash recovery:

* ``cli/train.py --resume`` from a SLIM checkpoint (params/batch_stats/step
  only, no optimizer state) — what scripts/inflight_archive.sh stores —
  continues the run with reinitialized moments instead of dying.
* ``scripts/inflight_archive.sh`` snapshots the newest periodic checkpoint
  into a ``refs/campaign/inflight-<stage>`` git ref, updated IN PLACE
  (bounded growth), and the ref round-trips back to a resumable checkpoint
  directory via ``git archive`` (the restore_campaign.sh path).
"""

import os
import os.path as osp
import shutil
import subprocess
import sys

import pytest

from text2human_tpu.cli import train as train_cli

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(autouse=True)
def _isolated(isolated_root):
    yield


def test_resume_from_slim_checkpoint():
    """Train, slim the latest epoch checkpoint in place (drop opt_state),
    then --resume: the loop restores weights + step, warns, and completes."""
    train_cli.main([
        "-opt", "configs/debug/parsing_token_debug.yml", "--synthetic",
    ])
    models = "experiments/parsing_token_debug/models"
    assert osp.isdir(f"{models}/0")
    # simulate the post-reset state: only a slim in-flight snapshot survives
    sys.path.insert(0, osp.join(REPO, "scripts"))
    try:
        import slim_ckpt
    finally:
        sys.path.pop(0)
    from text2human_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    slim = slim_ckpt.slim_tree(load_checkpoint(f"{models}/0"))
    assert "opt_state" not in slim["state"]
    assert "step" in slim["state"]  # load-bearing for GAN disc gating
    shutil.rmtree(models)
    save_checkpoint(f"{models}/0", slim)

    train_cli.main([
        "-opt", "configs/debug/parsing_token_debug.yml", "--synthetic",
        "--resume",
    ])
    log = open(
        "experiments/parsing_token_debug/train_parsing_token_debug.log"
    ).read()
    assert "resumed SLIM checkpoint" in log
    assert osp.isdir(f"{models}/final")


def test_inflight_archive_ref_roundtrip(tmp_path):
    """inflight_archive.sh in a scratch git repo: periodic checkpoint ->
    slim commit on refs/campaign/inflight-<stage> -> ref updated in place on
    a newer epoch -> extracted back to a checkpoint dir (restore path)."""
    import numpy as np

    from text2human_tpu.utils.checkpoint import save_checkpoint

    scratch = tmp_path / "scratch_repo"
    (scratch / "scripts").mkdir(parents=True)
    for s in ("inflight_archive.sh", "slim_ckpt.py"):
        shutil.copy(osp.join(REPO, "scripts", s), scratch / "scripts" / s)

    def git(*args):
        return subprocess.run(
            ["git", *args], cwd=scratch, capture_output=True, text=True,
        )

    git("init", "-q")
    git("config", "user.email", "t@example.com")
    git("config", "user.name", "t")

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join([REPO, env.get("PYTHONPATH", "")])
    env["JAX_PLATFORMS"] = "cpu"
    # skip the axon plugin bootstrap (it overrides JAX_PLATFORMS at
    # interpreter start and blocks on a wedged tunnel)
    env["PALLAS_AXON_POOL_IPS"] = ""

    def run_archive(stage="stage_a"):
        return subprocess.run(
            ["bash", "scripts/inflight_archive.sh", stage],
            cwd=scratch, env=env, capture_output=True, text=True,
        )

    # no experiments at all: clean no-op
    r = run_archive()
    assert r.returncode == 0 and r.stdout.strip() == ""

    models = scratch / "experiments" / "stage_a" / "models"
    state = {
        "state": {
            "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "opt_state": {"mu": np.zeros((2, 3), np.float32)},
            "step": np.asarray(7, np.int32),
        },
        "epoch": 3,
        "best": 0.5,
    }
    save_checkpoint(str(models / "3"), state)
    r = run_archive()
    assert r.returncode == 0, r.stdout + r.stderr
    assert "epoch 3" in r.stdout

    ref = "refs/campaign/inflight-stage_a"
    c1 = git("rev-parse", ref).stdout.strip()
    assert c1
    assert git("cat-file", "-p", f"{ref}:EPOCH").stdout.strip() == "3"

    # same epoch again: no-op, ref unchanged
    r = run_archive()
    assert git("rev-parse", ref).stdout.strip() == c1

    # newer epoch: ref REPLACED (no second ref, no parent chain — bounded)
    state["epoch"] = 5
    save_checkpoint(str(models / "5"), state)
    run_archive()
    c2 = git("rev-parse", ref).stdout.strip()
    assert c2 != c1
    assert git("cat-file", "-p", f"{ref}:EPOCH").stdout.strip() == "5"
    # the replaced commit has no parent (history does not accumulate)
    assert git("log", "--format=%H", ref).stdout.split() == [c2]

    # restore path (restore_campaign.sh): extract the ref into models/<ep>
    dest = scratch / "restored" / "5"
    dest.mkdir(parents=True)
    ar = subprocess.run(
        ["git", "archive", ref, "ckpt"], cwd=scratch, capture_output=True,
    )
    subprocess.run(
        ["tar", "-x", "--strip-components=1", "-C", str(dest)],
        input=ar.stdout, check=True,
    )
    from text2human_tpu.utils.checkpoint import load_checkpoint

    tree = load_checkpoint(str(dest))
    assert "opt_state" not in tree["state"]  # slimmed
    np.testing.assert_array_equal(
        tree["state"]["params"]["w"], state["state"]["params"]["w"]
    )
    assert int(np.asarray(tree["state"]["step"])) == 7
    assert int(np.asarray(tree["epoch"])) == 5
