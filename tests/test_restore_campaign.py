"""scripts/restore_campaign.sh in a scratch repo: archive restore, atomic
in-flight-ref restore, and partial-tmp cleanup."""

import os
import os.path as osp
import shutil
import subprocess

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _scratch(tmp_path):
    scratch = tmp_path / "scratch_repo"
    (scratch / "scripts").mkdir(parents=True)
    for s in ("restore_campaign.sh",):
        shutil.copy(osp.join(REPO, "scripts", s), scratch / "scripts" / s)

    def git(*args, **kw):
        return subprocess.run(
            ["git", *args], cwd=scratch, capture_output=True, text=True, **kw
        )

    git("init", "-q")
    git("config", "user.email", "t@example.com")
    git("config", "user.name", "t")
    return scratch, git


def _run(scratch):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    return subprocess.run(
        ["bash", "scripts/restore_campaign.sh"],
        cwd=scratch, env=env, capture_output=True, text=True, timeout=120,
    )


def test_archive_restore_and_idempotence(tmp_path):
    scratch, _ = _scratch(tmp_path)
    src = scratch / "campaign_ckpts" / "parsing_token_campaign"
    src.mkdir(parents=True)
    (src / "weights.bin").write_bytes(b"abc123")

    r = _run(scratch)
    assert r.returncode == 0, r.stderr
    dst = scratch / "experiments" / "parsing_token_campaign" / "models" / "final"
    assert (dst / "weights.bin").read_bytes() == b"abc123"
    # no temp droppings
    assert not list(dst.parent.glob(".restore.*"))
    # second run: no-op, still rc 0, content unchanged
    r2 = _run(scratch)
    assert r2.returncode == 0, r2.stderr
    assert (dst / "weights.bin").read_bytes() == b"abc123"


def test_inflight_ref_restore_is_atomic_and_cleans_partials(tmp_path):
    scratch, git = _scratch(tmp_path)
    stage = "sampler_campaign"
    ref = f"refs/campaign/inflight-{stage}"

    # build the ref the way inflight_archive.sh does: tree with EPOCH + ckpt/
    work = scratch / "reftree"
    (work / "ckpt").mkdir(parents=True)
    (work / "ckpt" / "data.bin").write_bytes(b"snapshot-epoch-4")
    (work / "EPOCH").write_text("4")
    env = dict(os.environ)
    env["GIT_INDEX_FILE"] = str(scratch / ".git" / "idx.tmp")
    env["GIT_WORK_TREE"] = str(work)
    subprocess.run(["git", "add", "-A"], cwd=scratch, env=env, check=True)
    tree = subprocess.run(
        ["git", "write-tree"], cwd=scratch, env=env,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    commit = subprocess.run(
        ["git", "commit-tree", tree, "-m", "snap"], cwd=scratch,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    git("update-ref", ref, commit)
    shutil.rmtree(work)

    # a stale partial from an interrupted earlier restore must be cleaned
    stale = scratch / "experiments" / stage / "models" / ".restore.stale"
    stale.mkdir(parents=True)
    (stale / "junk").write_text("partial")

    r = _run(scratch)
    assert r.returncode == 0, r.stderr
    dest = scratch / "experiments" / stage / "models" / "4"
    assert (dest / "data.bin").read_bytes() == b"snapshot-epoch-4"
    assert not list((scratch / "experiments" / stage / "models").glob(".restore.*"))
