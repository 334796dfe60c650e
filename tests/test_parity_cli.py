"""cli/parity.py — the one-command artifact-gated parity runner.

The released artifacts are absent in this environment by definition, so the
tests drill the gating logic (missing artifacts -> recorded + exit 0) and
the checks that CAN run on synthetic artifacts (LPIPS on a synthesized
VGG16+lin .pth)."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")


def test_parity_all_missing_is_clean(tmp_path):
    from text2human_tpu.cli import parity

    art = tmp_path / "artifacts"
    art.mkdir()
    out = tmp_path / "report.json"
    parity.main([
        "--artifacts", str(art), "--out", str(out),
        "--work", str(tmp_path / "work"), "--cpu",
    ])
    report = json.loads(out.read_text())
    assert report["checkpoint_zoo"]["status"] == "missing"
    assert set(report["checkpoint_zoo"]["missing_files"]) == {
        "vqvae_top.pth", "vqvae_bottom.pth", "parsing_token.pth",
        "sampler.pth", "index_pred_net.pth", "parsing_gen.pth",
    }
    assert report["minilm"]["status"] == "missing"
    assert report["lpips"]["status"] == "missing"
    assert report["fid"]["status"] == "missing"


def test_parity_lpips_check_runs_on_synthetic_weights(tmp_path):
    """A present LPIPS artifact is actually converted and probed."""
    import torch

    from test_losses import _synth_lpips_torch_state
    from text2human_tpu.cli import parity

    rng = np.random.default_rng(0)
    art = tmp_path / "artifacts"
    art.mkdir()
    vgg_sd, lin_sd = _synth_lpips_torch_state(rng)
    torch.save({**vgg_sd, **lin_sd}, str(art / "vgg.pth"))

    result = parity.check_lpips(str(art))
    assert result["status"] == "ok", result
    assert result["d(x,y)"] > 0 and abs(result["d(x,x)"]) < 1e-6


def test_parity_broken_artifact_fails_loudly(tmp_path):
    """A present-but-corrupt artifact must exit non-zero, not be skipped."""
    from text2human_tpu.cli import parity

    art = tmp_path / "artifacts"
    art.mkdir()
    (art / "vgg.pth").write_bytes(b"not a torch file")
    out = tmp_path / "report.json"
    with pytest.raises(SystemExit, match="lpips"):
        parity.main([
            "--artifacts", str(art), "--out", str(out),
            "--work", str(tmp_path / "work"), "--cpu",
        ])
    report = json.loads(out.read_text())
    assert report["lpips"]["status"] == "failed"
