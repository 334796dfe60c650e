"""cli/evaluate.py sweep-steps — the quality-vs-steps harness."""

import json

import numpy as np


def test_sweep_steps_reports_quality_per_decode(tmp_path):
    """The sweep runs each decode schedule on held-out fixture parsings
    against a checkpoint on disk and reports paired L1/PSNR + VGG Frechet
    + throughput per schedule."""
    import jax

    from text2human_tpu.cli import evaluate
    from text2human_tpu.cli.builders import build_pipeline
    from text2human_tpu.cli.sample import load_params
    from text2human_tpu.config import parse
    from text2human_tpu.utils.checkpoint import save_checkpoint

    cfg = "configs/debug/sample_from_pose_debug.yml"
    opt = parse(cfg, is_train=False)
    opt["model_type"] = "SampleFromParsingModel"
    pipe = build_pipeline(opt)
    params = load_params(pipe, opt, synthetic=True)
    ckpt = str(tmp_path / "pipeline")
    save_checkpoint(ckpt, jax.device_get(params))

    out = tmp_path / "sweep.json"
    grid = tmp_path / "grid.png"
    results = evaluate.main([
        "sweep-steps", "-opt", cfg, "--ckpt", ckpt,
        "--decodes", "absorbing:4", "maskgit:2",
        "--batch", "2", "--num-batches", "1",
        "--fixture-offset", "0", "--out", str(out), "--cpu",
        "--save-grid", str(grid),
    ])
    assert [r["decode"] for r in results] == ["absorbing:4", "maskgit:2"]
    for r in results:
        assert np.isfinite(r["paired_l1"]) and r["paired_l1"] >= 0
        assert np.isfinite(r["vgg_frechet"])
        assert r["imgs_per_s"] > 0
    saved = json.loads(out.read_text())
    assert saved["results"] == results

    # qualitative grid: GT row + one row per decode, `batch` columns
    from PIL import Image

    img = Image.open(grid)
    h = saved["resolution"]
    assert img.size == (2 * (h // 2), 3 * h)  # (batch*W, (1+decodes)*H)
