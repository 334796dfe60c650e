"""Data layer, language parser, lr-schedule, and logging tests."""

import os

import numpy as np
import pytest

from text2human_tpu.data.datasets import SyntheticDataset, build_texture_mask
from text2human_tpu.data.loader import DataLoader, collate
from text2human_tpu.trainers.base import lr_for_epoch
from text2human_tpu.utils.language import (
    LexicalEncoder,
    generate_shape_attributes,
    generate_texture_attributes,
)


def test_build_texture_mask():
    segm = np.array([[1, 4, 3], [5, 21, 2], [0, 9, 13]], dtype=np.float32)
    mask = build_texture_mask(segm, upper=2, lower=17, outer=5)
    want = np.array([[3, 3, 0], [0, 0, 6], [0, 0, 0]], dtype=np.float32)
    np.testing.assert_array_equal(mask, want)


def test_synthetic_dataset_and_loader():
    ds = SyntheticDataset(length=10, resolution=32)
    sample = ds[0]
    assert sample["image"].shape == (32, 16, 3)
    assert sample["segm"].shape == (32, 16)
    # determinism
    np.testing.assert_array_equal(ds[3]["image"], ds[3]["image"])

    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0]["image"].shape == (4, 32, 16, 3)
    assert isinstance(batches[0]["img_name"], list)

    loader2 = DataLoader(ds, batch_size=4, drop_last=False)
    assert len(list(loader2)) == 3


def test_collate_mixed():
    out = collate([{"a": np.ones(3), "n": "x"}, {"a": np.zeros(3), "n": "y"}])
    assert out["a"].shape == (2, 3)
    assert out["n"] == ["x", "y"]


def test_texture_attributes_keywords():
    assert generate_texture_attributes("pure color, stripe, denim") == [4, 3, 0]
    assert generate_texture_attributes("floral") == [1, 1, 17]
    assert generate_texture_attributes("plaid, something odd") == [5, 17, 17]


def test_shape_attributes_structure():
    out = generate_shape_attributes("a woman, short-sleeve T-shirt, long pants")
    assert len(out) == 15
    assert out[0] == 1 and out[1] == 2  # woman
    out2 = generate_shape_attributes("a man, dress")
    assert out2[0] == 0 and out2[1] == 0


def test_shape_attributes_lexical_rules():
    enc = LexicalEncoder()
    # upper length picked from phrase bank at text_id == 1
    out = generate_shape_attributes("a man, long sleeves shirt, jeans", encoder=enc)
    assert out[2] == 3  # attr[0]='upper length'==long
    assert out[13] == 1  # attr[11]='pants'
    # dress branch (2 segments) zeroes the garment flags
    out = generate_shape_attributes("a lady, dress", encoder=enc)
    assert out[12] == 1  # attr[10]='dress'
    assert out[9] == 0 and out[13] == 0


def test_lr_schedules():
    cfg = {"lr": 1.0, "lr_decay": "step", "gamma": 0.1, "step": 10}
    assert lr_for_epoch(cfg, 0) == 1.0
    assert lr_for_epoch(cfg, 10) == pytest.approx(0.1)
    cfg = {"lr": 1.0, "lr_decay": "cos", "num_epochs": 100}
    assert lr_for_epoch(cfg, 0) == pytest.approx(1.0)
    assert lr_for_epoch(cfg, 100) == pytest.approx(0.0, abs=1e-9)
    cfg = {"lr": 2.0, "lr_decay": "warm_up", "warmup_iters": 100}
    assert lr_for_epoch(cfg, 0, iters=50) == pytest.approx(1.0)
    assert lr_for_epoch(cfg, 0, iters=500) == 2.0
    cfg = {"lr": 1.0, "lr_decay": "linear", "num_epochs": 10}
    assert lr_for_epoch(cfg, 5) == pytest.approx(0.5)
    cfg = {"lr": 1.0, "lr_decay": "schedule", "schedule": [5, 8], "gamma": 0.5}
    assert lr_for_epoch(cfg, 5, prev_lr=1.0) == 0.5
    assert lr_for_epoch(cfg, 6, prev_lr=0.5) == 0.5


def test_options_parse(tmp_path):
    from text2human_tpu.config import parse

    yml = tmp_path / "exp_debug.yml"
    yml.write_text("name: exp_debug\nlr: 1.0e-4\nval_freq: 50\n")
    opt = parse(str(yml), is_train=True, root=str(tmp_path))
    assert opt["val_freq"] == 1  # debug override
    assert opt["missing_key"] is None  # NoneDict semantics
    assert opt["path"]["models"].endswith("experiments/exp_debug/models")


def test_progress_bar_and_meter(capsys):
    from text2human_tpu.utils.misc import AverageMeter, ProgressBar

    bar = ProgressBar(task_num=4)
    for _ in range(4):
        bar.update("step")
    out = capsys.readouterr().out
    assert "4/4" in out

    meter = AverageMeter()
    meter.update(1.0, n=2)
    meter.update(4.0, n=2)
    assert meter.avg == 2.5 and meter.count == 4
