"""Train-CLI smoke tests, including the data-parallel mesh path."""

import os
import shutil

import pytest

from text2human_tpu.cli import train as train_cli


@pytest.fixture(autouse=True)
def clean_experiments():
    shutil.rmtree("experiments", ignore_errors=True)
    yield
    shutil.rmtree("experiments", ignore_errors=True)


def test_train_cli_segm_tokenizer_dp():
    """Two synthetic steps with the 8-device dp mesh."""
    train_cli.main([
        "-opt", "configs/debug/parsing_token_debug.yml",
        "--synthetic", "--max-iters", "2", "--dp",
    ])
    assert os.path.exists("experiments/parsing_token_debug/metrics.jsonl")


def test_train_cli_sampler():
    train_cli.main([
        "-opt", "configs/debug/sampler_debug.yml",
        "--synthetic", "--max-iters", "2",
    ])
    assert os.path.exists("experiments/sampler_debug/metrics.jsonl")


def test_train_cli_resume():
    """Full-state resume: second run restores epoch and step from the
    checkpoint (the reference cannot resume at all)."""
    train_cli.main([
        "-opt", "configs/debug/parsing_token_debug.yml", "--synthetic",
    ])
    # every val epoch gets an epoch-named checkpoint (reference
    # train_vqvae.py:126-128) and the declared-metric best is tracked
    assert os.path.isdir("experiments/parsing_token_debug/models/0")
    assert os.path.isdir("experiments/parsing_token_debug/models/best")
    train_cli.main([
        "-opt", "configs/debug/parsing_token_debug.yml", "--synthetic",
        "--resume",
    ])
    log = open(
        "experiments/parsing_token_debug/train_parsing_token_debug.log"
    ).read()
    assert "resumed from" in log
