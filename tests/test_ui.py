"""Interactive session tests over the tiny pipeline."""

import numpy as np

from text2human_tpu.ui.session import (
    InteractiveSession,
    palette_to_segm,
    segm_to_palette,
)
from tests.test_pipeline import CFGS, RES, _init_params
from text2human_tpu.pipelines.sample import SamplePipeline


def test_palette_roundtrip(rng):
    segm = rng.integers(0, 24, (16, 8))
    rgb = segm_to_palette(segm)
    assert rgb.shape == (16, 8, 3) and rgb.dtype == np.uint8
    back = palette_to_segm(rgb)
    np.testing.assert_array_equal(back, segm)


def test_interactive_session_flow(rng):
    pipe = SamplePipeline(CFGS)
    params = _init_params(pipe, rng)
    sess = InteractiveSession(pipe, params)

    pose_raw = rng.uniform(0, 24, (RES, RES // 2)).astype(np.float32)
    sess.feed_pose(pose_raw)
    parsing_rgb = sess.generate_parsing("a woman, short-sleeve T-shirt, long pants")
    assert parsing_rgb.shape == (RES, RES // 2, 3)

    # brush edit: paint class 13 and check it landed
    sess.paint(13, [(5, 5), (6, 6)], brush=3)
    assert (sess.segm == 13).sum() >= 9

    img = sess.generate_human("pure color, stripe", sample_steps=4)
    assert img.shape == (RES, RES // 2, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
