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


def test_stroke_undo():
    """paint/set_parsing_rgb are undoable per stroke; a fresh parsing map
    clears the history (reference ui/mouse_event.py:36-129)."""
    sess = InteractiveSession.__new__(InteractiveSession)
    sess._history = []
    sess.segm = np.zeros((8, 8), np.int64)

    before = sess.segm.copy()
    sess.paint(5, [(2, 2)], brush=3)
    assert (sess.segm == 5).sum() == 9
    sess.paint(7, [(6, 6)], brush=1)
    assert (sess.segm == 7).sum() == 1

    assert sess.undo()  # revert the class-7 stroke
    assert (sess.segm == 7).sum() == 0 and (sess.segm == 5).sum() == 9
    assert sess.undo()  # revert the class-5 stroke
    np.testing.assert_array_equal(sess.segm, before)
    assert not sess.undo()  # empty history

    sess.set_parsing_rgb(segm_to_palette(np.full((8, 8), 3)))
    assert (sess.segm == 3).all()
    assert sess.undo()
    np.testing.assert_array_equal(sess.segm, before)

    # out-of-range class ids are rejected BEFORE mutating the map (a bad id
    # would corrupt the parsing and break every later palette render)
    import pytest

    for bad in (-1, 24, 99):
        with pytest.raises(ValueError):
            sess.paint(bad, [(2, 2)], brush=3)
    np.testing.assert_array_equal(sess.segm, before)
    assert not sess.undo()  # nothing was pushed to history


def test_segm_tokenizer_random_projection_colorize(rng):
    """to_rgb: fixed random projection, min-max normalized to [-1, 1]
    (reference models/vqgan_model.py:173-174,194-197)."""
    import jax.numpy as jnp

    from text2human_tpu.config import QuantizerConfig, VQGANConfig
    from text2human_tpu.ops.nn import one_hot_segm
    from text2human_tpu.trainers.segm_tokenizer import (
        SegmTokenizerConfig,
        SegmTokenizerTrainer,
    )

    cfg = VQGANConfig(
        ch=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
        resolution=32, z_channels=8, embed_dim=8, in_channels=6, out_ch=6,
    )
    trainer = SegmTokenizerTrainer(
        cfg, QuantizerConfig(n_embed=16, embed_dim=8),
        SegmTokenizerConfig(num_segm_classes=6),
    )
    segm = jnp.asarray(rng.integers(0, 6, (2, 8, 8)))
    rgb = trainer.to_rgb(one_hot_segm(segm, 6))
    assert rgb.shape == (2, 8, 8, 3)
    assert float(rgb.min()) == -1.0 and float(rgb.max()) == 1.0
    # deterministic across calls (fixed projection)
    rgb2 = trainer.to_rgb(one_hot_segm(segm, 6))
    np.testing.assert_array_equal(np.asarray(rgb), np.asarray(rgb2))


def test_demo_cli_end_to_end(tmp_path):
    """Terminal demo entry point: pose PNG in -> parsing palette + image out
    (the last untested CLI surface)."""
    import numpy as np
    from PIL import Image

    from text2human_tpu.cli import demo as demo_cli

    # 128x64 source: the CLI downsamples by factor 2 -> the debug config's
    # 64x32 input resolution
    pose = (np.random.default_rng(0).uniform(0, 24, (128, 64, 3)) + 0.5).astype(
        np.uint8
    )
    pose_path = str(tmp_path / "x_densepose.png")
    Image.fromarray(pose).save(pose_path)
    out = str(tmp_path / "out.png")
    parsing_out = str(tmp_path / "parsing.png")
    demo_cli.main([
        "-opt", "configs/debug/sample_from_pose_debug.yml",
        "--synthetic", "--cpu",
        "--pose", pose_path,
        "--shape-text", "a woman, short-sleeve T-shirt, long pants",
        "--texture-text", "pure color, denim",
        "--sample-steps", "4",
        "--out", out, "--parsing-out", parsing_out,
    ])
    img = np.array(Image.open(out))
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    parsing = np.array(Image.open(parsing_out))
    from text2human_tpu.ui.session import palette_to_segm

    assert palette_to_segm(parsing).max() < 24


def test_pose_i_from_iuv_matches_reference_semantics(rng):
    """ui_demo.py:90-95: the demo LANCZOS-resizes the IUV image to the model
    resolution and then keeps channel 2; our helper must match that replica
    (NOT the datasets' NEAREST convention, and NOT strided subsampling)."""
    from PIL import Image

    from text2human_tpu.ui.session import pose_i_from_iuv

    iuv = rng.integers(0, 25, (64, 32, 3)).astype(np.uint8)
    want = np.array(
        Image.fromarray(iuv).resize(size=(16, 32), resample=Image.LANCZOS)
    )[:, :, 2].astype(np.float32)
    got = pose_i_from_iuv(iuv, (32, 16))
    np.testing.assert_array_equal(got, want)

    # 2-D input = already-extracted I map: resized only
    imap = iuv[:, :, 2]
    want2 = np.array(
        Image.fromarray(imap).resize(size=(16, 32), resample=Image.LANCZOS)
    ).astype(np.float32)
    np.testing.assert_array_equal(pose_i_from_iuv(imap, (32, 16)), want2)

    # identity at the target size (serving full-res poses untouched)
    np.testing.assert_array_equal(
        pose_i_from_iuv(iuv, (64, 32)), iuv[:, :, 2].astype(np.float32)
    )


def test_paint_clamps_offcanvas_coordinates():
    """Negative or out-of-range stroke centers must clamp, never wrap: a
    negative slice stop would paint most of the map (serve.py passes client
    JSON coordinates straight through)."""
    sess = InteractiveSession.__new__(InteractiveSession)
    sess._history = []
    sess.segm = np.zeros((16, 8), np.int64)
    before = sess.segm.copy()

    # entirely off-canvas strokes are no-ops (but still undoable calls)
    for y, x in [(-5, 4), (4, -5), (100, 4), (4, 100), (-100, -100)]:
        sess.paint(3, [(y, x)], brush=3)
    np.testing.assert_array_equal(sess.segm, before)

    # a stroke straddling the edge paints only the in-range part
    sess.paint(5, [(0, 0)], brush=3)
    assert (sess.segm == 5).sum() == 4  # 2x2 corner, not 3x3
    while sess.undo():
        pass
    np.testing.assert_array_equal(sess.segm, before)


def test_undo_history_is_rect_patches():
    """Undo stores touched rectangles, not full map copies — a long session
    must not retain O(H*W) per stroke."""
    sess = InteractiveSession.__new__(InteractiveSession)
    sess._history = []
    sess.segm = np.zeros((512, 256), np.int64)
    sess.paint(5, [(10, 10)], brush=3)
    kind, payload = sess._history[-1]
    assert kind == "patches"
    stored = sum(p[4].size for p in payload)
    assert stored <= 9  # brush area, not 512*256

    # overlapping rects in ONE stroke still undo exactly
    sess.paint(7, [(20, 20), (21, 21), (20, 20)], brush=5)
    assert sess.undo()
    assert (sess.segm == 7).sum() == 0 and (sess.segm == 5).sum() == 9
