"""Interactive editing session — the headless equivalent of the reference's
PyQt5 demo.

Parity targets:
  ui_demo.py:27-275   Ex app: open densepose -> text -> parsing -> brush edit
                      -> texture text -> generate
  ui_demo.py:143-148  RGB-palette -> class-id decode
  sample_model.py:469-485 SampleFromPoseModel feed hooks
  sample_model.py:487-498 24-class palette

The session keeps the same stepwise workflow (so a web/notebook frontend can
drive it) without any GUI dependency; strokes are applied as class paints on
the parsing map like the reference's GraphicsScene replay
(ui_demo.py:136-147).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text2human_tpu.pipelines.sample import SamplePipeline, texture_mask_from_segm
from text2human_tpu.utils.language import (
    generate_shape_attributes,
    generate_texture_attributes,
)

# 24-class visualization palette (reference sample_model.py:388-395)
PALETTE: List[List[int]] = [
    [0, 0, 0], [255, 250, 250], [220, 220, 220], [250, 235, 215],
    [255, 250, 205], [211, 211, 211], [70, 130, 180], [127, 255, 212],
    [0, 100, 0], [50, 205, 50], [255, 255, 0], [245, 222, 179],
    [255, 140, 0], [255, 0, 0], [16, 78, 139], [144, 238, 144],
    [50, 205, 174], [50, 155, 250], [160, 140, 88], [213, 140, 88],
    [90, 140, 90], [185, 210, 205], [130, 165, 180], [225, 141, 151],
]


def segm_to_palette(segm: np.ndarray) -> np.ndarray:
    """[H,W] class ids -> [H,W,3] uint8 RGB."""
    palette = np.asarray(PALETTE, np.uint8)
    return palette[np.asarray(segm, np.int64)]


# the single definition lives with the datasets — interactive inputs must
# normalize exactly like training inputs (re-exported here for callers)
from text2human_tpu.data.datasets import normalize_densepose  # noqa: E402


def pose_i_from_iuv(iuv: np.ndarray, target_hw) -> np.ndarray:
    """User-supplied IUV image -> I-channel at the model resolution.

    Matches the reference demo exactly (ui_demo.py:90-95): LANCZOS-resize the
    IUV image to (width, height) = (W, H), THEN keep channel 2.  (The
    datasets resize densepose with NEAREST — the reference's demo quirkily
    uses LANCZOS for interactive input; kept for output parity.)  A 2-D input
    is treated as an already-extracted I map and only resized."""
    from PIL import Image

    h, w = target_hw
    arr = np.asarray(iuv)
    img = Image.fromarray(arr.astype(np.uint8))
    out = np.array(img.resize((w, h), resample=Image.LANCZOS))
    if out.ndim == 3:
        out = out[:, :, 2]
    return out.astype(np.float32)


def palette_to_segm(rgb: np.ndarray) -> np.ndarray:
    """[H,W,3] RGB -> [H,W] class ids (exact-match decode, ui_demo.py:143-148)."""
    rgb = np.asarray(rgb, np.int64)
    out = np.zeros(rgb.shape[:2], np.int64)
    for idx, color in enumerate(PALETTE):
        match = (rgb == np.asarray(color)).all(axis=-1)
        out[match] = idx
    return out


class InteractiveSession:
    """Stateful wrapper over SamplePipeline mirroring the demo workflow."""

    def __init__(self, pipeline: SamplePipeline, params, text_encoder=None, seed: int = 0):
        self.pipe = pipeline
        self.params = params
        self.text_encoder = text_encoder
        self.key = jax.random.key(seed)
        self.pose: Optional[jnp.ndarray] = None
        self.shape_attr: Optional[jnp.ndarray] = None
        self.segm: Optional[np.ndarray] = None
        self.texture_attrs: Optional[List[int]] = None
        # per-stroke undo history (reference ui/mouse_event.py:36-129 keeps
        # the stroke list and pops on undo): ("patches", [(y0,y1,x0,x1,
        # prev), ...]) per brush stroke, ("full", map) for replacements
        self._history: List[tuple] = []

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # -- step 1: pose (ui_demo.py:69-100 open densepose)

    def feed_pose(self, densepose_i_channel: np.ndarray):
        """densepose I-channel [H,W] raw values; normalized /12-1 like the
        datasets (data/pose_attr_dataset.py:85)."""
        pose = normalize_densepose(densepose_i_channel)
        self.pose = jnp.asarray(pose)[None, :, :, None]

    # -- step 2: shape text -> parsing (ui_demo.py:102-134)

    def generate_parsing(self, shape_text: str) -> np.ndarray:
        if self.pose is None:
            # ordering violation is a *client* error (the HTTP layer maps
            # ValueError to 400), not a server bug
            raise ValueError("feed_pose first")
        attrs = generate_shape_attributes(shape_text, encoder=self.text_encoder)
        self.shape_attr = jnp.asarray([attrs], jnp.int32)
        segm = self.pipe.generate_parsing(self.params, self.pose, self.shape_attr)
        self.segm = np.array(segm[0])  # writable copy for brush edits
        self._history.clear()  # fresh parsing map -> fresh stroke history
        return segm_to_palette(self.segm)

    # -- step 3: brush edits (ui_demo.py:136-147 stroke replay)

    def paint(self, cls_id: int, coords: Sequence[Tuple[int, int]], brush: int = 3):
        """Paint ``cls_id`` at (y, x) centers with a square brush, like the
        demo's per-class stroke replay.  Each call is one stroke and is
        undoable with :meth:`undo`."""
        if self.segm is None:
            raise ValueError("generate_parsing first")
        if not 0 <= cls_id < len(PALETTE):
            # reject before mutating: an out-of-range class id would corrupt
            # the parsing map and break every later palette render
            raise ValueError(
                f"cls_id {cls_id} out of range [0, {len(PALETTE)})"
            )
        h, w = self.segm.shape
        r = brush // 2
        patches = []
        for y, x in coords:
            # clamp BOTH ends: a negative center must not produce a negative
            # slice stop (numpy would wrap it to the far edge and the stroke
            # would paint most of the map)
            y0 = min(max(0, y - r), h)
            y1 = min(max(0, y + r + 1), h)
            x0 = min(max(0, x - r), w)
            x1 = min(max(0, x + r + 1), w)
            if y0 >= y1 or x0 >= x1:
                continue  # entirely off-canvas
            patches.append((y0, y1, x0, x1, self.segm[y0:y1, x0:x1].copy()))
            self.segm[y0:y1, x0:x1] = cls_id
        # undo history stores only the touched rectangles — O(brush area)
        # per stroke, not O(H*W): a long interactive session must not grow
        # server memory by a full map copy per stroke
        self._history.append(("patches", patches))

    def undo(self) -> bool:
        """Revert the most recent stroke / parsing replacement (reference
        GraphicsScene.undo, ui/mouse_event.py:90-129).  Returns False when
        there is nothing to undo."""
        if not self._history:
            return False
        kind, payload = self._history.pop()
        if kind == "full":
            self.segm = payload
        else:
            # reverse order: overlapping rects within one stroke restore the
            # earliest-saved pixels last
            for y0, y1, x0, x1, patch in reversed(payload):
                self.segm[y0:y1, x0:x1] = patch
        return True

    def set_parsing_rgb(self, rgb: np.ndarray):
        """Replace the parsing map from an edited palette image (undoable)."""
        if self.segm is not None:
            self._history.append(("full", self.segm.copy()))
        self.segm = palette_to_segm(rgb)

    # -- step 4: texture text -> image (ui_demo.py:154-179)

    def generate_human(
        self, texture_text: str, sample_steps: int = 0, decode_mode: str = ""
    ) -> np.ndarray:
        if self.segm is None:
            raise ValueError("generate_parsing first")
        attrs = generate_texture_attributes(texture_text)[:3]
        self.texture_attrs = attrs
        upper, lower, outer = (jnp.asarray([a], jnp.int32) for a in attrs)
        segm = jnp.asarray(self.segm)[None]
        texture_mask = texture_mask_from_segm(segm, upper, lower, outer)
        imgs = self.pipe.sample_from_parsing(
            self.params, self._next_key(), segm, texture_mask, sample_steps,
            decode_mode,
        )
        return np.asarray(imgs[0])
