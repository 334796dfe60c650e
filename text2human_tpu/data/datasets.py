"""DeepFashion-MultiModal datasets, NHWC numpy outputs.

Parity targets (reference data/):
  DeepFashionAttrSegmDataset          segm_attr_dataset.py:11-167
  DeepFashionAttrPoseDataset          pose_attr_dataset.py:11-109
  ParsingGenerationDataset            parsing_generation_segm_attr_dataset.py:10-80
  MaskDataset                         mask_dataset.py:11-59

File layout (reference README.md:82-108): images, ``densepose/`` (IUV pngs,
only channel 2 kept, /12-1), ``segm/`` (24-class pngs), ``texture_ann/{split}/
{upper,lower,outer}_fused.txt``, ``shape_ann/*_ann_file.txt``.  All images are
downsampled by ``downsample_factor`` (LANCZOS for RGB, NEAREST for masks).

Differences from the reference: channel-last layout (TPU-friendly), numpy
outputs (no torch), and a ``SyntheticDataset`` used by tests and benchmarks
when the real dataset is not on disk.
"""

from __future__ import annotations

import os
import os.path as osp
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover - PIL is present in the target image
    Image = None

from text2human_tpu.constants import (
    ABSENT_ATTR,
    LOWER_CLASSES,
    OUTER_CLASSES,
    UPPER_CLASSES,
)


def _read_attr_file(path: str) -> Tuple[List[str], List[List[int]]]:
    names, attrs = [], []
    with open(path, "r") as f:
        for row in f:
            parts = row.split()
            if not parts:
                continue
            names.append(parts[0])
            attrs.append([int(v) for v in parts[1:]])
    return names, attrs


def _use_native_loader() -> bool:
    # explicit allowlist: 'False'/'no'/'off' must DISABLE, not enable
    return os.environ.get("T2H_NATIVE_LOADER", "").lower() in (
        "1", "true", "yes", "on",
    )


_LANCZOS = getattr(Image, "LANCZOS", "lanczos")
_NEAREST = getattr(Image, "NEAREST", "nearest")


def _load_resized(path: str, downsample: int, resample) -> np.ndarray:
    if _use_native_loader():
        from text2human_tpu.data import native_loader as nl

        filt = nl.LANCZOS if resample == _LANCZOS else nl.NEAREST
        return nl.decode_image(path, downsample=downsample, filter=filt)
    with open(path, "rb") as f:
        img = Image.open(f)
        if downsample != 1:
            w, h = img.size
            img = img.resize((w // downsample, h // downsample), resample=resample)
        return np.array(img)


def build_texture_mask(
    segm: np.ndarray, upper: int, lower: int, outer: int
) -> np.ndarray:
    """mask 0 = shared codebook, attr+1 per region, attr 17 = absent
    (segm_attr_dataset.py:140-151)."""
    mask = np.zeros_like(segm, dtype=np.float32)
    if upper != ABSENT_ATTR:
        for cls in UPPER_CLASSES:
            mask[segm == cls] = upper + 1
    if lower != ABSENT_ATTR:
        for cls in LOWER_CLASSES:
            mask[segm == cls] = lower + 1
    if outer != ABSENT_ATTR:
        for cls in OUTER_CLASSES:
            mask[segm == cls] = outer + 1
    return mask



def normalize_densepose(pose):
    """Raw densepose I-channel values -> network input range (the reference
    divides the 24-part index map by 12 and centers, pose_attr_dataset.py:85).
    Single home for the constant: the interactive session (ui/session.py)
    must normalize exactly like training."""
    return np.asarray(pose, np.float32) / 12.0 - 1.0

class _FlatFileDataset:
    """Shared loading helpers over the DeepFashion-MultiModal layout."""

    def __init__(self, downsample_factor: int = 2, xflip: bool = False):
        self.downsample_factor = downsample_factor
        self.xflip = xflip

    def _image(self, img_dir: str, fname: str) -> np.ndarray:
        arr = _load_resized(osp.join(img_dir, fname), self.downsample_factor, _LANCZOS)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr.astype(np.float32)  # HWC

    def _densepose(self, pose_dir: str, fname: str) -> np.ndarray:
        name = f"{fname[:-4]}_densepose.png"
        path = osp.join(pose_dir, name)
        if _use_native_loader():
            from text2human_tpu.data import native_loader as nl

            # channel select happens before the resample in C++ (1/3 the work)
            arr = nl.decode_channel(
                path, channel=2, downsample=self.downsample_factor,
                filter=nl.NEAREST,
            )
            return arr[:, :, None].astype(np.float32)
        arr = _load_resized(path, self.downsample_factor, _NEAREST)
        return arr[:, :, 2:].astype(np.float32)  # keep I channel, [H,W,1]

    def _segm(self, segm_dir: str, fname: str) -> np.ndarray:
        name = f"{fname[:-4]}_segm.png"
        arr = _load_resized(osp.join(segm_dir, name), self.downsample_factor, _NEAREST)
        return arr.astype(np.float32)  # [H,W]


class DeepFashionAttrSegmDataset(_FlatFileDataset):
    """image + densepose + segm + texture_mask (segm_attr_dataset.py:11-167)."""

    def __init__(
        self,
        img_dir: str,
        segm_dir: str,
        pose_dir: str,
        ann_dir: str,
        downsample_factor: int = 2,
        xflip: bool = False,
    ):
        super().__init__(downsample_factor, xflip)
        self.img_dir, self.segm_dir, self.pose_dir = img_dir, segm_dir, pose_dir
        self.fnames, upper = _read_attr_file(osp.join(ann_dir, "upper_fused.txt"))
        names_l, lower = _read_attr_file(osp.join(ann_dir, "lower_fused.txt"))
        names_o, outer = _read_attr_file(osp.join(ann_dir, "outer_fused.txt"))
        if names_l != self.fnames or names_o != self.fnames:
            # explicit (not assert: python -O strips asserts, silently
            # pairing attributes with the wrong images)
            raise ValueError("texture annotation files disagree on image order")
        self.upper = [a[0] for a in upper]
        self.lower = [a[0] for a in lower]
        self.outer = [a[0] for a in outer]

    def __len__(self):
        return len(self.fnames)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        fname = self.fnames[index]
        image = self._image(self.img_dir, fname)
        pose = self._densepose(self.pose_dir, fname)
        segm = self._segm(self.segm_dir, fname)

        if self.xflip and random.random() > 0.5:
            image = image[:, ::-1].copy()
            pose = pose[:, ::-1].copy()
            segm = segm[:, ::-1].copy()

        mask = build_texture_mask(
            segm, self.upper[index], self.lower[index], self.outer[index]
        )
        return {
            "image": image / 127.5 - 1.0,
            "densepose": normalize_densepose(pose),
            "segm": segm,
            "texture_mask": mask,
            "img_name": fname,
        }


class DeepFashionAttrPoseDataset(_FlatFileDataset):
    """densepose + shape attrs + fused texture attrs (pose_attr_dataset.py:11-109)."""

    def __init__(
        self,
        pose_dir: str,
        texture_ann_dir: str,
        shape_ann_path: str,
        downsample_factor: int = 2,
        xflip: bool = False,
    ):
        super().__init__(downsample_factor, xflip)
        self.pose_dir = pose_dir
        self.target_names, upper = _read_attr_file(
            osp.join(texture_ann_dir, "upper_fused.txt")
        )
        self.fnames = [f"{n.split('.')[0]}.png" for n in self.target_names]
        names_l, lower = _read_attr_file(osp.join(texture_ann_dir, "lower_fused.txt"))
        names_o, outer = _read_attr_file(osp.join(texture_ann_dir, "outer_fused.txt"))
        names_s, shape = _read_attr_file(shape_ann_path)
        # every annotation file must list the same images in the same order
        # (reference pose_attr_dataset.py:45,54,62)
        if names_l != self.target_names or names_o != self.target_names:
            raise ValueError("texture annotation files disagree on image order")
        if names_s != self.target_names:
            raise ValueError(
                "shape annotation file disagrees with texture annotations"
            )
        self.upper = [a[0] for a in upper]
        self.lower = [a[0] for a in lower]
        self.outer = [a[0] for a in outer]
        self.shape_attrs = shape

    def __len__(self):
        return len(self.fnames)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        pose = self._densepose(self.pose_dir, self.fnames[index])
        if self.xflip and random.random() > 0.5:
            pose = pose[:, ::-1].copy()
        return {
            "densepose": normalize_densepose(pose),
            "img_name": self.target_names[index],
            "shape_attr": np.asarray(self.shape_attrs[index], np.int64),
            "upper_fused_attr": np.int64(self.upper[index]),
            "lower_fused_attr": np.int64(self.lower[index]),
            "outer_fused_attr": np.int64(self.outer[index]),
        }


class ParsingGenerationDataset(_FlatFileDataset):
    """densepose + segm + 15 shape attrs (parsing_generation_segm_attr_dataset.py:10-80)."""

    def __init__(
        self, segm_dir: str, pose_dir: str, ann_file: str, downsample_factor: int = 2
    ):
        super().__init__(downsample_factor)
        self.segm_dir, self.pose_dir = segm_dir, pose_dir
        self.fnames, self.attrs = _read_attr_file(ann_file)

    def __len__(self):
        return len(self.fnames)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        fname = self.fnames[index]
        pose = self._densepose(self.pose_dir, fname)
        segm = self._segm(self.segm_dir, fname)
        return {
            "densepose": normalize_densepose(pose),
            "segm": segm.astype(np.int64),
            "attr": np.asarray(self.attrs[index], np.int64),
            "img_name": fname,
        }


class MaskDataset(_FlatFileDataset):
    """segm only (mask_dataset.py:11-59)."""

    def __init__(
        self, segm_dir: str, ann_dir: str, downsample_factor: int = 2, xflip: bool = False
    ):
        super().__init__(downsample_factor, xflip)
        self.segm_dir = segm_dir
        self.fnames, _ = _read_attr_file(osp.join(ann_dir, "upper_fused.txt"))

    def __len__(self):
        return len(self.fnames)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        segm = self._segm(self.segm_dir, self.fnames[index])
        if self.xflip and random.random() > 0.5:
            segm = segm[:, ::-1].copy()
        return {"segm": segm.astype(np.int64), "img_name": self.fnames[index]}


class SyntheticDataset:
    """Deterministic random data in the DeepFashion shapes, for tests/benches."""

    def __init__(
        self,
        length: int = 16,
        resolution: int = 512,
        num_segm_classes: int = 24,
        num_textures: int = 18,
        seed: int = 0,
    ):
        self.length = length
        self.res = resolution
        self.num_segm_classes = num_segm_classes
        self.num_textures = num_textures
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self.seed * 100003 + index)
        h, w = self.res, self.res // 2
        segm = rng.integers(0, self.num_segm_classes, (h, w)).astype(np.float32)
        return {
            "image": rng.uniform(-1, 1, (h, w, 3)).astype(np.float32),
            "densepose": rng.uniform(-1, 1, (h, w, 1)).astype(np.float32),
            "segm": segm,
            "texture_mask": rng.integers(0, self.num_textures, (h, w)).astype(
                np.float32
            ),
            "attr": rng.integers(0, 2, (15,)).astype(np.int64),
            "shape_attr": rng.integers(0, 2, (15,)).astype(np.int64),
            "img_name": f"synthetic_{index:06d}.png",
        }


class OverfitFixtureDataset:
    """Tiny deterministic STRUCTURED dataset every field of which is a
    learnable function of a small latent description — unlike
    :class:`SyntheticDataset` (per-pixel noise, unmemorizable), these
    samples can be overfit by the real training jobs, which is what the
    end-to-end learning harness (tests/test_overfit_e2e.py) needs:

      * ``segm``          — vertical class bands (blockwise, latent-aligned)
      * ``image``         — per-class color + a mild vertical gradient, so the
                            VQGANs must encode real spatial variation
      * ``texture_mask``  — deterministic per-class texture id (class % 18)
      * ``densepose``     — an invertible function of segm (class/23*2-1), so
                            pose -> parsing is exactly learnable
      * ``attr``          — the sample index in binary

    Same dict schema as the DeepFashion datasets (SURVEY.md §2.5), so it
    drops into any trainer.
    """

    def __init__(
        self,
        length: int = 4,
        resolution: int = 64,
        num_segm_classes: int = 24,
        num_textures: int = 18,
        bands: int = 4,
        rich: bool = False,
        offset: int = 0,
    ):
        self.length = length
        self.res = resolution
        self.num_segm_classes = num_segm_classes
        self.num_textures = num_textures
        self.bands = bands
        # rich=True: per-index deterministic random band classes/widths and a
        # within-class stripe texture — thousands of DISTINCT samples instead
        # of the ~num_segm_classes/gcd cyclic layouts of the default, so
        # full-size training campaigns (cli/train.py --fixture) see a real
        # joint distribution rather than a handful of memorizable images
        self.rich = rich
        # index offset: disjoint splits (a val set the train run never saw)
        self.offset = offset

    def __len__(self):
        return self.length

    def class_color(self, c: np.ndarray) -> np.ndarray:
        """[...]-shaped class ids -> [..., 3] colors in [-1, 1] (fixed map)."""
        r = (c * 37 % 256) / 127.5 - 1.0
        g = (c * 91 % 256) / 127.5 - 1.0
        b = (c * 53 % 256) / 127.5 - 1.0
        return np.stack([r, g, b], axis=-1).astype(np.float32)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        index = index + self.offset
        h, w = self.res, self.res // 2
        xs = np.arange(w)
        if self.rich:
            rng = np.random.default_rng(1000003 * index + 17)
            classes = rng.choice(
                self.num_segm_classes, size=self.bands, replace=False
            )
            # random band widths: cuts drawn without replacement so every
            # band is at least one column wide
            cuts = np.sort(rng.choice(np.arange(1, w), self.bands - 1,
                                      replace=False))
            band = np.searchsorted(cuts, xs, side="right")
        else:
            band = np.minimum(xs * self.bands // w, self.bands - 1)
            classes = np.array(
                [(index * self.bands + k) % self.num_segm_classes
                 for k in range(self.bands)]
            )
        segm_row = classes[band]  # [W]
        segm = np.broadcast_to(segm_row, (h, w)).astype(np.float32)

        grad = (np.arange(h, dtype=np.float32) / max(h - 1, 1) * 0.4 - 0.2)
        image = self.class_color(segm_row)[None] * 0.8 + grad[:, None, None]
        image = np.broadcast_to(image, (h, w, 3)).astype(np.float32).copy()
        if self.rich:
            # class-dependent horizontal stripes: real within-class texture
            # the tokenizers must encode (period/phase are functions of the
            # class id, amplitude of the sample), plus a light deterministic
            # per-sample tint so identical layouts remain distinguishable
            period = 4 + (segm_row.astype(np.int64) * 7) % 13  # [W]
            phase = (segm_row.astype(np.int64) * 3) % 5
            stripe = np.sin(
                (np.arange(h)[:, None] + phase[None, :])
                * (2.0 * np.pi / period[None, :])
            ).astype(np.float32)
            amp = 0.1 + 0.1 * float(rng.uniform())
            tint = rng.uniform(-0.05, 0.05, size=(1, 1, 3)).astype(np.float32)
            image = image + amp * stripe[..., None] + tint
            image = np.clip(image, -1.0, 1.0)

        densepose = (segm / (self.num_segm_classes - 1) * 2.0 - 1.0)[..., None]
        attr = np.array(
            [(index >> k) & 1 for k in range(15)], dtype=np.int64
        )
        return {
            "image": image,
            "densepose": densepose.astype(np.float32),
            "segm": segm,
            "texture_mask": (segm % self.num_textures).astype(np.float32),
            "attr": attr,
            "shape_attr": attr.copy(),
            "img_name": f"fixture_{index:06d}.png",
        }
