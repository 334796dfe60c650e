"""Pre-tokenized training cache for the frozen-tokenizer jobs.

The reference re-runs its frozen tokenizers on every training step: the
sampler pushes each batch through the full top VQGAN encoder and the parsing
tokenizer per iteration (transformer_model.py:153-170,305-315), and the
index-prediction job re-encodes through BOTH frozen VQGANs
(hierarchy_inference_model.py:178-197).  Those frozen forwards are pure
functions of the dataset — on TPU they cost as much as the trainable step
itself (BENCHMARKS.md: ~130 ms tokenize vs ~125 ms train step at b=32).

This module precomputes them ONCE into an on-disk cache of integer codebook
indices (~2 KB/sample vs ~1.2 MB of decoded pixels), so training reads tokens
straight from a memmap: no frozen conv forwards, no image decode, no PNG IO.
Horizontal-flip augmentation is preserved by tokenizing each flip variant at
build time (tokens of a flipped image are NOT a flip of the tokens — conv
stacks are not reflection-equivariant).

Layout: ``<cache_dir>/meta.json`` + one ``<field>.npy`` memmap per field,
shaped ``[variants, num_samples, *field_shape]``.
"""

from __future__ import annotations

import hashlib
import json
import os
import os.path as osp
import random
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


def checkpoint_fingerprint(path: str) -> Dict[str, Any]:
    """Content fingerprint of a frozen-tokenizer checkpoint: size + sha256
    of the first and last MiB (hashing multi-GB files whole would slow every
    training start; head+tail+size catches any real re-export).

    Cache builds record this per required checkpoint; training compares it
    so cached indices are never gathered against a codebook from a
    DIFFERENT checkpoint than the one that produced them — that trains on
    garbage top features with no error anywhere.

    Native orbax checkpoints (utils/native_frozen.py) are directories: the
    fingerprint covers every file's relative path + size plus head/tail
    bytes of each, so a re-trained checkpoint written to the same directory
    changes the hash."""
    h = hashlib.sha256()
    if os.path.isdir(path):
        total = 0
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for name in sorted(files):
                fp = os.path.join(root, name)
                size = os.path.getsize(fp)
                total += size
                h.update(os.path.relpath(fp, path).encode())
                h.update(str(size).encode())
                with open(fp, "rb") as f:
                    h.update(f.read(1 << 20))
                    if size > (2 << 20):
                        f.seek(-(1 << 20), 2)
                        h.update(f.read(1 << 20))
        return {"size": total, "sha256": h.hexdigest()}
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        h.update(f.read(1 << 20))
        if size > (2 << 20):
            f.seek(-(1 << 20), 2)
            h.update(f.read(1 << 20))
    return {"size": size, "sha256": h.hexdigest()}

# spatial sample keys that flip horizontally (axis 1 of HW(C) arrays)
FLIP_KEYS = ("image", "densepose", "segm", "texture_mask")

_META = "meta.json"


def flip_sample(sample: Dict[str, Any]) -> Dict[str, Any]:
    """Deterministic horizontal flip of one dataset sample (the synchronized
    xflip of reference segm_attr_dataset.py:125-129, applied to all spatial
    keys; the texture mask is built per-class from segm, so flipping it
    directly is equivalent to rebuilding it from the flipped segm)."""
    out = dict(sample)
    for k in FLIP_KEYS:
        if k in out:
            out[k] = np.ascontiguousarray(out[k][:, ::-1])
    return out


def _pick_dtype(arr: np.ndarray) -> np.dtype:
    """Smallest signed integer dtype that holds the observed index range."""
    lo, hi = int(arr.min(initial=0)), int(arr.max(initial=0))
    for dt in (np.int8, np.int16, np.int32):
        info = np.iinfo(dt)
        if info.min <= lo and hi <= info.max:
            return np.dtype(dt)
    return np.dtype(np.int64)


def _widen_memmap(path: str, old: np.memmap, new_dtype: np.dtype) -> np.memmap:
    """Rewrite a field memmap with a wider dtype, preserving written data.

    Field dtypes are sized from the first batch's observed range; a later
    batch can legitimately exceed it (early dataset files are often
    homogeneous).  Widening costs one sequential copy — never abort a build
    that may be hours into its frozen-tokenizer sweep."""
    tmp = path + ".widen"
    wide = np.lib.format.open_memmap(
        tmp, mode="w+", dtype=new_dtype, shape=old.shape
    )
    wide[:] = old[:]
    wide.flush()
    del old, wide
    os.replace(tmp, path)
    return np.lib.format.open_memmap(path, mode="r+")


def build_token_cache(
    cache_dir: str,
    dataset,
    tokenize_batch: Callable[[Dict[str, np.ndarray]], Dict[str, np.ndarray]],
    batch_size: int = 8,
    variants: int = 1,
    extra_meta: Optional[Dict[str, Any]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
    workers: int = 4,
    prefetch: int = 4,
) -> Dict[str, Any]:
    """Tokenize ``dataset`` through ``tokenize_batch`` and write the cache.

    ``tokenize_batch`` maps a collated numpy batch to a dict of per-sample
    integer arrays ``[B, *shape]``.  ``variants=2`` additionally tokenizes the
    horizontally-flipped copy of every sample (for xflip training).  The last
    batch is padded to ``batch_size`` so the jitted tokenizer compiles for
    exactly one shape.

    ``workers``/``prefetch``: host-side batch materialization (dataset
    access, flips, collate — fixture synthesis or PNG decode) runs on a
    thread pool ``prefetch`` batches ahead of the device, so the frozen
    forward streams instead of serializing host prep with device compute
    (the r4 build measured ~3.4 s host prep vs ~0.3 s device per b=32
    batch — the build was >90% host-bound).
    """
    from concurrent.futures import ThreadPoolExecutor

    from text2human_tpu.data.loader import collate

    if variants not in (1, 2):
        # variant 0 is unflipped, variant 1 flipped; anything beyond would
        # silently store unflipped duplicates and skew xflip sampling
        raise ValueError(f"variants must be 1 or 2, got {variants}")
    os.makedirs(cache_dir, exist_ok=True)
    n = len(dataset)
    memmaps: Dict[str, np.memmap] = {}
    dtypes: Dict[str, np.dtype] = {}
    fnames: List[str] = []
    total = variants * n
    done = 0

    descs = [(v, s) for v in range(variants) for s in range(0, n, batch_size)]

    def make_batch(desc):
        v, start = desc
        idx = list(range(start, min(start + batch_size, n)))
        samples = [dataset[i] for i in idx]
        names = (
            [str(s.get("img_name", i)) for s, i in zip(samples, idx)]
            if v == 0 else []
        )
        if v == 1:
            samples = [flip_sample(s) for s in samples]
        # pad the tail batch to the compiled batch size
        pad = batch_size - len(samples)
        if pad:
            samples = samples + [samples[-1]] * pad
        return v, start, idx, names, collate(samples)

    with ThreadPoolExecutor(max_workers=max(workers, 1)) as pool:
        depth = max(prefetch, 1)
        pending = [pool.submit(make_batch, d) for d in descs[:depth]]
        queued = depth
        for _ in range(len(descs)):
            v, start, idx, names, batch = pending.pop(0).result()
            if queued < len(descs):
                pending.append(pool.submit(make_batch, descs[queued]))
                queued += 1
            fnames.extend(names)
            pad = batch_size - len(idx)
            out = tokenize_batch(batch)
            for k, arr in out.items():
                arr = np.asarray(arr)
                if pad:
                    arr = arr[: len(idx)]
                if k not in memmaps:
                    dtypes[k] = _pick_dtype(arr)
                    memmaps[k] = np.lib.format.open_memmap(
                        osp.join(cache_dir, f"{k}.npy"),
                        mode="w+",
                        dtype=dtypes[k],
                        shape=(variants, n) + arr.shape[1:],
                    )
                info = np.iinfo(dtypes[k])
                if arr.min() < info.min or arr.max() > info.max:
                    dtypes[k] = _pick_dtype(arr)
                    memmaps[k] = _widen_memmap(
                        osp.join(cache_dir, f"{k}.npy"), memmaps[k], dtypes[k]
                    )
                memmaps[k][v, start : start + len(idx)] = arr.astype(dtypes[k])
            done += len(idx)
            if progress is not None:
                progress(done, total)
    for m in memmaps.values():
        m.flush()
    meta = {
        "num_samples": n,
        "variants": variants,
        "fields": {
            k: {"dtype": str(dtypes[k]), "shape": list(memmaps[k].shape[2:])}
            for k in memmaps
        },
        "fnames": fnames,
        **(extra_meta or {}),
    }
    with open(osp.join(cache_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


class TokenDataset:
    """Map-style dataset over a built token cache.

    ``xflip=True`` picks a random flip variant per access (the cache must have
    been built with ``variants=2``), mirroring the reference's synchronized
    random xflip — but on tokens, for free.
    """

    def __init__(self, cache_dir: str, xflip: bool = False):
        with open(osp.join(cache_dir, _META)) as f:
            self.meta = json.load(f)
        self.n = int(self.meta["num_samples"])
        self.variants = int(self.meta["variants"])
        if xflip and self.variants < 2:
            raise ValueError(
                f"xflip requested but the cache at {cache_dir} was built "
                f"with variants={self.variants}; rebuild with --variants 2 "
                "or set `xflip: false` in the training YAML"
            )
        self.xflip = xflip
        self.fnames = self.meta.get("fnames") or []
        self.fields = {
            k: np.load(osp.join(cache_dir, f"{k}.npy"), mmap_mode="r")
            for k in self.meta["fields"]
        }

    def __len__(self):
        return self.n

    def fields_at(self, variant: int, index: int) -> Dict[str, np.ndarray]:
        return {
            # int32 device-side: small index dtypes are a storage format, not
            # a compute one (gather/one_hot paths expect i32)
            k: np.asarray(m[variant, index]).astype(np.int32)
            for k, m in self.fields.items()
        }

    def __getitem__(self, index: int) -> Dict[str, Any]:
        v = random.randrange(self.variants) if self.xflip else 0
        out: Dict[str, Any] = self.fields_at(v, index)
        if self.fnames:
            out["img_name"] = self.fnames[index]
        return out


class HybridTokenDataset:
    """Pixels from ``base`` + cached frozen-path tokens, flip-synchronized.

    The bottom hierarchy GAN job still needs pixels every step (bot encoder
    input, L1/LPIPS targets, disc reals) but its frozen TOP path is a pure
    function of the sample — this dataset pairs the pixel sample with the
    pre-tokenized top indices so training skips the frozen full-res top
    encoder.  The flip variant is drawn HERE and applied to both halves:
    ``base`` must be constructed with xflip disabled (tokens of a flipped
    image are not a flip of the tokens).
    """

    def __init__(self, base, cache_dir: str, xflip: bool = False):
        if getattr(base, "xflip", False):
            raise ValueError(
                "HybridTokenDataset flips samples itself; construct the base "
                "dataset with xflip=False"
            )
        self.base = base
        # xflip passed through for its variants>=2 validation; the hybrid
        # draws the variant itself (fields_at) so both halves stay in sync
        self.tokens = TokenDataset(cache_dir, xflip=xflip)
        self.meta = self.tokens.meta
        self.xflip = xflip
        if len(base) != len(self.tokens):
            raise ValueError(
                f"token cache at {cache_dir} holds {len(self.tokens)} samples "
                f"but the pixel dataset has {len(base)}; rebuild the cache "
                "from the same annotation file"
            )

    def __len__(self):
        return len(self.base)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        v = random.randrange(self.tokens.variants) if self.xflip else 0
        sample = self.base[index]
        name = sample.get("img_name")
        if self.tokens.fnames and name is not None:
            cached = self.tokens.fnames[index]
            if str(name) != str(cached):
                raise ValueError(
                    f"token cache misaligned at index {index}: cache was "
                    f"built from {cached!r}, pixel dataset yields {name!r}"
                )
        sample = flip_sample(sample) if v == 1 else dict(sample)
        sample.update(self.tokens.fields_at(v, index))
        return sample
