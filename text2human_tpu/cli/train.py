"""Training CLI: one entry point for the five reference train scripts.

  python -m text2human_tpu.cli.train -opt configs/vqvae_top.yml
  python -m text2human_tpu.cli.train -opt configs/sampler.yml --synthetic

Replaces train_vqvae.py / train_parsing_gen.py / train_parsing_token.py /
train_sampler.py / train_index_prediction.py (reference repo root): epoch loop
with per-iteration logging + ETA, per-epoch validation and checkpointing, and
epoch-indexed lr schedules.  ``--synthetic`` swaps in the synthetic dataset so
the whole loop runs without DeepFashion on disk.
"""

from __future__ import annotations

import argparse
import signal
import threading
import os
import os.path as osp
import time
from collections import deque
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from text2human_tpu.cli.builders import build_trainer
from text2human_tpu.config import dict2str, parse
from text2human_tpu.data.datasets import (
    DeepFashionAttrSegmDataset,
    MaskDataset,
    ParsingGenerationDataset,
    SyntheticDataset,
)
from text2human_tpu.data.loader import DataLoader
from text2human_tpu.trainers.base import lr_for_epoch, set_learning_rate
from text2human_tpu.utils.checkpoint import AsyncCheckpointWriter
from text2human_tpu.utils.logger import MessageLogger, get_root_logger
from text2human_tpu.utils.misc import make_exp_dirs, set_random_seed

# set by SIGTERM (pod preemption): the train loop checkpoints at the next
# iteration boundary and exits cleanly so --resume continues the run
PREEMPTED = threading.Event()


def _install_sigterm_handler():
    try:
        return signal.signal(signal.SIGTERM, lambda s, f: PREEMPTED.set())
    except ValueError:  # not the main thread (e.g. embedded use)
        return None


def _train_xflip(opt: Dict[str, Any], split: str) -> bool:
    """The reference train scripts hard-code ``xflip=True`` on the train
    split (train_vqvae.py:44, train_sampler.py:44, train_parsing_token.py:40,
    train_index_prediction.py:44) and never flip val/test.  YAML
    ``xflip: false`` opts out."""
    if split != "train":
        return False
    v = opt.get("xflip")
    return True if v is None else bool(v)


def _net_resolution(opt: Dict[str, Any]) -> int:
    """The configured network input resolution (one key per job family)."""
    return (
        opt.get("resolution")
        or opt.get("top_resolution")
        or opt.get("img_resolution")
        or 512
    )


def make_dataset(opt: Dict[str, Any], split: str, synthetic: bool):
    # pre-tokenized cache (cli/tokenize.py): the frozen-tokenizer jobs train
    # straight from cached integer indices — no frozen conv forwards, no
    # image decode; the hierarchy GAN job pairs pixels with cached top
    # indices to skip its frozen full-res top encoder (data/token_cache.py)
    tc = opt.get("token_cache")
    if (
        tc
        and not synthetic
        and opt["model_type"]
        in (
            "TransformerTextureAwareModel",
            "VQGANTextureAwareSpatialHierarchyInferenceModel",
            "HierarchyVQSpatialTextureAwareModel",
        )
    ):
        meta = osp.join(tc, split, "meta.json")
        if not osp.exists(meta):
            # a configured-but-missing cache must never silently fall back
            # to the ~2x-slower per-step frozen forwards (or crash later on
            # a pixel-free host with an unrelated error)
            raise FileNotFoundError(
                f"token_cache: {tc!r} is configured but {meta} does not "
                "exist; build it with `python -m text2human_tpu.cli.tokenize "
                f"-opt <config> --out {tc}` (all of --splits), or remove "
                "token_cache: to train from pixels"
            )
        from text2human_tpu.data.token_cache import (
            HybridTokenDataset,
            TokenDataset,
        )

        if opt["model_type"] == "HierarchyVQSpatialTextureAwareModel":
            img_dir = (
                opt["train_img_dir"] if split == "train" else opt["test_img_dir"]
            )
            base = DeepFashionAttrSegmDataset(
                img_dir,
                opt["segm_dir"],
                opt["pose_dir"],
                opt[f"{split}_ann_file"],
                opt.get("downsample_factor") or 2,
                xflip=False,  # the hybrid dataset draws + applies the flip
            )
            return HybridTokenDataset(
                base, osp.join(tc, split), xflip=_train_xflip(opt, split)
            )
        return TokenDataset(osp.join(tc, split), xflip=_train_xflip(opt, split))
    if opt.get("fixture"):
        # --fixture: the structured, learnable dataset (every field a
        # function of a small latent — data/datasets.py) at full network
        # resolution.  Unlike --synthetic this is a REAL run in every other
        # respect: frozen checkpoints are required and loaded, caches are
        # fingerprint-checked — it exists so full-size training campaigns
        # can run end-to-end on hardware without the DeepFashion files.
        from text2human_tpu.data.datasets import OverfitFixtureDataset

        length = opt.get("synthetic_length") or 8 * (opt.get("batch_size") or 4)
        # non-train splits: a disjoint held-out index range, 1/8 the size
        val_len = max(length // 8, opt.get("batch_size") or 4)
        return OverfitFixtureDataset(
            length=length if split == "train" else val_len,
            resolution=opt.get("synthetic_resolution") or _net_resolution(opt),
            bands=opt.get("fixture_bands") or 4,
            rich=bool(opt.get("fixture_rich")),
            offset=0 if split == "train" else length,
        )
    if synthetic:
        # synthetic images must match the configured network resolution
        res = opt.get("synthetic_resolution") or _net_resolution(opt)
        return SyntheticDataset(
            length=opt.get("synthetic_length") or 2 * (opt.get("batch_size") or 4),
            resolution=res,
            num_segm_classes=opt.get("num_segm_classes")
            or opt.get("segm_num_segm_classes")
            or 24,
        )
    mt = opt["model_type"]
    ann = opt[f"{split}_ann_file"]
    if mt == "VQSegmentationModel":
        return MaskDataset(
            opt["segm_dir"], ann, opt.get("downsample_factor") or 2,
            xflip=_train_xflip(opt, split),
        )
    if mt == "ParsingGenModel":
        # the reference's parsing-gen loader never flips (train_parsing_gen.py)
        return ParsingGenerationDataset(
            opt["segm_dir"], opt["pose_dir"], ann, opt.get("downsample_factor") or 2
        )
    img_dir = opt["train_img_dir"] if split == "train" else opt["test_img_dir"]
    return DeepFashionAttrSegmDataset(
        img_dir,
        opt["segm_dir"],
        opt["pose_dir"],
        ann,
        opt.get("downsample_factor") or 2,
        xflip=_train_xflip(opt, split),
    )


def to_device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    return {
        k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)
    }


class TrainLoop:
    """Adapter running any of the six trainers over the shared epoch loop."""

    def __init__(self, opt, trainer, synthetic: bool, mesh=None, token_meta=None,
                 pp_microbatches: int = 0):
        self.opt = opt
        self.trainer = trainer
        self.mt = opt["model_type"]
        self.key = jax.random.key(opt.get("manual_seed") or 0)
        self.synthetic = synthetic
        self.state = None
        self.frozen: Dict[str, Any] = {}
        self.mesh = mesh
        # pipeline parallelism (sampler job only): > 0 selects the GPipe
        # trunk schedule of parallel/pp.py with this many microbatches; the
        # mesh must carry a 'pp' axis
        self.pp_microbatches = pp_microbatches
        self._pp_step = None
        if pp_microbatches:
            if self.mt != "TransformerTextureAwareModel":
                raise ValueError(
                    "--pp pipelines the sampler transformer trunk; "
                    f"model_type {self.mt} has no pipeline layout"
                )
            if mesh is None or "pp" not in dict(mesh.shape):
                raise ValueError("pp_microbatches > 0 needs a mesh with a 'pp' axis")
        # meta.json of the TokenDataset feeding this loop, if any — a cache
        # built from REAL checkpoints must never be consumed against
        # random-init frozen codebooks (they are load-bearing at gather time)
        self.token_meta = token_meta

    def _shard(self, batch):
        if self.mesh is None:
            return batch
        from text2human_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    def _distribute_state(self):
        if self.mesh is None:
            return
        from text2human_tpu.parallel.mesh import replicate_tree

        if self.pp_microbatches:
            # pp layout: block params sharded on the pp axis, everything else
            # (embeddings/heads, optimizer counts) replicated.  Optimizer
            # moments are param-shaped, so they take the same pp layout as the
            # params directly — no device ever holds the full moment tree and
            # the first step compiles against the steady-state sharding
            # (matters most on --resume, where the moments are real data).
            # Idempotent: called again after --resume swaps in the restored
            # state.
            from text2human_tpu.parallel.pp import (
                make_pp_train_step, shard_pp_params,
            )

            self.state = replicate_tree(self.mesh, self.state).replace(
                params=shard_pp_params(self.mesh, self.state.params),
                opt_state=shard_pp_params(self.mesh, self.state.opt_state),
            )
            if self._pp_step is None:
                self._pp_step = make_pp_train_step(
                    self.trainer, self.mesh,
                    num_microbatches=self.pp_microbatches,
                )
        else:
            self.state = replicate_tree(self.mesh, self.state)
        self.frozen = {
            k: replicate_tree(self.mesh, v) for k, v in self.frozen.items()
        }

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    @staticmethod
    def _is_token_batch(b) -> bool:
        return "x0_cont" in b or "top_local" in b

    def _dummy_pixel_batch(self):
        """Shape-only pixel batch for init when training from a token cache
        (frozen-param random-init fallback and state init need pixel shapes)."""
        res = _net_resolution(self.opt)
        h, w = res, res // 2
        return {
            "image": jnp.zeros((1, h, w, 3), jnp.float32),
            "segm": jnp.zeros((1, h, w), jnp.float32),
            "texture_mask": jnp.zeros((1, h, w), jnp.float32),
        }

    def init(self, first_batch):
        t, mt, key = self.trainer, self.mt, self._next_key()
        self._check_cache_checkpoints()
        b = to_device_batch(first_batch)
        if self._is_token_batch(b) and "image" not in b:
            # pixel-free token batch (sampler/index-pred caches); hybrid
            # hierarchy batches carry real pixels and init from them
            b = self._dummy_pixel_batch()
        if mt == "VQSegmentationModel":
            self.state = t.init_state(key, b["segm"])
        elif mt in ("VQImageModel", "VQImageSegmTextureModel",
                    "HierarchyVQSpatialTextureAwareModel"):
            gen = t.init_gen_params(key, b["image"], b.get("texture_mask"))
            self.state = t.init_state(self._next_key(), gen, b["image"])
            if mt == "HierarchyVQSpatialTextureAwareModel":
                self._load_into_gen("top_vae_path")
                p = self.opt.get("top_vae_path")
                if self._consuming_real_cache() and not (p and osp.exists(p)):
                    # hybrid cached training gathers the cached top indices
                    # against the frozen top codebook every step — with a
                    # random-init codebook the GAN would train against
                    # garbage top features without an error anywhere
                    raise FileNotFoundError(
                        "training the hierarchy job from a real token cache "
                        "needs top_vae_path: cached top indices decode "
                        "through the frozen top codebook every step"
                    )
        elif mt == "TransformerTextureAwareModel":
            self._load_frozen_from(b)
            self.state = t.init_state(self._next_key())
        elif mt == "VQGANTextureAwareSpatialHierarchyInferenceModel":
            self._load_frozen_from(b)
            data = t.prepare(self.frozen["vq"], b)
            self.state = t.init_state(self._next_key(), data["feature_top"])
        elif mt == "ParsingGenModel":
            self.state = t.init_state(self._next_key(), b["densepose"], b["attr"])
        else:
            raise ValueError(self.mt)

    def load_frozen(self, first_batch):
        """Frozen tokenizer params only (cli/tokenize.py): a cache build never
        touches the trainable state, so skip the transformer/UNet init and the
        optimizer allocation that ``init`` would pay."""
        b = to_device_batch(first_batch)
        if self._is_token_batch(b):
            b = self._dummy_pixel_batch()
        self._load_frozen_from(b)

    def _load_frozen_from(self, b):
        t, mt = self.trainer, self.mt
        if mt == "TransformerTextureAwareModel":
            self.frozen["img"] = self._frozen_params(
                "img_ae_path",
                lambda: t.img_vq.init(
                    self._next_key(), b["image"], b["texture_mask"]
                )["params"],
            )
            self.frozen["segm"] = self._frozen_params(
                "segm_ae_path",
                lambda: t.segm_vq.init(
                    self._next_key(),
                    jax.nn.one_hot(b["segm"].astype(jnp.int32),
                                   t.segm_vq.cfg.in_channels, dtype=jnp.float32),
                )["params"],
            )
        elif mt == "VQGANTextureAwareSpatialHierarchyInferenceModel":
            self.frozen["vq"] = self._frozen_hierarchy_params(
                lambda: t.hierarchy.init(
                    self._next_key(), b["image"], b["texture_mask"]
                )["params"],
            )
        else:
            raise ValueError(f"{mt} has no frozen tokenizers")

    def _check_cache_checkpoints(self):
        """Cached indices must be gathered against the SAME frozen
        checkpoints the cache was built from — a re-exported/replaced
        checkpoint would silently train on garbage features.  Compares the
        fingerprints the build recorded (caches from before the key are
        accepted, matching the 'synthetic' flag's back-compat)."""
        if not self._consuming_real_cache():
            return
        recorded = self.token_meta.get("checkpoints") or {}
        from text2human_tpu.data.token_cache import checkpoint_fingerprint

        for key, rec in recorded.items():
            path = self.opt.get(key)
            if not (path and osp.exists(path)):
                continue  # the per-job existence guards handle missing paths
            actual = checkpoint_fingerprint(path)
            if any(rec.get(k) != v for k, v in actual.items()):
                raise ValueError(
                    f"token cache was built from a different {key} than the "
                    f"configured {path} (recorded {rec.get('sha256', '?')[:12]}, "
                    f"actual {actual['sha256'][:12]}); rebuild the cache with "
                    "cli/tokenize.py or restore the original checkpoint"
                )

    def _consuming_real_cache(self) -> bool:
        """True when this loop trains from a token cache that was built with
        the real frozen checkpoints (meta records ``synthetic``; caches from
        before the key are treated as real — the strict direction)."""
        return (
            self.token_meta is not None
            and not self.synthetic
            and not self.token_meta.get("synthetic", False)
        )

    def _sampler_tokens(self, b):
        """Sampler train/eval/vis tokens: straight from a cached token batch,
        else through the frozen tokenizers (the single dispatch point — train,
        validate and save_visuals must never diverge on this)."""
        if "x0_cont" in b:
            return b
        return self.trainer.tokenize(self.frozen["img"], self.frozen["segm"], b)

    def _hierarchy_data(self, b):
        """Index-pred prepared features, from cached tokens or pixels."""
        if "top_local" in b:
            return self.trainer.prepare_from_tokens(self.frozen["vq"], b)
        return self.trainer.prepare(self.frozen["vq"], b)

    def _frozen_hierarchy_params(self, random_init):
        """HierarchyVQ params from BOTH the top and bottom checkpoints
        (reference hierarchy_inference_model.py:131-168)."""
        top = self.opt.get("top_vae_path")
        bot = self.opt.get("bot_vae_path")
        if not self.synthetic and (top or bot):
            missing = [p for p in (top, bot) if not (p and osp.exists(p))]
            if missing:
                # never silently train against random frozen tokenizers
                raise FileNotFoundError(
                    "index-prediction training needs both top_vae_path and "
                    f"bot_vae_path checkpoints; missing: {missing}"
                )
            if osp.isdir(top) and osp.isdir(bot):
                from text2human_tpu.utils.native_frozen import (
                    native_hierarchy_params,
                )

                return native_hierarchy_params(top, bot)
            from text2human_tpu.utils.torch_import import convert_hierarchy_params

            return convert_hierarchy_params(top, bot)
        if self._consuming_real_cache():
            # prepare_from_tokens gathers cached indices against the frozen
            # top codebook — with a random-init codebook the loss would still
            # decrease while learning garbage, so fail instead
            raise FileNotFoundError(
                "training index-prediction from a real token cache needs "
                "top_vae_path and bot_vae_path: the cached indices are "
                "decoded through the frozen codebooks every step"
            )
        return random_init()

    def _frozen_params(self, path_key: str, random_init):
        path = self.opt.get(path_key)
        if path and osp.isdir(path):
            # native orbax checkpoint from a cli/train.py run of the
            # upstream job — the all-native dependency chain
            # (utils/native_frozen.py); loads even under --synthetic, since
            # a native checkpoint carries this framework's own dims
            from text2human_tpu.utils import native_frozen as nf

            if path_key in ("img_ae_path", "top_vae_path"):
                return nf.native_top_params(path)
            if path_key == "segm_ae_path":
                return nf.native_segm_params(path)
        if path and osp.exists(path) and not self.synthetic:
            from text2human_tpu.utils import torch_import as ti

            ckpt = ti.load_pth(path)
            if path_key == "img_ae_path" or path_key == "top_vae_path":
                return ti.convert_top_vqgan(ckpt)["params"]
            if path_key == "segm_ae_path":
                return ti.convert_segm_tokenizer(ckpt)["params"]
        if self._consuming_real_cache():
            # cached sampler training itself never touches these params
            # (the tokens are precomputed), but the epoch visuals decode
            # through them — warn rather than block the pixel-free use case
            get_root_logger().warning(
                f"{path_key} not set while training from a real token cache: "
                "training reads cached tokens and is unaffected, but epoch "
                "visual decodes will go through a RANDOM codebook"
            )
        return random_init()

    def _load_into_gen(self, path_key: str):
        """Warm-start hierarchy gen params with the converted top checkpoint."""
        path = self.opt.get(path_key)
        if not (path and osp.exists(path)) or self.synthetic:
            return
        if osp.isdir(path):
            # native top checkpoint (utils/native_frozen.py); the GAN tree
            # keeps its own disc — only the gen warm-start applies
            from text2human_tpu.utils.native_frozen import native_top_params

            top = {"params": native_top_params(path)}
        else:
            from text2human_tpu.utils import torch_import as ti

            top = ti.convert_top_vqgan(ti.load_pth(path))
        gen = dict(self.state.params["gen"])
        gen["top_encoder"] = top["params"]["encoder"]
        gen["decoder"] = top["params"]["decoder"]
        gen["top_quantize"] = top["params"]["quantize"]
        gen["top_quant_conv"] = top["params"]["quant_conv"]
        gen["top_post_quant_conv"] = top["params"]["post_quant_conv"]
        params = dict(self.state.params)
        params["gen"] = gen
        batch_stats = dict(self.state.batch_stats or {})
        if "discriminator" in top:
            params["disc"] = top["discriminator"]["params"]
            batch_stats["disc"] = top["discriminator"].get(
                "batch_stats", batch_stats.get("disc", {})
            )
        self.state = self.state.replace(params=params, batch_stats=batch_stats)

    # Host->device wire filter: fields each job's train/eval/visual steps
    # can ever read.  The datasets ship the full DeepFashion field set
    # (image + segm + densepose + texture_mask + attrs, ~80 MB per b=16
    # batch at 512x256); jobs that consume a subset should not pay HBM or
    # host-link bandwidth for the rest — on tunneled single-pipe device
    # transports the dead fields more than quadrupled the per-step wire
    # bytes of the parsing-gen job (its step reads only densepose/attr/
    # segm).  Jobs not listed place everything they get (token-cache and
    # multi-input jobs).
    _JOB_WIRE_FIELDS = {
        "ParsingGenModel": ("densepose", "attr", "segm"),
        "VQSegmentationModel": ("segm",),
    }

    # Integer-valued float fields (parsing class maps, 0..23) travel as
    # uint8 and are widened back to float32 on device: 4x fewer wire bytes
    # for the same values.
    _WIRE_U8 = ("segm", "texture_mask")

    def place(self, batch) -> Dict[str, Any]:
        """Host batch -> its final device placement (sharded under --dp).
        Called by the device prefetcher one step ahead of ``step`` so the
        transfer overlaps the previous step's compute; ``step``'s own
        placement of an already-placed batch is a no-op.  Only the fields
        the job consumes are transferred (_JOB_WIRE_FIELDS), and integer-
        valued class maps are shipped narrow (_WIRE_U8)."""
        keep = self._JOB_WIRE_FIELDS.get(self.mt)
        if keep is not None:
            batch = {k: v for k, v in batch.items() if k in keep}
        out = {}
        for k, v in batch.items():
            if isinstance(v, list):
                continue
            if k in self._WIRE_U8 and not isinstance(v, jax.Array):
                out[k] = jnp.asarray(np.asarray(v, dtype=np.uint8)).astype(
                    jnp.float32
                )
            else:
                out[k] = jnp.asarray(v)
        return self._shard(out)

    def step(self, batch) -> Dict[str, Any]:
        """One training step.  Returns the trainer's log scalars as DEVICE
        arrays: converting them to floats here would force a host round-trip
        every iteration, serializing the whole loop against the device (the
        caller syncs at print boundaries instead)."""
        t, mt = self.trainer, self.mt
        b = self._shard(to_device_batch(batch))
        if mt == "VQSegmentationModel":
            self.state, logs = t.train_step(self.state, b)
        elif mt in ("VQImageModel", "VQImageSegmTextureModel",
                    "HierarchyVQSpatialTextureAwareModel"):
            self.state, logs = t.train_step(self.state, b, self._next_key())
        elif mt == "TransformerTextureAwareModel":
            tokens = self._sampler_tokens(b)
            step_fn = self._pp_step or t.train_step
            self.state, logs = step_fn(self.state, tokens, self._next_key())
        elif mt == "VQGANTextureAwareSpatialHierarchyInferenceModel":
            data = self._hierarchy_data(b)
            self.state, logs = t.train_step(self.state, data, self._next_key())
        elif mt == "ParsingGenModel":
            self.state, logs = t.train_step(self.state, b, self._next_key())
        return logs

    def save_visuals(self, batch, vis_dir: str, epoch: int):
        """Side-by-side input/output grids per val epoch (the reference's
        empirical QC, e.g. models/vqgan_model.py:234-238)."""
        from PIL import Image

        from text2human_tpu.ui.session import segm_to_palette

        os.makedirs(vis_dir, exist_ok=True)
        t, mt = self.trainer, self.mt
        b = to_device_batch(batch)

        def put(path, arr01):
            arr = np.clip(np.asarray(arr01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(path)

        if mt == "VQSegmentationModel":
            rec = np.asarray(t.reconstruct(self.state.params, b["segm"]))
            pair = np.concatenate(
                [segm_to_palette(np.asarray(b["segm"][0])), segm_to_palette(rec[0])],
                axis=1,
            )
            Image.fromarray(pair).save(
                osp.join(vis_dir, f"epoch{epoch}_segm_recon.png")
            )
            # the reference's random-projection colorize view
            # (models/vqgan_model.py:173-174,194-197)
            from text2human_tpu.ops.nn import one_hot_segm

            oh = one_hot_segm(b["segm"][:1], t.cfg.num_segm_classes)
            oh_rec = one_hot_segm(jnp.asarray(rec[:1]), t.cfg.num_segm_classes)
            rgb = jnp.concatenate(
                [t.to_rgb(oh)[0], t.to_rgb(oh_rec)[0]], axis=1
            )
            put(osp.join(vis_dir, f"epoch{epoch}_segm_recon_proj.png"),
                (rgb + 1) / 2)
        elif mt in ("VQImageModel", "VQImageSegmTextureModel",
                    "HierarchyVQSpatialTextureAwareModel"):
            xrec, _, _ = t.ae_apply(
                self.state.params["gen"], b["image"], b.get("texture_mask")
            )
            pair = jnp.concatenate([b["image"][0], xrec[0]], axis=1)
            put(osp.join(vis_dir, f"epoch{epoch}_recon.png"),
                jnp.clip((pair + 1) / 2, 0, 1))
        elif mt == "TransformerTextureAwareModel":
            # reference get_vis triptych (transformer_model.py:386-399):
            # [image | decode(gt indices) | decode(sampled indices)]
            from text2human_tpu.models.composites import TextureVQGAN

            tokens = self._sampler_tokens(b)
            h, w = t.tf_cfg.latent_shape
            gt = tokens["gt_local"][:1].reshape(1, h, w)
            pred_local, _ = t.sample(
                self.state.params,
                tokens["segm_tokens"][:1],
                tokens["texture_tokens"][:1],
                self._next_key(),
            )
            # token-cache batches carry no pixels: the latent texture tokens
            # stand in for the full-res mask (nearest-downsample of a map to
            # its own resolution is the identity)
            mask1 = (
                b["texture_mask"][:1]
                if "texture_mask" in b
                else tokens["texture_tokens"][:1].reshape(1, h, w).astype(jnp.float32)
            )

            def dec(idx):
                return t.img_vq.apply(
                    {"params": self.frozen["img"]}, idx, mask1,
                    method=TextureVQGAN.decode_indices,
                )

            cols = [dec(gt)[0], dec(pred_local.reshape(1, h, w))[0]]
            if "image" in b:  # token-cache batches carry no pixels
                cols.insert(0, b["image"][0])
            tri = jnp.concatenate(cols, axis=1)
            put(osp.join(vis_dir, f"epoch{epoch}_sample.png"),
                jnp.clip((tri + 1) / 2, 0, 1))
        elif mt == "VQGANTextureAwareSpatialHierarchyInferenceModel":
            # reference get_vis 4-way (hierarchy_inference_model.py:212-225):
            # [image | gt-bottom recon | top-only decode | predicted-bottom]
            from text2human_tpu.models.composites import HierarchyVQ

            data = self._hierarchy_data(b)
            mask1 = (
                data["cb_ids"][:1].astype(jnp.float32)
                if "top_local" in b
                else b["texture_mask"][:1]
            )
            ft = data["feature_top"][:1]
            pred, _ = t.predict_bot_indices(
                self.state.params, self.state.batch_stats, ft, mask1
            )
            vqp = {"params": self.frozen["vq"]}

            def dec_bot(idx):
                return t.hierarchy.apply(
                    vqp, ft, idx, mask1, method=HierarchyVQ.decode_from_bot_indices
                )

            base = t.hierarchy.apply(
                vqp, ft, method=lambda m, q: m.decoder(q)
            )
            cols = [dec_bot(data["gt_indices"][:1])[0], base[0], dec_bot(pred)[0]]
            if "image" in b:  # token-cache batches carry no pixels
                cols.insert(0, b["image"][0])
            quad = jnp.concatenate(cols, axis=1)
            put(osp.join(vis_dir, f"epoch{epoch}_hierarchy.png"),
                jnp.clip((quad + 1) / 2, 0, 1))
        elif mt == "ParsingGenModel":
            ev = t.eval_step(self.state.params, self.state.batch_stats, b)
            pair = np.concatenate(
                [segm_to_palette(np.asarray(b["segm"][0])),
                 segm_to_palette(np.asarray(ev["pred"][0]))],
                axis=1,
            )
            Image.fromarray(pair).save(
                osp.join(vis_dir, f"epoch{epoch}_parsing.png")
            )

    def validate(self, loader) -> Dict[str, float]:
        t, mt = self.trainer, self.mt
        sums: Dict[str, float] = {}
        n = 0
        for batch in loader:
            b = to_device_batch(batch)
            if mt == "VQSegmentationModel":
                logs = t.eval_step(self.state.params, b)
            elif mt in ("VQImageModel", "VQImageSegmTextureModel",
                        "HierarchyVQSpatialTextureAwareModel"):
                logs = t.eval_loss(self.state.params["gen"], b)
            elif mt == "TransformerTextureAwareModel":
                tokens = self._sampler_tokens(b)
                logs = t.eval_step(self.state.params, tokens, jax.random.key(0))
            elif mt == "VQGANTextureAwareSpatialHierarchyInferenceModel":
                data = self._hierarchy_data(b)
                logs = t.eval_step(self.state.params, self.state.batch_stats, data)
                logs = {"accuracy": logs["accuracy"]}
            elif mt == "ParsingGenModel":
                logs = t.eval_step(self.state.params, self.state.batch_stats, b)
                logs = {"accuracy": logs["accuracy"]}
            for k, v in logs.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    def set_lr(self, epoch: int, iters: int):
        # 'schedule'/'linear2exp' are cumulative in the reference (lr *= gamma
        # once per epoch) — thread the previous value and only advance them on
        # epoch boundaries
        mode = self.opt.get("lr_decay", "step")
        if mode in ("schedule", "linear2exp"):
            if getattr(self, "_lr_epoch", None) != epoch:
                self._lr = lr_for_epoch(
                    self.opt, epoch, iters, prev_lr=getattr(self, "_lr", None)
                )
                self._lr_epoch = epoch
            lr = self._lr
        else:
            lr = lr_for_epoch(self.opt, epoch, iters)
        for opt_state in (
            self.state.opt_state.values()
            if isinstance(self.state.opt_state, dict)
            else [self.state.opt_state]
        ):
            try:
                set_learning_rate(opt_state, lr)
            except (AttributeError, KeyError):
                pass
        return lr


def main(argv=None):
    # kill -USR1 <pid> dumps every Python thread's stack to stderr — the
    # only way to see where a run is blocked when a tunneled device backend
    # wedges (no ptrace/py-spy in the training containers)
    import faulthandler
    import signal as _signal

    try:
        faulthandler.register(_signal.SIGUSR1, all_threads=True)
    except (AttributeError, ValueError):
        pass  # non-main thread or platform without SIGUSR1
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--synthetic", action="store_true",
                        help="train on synthetic data (smoke/debug)")
    parser.add_argument("--fixture", action="store_true",
                        help="train on the structured learnable fixture "
                             "dataset at full network resolution; unlike "
                             "--synthetic, checkpoints/caches keep their "
                             "real-run semantics (full-size hardware "
                             "campaigns without DeepFashion files)")
    parser.add_argument("--max-iters", type=int, default=0)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (debug runs)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint (full state: "
                             "params, optimizer, step — absent in the reference)")
    parser.add_argument("--dp", action="store_true",
                        help="data-parallel over all local devices: batches "
                             "sharded on a dp mesh, params replicated, grads "
                             "psum'd by XLA")
    parser.add_argument("--pp", type=int, default=0,
                        help="pipeline-parallel stages for the sampler job: "
                             "block params sharded over a 'pp' mesh axis, "
                             "GPipe microbatch schedule (parallel/pp.py); "
                             "remaining devices become dp")
    parser.add_argument("--microbatches", type=int, default=2,
                        help="microbatches per pp pipeline step (clamped to "
                             "the largest divisor of the per-dp-shard batch)")
    parser.add_argument("--coordinator", default="",
                        help="multi-controller training: coordinator "
                             "address (host:port) for "
                             "jax.distributed.initialize; every process "
                             "runs this same CLI with its own --process-id "
                             "and sees the GLOBAL device mesh")
    parser.add_argument("--num-processes", type=int, default=1,
                        help="total processes in the multi-controller job")
    parser.add_argument("--process-id", type=int, default=0,
                        help="this process's rank in [0, --num-processes)")
    args = parser.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator:
        # multi-controller SPMD: one process per host, each addressing its
        # local chips; jax.devices() is global afterwards and every jitted
        # computation on mesh-placed arrays is launched by all processes
        # (scaling-book multihost recipe; must run before any backend use)
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        if not (args.dp or args.pp):
            args.dp = True  # global arrays need a mesh; dp is the default
    primary = jax.process_index() == 0

    # persistent XLA cache: warm restarts (and preemption recovery) skip the
    # minutes-long cold compile
    from text2human_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    opt = parse(args.opt, is_train=True)
    if args.fixture:
        opt["fixture"] = True
    make_exp_dirs(opt)  # training dirs are exist_ok; safe on every rank
    # non-primary ranks log to their own file (two processes appending to
    # one file interleave) and write no JSONL/visuals — host-side artifacts
    # come from rank 0; DEVICE work (steps, val, checkpoint saves) runs on
    # every rank because jitted computations on the global mesh and orbax
    # multihost saves are collective
    logger = get_root_logger(
        log_file=osp.join(
            opt["path"]["log"],
            f"train_{opt['name']}.log" if primary
            else f"train_{opt['name']}.p{jax.process_index()}.log",
        )
    )
    logger.info(dict2str(dict(opt)))
    set_random_seed(opt.get("manual_seed") or 0)

    train_ds = make_dataset(opt, "train", args.synthetic)
    val_ds = make_dataset(opt, "val", args.synthetic)
    loader = DataLoader(
        train_ds,
        batch_size=opt.get("batch_size") or 4,
        shuffle=True,
        num_workers=opt.get("num_workers") or 4,
    )
    val_loader = DataLoader(val_ds, batch_size=1, num_workers=2, drop_last=False)

    trainer = build_trainer(opt)
    mesh = None
    pp_microbatches = 0
    bs = opt.get("batch_size") or 4
    n = len(jax.devices())
    if args.pp:
        from text2human_tpu.parallel.mesh import make_mesh

        pp = args.pp
        if n < pp:
            raise SystemExit(f"--pp {pp}: only {n} devices visible")
        # remaining devices become dp; dp must divide the batch
        avail_dp = n // pp
        dp = max(d for d in range(1, min(bs, avail_dp) + 1) if bs % d == 0)
        mesh = make_mesh({"pp": pp, "dp": dp}, jax.devices()[: pp * dp])
        per_shard = bs // dp
        m = max(d for d in range(1, min(args.microbatches, per_shard) + 1)
                if per_shard % d == 0)
        pp_microbatches = m
        logger.info(
            f"pipeline-parallel mesh: {mesh.shape} (batch {bs}, "
            f"{m} microbatches)"
        )
    elif args.dp:
        from text2human_tpu.parallel.mesh import make_mesh

        # dp must divide the batch: use the largest divisor of bs <= n devices
        dp = max(d for d in range(1, min(bs, n) + 1) if bs % d == 0)
        mesh = make_mesh({"dp": dp}, jax.devices()[:dp])
        logger.info(f"data-parallel mesh: {mesh.shape} (batch {bs})")
    loop = TrainLoop(
        opt, trainer, args.synthetic, mesh=mesh,
        token_meta=getattr(train_ds, "meta", None),
        pp_microbatches=pp_microbatches,
    )

    num_epochs = opt.get("num_epochs") or 100
    total_iters = num_epochs * max(len(loader), 1)
    msg_logger = MessageLogger(
        opt["name"],
        opt.get("print_freq") or 100,
        total_iters,
        jsonl_path=(
            osp.join(opt["path"]["log"], "metrics.jsonl") if primary else None
        ),
    )

    current_iter = 0
    best = None
    start_epoch = 0

    # initialize (and optionally resume) before the epoch loop so the restored
    # epoch drives the lr schedule and cadence
    t_init = time.time()
    first_batch = next(iter(loader), None)
    if first_batch is None:
        logger.warning("empty training dataset; nothing to do")
        return
    logger.info(
        f"first batch ready in {time.time() - t_init:.1f}s; initializing "
        "model state (first-use compile on the device backend)"
    )
    t_init = time.time()
    loop.init(first_batch)
    loop._distribute_state()
    logger.info(f"model state initialized in {time.time() - t_init:.1f}s")
    # checkpoint writes overlap training (orbax background thread); each
    # save waits for the previous one, and the loop waits before exit
    ckpt_writer = AsyncCheckpointWriter()
    PREEMPTED.clear()
    _install_sigterm_handler()
    if args.resume:
        from text2human_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

        resume_path = latest_checkpoint(opt["path"]["models"])
        if resume_path:
            restored = None
            restore_errs = []
            for target in (
                {"state": loop.state, "epoch": 0, "best": 0.0},
                # checkpoints from before the 'best' field
                {"state": loop.state, "epoch": 0},
            ):
                try:
                    restored = load_checkpoint(resume_path, target=target)
                    break
                except Exception as e:
                    restore_errs.append(e)
            if restored is None:
                # slim archive (params [+ batch_stats, step] only — e.g. a
                # reset-proof in-flight archive restored from git,
                # scripts/inflight_archive.sh): continue training with fresh
                # optimizer moments rather than losing the stage.
                raw = load_checkpoint(resume_path)
                sd = raw.get("state", raw)
                if "params" not in sd:
                    raise RuntimeError(
                        f"cannot resume from {resume_path}: neither a full "
                        "TrainState nor a slim params checkpoint"
                    )
                if "opt_state" in sd:
                    # A FULL checkpoint whose structured restore failed is a
                    # real error (config/shape drift, orbax fault) — silently
                    # "slim-resuming" it would discard the optimizer state
                    # and accept possibly mismatched params.  Only genuinely
                    # slim archives (no opt_state on disk) take this path.
                    raise RuntimeError(
                        f"full checkpoint at {resume_path} failed structured "
                        f"restore: {restore_errs[-1]!r}"
                    ) from restore_errs[-1]
                loop.state = loop.state.replace(
                    params=sd["params"],
                    batch_stats=sd.get("batch_stats") or loop.state.batch_stats,
                    step=jnp.asarray(int(np.asarray(sd.get("step", 0))), jnp.int32),
                )
                logger.warning(
                    f"resumed SLIM checkpoint {resume_path}: optimizer "
                    "moments reinitialized (params/batch_stats/step restored)"
                )
                restored = {"epoch": raw.get("epoch", 0),
                            "best": raw.get("best", float("nan"))}
            # restore the best-metric watermark so a post-resume val epoch
            # cannot overwrite models/best with a worse model (NaN = no
            # best recorded yet)
            restored_best = float(restored.get("best", float("nan")))
            best = None if np.isnan(restored_best) else restored_best
            if "state" in restored:
                loop.state = restored["state"]
            # re-place the restored tree on the mesh (pp re-shards the block
            # params; _distribute_state is idempotent)
            loop._distribute_state()
            start_epoch = int(restored["epoch"]) + 1
            current_iter = int(jax.device_get(loop.state.step))
            # cumulative schedules ('schedule'/'linear2exp') must replay the
            # skipped epochs to rebuild their lr state
            if opt.get("lr_decay") in ("schedule", "linear2exp"):
                for past in range(start_epoch):
                    loop._lr = lr_for_epoch(
                        opt, past, current_iter, prev_lr=getattr(loop, "_lr", None)
                    )
                    loop._lr_epoch = past
            logger.info(
                f"resumed from {resume_path}: epoch {start_epoch}, "
                f"step {current_iter}"
            )

    # async pipelined inner loop: batches are device_put one step ahead
    # (prefetch_to_device) so transfers ride under compute, step dispatch
    # never blocks, and the host syncs on results only at print boundaries.
    # A bounded run-ahead window keeps the dispatch queue and staged input
    # buffers from growing without limit when the host outpaces the device.
    from text2human_tpu.data.loader import prefetch_to_device

    run_ahead = 4
    inflight: deque = deque()

    def drain_one():
        # force one OLD step's logs to completion via a real host transfer
        # (block_until_ready can return early on tunneled backends); steps
        # dispatched after it keep the device busy while the host waits
        np.asarray(next(iter(inflight.popleft().values())))

    # bind epoch before the loop: if start_epoch >= num_epochs (resuming an
    # already-finished run) the body never runs, and the preemption branch
    # below must still be able to write an epoch-named checkpoint
    epoch = start_epoch
    print_freq = opt.get("print_freq") or 100
    for epoch in range(start_epoch, num_epochs):
        t_last, iters_since = time.time(), 0
        for batch in prefetch_to_device(loader, loop.place):
            lr = loop.set_lr(epoch, current_iter)
            logs = loop.step(batch)
            if current_iter == 0:
                logger.info(
                    "first train step dispatched; waiting on the device for "
                    "the iter-1 log sync (first-use compile happens here)"
                )
                # BOUNDED heartbeat over the log-silent first-compile window
                # (remote compiles can take ~10 min): two beats keep the
                # campaign stall watchdog from killing a healthy compile,
                # and because they stop, a genuinely wedged run still goes
                # silent and gets killed (docs/CAMPAIGN.md r5 incident).
                import threading as _threading

                _hb_done = _threading.Event()

                def _heartbeat():
                    for wait_s in (300, 300):
                        if _hb_done.wait(wait_s):
                            return
                        logger.info(
                            "still waiting on the first step result "
                            "(compile in progress on the device backend)"
                        )

                _threading.Thread(target=_heartbeat, daemon=True).start()
            inflight.append(logs)
            if len(inflight) > run_ahead:
                drain_one()
            current_iter += 1
            iters_since += 1
            if current_iter % print_freq == 0 or current_iter == 1:
                # sync BEFORE reading the clock: the float conversion drains
                # the in-flight queue up to this step, and that wait belongs
                # to the window being reported (otherwise 'time' would be
                # optimistic by up to run_ahead/print_freq)
                synced = {k: float(v) for k, v in logs.items()}
                if current_iter == 1:
                    _hb_done.set()  # first result arrived: stop the heartbeat
                now = time.time()
                msg_logger(
                    {
                        "epoch": epoch,
                        "iter": current_iter,
                        "lrs": [lr],
                        # pipelined wall time per iteration over the window
                        # (a single dispatch's time means nothing async)
                        "time": (now - t_last) / iters_since,
                        **synced,
                    }
                )
                t_last, iters_since = now, 0
            if args.max_iters and current_iter >= args.max_iters:
                break
            if PREEMPTED.is_set():
                break
        inflight.clear()
        if (args.max_iters and current_iter >= args.max_iters) or PREEMPTED.is_set():
            break
        if (epoch + 1) % (opt.get("val_freq") or 5) == 0:
            val = loop.validate(val_loader)
            logger.info(f"epoch {epoch} validation: {val}")
            if jax.process_count() == 1:
                try:
                    first = next(iter(val_loader))
                    loop.save_visuals(first, opt["path"]["visualization"], epoch)
                except Exception as e:  # visualization must never kill training
                    logger.warning(f"visualization failed: {e}")
            # (multi-controller: visuals are skipped — their jitted forwards
            # would be collective launches, and gating them to rank 0 alone
            # would deadlock the other ranks; QC images come from
            # single-process runs or cli/sample.py on the checkpoints)
            # update the best-metric watermark FIRST so the epoch checkpoint
            # is written once, already stamped with it (a resume from it can
            # then never regress models/best); 'best' tracks the
            # trainer-declared metric instead of a guessy fallback chain
            metric_name, metric_mode = getattr(trainer, "val_metric", ("loss", "min"))
            score = val.get(metric_name)
            better = False
            if score is None:
                logger.warning(
                    f"val metric {metric_name!r} missing from {sorted(val)}; "
                    "best-checkpoint tracking skipped this epoch"
                )
            else:
                score = float(score)
                better = best is None or (
                    score > best if metric_mode == "max" else score < best
                )
                if better:
                    best = score
            # checkpoint EVERY val epoch with the epoch in the name (reference
            # train_vqvae.py:126-128)
            ckpt_writer.save(
                osp.join(opt["path"]["models"], str(epoch)),
                {"state": loop.state, "epoch": epoch,
                 "best": float("nan") if best is None else best},
            )
            if better:
                ckpt_writer.save(
                    osp.join(opt["path"]["models"], "best"),
                    {"state": loop.state, "epoch": epoch, "best": best},
                )
                logger.info(
                    f"new best {metric_name}={score:.6g} at epoch {epoch}"
                )

    if PREEMPTED.is_set():
        # preemption checkpoint: epoch-named so latest_checkpoint/--resume
        # picks it up; stored epoch-1 so the interrupted epoch is replayed
        ckpt_writer.save(
            osp.join(opt["path"]["models"], str(epoch)),
            {"state": loop.state, "epoch": epoch - 1,
             "best": float("nan") if best is None else best},
        )
        ckpt_writer.wait()
        logger.info(
            f"SIGTERM: preemption checkpoint at epoch {epoch}, "
            f"step {current_iter}; resume with --resume"
        )
        return

    ckpt_writer.save(
        osp.join(opt["path"]["models"], "final"),
        {"state": loop.state, "epoch": num_epochs - 1,
         "best": float("nan") if best is None else best},
    )
    ckpt_writer.wait()
    logger.info("training done")


if __name__ == "__main__":
    main()
