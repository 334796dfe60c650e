"""Inference CLI: parsing-conditioned and pose-conditioned sampling.

  python -m text2human_tpu.cli.sample -opt configs/sample_from_parsing.yml
  python -m text2human_tpu.cli.sample -opt configs/sample_from_pose.yml

Replaces reference sample_from_parsing.py / sample_from_pose.py: loads the six
checkpoints (converted .pth or native orbax), iterates the test set, writes
PNG results.  ``--synthetic`` runs with random weights + synthetic data for
smoke testing.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from text2human_tpu.cli.builders import build_pipeline
from text2human_tpu.config import dict2str, parse
from text2human_tpu.data.datasets import (
    DeepFashionAttrPoseDataset,
    DeepFashionAttrSegmDataset,
    SyntheticDataset,
)
from text2human_tpu.data.loader import DataLoader
from text2human_tpu.utils.logger import get_root_logger
from text2human_tpu.utils.misc import make_exp_dirs, set_random_seed


def save_png(path: str, img01: np.ndarray):
    from PIL import Image

    arr = np.clip(img01 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _validate_pipeline_params(params, pipe, with_pose: bool, src: str):
    """Fail at LOAD time, naming the missing piece — not with a cryptic
    KeyError/flax error inside the first jitted batch."""
    need = ["hierarchy", "segm", "sampler", "index_pred"]
    if with_pose:
        need.append("parsing_gen")
    missing = [k for k in need if k not in params]
    if missing:
        hint = (
            " (pose mode needs a checkpoint imported with --parsing-gen)"
            if "parsing_gen" in missing else ""
        )
        raise ValueError(
            f"pipeline checkpoint {src} is missing {missing}{hint}"
        )
    if (
        pipe.cfgs.transformer.sampler == "autoregressive"
        and "start_tok" not in params["sampler"]
    ):
        raise ValueError(
            f"sampler: 'autoregressive' configured but {src} has no "
            "start_tok — re-import the sampler with --causal-sampler"
        )


def load_params(pipe, opt: Dict[str, Any], synthetic: bool, ckpt: str = ""):
    with_pose = opt["model_type"] == "SampleFromPoseModel"
    # a converted/native orbax pipeline checkpoint wins
    # (written by `cli/convert.py import-pipeline` or given via YAML
    # `pipeline_checkpoint`)
    ckpt = ckpt or opt.get("pipeline_checkpoint")
    if ckpt and not synthetic:
        from text2human_tpu.utils.checkpoint import load_checkpoint

        params = load_checkpoint(ckpt)
        _validate_pipeline_params(params, pipe, with_pose, ckpt)
        # one transfer for the whole tree: host-numpy params would otherwise
        # re-upload hundreds of MB on EVERY jitted call
        return jax.device_put(params, jax.devices()[0])

    paths = [
        opt.get("top_vae_path"),
        opt.get("bot_vae_path"),
        opt.get("segm_token_path"),
        opt.get("pretrained_sampler"),
        opt.get("pretrained_index_network"),
    ]
    if with_pose:
        paths.append(opt.get("pretrained_parsing_gen"))
    if not synthetic:
        missing = [p or "<unset>" for p in paths if not (p and osp.exists(p))]
        if missing:
            # never silently serve random weights (the training CLI refuses
            # random frozen tokenizers for the same reason): a typo'd path
            # would boot a healthy-looking server producing noise
            raise FileNotFoundError(
                f"checkpoint paths missing or not on disk: {missing}; "
                "fix the YAML paths (or pass --synthetic explicitly for "
                "random-weight smoke mode)"
            )
        from text2human_tpu.utils.torch_import import convert_pipeline_checkpoints

        params = convert_pipeline_checkpoints(
            opt["top_vae_path"],
            opt["bot_vae_path"],
            opt["segm_token_path"],
            opt["pretrained_sampler"],
            opt["pretrained_index_network"],
            opt.get("pretrained_parsing_gen") or "",
            # the causal trunk needs the checkpoint's start_tok parameter
            causal_sampler=pipe.cfgs.transformer.sampler == "autoregressive",
        )
        return jax.device_put(params, jax.devices()[0])

    # random-weight smoke mode (explicit --synthetic).  Shapes come from
    # jax.eval_shape (pure tracing — flax .init would EXECUTE the full-size
    # forward, ~2.5 min on one host core; this path is ~20x faster and
    # serve's warm-boot budget lives or dies on it, BENCHMARKS.md "Serving
    # cold start"), values from a numpy RNG with flax-like scales.
    cfgs = pipe.cfgs
    res = cfgs.top.resolution
    rng = np.random.default_rng(0)

    def fill(path, leaf):
        # numpy leaves on purpose: the whole tree ships in ONE device_put at
        # the end — per-leaf jnp transfers over a serving tunnel are minutes
        name = str(getattr(path[-1], "key", path[-1]))
        shape, dtype = leaf.shape, leaf.dtype
        if name in ("bias", "mean"):
            return np.zeros(shape, dtype)
        if name in ("scale", "var"):
            return np.ones(shape, dtype)
        fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else max(shape[0], 1)
        std = 1.0 / np.sqrt(max(fan_in, 1))
        return rng.normal(0.0, std, shape).astype(np.float32).astype(dtype)

    def synth(module_init, *args):
        variables = jax.eval_shape(module_init, jax.random.key(0), *args)
        return jax.tree_util.tree_map_with_path(fill, variables)

    img = jax.ShapeDtypeStruct((1, res, res // 2, 3), jnp.float32)
    mask = jax.ShapeDtypeStruct((1, res, res // 2), jnp.float32)
    tok = jax.ShapeDtypeStruct((1, cfgs.transformer.block_size), jnp.int32)
    params = {
        "hierarchy": synth(pipe.hierarchy.init, img, mask)["params"],
        "segm": synth(
            pipe.segm_vq.init,
            jax.ShapeDtypeStruct(
                (1, res, res // 2, cfgs.segm.in_channels), jnp.float32
            ),
        )["params"],
        "sampler": synth(pipe.denoiser.init, tok, tok, tok)["params"],
    }
    h, w = cfgs.transformer.latent_shape
    ip = synth(
        pipe.index_pred.init,
        jax.ShapeDtypeStruct((1, h, w, cfgs.index_unet.in_channels), jnp.float32),
    )
    params["index_pred"] = {
        "params": ip["params"],
        "batch_stats": ip.get("batch_stats", {}),
    }
    if with_pose:
        pg = synth(
            pipe.parsing_gen.init,
            jax.ShapeDtypeStruct((1, res, res // 2, 1), jnp.float32),
            jax.ShapeDtypeStruct(
                (1, len(cfgs.shape_attr.cls_num_list)), jnp.int32
            ),
        )
        params["parsing_gen"] = {
            "params": pg["params"],
            "batch_stats": pg.get("batch_stats", {}),
        }
    return jax.device_put(params, jax.devices()[0])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--max-batches", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--ckpt", default="",
                        help="orbax pipeline checkpoint (from cli/convert.py "
                             "import-pipeline); overrides the .pth paths")
    from text2human_tpu.cli.common import add_vq_impl_flag, apply_vq_impl

    add_vq_impl_flag(parser)
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    apply_vq_impl(args)

    # persistent XLA cache: warm process starts compile in seconds
    # instead of minutes (VERDICT round-1 item #9)
    from text2human_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    opt = parse(args.opt, is_train=False)
    make_exp_dirs(opt)
    save_dir = opt["path"]["visualization"]
    os.makedirs(save_dir, exist_ok=True)
    logger = get_root_logger(
        log_file=osp.join(opt["path"]["log"], f"sample_{opt['name']}.log")
    )
    logger.info(dict2str(dict(opt)))
    set_random_seed(opt.get("manual_seed") or 0)
    key = jax.random.key(opt.get("manual_seed") or 0)

    with_pose = opt["model_type"] == "SampleFromPoseModel"
    pipe = build_pipeline(opt)
    params = load_params(pipe, opt, args.synthetic, ckpt=args.ckpt)

    if args.synthetic:
        ds = SyntheticDataset(
            length=opt.get("synthetic_length") or 4,
            resolution=opt.get("synthetic_resolution")
            or opt.get("top_resolution")
            or 512,
        )
    elif with_pose:
        ds = DeepFashionAttrPoseDataset(
            opt["pose_dir"], opt["texture_ann_file"], opt["shape_ann_path"],
            opt.get("downsample_factor") or 2,
        )
    else:
        ds = DeepFashionAttrSegmDataset(
            opt["test_img_dir"], opt["segm_dir"], opt["pose_dir"],
            opt["test_ann_file"], opt.get("downsample_factor") or 2,
        )
    loader = DataLoader(
        ds, batch_size=opt.get("batch_size") or 4,
        num_workers=opt.get("num_workers") or 4, drop_last=False,
    )

    batch_size = opt.get("batch_size") or 4

    def pad_tail(arr):
        """Pad a ragged final batch to the compiled batch shape: a new
        leading dim would recompile the whole pipeline (incl. the 256-step
        sampler scan — minutes) just to finish a handful of images."""
        arr = np.asarray(arr)
        if arr.shape[0] == batch_size:
            return jnp.asarray(arr)
        reps = np.repeat(arr[-1:], batch_size - arr.shape[0], axis=0)
        return jnp.asarray(np.concatenate([arr, reps], axis=0))

    for i, batch in enumerate(loader):
        if args.max_batches and i >= args.max_batches:
            break
        n = len(batch["img_name"])
        key, sub = jax.random.split(key)
        if with_pose:
            if args.synthetic:
                upper = lower = outer = jnp.zeros((batch_size,), jnp.int32)
                shape_attr = pad_tail(batch["shape_attr"])
            else:
                upper = pad_tail(batch["upper_fused_attr"])
                lower = pad_tail(batch["lower_fused_attr"])
                outer = pad_tail(batch["outer_fused_attr"])
                shape_attr = pad_tail(batch["shape_attr"])
            images, segm = pipe.sample_from_pose(
                params, sub, pad_tail(batch["densepose"]), shape_attr,
                upper, lower, outer,
            )
        else:
            images = pipe.sample_from_parsing(
                params, sub, pad_tail(batch["segm"]),
                pad_tail(batch["texture_mask"]),
            )
        images = np.asarray(images[:n])
        for j, name in enumerate(batch["img_name"]):
            save_png(osp.join(save_dir, name), images[j])
        logger.info(f"batch {i}: wrote {images.shape[0]} images")

    logger.info(f"done -> {save_dir}")


if __name__ == "__main__":
    main()
