"""Build a pre-tokenized training cache for the frozen-tokenizer jobs.

  python -m text2human_tpu.cli.tokenize -opt configs/sampler.yml --out token_cache/
  python -m text2human_tpu.cli.tokenize -opt configs/index_pred_net.yml --out token_cache_ip/
  python -m text2human_tpu.cli.tokenize -opt configs/vqvae_bottom.yml --out token_cache_bot/

Runs the job's frozen tokenizers ONCE over the dataset (both horizontal-flip
variants for the train split) and writes integer-index memmaps that
``cli/train.py`` consumes via ``token_cache: <dir>`` in the YAML — removing
the per-step frozen VQGAN forwards the reference pays on every iteration
(transformer_model.py:153-170, hierarchy_inference_model.py:178-197).

For the sampler/index-pred jobs the cache stores ~2 KB/sample of indices
instead of ~1.2 MB of decoded pixels, so cached training also skips the
whole image-decode pipeline.  The bottom-hierarchy GAN job still trains on
pixels (reference hierarchy_vqgan_model.py:196-291 needs them for the recon
loss and the disc) but its frozen TOP encoder is a pure function of the
sample: its cache holds the top indices and training pairs them with the
pixel dataset (data/token_cache.py:HybridTokenDataset).
"""

from __future__ import annotations

import argparse
import os.path as osp
import time

import jax
import numpy as np


def _hierarchy_top_params(opt, trainer, ds, synthetic):
    """Frozen top-path params for a hierarchy hybrid cache build.

    ``HierarchyVQ.top_indices`` touches only the top_encoder /
    top_quant_conv / top_quantize submodules, so a real build maps just
    those from the top checkpoint; synthetic smoke builds jit-init the full
    model (executing it eagerly on the host would crawl at full dims)."""
    import jax.numpy as jnp

    path = opt.get("top_vae_path")
    if path and osp.isdir(path):
        from text2human_tpu.utils.native_frozen import native_top_params

        top = native_top_params(path)
        return {
            "top_encoder": top["encoder"],
            "top_quant_conv": top["quant_conv"],
            "top_quantize": top["quantize"],
        }
    if path and osp.exists(path) and not synthetic:
        from text2human_tpu.utils import torch_import as ti

        top = ti.convert_top_vqgan(ti.load_pth(path))["params"]
        return {
            "top_encoder": top["encoder"],
            "top_quant_conv": top["quant_conv"],
            "top_quantize": top["quantize"],
        }
    sample = ds[0]
    img = jnp.asarray(np.asarray(sample["image"])[None])
    mask = jnp.asarray(np.asarray(sample["texture_mask"])[None])
    return jax.jit(trainer.model.init)(jax.random.key(0), img, mask)["params"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--out", required=True, help="cache root directory; "
                        "one subdirectory per split is created")
    parser.add_argument("--splits", default="train,val",
                        help="comma-separated dataset splits to tokenize")
    # inference-only frozen forwards: a large batch amortizes the per-call
    # dispatch latency (on the tunneled chip b=8 measured roundtrip-bound at
    # ~1.8 samples/s; the forward itself is ~100 ms)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--workers", type=int, default=6,
                        help="host threads materializing batches ahead of "
                             "the device (the build is host-bound otherwise)")
    parser.add_argument("--variants", type=int, default=0, choices=(0, 1, 2),
                        help="flip variants (default: 2 for train, 1 otherwise)")
    parser.add_argument("--synthetic", action="store_true",
                        help="tokenize the synthetic dataset (smoke/debug)")
    parser.add_argument("--fixture", action="store_true",
                        help="tokenize the structured fixture dataset with "
                             "REAL frozen checkpoints (native campaign runs "
                             "without DeepFashion files); the cache carries "
                             "real-cache semantics incl. checkpoint "
                             "fingerprints")
    parser.add_argument("--cpu", action="store_true")
    from text2human_tpu.cli.common import add_vq_impl_flag, apply_vq_impl

    add_vq_impl_flag(parser)
    args = parser.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    apply_vq_impl(args)

    from text2human_tpu.cli.builders import build_trainer
    from text2human_tpu.cli.train import TrainLoop, make_dataset, to_device_batch
    from text2human_tpu.config import parse
    from text2human_tpu.data.token_cache import build_token_cache
    from text2human_tpu.utils.logger import get_root_logger
    from text2human_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    logger = get_root_logger()
    opt = parse(args.opt, is_train=True)
    if args.fixture:
        opt["fixture"] = True
    mt = opt["model_type"]
    # keys: jobs with frozen tokenizers; values: the checkpoints a REAL
    # cache build requires (the hierarchy GAN job freezes only its top path
    # — the bottom stack is what it trains)
    needed_ckpts = {
        "TransformerTextureAwareModel": ("img_ae_path", "segm_ae_path"),
        "VQGANTextureAwareSpatialHierarchyInferenceModel":
            ("top_vae_path", "bot_vae_path"),
        "HierarchyVQSpatialTextureAwareModel": ("top_vae_path",),
    }
    if mt not in needed_ckpts:
        raise SystemExit(
            f"model_type {mt!r} has no frozen tokenizers to cache; "
            "token caches apply to the sampler, index-prediction and "
            "bottom-hierarchy jobs"
        )
    # a cache built from random-init frozen tokenizers is silent garbage —
    # refuse real builds without the upstream checkpoints (the train loop's
    # random-init fallback is a smoke-mode convenience, not a cache source)
    if not args.synthetic:
        need = needed_ckpts[mt]
        missing = [k for k in need if not (opt.get(k) and osp.exists(opt[k]))]
        if missing:
            raise SystemExit(
                "tokenizing a real dataset needs the frozen-tokenizer "
                f"checkpoints; missing or nonexistent: {missing} "
                "(use --synthetic for smoke builds)"
            )
    # the cache must hold UNFLIPPED tokens in variant 0 — flips are applied
    # deterministically by the builder, never by the source dataset
    # (mutated in place to keep the NoneDict missing-key semantics)
    opt["token_cache"] = None
    opt["xflip"] = False

    trainer = build_trainer(opt)
    loop = TrainLoop(opt, trainer, args.synthetic)
    top_params = None  # hierarchy job: frozen top-path subtree only

    for split in [s for s in args.splits.split(",") if s]:
        ds = make_dataset(opt, split, args.synthetic)
        if mt == "HierarchyVQSpatialTextureAwareModel":
            if top_params is None:
                top_params = _hierarchy_top_params(
                    opt, trainer, ds, args.synthetic
                )

            def tokenize(batch):
                # ship only what top_indices reads (densepose/segm/attr are
                # comparable in size to the image — dead transfer weight)
                used = {k: batch[k] for k in ("image", "texture_mask")}
                out = trainer.tokenize(top_params, to_device_batch(used))
                return {k: np.asarray(v) for k, v in out.items()}
        elif not loop.frozen:  # frozen params load once, from the first
            # split; the build never touches trainable state, so skip
            # init()'s transformer/UNet + optimizer allocation entirely
            sample = ds[0]
            loop.load_frozen({
                k: ([v] if isinstance(v, str) else np.asarray(v)[None])
                for k, v in sample.items()
            })

        # ship ONLY the fields each job's tokenize reads: the rich fixture /
        # DeepFashion sample also carries densepose (+attr, +segm for the
        # index-pred job) — ~50% of the batch bytes as dead transfer weight
        # over the tunneled chip (the r5 ip build measured 1.3 samples/s
        # before this trim)
        if mt == "TransformerTextureAwareModel":
            def tokenize(batch):
                used = {k: batch[k] for k in ("image", "texture_mask", "segm")}
                out = trainer.tokenize(
                    loop.frozen["img"], loop.frozen["segm"], to_device_batch(used)
                )
                return {k: np.asarray(v) for k, v in out.items()}
        elif mt == "VQGANTextureAwareSpatialHierarchyInferenceModel":
            def tokenize(batch):
                used = {k: batch[k] for k in ("image", "texture_mask")}
                out = trainer.tokenize(loop.frozen["vq"], to_device_batch(used))
                return {k: np.asarray(v) for k, v in out.items()}

        variants = args.variants or (2 if split == "train" else 1)
        out_dir = osp.join(args.out, split)
        t0 = time.time()
        last = [0.0]

        def progress(done, total):
            if time.time() - last[0] > 10:
                last[0] = time.time()
                rate = done / max(time.time() - t0, 1e-9)
                logger.info(
                    f"[{split}] {done}/{total} tokenized "
                    f"({rate:.1f}/s, eta {(total - done) / max(rate, 1e-9):.0f}s)"
                )

        from text2human_tpu.data.token_cache import checkpoint_fingerprint

        meta = build_token_cache(
            out_dir,
            ds,
            tokenize,
            batch_size=args.batch_size,
            variants=variants,
            workers=args.workers,
            prefetch=max(2, args.workers),
            extra_meta={
                "job": mt,
                "opt_name": opt.get("name"),
                "source_config": osp.abspath(args.opt),
                # consumers gate their frozen-checkpoint requirements on this:
                # a real-checkpoint cache must never be trained against
                # random-init codebooks (cli/train.py:_consuming_real_cache)
                "synthetic": bool(args.synthetic),
                # ...nor against a DIFFERENT checkpoint than the cache was
                # built from (cli/train.py:_check_cache_checkpoints)
                "checkpoints": {} if args.synthetic else {
                    k: {"path": osp.abspath(opt[k]),
                        **checkpoint_fingerprint(opt[k])}
                    for k in needed_ckpts[mt]
                },
            },
            progress=progress,
        )
        logger.info(
            f"[{split}] cache written to {out_dir}: "
            f"{meta['num_samples']} samples x {variants} variant(s), "
            f"fields {sorted(meta['fields'])} in {time.time() - t0:.1f}s"
        )


if __name__ == "__main__":
    main()
