"""FID evaluation CLI: generated-image directory vs a real-image directory.

  python -m text2human_tpu.cli.evaluate fid \
      --real datasets/test_images --fake results/sample_from_pose/visualization \
      [--inception-weights inception_v3.pth] [--batch 16] [--size 512 256]

With ``--inception-weights`` (a torchvision/pt_inception checkpoint) this is
standard FID; without, the LPIPS VGG16 tower's deepest features are used —
a consistent RELATIVE metric whose absolute values are not comparable to
published FID (pass ``--lpips-weights`` for a pretrained tower, otherwise the
random-init fallback still ranks checkpoints consistently within a run).

The reference repo has no evaluator at all (SURVEY.md §6 — FID only in the
paper); this closes the BASELINE.md "FID parity" tooling gap.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp


def _image_batches(directory: str, size, batch: int):
    import numpy as np
    from PIL import Image

    exts = (".png", ".jpg", ".jpeg")
    files = sorted(
        osp.join(directory, f)
        for f in os.listdir(directory)
        if f.lower().endswith(exts)
    )
    if not files:
        raise FileNotFoundError(f"no images in {directory}")
    h, w = size
    buf = []
    for path in files:
        img = Image.open(path).convert("RGB").resize((w, h), Image.BILINEAR)
        buf.append(np.asarray(img, np.float32) / 255.0)
        if len(buf) == batch:
            yield np.stack(buf)
            buf = []
    if buf:
        yield np.stack(buf)


def _sweep_steps(args):
    """Quality-vs-steps on a TRAINED pipeline checkpoint (VERDICT r3 task 3).

    Generates images from held-out fixture parsings through each decode
    schedule (absorbing:256, maskgit:64/32/16, ...) and reports, per
    schedule: paired L1/PSNR against the fixture's deterministic
    ground-truth image (the fixture image is a function of the parsing, so
    this is a direct reconstruction-quality proxy on a model trained on
    that distribution), the VGG-feature Frechet distance against the GT
    set, and sample-stage throughput.  Justifies (or revises) the fast
    maskgit preset's step count with measured quality, not vibes."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from text2human_tpu.cli.builders import build_pipeline
    from text2human_tpu.cli.sample import load_params
    from text2human_tpu.config import parse
    from text2human_tpu.data.datasets import OverfitFixtureDataset
    from text2human_tpu.losses.perceptual import LPIPS, load_lpips_vars
    from text2human_tpu.utils.fid import compute_fid, vgg_feature_extractor

    opt = parse(args.opt, is_train=False)
    opt["model_type"] = "SampleFromParsingModel"
    pipe = build_pipeline(opt)
    params = load_params(pipe, opt, synthetic=False, ckpt=args.ckpt)

    res = int(opt.get("top_resolution") or opt.get("img_resolution") or 512)
    n = args.batch * args.num_batches
    # held-out fixture range: offset past the campaign's train split
    ds = OverfitFixtureDataset(
        length=n, resolution=res,
        bands=int(opt.get("fixture_bands") or 6),
        rich=bool(opt.get("fixture_rich", True)),
        offset=int(args.fixture_offset),
    )
    batches = []
    for b in range(args.num_batches):
        items = [ds[b * args.batch + i] for i in range(args.batch)]
        batches.append({
            "segm": jnp.asarray(
                np.stack([it["segm"] for it in items]), jnp.int32),
            "texture_mask": jnp.asarray(
                np.stack([it["texture_mask"] for it in items]), jnp.float32),
            "gt": np.stack(
                [np.asarray(it["image"], np.float32) for it in items]),
        })
    gt01 = np.concatenate([(b["gt"] + 1.0) / 2.0 for b in batches])

    lpips = LPIPS()
    if args.lpips_weights:
        lpips_vars = load_lpips_vars(args.lpips_weights)
    else:
        lpips_vars = lpips.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
            jnp.zeros((1, 32, 32, 3)),
        )
        print("WARNING: random-init VGG features — Frechet numbers are a "
              "consistent relative metric, NOT standard FID")
    extract = vgg_feature_extractor(lpips, lpips_vars)

    results = []
    grid_rows = [gt01[: args.batch]] if args.save_grid else None
    for spec in args.decodes:
        mode, steps = spec.split(":")
        steps = int(steps)
        key = jax.random.key(args.seed)
        outs, stage_s = [], 0.0
        for b in batches:
            key, sub = jax.random.split(key)
            # warm + timed call (the first call per schedule compiles)
            imgs = pipe.sample_from_parsing(
                params, sub, b["segm"], b["texture_mask"], steps, mode
            )
            np.asarray(imgs)  # force through the tunnel before timing
            t0 = time.time()
            imgs = pipe.sample_from_parsing(
                params, sub, b["segm"], b["texture_mask"], steps, mode
            )
            imgs = np.asarray(imgs)
            stage_s += time.time() - t0
            outs.append(imgs)
        fake01 = np.concatenate(outs)
        l1 = float(np.mean(np.abs(fake01 - gt01)))
        mse = float(np.mean((fake01 - gt01) ** 2))
        psnr = float(10.0 * np.log10(1.0 / max(mse, 1e-12)))
        fd = compute_fid(
            iter([gt01[i:i + args.batch] for i in range(0, n, args.batch)]),
            iter([fake01[i:i + args.batch] for i in range(0, n, args.batch)]),
            extract,
        )
        row = {
            "decode": spec, "paired_l1": round(l1, 5),
            "paired_psnr_db": round(psnr, 3),
            "vgg_frechet": round(float(fd), 4),
            "imgs_per_s": round(n / stage_s, 2),
        }
        results.append(row)
        print(row)
        if grid_rows is not None:
            grid_rows.append(fake01[: args.batch])
    if grid_rows is not None:
        from PIL import Image

        # one row per source (GT first, then each decode schedule), the
        # first `batch` held-out fixtures as columns
        rows = [np.concatenate(list(r), axis=1) for r in grid_rows]
        grid = np.clip(np.concatenate(rows, axis=0), 0.0, 1.0)
        Image.fromarray((grid * 255.0 + 0.5).astype(np.uint8)).save(
            args.save_grid)
        print(f"wrote {args.save_grid} (rows: GT, "
              f"{', '.join(args.decodes)})")
    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump({"n": n, "resolution": res, "results": results}, f,
                      indent=1)
        print(f"wrote {args.out}")
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    fid = sub.add_parser("fid", help="Frechet distance between two image dirs")
    fid.add_argument("--real", required=True)
    fid.add_argument("--fake", required=True)
    fid.add_argument("--batch", type=int, default=16)
    fid.add_argument("--size", type=int, nargs=2, default=(512, 256),
                     metavar=("H", "W"))
    fid.add_argument("--inception-weights", default="",
                     help="torchvision/pt_inception .pth -> standard FID")
    fid.add_argument("--lpips-weights", default="",
                     help="converted VGG16 weights for the fallback extractor")
    fid.add_argument("--cpu", action="store_true")

    sweep = sub.add_parser(
        "sweep-steps",
        help="quality-vs-steps table for a trained pipeline checkpoint: "
             "paired L1/PSNR + VGG Frechet + imgs/s per decode schedule",
    )
    sweep.add_argument("-opt", required=True,
                       help="sample config matching the checkpoint's dims")
    sweep.add_argument("--ckpt", required=True,
                       help="pipeline checkpoint (convert/assemble-pipeline)")
    sweep.add_argument("--decodes", nargs="+",
                       default=["absorbing:256", "maskgit:64", "maskgit:32",
                                "maskgit:16"],
                       metavar="MODE:STEPS")
    sweep.add_argument("--batch", type=int, default=8)
    sweep.add_argument("--num-batches", type=int, default=2)
    sweep.add_argument("--fixture-offset", type=int, default=2048,
                       help="fixture index offset (past the train split)")
    sweep.add_argument("--seed", type=int, default=2021)
    sweep.add_argument("--lpips-weights", default="")
    sweep.add_argument("--out", default="")
    sweep.add_argument("--save-grid", default="", help="write a qualitative "
                       "PNG grid: GT row + one row per decode schedule")
    sweep.add_argument("--cpu", action="store_true")

    from text2human_tpu.cli.common import add_vq_impl_flag, apply_vq_impl

    add_vq_impl_flag(fid, default="xla")
    add_vq_impl_flag(sweep, default="auto")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    apply_vq_impl(args)
    from text2human_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    if args.cmd == "sweep-steps":
        return _sweep_steps(args)

    from text2human_tpu.utils.fid import compute_fid

    if args.inception_weights:
        from text2human_tpu.utils.fid import inception_extractor_from_torch

        extract = inception_extractor_from_torch(args.inception_weights)
        metric = "FID (InceptionV3 pool3)"
    else:
        import jax.numpy as jnp

        from text2human_tpu.losses.perceptual import LPIPS, load_lpips_vars
        from text2human_tpu.utils.fid import vgg_feature_extractor

        lpips = LPIPS()
        if args.lpips_weights:
            lpips_vars = load_lpips_vars(args.lpips_weights)
        else:
            print(
                "WARNING: no weights given — random-init VGG features; the "
                "number is a consistent relative metric, NOT standard FID"
            )
            lpips_vars = lpips.init(
                jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
            )
        extract = vgg_feature_extractor(lpips, lpips_vars)
        metric = "Frechet distance (VGG16 features)"

    value = compute_fid(
        _image_batches(args.real, args.size, args.batch),
        _image_batches(args.fake, args.size, args.batch),
        extract,
    )
    print(f"{metric}: {value:.4f}")
    return value


if __name__ == "__main__":
    main()
