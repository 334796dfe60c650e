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
    from text2human_tpu.cli.common import add_vq_impl_flag, apply_vq_impl

    add_vq_impl_flag(fid, default="xla")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    apply_vq_impl(args)
    from text2human_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

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
