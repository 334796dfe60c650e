"""Terminal interactive demo — the headless counterpart of the reference's
PyQt5 app (ui_demo.py): load a densepose map, describe the outfit in text,
optionally edit the parsing, generate.

  python -m text2human_tpu.cli.demo -opt configs/sample_from_pose.yml \
      --pose path/to/xxx_densepose.png
  # smoke mode (random weights, random pose):
  python -m text2human_tpu.cli.demo -opt configs/debug/sample_from_pose_debug.yml \
      --synthetic --cpu \
      --shape-text "a woman, short-sleeve T-shirt, long pants" \
      --texture-text "pure color, denim" --out /tmp/demo.png
"""

from __future__ import annotations

import argparse
import os.path as osp

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--pose", default="", help="densepose png (IUV)")
    parser.add_argument("--shape-text", default="")
    parser.add_argument("--texture-text", default="")
    parser.add_argument("--out", default="demo_result.png")
    parser.add_argument("--parsing-out", default="", help="optionally save the parsing palette")
    parser.add_argument("--sample-steps", type=int, default=0)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from text2human_tpu.cli.builders import build_pipeline
    from text2human_tpu.cli.sample import load_params, save_png
    # shared serving geometry + synthetic-pose definitions: the demo must
    # hit exactly the program --warmup/serving compiles
    from text2human_tpu.cli.serve import model_pose_hw, synthetic_pose
    from text2human_tpu.config import parse
    from text2human_tpu.ui.session import InteractiveSession, segm_to_palette
    from text2human_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()  # warm demo runs skip the cold XLA compile
    opt = parse(args.opt, is_train=False)
    opt["model_type"] = "SampleFromPoseModel"
    pipe = build_pipeline(opt)
    params = load_params(pipe, opt, args.synthetic)
    sess = InteractiveSession(pipe, params, seed=opt.get("manual_seed") or 0)

    if args.pose:
        from text2human_tpu.ui.session import pose_i_from_iuv

        # reference demo semantics: LANCZOS-resize the IUV to the model
        # resolution, then keep the I channel (ui_demo.py:90-95)
        pose_i = pose_i_from_iuv(
            np.array(Image.open(args.pose)), model_pose_hw(opt)
        )
    else:
        pose_i = synthetic_pose(opt)
        print("no --pose given: using a random synthetic pose")
    sess.feed_pose(pose_i)

    shape_text = args.shape_text or input("describe the person+outfit shape: ")
    parsing_rgb = sess.generate_parsing(shape_text)
    if args.parsing_out:
        Image.fromarray(parsing_rgb).save(args.parsing_out)
        print(f"parsing palette -> {args.parsing_out}")

    texture_text = args.texture_text or input("describe the textures: ")
    img = sess.generate_human(texture_text, sample_steps=args.sample_steps)
    save_png(args.out, img)
    print(f"generated image -> {args.out}")


if __name__ == "__main__":
    main()
