"""Checkpoint conversion CLI: reference .pth zoo <-> native orbax pytrees.

  # import the six reference checkpoints into one pipeline checkpoint
  python -m text2human_tpu.cli.convert import-pipeline \
      --top vqvae_top.pth --bottom vqvae_bottom.pth --segm parsing_token.pth \
      --sampler sampler.pth --index-pred index_pred_net.pth \
      --parsing-gen parsing_gen.pth --out checkpoints/pipeline

  # assemble six NATIVELY trained (cli/train.py) checkpoints the same way
  python -m text2human_tpu.cli.convert assemble-pipeline \
      --top experiments/vqvae_top/models/99 \
      --bottom experiments/vqvae_bottom/models/99 \
      --segm experiments/parsing_token/models/99 \
      --sampler experiments/sampler/models/99 \
      --index-pred experiments/index_pred/models/99 \
      --parsing-gen experiments/parsing_gen/models/99 --out checkpoints/pipeline

  # export our trained top VQGAN back to the reference layout
  python -m text2human_tpu.cli.convert export-top \
      --ckpt experiments/vqvae_top/models/final --out vqvae_top_exported.pth
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    imp = sub.add_parser("import-pipeline",
                         help="six reference .pth files -> one orbax pipeline checkpoint")
    imp.add_argument("--top", required=True)
    imp.add_argument("--bottom", required=True)
    imp.add_argument("--segm", required=True)
    imp.add_argument("--sampler", required=True)
    imp.add_argument("--index-pred", required=True)
    imp.add_argument("--parsing-gen", default="")
    imp.add_argument(
        "--causal-sampler",
        action="store_true",
        help="build the checkpoint for autoregressive serving (sampler: "
        "'autoregressive'): imports the transformer's start_tok parameter",
    )
    imp.add_argument("--out", required=True)

    asm = sub.add_parser(
        "assemble-pipeline",
        help="six NATIVE train-CLI orbax checkpoints -> one pipeline checkpoint",
    )
    asm.add_argument("--top", required=True, help="top VQGAN checkpoint dir")
    asm.add_argument("--bottom", required=True, help="hierarchy checkpoint dir")
    asm.add_argument("--segm", required=True, help="parsing tokenizer checkpoint dir")
    asm.add_argument("--sampler", required=True, help="sampler checkpoint dir")
    asm.add_argument("--index-pred", required=True)
    asm.add_argument("--parsing-gen", default="")
    asm.add_argument("--out", required=True)

    exp = sub.add_parser("export-top",
                         help="our TextureVQGAN params -> reference vqvae_top.pth layout")
    exp.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    exp.add_argument("--out", required=True)

    lp = sub.add_parser("import-lpips",
                        help="torchvision/lpips .pth -> .npz for lpips_path")
    lp.add_argument("--weights", required=True,
                    help=".pth with VGG16 'features.*' (or lpips 'net.slice*') "
                         "keys + 'lin*.model.1.weight' heads")
    lp.add_argument("--out", required=True, help="output .npz path")

    from text2human_tpu.cli.common import add_vq_impl_flag, apply_vq_impl

    # conversion itself is pure weight re-layout (no codebook search runs),
    # but downstream golden validation of an imported checkpoint is parity-
    # sensitive — default the whole import workflow to the exact search
    for p in (imp, asm, exp, lp):
        add_vq_impl_flag(p, default="xla")

    args = parser.parse_args(argv)
    apply_vq_impl(args)

    if args.cmd == "import-pipeline":
        from text2human_tpu.utils.checkpoint import save_checkpoint
        from text2human_tpu.utils.torch_import import convert_pipeline_checkpoints

        params = convert_pipeline_checkpoints(
            args.top, args.bottom, args.segm, args.sampler,
            args.index_pred, args.parsing_gen,
            causal_sampler=args.causal_sampler,
        )
        save_checkpoint(args.out, params)
        print(f"wrote pipeline checkpoint -> {args.out}")

    elif args.cmd == "assemble-pipeline":
        from text2human_tpu.pipelines.assemble import (
            assemble_pipeline_from_checkpoints,
        )
        from text2human_tpu.utils.checkpoint import save_checkpoint

        params = assemble_pipeline_from_checkpoints(
            args.top, args.bottom, args.segm, args.sampler,
            args.index_pred, args.parsing_gen,
        )
        save_checkpoint(args.out, params)
        print(f"wrote pipeline checkpoint -> {args.out}")

    elif args.cmd == "export-top":
        import torch

        from text2human_tpu.utils.checkpoint import load_checkpoint
        from text2human_tpu.utils.torch_export import top_vqgan_export

        tree = load_checkpoint(args.ckpt)
        # one unwrap definition for trainer checkpoints (assemble.py) — and
        # its curated error when the checkpoint has no gen subtree, instead
        # of a bare KeyError deep inside top_vqgan_export
        from text2human_tpu.pipelines.assemble import _gen

        exported = top_vqgan_export(_gen(tree, "export-top"))
        torch_ckpt = {
            comp: {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
            for comp, sd in exported.items()
        }
        torch.save(torch_ckpt, args.out)
        print(f"wrote reference-layout checkpoint -> {args.out}")

    elif args.cmd == "import-lpips":
        from text2human_tpu.losses.perceptual import load_lpips_vars, save_lpips_npz

        save_lpips_npz(load_lpips_vars(args.weights), args.out)
        print(f"wrote LPIPS weights -> {args.out} (use as lpips_path)")


if __name__ == "__main__":
    main()
