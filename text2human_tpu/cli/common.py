"""Shared CLI flags.

``--vq-impl`` selects the codebook-search implementation
(``ops/quantize.py:set_vq_impl``).  The fused Pallas kernel ('pallas', the
TPU 'auto' pick) streams the codebook through VMEM and is the fast path for
training/serving, but on real TPU hardware its bf16 distance accumulation
flips ~0.1% of nearest-codebook indices vs the exact XLA search
(BENCHMARKS.md "99.85% agreement").  Parity-sensitive workflows — importing
the reference .pth zoo, golden validation against reference outputs, parity
reports — must run with 'xla' so sampled indices are bit-comparable; those
CLIs default to 'xla' here and say so in --help.
"""

from __future__ import annotations

import argparse


def add_vq_impl_flag(parser: argparse.ArgumentParser, default: str = "auto"):
    parser.add_argument(
        "--vq-impl",
        choices=("auto", "xla", "pallas"),
        default=default,
        help="codebook-search implementation: 'xla' is exact (use for "
        "parity/golden checks against reference checkpoints); 'pallas' is "
        "the fused TPU kernel (~0.1%% index flips vs xla on hardware); "
        f"'auto' picks pallas on TPU. Default: {default}.",
    )


def apply_vq_impl(args: argparse.Namespace):
    from text2human_tpu.ops.quantize import set_vq_impl

    set_vq_impl(args.vq_impl)
