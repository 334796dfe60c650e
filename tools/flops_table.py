"""Per-stage FLOP accounting for the sample_from_pose pipeline.

Lowers each jitted stage of ``SamplePipeline`` on abstract shapes and reads
XLA's HLO cost analysis — no device needed, so the table is exact and
reproducible on any host.  The sample stage is a ``lax.scan`` whose body XLA's
cost analysis counts ONCE (known trip-count limitation), so the trunk pass is
analyzed separately and scaled by the step count in Python.

Feeds the MFU table in BENCHMARKS.md ("Per-stage FLOPs and MFU"); the round-3
"~69 TFLOP/batch = 75% MFU" claim failed this arithmetic (VERDICT.md round 3,
weak #1) and is superseded by this tool's output.

Usage:  python tools/flops_table.py [--batch 16] [--json out.json]
"""

import argparse
import json

import numpy as np


def stage_flops(fn, *args):
    """FLOPs of one jitted call from XLA's unoptimized-HLO cost analysis."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def stage_bytes(fn, *args):
    """Bytes accessed of one jitted call, from the OPTIMIZED (post-fusion)
    cost analysis — requires compiling for the host backend, so it is an
    estimate of TPU HBM traffic (CPU and TPU fusion decisions differ, but
    the elementwise/conv fusion structure is close).  Used for the roofline
    column on the conv stages; the scan-rolled trunk is excluded (its body
    bytes are counted once, and its MFU story is compute-side anyway)."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("bytes accessed", float("nan")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--bytes", action="store_true",
        help="also compile each one-shot stage on the host backend and "
        "report post-fusion bytes accessed (HBM-traffic estimate for the "
        "roofline column; adds minutes of CPU compile time)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from text2human_tpu import config as C
    from text2human_tpu.pipelines.sample import PipelineConfigs, SamplePipeline

    b = args.batch
    h, w = 512, 256

    cfgs = PipelineConfigs(
        top=C.TOP_VQGAN, top_quant=C.TOP_QUANTIZER,
        bot=C.BOT_VQGAN, bot_quant=C.BOT_QUANTIZER,
        segm=C.SEGM_VQGAN, segm_quant=C.SEGM_QUANTIZER,
        transformer=C.SAMPLER_TRANSFORMER,
        index_unet=C.INDEX_PRED_UNET, index_fcn=C.INDEX_PRED_FCN,
        shape_attr=C.PARSING_GEN_ATTR,
        parsing_unet=C.PARSING_GEN_UNET, parsing_fcn=C.PARSING_GEN_FCN,
        sample_steps=256,
    )
    # bf16 sampler — the dtype the headline numbers run at
    pipe = SamplePipeline(cfgs, dtype=jnp.bfloat16, fused_attn=False)

    # random full-size params (numpy fills — lowering only reads shapes)
    from text2human_tpu.cli.sample import load_params

    params = load_params(
        pipe, {"model_type": "SampleFromPoseModel"}, synthetic=True
    )

    T = cfgs.transformer.block_size
    lat_h, lat_w = cfgs.transformer.latent_shape

    sd = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    pose = sd((b, h, w, 1), jnp.float32)
    shape_attr = sd((b, len(C.PARSING_GEN_ATTR.cls_num_list)), jnp.int32)
    segm = sd((b, h, w), jnp.int32)  # class map from generate_parsing's argmax
    tokens = sd((b, T), jnp.int32)
    texture_mask = sd((b, h, w), jnp.float32)

    rows = {}
    rows["parsing_gen"] = stage_flops(pipe._parsing_impl, params, pose, shape_attr)
    rows["tokenize_segm"] = stage_flops(pipe._tokenize_segm_impl, params, segm)
    rows["decode"] = stage_flops(pipe._decode_impl, params, tokens, texture_mask)

    byte_rows = {}
    if args.bytes:
        byte_rows["parsing_gen"] = stage_bytes(
            pipe._parsing_impl, params, pose, shape_attr
        )
        byte_rows["tokenize_segm"] = stage_bytes(pipe._tokenize_segm_impl, params, segm)
        byte_rows["decode"] = stage_bytes(
            pipe._decode_impl, params, tokens, texture_mask
        )

    # One denoiser trunk pass — two cost-analysis artifacts to correct:
    #  1. the 24 blocks are rolled with nn.scan, whose body the analysis
    #     counts ONCE -> add (n_layers-1) extra block bodies;
    #  2. the ragged_dot head stage is counted as all-18-groups dense
    #     (2*M*K*N*G) in unoptimized HLO, 18x its true grouped cost, so the
    #     trunk is analyzed through the ragged_heads=False fori_loop path
    #     whose once-counted body (one head einsum, 2*B*T*d*head_class) IS
    #     exactly the grouped GEMM's true executed FLOPs.
    # Both artifacts are demonstrated by construction: a standalone Block
    # lowers to 60.6 GFLOP at b=16 (textbook 12*T*d^2 + 4*T^2*d per seq) and a
    # standalone ragged_dot to 2*M*K*N.
    from text2human_tpu.models.transformer import Block

    blk = Block(n_head=cfgs.transformer.n_head, dtype=jnp.bfloat16)
    xb = sd((b, T, cfgs.transformer.n_emb), jnp.bfloat16)
    bp = jax.eval_shape(blk.init, jax.random.key(0), xb)
    block = stage_flops(lambda p, x: blk.apply(p, x)[0], bp, xb)

    def trunk_fori(p, x_t, st, tt):
        return pipe.denoiser.apply(
            {"params": p}, x_t, st, tt,
            select_heads=True, flash=False, ragged_heads=False,
        )

    masked = sd((b, T), jnp.int32)
    trunk_counted = stage_flops(trunk_fori, params["sampler"], masked, tokens, tokens)
    trunk = trunk_counted + (cfgs.transformer.n_layers - 1) * block
    rows["trunk_block"] = block
    rows["trunk_pass"] = trunk
    for steps in (256, 32, 16):
        rows[f"sample_{steps}"] = trunk * steps

    total_default = (
        rows["parsing_gen"] + rows["tokenize_segm"] + rows["sample_256"]
        + rows["decode"]
    )
    total_fast = (
        rows["parsing_gen"] + rows["tokenize_segm"] + rows["sample_32"]
        + rows["decode"]
    )
    rows["end_to_end_absorbing256"] = total_default
    rows["end_to_end_maskgit32"] = total_fast

    print(f"# batch={b}, 512x256, bf16 sampler — FLOPs from XLA cost analysis")
    print(f"{'stage':<28}{'GFLOP':>12}{'GB':>10}{'FLOP/B':>10}")
    for k, v in rows.items():
        gb = byte_rows.get(k)
        gb_s = f"{gb / 1e9:>10.2f}" if gb else f"{'':>10}"
        ai_s = f"{v / gb:>10.1f}" if gb else f"{'':>10}"
        print(f"{k:<28}{v / 1e9:>12.1f}{gb_s}{ai_s}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": b, "flops": rows, "bytes": byte_rows}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
