"""End-to-end benchmark: sample_from_pose images/sec/chip at 512x256.

Runs the full-size Stage I + III + II inference path (parsing generation,
segm tokenization, 256-step absorbing-diffusion sampling with the 24L/512d
18-head transformer in bfloat16, index prediction, hierarchical VQGAN decode)
with randomly-initialized full-size weights — identical compute to trained
checkpoints.

The reference publishes no throughput numbers (BASELINE.md); the recorded
baseline is the project north-star of 1.0 image/sec (text -> 512x256 in <1s,
BASELINE.md "Rebuild targets"), so vs_baseline = images_per_sec / 1.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    # Dead-man guard: the tunneled device backend can wedge so hard that even
    # jax.devices() blocks forever (observed r5).  A watchdog THREAD (not
    # SIGALRM — a Python signal handler cannot run while the main thread is
    # stuck inside a native tunnel call) emits a diagnosable JSON line and
    # hard-exits.  The deadline is pushed forward at each phase boundary so
    # every individual compile gets its own budget (three full-pipeline
    # compiles at ~10 min each on a cold cache are healthy, not wedged).
    import os
    import threading

    _deadline = [time.time() + 1500]

    def _push_deadline(seconds):
        _deadline[0] = time.time() + seconds

    def _watchdog():
        while True:
            time.sleep(30)
            if time.time() > _deadline[0]:
                print(json.dumps({
                    "metric": "images_per_sec_per_chip", "value": 0.0,
                    "unit": "img/s", "vs_baseline": 0.0,
                    "error": "device unresponsive past watchdog",
                }), flush=True)
                os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # persistent compilation cache: the full pipeline compile is ~10 min over
    # the remote-compile tunnel; cached reruns skip it.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from text2human_tpu import config as C
    from text2human_tpu.config import (
        FCNHeadConfig,
        UNetConfig,
    )
    from text2human_tpu.pipelines.sample import PipelineConfigs, SamplePipeline

    cfgs = PipelineConfigs(
        top=C.TOP_VQGAN,
        top_quant=C.TOP_QUANTIZER,
        bot=C.BOT_VQGAN,
        bot_quant=C.BOT_QUANTIZER,
        segm=C.SEGM_VQGAN,
        segm_quant=C.SEGM_QUANTIZER,
        transformer=C.SAMPLER_TRANSFORMER,
        index_unet=C.INDEX_PRED_UNET,
        index_fcn=C.INDEX_PRED_FCN,
        shape_attr=C.PARSING_GEN_ATTR,
        parsing_unet=C.PARSING_GEN_UNET,
        parsing_fcn=C.PARSING_GEN_FCN,
        sample_steps=256,
    )
    pipe = SamplePipeline(cfgs, dtype=jnp.bfloat16)

    b = 4
    h, w = 512, 256
    rng = np.random.default_rng(0)

    # Weights: prefer the campaign-trained pipeline checkpoint when present
    # (scripts/run_campaign.sh + eval_campaign.sh write it) so the headline
    # number is measured on genuinely trained weights; otherwise random
    # full-size weights via eval_shape + numpy fills shipped in one
    # device_put (cli/sample.py load_params): flax .init would EXECUTE the
    # full-size forward on one host core (~76 s measured; this path is ~40 s,
    # dominated by the 1.2 GB tunnel transfer).  Compute is identical either
    # way — same dims, same step counts.
    import os.path as osp

    t0 = time.time()
    from text2human_tpu.cli.sample import load_params

    repo = osp.dirname(osp.abspath(__file__))
    campaign_ckpt = osp.join(repo, "checkpoints", "campaign_pipeline")
    if not osp.isdir(campaign_ckpt):
        # machine resets wipe the gitignored checkpoints/ tree; the campaign
        # archives the assembled pipeline in git (scripts/eval_campaign.sh)
        archived = osp.join(repo, "campaign_ckpts", "pipeline")
        if osp.isdir(archived):
            campaign_ckpt = archived
    params = None
    weights = "random-synthetic"
    if osp.isdir(campaign_ckpt):
        try:
            params = load_params(
                pipe, {"model_type": "SampleFromPoseModel"},
                synthetic=False, ckpt=campaign_ckpt,
            )
            weights = "campaign-trained"
        except Exception as e:  # fall back rather than fail the bench
            print(f"# campaign checkpoint unusable ({e!r}); random weights")
            params = None
    if params is None:
        params = load_params(
            pipe, {"model_type": "SampleFromPoseModel"}, synthetic=True
        )
    jax.block_until_ready(params)
    init_time = time.time() - t0

    def measure(b):
        pose = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)).astype(np.float32))
        shape_attr = jnp.asarray(
            np.stack(
                [
                    rng.integers(0, np.array(C.PARSING_GEN_ATTR.cls_num_list))
                    for _ in range(b)
                ]
            ),
            jnp.int32,
        )
        upper = jnp.asarray(rng.integers(0, 17, (b,)), jnp.int32)
        lower = jnp.asarray(rng.integers(0, 17, (b,)), jnp.int32)
        outer = jnp.asarray(rng.integers(0, 17, (b,)), jnp.int32)

        def run(key):
            imgs, _ = pipe.sample_from_pose(
                params, key, pose, shape_attr, upper, lower, outer
            )
            return imgs

        # warmup/compile.  NOTE: force a host transfer to materialize — on
        # the tunneled axon backend block_until_ready returns before
        # execution completes, which would make timings meaningless.
        _push_deadline(2400)  # fresh budget per compile phase
        t0 = time.time()
        out = run(jax.random.key(0))
        np.asarray(out[:, :1, :1, :1])
        compile_time = time.time() - t0

        times = []
        for i in range(3):
            t0 = time.time()
            out = run(jax.random.key(i + 1))
            np.asarray(out[:, :1, :1, :1])
            times.append(time.time() - t0)
        return min(times), compile_time

    # serving-batch throughput is the headline (b=16 is the measured sweet
    # spot with the fused attention kernel; round 1 regressed here); the
    # interactive b=4 latency (<1 s north star) is reported as detail.
    lat4, compile4 = measure(b)
    b_serve = 16
    lat16, compile16 = measure(b_serve)

    imgs_per_sec = b_serve / lat16

    # opt-in fast decode (decode_mode='maskgit', 32 steps + bf16 conv stages —
    # documented divergences from the reference's 256-step f32 schedule; the
    # headline metric above stays reference-faithful).  conv_dtype matters
    # here: with the sample stage cut 8x the parsing/decode conv stages
    # dominate, and bf16 keeps their bandwidth-bound UNet stacks half-width
    # (BENCHMARKS.md "Fast decode").
    from text2human_tpu.pipelines.sample import with_conv_dtype

    pipe_fast = SamplePipeline(
        with_conv_dtype(cfgs, "bfloat16"), dtype=jnp.bfloat16,
        decode_mode="maskgit",
    )
    rngf = np.random.default_rng(1)
    pose = jnp.asarray(rngf.uniform(-1, 1, (b_serve, h, w, 1)).astype(np.float32))
    shape_attr = jnp.asarray(
        np.stack(
            [rngf.integers(0, np.array(C.PARSING_GEN_ATTR.cls_num_list))
             for _ in range(b_serve)]
        ),
        jnp.int32,
    )
    upper, lower, outer = (
        jnp.asarray(rngf.integers(0, 17, (b_serve,)), jnp.int32)
        for _ in range(3)
    )

    def run_fast(key):
        imgs, _ = pipe_fast.sample_from_pose(
            params, key, pose, shape_attr, upper, lower, outer, 32
        )
        return imgs

    _push_deadline(2400)  # fresh budget for the bf16/maskgit compile
    out = run_fast(jax.random.key(0))
    np.asarray(out[:, :1, :1, :1])
    fast_times = []
    for i in range(3):
        t0 = time.time()
        out = run_fast(jax.random.key(i + 1))
        np.asarray(out[:, :1, :1, :1])
        fast_times.append(time.time() - t0)
    lat_fast = min(fast_times)

    result = {
        "metric": "sample_from_pose_512x256_throughput",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 1.0, 4),
        "detail": {
            "batch": b_serve,
            "sample_steps": 256,
            "batch_latency_s": round(lat16, 4),
            "batch4_latency_s": round(lat4, 4),
            "batch4_imgs_per_sec": round(b / lat4, 4),
            "maskgit32_imgs_per_sec": round(b_serve / lat_fast, 4),
            "maskgit32_batch_latency_s": round(lat_fast, 4),
            "compile_s": round(compile4 + compile16, 2),
            "init_s": round(init_time, 2),
            "backend": jax.default_backend(),
            "weights": weights,
        },
    }
    _push_deadline(10**9)  # disarm
    print(json.dumps(result))


if __name__ == "__main__":
    main()
