"""Benchmark the autoregressive decode paths at flagship sampler dims:
whole-sequence scan loop (diffusion/absorbing.py:sample_autoregressive) vs
KV-cached incremental decode (models/ar_decode.py).

Usage: python tools/bench_ar.py [--batch 4] [--cpu] [--layers N] [--block T]
Prints one JSON line per path with tokens/sec and end-to-end latency.
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--layers", type=int, default=0, help="override n_layers")
    ap.add_argument("--block", type=int, default=0, help="override block_size")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from text2human_tpu.config import SAMPLER_TRANSFORMER
    from text2human_tpu.diffusion.absorbing import (
        AbsorbingDiffusion,
        sample_autoregressive,
    )
    from text2human_tpu.models.ar_decode import ar_decode_kv
    from text2human_tpu.models.transformer import TransformerMultiHead

    cfg = dataclasses.replace(SAMPLER_TRANSFORMER, sampler="autoregressive")
    if args.layers:
        cfg = dataclasses.replace(cfg, n_layers=args.layers)
    if args.block:
        hw = args.block
        cfg = dataclasses.replace(
            cfg, block_size=hw, latent_shape=(hw // 16, 16)
        )
    b, t_len = args.batch, cfg.block_size
    c = cfg.head_class_num
    model = TransformerMultiHead(cfg, dtype=jnp.bfloat16)
    diff = AbsorbingDiffusion(
        mask_id=cfg.codebook_size, num_tokens=t_len, n_embed_per_head=c
    )

    rng = np.random.default_rng(0)
    dummy = jnp.zeros((1, t_len), jnp.int32)
    t0 = time.time()
    params = model.init(jax.random.key(0), dummy, dummy, dummy)["params"]
    jax.block_until_ready(params)
    print(f"# init {time.time() - t0:.1f}s  (L={cfg.n_layers} T={t_len} "
          f"D={cfg.n_emb} b={b})", flush=True)
    segm = jnp.asarray(rng.integers(0, cfg.segm_codebook_size, (b, t_len)),
                       jnp.int32)
    tex = jnp.asarray(rng.integers(0, cfg.texture_codebook_size, (b, t_len)),
                      jnp.int32)

    def denoise(x_t):
        return model.apply(
            {"params": params}, x_t, segm, tex, select_heads=True
        )

    @jax.jit
    def run_loop(key):
        local, _ = sample_autoregressive(key, diff, denoise, tex)
        return local

    @jax.jit
    def run_kv(key):
        local, _, _ = ar_decode_kv(
            key, params, cfg, segm, tex, n_embed_per_head=c,
            dtype=jnp.bfloat16,
        )
        return local

    for name, fn in (("kv_cache", run_kv), ("whole_sequence", run_loop)):
        t0 = time.time()
        out = fn(jax.random.key(1))
        np.asarray(out)  # force a real host transfer (tunnel-safe timing)
        compile_s = time.time() - t0
        times = []
        for i in range(3):
            t0 = time.time()
            out = fn(jax.random.key(i + 2))
            np.asarray(out)
            times.append(time.time() - t0)
        lat = min(times)
        print(json.dumps({
            "path": name, "latency_s": round(lat, 3),
            "tokens_per_s": round(b * t_len / lat, 1),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
