"""Ahead-of-time compiled serving: export/load the pipeline's XLA executables.

The persistent compilation cache (utils/misc.enable_compilation_cache) makes
warm boots *mostly* skip XLA compilation, but a fresh process still pays
trace + lower + cache lookup per program, with high variance over a remote
TPU tunnel (BENCHMARKS.md "Serving cold start").  This module removes even
that: `export_serving` compiles every jitted stage of a `SamplePipeline` for
the serving batch tiers and serializes the executables
(jax.experimental.serialize_executable) into one artifact file;
`load_serving` swaps them into the pipeline so the first request runs a
pre-built program — no tracing, no lowering, no cache machinery.

The artifact is backend-specific (same jax version + same TPU generation),
like any compiled binary.  Shapes not covered by the export transparently
fall back to the pipeline's normal jit path.  SECURITY: the artifact is a
pickle (jax's serialize_executable is pickle-based) — loading it executes
code, so only load artifacts you built; treat the file like you treat the
serving binary itself.

    # build once (e.g. in CI or at deploy-image build time)
    python -m text2human_tpu.cli.serve -opt ... --prime-cache --aot aot.pkl
    # boot from it
    python -m text2human_tpu.cli.serve -opt ... --warmup --aot aot.pkl
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# v2: the _sample dispatch key grew a decode_mode field (per-request
# faithful/fast serving) — v1 artifacts no longer match the call signature
FORMAT_VERSION = 2


def _sds(tree: Any) -> Any:
    """ShapeDtypeStructs pinned to device 0: serving is single-chip, and an
    unpinned lower() on a multi-device backend (the 8-virtual-device test
    mesh) produces an executable demanding 8-sharded inputs."""
    dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=dev), tree
    )


def _stage_specs(pipe, params, b: int, presets, with_pose: bool):
    """(stage, dispatch-key, example-args) triples for one batch size.

    ``presets`` is the list of (sample_steps, decode_mode) pairs the _sample
    stage is compiled for — serving can offer faithful and fast decodes side
    by side (cli/serve.py --fast-steps), each a distinct compiled program."""
    cfgs = pipe.cfgs
    res = cfgs.top.resolution
    h, w = res, res // 2
    t = cfgs.transformer.block_size
    p = _sds(params)
    f32, i32 = jnp.float32, jnp.int32
    dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def s(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=dev)

    specs = []
    if with_pose and pipe.parsing_gen is not None:
        n_attr = len(cfgs.shape_attr.cls_num_list)
        specs.append(
            ("_parsing", (b,), (p, s((b, h, w, 1), f32), s((b, n_attr), i32)))
        )
        specs.append(
            ("_texture_mask",
             (b,),
             (s((b, h, w), i32), s((b,), i32), s((b,), i32), s((b,), i32)))
        )
    specs.append(("_tokenize_segm", (b,), (p, s((b, h, w), i32))))
    specs.append(("_tex_tokens", (b,), (s((b, h, w), f32),)))
    for steps, mode in presets:
        specs.append(
            ("_sample",
             (b, steps, mode),
             (p, jax.random.key(0), s((b, t), i32), s((b, t), i32)))
        )
    specs.append(("_decode", (b,), (p, s((b, t), i32), s((b, h, w), f32))))
    return specs


def export_serving(
    pipe,
    params,
    path: str,
    batch_sizes: Sequence[int] = (4,),
    sample_steps: int = 0,
    with_pose: bool = True,
    extra_presets: Sequence[Tuple[int, str]] = (),
) -> int:
    """Compile + serialize every serving stage for ``batch_sizes``.

    ``extra_presets`` adds (sample_steps, decode_mode) variants of the
    sampler stage beyond the configured default — e.g. ``[(32, "maskgit")]``
    for a fast preset served per-request (cli/serve.py --fast-steps).
    Returns the number of programs exported.  Compilation reuses the
    in-process/persistent caches, so exporting right after a warmup is cheap.
    """
    from jax.experimental.serialize_executable import serialize

    if pipe.cfgs.transformer.sampler == "autoregressive":
        # sample_indices normalizes the static step/mode args to (0, "") in
        # AR mode (the decode ignores them); the blob must be keyed the same
        # way or serving would never dispatch the pre-built sampler
        presets = [(0, "")]
    else:
        steps = int(sample_steps) or int(pipe.cfgs.sample_steps)
        presets = [(steps, "")]
        for s_, m_ in extra_presets:
            # mirror sample_indices' normalization: the boot-time default
            # mode keys as "" so request-level spellings share one program
            m_ = "" if m_ == pipe.decode_mode else m_
            if (int(s_), m_) not in presets:
                presets.append((int(s_), m_))
    blobs: Dict[str, Dict[Tuple, Any]] = {}
    for b in batch_sizes:
        for stage, dkey, args in _stage_specs(pipe, params, b, presets, with_pose):
            fn = getattr(pipe, stage)
            if stage == "_sample":
                _, st_, md_ = dkey
                compiled = fn.lower(
                    *args, sample_steps=st_, decode_mode=md_
                ).compile()
            else:
                compiled = fn.lower(*args).compile()
            blob, in_tree, out_tree = serialize(compiled)
            avals = tuple(
                (tuple(x.shape), str(x.dtype)) for x in jax.tree.leaves(args)
            )
            blobs.setdefault(stage, {})[tuple(dkey)] = (
                blob, in_tree, out_tree, avals,
            )
    payload = {
        "version": FORMAT_VERSION,
        # the jax version (key name kept for artifact back-compat): a
        # serialized executable is coupled to the runtime that built it
        "jaxlib": jax.__version__,
        "platform": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "sample_presets": presets,
        "blobs": blobs,
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return sum(len(v) for v in blobs.values())


def load_serving(pipe, path: str) -> int:
    """Deserialize an export and install shape-dispatch wrappers on ``pipe``.

    Stages/batch-sizes covered by the artifact run the pre-built executable;
    anything else falls through to the original jit.  Returns the number of
    programs installed.  Raises ValueError on backend mismatch (an executable
    is a compiled binary for one TPU generation).
    """
    from jax.experimental.serialize_executable import deserialize_and_load

    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("version") != FORMAT_VERSION:
        raise ValueError(f"unsupported AOT artifact version {payload.get('version')}")
    if payload.get("jaxlib") != jax.__version__:
        # deserialize_and_load unpickles version-coupled pytree defs and an
        # executable built by that runtime — a mismatch fails with an opaque
        # unpickle/XLA error (or loads an incompatible program); check first
        raise ValueError(
            f"AOT artifact built with jax {payload.get('jaxlib')}, running "
            f"jax {jax.__version__}; re-export with --prime-cache"
        )
    dev = jax.devices()[0]
    if payload["platform"] != dev.platform or (
        payload["device_kind"] != dev.device_kind
    ):
        raise ValueError(
            f"AOT artifact built for {payload['platform']}/{payload['device_kind']}"
            f", running on {dev.platform}/{dev.device_kind}"
        )
    count = 0

    def avals_of(args) -> tuple:
        return tuple(
            (tuple(x.shape), str(x.dtype))
            for x in jax.tree.leaves(args)
            if hasattr(x, "shape")
        )

    for stage, by_key in payload["blobs"].items():
        loaded = {
            # pin to device 0: the default loads for ALL addressable devices
            # (8-sharded inputs on the virtual test mesh); serving is
            # single-chip and the export pinned device 0 too
            k: (
                deserialize_and_load(
                    v[0], v[1], v[2], execution_devices=[jax.devices()[0]]
                ),
                v[3],
            )
            for k, v in by_key.items()
        }
        count += len(loaded)
        orig = getattr(pipe, stage)
        if stage == "_sample":
            def wrapper(p, key, st, tt, sample_steps, decode_mode="",
                        _l=loaded, _o=orig):
                hit = _l.get((st.shape[0], sample_steps, decode_mode))
                if hit is not None and avals_of((p, key, st, tt)) == hit[1]:
                    return hit[0](p, key, st, tt)
                return _o(p, key, st, tt, sample_steps=sample_steps,
                          decode_mode=decode_mode)
        else:
            # dispatch on the leading (batch) dim of the last array arg (the
            # batch input; params lead), then verify every input aval — a
            # dtype drift must fall back to jit, not crash the executable
            def wrapper(*args, _l=loaded, _o=orig):
                arrays = [a for a in jax.tree.leaves(args) if hasattr(a, "shape")]
                b = arrays[-1].shape[0] if arrays else None
                hit = _l.get((b,))
                if hit is not None and avals_of(args) == hit[1]:
                    return hit[0](*args)
                return _o(*args)
        setattr(pipe, stage, wrapper)
    return count


def maybe_load_serving(pipe, path: Optional[str]) -> int:
    """load_serving if the artifact exists and loads; 0 otherwise.  Boot must
    not fail because the first deployment hasn't exported yet — or because
    the artifact is stale (jax upgrade, different TPU generation): the jit
    path always works, so log and fall back instead of dying."""
    if not path or not os.path.exists(path):
        return 0
    try:
        return load_serving(pipe, path)
    except Exception as e:
        import logging

        logging.getLogger("base").warning(
            f"AOT artifact {path} not loaded ({e}); serving falls back to "
            "jit + persistent cache — re-export with --prime-cache"
        )
        return 0
