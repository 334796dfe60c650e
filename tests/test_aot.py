"""AOT serving-executable export/load (pipelines/aot.py)."""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")


def _tiny_pose_pipe():
    from test_pipeline import CFGS
    from text2human_tpu.config import (
        FCNHeadConfig, ShapeAttrConfig, UNetConfig,
    )
    from text2human_tpu.pipelines.sample import PipelineConfigs, SamplePipeline

    res = CFGS.top.resolution
    cfgs = dataclasses.replace(
        CFGS,
        shape_attr=ShapeAttrConfig(dim=4, out_dim=8, cls_num_list=(2, 3)),
        parsing_unet=UNetConfig(in_channels=1, base_channels=4, num_stages=3,
                                attr_embedding=8, enc_num_convs=(1, 1, 1),
                                dec_num_convs=(1, 1)),
        parsing_fcn=FCNHeadConfig(in_channels=4, channels=4, num_classes=24,
                                  in_index=2),
    )
    return SamplePipeline(cfgs), res


def _pose_params(pipe, res):
    from test_pipeline import _init_params

    rng = np.random.default_rng(0)
    params = _init_params(pipe, rng)
    pg = pipe.parsing_gen.init(
        jax.random.key(4),
        jnp.zeros((1, res, res // 2, 1)),
        jnp.zeros((1, 2), jnp.int32),
    )
    params["parsing_gen"] = {
        "params": pg["params"], "batch_stats": pg.get("batch_stats", {})
    }
    return params


def test_aot_export_load_roundtrip(tmp_path):
    """Exported executables, loaded into a FRESH pipeline, reproduce the jit
    pipeline exactly; uncovered batch sizes fall back to jit."""
    from text2human_tpu.pipelines import aot

    pipe, res = _tiny_pose_pipe()
    params = _pose_params(pipe, res)
    b = 2
    rng = np.random.default_rng(1)
    pose = jnp.asarray(rng.uniform(-1, 1, (b, res, res // 2, 1)), jnp.float32)
    attr = jnp.asarray(
        np.stack([rng.integers(0, [2, 3]) for _ in range(b)]), jnp.int32
    )
    up, lo, ou = (
        jnp.asarray(rng.integers(0, 3, (b,)), jnp.int32) for _ in range(3)
    )
    ref, ref_segm = pipe.sample_from_pose(
        params, jax.random.key(9), pose, attr, up, lo, ou
    )

    path = str(tmp_path / "aot.pkl")
    n = aot.export_serving(pipe, params, path, batch_sizes=(b,))
    assert n == 6  # parsing, texture_mask, tokenize, tex_tokens, sample, decode

    pipe2, _ = _tiny_pose_pipe()
    assert aot.load_serving(pipe2, path) == 6

    # uncovered batch size -> transparent jit fallback (still correct)
    pose1, attr1 = pose[:1], attr[:1]
    u1, l1, o1 = up[:1], lo[:1], ou[:1]
    ref1, _ = pipe.sample_from_pose(
        params, jax.random.key(3), pose1, attr1, u1, l1, o1
    )
    out1, _ = pipe2.sample_from_pose(
        params, jax.random.key(3), pose1, attr1, u1, l1, o1
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref1))

    # maybe_load_serving: missing artifact is a no-op, not a crash
    pipe3, _ = _tiny_pose_pipe()
    assert aot.maybe_load_serving(pipe3, str(tmp_path / "absent.pkl")) == 0
    assert aot.maybe_load_serving(pipe3, "") == 0


def test_aot_prebuilt_execution_matches_jit(tmp_path):
    from text2human_tpu.pipelines import aot

    pipe, res = _tiny_pose_pipe()
    params = _pose_params(pipe, res)
    b = 2
    rng = np.random.default_rng(1)
    pose = jnp.asarray(rng.uniform(-1, 1, (b, res, res // 2, 1)), jnp.float32)
    attr = jnp.asarray(
        np.stack([rng.integers(0, [2, 3]) for _ in range(b)]), jnp.int32
    )
    up, lo, ou = (
        jnp.asarray(rng.integers(0, 3, (b,)), jnp.int32) for _ in range(3)
    )
    ref, ref_segm = pipe.sample_from_pose(
        params, jax.random.key(9), pose, attr, up, lo, ou
    )
    path = str(tmp_path / "aot.pkl")
    aot.export_serving(pipe, params, path, batch_sizes=(b,))
    pipe2, _ = _tiny_pose_pipe()
    aot.load_serving(pipe2, path)

    # covered batch size runs the PRE-BUILT executables and matches jit
    # exactly.  The XLA:CPU *thunk* runtime loses jitted fusion symbols
    # through serialize/deserialize on this version (execution fails with
    # 'Function <fusion> not found'); the legacy CPU runtime executes the
    # deserialized program correctly, so when the in-process attempt hits
    # that failure the whole roundtrip re-runs in a subprocess under
    # --xla_cpu_use_thunk_runtime=false — the execute half stays COVERED on
    # CPU either way (the TPU runtime is unaffected; verified on hardware,
    # BENCHMARKS.md "Serving cold start").
    try:
        out, segm = pipe2.sample_from_pose(
            params, jax.random.key(9), pose, attr, up, lo, ou
        )
        out = np.asarray(out)
    except Exception as e:  # pragma: no cover - host-dependent
        if "not found" not in str(e):
            raise
        import os
        import subprocess

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # the axon bootstrap would force jax_platforms back to "axon,cpu"
        # at interpreter start (and block on a wedged tunnel); an empty
        # POOL_IPS makes sitecustomize skip the plugin entirely
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = "--xla_cpu_use_thunk_runtime=false"
        env["PYTHONPATH"] = os.pathsep.join(
            [os.path.dirname(__file__),
             os.path.dirname(os.path.dirname(__file__)),
             env.get("PYTHONPATH", "")]
        )
        proc = subprocess.run(
            [sys.executable, "-c",
             "import test_aot; test_aot._aot_execute_roundtrip_main()"],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        assert proc.returncode == 0 and "AOT_EXECUTE_OK" in proc.stdout, (
            f"legacy-runtime AOT execution failed too:\n{proc.stdout}\n"
            f"{proc.stderr[-2000:]}"
        )
        return
    np.testing.assert_array_equal(out, np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(segm), np.asarray(ref_segm))


def _aot_execute_roundtrip_main():  # pragma: no cover - subprocess body
    """Export -> fresh-pipeline load -> execute -> exact-match, for the
    legacy-CPU-runtime subprocess fallback above."""
    import tempfile

    import jax as _jax
    import jax.numpy as _jnp

    from text2human_tpu.pipelines import aot

    pipe, res = _tiny_pose_pipe()
    params = _pose_params(pipe, res)
    b = 2
    rng = np.random.default_rng(1)
    pose = _jnp.asarray(rng.uniform(-1, 1, (b, res, res // 2, 1)), _jnp.float32)
    attr = _jnp.asarray(
        np.stack([rng.integers(0, [2, 3]) for _ in range(b)]), _jnp.int32
    )
    up, lo, ou = (
        _jnp.asarray(rng.integers(0, 3, (b,)), _jnp.int32) for _ in range(3)
    )
    ref, ref_segm = pipe.sample_from_pose(
        params, _jax.random.key(9), pose, attr, up, lo, ou
    )
    with tempfile.TemporaryDirectory() as td:
        path = td + "/aot.pkl"
        aot.export_serving(pipe, params, path, batch_sizes=(b,))
        pipe2, _ = _tiny_pose_pipe()
        assert aot.load_serving(pipe2, path) > 0
        out, segm = pipe2.sample_from_pose(
            params, _jax.random.key(9), pose, attr, up, lo, ou
        )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(segm), np.asarray(ref_segm))
    print("AOT_EXECUTE_OK")


def test_aot_backend_mismatch_refused(tmp_path):
    """An artifact is a compiled binary for one backend: loading a doctored
    platform tag must raise, not crash at run time."""
    import pickle

    from text2human_tpu.pipelines import aot

    pipe, res = _tiny_pose_pipe()
    params = _pose_params(pipe, res)
    path = str(tmp_path / "aot.pkl")
    aot.export_serving(pipe, params, path, batch_sizes=(1,))
    with open(path, "rb") as f:
        payload = pickle.load(f)
    payload["platform"] = "tpu"
    payload["device_kind"] = "TPU v5"
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    with pytest.raises(ValueError, match="built for tpu"):
        aot.load_serving(pipe, path)


def test_aot_jax_version_mismatch_falls_back(tmp_path, caplog):
    """A serialized executable is coupled to the jax runtime that built it:
    a version mismatch must raise a clear ValueError from load_serving, and
    maybe_load_serving must fall back to jit (boot must not fail) with a
    warning instead of dying on an opaque unpickle error."""
    import logging
    import pickle

    from text2human_tpu.pipelines import aot

    pipe, res = _tiny_pose_pipe()
    params = _pose_params(pipe, res)
    path = str(tmp_path / "aot.pkl")
    aot.export_serving(pipe, params, path, batch_sizes=(1,))
    with open(path, "rb") as f:
        payload = pickle.load(f)
    payload["jaxlib"] = "0.0.1"
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    with pytest.raises(ValueError, match="jax 0.0.1"):
        aot.load_serving(pipe, path)
    with caplog.at_level(logging.WARNING, logger="base"):
        assert aot.maybe_load_serving(pipe, path) == 0
    assert any("falls back to jit" in r.message for r in caplog.records)


def test_aot_autoregressive_keys_match_serving_dispatch(tmp_path):
    """AR pipelines normalize the static sample_steps arg to 0 at serve time
    (sample_indices); the export must key the _sample blob the same way or
    the pre-built sampler would never be dispatched."""
    import pickle

    from test_pipeline import CFGS
    from text2human_tpu.pipelines.sample import SamplePipeline

    cfgs = dataclasses.replace(
        CFGS,
        transformer=dataclasses.replace(CFGS.transformer,
                                        sampler="autoregressive"),
    )
    pipe = SamplePipeline(cfgs)
    from test_pipeline import _init_params

    params = _init_params(pipe, np.random.default_rng(0))
    path = str(tmp_path / "aot_ar.pkl")

    from text2human_tpu.pipelines import aot

    aot.export_serving(pipe, params, path, batch_sizes=(1,), with_pose=False)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    assert list(payload["blobs"]["_sample"]) == [(1, 0, "")]
