"""InceptionV3-pool3 FID extractor: converter structure + end-to-end FID
geometry with synthesized weights (VERDICT round-1 missing #8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2human_tpu.models.inception import (
    InceptionV3Pool3,
    inception_feature_extractor,
    inception_params_from_torch,
)


@pytest.fixture(scope="module")
def init_vars():
    return InceptionV3Pool3().init(
        jax.random.key(0), jnp.zeros((1, 299, 299, 3))
    )


def _torch_sd_from_flax(variables, rng):
    """Synthesize a torchvision-layout state dict (random values) whose
    shapes mirror our init — validates the converter's renames/transposes."""
    sd = {}

    def convs(tree, path):
        for k, v in tree.items():
            if k == "conv":
                w = rng.standard_normal(np.shape(v["kernel"])).astype(np.float32) * 0.05
                sd[".".join(path + ["conv"]) + ".weight"] = np.transpose(w, (3, 2, 0, 1))
            elif isinstance(v, dict):
                convs(v, path + [k])

    def bns(tree, path):
        for k, v in tree.items():
            if k == "bn":
                c = np.shape(v["scale"])[0]
                base = ".".join(path + ["bn"])
                sd[base + ".weight"] = rng.standard_normal(c).astype(np.float32)
                sd[base + ".bias"] = rng.standard_normal(c).astype(np.float32)
                sd[base + ".running_mean"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
                sd[base + ".running_var"] = (np.abs(rng.standard_normal(c)) + 1.0).astype(np.float32)
                sd[base + ".num_batches_tracked"] = np.asarray(0)
            elif isinstance(v, dict):
                bns(v, path + [k])

    convs(variables["params"], [])
    bns(variables["params"], [])
    # converter must skip classifier heads
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    return sd


def tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


def test_inception_converter_structure_and_forward(init_vars, rng):
    sd = _torch_sd_from_flax(init_vars, rng)
    converted = inception_params_from_torch(sd)
    assert tree_shapes(converted["params"]) == tree_shapes(init_vars["params"])
    assert tree_shapes(converted["batch_stats"]) == tree_shapes(
        init_vars["batch_stats"]
    )
    # converted values land where they should (spot-check one kernel)
    w_t = sd["Conv2d_1a_3x3.conv.weight"]
    np.testing.assert_array_equal(
        converted["params"]["Conv2d_1a_3x3"]["conv"]["kernel"],
        np.transpose(w_t, (2, 3, 1, 0)),
    )

    extract = inception_feature_extractor(
        jax.tree.map(jnp.asarray, converted)
    )
    feats = extract(jnp.asarray(rng.uniform(0, 1, (2, 64, 32, 3)), jnp.float32))
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_fid_with_inception_extractor(init_vars, rng):
    """Standard FID geometry end-to-end through the Inception extractor."""
    from text2human_tpu.utils.fid import compute_fid

    extract = inception_feature_extractor(init_vars)
    real = [rng.uniform(0.4, 0.6, (3, 64, 32, 3)).astype(np.float32) for _ in range(2)]
    same = [rng.uniform(0.4, 0.6, (3, 64, 32, 3)).astype(np.float32) for _ in range(2)]
    diff = [rng.uniform(0.0, 1.0, (3, 64, 32, 3)).astype(np.float32) for _ in range(2)]
    fid_same = compute_fid(real, same, extract)
    fid_diff = compute_fid(real, diff, extract)
    assert fid_diff > fid_same >= 0.0
