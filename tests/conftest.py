"""Test configuration: force an 8-device virtual CPU backend.

This is the standard JAX fake-backend trick so mesh/sharding code is exercised
without TPU hardware (SURVEY.md §4).  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon bootstrap (sitecustomize) force-sets jax_platforms="axon,cpu";
# override it before the backend is initialized so tests run on the virtual
# 8-device CPU mesh, not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# amortize test-model compiles across pytest runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def isolated_root(tmp_path, monkeypatch):
    """Reroot the CLI experiments/results tree into a tmp dir.

    Sets T2H_ROOT (honored by config.parse) and chdirs there so both the
    CLIs and the tests' relative ``experiments/...`` paths resolve under
    tmp_path.  `configs/` is symlinked in so ``-opt configs/...`` args keep
    working.  Suite cleanup of ``experiments`` therefore can never delete
    real training artifacts at the repo root (it once deleted live campaign
    checkpoints).  Env + cwd are inherited by subprocess-based tests.
    """
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    monkeypatch.setenv("T2H_ROOT", str(tmp_path))
    monkeypatch.chdir(tmp_path)
    os.symlink(os.path.join(repo, "configs"), tmp_path / "configs")
    return tmp_path
