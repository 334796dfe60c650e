"""Pallas VQ kernel vs XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from text2human_tpu.ops.quantize import masked_nearest_indices_xla
from text2human_tpu.ops.vq_pallas import masked_nearest_indices_pallas


def test_pallas_vq_matches_xla(rng):
    k, n_e, d = 3, 128, 16
    n = 300  # non-multiple of the tile to exercise padding
    z = rng.standard_normal((n, d)).astype(np.float32)
    books = rng.standard_normal((k, n_e, d)).astype(np.float32)
    cb = rng.integers(0, k, n).astype(np.int32)

    want = np.asarray(
        masked_nearest_indices_xla(jnp.asarray(z), jnp.asarray(books), jnp.asarray(cb))
    )
    got = np.asarray(
        masked_nearest_indices_pallas(
            jnp.asarray(z), jnp.asarray(books), jnp.asarray(cb), interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_vq_tie_breaking(rng):
    """Duplicate codebook entries -> first index wins, like torch.argmin."""
    k, n_e, d = 1, 128, 8
    books = np.zeros((k, n_e, d), np.float32)
    books[0, 5] = 1.0  # entries equal except idx 5; zeros tie at idx 0
    z = np.zeros((16, d), np.float32)
    cb = np.zeros(16, np.int32)
    got = np.asarray(
        masked_nearest_indices_pallas(
            jnp.asarray(z), jnp.asarray(books), jnp.asarray(cb), interpret=True
        )
    )
    np.testing.assert_array_equal(got, np.zeros(16, np.int32))


def test_vq_impl_auto_dispatch(monkeypatch):
    """'auto' (the default) selects pallas only when the traced computation
    targets TPU: default backend tpu -> pallas, but an explicit
    jax.default_device(cpu) placement wins (host-side param init in bench.py
    must not emit a TPU-only custom call)."""
    import jax

    from text2human_tpu.ops import quantize as Q

    assert Q._VQ_IMPL == "auto"  # the shipped default
    prev = Q._VQ_IMPL
    try:
        Q.set_vq_impl("auto")
        # tests run on cpu -> xla path
        assert Q._use_pallas() is False
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert Q._use_pallas() is True
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            assert Q._use_pallas() is False
        Q.set_vq_impl("xla")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert Q._use_pallas() is False
    finally:
        Q.set_vq_impl(prev)
