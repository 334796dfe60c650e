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


def test_pallas_vq_multi_chunk_grid(rng):
    """Production-geometry chunking: k=18, n_e=128 -> total 2304, chunk 768,
    THREE grid steps over the codebook — exercising the scratch init and the
    cross-chunk running-min/strict-less accumulation that single-chunk
    geometries (total <= 1024) never reach, plus first-index tie-breaking
    ACROSS chunk boundaries."""
    from text2human_tpu.ops.vq_pallas import pick_chunk

    k, n_e, d = 18, 128, 16
    assert pick_chunk(k * n_e) not in (None, k * n_e)  # really multi-chunk
    z = rng.standard_normal((260, d)).astype(np.float32)
    books = rng.standard_normal((k, n_e, d)).astype(np.float32)
    cb = rng.integers(0, k, 260).astype(np.int32)
    want = np.asarray(
        masked_nearest_indices_xla(jnp.asarray(z), jnp.asarray(books), jnp.asarray(cb))
    )
    got = np.asarray(
        masked_nearest_indices_pallas(
            jnp.asarray(z), jnp.asarray(books), jnp.asarray(cb), interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)

    # duplicate best entries in different CHUNKS of the same codebook: the
    # earlier chunk's index must win (strict-less accumulation)
    books2 = np.ones((k, n_e, d), np.float32)
    books2[7, 3] = 0.0    # codebook 7, flat index 7*128+3 (chunk 1)
    books2[7, 100] = 0.0  # same distance, later in the same codebook
    z2 = np.zeros((8, d), np.float32)
    cb2 = np.full(8, 7, np.int32)
    got2 = np.asarray(
        masked_nearest_indices_pallas(
            jnp.asarray(z2), jnp.asarray(books2), jnp.asarray(cb2), interpret=True
        )
    )
    np.testing.assert_array_equal(got2, np.full(8, 3, np.int32))


def test_vq_impl_cli_flag():
    """--vq-impl flag (cli/common.py) drives ops.quantize.set_vq_impl; the
    parity-sensitive CLIs (convert/evaluate) default to the exact 'xla'
    search, the throughput CLIs (sample/tokenize) keep 'auto'."""
    import argparse

    from text2human_tpu.cli.common import add_vq_impl_flag, apply_vq_impl
    from text2human_tpu.ops import quantize as Q

    prev = Q._VQ_IMPL
    try:
        p = argparse.ArgumentParser()
        add_vq_impl_flag(p, default="xla")
        args = p.parse_args([])
        assert args.vq_impl == "xla"  # parity default
        apply_vq_impl(args)
        assert Q._VQ_IMPL == "xla"

        args = p.parse_args(["--vq-impl", "pallas"])
        apply_vq_impl(args)
        assert Q._VQ_IMPL == "pallas"

        p2 = argparse.ArgumentParser()
        add_vq_impl_flag(p2)  # throughput default
        assert p2.parse_args([]).vq_impl == "auto"
    finally:
        Q.set_vq_impl(prev)
