"""Pallas TPU kernel: fused nearest-codebook search for texture-aware VQ.

The XLA path (ops/quantize.py:masked_nearest_indices) materializes the full
[N, K*n_e] distance matrix in HBM (151 MB for a batch-4 top-level encode) and
then reduces it.  This kernel streams codebook chunks through VMEM, keeps a
running (min, argmin) per row, and masks entries outside each row's selected
codebook — one pass, no HBM intermediate, matmuls on the MXU.

Tie-breaking matches torch/jnp argmin (first minimum), preserved across chunks
by strict-less updates.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vq_kernel(
    cb_ref,  # [TILE_N, 1] int32 per-row codebook id (SMEM-ish small)
    z_ref,  # [TILE_N, D]
    books_ref,  # [CHUNK, D]   chunk of the stacked codebooks
    e_sq_ref,  # [1, CHUNK]   precomputed ||e||^2 for the chunk
    out_ref,  # [TILE_N, 1] int32 global argmin index
    min_ref,  # scratch [TILE_N, 1] f32 running min
    arg_ref,  # scratch [TILE_N, 1] i32 running argmin
    *,
    n_e: int,
    chunk: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min_ref[:] = jnp.full_like(min_ref, jnp.inf)
        arg_ref[:] = jnp.zeros_like(arg_ref)

    z = z_ref[:]
    books = books_ref[:]
    # d = ||e||^2 - 2 z.e  (||z||^2 is constant per row; irrelevant to argmin)
    scores = e_sq_ref[:] - 2.0 * jnp.dot(
        z, books.T, preferred_element_type=jnp.float32
    )  # [TILE_N, CHUNK]

    col0 = j * chunk
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    # mask entries outside each row's codebook slice
    row_cb = cb_ref[:]  # [TILE_N, 1]
    in_book = (cols // n_e) == row_cb
    scores = jnp.where(in_book, scores, jnp.inf)

    chunk_min = jnp.min(scores, axis=1, keepdims=True)
    chunk_arg = jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None] + col0

    better = chunk_min < min_ref[:]
    arg_ref[:] = jnp.where(better, chunk_arg, arg_ref[:])
    min_ref[:] = jnp.where(better, chunk_min, min_ref[:])

    is_last = j == pl.num_programs(1) - 1

    @pl.when(is_last)
    def _():
        out_ref[:] = arg_ref[:]


def pick_chunk(total: int) -> Optional[int]:
    """Largest codebook chunk <= 1024 dividing ``total`` that the TPU tiling
    accepts: the [1, chunk] ||e||^2 block needs chunk % 128 == 0, or
    chunk == total (the whole array in one block)."""
    for c in range(min(1024, total), 0, -1):
        if total % c == 0 and (c == total or c % 128 == 0):
            return c
    return None


def supports(codebooks_shape) -> bool:
    """Whether the fused kernel can tile this codebook geometry (the 'auto'
    dispatch in ops/quantize.py falls back to XLA when it cannot)."""
    k, n_e, _ = codebooks_shape
    return pick_chunk(k * n_e) is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_nearest_indices_pallas(
    z_flat: jax.Array,
    codebooks: jax.Array,
    cb_ids: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Fused per-row nearest index within the selected codebook.

    z_flat [N, D]; codebooks [K, n_e, D]; cb_ids [N] int32 -> [N] int32 local
    index (within the selected codebook).
    """
    n, d = z_flat.shape
    k, n_e, _ = codebooks.shape
    total = k * n_e
    flat_books = codebooks.reshape(total, d).astype(jnp.float32)
    e_sq = jnp.sum(flat_books * flat_books, axis=1)[None, :]  # [1, total]

    tile_n = min(512, max(8, n))
    # pad rows to a tile multiple
    n_pad = -n % tile_n
    if n_pad:
        z_flat = jnp.pad(z_flat, ((0, n_pad), (0, 0)))
        cb_ids = jnp.pad(cb_ids, (0, n_pad))
    n_total = z_flat.shape[0]

    chunk = pick_chunk(total)
    if chunk is None:
        raise ValueError(
            f"codebook total {total} (= {k} x {n_e}) has no 128-aligned "
            "chunking; use the XLA path (set_vq_impl('xla') or 'auto')"
        )

    grid = (n_total // tile_n, total // chunk)
    out = pl.pallas_call(
        functools.partial(_vq_kernel, n_e=n_e, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_total, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.clip(cb_ids, 0, k - 1).astype(jnp.int32)[:, None],
        z_flat.astype(jnp.float32),
        flat_books,
        e_sq,
    )
    global_idx = out[:n, 0]
    return (global_idx % n_e).astype(jnp.int32)
