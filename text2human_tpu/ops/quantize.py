"""Vector quantizers, vectorized for TPU.

The reference implements three quantizers with an 18-way python loop of masked
gathers/scatters per forward (models/archs/vqgan_arch.py:237-265, 410-439) —
dynamic-shaped boolean indexing that cannot compile under XLA.  Here the 18
codebooks are stacked into one ``[K, n_e, d]`` parameter and nearest-neighbour
search is a single MXU matmul over all K*n_e entries followed by a per-pixel
row-select on the texture id; outputs are dense ``[N, H, W]`` index maps
(-1-filled per-codebook lists are derived views, see
``indices_list_from_dense``).

Parity targets:
  VectorQuantizer               vqgan_arch.py:12-139
  VectorQuantizerTexture        vqgan_arch.py:142-309
  VectorQuantizerSpatialTextureAware vqgan_arch.py:329-486
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from text2human_tpu.ops.nn import nearest_downsample_mask
from text2human_tpu.ops.patch import patches_to_space, space_to_patches


class QuantOut(NamedTuple):
    """Result of a quantizer forward.

    z_q:           straight-through quantized feature, same shape as input.
    loss:          codebook + commitment loss (scalar).
    indices:       per-pixel index *within* the selected codebook, [N, H, W].
    indices_cont:  continual index (local + n_e * codebook_id), [N, H, W];
                   equals ``indices`` for the single-codebook quantizer.
    cb_ids:        per-pixel codebook id, [N, H, W] int32 (zeros if K == 1).
    """

    z_q: jax.Array
    loss: jax.Array
    indices: jax.Array
    indices_cont: jax.Array
    cb_ids: jax.Array


def nearest_codebook_indices(z_flat: jax.Array, codebook: jax.Array) -> jax.Array:
    """argmin_j ||z - e_j||^2 via the expanded form (vqgan_arch.py:88-92).

    z_flat: [N, d], codebook: [n_e, d] -> [N] int32.
    First-minimum tie-breaking matches torch.argmin.
    """
    d = (
        jnp.sum(z_flat * z_flat, axis=1, keepdims=True)
        + jnp.sum(codebook * codebook, axis=1)[None, :]
        - 2.0
        * jnp.dot(z_flat, codebook.T, preferred_element_type=jnp.float32)
    )
    return jnp.argmin(d, axis=1).astype(jnp.int32)


# nearest-neighbour implementation selector: 'xla' (dense matmul + select) or
# 'pallas' (fused streaming kernel, TPU only) or 'auto' (pallas when the
# computation being traced targets TPU).  Default is 'auto': the fused kernel
# is ~10% faster for the sampler-training tokenize step measured inside the
# jit on v5e (BENCHMARKS.md "VQ codebook search") and avoids the [N, K*n_e]
# HBM intermediate.  'auto' respects an explicit jax.default_device(cpu)
# placement (e.g. host-side param init while the default backend is TPU), the
# round-2 reason the default used to be 'xla'.
_VQ_IMPL = "auto"


def set_vq_impl(impl: str):
    """Select the codebook-search implementation: 'xla' | 'pallas' | 'auto'."""
    global _VQ_IMPL
    assert impl in ("xla", "pallas", "auto"), impl
    _VQ_IMPL = impl


def _use_pallas() -> bool:
    if _VQ_IMPL == "pallas":
        return True
    if _VQ_IMPL == "auto":
        try:
            # an explicit default-device placement wins over the backend:
            # tracing under `with jax.default_device(cpu)` must not emit a
            # TPU-only custom call
            dev = jax.config.jax_default_device
            if dev is not None:
                return getattr(dev, "platform", None) == "tpu"
            return jax.default_backend() == "tpu"
        except RuntimeError:
            return False
    return False


def masked_nearest_indices(
    z_flat: jax.Array, codebooks: jax.Array, cb_ids: jax.Array
) -> jax.Array:
    """Per-row nearest index within the codebook selected by ``cb_ids``.

    z_flat: [N, d]; codebooks: [K, n_e, d]; cb_ids: [N] int32 -> [N] int32.

    Dispatches to the fused Pallas kernel on TPU (no [N, K*n_e] HBM
    intermediate) or the dense XLA path elsewhere; both are index-exact under
    matched matmul precision (tests/test_vq_pallas.py).  On real TPU the two
    paths can disagree on ~0.1% of rows for random inputs (near-tie argmins
    flipped by MXU accumulation order); each path is deterministic.
    """
    if _use_pallas():
        from text2human_tpu.ops import vq_pallas

        # geometry guard: every released codebook (18x1024, 18x512) tiles;
        # odd debug sizes without a 128-aligned chunking fall back to XLA
        # instead of failing to lower
        if _VQ_IMPL != "pallas" and not vq_pallas.supports(codebooks.shape):
            return masked_nearest_indices_xla(z_flat, codebooks, cb_ids)
        # indices are non-differentiable (argmin; the straight-through
        # estimator bypasses them) — stop_gradient keeps autodiff from
        # JVP-ing into the kernel when this runs inside a GAN train step
        return vq_pallas.masked_nearest_indices_pallas(
            jax.lax.stop_gradient(z_flat),
            jax.lax.stop_gradient(codebooks),
            cb_ids,
        )
    return masked_nearest_indices_xla(z_flat, codebooks, cb_ids)


def masked_nearest_indices_xla(
    z_flat: jax.Array, codebooks: jax.Array, cb_ids: jax.Array
) -> jax.Array:
    """Dense path: distances to all K*n_e entries with one matmul (the K=18,
    n_e=1024 search over a 32x16 latent is ~10 GFLOP at batch 4 — microseconds
    on the MXU) then a per-pixel row select; this replaces the reference's
    data-dependent boolean gather loop."""
    k, n_e, dim = codebooks.shape
    flat_books = codebooks.reshape(k * n_e, dim)
    d = (
        jnp.sum(z_flat * z_flat, axis=1, keepdims=True)
        + jnp.sum(flat_books * flat_books, axis=1)[None, :]
        - 2.0 * jnp.dot(z_flat, flat_books.T, preferred_element_type=jnp.float32)
    )  # [N, K*n_e]
    d = d.reshape(-1, k, n_e)
    cb = jnp.clip(cb_ids, 0, k - 1)  # OOB ids would gather NaN fills
    d_sel = jnp.take_along_axis(d, cb[:, None, None], axis=1)[:, 0, :]
    return jnp.argmin(d_sel, axis=1).astype(jnp.int32)


def codebook_lookup(
    codebooks: jax.Array, indices: jax.Array, cb_ids: Optional[jax.Array] = None
) -> jax.Array:
    """Gather embeddings.  codebooks [K, n_e, d] (or [n_e, d]); indices [...]."""
    if codebooks.ndim == 2:
        return jnp.take(codebooks, indices, axis=0, mode="clip")
    k, n_e, dim = codebooks.shape
    flat = codebooks.reshape(k * n_e, dim)
    cont = indices + n_e * jnp.clip(cb_ids, 0, k - 1)
    return jnp.take(flat, cont, axis=0, mode="clip")


def _vq_loss(z: jax.Array, z_q_raw: jax.Array, beta: float, legacy: bool) -> jax.Array:
    """Codebook/commitment loss with the reference's legacy beta placement
    (vqgan_arch.py:98-103)."""
    commit = jnp.mean((jax.lax.stop_gradient(z_q_raw) - z) ** 2)
    embed = jnp.mean((z_q_raw - jax.lax.stop_gradient(z)) ** 2)
    if legacy:
        return commit + beta * embed
    return beta * commit + embed


def indices_list_from_dense(
    indices: jax.Array, cb_ids: jax.Array, num_codebooks: int
) -> List[jax.Array]:
    """Derive the reference's 18-way -1-filled index lists
    (vqgan_arch.py:263-265) from the dense representation."""
    return [
        jnp.where(cb_ids == k, indices, -1).astype(jnp.int32)
        for k in range(num_codebooks)
    ]


def dense_from_indices_list(indices_list, cb_ids: jax.Array) -> jax.Array:
    """Inverse of ``indices_list_from_dense`` (for importing reference outputs)."""
    stacked = jnp.stack(indices_list, axis=0)  # [K, ...]
    return jnp.take_along_axis(stacked, cb_ids[None].astype(jnp.int32), axis=0)[0]


def remap_to_used(
    inds: jax.Array,
    used: jax.Array,
    unknown_index="random",
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Post-hoc index remapping (reference vqgan_arch.py:53-67): map raw
    codebook indices to their position in the ``used`` subset.  Indices not
    in ``used`` become a random re-embed draw (``key`` required), the
    'extra' slot (``len(used)``), or a fixed integer."""
    match = inds[..., None] == used  # [..., M]
    new = jnp.argmax(match, axis=-1).astype(jnp.int32)
    unknown = ~jnp.any(match, axis=-1)
    re_embed = used.shape[0]
    if unknown_index == "random":
        if key is None:
            raise ValueError("unknown_index='random' needs an rng key")
        fill = jax.random.randint(key, new.shape, 0, re_embed).astype(jnp.int32)
    elif unknown_index == "extra":
        fill = jnp.full_like(new, re_embed)
    else:
        fill = jnp.full_like(new, int(unknown_index))
    return jnp.where(unknown, fill, new)


def unmap_to_all(inds: jax.Array, used: jax.Array) -> jax.Array:
    """Inverse of :func:`remap_to_used` (reference vqgan_arch.py:69-75):
    positions in ``used`` back to raw codebook indices; the 'extra' slot
    (>= len(used)) maps to 0 like the reference."""
    inds = jnp.where(inds >= used.shape[0], 0, inds)
    return jnp.take(used, inds, axis=0).astype(jnp.int32)


class VectorQuantizer(nn.Module):
    """Single-codebook VQ (reference vqgan_arch.py:12-139).

    ``remap`` (a tuple of used raw indices, ≙ the reference's .npy buffer)
    enables post-hoc index remapping: emitted indices live in the compacted
    [0, len(remap)) space and ``get_codebook_entry`` unmaps before the
    gather.  ``unknown_index='random'`` draws from the 'remap' RNG stream
    (pass ``rngs={'remap': key}``; the reference uses the global torch RNG).
    No shipped reference config sets remap — kept for drop-in parity.
    """

    n_embed: int
    embed_dim: int
    beta: float = 0.25
    legacy: bool = True
    remap: Optional[Tuple[int, ...]] = None
    unknown_index: "str | int" = "random"  # 'random' | 'extra' | int

    def setup(self):
        self.codebook = self.param(
            "codebook",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_embed, maxval=1.0 / self.n_embed
            ),
            (self.n_embed, self.embed_dim),
        )

    def __call__(self, z: jax.Array) -> QuantOut:
        n, h, w, c = z.shape
        z_flat = z.reshape(-1, self.embed_dim)
        idx = nearest_codebook_indices(z_flat, self.codebook)
        z_q_raw = jnp.take(self.codebook, idx, axis=0).reshape(z.shape)
        loss = _vq_loss(z, z_q_raw, self.beta, self.legacy)
        z_q = z + jax.lax.stop_gradient(z_q_raw - z)
        idx_map = idx.reshape(n, h, w)
        if self.remap is not None:
            key = (
                self.make_rng("remap")
                if self.unknown_index == "random"
                else None
            )
            idx_map = remap_to_used(
                idx_map, jnp.asarray(self.remap, jnp.int32),
                self.unknown_index, key,
            )
        zeros = jnp.zeros_like(idx_map)
        return QuantOut(z_q, loss, idx_map, idx_map, zeros)

    def get_codebook_entry(self, indices: jax.Array) -> jax.Array:
        """indices [N, H, W] -> [N, H, W, d] (vqgan_arch.py:124-139)."""
        if self.remap is not None:
            indices = unmap_to_all(indices, jnp.asarray(self.remap, jnp.int32))
        return jnp.take(self.codebook, indices, axis=0)


class VectorQuantizerTexture(nn.Module):
    """18-codebook per-pixel texture-aware VQ (reference vqgan_arch.py:142-309)."""

    n_embed: int
    embed_dim: int
    num_codebooks: int = 18
    beta: float = 0.25
    legacy: bool = True

    def setup(self):
        self.codebooks = self.param(
            "codebooks",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_embed, maxval=1.0 / self.n_embed
            ),
            (self.num_codebooks, self.n_embed, self.embed_dim),
        )

    def __call__(self, z: jax.Array, segm_map: jax.Array) -> QuantOut:
        """z: [N,H,W,d]; segm_map: [N,Hs,Ws] float/int texture-codebook ids."""
        n, h, w, c = z.shape
        cb = nearest_downsample_mask(segm_map, (h, w)).astype(jnp.int32)
        z_flat = z.reshape(-1, self.embed_dim)
        idx = masked_nearest_indices(z_flat, self.codebooks, cb.reshape(-1))
        z_q_raw = codebook_lookup(self.codebooks, idx, cb.reshape(-1)).reshape(z.shape)
        loss = _vq_loss(z, z_q_raw, self.beta, self.legacy)
        z_q = z + jax.lax.stop_gradient(z_q_raw - z)
        idx_map = idx.reshape(n, h, w)
        cont = idx_map + self.n_embed * cb
        return QuantOut(z_q, loss, idx_map, cont, cb)

    def get_codebook_entry(
        self, indices: jax.Array, segm_map: jax.Array
    ) -> jax.Array:
        """Dense decode: indices [N,H,W] local ids, segm_map any res
        (vqgan_arch.py:289-309, dense instead of list-of-18)."""
        n, h, w = indices.shape
        cb = nearest_downsample_mask(segm_map, (h, w)).astype(jnp.int32)
        return codebook_lookup(self.codebooks, indices, cb)


class VectorQuantizerSpatialTexture(nn.Module):
    """18-codebook 2x2-patch texture-aware VQ (reference vqgan_arch.py:329-486).

    Codebook entries have dim ``embed_dim * spatial_size**2`` and quantize
    non-overlapping patches; indices live at the patch grid resolution.
    """

    n_embed: int
    embed_dim: int
    spatial_size: int = 2
    num_codebooks: int = 18
    beta: float = 0.25
    legacy: bool = True

    @property
    def effective_dim(self) -> int:
        return self.embed_dim * self.spatial_size * self.spatial_size

    def setup(self):
        self.codebooks = self.param(
            "codebooks",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_embed, maxval=1.0 / self.n_embed
            ),
            (self.num_codebooks, self.n_embed, self.effective_dim),
        )

    def __call__(self, z: jax.Array, segm_map: jax.Array) -> QuantOut:
        n, h, w, c = z.shape
        p = self.spatial_size
        hp, wp = h // p, w // p
        cb = nearest_downsample_mask(segm_map, (hp, wp)).astype(jnp.int32)
        z_patches = space_to_patches(z, p)  # [N, hp, wp, c*p*p]
        z_flat = z_patches.reshape(-1, self.effective_dim)
        idx = masked_nearest_indices(z_flat, self.codebooks, cb.reshape(-1))
        z_q_patches = codebook_lookup(self.codebooks, idx, cb.reshape(-1)).reshape(
            z_patches.shape
        )
        z_q_raw = patches_to_space(z_q_patches, p, c)
        loss = _vq_loss(z, z_q_raw, self.beta, self.legacy)
        z_q = z + jax.lax.stop_gradient(z_q_raw - z)
        idx_map = idx.reshape(n, hp, wp)
        cont = idx_map + self.n_embed * cb
        return QuantOut(z_q, loss, idx_map, cont, cb)

    def get_codebook_entry(
        self, indices: jax.Array, segm_map: jax.Array
    ) -> jax.Array:
        """indices [N,hp,wp] -> [N, hp*p, wp*p, embed_dim] (vqgan_arch.py:463-486)."""
        n, hp, wp = indices.shape
        cb = nearest_downsample_mask(segm_map, (hp, wp)).astype(jnp.int32)
        z_q_patches = codebook_lookup(self.codebooks, indices, cb)
        return patches_to_space(z_q_patches, self.spatial_size, self.embed_dim)
