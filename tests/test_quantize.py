"""Quantizer unit tests: vectorized lookup vs brute-force numpy reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2human_tpu.ops.quantize import (
    QuantOut,
    VectorQuantizer,
    VectorQuantizerSpatialTexture,
    VectorQuantizerTexture,
    dense_from_indices_list,
    indices_list_from_dense,
    masked_nearest_indices,
    nearest_codebook_indices,
)
from text2human_tpu.ops.patch import patches_to_space, space_to_patches


def brute_force_nn(z, books, cb_ids):
    """Per-row nearest neighbour within the selected codebook, O(N*n_e)."""
    out = np.empty(z.shape[0], dtype=np.int32)
    for i in range(z.shape[0]):
        book = books[cb_ids[i]]
        d = ((book - z[i]) ** 2).sum(axis=1)
        out[i] = int(np.argmin(d))
    return out


def test_nearest_codebook_indices_matches_brute_force(rng):
    z = rng.standard_normal((64, 8)).astype(np.float32)
    book = rng.standard_normal((32, 8)).astype(np.float32)
    got = np.asarray(nearest_codebook_indices(jnp.asarray(z), jnp.asarray(book)))
    want = brute_force_nn(z, book[None], np.zeros(64, dtype=np.int32))
    np.testing.assert_array_equal(got, want)


def test_masked_nearest_indices_matches_brute_force(rng):
    k, n_e, d = 5, 16, 8
    z = rng.standard_normal((100, d)).astype(np.float32)
    books = rng.standard_normal((k, n_e, d)).astype(np.float32)
    cb = rng.integers(0, k, size=100).astype(np.int32)
    got = np.asarray(
        masked_nearest_indices(jnp.asarray(z), jnp.asarray(books), jnp.asarray(cb))
    )
    want = brute_force_nn(z, books, cb)
    np.testing.assert_array_equal(got, want)


def test_patch_roundtrip(rng):
    x = rng.standard_normal((2, 8, 6, 5)).astype(np.float32)
    patches = space_to_patches(jnp.asarray(x), 2)
    assert patches.shape == (2, 4, 3, 20)
    back = patches_to_space(patches, 2, 5)
    np.testing.assert_allclose(np.asarray(back), x)


def test_patch_feature_order_matches_unfold(rng):
    """F.unfold is channel-major then row-major within the patch."""
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    ours = np.asarray(space_to_patches(jnp.asarray(x), 2))  # [1,2,2,12]
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    theirs = torch.nn.functional.unfold(xt, (2, 2), stride=2)  # [1,12,4]
    theirs = theirs.permute(0, 2, 1).reshape(1, 2, 2, 12).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_vector_quantizer_forward(rng):
    vq = VectorQuantizer(n_embed=16, embed_dim=4)
    z = jnp.asarray(rng.standard_normal((2, 4, 3, 4)).astype(np.float32))
    params = vq.init(jax.random.key(0), z)
    out = vq.apply(params, z)
    assert isinstance(out, QuantOut)
    assert out.z_q.shape == z.shape
    assert out.indices.shape == (2, 4, 3)
    assert out.loss.shape == ()
    # straight-through: z_q carries z's gradients
    def f(zz):
        return jnp.sum(vq.apply(params, zz).z_q)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(z)))
    # decode matches
    # z_q = z + (entry - z) accumulates ~1e-7 rounding vs the direct gather
    entries = vq.apply(params, out.indices, method=VectorQuantizer.get_codebook_entry)
    np.testing.assert_allclose(
        np.asarray(entries), np.asarray(jax.lax.stop_gradient(out.z_q)), atol=1e-6
    )


def test_texture_quantizer_respects_mask(rng):
    vq = VectorQuantizerTexture(n_embed=8, embed_dim=4, num_codebooks=3)
    z = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    segm = jnp.asarray(rng.integers(0, 3, size=(1, 8, 8)).astype(np.float32))
    params = vq.init(jax.random.key(0), z, segm)
    out = vq.apply(params, z, segm)
    books = np.asarray(params["params"]["codebooks"])
    cb = np.asarray(out.cb_ids).reshape(-1)
    want = brute_force_nn(np.asarray(z).reshape(-1, 4), books, cb)
    np.testing.assert_array_equal(np.asarray(out.indices).reshape(-1), want)
    np.testing.assert_array_equal(
        np.asarray(out.indices_cont).reshape(-1), want + 8 * cb
    )
    # -1-filled per-codebook views roundtrip
    lst = indices_list_from_dense(out.indices, out.cb_ids, 3)
    assert len(lst) == 3
    dense = dense_from_indices_list(lst, out.cb_ids)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(out.indices))
    # decode
    entry = vq.apply(
        params, out.indices, segm, method=VectorQuantizerTexture.get_codebook_entry
    )
    np.testing.assert_allclose(
        np.asarray(entry),
        books.reshape(-1, 4)[want + 8 * cb].reshape(1, 4, 4, 4),
        rtol=1e-6,
    )


def test_spatial_texture_quantizer(rng):
    vq = VectorQuantizerSpatialTexture(
        n_embed=8, embed_dim=4, spatial_size=2, num_codebooks=3
    )
    z = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    segm = jnp.asarray(rng.integers(0, 3, size=(1, 16, 16)).astype(np.float32))
    params = vq.init(jax.random.key(0), z, segm)
    out = vq.apply(params, z, segm)
    assert out.z_q.shape == z.shape
    assert out.indices.shape == (1, 4, 4)  # patch grid
    books = np.asarray(params["params"]["codebooks"])
    cb = np.asarray(out.cb_ids).reshape(-1)
    z_patches = np.asarray(space_to_patches(z, 2)).reshape(-1, 16)
    want = brute_force_nn(z_patches, books, cb)
    np.testing.assert_array_equal(np.asarray(out.indices).reshape(-1), want)
    # decode roundtrip equals quantized feature
    entry = vq.apply(
        params,
        out.indices,
        segm,
        method=VectorQuantizerSpatialTexture.get_codebook_entry,
    )
    np.testing.assert_allclose(
        np.asarray(entry), np.asarray(jax.lax.stop_gradient(out.z_q)), atol=1e-6
    )


def test_vq_gradients_match_torch_semantics(rng):
    """Straight-through + legacy-beta codebook loss gradients vs torch autograd.

    d(loss)/d(z) must combine the pass-through recon gradient with the
    commitment term; d(loss)/d(codebook) only the beta'd embed term
    (reference vqgan_arch.py:98-106 legacy branch).
    """
    torch = pytest.importorskip("torch")
    n_e, d, n = 6, 4, 10
    z = rng.standard_normal((1, 2, 5, d)).astype(np.float32)
    book = rng.standard_normal((n_e, d)).astype(np.float32)
    beta = 0.25

    # ours: loss = sum(z_q) + vq_loss  (sum(z_q) stands in for the recon loss)
    vq = VectorQuantizer(n_embed=n_e, embed_dim=d, beta=beta)
    params = {"params": {"codebook": jnp.asarray(book)}}

    def total(zz, pp):
        out = vq.apply(pp, zz)
        return jnp.sum(out.z_q) + out.loss

    g_z, g_p = jax.grad(total, argnums=(0, 1))(jnp.asarray(z), params)

    # torch replica of the same math from the raw formulas
    zt = torch.tensor(z, requires_grad=True)
    bt = torch.tensor(book, requires_grad=True)
    z_flat = zt.reshape(-1, d)
    d2 = (z_flat ** 2).sum(1, keepdim=True) + (bt ** 2).sum(1) - 2 * z_flat @ bt.T
    idx = d2.argmin(1)
    z_q = bt[idx].reshape(zt.shape)
    loss = ((z_q.detach() - zt) ** 2).mean() + beta * ((z_q - zt.detach()) ** 2).mean()
    z_q_st = zt + (z_q - zt).detach()
    (z_q_st.sum() + loss).backward()

    np.testing.assert_allclose(np.asarray(g_z), zt.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_p["params"]["codebook"]), bt.grad.numpy(), atol=1e-5
    )


def test_remap_matches_torch_replica(rng):
    """remap_to_used / unmap_to_all (vqgan_arch.py:53-75): deterministic
    modes match the torch reference logic exactly; 'random' mode fills
    unknowns in [0, re_embed) and keeps known mappings exact."""
    import torch

    from text2human_tpu.ops.quantize import remap_to_used, unmap_to_all

    used_np = np.array([3, 7, 11, 42], np.int64)
    inds_np = rng.integers(0, 48, (2, 24))

    def torch_remap(inds, unknown):
        used = torch.from_numpy(used_np)
        t = torch.from_numpy(inds)
        match = (t[:, :, None] == used[None, None, :]).long()
        new = match.argmax(-1)
        unk = match.sum(2) < 1
        new[unk] = unknown
        return new.numpy()

    # 'extra' = re_embed; integer mode = that integer (vqgan_arch.py:60-66)
    for mode, fill in [("extra", len(used_np)), (0, 0), (2, 2)]:
        got = np.asarray(
            remap_to_used(jnp.asarray(inds_np), jnp.asarray(used_np), mode)
        )
        np.testing.assert_array_equal(got, torch_remap(inds_np, fill))

    got_r = np.asarray(
        remap_to_used(
            jnp.asarray(inds_np), jnp.asarray(used_np), "random",
            key=jax.random.key(0),
        )
    )
    known = np.isin(inds_np, used_np)
    np.testing.assert_array_equal(
        got_r[known], torch_remap(inds_np, 0)[known]
    )
    assert got_r[~known].min() >= 0 and got_r[~known].max() < len(used_np)

    # unmap: inverse on known ids; extra slot -> used[0] (reference sets 0)
    remapped = torch_remap(inds_np, len(used_np))
    back = np.asarray(unmap_to_all(jnp.asarray(remapped), jnp.asarray(used_np)))
    np.testing.assert_array_equal(back[known], inds_np[known])
    np.testing.assert_array_equal(back[~known], used_np[0])


def test_vector_quantizer_remap_module(rng):
    """VectorQuantizer(remap=...): emitted indices live in the compacted
    space; get_codebook_entry unmaps so the roundtrip hits the same rows as
    the unremapped quantizer."""
    from text2human_tpu.ops.quantize import VectorQuantizer

    used = (1, 3, 4, 6)
    z = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    plain = VectorQuantizer(n_embed=8, embed_dim=8)
    params = plain.init(jax.random.key(0), z)["params"]
    out_plain = plain.apply({"params": params}, z)

    vq = VectorQuantizer(n_embed=8, embed_dim=8, remap=used, unknown_index="extra")
    out = vq.apply({"params": params}, z)
    assert int(out.indices.max()) <= len(used)  # compacted + extra slot
    # known raw indices map to their position in `used`
    raw = np.asarray(out_plain.indices)
    comp = np.asarray(out.indices)
    for pos, u in enumerate(used):
        np.testing.assert_array_equal(comp[raw == u], pos)
    assert (comp[~np.isin(raw, used)] == len(used)).all()

    # entries for compacted ids == entries for the raw ids they unmap to
    ent = vq.apply({"params": params}, out.indices, method=VectorQuantizer.get_codebook_entry)
    want = plain.apply(
        {"params": params},
        jnp.asarray(np.where(np.isin(raw, used), raw, used[0])),
        method=VectorQuantizer.get_codebook_entry,
    )
    np.testing.assert_allclose(np.asarray(ent), np.asarray(want))

    # 'random' mode draws from the 'remap' rng stream
    vq_r = VectorQuantizer(n_embed=8, embed_dim=8, remap=used)
    out_r = vq_r.apply({"params": params}, z, rngs={"remap": jax.random.key(1)})
    assert int(out_r.indices.max()) < len(used)
