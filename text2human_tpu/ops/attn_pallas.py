"""Pallas TPU kernel: whole-sequence fused attention for the sampler trunk.

The sampler's attention is T=512 tokens x head_dim 64 (configs/sampler.yml:
58-62; reference models/archs/transformer_arch.py:9-72).  At serving batch
sizes the XLA einsum path writes the [B, H, T, T] f32 score matrix to HBM and
reads it back around the softmax — ~13 GB per denoise step at batch 32 over
24 layers, which is why round-1 throughput *peaked at batch 4*
(BENCHMARKS.md).  The stock Pallas flash kernel was 2x slower here: its
streaming tiles and running-max bookkeeping are built for long sequences,
while this workload's entire per-head score matrix is only 1 MB.

This kernel instead processes one (batch, head) pair per grid step with the
full T x T score matrix resident in VMEM (q/k/v blocks + f32 scores ~1.5 MB,
far under the ~16 MB budget): one QK^T matmul, an exact softmax (single max,
no online rescaling), one PV matmul.  Scores never touch HBM; per-step HBM
traffic is just q/k/v/o.

Inference-only (no dropout, no mask) — the absorbing-diffusion decode loop is
bidirectional (reference sampler='absorbing', transformer_arch.py:30-35).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel_btc(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float, n_head: int):
    # refs are [1, T, C] blocks of the packed multi-head activations (the
    # dense layers' native output layout — no transpose/reshape copies);
    # heads are static column slices, processed sequentially with each
    # head's full [T, T] score matrix living only in VMEM
    d = q_ref.shape[-1] // n_head
    for h in range(n_head):
        cols = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, cols]  # [T, D]
        k = k_ref[0, :, cols]
        v = v_ref[0, :, cols]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * sm_scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / denom).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, :, cols] = o.astype(o_ref.dtype)


def _vma_of(*xs):
    """Varying-manual-axes union of the inputs.  ``pallas_call`` inside
    ``jax.shard_map`` (check_vma=True, the default) requires ``out_shape``
    to declare how the output varies over the manual mesh axes; outside
    shard_map this is the empty set and a no-op."""
    vma = frozenset()
    for x in xs:
        vma |= getattr(jax.typeof(x), "vma", frozenset())
    return vma


@functools.partial(
    jax.jit, static_argnames=("n_head", "sm_scale", "block_heads", "interpret")
)
def fused_attention_btc(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    sm_scale: float,
    block_heads: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Like :func:`fused_attention` but takes/returns the packed [B, T, C]
    layout (C = n_head * head_dim) the trunk's dense layers already produce,
    so no transpose or reshape copies are materialized.

    ``block_heads`` heads are processed per grid step (their packed column
    width must satisfy Mosaic's lane constraint: a multiple of 128 or the
    whole C); smaller blocks give more grid steps to pipeline at small
    batch.  0 picks all heads (one grid step per batch element).
    """
    b, t, c = q.shape
    d = c // n_head
    if (
        block_heads <= 0
        or (block_heads * d) % 128 != 0  # Mosaic lane constraint
        or n_head % block_heads != 0  # partial last block would skip heads
    ):
        block_heads = n_head
    n_blocks = n_head // block_heads
    bc = block_heads * d
    spec = pl.BlockSpec(
        (1, t, bc), lambda ib, ih: (ib, 0, ih), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _attn_kernel_btc, sm_scale=sm_scale, n_head=block_heads
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype, vma=_vma_of(q, k, v)),
        grid=(b, n_blocks),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t * t * c,
            transcendentals=b * n_head * t * t,
            bytes_accessed=4 * b * t * c * q.dtype.itemsize,
        ),
        interpret=interpret,
    )(q, k, v)


def _attn_bwd_kernel_btc(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, sm_scale: float, n_head: int,
):
    """Whole-sequence attention backward per batch element.

    Recomputes each head's probabilities from q/k in VMEM (flash-style — the
    forward never saved the [T, T] scores to HBM) and emits dq/dk/dv with
    the standard softmax-attention gradient:
      dV = P^T dO;  dP = dO V^T;  dS = P*(dP - rowsum(dP*P))*scale;
      dQ = dS K;    dK = dS^T Q.
    """
    d = q_ref.shape[-1] // n_head
    f32 = jnp.float32
    for h in range(n_head):
        cols = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, cols]
        k = k_ref[0, :, cols]
        v = v_ref[0, :, cols]
        do = do_ref[0, :, cols]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
        ) * sm_scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [T, T] f32
        p_lo = p.astype(v.dtype)
        dv = jax.lax.dot_general(
            p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )  # P^T dO -> [T, D]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )  # dO V^T -> [T, T]
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row) * sm_scale).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )  # dS^T Q
        dq_ref[0, :, cols] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, cols] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, cols] = dv.astype(dv_ref.dtype)


def _attn_bwd_btc(q, k, v, do, n_head: int, sm_scale: float, interpret: bool):
    b, t, c = q.shape
    d = c // n_head
    # Scoped-VMEM budget: whole-C blocks double-buffer 7 [T, C] f32 buffers
    # (4 in + 3 out) on top of ~5 MB of per-head [T, T] temporaries — at
    # C=512/T=512 that is ~17.7 MB, over the 16 MB scoped limit.  Block over
    # heads so the packed column width stays <= 256 (must remain a multiple
    # of 128 for Mosaic's lane constraint); each head's gradient is
    # independent, so head blocks are exact.
    block_heads = n_head
    if c > 256:
        for bh in range(n_head - 1, 0, -1):
            if n_head % bh == 0 and (bh * d) % 128 == 0 and bh * d <= 256:
                block_heads = bh
                break
    n_blocks = n_head // block_heads
    bc = block_heads * d
    spec = pl.BlockSpec(
        (1, t, bc), lambda ib, ih: (ib, 0, ih), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((b, t, c), q.dtype, vma=_vma_of(q, k, v, do))
    return pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel_btc, sm_scale=sm_scale, n_head=block_heads
        ),
        out_shape=(shape, shape, shape),
        grid=(b, n_blocks),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * t * t * c,
            transcendentals=b * n_head * t * t,
            bytes_accessed=7 * b * t * c * q.dtype.itemsize,
        ),
        interpret=interpret,
    )(q, k, v, do)


def _head_partition(n_head: int, n_in: int, n_out: int, local_fn):
    """`custom_partitioning` rule for the [B, T, C] kernels: batch shards
    freely (dp), T is forced replicated (the kernels need the whole
    sequence), and the packed-head dim C shards at whole-head granularity
    (tp) — each device then runs the SAME kernel on its local heads, since
    heads are fully independent.  XLA cannot partition a Pallas custom call
    by itself; this rule is what lets the fused kernels run under
    jit-propagated dp x tp shardings (docs/SCALING.md) instead of forcing
    the einsum fallback."""

    def axis_count(mesh, names):
        if names is None:
            return 1
        names = names if isinstance(names, tuple) else (names,)
        n = 1
        for name in names:
            n *= dict(mesh.shape)[name]
        return n

    def partition(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = arg_shapes[0].sharding.spec
        b_ax = spec[0] if len(spec) > 0 else None
        c_ax = spec[2] if len(spec) > 2 else None
        c_shards = axis_count(mesh, c_ax)
        if n_head % c_shards != 0:
            # reshard to whole heads per device: every device computes ALL
            # heads on its local batch (tp attention parallelism is lost,
            # plus per-layer gathers).  Compile-time path, so warn once —
            # this is silent-performance-cliff territory for custom YAMLs
            # whose head count doesn't divide the tp axis.
            import logging

            logging.getLogger("base").warning(
                f"fused attention: {n_head} heads not divisible by "
                f"{c_shards} '{c_ax}' shards; replicating heads per device "
                "(tp does not parallelize attention for this config)"
            )
            c_ax, c_shards = None, 1
        ns = NamedSharding(mesh, P(b_ax, None, c_ax))
        local_heads = n_head // c_shards

        def lower_fn(*args):
            return local_fn(local_heads, *args)

        outs = ns if n_out == 1 else (ns,) * n_out
        return mesh, lower_fn, outs, (ns,) * n_in

    def infer(mesh, arg_shapes, shape):
        sh = arg_shapes[0].sharding
        return sh if n_out == 1 else (sh,) * n_out

    args = ", ".join(["b t c"] * n_in)
    outs = ", ".join(["b t c"] * n_out)
    return dict(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=f"{args} -> {outs}",
        need_replication_factors=("t",),
    )


@functools.lru_cache(maxsize=None)
def _trainable_attention(n_head: int, sm_scale: float, interpret: bool):
    """custom_vjp-wrapped fused attention for the training path: forward is
    the whole-sequence kernel, backward recomputes probabilities in VMEM.
    Both directions carry a head-granular partitioning rule, so the kernels
    shard over dp (batch) and tp (heads) meshes through plain jit sharding
    propagation — no shard_map wrapper or einsum fallback needed."""
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def attn_fwd_p(q, k, v):
        return fused_attention_btc(
            q, k, v, n_head=n_head, sm_scale=sm_scale, interpret=interpret
        )

    attn_fwd_p.def_partition(
        **_head_partition(
            n_head, 3, 1,
            lambda nh, q, k, v: fused_attention_btc(
                q, k, v, n_head=nh, sm_scale=sm_scale, interpret=interpret
            ),
        )
    )

    @custom_partitioning
    def attn_bwd_p(q, k, v, do):
        return _attn_bwd_btc(q, k, v, do, n_head, sm_scale, interpret)

    attn_bwd_p.def_partition(
        **_head_partition(
            n_head, 4, 3,
            lambda nh, q, k, v, do: _attn_bwd_btc(
                q, k, v, do, nh, sm_scale, interpret
            ),
        )
    )

    @jax.custom_vjp
    def attn(q, k, v):
        return attn_fwd_p(q, k, v)

    def fwd(q, k, v):
        return attn(q, k, v), (q, k, v)

    def bwd(res, do):
        q, k, v = res
        return attn_bwd_p(q, k, v, do.astype(q.dtype))

    attn.defvjp(fwd, bwd)
    return attn


def _unfused_attn_btc(q, k, v, n_head: int, sm_scale: float):
    """Reference math of the fused kernel on the packed [B,T,C] layout —
    identical precision choices (f32 scores/softmax, activation-dtype PV
    matmul with f32 accumulation)."""
    b, t, c = q.shape
    d = c // n_head
    qh = q.reshape(b, t, n_head, d)
    kh = k.reshape(b, t, n_head, d)
    vh = v.reshape(b, t, n_head, d)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * sm_scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", p, vh, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return o.reshape(b, t, c)


@functools.lru_cache(maxsize=None)
def _manual_trainable(n_head: int, sm_scale: float, interpret: bool):
    """custom_vjp fused attention WITHOUT the custom_partitioning wrapper,
    for calls already inside ``jax.shard_map`` manual mode (the pp trunk):
    each device holds its own microbatch shard, so the kernels run directly
    — a partitioning rule would be meaningless there."""

    @jax.custom_vjp
    def attn(q, k, v):
        return fused_attention_btc(
            q, k, v, n_head=n_head, sm_scale=sm_scale, interpret=interpret
        )

    def fwd(q, k, v):
        return attn(q, k, v), (q, k, v)

    def bwd(res, do):
        q, k, v = res
        return _attn_bwd_btc(q, k, v, do.astype(q.dtype), n_head, sm_scale,
                             interpret)

    attn.defvjp(fwd, bwd)
    return attn


def fused_attention_btc_trainable(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    sm_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable fused attention ([B,T,C] packed layout): the forward
    kernel plus a VMEM-resident backward (scores never hit HBM in either
    direction)."""
    if _vma_of(q, k, v):
        # inside shard_map manual mode (parallel/pp.py pipeline stages)
        if interpret:
            # the Pallas HLO interpreter cannot run under shard_map's vma
            # checking (its internal dynamic_slice mixes varying types —
            # jax 0.9.0 limitation, CPU tests only); run the numerically
            # identical unfused math so tests still cover this wiring.  On
            # TPU the compiled kernel path below runs.
            return _unfused_attn_btc(q, k, v, n_head, float(sm_scale))
        return _manual_trainable(n_head, float(sm_scale), interpret)(q, k, v)
    return _trainable_attention(n_head, float(sm_scale), interpret)(q, k, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float):
    q = q_ref[0]  # [T, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)  # bf16 PV matmul, f32 accumulation
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Non-causal attention, softmax in f32, scores VMEM-resident.

    q/k/v: [B, H, T, D] (any float dtype; bf16 recommended) -> [B, H, T, D].
    """
    b, h, t, d = q.shape
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    spec = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct(
            (b * h, t, d), q.dtype, vma=_vma_of(q, k, v)
        ),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * t * t * d,
            transcendentals=b * h * t * t,
            bytes_accessed=4 * b * h * t * d * q.dtype.itemsize,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)
