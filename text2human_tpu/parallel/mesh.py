"""Device-mesh parallelism.

The reference is strictly single-GPU (SURVEY.md §2.8: no DDP/NCCL anywhere);
this framework *introduces* scaling the TPU way: a ``jax.sharding.Mesh`` over
ICI with named axes, sharding annotations on params/batches, and XLA inserting
the collectives (psum for dp grad reduction, all-gathers for tp) — no
hand-written communication.

Axes:
  dp — data parallel over the batch dimension (all six training jobs)
  tp — tensor parallel over attention heads / MLP hidden / output-head class
       dims of the sampler transformer (the only 100M-param-scale model)

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and the
same code spans pod slices (mesh axes ride ICI within a slice, DCN across).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a Mesh.  shape e.g. {'dp': 4, 'tp': 2}; defaults to all-dp."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"dp": len(devices), "tp": 1}
    names = tuple(shape.keys())
    dims = tuple(shape.values())
    assert int(np.prod(dims)) == len(devices), (dims, len(devices))
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, names)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, dp_axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate the rest."""
    return NamedSharding(mesh, P(dp_axis))


def _put(x: Any, sharding: NamedSharding) -> jax.Array:
    """Place one (host-global) array with ``sharding``.

    Single-controller: a plain device_put.  Multi-controller
    (jax.distributed.initialize'd, process_count > 1): device_put cannot
    place remote shards, so each process materializes only ITS addressable
    shards from the host-global value via make_array_from_callback — every
    host carries the full batch (deterministic loaders produce identical
    values per host) and ships only its slice to its devices."""
    if jax.process_count() > 1:
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # already a global array (e.g. a prefetched batch being
            # re-placed, or idempotent _distribute_state): same layout is a
            # no-op; a different one is a device-side collective reshard
            return x if x.sharding == sharding else jax.device_put(x, sharding)
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )
    return jax.device_put(x, sharding)


def shard_batch(mesh: Mesh, batch: Any, dp_axis: str = "dp") -> Any:
    sharding = batch_sharding(mesh, dp_axis)
    return jax.tree.map(lambda x: _put(x, sharding), batch)


# -- sampler transformer tensor-parallel layout ------------------------------

# path-pattern -> PartitionSpec for the scan-stacked transformer params.
# kernels are [layers, in, out] (Dense) / embeddings [vocab, emb].
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # attention: split heads (output dim of q/k/v, input dim of proj)
    (r"blocks/attn/(query|key|value)/kernel", P(None, None, "tp")),
    (r"blocks/attn/(query|key|value)/bias", P(None, "tp")),
    (r"blocks/attn/proj/kernel", P(None, "tp", None)),
    # MLP: split the 4x hidden dim
    (r"blocks/mlp_fc/kernel", P(None, None, "tp")),
    (r"blocks/mlp_fc/bias", P(None, "tp")),
    (r"blocks/mlp_proj/kernel", P(None, "tp", None)),
    # 18 output heads [K, D, C]: split the class dim
    (r"^heads$", P(None, None, "tp")),
    # embedding tables stay replicated: the +1 mask token makes the vocab odd
    # (18433), and at 512-dim they are small next to the blocks.
)


def transformer_param_specs(params: Any) -> Any:
    """PartitionSpec tree for TransformerMultiHead params (tp layout above,
    everything else replicated)."""

    def spec_for(path, leaf):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        for pattern, spec in _TP_RULES:
            if re.search(pattern, key):
                if len(spec) <= leaf.ndim:
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params: Any, specs: Optional[Any] = None) -> Any:
    """Device-put params with the given (or transformer) spec tree."""
    if specs is None:
        specs = transformer_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree over the mesh (params/opt state for pure dp)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: _put(x, sharding), tree)


def named_shardings(mesh: Mesh, specs: Any) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_pipeline(mesh: Mesh, params: Any, batch_arrays: Any, dp_axis: str = "dp"):
    """Serving-style placement for SamplePipeline: params replicated over the
    mesh, batch leaves sharded on ``dp_axis``.  The pipeline's jitted stages
    then run SPMD with XLA inserting the collectives (none are needed — the
    whole path is batch-elementwise)."""
    return (
        replicate_tree(mesh, params),
        jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh, dp_axis)),
            batch_arrays,
        ),
    )
