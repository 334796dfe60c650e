"""Checkpointing: orbax pytree save/restore + mid-run resume.

The reference only stores component state-dicts for inference handoff and has
NO mid-run resume (SURVEY.md §5: no optimizer/epoch/RNG state saved).  Here a
checkpoint is one pytree holding params, optimizer state, step, and the data
epoch, so training is preemption-safe — a first-class requirement on TPU pods.

``text2human_tpu.utils.torch_import`` converts the reference's ``.pth`` zoo
into these pytrees.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    _HAVE_ORBAX = False


def _snapshot(tree: Any) -> Any:
    """Detach a state tree from buffers the train loop is about to donate.

    Fully-addressable arrays come back as host numpy (single-host behavior,
    and what orbax serializes fastest); arrays spanning non-addressable
    devices (multi-host shardings) get a DEVICE-side copy instead —
    ``jax.device_get`` would raise on them, and keeping them distributed
    lets orbax write each shard from the process that owns it."""
    import jax.numpy as jnp

    def snap(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return jnp.copy(x)  # eager copy preserves the sharding
        return jax.device_get(x)

    return jax.tree.map(snap, tree)


def save_checkpoint(path: str, tree: Any):
    """Save a pytree checkpoint to ``path`` (a directory)."""
    path = osp.abspath(path)
    if _HAVE_ORBAX:
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(path, _snapshot(tree), force=True)
    else:
        os.makedirs(osp.dirname(path), exist_ok=True)
        flat, _ = jax.tree_util.tree_flatten(jax.device_get(tree))
        np.savez(path + ".npz", *flat)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint; ``target`` provides structure/dtypes."""
    path = osp.abspath(path)
    if _HAVE_ORBAX and osp.isdir(path):
        checkpointer = ocp.PyTreeCheckpointer()
        if target is not None:
            return checkpointer.restore(path, item=jax.device_get(target))
        return checkpointer.restore(path)
    npz = path if path.endswith(".npz") else path + ".npz"
    if osp.exists(npz):
        # fallback format (no orbax at save time): positional leaves, the
        # target supplies the tree structure
        if target is None:
            raise RuntimeError(f"npz restore of {npz} needs a target tree")
        flat, treedef = jax.tree_util.tree_flatten(target)
        with np.load(npz) as data:
            leaves = [data[f"arr_{i}"] for i in range(len(data.files))]
        if len(leaves) != len(flat):
            raise RuntimeError(
                f"{npz} holds {len(leaves)} leaves, target has {len(flat)}"
            )
        return jax.tree_util.tree_unflatten(treedef, leaves)
    if not _HAVE_ORBAX:
        raise RuntimeError(f"orbax not available and {npz} does not exist")
    raise FileNotFoundError(path)


# alias matching common orbax naming
restore_checkpoint = load_checkpoint


class AsyncCheckpointWriter:
    """Overlap checkpoint writes with training (orbax AsyncCheckpointer).

    ``save`` snapshots the tree to host memory, kicks off the serialization/
    disk write on orbax's background thread, and returns — the train loop
    keeps stepping while the checkpoint lands.  A new save waits for the
    previous one first (orbax allows one in-flight write per checkpointer).
    Call :meth:`wait` before process exit or before reading the file back.

    Falls back to the synchronous :func:`save_checkpoint` without orbax.
    On multi-host (``jax.process_count() > 1``) orbax coordinates the
    distributed barrier itself; every process must call save/wait.
    """

    def __init__(self):
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if _HAVE_ORBAX
            else None
        )

    def save(self, path: str, tree: Any):
        if self._ckptr is None:  # pragma: no cover - orbax is in the image
            return save_checkpoint(path, tree)
        self._ckptr.wait_until_finished()
        self._ckptr.save(osp.abspath(path), _snapshot(tree), force=True)

    def wait(self):
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()


def load_checkpoint_sharded(path: str, target: Any, mesh, specs) -> Any:
    """Restore a checkpoint directly into a sharded pytree on ``mesh``.

    ``specs`` is a PartitionSpec tree matching ``target`` (e.g. from
    ``parallel.mesh.transformer_param_specs``).  Each leaf is materialized
    with its NamedSharding by orbax — on a multi-host pod every process reads
    only the shards it owns, instead of replicating the full tree through
    host memory and resharding afterwards.
    """
    if not _HAVE_ORBAX:  # pragma: no cover - orbax is in the image
        raise RuntimeError("sharded restore requires orbax")
    from jax.sharding import NamedSharding

    restore_args = jax.tree.map(
        lambda leaf, spec: ocp.ArrayRestoreArgs(
            sharding=NamedSharding(mesh, spec),
            global_shape=leaf.shape,
            dtype=leaf.dtype,
        ),
        target,
        specs,
    )
    checkpointer = ocp.PyTreeCheckpointer()
    return checkpointer.restore(
        osp.abspath(path), item=target, restore_args=restore_args
    )


def latest_checkpoint(root: str) -> Optional[str]:
    """Return the highest-numbered checkpoint under ``root`` (step-named
    orbax dirs, or the npz fallback's ``<step>.npz`` files).  The original
    name is preserved — zero-padded names ('0005') must resolve to the path
    that actually exists, not its int round trip."""
    if not osp.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        stem = name[:-4] if name.endswith(".npz") else name
        if stem.isdigit():
            steps.append((int(stem), name))
    if not steps:
        return None
    return osp.join(root, max(steps)[1])
