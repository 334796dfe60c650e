"""Slim a stage-final train checkpoint down to its inference subtree.

The campaign's build machine is periodically reset, wiping everything
gitignored (``experiments/``, ``token_cache_campaign/``) — see
docs/CAMPAIGN.md "the rerun".  Stage-final checkpoints therefore get
archived into the git-tracked ``campaign_ckpts/`` directory so completed
stages survive resets and the campaign accumulates across rounds.

Optimizer moments dominate a full TrainState (2 extra param-sized trees for
adam) and are only needed to *resume* a stage — never by downstream stages,
``pipelines/assemble.py``, or ``utils/native_frozen.py``, which read just
``state.params`` (+ ``state.batch_stats`` for the BatchNorm nets).  So the
archive keeps exactly that, cutting the footprint ~3-5x.

Usage: python scripts/slim_ckpt.py <final_ckpt_dir> <out_dir>
"""

from __future__ import annotations

import os
import os.path as osp
import shutil
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

# Pin to the host CPU BEFORE any backend init: the axon bootstrap
# (sitecustomize) force-sets jax_platforms="axon,cpu", overriding a
# JAX_PLATFORMS=cpu env var — and a slim/archive helper must never block on
# the device tunnel (a wedged tunnel hung this script mid-campaign, r5).
import jax

jax.config.update("jax_platforms", "cpu")

from text2human_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def slim_tree(tree):
    state = tree.get("state", tree)
    # "step" is a scalar but load-bearing on slim --resume (GAN disc_start
    # gating, log continuity); keep it alongside the weights.
    keep = {k: state[k] for k in ("params", "batch_stats") if k in state
            and state[k]}
    if "step" in state:
        keep["step"] = state["step"]
    out = {"state": keep}
    for k in ("epoch", "best"):
        if k in tree:
            out[k] = tree[k]
    return out


def main():
    src, dst = sys.argv[1], sys.argv[2]
    tree = load_checkpoint(src)
    slim = slim_tree(tree)
    if osp.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(osp.dirname(osp.abspath(dst)), exist_ok=True)
    save_checkpoint(dst, slim)
    du = sum(
        osp.getsize(osp.join(r, f))
        for r, _, fs in os.walk(dst) for f in fs
    )
    print(f"[slim_ckpt] {src} -> {dst} ({du / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
