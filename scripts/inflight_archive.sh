#!/bin/bash
# Reset-proof IN-FLIGHT stage progress (VERDICT r4 weak #4).
#
# Slims the newest periodic (epoch-named) checkpoint of a *running* campaign
# stage and stores it as a git commit on ``refs/campaign/inflight-<stage>``.
# The ref is updated IN PLACE each call, so git growth stays bounded: the
# superseded commit/blobs become unreachable (prunable), and exactly one
# slim checkpoint per stage is ever reachable.  A temporary index + a
# detached work-tree keep this fully independent of the main index/HEAD —
# no race with concurrent ``git commit`` from the builder or archive().
#
# After a machine reset wipes the gitignored experiments/ tree,
# scripts/restore_campaign.sh extracts the ref back into
# ``experiments/<stage>/models/<epoch>`` and the stage resumes via
# ``--resume`` (cli/train.py's slim-resume path reinitializes only the
# optimizer moments).
#
# Usage: bash scripts/inflight_archive.sh <stage>   (no-op when there is
# nothing new to archive or the newest checkpoint is still being written)
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
stage=$1
models="experiments/$stage/models"
[ -d "$models" ] || exit 0
latest=$(ls -1 "$models" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
[ -n "${latest:-}" ] || exit 0
cur=$(git cat-file -p "refs/campaign/inflight-$stage:EPOCH" 2>/dev/null || true)
[ "$cur" = "$latest" ] && exit 0

tmp=$(mktemp -d)
idx="$REPO/.git/index.inflight.$stage"
trap 'rm -rf "$tmp" "$idx"' EXIT
# slim_ckpt fails loudly on a partially-written orbax dir: skip, retry later
if ! JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/slim_ckpt.py \
        "$models/$latest" "$tmp/ckpt" >/dev/null 2>&1; then
    echo "[inflight] $stage epoch $latest: checkpoint not readable yet, skip"
    exit 0
fi
echo "$latest" > "$tmp/EPOCH"
(
    cd "$tmp"
    export GIT_INDEX_FILE="$idx"
    rm -f "$idx"
    git --git-dir="$REPO/.git" --work-tree="$tmp" add -Af . || exit 1
    tree=$(git --git-dir="$REPO/.git" write-tree) || exit 1
    commit=$(git --git-dir="$REPO/.git" commit-tree "$tree" \
        -m "inflight $stage epoch $latest (reset-proof, ref-replaced)") || exit 1
    git --git-dir="$REPO/.git" update-ref "refs/campaign/inflight-$stage" "$commit"
) || exit 1
echo "[inflight] $stage epoch $latest -> refs/campaign/inflight-$stage ($(du -sm "$tmp/ckpt" | cut -f1) MB, in-place)"
