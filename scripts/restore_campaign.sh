#!/bin/bash
# Restore campaign stage checkpoints + token caches from the git-tracked
# archive (campaign_ckpts/) after a machine reset wiped the gitignored
# artifact trees.  Idempotent; used by run_campaign.sh and eval_campaign.sh.
#
# Copies are ATOMIC (cp to a sibling temp dir, then mv): an interrupted
# restore never leaves a partial models/final that downstream consumers
# would treat as a complete checkpoint (ADVICE r4).
#
# NOTE — forcing a stage retrain: deleting experiments/<stage>/models/final
# alone is NOT enough; this restore would silently copy the archived weights
# back and run_campaign.sh would skip the stage.  Delete BOTH the
# experiments final and campaign_ckpts/<stage> (and any
# refs/campaign/inflight-<stage> ref).
set -eu
cd "$(dirname "$0")/.."

STAGES="parsing_token_campaign vqvae_top_campaign vqvae_bottom_campaign \
sampler_campaign index_pred_campaign parsing_gen_campaign"

atomic_restore() { # atomic_restore <src> <dst>
    local src=$1 dst=$2 tmp
    mkdir -p "$(dirname "$dst")"
    tmp=$(mktemp -d -p "$(dirname "$dst")" .restore.XXXXXX)
    cp -r "$src/." "$tmp/"
    mv -T "$tmp" "$dst"
}

for s in $STAGES; do
    if [ ! -d "experiments/$s/models/final" ] && [ -d "campaign_ckpts/$s" ]; then
        atomic_restore "campaign_ckpts/$s" "experiments/$s/models/final"
        echo "[restore] $s: final restored from campaign_ckpts/"
    fi
    # mid-stage progress archived by scripts/inflight_archive.sh: restore it
    # only when the stage has no final anywhere (archive nor experiments) and
    # no periodic checkpoints survived — run_campaign.sh then resumes it
    if [ ! -d "experiments/$s/models/final" ] && [ ! -d "campaign_ckpts/$s" ] \
        && ! ls "experiments/$s/models"/* >/dev/null 2>&1 \
        && git rev-parse -q --verify "refs/campaign/inflight-$s" >/dev/null; then
        ep=$(git cat-file -p "refs/campaign/inflight-$s:EPOCH")
        # atomic like atomic_restore: an interrupted extract must not leave
        # a partial models/<ep> that poisons the --resume path
        mkdir -p "experiments/$s/models"
        rm -rf "experiments/$s/models"/.restore.* 2>/dev/null
        tmp=$(mktemp -d -p "experiments/$s/models" .restore.XXXXXX)
        git archive "refs/campaign/inflight-$s" ckpt \
            | tar -x --strip-components=1 -C "$tmp"
        mv -T "$tmp" "experiments/$s/models/$ep"
        echo "[restore] $s: in-flight epoch $ep restored from refs/campaign/inflight-$s"
    fi
done

if [ ! -d token_cache_campaign ] && [ -d campaign_ckpts/token_cache ]; then
    atomic_restore campaign_ckpts/token_cache token_cache_campaign
    echo "[restore] token cache restored from campaign_ckpts/"
fi

if [ ! -d token_cache_ip_campaign ] && [ -d campaign_ckpts/token_cache_ip ]; then
    atomic_restore campaign_ckpts/token_cache_ip token_cache_ip_campaign
    echo "[restore] index-pred token cache restored from campaign_ckpts/"
fi

if [ ! -d checkpoints/campaign_pipeline ] && [ -d campaign_ckpts/pipeline ]; then
    atomic_restore campaign_ckpts/pipeline checkpoints/campaign_pipeline
    echo "[restore] assembled pipeline restored from campaign_ckpts/"
fi
