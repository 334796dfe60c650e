#!/bin/bash
# Restore campaign stage checkpoints + token cache from the git-tracked
# archive (campaign_ckpts/) after a machine reset wiped the gitignored
# artifact trees.  Idempotent; used by run_campaign.sh and eval_campaign.sh.
set -u
cd "$(dirname "$0")/.."

STAGES="parsing_token_campaign vqvae_top_campaign vqvae_bottom_campaign \
sampler_campaign index_pred_campaign parsing_gen_campaign"

for s in $STAGES; do
    if [ ! -d "experiments/$s/models/final" ] && [ -d "campaign_ckpts/$s" ]; then
        mkdir -p "experiments/$s/models"
        cp -r "campaign_ckpts/$s" "experiments/$s/models/final"
        echo "[restore] $s: final restored from campaign_ckpts/"
    fi
done

if [ ! -d token_cache_campaign ] && [ -d campaign_ckpts/token_cache ]; then
    cp -r campaign_ckpts/token_cache token_cache_campaign
    echo "[restore] token cache restored from campaign_ckpts/"
fi

if [ ! -d checkpoints/campaign_pipeline ] && [ -d campaign_ckpts/pipeline ]; then
    mkdir -p checkpoints
    cp -r campaign_ckpts/pipeline checkpoints/campaign_pipeline
    echo "[restore] assembled pipeline restored from campaign_ckpts/"
fi
