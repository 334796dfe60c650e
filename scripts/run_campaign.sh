#!/bin/bash
# Sustained-hardware training campaign (VERDICT r3 task 1): all six jobs at
# full network dims on the real TPU chip, sequentially, via the real CLIs.
#
#   parsing_token -> vqvae_top -> vqvae_bottom -> tokenize -> sampler
#   (SIGTERM mid-run + --resume, on hardware) -> index_pred -> parsing_gen
#
# Stages are skipped when their models/final checkpoint already exists, so
# the script is resumable.  The token cache is rebuilt whenever its
# fingerprints no longer match the (re)trained tokenizers — cli/train.py's
# guard would reject a stale cache anyway.
#
# Usage: nohup bash scripts/run_campaign.sh > campaign_logs/driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p campaign_logs

# The build machine is reset between rounds, wiping gitignored trees
# (docs/CAMPAIGN.md lost two full runs this way).  Completed stages are
# archived params-only into the git-tracked campaign_ckpts/ and committed,
# so a fresh machine resumes where the last one died.
bash scripts/restore_campaign.sh

TRAIN="python -m text2human_tpu.cli.train"
final() { [ -d "experiments/$1/models/final" ]; }

commit_archive() { # commit_archive <path> <message>; retries index.lock races
    for i in 1 2 3 4 5 6 7 8 9 10; do
        if git add "$1" && git commit -m "$2" -- "$1" >/dev/null; then
            echo "[campaign] committed $1"
            return 0
        fi
        sleep 5
    done
    echo "[campaign] WARNING: could not commit $1"
    return 1
}

archive() { # archive <stage>: slim the final ckpt into campaign_ckpts/ and
    # swap the on-disk final for the slim copy, so the token cache's sha256
    # fingerprint of the tokenizer dirs is identical on this machine and on
    # any future machine that restores from the archive.
    local name=$1
    [ -d "campaign_ckpts/$name" ] && return 0
    JAX_PLATFORMS=cpu python scripts/slim_ckpt.py \
        "experiments/$name/models/final" "campaign_ckpts/$name" || return 1
    rm -rf "experiments/$name/models/final"
    cp -r "campaign_ckpts/$name" "experiments/$name/models/final"
    commit_archive "campaign_ckpts/$name" \
        "Campaign: archive $name final checkpoint (reset-proof)"
}

stage() { # stage <name> <config> [extra args...]
    local name=$1 cfg=$2; shift 2
    if final "$name"; then echo "[campaign] $name: final exists, skip"; return 0; fi
    # A preemption/periodic checkpoint without final => the stage was killed
    # mid-run (e.g. the driving session died): resume it instead of wiping.
    local extra=""
    if ls "experiments/$name/models"/* >/dev/null 2>&1; then
        extra="--resume"
        echo "[campaign] $name: resuming from preemption checkpoint"
    else
        rm -rf "experiments/$name"
    fi
    echo "[campaign] $name: start $(date -u +%H:%M:%S)"
    $TRAIN -opt "$cfg" --fixture $extra "$@" >> "campaign_logs/$name.log" 2>&1
    local rc=$?
    echo "[campaign] $name: done rc=$rc $(date -u +%H:%M:%S)"
    return $rc
}

stage parsing_token_campaign configs/campaign/parsing_token_campaign.yml || exit 1
archive parsing_token_campaign || exit 1
stage vqvae_top_campaign     configs/campaign/vqvae_top_campaign.yml     || exit 1
archive vqvae_top_campaign || exit 1
stage vqvae_bottom_campaign  configs/campaign/vqvae_bottom_campaign.yml  || exit 1
archive vqvae_bottom_campaign || exit 1

# Token cache: rebuild unless a cache exists whose fingerprints match the
# current tokenizer checkpoints (python exit 0 = match).
if ! python - <<'EOF'
import json, sys
sys.path.insert(0, ".")
from text2human_tpu.data.token_cache import checkpoint_fingerprint
try:
    meta = json.load(open("token_cache_campaign/train/meta.json"))
    for key, rec in meta["checkpoints"].items():
        path = {"img_ae_path": "experiments/vqvae_top_campaign/models/final",
                "segm_ae_path": "experiments/parsing_token_campaign/models/final"}[key]
        if checkpoint_fingerprint(path)["sha256"] != rec["sha256"]:
            sys.exit(1)
except Exception:
    sys.exit(1)
EOF
then
    echo "[campaign] token cache stale/missing: rebuilding $(date -u +%H:%M:%S)"
    rm -rf token_cache_campaign
    python -m text2human_tpu.cli.tokenize \
        -opt configs/campaign/sampler_campaign.yml --fixture \
        --out token_cache_campaign >> campaign_logs/tokenize.log 2>&1 || exit 1
    # archive the cache too when it is small enough to live in git (pure
    # integer token fields; rebuild costs ~40 min of chip time per reset)
    CACHE_MB=$(du -sm token_cache_campaign | cut -f1)
    if [ "$CACHE_MB" -le 500 ]; then
        rm -rf campaign_ckpts/token_cache
        mkdir -p campaign_ckpts
        cp -r token_cache_campaign campaign_ckpts/token_cache
        commit_archive campaign_ckpts/token_cache \
            "Campaign: archive token cache (${CACHE_MB} MB, reset-proof)"
    else
        echo "[campaign] token cache ${CACHE_MB} MB: too big to archive"
    fi
else
    echo "[campaign] token cache fingerprints match, reuse"
fi

# Sampler: fresh start, SIGTERM after 6 minutes (mid-run preemption on
# hardware), then --resume to completion — VERDICT r3 task 1.
if ! final sampler_campaign; then
    echo "[campaign] sampler_campaign: start $(date -u +%H:%M:%S)"
    rm -rf experiments/sampler_campaign
    $TRAIN -opt configs/campaign/sampler_campaign.yml --fixture \
        >> campaign_logs/sampler.log 2>&1 &
    SPID=$!
    sleep 360
    if kill -0 "$SPID" 2>/dev/null; then
        echo "[campaign] sampler: SIGTERM preemption at $(date -u +%H:%M:%S)"
        kill -TERM "$SPID"
    fi
    wait "$SPID"
    if ! final sampler_campaign; then
        echo "[campaign] sampler: --resume at $(date -u +%H:%M:%S)"
        $TRAIN -opt configs/campaign/sampler_campaign.yml --fixture --resume \
            >> campaign_logs/sampler.log 2>&1 || exit 1
    fi
    echo "[campaign] sampler_campaign: done $(date -u +%H:%M:%S)"
fi
archive sampler_campaign || exit 1

stage index_pred_campaign  configs/campaign/index_pred_campaign.yml  || exit 1
archive index_pred_campaign || exit 1
stage parsing_gen_campaign configs/campaign/parsing_gen_campaign.yml || exit 1
archive parsing_gen_campaign || exit 1

echo "[campaign] ALL STAGES COMPLETE $(date -u +%H:%M:%S)"

# Chain straight into assembly + the quality-vs-steps sweep so an unattended
# background run delivers the full VERDICT task-1+3 evidence in one go.
bash scripts/eval_campaign.sh >> campaign_logs/eval.log 2>&1
echo "[campaign] eval done rc=$? $(date -u +%H:%M:%S)"
