#!/bin/bash
# Sustained-hardware training campaign (VERDICT r3 task 1): all six jobs at
# full network dims on the real TPU chip, sequentially, via the real CLIs.
#
#   parsing_token -> vqvae_top -> vqvae_bottom -> tokenize (sampler + ip)
#   -> sampler (SIGTERM mid-run + --resume, on hardware) -> index_pred
#   -> parsing_gen -> eval_campaign.sh (assemble + quality sweep)
#
# Stages are skipped when their models/final checkpoint already exists, so
# the script is resumable.  The token caches are rebuilt whenever their
# fingerprints no longer match the (re)trained tokenizers — cli/train.py's
# guard would reject a stale cache anyway.
#
# Forcing a stage retrain: delete BOTH experiments/<stage>/models/final and
# campaign_ckpts/<stage> (restore_campaign.sh resurrects the archive
# otherwise) plus any refs/campaign/inflight-<stage> ref.
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

# Training runs niced so concurrently-running host-CPU work (the driver's
# multichip dryrun, the test suite) is never starved by data-loader threads
# (VERDICT r4 weak #1: the r4 dryrun timed out under campaign load).
TRAIN="nice -n 10 python -m text2human_tpu.cli.train"

STAGES="parsing_token_campaign vqvae_top_campaign vqvae_bottom_campaign \
sampler_campaign index_pred_campaign parsing_gen_campaign"

final() { [ -d "experiments/$1/models/final" ]; }

# Background watcher: every 3 min, snapshot the newest periodic checkpoint
# of whatever stage is mid-flight into its refs/campaign/inflight-<stage>
# ref (bounded: in-place ref update, scripts/inflight_archive.sh).  A
# machine reset mid-stage now loses at most one val_freq worth of epochs.
(
    while true; do
        sleep 180
        for s in $STAGES; do
            [ -d "experiments/$s/models/final" ] && continue
            bash scripts/inflight_archive.sh "$s" \
                >> campaign_logs/inflight.log 2>&1
        done
    done
) &
WATCHER=$!
trap 'kill $WATCHER 2>/dev/null' EXIT

commit_archive() { # commit_archive <path> <message>; retries index.lock races
    # per-file size guard (ADVICE r4): a single blob over 500 MB would be
    # unpushable to any GitHub remote — keep it on disk only, loudly
    local big
    big=$(find "$1" -type f -size +500M | head -1)
    if [ -n "$big" ]; then
        echo "[campaign] WARNING: NOT committing $1 ($big exceeds 500 MB)"
        return 0
    fi
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
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/slim_ckpt.py \
        "experiments/$name/models/final" "campaign_ckpts/$name" || return 1
    rm -rf "experiments/$name/models/final"
    cp -r "campaign_ckpts/$name" "experiments/$name/models/final"
    # the stage is complete: its in-flight snapshot ref is superseded
    git update-ref -d "refs/campaign/inflight-$name" 2>/dev/null || true
    commit_archive "campaign_ckpts/$name" \
        "Campaign: archive $name final checkpoint (reset-proof)"
}

. "$(dirname "$0")/watchdog.sh"

stage() { # stage <name> <config> [extra args...]
    local name=$1 cfg=$2; shift 2
    if final "$name"; then echo "[campaign] $name: final exists, skip"; return 0; fi
    local attempt rc
    for attempt in 1 2 3; do
        # A preemption/periodic checkpoint without final => the stage was
        # killed mid-run (driving session died, or the watchdog fired):
        # resume it instead of wiping.
        local extra=""
        if ls "experiments/$name/models"/* >/dev/null 2>&1; then
            extra="--resume"
            echo "[campaign] $name: resuming from preemption checkpoint"
        elif [ "$attempt" = 1 ]; then
            rm -rf "experiments/$name"
        fi
        echo "[campaign] $name: start (attempt $attempt) $(date -u +%H:%M:%S)"
        _run_with_watchdog "campaign_logs/$name.log" \
            $TRAIN -opt "$cfg" --fixture $extra "$@"
        rc=$?
        echo "[campaign] $name: done rc=$rc $(date -u +%H:%M:%S)"
        [ "$rc" -ne 99 ] && return $rc
        echo "[campaign] $name: stalled, retrying"
    done
    echo "[campaign] $name: giving up after 3 stalled attempts"
    return 99
}

# cache_fresh <cache_dir> <key:path> [...]: exit 0 iff the cache exists,
# BOTH splits are complete (a build killed between the train and val writes
# must not pass), and every recorded checkpoint fingerprint matches the
# current on-disk one.  CPU-pinned + plugin-skipped: this must never block
# on the device tunnel.
cache_fresh() {
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python - "$@" <<'EOF'
import json, sys
sys.path.insert(0, ".")
from text2human_tpu.data.token_cache import checkpoint_fingerprint
cache = sys.argv[1]
try:
    paths = dict(a.split(":", 1) for a in sys.argv[2:])
    for split in ("train", "val"):
        meta = json.load(open(f"{cache}/{split}/meta.json"))
        for key, rec in meta["checkpoints"].items():
            if checkpoint_fingerprint(paths[key])["sha256"] != rec["sha256"]:
                sys.exit(1)
except Exception:
    sys.exit(1)
EOF
}

archive_cache() { # archive_cache <cache_dir> <archive_name>
    local CACHE_MB
    CACHE_MB=$(du -sm "$1" | cut -f1)
    if [ "$CACHE_MB" -le 500 ]; then
        rm -rf "campaign_ckpts/$2"
        mkdir -p campaign_ckpts
        cp -r "$1" "campaign_ckpts/$2"
        commit_archive "campaign_ckpts/$2" \
            "Campaign: archive $2 (${CACHE_MB} MB, reset-proof)"
    else
        echo "[campaign] $1 ${CACHE_MB} MB: too big to archive"
    fi
}

stage parsing_token_campaign configs/campaign/parsing_token_campaign.yml || exit 1
archive parsing_token_campaign || exit 1
stage vqvae_top_campaign     configs/campaign/vqvae_top_campaign.yml     || exit 1
archive vqvae_top_campaign || exit 1
stage vqvae_bottom_campaign  configs/campaign/vqvae_bottom_campaign.yml  || exit 1
archive vqvae_bottom_campaign || exit 1

# Sampler token cache: rebuild unless fingerprints match the tokenizers.
if ! cache_fresh token_cache_campaign \
        img_ae_path:experiments/vqvae_top_campaign/models/final \
        segm_ae_path:experiments/parsing_token_campaign/models/final; then
    echo "[campaign] sampler token cache stale/missing: rebuilding $(date -u +%H:%M:%S)"
    rm -rf token_cache_campaign
    _run_with_watchdog campaign_logs/tokenize.log \
        nice -n 5 python -m text2human_tpu.cli.tokenize \
        -opt configs/campaign/sampler_campaign.yml --fixture \
        --out token_cache_campaign || exit 1
    archive_cache token_cache_campaign token_cache
else
    echo "[campaign] sampler token cache fingerprints match, reuse"
fi

# Index-pred token cache (VERDICT r4 weak #3): the uncached stage re-ran two
# frozen full-res VQGAN encoders per step over host-fed pixels — 6-11 s/step,
# hours of ETA, three dead campaigns.  Cached, the stage trains from
# [32,16] integer maps in minutes.
if ! cache_fresh token_cache_ip_campaign \
        top_vae_path:experiments/vqvae_top_campaign/models/final \
        bot_vae_path:experiments/vqvae_bottom_campaign/models/final; then
    echo "[campaign] index-pred token cache stale/missing: rebuilding $(date -u +%H:%M:%S)"
    rm -rf token_cache_ip_campaign
    _run_with_watchdog campaign_logs/tokenize_ip.log \
        nice -n 5 python -m text2human_tpu.cli.tokenize \
        -opt configs/campaign/index_pred_campaign.yml --fixture \
        --out token_cache_ip_campaign || exit 1
    archive_cache token_cache_ip_campaign token_cache_ip
else
    echo "[campaign] index-pred token cache fingerprints match, reuse"
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
    # bounded wait: a wedged backend never runs the SIGTERM checkpoint
    # handler (the process is stuck in a native call) — don't hang forever
    for _ in $(seq 1 60); do
        kill -0 "$SPID" 2>/dev/null || break
        sleep 10
    done
    kill -9 "$SPID" 2>/dev/null
    wait "$SPID"
    if ! final sampler_campaign; then
        echo "[campaign] sampler: --resume at $(date -u +%H:%M:%S)"
        _run_with_watchdog campaign_logs/sampler.log \
            $TRAIN -opt configs/campaign/sampler_campaign.yml --fixture \
            --resume || exit 1
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
# The eval exit code IS the campaign exit code (ADVICE r4): a run that
# produced no assembled pipeline or sweep evidence must not look green.
bash scripts/eval_campaign.sh >> campaign_logs/eval.log 2>&1
rc=$?
echo "[campaign] eval done rc=$rc $(date -u +%H:%M:%S)"
exit $rc
