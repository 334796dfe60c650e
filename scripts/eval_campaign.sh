#!/bin/bash
# Post-campaign evaluation (VERDICT r3 tasks 1+3): assemble the six
# natively trained campaign checkpoints into one pipeline checkpoint, then
# sweep decode schedules on it for the quality-vs-steps table.
# Run after scripts/run_campaign.sh prints ALL STAGES COMPLETE.
set -eu
cd "$(dirname "$0")/.."

bash scripts/restore_campaign.sh

for s in parsing_token vqvae_top vqvae_bottom sampler index_pred parsing_gen; do
    [ -d "experiments/${s}_campaign/models/final" ] || {
        echo "missing experiments/${s}_campaign/models/final"; exit 1; }
done

# timeouts: the tunneled backend can wedge (docs/CAMPAIGN.md r5
# incident); a bounded failure beats hanging the whole campaign
timeout 1200 python -m text2human_tpu.cli.convert assemble-pipeline \
    --top experiments/vqvae_top_campaign/models/final \
    --bottom experiments/vqvae_bottom_campaign/models/final \
    --segm experiments/parsing_token_campaign/models/final \
    --sampler experiments/sampler_campaign/models/final \
    --index-pred experiments/index_pred_campaign/models/final \
    --parsing-gen experiments/parsing_gen_campaign/models/final \
    --out checkpoints/campaign_pipeline

# quality-vs-steps on the TRAINED model (held-out fixture parsings start at
# offset 2048, past the campaign's train split)
timeout 3600 python -m text2human_tpu.cli.evaluate sweep-steps \
    -opt configs/sample_from_parsing.yml \
    --ckpt checkpoints/campaign_pipeline \
    --decodes absorbing:256 maskgit:64 maskgit:32 maskgit:16 \
    --batch 8 --num-batches 2 \
    --out campaign_logs/sweep_steps.json \
    --save-grid campaign_logs/sweep_grid.png

# Archive the assembled pipeline so bench.py finds trained weights on any
# future machine (checkpoints/ is gitignored and machine resets wipe it).
# Skip the recommit when the assembled weights are byte-identical to the
# existing archive (ADVICE r4: every eval rerun was adding the full blob
# size to git history).
if [ -d campaign_ckpts/pipeline ] && JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    python - <<'EOF'
import sys
sys.path.insert(0, ".")
from text2human_tpu.data.token_cache import checkpoint_fingerprint
a = checkpoint_fingerprint("checkpoints/campaign_pipeline")
b = checkpoint_fingerprint("campaign_ckpts/pipeline")
sys.exit(0 if a["sha256"] == b["sha256"] else 1)
EOF
then
    echo "[eval] assembled pipeline unchanged, archive kept as-is"
else
    rm -rf campaign_ckpts/pipeline
    mkdir -p campaign_ckpts
    cp -r checkpoints/campaign_pipeline campaign_ckpts/pipeline
    for i in 1 2 3 4 5; do
        git add campaign_ckpts/pipeline \
        && git commit -m "Campaign: archive assembled pipeline" \
            -- campaign_ckpts/pipeline >/dev/null && break
        sleep 5
    done
fi

# The sweep evidence is committed UNCONDITIONALLY: a rerun can produce new
# sweep results on unchanged weights (different --decodes, a first success
# after a failed attempt), and a machine reset must not wipe the only copy.
for i in 1 2 3 4 5; do
    git add campaign_logs/sweep_steps.json campaign_logs/sweep_grid.png \
    && git commit -m "Campaign: quality-vs-steps sweep results" \
        -- campaign_logs/sweep_steps.json campaign_logs/sweep_grid.png \
        >/dev/null && break
    # "nothing to commit" (unchanged sweep) is fine — stop retrying
    git diff --cached --quiet -- campaign_logs/sweep_steps.json \
        campaign_logs/sweep_grid.png && break
    sleep 5
done

echo "[eval] done: checkpoints/campaign_pipeline + campaign_logs/sweep_steps.json"
