#!/bin/bash
# Device-recovery watcher (docs/CAMPAIGN.md r5 incident): probe the tunneled
# device every 4 min; when it answers, relaunch the idempotent campaign
# driver (completed stages skip).  Logs every probe so an outage leaves an
# evidence trail.  Usage:
#   nohup bash scripts/recover_watch.sh >/dev/null 2>&1 & echo $! > /tmp/recover.pid
cd "$(dirname "$0")/.."
LOG=campaign_logs/driver.r5.log
echo "[recover] watcher start $(date -u +%H:%M:%S)" >> "$LOG"
n=0
while true; do
    if timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null; then
        echo "[recover] device back $(date -u +%H:%M:%S)" >> "$LOG"
        if [ -f /tmp/campaign_r5.pid ] && kill -0 "$(cat /tmp/campaign_r5.pid)" 2>/dev/null; then
            echo "[recover] campaign already running" >> "$LOG"
        else
            nohup bash scripts/run_campaign.sh >> "$LOG" 2>&1 &
            echo $! > /tmp/campaign_r5.pid
            echo "[recover] campaign relaunched pid $(cat /tmp/campaign_r5.pid)" >> "$LOG"
        fi
        exit 0
    fi
    n=$((n + 1))
    # hourly "still down" marks: 15 probes x ~(90s timeout + 240s sleep)
    if [ $((n % 11)) -eq 0 ]; then
        echo "[recover] device still down after $n probes $(date -u +%H:%M:%S)" >> "$LOG"
    fi
    sleep 240
done
