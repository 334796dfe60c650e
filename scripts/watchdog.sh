# _run_with_watchdog <logfile> <cmd...> — run cmd appending to logfile; kill
# it and return 99 when the log stops advancing for CAMPAIGN_STALL_S seconds
# (default 900).  Sourced by scripts/run_campaign.sh; kept in its own file so
# tests can exercise the stall path directly (tests/test_campaign_watchdog.py).
#
# Rationale: the tunneled device backend has wedged whole runs — a
# dispatched step's result simply never returns while the trainer sits at
# 0% CPU (docs/CAMPAIGN.md, r5 incident).  Progress is measured by log
# mtime; the train CLI logs its first-batch/init/dispatch phases, so even
# legitimate multi-minute remote compiles keep resetting the timer.
_run_with_watchdog() {
    local log=$1; shift
    local STALL_S=${CAMPAIGN_STALL_S:-900}
    local POLL_S=${CAMPAIGN_WATCHDOG_POLL_S:-30}
    "$@" >> "$log" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
        sleep "$POLL_S"
        local age
        age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
        if [ "$age" -ge "$STALL_S" ]; then
            echo "[campaign] WATCHDOG: no log progress for ${age}s, killing $pid"
            # SIGUSR1 first: dump the wedged stacks into the log for the record
            kill -USR1 "$pid" 2>/dev/null; sleep 5
            kill "$pid" 2>/dev/null; sleep 10
            kill -9 "$pid" 2>/dev/null
            wait "$pid" 2>/dev/null
            return 99
        fi
    done
    wait "$pid"
}
