#!/bin/bash
# TPU-tunnel recovery watcher (ROUND2_NOTES /tmp/tpu_watch2.sh pattern,
# now committed per VERDICT r2 #3).  Probes the session health gate every
# PERIOD seconds; on the first healthy probe runs the full on-hardware
# artifact suite through record_tpu_run.sh (results land in
# docs/tpu_runs/) and exits.  Log: /tmp/tpu_watch.log.
#
# Usage: nohup scripts/tpu_watch.sh [period_s] [prefix] &
set -u
period=${1:-600}
prefix=${2:-r03}
repo=$(cd "$(dirname "$0")/.." && pwd)
log=/tmp/tpu_watch.log

probe() {
    # subprocess so a hung backend init can't wedge the watcher; the
    # gate itself threads + times out, belt and braces with `timeout`
    timeout 240 python -c "
from liquid_usrp_tpu.utils.tpu_session import session_healthy
import sys
sys.exit(0 if session_healthy(timeout_s=180, mode="real") else 1)" >>"$log" 2>&1
}

echo "[watch $(date -u +%FT%TZ)] start period=${period}s prefix=$prefix" >>"$log"
while true; do
    if probe; then
        echo "[watch $(date -u +%FT%TZ)] HEALTHY — running artifact suite" >>"$log"
        cd "$repo"
        bash scripts/record_tpu_run.sh "${prefix}_tpu_ci" \
            timeout 2400 python scripts/tpu_ci.py >>"$log" 2>&1
        bash scripts/record_tpu_run.sh "${prefix}_pallas_probe" \
            timeout 1800 python scripts/tpu_pallas_probe.py >>"$log" 2>&1
        bash scripts/record_tpu_run.sh "${prefix}_session_probe" \
            timeout 1800 python scripts/tpu_session_probe.py >>"$log" 2>&1
        bash scripts/record_tpu_run.sh "${prefix}_bench_all" \
            timeout 1800 python scripts/bench_all.py >>"$log" 2>&1
        bash scripts/record_tpu_run.sh "${prefix}_planar_stage" \
            timeout 2400 python scripts/planar_stage_probe.py >>"$log" 2>&1
        bash scripts/record_tpu_run.sh "${prefix}_bench" \
            timeout 2400 python bench.py >>"$log" 2>&1
        echo "[watch $(date -u +%FT%TZ)] suite done" >>"$log"
        touch /tmp/tpu_recovered
        exit 0
    fi
    echo "[watch $(date -u +%FT%TZ)] unhealthy; sleeping ${period}s" >>"$log"
    sleep "$period"
done
