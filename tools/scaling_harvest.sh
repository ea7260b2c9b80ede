#!/bin/bash
# Harvest least-contended scaling measurements: poll loadavg, run
# bench.py --scaling only when the host is quiet. Results merge into
# BENCH_SCALING_STATE.json (per-level best) via bench.py itself.
cd /root/repo
RUNS=0
MAX_RUNS=${MAX_RUNS:-5}
DEADLINE=$(( $(date +%s) + ${HARVEST_SECONDS:-7200} ))
while [ $RUNS -lt $MAX_RUNS ] && [ "$(date +%s)" -lt $DEADLINE ]; do
  LOAD=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
  if [ "$LOAD" -lt 3 ]; then
    echo "$(date +%T) load OK ($LOAD) — scaling run $((RUNS+1))/$MAX_RUNS"
    python bench.py --scaling 2>/dev/null
    RUNS=$((RUNS+1))
    sleep 60
  else
    sleep 45
  fi
done
echo "harvest done: $RUNS runs"
cat BENCH_SCALING_STATE.json | python -c "import json,sys; print(json.load(sys.stdin)['best'])"
