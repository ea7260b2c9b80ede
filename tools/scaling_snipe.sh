#!/bin/bash
# Snipe single scaling children into the tightest quiet-load windows.
# One child per window (≈1-3 min exposure), alternating 32/8; results
# merge into BENCH_SCALING_STATE.json via bench.py --child.
cd /root/repo
RUNS=0
MAX_RUNS=${MAX_RUNS:-8}
DEADLINE=$(( $(date +%s) + ${SNIPE_SECONDS:-5400} ))
NEXT=32
while [ $RUNS -lt $MAX_RUNS ] && [ "$(date +%s)" -lt $DEADLINE ]; do
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  OK=$(python3 -c "print(1 if $LOAD < 1.5 else 0)")
  if [ "$OK" = "1" ]; then
    echo "$(date +%T) load=$LOAD — child $NEXT (run $((RUNS+1))/$MAX_RUNS)"
    python bench.py --child $NEXT 2>/dev/null | grep CHILD_RESULT
    RUNS=$((RUNS+1))
    if [ "$NEXT" = "32" ]; then NEXT=8; else NEXT=32; fi
    sleep 20
  else
    sleep 30
  fi
done
echo "snipe done: $RUNS runs"
python3 -c "import json; d=json.load(open('BENCH_SCALING_STATE.json')); print('best:', d['best'], 'cpu:', d.get('best_cpu'))"
