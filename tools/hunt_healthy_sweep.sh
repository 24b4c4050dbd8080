#!/bin/bash
# Hunt a healthy-window sweep: poll a single-core CPU canary; when the host
# reads calm, run a queries-only bench sweep and keep each result with its
# health tag. Stops after <rounds> sweeps or when one is tagged healthy.
# Usage: tools/hunt_healthy_sweep.sh <outdir> <rounds>
OUT=$1; ROUNDS=$2
cd "$(dirname "$0")/.." || exit 1
mkdir -p "$OUT"
for r in $(seq 1 "$ROUNDS"); do
  while :; do
    T=$(python3 -c "
import time
t0=time.time()
s=0
for i in range(3*10**6): s+=i*i
print('%.2f'%(time.time()-t0))")
    echo "canary $T $(date +%H:%M:%S)" >> "$OUT/hunt.log"
    awk -v t="$T" 'BEGIN{exit !(t<0.70)}' && break
    sleep 60
  done
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_BUDGET_MIN=1 SPARK_GRAFT_REPEATS=1 \
    tools/run.sh graft.Bench > "$OUT/sweep_$r.json" 2>/dev/null
  H=$(python3 -c "
import json
d=json.load(open('$OUT/sweep_$r.json'))
print(d.get('sweep_health'), round(d['value'],1))")
  echo "sweep_$r: $H" >> "$OUT/hunt.log"
  case "$H" in healthy*) echo FOUND >> "$OUT/hunt.log"; break;; esac
done
echo DONE >> "$OUT/hunt.log"
