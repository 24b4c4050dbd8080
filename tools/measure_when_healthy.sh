#!/bin/bash
# Canary-gated measurement: poll a single-core CPU canary; when the host
# reads healthy (loop under the threshold), run ProfileQuery for the given
# queries and append to the log. Repeats until max measurement rounds.
# Usage: tools/measure_when_healthy.sh <log> <rounds> <q1> [q2 ...]
LOG=$1; ROUNDS=$2; shift 2
QUERIES="$@"
cd "$(dirname "$0")/.." || exit 1
for r in $(seq 1 "$ROUNDS"); do
  while :; do
    T=$(python3 -c "
import time
t0=time.time()
s=0
for i in range(3*10**6): s+=i*i
print('%.2f'%(time.time()-t0))")
    echo "canary $T $(date +%H:%M:%S)" >> "$LOG"
    awk -v t="$T" 'BEGIN{exit !(t<0.70)}' && break
    sleep 45
  done
  echo "== measurement round $r (canary $T) ==" >> "$LOG"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PROFILE_RUNS=2 tools/run.sh \
    graft.ProfileQuery /root/testdata/sf0.1 $QUERIES 2>/dev/null \
    | grep "^==" >> "$LOG"
done
echo "DONE" >> "$LOG"
