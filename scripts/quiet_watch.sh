#!/bin/bash
# Quiet-window watcher: probe the host's memory-bandwidth N->4N scaling
# every POLL seconds; when two consecutive probes clear THRESH, launch
# the full pairs scaling bench and exit.  Rationale: the build's
# tokenize stage is bandwidth-bound, so its scaling efficiency is
# bounded by the host's current bandwidth headroom — measuring during
# a neighbor's bandwidth storm reports the neighbor, not the software.
set -u
POLL=${POLL:-600}
THRESH=${THRESH:-0.55}
OUT=${OUT:-/tmp/quiet_watch.log}
streak=0
while true; do
  eff=$(python - <<'EOF'
import multiprocessing as mp, time
import numpy as np
def burn_mem(n):
    a = np.zeros(64_000_000, dtype=np.uint8)
    s = 0
    for _ in range(n):
        s += int(a.copy()[0])
    return s
def bench(procs):
    with mp.Pool(procs) as p:
        p.map(burn_mem, [2]*procs)
        t0 = time.time(); p.map(burn_mem, [8]*16)
        return time.time()-t0
# interleave legs and take best-of-2 per leg: a single-sample ratio
# whipsaws (measured 0.06..1.85 within minutes) when the bus load
# changes BETWEEN the two legs of one sample
t2 = min(bench(2), bench(2)); t8 = min(bench(8), bench(8))
t2 = min(t2, bench(2)); t8 = min(t8, bench(8))
print(round(t2/t8/4, 3))
EOF
)
  echo "$(date +%H:%M:%S) mem-scaling-eff $eff (streak $streak)" >> "$OUT"
  ok=$(python -c "print(1 if $eff >= $THRESH else 0)")
  if [ "$ok" = "1" ]; then
    streak=$((streak+1))
  else
    streak=0
  fi
  if [ "$streak" -ge 2 ]; then
    echo "$(date +%H:%M:%S) quiet window detected -> running pairs bench" >> "$OUT"
    cd /root/repo && BENCH_PAGES=${BENCH_PAGES:-240000} \
      python scripts/bench_scaling.py --n 2 --pairs ${PAIRS:-3} \
      > /tmp/scaling_quiet.log 2>&1
    echo "$(date +%H:%M:%S) bench done exit=$?" >> "$OUT"
    exit 0
  fi
  sleep "$POLL"
done
