#!/bin/bash
# Opportunistic 1.6M-doc scaling study: runs ONLY if a quiet-enough
# window appears (pure-CPU probe efficiency >= 0.6 AND 2-thread
# baseline < 27 s); otherwise gives up — a storm-time 1.6M study
# costs ~45 min and proves nothing. The amortization argument it
# would confirm is laid out arithmetically in BASELINE.md round-4.
cd /root/repo
log=/tmp/scaling_gate_r4.log
echo "=== 1.6M watcher start $(date -u +%H:%M:%S) ===" >> "$log"
for i in $(seq 1 10); do
  probe=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
  echo "1p6 attempt $i probe: $probe" >> "$log"
  ok=$(echo "$probe" | python3 -c "
import json,sys
p=json.load(sys.stdin)
print(1 if p['best_efficiency']>=0.6 and min(p['t_low'])<27 else 0)" 2>/dev/null)
  if [ "$ok" = "1" ]; then
    echo "PHASE measuring-1.6M" >> "$log"
    SCALING_LOW=2 SCALING_HIGH=8 SCALING_N_DOCS=1600000 SCALING_REPS=2 \
      SCALING_OUT=BENCH/SCALING_2v8_r4_1p6M.md python tools/scaling_bench.py >> "$log" 2>&1
    probe_end=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
    {
      echo ""
      echo "## Contemporaneous host-capacity probes (2->8 pure CPU)"
      echo ""
      echo '```'
      echo "pre:  $probe"
      echo "post: $probe_end"
      echo '```'
    } >> BENCH/SCALING_2v8_r4_1p6M.md
    echo DONE-1p6M >> "$log"
    exit 0
  fi
  sleep 200
done
echo "GAVE-UP-1p6M (no quiet window)" >> "$log"
