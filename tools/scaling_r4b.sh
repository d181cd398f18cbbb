#!/bin/bash
# Round-4 scaling watcher v3: wait for a double-gated quiet window
# (pure-CPU 2->8 efficiency >= 0.65 AND un-crushed 2-thread baseline
# t_low < 23.5 s). Quiet -> full plan (400k x3 reps + 1.6M x2 reps).
# Never quiet within the budget -> reduced forced run (400k x2 reps
# only, probes recorded) so a co-tenant storm can't eat the round.
cd /root/repo
log=/tmp/scaling_gate_r4.log
echo "=== watcher v3 start $(date -u +%H:%M:%S) ===" >> "$log"
quiet=0
for i in $(seq 1 14); do
  probe=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
  echo "v3 attempt $i probe: $probe" >> "$log"
  ok=$(echo "$probe" | python3 -c "
import json,sys
p=json.load(sys.stdin)
print(1 if p['best_efficiency']>=0.65 and min(p['t_low'])<23.5 else 0)" 2>/dev/null)
  if [ "$ok" = "1" ]; then quiet=1; break; fi
  sleep 240
done
probe_400k=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
echo "pre-400k probe: $probe_400k  (quiet=$quiet)" >> "$log"
echo "PHASE measuring-400k" >> "$log"
if [ "$quiet" = "1" ]; then REPS=3; else REPS=2; fi
SCALING_LOW=2 SCALING_HIGH=8 SCALING_N_DOCS=400000 SCALING_REPS=$REPS \
  SCALING_OUT=BENCH/SCALING_2v8_r4.md python tools/scaling_bench.py >> "$log" 2>&1
probe_1p6=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
echo "pre-1.6M probe: $probe_1p6" >> "$log"
ok2=$(echo "$probe_1p6" | python3 -c "
import json,sys
p=json.load(sys.stdin)
print(1 if p['best_efficiency']>=0.6 and min(p['t_low'])<27 else 0)" 2>/dev/null)
if [ "$quiet" = "1" ] || [ "$ok2" = "1" ]; then
  echo "PHASE measuring-1.6M" >> "$log"
  SCALING_LOW=2 SCALING_HIGH=8 SCALING_N_DOCS=1600000 SCALING_REPS=2 \
    SCALING_OUT=BENCH/SCALING_2v8_r4_1p6M.md python tools/scaling_bench.py >> "$log" 2>&1
else
  echo "SKIPPED 1.6M study (storm persisted; probes recorded)" >> "$log"
fi
probe_end=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
echo "post probe: $probe_end" >> "$log"
for f in BENCH/SCALING_2v8_r4.md BENCH/SCALING_2v8_r4_1p6M.md; do
  [ -f "$f" ] || continue
  {
    echo ""
    echo "## Contemporaneous host-capacity probes (tools/cpu_probe.py, 2->8, pure CPU, no Spark)"
    echo ""
    echo '```'
    echo "pre-400k:  $probe_400k"
    echo "pre-1.6M:  $probe_1p6"
    echo "post:      $probe_end"
    echo '```'
  } >> "$f"
done
echo DONE >> "$log"
