#!/bin/bash
# Round-4 probe-gated scaling studies (BASELINE.json north rule:
# efficiency >= 0.8 from N to 4N, sandbox proxy local[2] -> local[8]).
# Double-gated quiet window (efficiency AND fast 2-thread baseline),
# then: 400k-doc study (3 reps) + 1.6M-doc study (2 reps) — the
# second evidences amortization of the build's fixed overhead.
cd /root/repo
log=/tmp/scaling_gate_r4.log
: > "$log"
for i in $(seq 1 12); do  # v2: 5-min sleeps
  probe=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
  echo "attempt $i probe: $probe" >> "$log"
  ok=$(echo "$probe" | python3 -c "
import json,sys
p=json.load(sys.stdin)
print(1 if p['best_efficiency']>=0.65 and min(p['t_low'])<23.5 else 0)" 2>/dev/null)
  [ "$ok" = "1" ] && break
  sleep 300
done
probe_400k=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 2 2>/dev/null | tail -1)
echo "pre-400k probe: $probe_400k" >> "$log"
echo "PHASE measuring-400k" >> "$log"
SCALING_LOW=2 SCALING_HIGH=8 SCALING_N_DOCS=400000 SCALING_REPS=3 \
  SCALING_OUT=BENCH/SCALING_2v8_r4.md python tools/scaling_bench.py >> "$log" 2>&1
probe_1p6=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
echo "pre-1.6M probe: $probe_1p6" >> "$log"
echo "PHASE measuring-1.6M" >> "$log"
SCALING_LOW=2 SCALING_HIGH=8 SCALING_N_DOCS=1600000 SCALING_REPS=2 \
  SCALING_OUT=BENCH/SCALING_2v8_r4_1p6M.md python tools/scaling_bench.py >> "$log" 2>&1
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
