#!/bin/bash
# Probe-gated querylang scaling study: wait for a quiet host window
# (co-tenants cap pure-CPU 2->8 scaling on this VM), then run
# tools/querylang_scaling.py at 2 vs 8 cores and append the
# contemporaneous probe to the report. Always runs at least once.
cd /root/repo
LOG=/tmp/querylang_gate.log
: > "$LOG"
for i in $(seq 1 10); do
  probe=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
  echo "attempt $i probe: $probe" >> "$LOG"
  # DOUBLE gate (round-3 lesson): efficiency alone false-opens when a
  # storm inflates the 2-thread baseline.
  ok=$(echo "$probe" | python3 -c "
import json, sys
p = json.load(sys.stdin)
print(1 if p['best_efficiency'] >= 0.65 and min(p['t_low']) <= 26 else 0)")
  if [ "$ok" = "1" ]; then break; fi
  sleep 420
done
probe_full=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 2 2>/dev/null | tail -1)
echo "final probe: $probe_full" >> "$LOG"
OUT=${QL_OUT:-BENCH/QUERYLANG_SCALING_r5.md}
QL_OUT="$OUT" QL_LOW=2 QL_HIGH=8 \
  QL_N_DOCS=${QL_N_DOCS:-400000} QL_REPS=2 \
  python tools/querylang_scaling.py >> "$LOG" 2>&1
{
  echo ""
  echo "## Contemporaneous host-capacity probe (tools/cpu_probe.py, 2->8, pure CPU)"
  echo ""
  echo '```json'
  echo "$probe_full"
  echo '```'
  echo ""
  echo "Probe gate log (attempts before the run):"
  echo '```'
  grep "probe:" "$LOG" || true
  echo '```'
} >> "$OUT"
echo DONE >> "$LOG"
