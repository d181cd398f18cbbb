#!/bin/bash
# Probe-gated scaling study: wait for a quiet host window (co-tenant
# noise caps pure-CPU 2->8 scaling), then run the Spark scaling bench.
# Always runs at least once; records the contemporaneous probe.
cd /root/repo
best=""
for i in $(seq 1 8); do
  probe=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
  eff=$(echo "$probe" | python3 -c "import json,sys; print(json.load(sys.stdin)['best_efficiency'])")
  echo "attempt $i probe: $probe" >> /tmp/scaling_gate.log
  ok=$(python3 -c "print(1 if ${eff:-0} >= 0.65 else 0)")
  if [ "$ok" = "1" ]; then break; fi
  sleep 420
done
probe_full=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 2 2>/dev/null | tail -1)
echo "final probe: $probe_full" >> /tmp/scaling_gate.log
SCALING_LOW=2 SCALING_HIGH=8 SCALING_N_DOCS=400000 SCALING_REPS=3 \
  python tools/scaling_bench.py >> /tmp/scaling_gate.log 2>&1
cp BENCH/BASELINE.md BENCH/SCALING_2v8_r3.md
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
  cat /tmp/scaling_gate.log | grep "probe:" || true
  echo '```'
} >> BENCH/SCALING_2v8_r3.md
echo DONE >> /tmp/scaling_gate.log
