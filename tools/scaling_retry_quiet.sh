#!/bin/bash
# Opportunistic re-run of the scaling study: poll the pure-CPU probe
# every 10 min; ONLY if the host is genuinely quiet (2->8 efficiency
# >= 0.75) run the Spark scaling bench and append the result +
# contemporaneous probe to BENCH/SCALING_2v8_r3_retry.md. Unlike
# scaling_when_quiet.sh this never runs the heavy bench on a loaded
# box — no unconditional final attempt.
cd /root/repo
for i in $(seq 1 "${RETRY_ATTEMPTS:-20}"); do
  probe=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
  eff=$(echo "$probe" | python3 -c "import json,sys; print(json.load(sys.stdin)['best_efficiency'])")
  tlow=$(echo "$probe" | python3 -c "import json,sys; print(min(json.load(sys.stdin)['t_low']))")
  echo "attempt $i probe: $probe" >> /tmp/scaling_retry.log
  # DOUBLE gate: ratio alone is spoofable — a co-tenant-crushed
  # 2-thread run inflates efficiency (observed "1.9"); also require
  # the 2-thread run itself to be near the box's quiet baseline.
  ok=$(python3 -c "print(1 if ${eff:-0} >= ${GATE_EFF:-0.75} and ${tlow:-99} < ${GATE_TLOW:-23} else 0)")
  if [ "$ok" = "1" ]; then
    probe_full=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 2 2>/dev/null | tail -1)
    SCALING_LOW=2 SCALING_HIGH=8 SCALING_N_DOCS=400000 SCALING_REPS=3 \
      python tools/scaling_bench.py >> /tmp/scaling_retry.log 2>&1
    cp BENCH/BASELINE.md BENCH/SCALING_2v8_r3_retry.md
    {
      echo ""
      echo "## Contemporaneous host-capacity probe (2->8, pure CPU)"
      echo '```json'
      echo "$probe_full"
      echo '```'
    } >> BENCH/SCALING_2v8_r3_retry.md
    echo DONE-RAN >> /tmp/scaling_retry.log
    exit 0
  fi
  sleep 600
done
echo DONE-NEVER-QUIET >> /tmp/scaling_retry.log
