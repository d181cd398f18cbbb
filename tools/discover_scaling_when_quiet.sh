#!/bin/bash
# Probe-gated discovery-pipeline scaling study: wait for a quiet host
# window (double gate: sane 2-thread baseline AND believable probe
# efficiency), then run tools/discover_scaling.py and record the
# contemporaneous probe on both sides of the measured run.
cd /root/repo
LOG=/tmp/discover_scaling_gate.log
for i in $(seq 1 24); do
  probe=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
  echo "attempt $i probe: $probe" >> $LOG
  ok=$(echo "$probe" | python3 -c "
import json,sys
p=json.load(sys.stdin)
tlow=min(p['t_low']); eff=p['best_efficiency']
print(1 if tlow < 28 and 0.55 <= eff <= 1.15 else 0)")
  if [ "$ok" = "1" ]; then break; fi
  sleep 300
done
echo "gate passed (or attempts exhausted) at attempt $i" >> $LOG
DISC_N_VECS=120000 DISC_LOW=2 DISC_HIGH=8 DISC_REPS=2 \
  python tools/discover_scaling.py > /tmp/discover_scaling_result.json 2>> $LOG
post=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
echo "post-run probe: $post" >> $LOG
echo DONE >> $LOG
