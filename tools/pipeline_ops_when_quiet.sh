#!/bin/bash
# Probe-gated wrapper for tools/pipeline_ops_scaling.py: wait for a
# quiet host window (sane 2-thread baseline AND believable probe
# efficiency), then run the study; record probes on both sides.
cd /root/repo
LOG=/tmp/pipeline_ops_gate.log
for i in $(seq 1 18); do
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
PIPE_N_DOCS=400000 PIPE_LOW=2 PIPE_HIGH=8 PIPE_REPS=2 \
  python tools/pipeline_ops_scaling.py > /tmp/pipeline_ops_result.json 2>> $LOG
post=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
echo "post-run probe: $post" >> $LOG
echo DONE >> $LOG
