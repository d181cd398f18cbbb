#!/bin/bash
# Probe-gated wrapper for tools/doc2vec_scaling.py: wait for a quiet
# host window (sane 2-thread pure-CPU baseline AND believable probe
# efficiency), then run the training scaling study at 240k docs.
cd /root/repo
LOG=/tmp/d2v_gate.log
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
python tools/cpu_probe.py 1 > /tmp/d2v_probe_before.json 2>/dev/null
D2V_N_DOCS=240000 D2V_EPOCHS=2 D2V_LOW=2 D2V_HIGH=8 D2V_REPS=2 \
  python tools/doc2vec_scaling.py > /tmp/d2v_scaling_result.json 2>> $LOG
python tools/cpu_probe.py 1 > /tmp/d2v_probe_after.json 2>/dev/null
