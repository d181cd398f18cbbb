#!/bin/bash
# Strict probe-gated HNSW scaling retry: require TWO consecutive quiet
# probes (t_low near the known-idle 21 s baseline) before running ONE
# rep, then re-probe; repeat until a rep is bracketed by quiet probes
# on both sides or attempts run out. Appends every rep + its probes to
# the log so even a failed hunt is honest evidence of host noise.
cd /root/repo
LOG=/tmp/hnsw_scaling_strict.log
OUT=/tmp/hnsw_scaling_strict_result.json
quiet() {
  p=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
  echo "$1 probe: $p" >> $LOG
  echo "$p" | python3 -c "
import json,sys
p=json.load(sys.stdin)
print(1 if min(p['t_low']) < 24 and 0.6 <= p['best_efficiency'] <= 1.12 else 0)"
}
for i in $(seq 1 30); do
  a=$(quiet "attempt$i-pre1")
  [ "$a" != "1" ] && sleep 240 && continue
  b=$(quiet "attempt$i-pre2")
  [ "$b" != "1" ] && sleep 240 && continue
  HNSW_N_VECS=48000 HNSW_SHARDS=16 HNSW_LOW=2 HNSW_HIGH=8 HNSW_REPS=1 \
    python tools/hnsw_scaling.py > $OUT.tmp 2>> $LOG
  cat $OUT.tmp >> $LOG
  c=$(quiet "attempt$i-post")
  if [ "$c" = "1" ]; then
    mv $OUT.tmp $OUT
    echo "QUIET-BRACKETED RUN at attempt $i" >> $LOG
    break
  fi
  echo "attempt $i ran but post-probe stormy; retrying" >> $LOG
  sleep 240
done
echo DONE >> $LOG
