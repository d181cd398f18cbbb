#!/bin/bash
# STRICT probe-gated pipeline scaling re-run: unlike
# webtext_when_quiet.sh this variant NEVER runs in a storm window —
# if no quiet window appears within the attempt budget it exits
# without running, leaving the committed storm-window analysis in
# SCALING_WEBTEXT_PIPE_r5.md as the record. Double gate per the
# round-3 lesson: efficiency >= 0.65 AND min(t_low) <= 26 s (a storm
# that inflates the 2-thread baseline fakes efficiency > 1).
cd /root/repo
LOG=${GATE_LOG:-/tmp/webtext_gate_strict.log}
: > "$LOG"
found=0
for i in $(seq 1 "${GATE_ATTEMPTS:-18}"); do
  probe=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 1 2>/dev/null | tail -1)
  echo "attempt $i probe: $probe" >> "$LOG"
  ok=$(echo "$probe" | python3 -c "
import json, sys
p = json.load(sys.stdin)
print(1 if p['best_efficiency'] >= 0.65 and min(p['t_low']) <= 26 else 0)")
  if [ "$ok" = "1" ]; then found=1; break; fi
  sleep "${GATE_SLEEP:-420}"
done
if [ "$found" != "1" ]; then
  echo "NO_QUIET_WINDOW — skipping run" >> "$LOG"
  exit 0
fi
probe_full=$(PROBE_LOW=2 PROBE_HIGH=8 python tools/cpu_probe.py 2 2>/dev/null | tail -1)
echo "final probe: $probe_full" >> "$LOG"
OUT=${SCALING_OUT:-BENCH/SCALING_WEBTEXT_PIPE_r5_quiet.md}
SCALING_OUT="$OUT" SCALING_LOW=2 SCALING_HIGH=8 \
  SCALING_N_DOCS=${SCALING_N_DOCS:-800000} SCALING_REPS=2 \
  python tools/webtext_scaling.py >> "$LOG" 2>&1
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
