#!/bin/bash
# Quiet-window hunter (VERDICT r3 task #4): loop the probe until the
# host's copy bandwidth clears the floor, then fire the full 2M-event
# replay bench (its own per-rep probe-gating still applies). Appends
# every probe sample to BENCH/probe_log_r04.jsonl so that if the host
# NEVER offers a clean window, the round has the proof record the
# verdict asked for. Exits after the first bench run whose stdout line
# says "quiet": true, or after MAX_HOURS.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
FLOOR="${MERLIN_BENCH_PROBE_FLOOR:-10.0}"
MAX_HOURS="${QUIET_HUNT_MAX_HOURS:-4}"
PROBE_LOG="$REPO/BENCH/probe_log_r04.jsonl"
OUT="${QUIET_HUNT_OUT:-/tmp/bench_r04_quiet.log}"
deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))
attempt=0
while [ "$(date +%s)" -lt "$deadline" ]; do
  p=$(python -c "
import sys, json; sys.path.insert(0, '$REPO/bench')
from host_probe import probe
print(json.dumps(probe(spin_s=1.0, bw_s=1.5)))")
  echo "{\"t\": $(date +%s), \"probe\": $p}" >> "$PROBE_LOG"
  ok=$(python -c "
import json, sys; sys.path.insert(0, '$REPO/bench')
from host_probe import healthy
print(1 if healthy(json.loads(sys.argv[1]), bw_floor=float(sys.argv[2])) else 0)" "$p" "$FLOOR")
  if [ "$ok" = "1" ]; then
    attempt=$((attempt + 1))
    echo "[hunt] quiet window ($p) — bench attempt $attempt" >&2
    MERLIN_BENCH_TAG=r04 python "$REPO/bench.py" > "$OUT.$attempt" 2> "$OUT.$attempt.err"
    tail -c 2000 "$OUT.$attempt"
    if python -c "
import json, sys
line = open(sys.argv[1]).read().strip().splitlines()[-1]
sys.exit(0 if json.loads(line).get('quiet') else 1)" "$OUT.$attempt"; then
      echo "[hunt] quiet bench captured in $OUT.$attempt" >&2
      exit 0
    fi
    echo "[hunt] bench ran but window closed mid-run; continuing" >&2
  fi
  sleep 45
done
echo "[hunt] no quiet window within ${MAX_HOURS}h — probe log is the record" >&2
exit 3
