#!/bin/bash
# Scaling-ladder quiet-window hunter (r4): the first SCALING_r04 table
# was measured in a degraded fresh-page-provisioning window (see the
# post-run dossier in BENCH/SCALING_r04.md). Loop the two-sided host
# probe (warm copy + cold fill + steal, host_probe.healthy()) until a
# genuinely clean window appears, then fire the full ladder to
# BENCH/SCALING_r04b.md. Every probe sample is appended to
# BENCH/probe_log_r04.jsonl so a never-quiet host leaves a proof record.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MAX_HOURS="${SCALING_HUNT_MAX_HOURS:-4}"
EVENTS="${SCALING_HUNT_EVENTS:-100000000}"
PROBE_LOG="$REPO/BENCH/probe_log_r04.jsonl"
deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  p=$(python -c "
import sys, json; sys.path.insert(0, '$REPO/bench')
from host_probe import probe
print(json.dumps(probe(spin_s=1.0, bw_s=1.5)))")
  echo "{\"t\": $(date +%s), \"probe\": $p, \"who\": \"scaling_hunt\"}" >> "$PROBE_LOG"
  ok=$(python -c "
import json, sys; sys.path.insert(0, '$REPO/bench')
from host_probe import healthy
print(1 if healthy(json.loads(sys.argv[1])) else 0)" "$p")
  # Require TWO consecutive healthy probes 60 s apart: a single probe
  # taken right after a big process exit reads falsely healthy on the
  # cold side (its freed pages are still balloon-resident for ~30 s —
  # measured, BENCH/BASELINE.md balloon-reclaim experiment).
  if [ "$ok" = "1" ] && [ "${prev_ok:-0}" != "1" ]; then
    echo "[scaling-hunt] first healthy probe — confirming in 60s" >&2
    prev_ok=1
    sleep 60
    continue
  fi
  prev_ok="$ok"
  if [ "$ok" = "1" ]; then
    echo "[scaling-hunt] clean window (2 consecutive): $p" >&2
    # 1. short 2M bench first — captures the 2x-gate re-proof under the
    #    repaired (cold-gated) probe before the window can close
    if [ ! -f "$REPO/BENCH/bench_r04_coldquiet.json" ]; then
      echo "[scaling-hunt] firing 2M bench (cold-gated)" >&2
      MERLIN_BENCH_TAG=r04quiet MERLIN_BENCH_REPEATS=2 \
        MERLIN_BENCH_PROBE_TRIES=2 MERLIN_BENCH_PROBE_WAIT=10 \
        MERLIN_BENCH_QUERIES=dedup_exact \
        python "$REPO/bench.py" > /tmp/bench_r04_coldquiet.out \
        2> /tmp/bench_r04_coldquiet.err
      last=$(tail -1 /tmp/bench_r04_coldquiet.out)
      echo "[scaling-hunt] bench line: $last" >&2
      if python -c "
import json, sys
sys.exit(0 if json.loads(sys.argv[1]).get('quiet') else 1)" "$last"; then
        echo "$last" > "$REPO/BENCH/bench_r04_coldquiet.json"
      fi
    fi
    # 2. the full ladder
    python "$REPO/bench/run_scaling.py" --events "$EVENTS" \
      --levels 4,8,32 --repeats 1 --out "$REPO/BENCH/SCALING_r04b.md" \
      && exit 0
    echo "[scaling-hunt] ladder failed; continuing hunt" >&2
  fi
  sleep 60
done
echo "[scaling-hunt] no clean window within ${MAX_HOURS}h" >&2
exit 3
