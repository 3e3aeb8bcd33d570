#!/usr/bin/env python3
"""Scaling-efficiency harness — the N vs 4N evidence (BASELINE.json:2,14).

The north rule's two-cluster-size criterion can't use a real cluster in
this sandbox; per the task brief it is evidenced by running the IDENTICAL
spark-submit job on the IDENTICAL input at two parallelism levels
(local[8] and local[32] = N and 4N cores) and reporting throughput at
both plus efficiency = tput(4N) / (4 × tput(N)).

Steps:
  1. package merlin_spark/ as merlin_spark.zip (the --py-files artifact);
  2. generate ONE shared seeded changelog (both runs replay the same bytes);
  3. spark-submit jobs/replay_job.py at local[8], then local[32], each
     from a cold empty table + checkpoint (separate JVMs — no cache
     leakage between levels);
  4. write BENCH/BASELINE.md with throughputs, efficiency, and caveats.

Usage:  python bench/run_scaling.py [--events 8000000] [--levels 8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def build_zip(out_path: str) -> str:
    """Package merlin_spark/ for --py-files (BASELINE.json:14 launch mode)."""
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "merlin_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out_path


def submit(master: str, pyfiles: str, job_args: list[str],
           driver_mem: str = "16g") -> dict:
    cmd = [
        SPARK_SUBMIT,
        "--master", master,
        "--driver-memory", driver_mem,
        "--conf", "spark.ui.enabled=false",
        "--py-files", pyfiles,
        os.path.join(REPO, "jobs", "replay_job.py"),
        *job_args,
    ]
    print(f"[scaling] {' '.join(cmd)}", file=sys.stderr, flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
        raise RuntimeError(f"spark-submit failed at {master}")
    for line in reversed(r.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in job output at {master}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    work = tempfile.mkdtemp(prefix="merlin-scaling-")
    try:
        pyfiles = build_zip(os.path.join(work, "merlin_spark.zip"))
        log_path = os.path.join(work, "changelog")

        # one shared input, generated at full parallelism
        submit(f"local[{max(levels)}]", pyfiles, [
            "--log", log_path, "--table", os.path.join(work, "_ignored"),
            "--ckpt", os.path.join(work, "_ignored_ckpt"),
            "--gen-events", str(args.events), "--gen-only",
            "--cores", str(max(levels)),
        ])

        results = {}
        for n in levels:
            table = os.path.join(work, f"table-{n}")
            ckpt = os.path.join(work, f"ckpt-{n}")
            t0 = time.monotonic()
            res = submit(f"local[{n}]", pyfiles, [
                "--log", log_path, "--table", table, "--ckpt", ckpt,
                "--n-buckets", "32",
                "--sink-mode", "mor", "--compact",
                "--max-files-per-trigger", "16",
                "--cores", str(n),
            ])
            res["total_submit_sec"] = round(time.monotonic() - t0, 1)
            results[n] = res
            print(f"[scaling] local[{n}]: {res}", file=sys.stderr, flush=True)

        lo, hi = min(levels), max(levels)
        tput_lo = results[lo]["events_per_sec"]
        tput_hi = results[hi]["events_per_sec"]
        ratio = hi / lo
        eff = tput_hi / (ratio * tput_lo)

        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(f"""# BENCH/BASELINE — measured scaling evidence

Metric: CDC apply throughput (change-events/sec), end-to-end bounded
replay (`trigger(availableNow=True)`) of a seeded Zipf-skewed changelog
through the transactional IceboxSink, launched via
`spark-submit --py-files merlin_spark.zip jobs/replay_job.py`
(BASELINE.json:2,14). Identical input for both levels
({args.events:,} events, seed=42, zipf_s=1.2); cold empty table +
checkpoint per run; separate JVMs.

| parallelism | replay wall (s) | throughput (events/s) |
|---|---|---|
| local[{lo}] (N cores) | {results[lo]['wall_sec']} | {tput_lo:,.0f} |
| local[{hi}] ({ratio:.0f}N cores) | {results[hi]['wall_sec']} | {tput_hi:,.0f} |

**Scaling efficiency N→{ratio:.0f}N = tput({hi}) / ({ratio:.0f} × tput({lo})) =
{eff:.3f}** (target ≥ 0.8, BASELINE.json:2).

Caveats (stated per SURVEY.md §7 risk 6): local-mode shuffles are
in-process memory/disk, not network — this flatters absolute efficiency
vs a real multi-node cluster, but the job is shuffle/CPU-bound (LWW
aggregate + bucketed merge write dominate; IO is a shared local NVMe)
so the relative N→4N comparison is meaningful. On a real cluster the
same job runs unchanged: master comes from spark-submit and
`spark.sql.shuffle.partitions` scales with `--cores`.

Raw results:
```json
{json.dumps({str(k): v for k, v in results.items()}, indent=2)}
```
""")
        print(json.dumps({
            "tput_lo": tput_lo, "tput_hi": tput_hi,
            "efficiency": round(eff, 3), "out": args.out,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
