#!/usr/bin/env python3
"""Hot-path cost breakdown — the three §4/§6 dimensions of the CDC apply:

  (a) pandas-UDF Arrow round-trip (text normalization),
  (b) LWW shuffle (the (conv_id, turn_idx) key-hash aggregate),
  (c) sink write / MERGE target cost (bucketed parquet write).

Each stage is timed cumulatively over the same generated changelog with
the noop writer so the delta between consecutive rows isolates one
stage. Appends a markdown section to BENCH/BASELINE.md.

Usage: python bench/breakdown.py [--events 2000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from merlin_spark.changelog import read_batch  # noqa: E402
from merlin_spark.fixtures import gen_changelog_spark  # noqa: E402
from merlin_spark.lww import lww_dedup  # noqa: E402
from merlin_spark.session import get_spark  # noqa: E402
from merlin_spark.textnorm import normalize_text  # noqa: E402


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    spark = get_spark("merlin-breakdown", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="merlin-breakdown-")
    try:
        log_path = os.path.join(work, "changelog")
        gen_changelog_spark(spark, args.events, max(1000, args.events // 500),
                            log_path, seed=42, n_segments=args.cpus * 2)

        def base():
            return read_batch(spark, log_path).where(F.col("op") != "S")

        proj = ["conv_id", "turn_idx", "op", "lsn", "role", "text", "tool", "ts"]
        stages = {  # production order: LWW first, then normalize winners
            "scan_only": lambda: base().select(*proj),
            "scan+lww_shuffle": lambda: lww_dedup(base().select(*proj)),
            "scan+lww+normalize_udf": lambda: lww_dedup(
                base().select(*proj)
            ).withColumn("text", normalize_text(F.col("text"))),
        }
        times: dict[str, float] = {}
        for name, build in stages.items():
            _noop(build())  # warm (JIT, file listing, Python workers)
            times[name] = round(_noop(build()), 3)
            print(f"[breakdown] {name}: {times[name]}s", file=sys.stderr)

        # (c) the bucketed sink write, timed as full-apply minus the above
        from merlin_spark.sink import IceboxSink

        sink = IceboxSink(spark, os.path.join(work, "table"), n_buckets=32,
                          mode="mor")
        t0 = time.monotonic()
        sink.apply(read_batch(spark, log_path), batch_id=0)
        times["full_apply_mor"] = round(time.monotonic() - t0, 3)
        print(f"[breakdown] full_apply_mor: {times['full_apply_mor']}s",
              file=sys.stderr)

        lww_s = max(0.0, times["scan+lww_shuffle"] - times["scan_only"])
        udf_s = max(0.0, times["scan+lww+normalize_udf"] - times["scan+lww_shuffle"])
        write_s = max(0.0, times["full_apply_mor"] - times["scan+lww+normalize_udf"])
        section = f"""
## Hot-path breakdown ({args.events:,} events, local[{args.cpus}], mor)

| stage (cumulative, noop-forced) | wall (s) |
|---|---|
| parquet scan + op-route | {times['scan_only']} |
| + LWW key-hash aggregate | {times['scan+lww_shuffle']} |
| + normalize_text pandas UDF (winners only) | {times['scan+lww+normalize_udf']} |
| full apply (incl. bucketed sink write + commit) | {times['full_apply_mor']} |

Deltas: LWW shuffle ≈ {lww_s:.1f}s, Arrow/pandas UDF round-trip ≈
{udf_s:.1f}s (runs post-dedup, winners only), bucketed write + commit ≈
{write_s:.1f}s (SURVEY.md §4 dimensions a/b/c).

```json
{json.dumps(times)}
```
"""
        with open(args.out, "a") as f:
            f.write(section)
        print(json.dumps(times))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
