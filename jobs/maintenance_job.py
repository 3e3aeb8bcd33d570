#!/usr/bin/env python3
"""Table maintenance job — the spark-submit ops entry for an icebox
table (Iceberg's `rewrite_data_files` / `expire_snapshots` moral
equivalents):

    spark-submit --py-files merlin_spark.zip jobs/maintenance_job.py \
        --table /path/table [--compact] [--vacuum] [--drop-tombstones]

- --compact: fold merge-on-read file versions (and small files) into
  one sorted file-set per bucket; a new snapshot commit, never touches
  the exactly-once ledger.
- --drop-tombstones (with --compact): additionally GC delete
  tombstones — only safe once the source guarantees no event older
  than the table's lsn_hi can still be redelivered (retention
  boundary; operator's call — see sink.IceboxSink.compact).
- --expire-keep N: delete all but the newest N snapshot manifests
  (Iceberg expire_snapshots parity) — bounds snapshots/ growth and ends
  time travel for expired versions; pair with --vacuum to GC their
  files.
- --vacuum: delete data files unreferenced by the latest snapshot
  (crash leftovers, superseded versions, expired-snapshot files).

Prints one JSON line with the resulting snapshot version and counts.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from merlin_spark.session import configure
from merlin_spark.sink import IceboxSink


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--drop-tombstones", action="store_true")
    ap.add_argument("--expire-keep", type=int, default=None,
                    help="expire all but the newest N snapshot manifests")
    ap.add_argument("--vacuum", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    builder = SparkSession.builder.appName("merlin-maintenance")
    spark = configure(builder, args.cores or 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sink = IceboxSink(spark, args.table)
    out: dict = {"table": args.table, "mode": sink.mode}
    if args.compact:
        man = sink.compact(drop_tombstones=args.drop_tombstones)
        out["compacted_to_version"] = man["version"]
        out["files"] = sum(len(fl) for fl in man["files"].values())
    if args.expire_keep is not None:
        out["expired_snapshots"] = sink.expire_snapshots(args.expire_keep)
    if args.vacuum:
        out["vacuumed_files"] = sink.vacuum()
    out["version"] = sink.current_version()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
