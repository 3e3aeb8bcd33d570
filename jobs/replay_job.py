#!/usr/bin/env python3
"""Bounded CDC replay job — the spark-submit entry (BASELINE.json:14).

Launch (cluster or local; master comes from spark-submit, never from us):

    spark-submit --py-files merlin_spark.zip jobs/replay_job.py \
        --log /path/changelog --table /path/table --ckpt /path/ckpt

Drains the changelog as Structured Streaming micro-batches
(``trigger(availableNow=True)``) through the transactional IceboxSink,
then prints ONE JSON line: wall-time, events/sec, final snapshot version.
Crash-resumable: rerun with the same --table/--ckpt and it continues from
the failed batch (SS offset log + sink batch ledger).

Optionally generates the changelog first (--gen-events N) with the
distributed seeded generator — the no-external-data bench input.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession

from merlin_spark.session import configure
from merlin_spark.stream import StreamConfig, replay


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True, help="changelog directory")
    ap.add_argument("--table", required=True, help="icebox table directory")
    ap.add_argument("--ckpt", required=True, help="streaming checkpoint dir")
    ap.add_argument("--gen-events", type=int, default=0,
                    help="generate a seeded changelog of N events first")
    ap.add_argument("--gen-only", action="store_true",
                    help="exit after generation (build a shared bench input)")
    ap.add_argument("--gen-convs", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--salt-buckets", type=int, default=0)
    ap.add_argument("--sink-mode", choices=["cow", "mor"], default="cow",
                    help="copy-on-write vs merge-on-read (sink.IceboxSink)")
    ap.add_argument("--compact", action="store_true",
                    help="fold file versions after replay (counted in wall)")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--source-format", choices=["files", "binlog"],
                    default="files",
                    help="files = SS file source (file-name offsets); "
                         "binlog = custom merlin_binlog DataSource "
                         "(LSN-position offsets, Debezium/WAL model)")
    ap.add_argument("--max-lsn-per-trigger", type=int, default=None,
                    help="binlog admission control; replay() drives a "
                         "processingTime tail to the log's max lsn "
                         "(availableNow would fall back to ONE capped "
                         "batch for Python stream sources)")
    ap.add_argument("--cores", type=int, default=None,
                    help="parallelism hint for shuffle sizing (defaults to "
                         "sparkContext.defaultParallelism)")
    args = ap.parse_args()

    builder = SparkSession.builder.appName("merlin-replay")
    # master intentionally NOT set: spark-submit owns it
    spark = configure(builder, args.cores or 8).getOrCreate()
    cores = args.cores or spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
    spark.sparkContext.setLogLevel("ERROR")

    if args.gen_events:
        from merlin_spark.fixtures import gen_changelog_spark

        gen_changelog_spark(
            spark, args.gen_events,
            args.gen_convs or max(1000, args.gen_events // 500),
            args.log, seed=args.seed, n_segments=max(32, cores * 2),
        )
        if args.gen_only:
            print(json.dumps({"generated": args.gen_events, "log": args.log}))
            spark.stop()
            return

    cfg = StreamConfig(
        log_path=args.log,
        table_path=args.table,
        checkpoint_path=args.ckpt,
        n_buckets=args.n_buckets,
        salt_buckets=args.salt_buckets,
        sink_mode=args.sink_mode,
        max_files_per_trigger=args.max_files_per_trigger,
        source_format=args.source_format,
        max_lsn_per_trigger=args.max_lsn_per_trigger,
    )
    from merlin_spark.session import prewarm_python_workers
    from merlin_spark.sink import IceboxSink

    prewarm_python_workers(spark)  # worker fork + imports ≠ replay cost
    t0 = time.monotonic()
    # replay() owns the capped-binlog drain internally (stream.py) —
    # availableNow's single-batch fallback never under-applies the log
    replay(spark, cfg, timeout_s=3600.0)
    sink = IceboxSink(spark, args.table, args.n_buckets)
    if args.compact:
        sink.compact()
    wall = time.monotonic() - t0
    man = sink.manifest()
    n_events = args.gen_events or spark.read.parquet(args.log).count()
    out = {
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        "n_events": n_events,
        "snapshot_version": man["version"],
        "lsn_hi": man["lsn_hi"],
        "parallelism": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
