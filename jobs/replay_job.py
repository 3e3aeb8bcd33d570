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


def _committed_source_lsn(ckpt: str) -> int:
    """Highest COMMITTED source offset from the streaming checkpoint
    (cheap file poll). Not the sink manifest's lsn_hi: that records the
    max lsn among LWW *winners*, and the log's tail event can lose LWW
    to an earlier-lsn/later-ts event on the same key — the checkpoint
    offset is the only signal that the source position itself drained."""
    import glob
    import os

    commits = glob.glob(os.path.join(ckpt, "commits", "[0-9]*"))
    if not commits:
        return -1
    b = max(int(os.path.basename(p)) for p in commits)
    try:
        with open(os.path.join(ckpt, "offsets", str(b))) as f:
            last = f.read().strip().splitlines()[-1]
        return int(json.loads(last)["lsn"])
    except (OSError, ValueError, KeyError, IndexError):
        return -1


def _drain_capped_binlog(spark, cfg: StreamConfig, args) -> None:
    """Bounded replay under LSN admission control: availableNow plans
    one giant batch for Python stream sources, so capped replay drives
    a processingTime tail and stops once the checkpoint has committed
    the log's max lsn (read from segment footers — metadata only)."""
    from merlin_spark.binlog_source import _lsn_range, _segments
    from merlin_spark.stream import run_stream

    target = max(_lsn_range(fp)[1] for fp in _segments(cfg.log_path))
    cfg.processing_time = "0 seconds"
    q = run_stream(spark, cfg)
    deadline = time.monotonic() + 3600
    while time.monotonic() < deadline:
        if _committed_source_lsn(cfg.checkpoint_path) >= target:
            break
        if not q.isActive:
            raise RuntimeError(f"stream died: {q.exception()}")
        time.sleep(0.2)
    else:
        raise TimeoutError("capped binlog replay did not reach the log tail")
    q.stop()
    q.awaitTermination(60)


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
                    help="binlog admission control; with it set the job "
                         "drives a processingTime tail to completion "
                         "(availableNow plans ONE batch for Python "
                         "stream sources — no admission control)")
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
    if args.source_format == "binlog" and args.max_lsn_per_trigger:
        _drain_capped_binlog(spark, cfg, args)
    else:
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
