#!/usr/bin/env python3
"""End-to-end curation job — CDC replay feeding training-data assembly
(VERDICT r4 task #1; the composition a real user runs first).

Launch (cluster or local; master comes from spark-submit, never from us):

    spark-submit --py-files merlin_spark.zip jobs/curate_job.py \
        --log /path/changelog --table /path/table --ckpt /path/ckpt \
        --out /path/training_pairs [--budget 512] [--epoch 0]

Pipeline: drain the changelog as Structured Streaming micro-batches
through the transactional IceboxSink (idempotent, crash-resumable),
read the LWW-converged transcript table, assemble (context, target)
SFT pairs, pack them into token-budget packs, and write the pairs with
their pack assignment plus the epoch-0 shuffle order as parquet.
Prints ONE JSON line with wall-time and stage row counts.

Optionally generates the changelog first (--gen-events N) with the
distributed seeded generator — the no-external-data input.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession

from merlin_spark.curate import epoch_shuffle, pack_pairs, sft_pairs
from merlin_spark.session import configure
from merlin_spark.sink import IceboxSink
from merlin_spark.stream import StreamConfig, replay


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True, help="changelog directory")
    ap.add_argument("--table", required=True, help="icebox table directory")
    ap.add_argument("--ckpt", required=True, help="streaming checkpoint dir")
    ap.add_argument("--out", required=True, help="training-pairs output dir")
    ap.add_argument("--gen-events", type=int, default=0,
                    help="generate a seeded changelog of N events first")
    ap.add_argument("--gen-convs", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--sink-mode", choices=["cow", "mor"], default="mor")
    ap.add_argument("--context-turns", type=int, default=2)
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--epoch", type=int, default=0)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    builder = SparkSession.builder.appName("merlin-curate")
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

    t0 = time.monotonic()
    cfg = StreamConfig(
        log_path=args.log, table_path=args.table,
        checkpoint_path=args.ckpt, n_buckets=args.n_buckets,
        sink_mode=args.sink_mode,
    )
    replay(spark, cfg, timeout_s=3600.0)
    t_replay = time.monotonic() - t0

    sink = IceboxSink(spark, args.table, args.n_buckets, mode=args.sink_mode)
    live = sink.read_live()
    pairs = pack_pairs(sft_pairs(live, k=args.context_turns),
                       budget=args.budget)
    pairs.write.mode("overwrite").parquet(args.out)
    order = epoch_shuffle(spark.read.parquet(args.out), epoch=args.epoch)
    order.write.mode("overwrite").parquet(args.out + "_order")
    wall = time.monotonic() - t0

    n_pairs = spark.read.parquet(args.out).count()
    n_packs = spark.read.parquet(args.out + "_order").count()
    print(json.dumps({
        "wall_sec": round(wall, 3),
        "replay_sec": round(t_replay, 3),
        "n_pairs": n_pairs,
        "n_packs": n_packs,
        "snapshot_version": sink.manifest()["version"],
        "parallelism": spark.sparkContext.defaultParallelism,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
