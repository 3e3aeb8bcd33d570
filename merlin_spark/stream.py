"""Streaming CDC apply + bounded replay — SURVEY.md §3.1/3.2.

One code path: ``readStream`` over the binlog directory →
``foreachBatch(sink.apply)``. Replay is the same query run with
``trigger(availableNow=True)`` (drain the log as a finite sequence of
micro-batches, then stop) — giving the replay-wall-time metric
(BASELINE.json:2) on the identical engine.

Exactly-once decomposition (BASELINE.json:6):
- source replay half: Structured Streaming's checkpoint offset/commit
  logs re-deliver a crashed micro-batch with the SAME batch_id;
- sink commit half: the sink's (batch_id, lsn-range) ledger inside the
  atomic snapshot manifest makes redelivery a no-op (sink.apply gate).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from .changelog import read_stream
from .sink import IceboxSink


@dataclass
class StreamConfig:
    log_path: str
    table_path: str
    checkpoint_path: str
    n_buckets: int = 16
    salt_buckets: int = 0
    sink_mode: str = "cow"  # "cow" | "mor" (see sink.IceboxSink)
    compact_every: int | None = None  # mor maintenance: fold file
    # versions every N batches so read amplification stays bounded on
    # long tails (Iceberg's scheduled rewrite_data_files equivalent)
    max_files_per_trigger: int | None = None
    processing_time: str | None = None  # None → availableNow (bounded replay)
    fail_after_batch: int | None = None  # test hook: crash injection


def run_stream(spark: SparkSession, cfg: StreamConfig) -> StreamingQuery:
    """Start the CDC apply stream; caller awaits/stops the query."""
    import hashlib
    import os

    # ledger epoch = checkpoint identity: batch_ids are unique only
    # within one checkpoint; restarts keep the epoch (redelivery gated),
    # a fresh checkpoint gets a new epoch (batches re-apply — safe,
    # LWW apply is idempotent). See sink.IceboxSink.__init__.
    epoch = hashlib.md5(
        os.path.abspath(cfg.checkpoint_path).encode()
    ).hexdigest()[:12]
    sink = IceboxSink(spark, cfg.table_path, cfg.n_buckets, cfg.salt_buckets,
                      mode=cfg.sink_mode, epoch=epoch)
    events = read_stream(spark, cfg.log_path, cfg.max_files_per_trigger)

    def apply_batch(batch_df, batch_id: int):
        sink.apply(batch_df, batch_id)
        if cfg.compact_every and (batch_id + 1) % cfg.compact_every == 0:
            # a separate snapshot commit; crash between apply and
            # compact loses only the maintenance work, never data
            sink.compact()
        # crash injection AFTER the commit: the restarted stream must
        # treat the re-delivered batch as already applied (§5.3 test)
        if cfg.fail_after_batch is not None and batch_id >= cfg.fail_after_batch:
            raise RuntimeError(f"injected crash after batch {batch_id}")

    writer = (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", cfg.checkpoint_path)
        .queryName("merlin-cdc-apply")
    )
    if cfg.processing_time:
        writer = writer.trigger(processingTime=cfg.processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def replay(spark: SparkSession, cfg: StreamConfig, timeout_s: float = 600.0) -> None:
    """Bounded replay to convergence: drain whatever is in the log,
    then stop. Crash-resumable: rerun with the same checkpoint/table
    paths and it continues from the failed batch."""
    q = run_stream(spark, cfg)
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"replay did not drain the log in {timeout_s}s")
        from .lineage import emit_metrics

        emit_metrics(cfg.table_path, list(q.recentProgress))
    finally:
        if q.isActive:
            q.stop()
