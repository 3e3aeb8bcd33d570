"""Per-micro-batch lineage + metrics emission.

BASELINE.json:6,14: "per-partition lineage (applied LSN ranges, row
counts, commit snapshot ids) and metrics are emitted each micro-batch".

The lineage table is a tiny append-only parquet directory next to the
sink table (`_lineage/`), one file per commit — readable as a normal
DataFrame for audits ("which snapshot applied LSN X?") and for the
skew tests (per-bucket row counts).
"""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def emit_lineage(
    spark: SparkSession,
    table_path: str,
    batch_id: int,
    snapshot_version: int,
    bucket_op_stats: list,
    lsn_lo: int,
    lsn_hi: int,
) -> None:
    """Append one lineage record per (bucket, op) of the committed batch.

    Written with pandas (a handful of rows — driver-side by design;
    the stats were already aggregated distributed in sink.apply)."""
    rows = [
        {
            "batch_id": int(batch_id),
            "snapshot": int(snapshot_version),
            "bucket": int(r["_b"]),
            "op": r["op"],
            "n_rows": int(r["n"]),
            "lsn_lo": int(r["lo"]),
            "lsn_hi": int(r["hi"]),
            "committed_at_ns": time.time_ns(),
        }
        for r in bucket_op_stats
    ]
    if not rows:
        return
    out_dir = os.path.join(table_path, "_lineage")
    os.makedirs(out_dir, exist_ok=True)
    pd.DataFrame(rows).to_parquet(
        os.path.join(out_dir, f"batch-{int(batch_id):08d}.parquet"), index=False
    )


def read_lineage(spark: SparkSession, table_path: str) -> DataFrame | None:
    out_dir = os.path.join(table_path, "_lineage")
    if not os.path.isdir(out_dir) or not os.listdir(out_dir):
        return None
    return spark.read.parquet(out_dir)


def make_metrics_listener(table_path: str, query_name: str | None = None):
    """StreamingQueryListener that persists EVERY progress event as it
    arrives. ``query.recentProgress`` is capped (last ~100 events by
    ``spark.sql.streaming.numRecentProgressUpdates``), so a replay with
    more micro-batches would silently lose the early batches' metrics if
    they were read once at the end; the listener has no such cap."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Listener(StreamingQueryListener):
        n_events = 0

        def onQueryStarted(self, event):  # noqa: N802 (Spark API)
            pass

        def onQueryProgress(self, event):  # noqa: N802
            import json

            p = json.loads(event.progress.json)
            if query_name is not None and p.get("name") != query_name:
                return
            _Listener.n_events += emit_metrics(table_path, [p])

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    return _Listener()


def emit_metrics(table_path: str, progresses: list) -> int:
    """Persist per-micro-batch engine metrics (BASELINE.json:6,14:
    "metrics are emitted each micro-batch") from the streaming query's
    progress events: input rows, processed rows/sec, and the batch
    duration breakdown (addBatch = sink apply time, triggerExecution =
    end-to-end). Appended as JSONL under ``_metrics/`` next to the
    table — greppable on an operator box, loadable as a DataFrame."""
    import json

    rows = []
    for p in progresses:
        if p is None:
            continue
        d = p if isinstance(p, dict) else json.loads(p.json)
        rows.append({
            "batch_id": d.get("batchId"),
            "num_input_rows": d.get("numInputRows"),
            "processed_rows_per_sec": d.get("processedRowsPerSecond"),
            "duration_ms": d.get("durationMs", {}),
            "timestamp": d.get("timestamp"),
        })
    if not rows:
        return 0
    out_dir = os.path.join(table_path, "_metrics")
    os.makedirs(out_dir, exist_ok=True)
    stamp = rows[0]["batch_id"] if rows[0]["batch_id"] is not None else 0
    with open(os.path.join(out_dir, f"progress-{int(stamp):08d}.jsonl"), "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return len(rows)
