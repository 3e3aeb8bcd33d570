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
