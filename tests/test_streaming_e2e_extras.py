"""End-to-end streaming coverage for the two engine APIs that were
unit-tested only (VERDICT round 1 stretch): salted LWW inside the real
replay path, and tolerance-bounded as-of enrichment inside foreachBatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from merlin_spark.apply import table_view
from merlin_spark.asof import asof_join
from merlin_spark.changelog import read_batch
from merlin_spark.fixtures import BASE_TS, ChangelogSpec, gen_changelog, write_segments
from merlin_spark.oracle import expected_state
from merlin_spark.sink import IceboxSink
from merlin_spark.stream import StreamConfig, replay


def _final(spark, table_path) -> pd.DataFrame:
    got = table_view(IceboxSink(spark, table_path).read(), None).toPandas()
    return got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_salted_stream_replay_converges(spark, tmp_path):
    """salt_buckets>1 routes prepare_batch through lww_dedup_salted
    (two-phase hot-key aggregation) inside the REAL streaming path; the
    converged state must equal the oracle and the unsalted replay —
    salting is a physical strategy, never a semantic change."""
    log = gen_changelog(
        ChangelogSpec(seed=37, n_events=3000, n_convs=20, zipf_s=1.6,
                      dup_rate=0.1, n_evo=1)
    )
    write_segments(log, str(tmp_path / "log"), n_segments=4)
    salted = StreamConfig(
        log_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "table_salted"),
        checkpoint_path=str(tmp_path / "ckpt_salted"),
        salt_buckets=8,
        sink_mode="mor",
        max_files_per_trigger=2,
    )
    replay(spark, salted, timeout_s=180)
    got = _final(spark, salted.table_path)
    exp = expected_state(log).reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)

    plain = StreamConfig(
        log_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "table_plain"),
        checkpoint_path=str(tmp_path / "ckpt_plain"),
        sink_mode="mor",
        max_files_per_trigger=2,
    )
    replay(spark, plain, timeout_s=180)
    pd.testing.assert_frame_equal(got, _final(spark, plain.table_path))


def test_streaming_asof_tolerance_enrichment(spark, tmp_path):
    """asof_join(tolerance=...) (the cogrouped merge_asof path) inside
    foreachBatch: per-micro-batch enrichment against a static dimension
    must equal the one-shot batch enrichment — the as-of lookup is
    per-row independent when the right side is static, so micro-batch
    boundaries cannot change results."""
    log = gen_changelog(
        ChangelogSpec(seed=31, n_events=2000, n_convs=30, n_evo=0, dup_rate=0.0)
    )
    write_segments(log, str(tmp_path / "log"), n_segments=4)
    # static dimension: 4 "policy checkpoints" per conversation
    dim = pd.DataFrame(
        {
            "conv_id": np.repeat([f"conv{i:08d}" for i in range(30)], 4),
            "ts": pd.Series(
                np.tile(
                    BASE_TS + (np.arange(4) * 600_000_000).astype("timedelta64[us]"),
                    30,
                )
            ),
            "policy": np.tile([f"p{k}" for k in range(4)], 30),
        }
    )
    right = spark.createDataFrame(dim)
    tol = pd.Timedelta("20 minutes")

    chunks: list[pd.DataFrame] = []

    def enrich(df, _bid):
        out = asof_join(df, right, on="ts", by="conv_id",
                        right_cols={"policy": "policy"}, tolerance=tol)
        chunks.append(out.toPandas())

    q = (
        spark.readStream.schema(read_batch(spark, str(tmp_path / "log")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "log"))
        .writeStream.foreachBatch(enrich)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert len(chunks) >= 2  # really micro-batched

    streamed = (
        pd.concat(chunks, ignore_index=True)
        .sort_values("lsn").reset_index(drop=True)
    )
    batch = (
        asof_join(read_batch(spark, str(tmp_path / "log")), right,
                  on="ts", by="conv_id", right_cols={"policy": "policy"},
                  tolerance=tol)
        .toPandas().sort_values("lsn").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(streamed, batch)
    # tolerance actually bites: some rows matched, some lapsed
    assert batch["policy"].notna().any() and batch["policy"].isna().any()
