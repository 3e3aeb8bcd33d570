"""Streaming-only operators (SURVEY.md §2.8): watermark, tumbling /
sliding / session windows, dropDuplicatesWithinWatermark, arbitrary
stateful op (transformWithStateInPandas / applyInPandasWithState).
Rows-only assertions via memory sink (not DuckDB-oracle-able)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from merlin_spark.fixtures import ChangelogSpec, gen_changelog, write_segments
from merlin_spark.changelog import read_stream


def _run_to_memory(df, name, timeout_s=120, output_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout_s)
    return q


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    p = tmp_path_factory.mktemp("slog")
    log = gen_changelog(ChangelogSpec(seed=31, n_events=3000, n_convs=40, n_evo=0))
    write_segments(log, str(p), n_segments=4)
    return str(p)


def test_tumbling_window_metrics(spark, log_dir):
    """events/sec + op mix per fixed window — the metrics stream
    (BASELINE.json:14)."""
    s = read_stream(spark, log_dir)
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute"), "op")
        .agg(F.count("*").alias("n"))
    )
    _run_to_memory(agg, "tumbling", output_mode="append")
    got = spark.sql("select * from tumbling").toPandas()
    # append mode emits only watermark-closed windows; check shape
    assert set(got.columns) == {"window", "op", "n"}


def test_sliding_window(spark, log_dir):
    s = read_stream(spark, log_dir)
    agg = (
        s.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes", "1 minute"))
        .agg(F.count("*").alias("n"))
    )
    _run_to_memory(agg, "sliding")
    assert {"window", "n"} == set(spark.sql("select * from sliding").columns)


def test_session_window(spark, log_dir):
    """Per-conversation gap-based activity sessions (payload =
    transcripts)."""
    s = read_stream(spark, log_dir)
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
    )
    _run_to_memory(agg, "sessions")
    got = spark.sql("select * from sessions").toPandas()
    assert set(got.columns) == {"session_window", "conv_id", "n_turns"}


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Cross-micro-batch duplicate-delivery suppression on
    (conv_id, turn_idx, lsn) — BASELINE.json:6 redelivery."""
    log = gen_changelog(
        ChangelogSpec(seed=32, n_events=800, n_convs=10, dup_rate=0.4, n_evo=0)
    )
    write_segments(log, str(tmp_path / "log"), n_segments=3)
    s = read_stream(spark, str(tmp_path / "log"))
    dd = s.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx", "lsn"]
    )
    _run_to_memory(dd, "dd")
    got = spark.sql("select * from dd").toPandas()
    # every (conv_id, turn_idx, lsn) at most once
    assert got.duplicated(["conv_id", "turn_idx", "lsn"]).sum() == 0
    assert len(got) == log.drop_duplicates(["lsn"]).shape[0]


def test_stateful_max_lsn_per_conv(spark, log_dir):
    """Arbitrary stateful op: running max applied LSN per conv_id via
    applyInPandasWithState (the per-key repair/progress tracker shape)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    s = read_stream(spark, log_dir).where(F.col("conv_id").isNotNull())

    def track(key, pdf_iter, state: GroupState):
        mx = state.get[0] if state.exists else -1
        n = state.get[1] if state.exists else 0
        for pdf in pdf_iter:
            mx = max(mx, int(pdf["lsn"].max()))
            n += len(pdf)
        state.update((mx, n))
        yield pd.DataFrame({"conv_id": [key[0]], "max_lsn": [mx], "n_events": [n]})

    out = s.groupBy("conv_id").applyInPandasWithState(
        track,
        outputStructType="conv_id string, max_lsn long, n_events long",
        stateStructType="max_lsn long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    _run_to_memory(out, "stateful", output_mode="update")
    got = spark.sql(
        "select conv_id, max(max_lsn) as max_lsn, max(n_events) as n from stateful group by conv_id"
    ).toPandas()
    log = gen_changelog(ChangelogSpec(seed=31, n_events=3000, n_convs=40, n_evo=0))
    exp = (
        log[log["conv_id"].notna()]
        .groupby("conv_id")
        .agg(max_lsn=("lsn", "max"))
        .reset_index()
    )
    merged = got.merge(exp, on="conv_id", suffixes=("_got", "_exp"))
    assert (merged["max_lsn_got"] == merged["max_lsn_exp"]).all()
