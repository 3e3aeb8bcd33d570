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


def test_transform_with_state_in_pandas(spark, log_dir, tmp_path):
    """transformWithStateInPandas — the preferred Spark 4.x arbitrary
    stateful API (SURVEY.md §2.8): per-conversation max applied LSN
    (the out-of-order progress tracker). Requires the RocksDB state
    store provider AND protobuf (its Python driver worker speaks proto);
    this sandbox lacks protobuf, so the test self-skips there — the
    same semantics are covered by the applyInPandasWithState test
    above, which has no proto dependency."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas driver worker needs protobuf",
    )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MaxLsn(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.state = handle.getValueState("max_lsn", "max_lsn bigint")

        def handleInputRows(self, key, rows, timer_values):
            mx = self.state.get()[0] if self.state.exists() else -1
            for pdf in rows:
                mx = max(mx, int(pdf["lsn"].max()))
            self.state.update((mx,))
            yield pd.DataFrame({"conv_id": [key[0]], "max_lsn": [mx]})

        def close(self):
            pass

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        s = read_stream(spark, log_dir).where(F.col("conv_id").isNotNull())
        out = s.groupBy("conv_id").transformWithStateInPandas(
            MaxLsn(),
            outputStructType="conv_id string, max_lsn long",
            outputMode="Update",
            timeMode="None",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        got = spark.sql(
            "select conv_id, max(max_lsn) as max_lsn from tws group by conv_id"
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    log = gen_changelog(ChangelogSpec(seed=31, n_events=3000, n_convs=40, n_evo=0))
    exp = (
        log[log["conv_id"].notna()]
        .groupby("conv_id")
        .agg(max_lsn=("lsn", "max"))
        .reset_index()
    )
    merged = got.merge(exp, on="conv_id", suffixes=("_got", "_exp"))
    assert len(merged) == len(exp)
    assert (merged["max_lsn_got"] == merged["max_lsn_exp"]).all()


def test_stream_stream_interval_join(spark, log_dir):
    """Stream-stream interval join (SURVEY.md §2.3): updates joined to
    the inserts they revise, bounded to a 10-minute event-time window so
    both sides' state can be GC'd by the watermarks."""
    inserts = (
        read_stream(spark, log_dir)
        .where(F.col("op") == "I")
        .select(
            F.col("conv_id").alias("i_conv"), F.col("turn_idx").alias("i_turn"),
            F.col("lsn").alias("i_lsn"), F.col("ts").alias("i_ts"),
        )
        .withWatermark("i_ts", "10 minutes")
    )
    updates = (
        read_stream(spark, log_dir)
        .where(F.col("op") == "U")
        .select(
            F.col("conv_id").alias("u_conv"), F.col("turn_idx").alias("u_turn"),
            F.col("lsn").alias("u_lsn"), F.col("ts").alias("u_ts"),
        )
        .withWatermark("u_ts", "10 minutes")
    )
    joined = inserts.join(
        updates,
        F.expr(
            "i_conv = u_conv AND i_turn = u_turn "
            "AND u_ts BETWEEN i_ts AND i_ts + interval 10 minutes"
        ),
    )
    _run_to_memory(joined, "ssjoin", timeout_s=180)
    got = spark.sql("select * from ssjoin").toPandas()
    assert len(got) > 0
    assert (got["u_ts"] >= got["i_ts"]).all()
    assert (got["u_ts"] <= got["i_ts"] + pd.Timedelta(minutes=10)).all()
