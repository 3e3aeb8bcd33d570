"""Skew handling smoke (SURVEY.md §5.6): a Zipf log where one conv_id
holds ~20%+ of events must complete, salted == unsalted results, and
AQE skew-join must be engaged in the session."""

from __future__ import annotations

import pandas as pd

from merlin_spark.apply import replay_batch, table_view
from merlin_spark.fixtures import ChangelogSpec, gen_changelog
from merlin_spark.lww import lww_dedup, lww_dedup_salted, lww_dedup_window
from merlin_spark.schemas import EVENT_SCHEMA


def _hot_log():
    return gen_changelog(
        ChangelogSpec(seed=77, n_events=8000, n_convs=200, zipf_s=1.5, n_evo=0)
    )


def test_hot_key_exists():
    log = _hot_log()
    top = log["conv_id"].value_counts(normalize=True).iloc[0]
    assert top > 0.15


def test_salted_equals_unsalted_under_skew(spark):
    log = _hot_log()
    events = spark.createDataFrame(log, schema=EVENT_SCHEMA)
    plain = lww_dedup(events).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    salted = (
        lww_dedup_salted(events, salt_buckets=16)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    windowed = (
        lww_dedup_window(events)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted[plain.columns])
    pd.testing.assert_frame_equal(plain, windowed[plain.columns])


def test_aqe_and_skew_join_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_skewed_replay_completes(spark):
    log = _hot_log()
    events = spark.createDataFrame(log, schema=EVENT_SCHEMA)
    state, evolved = replay_batch(events, salt_buckets=8)
    out = table_view(state, evolved)
    assert out.count() > 0
