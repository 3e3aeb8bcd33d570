"""JSONL changelog source (SURVEY.md §2.1: "WAL tails are often JSONL")
— the declared-schema JSONL read must replay to a state byte-identical
to the parquet encoding of the same log."""

from __future__ import annotations

import pandas as pd

from merlin_spark.apply import replay_batch, table_view
from merlin_spark.changelog import read_batch
from merlin_spark.fixtures import (
    ChangelogSpec,
    gen_changelog,
    write_segments,
    write_segments_json,
)


def _final(spark, path, fmt):
    events = read_batch(spark, path, fmt=fmt)
    state, evolved = replay_batch(events)
    return (
        table_view(state, evolved)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_jsonl_replay_equals_parquet(spark, tmp_path):
    log = gen_changelog(
        ChangelogSpec(seed=37, n_events=2500, n_convs=40, dup_rate=0.05, n_evo=2)
    )
    write_segments(log, str(tmp_path / "pq"), n_segments=4)
    write_segments_json(log, str(tmp_path / "jl"), n_segments=4)
    pq = _final(spark, str(tmp_path / "pq"), "parquet")
    jl = _final(spark, str(tmp_path / "jl"), "json")
    pd.testing.assert_frame_equal(pq, jl)


def test_csv_replay_equals_parquet(spark, tmp_path):
    """CSV WAL encoding (SURVEY.md §2.1 CSV/JSONL source row): the
    declared-schema CSV read — including quoted unicode/control-char
    payloads and null fields on D events — must replay byte-identically
    to the parquet encoding of the same log."""
    from merlin_spark.fixtures import write_segments_csv

    log = gen_changelog(
        ChangelogSpec(seed=37, n_events=2500, n_convs=40, dup_rate=0.05, n_evo=2)
    )
    write_segments(log, str(tmp_path / "pq"), n_segments=4)
    write_segments_csv(log, str(tmp_path / "cs"), n_segments=4)
    pq = _final(spark, str(tmp_path / "pq"), "parquet")
    cs = _final(spark, str(tmp_path / "cs"), "csv")
    pd.testing.assert_frame_equal(pq, cs)


def test_jsonl_lsn_pushdown_filter(spark, tmp_path):
    log = gen_changelog(ChangelogSpec(seed=37, n_events=1000, n_convs=20, n_evo=0))
    write_segments_json(log, str(tmp_path / "jl"), n_segments=2)
    got = read_batch(spark, str(tmp_path / "jl"), lsn_from=100, lsn_to=500, fmt="json")
    lsns = [r.lsn for r in got.select("lsn").collect()]
    assert lsns and min(lsns) >= 100 and max(lsns) <= 500
