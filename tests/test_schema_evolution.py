"""Additive schema evolution end-to-end (SURVEY.md §5.4;
BASELINE.json:6 "additive schema-evolution events such as new
tool/metadata columns")."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from merlin_spark.apply import table_view
from merlin_spark.fixtures import ChangelogSpec, gen_changelog, write_segments
from merlin_spark.oracle import expected_state
from merlin_spark.sink import IceboxSink
from merlin_spark.stream import StreamConfig, replay


def test_mid_stream_add_column(spark, tmp_path):
    """S events mid-stream: final schema gains the columns, rows from
    before the evolution backfill NULL, post-evolution carried values
    land, and pre-evolution text equality is unaffected."""
    spec = ChangelogSpec(seed=21, n_events=2500, n_convs=40, n_evo=3,
                         dup_rate=0.05, extra_rate=0.7)
    log = gen_changelog(spec)
    write_segments(log, str(tmp_path / "log"), n_segments=5)
    cfg = StreamConfig(
        log_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # evolution lands in its own batch
    )
    replay(spark, cfg, timeout_s=240)

    sink = IceboxSink(spark, cfg.table_path)
    man = sink.manifest()
    schema_cols = [n for n, _ in man["schema"]]
    for c in spec.evo_cols:
        assert c in schema_cols

    got = (
        table_view(sink.read(), None)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = expected_state(log).reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)
    for c in spec.evo_cols:
        pd.testing.assert_series_equal(
            got[c].fillna("∅"), exp[c].fillna("∅"), check_names=False, check_dtype=False
        )
    # evolution actually carried values (not vacuously all-NULL)
    assert got[spec.evo_cols[0]].notna().sum() > 0


def test_evolution_idempotent_add(spark, tmp_path):
    """Applying the same S event twice (duplicate delivery) adds the
    column once (add-if-absent, SURVEY.md §2.9 rule 4)."""
    sink = IceboxSink(spark, str(tmp_path / "t"))
    man = sink.manifest()
    man = sink._evolve(man, [("meta_x", "string"), ("meta_x", "string")])
    names = [n for n, _ in man["schema"]]
    assert names.count("meta_x") == 1


def test_non_additive_evolution_rejected(spark, tmp_path):
    """Out of contract: only additive adds are legal (SURVEY.md §1.4).
    The event envelope has no drop/rename op kind at all, and a re-add
    with a DIFFERENT type (a type change in disguise) must raise loudly
    instead of silently keeping the old type."""
    spec = ChangelogSpec(seed=1, n_events=200, n_evo=1)
    log = gen_changelog(spec)
    assert set(log["op"].unique()) <= {"I", "U", "D", "S"}

    sink = IceboxSink(spark, str(tmp_path / "t"))
    man = sink._evolve(sink.manifest(), [("meta_x", "string")])
    with pytest.raises(ValueError, match="non-additive"):
        sink._evolve(man, [("meta_x", "bigint")])
    # and the base table columns are protected the same way
    with pytest.raises(ValueError, match="non-additive"):
        sink._evolve(man, [("text", "bigint")])
