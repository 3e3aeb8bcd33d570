"""Replay/convergence golden tests — the contract's heart
(BASELINE.json:6,15; SURVEY.md §5.2).

Batch replay (Spark) vs independent pandas oracle: per-turn text
equality under stable (conv_id, turn_idx) ordering + full-row equality.
"""

from __future__ import annotations

import pandas as pd
import pytest

from merlin_spark.apply import replay_batch, table_view
from merlin_spark.fixtures import ChangelogSpec, gen_changelog
from merlin_spark.oracle import expected_state
from merlin_spark.schemas import EVENT_SCHEMA


def _spark_final(spark, log: pd.DataFrame, salt: int = 0) -> pd.DataFrame:
    events = spark.createDataFrame(log, schema=EVENT_SCHEMA)
    state, evolved = replay_batch(events, salt_buckets=salt)
    out = table_view(state, evolved).toPandas()
    return out.reset_index(drop=True)


def _assert_converged(got: pd.DataFrame, exp: pd.DataFrame):
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # THE invariant: per-turn text equality under stable ordering
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)
    got["turn_idx"] = got["turn_idx"].astype("int64")
    exp = exp.copy()
    exp["turn_idx"] = exp["turn_idx"].astype("int64")
    exp["ts"] = pd.to_datetime(exp["ts"])
    for c in got.columns:
        pd.testing.assert_series_equal(got[c], exp[c], check_names=False, check_dtype=False)


@pytest.mark.parametrize("seed", [42, 7])
def test_batch_replay_matches_oracle(spark, seed):
    spec = ChangelogSpec(seed=seed, n_events=4000, n_convs=60, dup_rate=0.08,
                         ooo_window=64, n_evo=2)
    log = gen_changelog(spec)
    _assert_converged(_spark_final(spark, log), expected_state(log))


def test_salted_replay_identical(spark):
    spec = ChangelogSpec(seed=11, n_events=3000, n_convs=20, zipf_s=1.4, n_evo=1)
    log = gen_changelog(spec)
    plain = _spark_final(spark, log, salt=0)
    salted = _spark_final(spark, log, salt=8)
    pd.testing.assert_frame_equal(plain, salted)


def test_replay_order_independent(spark):
    """Permuting delivery order never changes the converged state
    (BASELINE.json:6: convergence regardless of batching/redelivery)."""
    spec = ChangelogSpec(seed=5, n_events=2000, n_convs=30, dup_rate=0.1, n_evo=1)
    log = gen_changelog(spec)
    shuffled = log.sample(frac=1.0, random_state=99).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        _spark_final(spark, log), _spark_final(spark, shuffled)
    )


def test_delete_then_resurrect(spark):
    import numpy as np
    rows = pd.DataFrame({
        "lsn": [1, 2, 3],
        "op": ["I", "D", "I"],
        "conv_id": ["c1", "c1", "c1"],
        "turn_idx": pd.array([0, 0, 0], dtype="Int32"),
        "role": ["user", None, "user"],
        "text": ["first", None, "second  version"],
        "tool": [None, None, None],
        "ts": pd.to_datetime(["2025-01-01T00:00:01", "2025-01-01T00:00:02",
                               "2025-01-01T00:00:03"]),
        "evo_column": [None] * 3, "evo_type": [None] * 3, "extra": [None] * 3,
    })
    got = _spark_final(spark, rows)
    assert len(got) == 1 and got.loc[0, "text"] == "second version"
    # delete with max (ts,lsn) removes the row
    rows2 = rows.copy()
    rows2.loc[1, "ts"] = pd.Timestamp("2025-01-01T00:00:09")
    assert len(_spark_final(spark, rows2)) == 0
