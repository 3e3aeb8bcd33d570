"""As-of join: the JVM union+window formulation must agree with the
cogrouped-pandas merge_asof formulation (and, via the oracle suite,
with DuckDB's native ASOF JOIN)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from merlin_spark.asof import asof_join, asof_join_pandas
from merlin_spark.io_util import load


def _sides(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.where(F.col("event_type") == "view").select("user_id", "ts")
    return purchases, views


def test_window_equals_pandas_formulation(spark, sf_dir):
    purchases, views = _sides(spark, sf_dir)
    a = (
        asof_join(purchases, views, on="ts", by="user_id",
                  right_cols={"ts": "last_view_ts"})
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    b = (
        asof_join_pandas(purchases, views, on="ts", by="user_id",
                         right_cols={"ts": "last_view_ts"})
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_window_formulation_is_python_free(spark, sf_dir):
    """The default as-of join must not plan any Python/Arrow eval node
    (it is the scale path — SURVEY.md §2.3)."""
    purchases, views = _sides(spark, sf_dir)
    df = asof_join(purchases, views, on="ts", by="user_id",
                   right_cols={"ts": "last_view_ts"})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "FlatMapCoGroups" not in plan


def test_collision_with_internal_or_alias_names_raises(spark, sf_dir):
    """Helper columns (_side/_rv/_m) and output aliases colliding with
    left columns must raise clearly, not silently produce duplicate /
    ambiguous columns (ADVICE round 1)."""
    import pytest

    purchases, views = _sides(spark, sf_dir)
    with pytest.raises(ValueError, match="internal helper"):
        asof_join(purchases.withColumn("_side", F.lit(1)), views,
                  on="ts", by="user_id", right_cols={"ts": "last_view_ts"})
    with pytest.raises(ValueError, match="aliases"):
        asof_join(purchases, views, on="ts", by="user_id",
                  right_cols={"ts": "event_id"})  # alias exists on left
    with pytest.raises(ValueError, match="internal helper"):
        # an alias named like the tolerance path's struct field would
        # resolve ambiguously instead of erroring (r4 review finding)
        asof_join(purchases, views, on="ts", by="user_id",
                  right_cols={"ts": "_r_on"})


def test_tolerance_bounds_lookback(spark, sf_dir):
    purchases, views = _sides(spark, sf_dir)
    tol = asof_join(purchases, views, on="ts", by="user_id",
                    right_cols={"ts": "last_view_ts"},
                    tolerance=pd.Timedelta(0)).toPandas()
    # zero tolerance: only exact-ts matches survive
    matched = tol["last_view_ts"].notna()
    assert (tol.loc[matched, "last_view_ts"] == tol.loc[matched, "ts"]).all()


def test_tolerance_window_equals_pandas_formulation(spark, sf_dir):
    """The r4 native JVM tolerance path must agree row-for-row with the
    cogrouped-pandas merge_asof form at a nonzero bound that actually
    nulls some matches (2h on the events fixture does)."""
    purchases, views = _sides(spark, sf_dir)
    kw = dict(on="ts", by="user_id", right_cols={"ts": "last_view_ts"},
              tolerance=pd.Timedelta(hours=2))
    a = (asof_join(purchases, views, **kw)
         .toPandas().sort_values("event_id").reset_index(drop=True))
    b = (asof_join_pandas(purchases, views, **kw)
         .toPandas().sort_values("event_id").reset_index(drop=True))
    # the bound must bite, else this test proves nothing
    assert a["last_view_ts"].isna().any() and a["last_view_ts"].notna().any()
    pd.testing.assert_frame_equal(a, b)


def test_tolerance_window_is_python_free(spark, sf_dir):
    """tolerance used to fall back to the cogrouped-pandas path; since r4
    the window form handles it JVM-side — keep it that way."""
    purchases, views = _sides(spark, sf_dir)
    df = asof_join(purchases, views, on="ts", by="user_id",
                   right_cols={"ts": "last_view_ts"},
                   tolerance=pd.Timedelta(hours=2))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "FlatMapCoGroups" not in plan
