"""As-of join — latest right row at-or-before each left row per key.

CDC point-in-time read shape (SURVEY.md §2.3). Spark has no built-in
as-of join; two formulations, same semantics:

- :func:`asof_join` (default) — **union + window**, fully JVM-side: tag
  right rows with a value struct, union both sides, and per key take
  ``last(value_struct, ignorenulls=True)`` over rows ordered by
  ``(ts, side)`` with right rows sorting before left rows at equal ts
  (⇒ ``right.ts <= left.ts`` inclusive). ONE hash shuffle on the key,
  whole-stage codegen, zero Python — the scale path.
- :func:`asof_join_pandas` — cogrouped-pandas ``pd.merge_asof``: both
  sides hash-partitioned on the key, per-key groups joined vectorized
  inside Arrow batches. Kept as the reference formulation and the
  driver-oracled qkey (`asof_join_tolerance`).

Both support ``tolerance`` (bounded lookback, inclusive ``<=`` like
``pd.merge_asof``): the window form packs the right row's ``on`` value
into the match struct and nulls matches older than the bound in the
final projection — still one shuffle, zero Python (r4; equivalence to
the pandas form pinned in tests/test_asof.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: dict[str, str],
    tolerance: pd.Timedelta | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, latest right row with
    ``right.on <= left.on`` within the same ``by`` key.

    right_cols maps right column → output alias (besides on/by).
    Ties among right rows at identical (by, on) resolve to an arbitrary
    but single row (same caveat as DuckDB ASOF / pd.merge_asof).

    ``tolerance`` (pd.Timedelta for timestamp ``on``, or a number for
    numeric ``on``) bounds the lookback inclusively: a match older than
    ``left.on - tolerance`` comes back as NULL, exactly
    ``pd.merge_asof``'s semantics — because the as-of candidate is the
    CLOSEST prior right row, nulling it when it falls outside the bound
    is the complete bounded-lookback answer.
    """
    _check_collisions(left.columns, right_cols)

    l_cols = left.columns
    r_types = {f.name: f.dataType for f in right.schema.fields}
    rv_fields = [
        T.StructField(alias, r_types[src]) for src, alias in right_cols.items()
    ]
    if tolerance is not None:
        # carry the matched right row's `on` so the final projection can
        # apply the bound without a second join or range frame
        rv_fields = [T.StructField("_r_on", r_types[on])] + rv_fields
    rv_type = T.StructType(rv_fields)
    r_struct = [F.col(src).alias(alias) for src, alias in right_cols.items()]
    if tolerance is not None:
        r_struct = [F.col(on).alias("_r_on")] + r_struct
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        F.struct(*r_struct).alias("_rv"),
    )
    l_tagged = left.select(
        *l_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    out = filled.where(F.col("_side") == 1)
    if tolerance is None:
        return out.select(
            *l_cols,
            *[F.col(f"_m.{alias}").alias(alias) for alias in right_cols.values()],
        )
    if isinstance(tolerance, pd.Timedelta):
        # integer ns // 1000, not float total_seconds()*1e6: the float
        # path truncates near-µs values and would diverge from the
        # pandas form on boundary-exact matches (TimestampType is µs
        # anyway, so µs granularity is lossless here)
        micros = tolerance.value // 1000
        bound = F.col(on) - F.expr(f"INTERVAL {micros} MICROSECOND")
    else:
        bound = F.col(on) - F.lit(tolerance)
    # NULL `_m` propagates through `when` as NULL — no-match and
    # out-of-bound-match collapse to the same NULL row, like merge_asof
    ok = F.col("_m._r_on") >= bound
    return out.select(
        *l_cols,
        *[F.when(ok, F.col(f"_m.{alias}")).alias(alias) for alias in right_cols.values()],
    )


_INTERNAL_COLS = ("_side", "_rv", "_m", "_r_on")


def _check_collisions(left_columns: list[str], right_cols: dict[str, str]) -> None:
    """Internal helper columns and output aliases must not collide with
    left columns — a silent collision would produce duplicate/ambiguous
    columns and wrong results instead of a clear error."""
    clash = set(left_columns) & set(_INTERNAL_COLS)
    if clash:
        raise ValueError(
            f"asof_join: left columns {sorted(clash)} collide with internal "
            f"helper names {_INTERNAL_COLS}; rename them before the join"
        )
    alias_clash = set(left_columns) & set(right_cols.values())
    if alias_clash:
        raise ValueError(
            f"asof_join: right_cols aliases {sorted(alias_clash)} already "
            "exist on the left side; choose distinct output aliases"
        )
    alias_internal = set(right_cols.values()) & set(_INTERNAL_COLS)
    if alias_internal:
        # an alias named _r_on would collide with the tolerance path's
        # struct field and resolve ambiguously instead of erroring
        raise ValueError(
            f"asof_join: right_cols aliases {sorted(alias_internal)} collide "
            f"with internal helper names {_INTERNAL_COLS}; rename them"
        )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: dict[str, str],
    tolerance: pd.Timedelta | None = None,
) -> DataFrame:
    """Cogrouped-pandas formulation (SNIPPETS.md:45-48 pattern)."""
    _check_collisions(left.columns, right_cols)
    l_cols = left.columns
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"{alias} {dict((g.name, g.dataType.simpleString()) for g in right.schema.fields)[src]}"
            for src, alias in right_cols.items()
        ]
    )

    def join_group(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values(on, kind="mergesort")
        rr = pd.DataFrame({"_r_on": r[on]})
        for src, alias in right_cols.items():
            rr[alias] = r[src].values
        out = pd.merge_asof(l, rr, left_on=on, right_on="_r_on", tolerance=tolerance)
        return out[l_cols + list(right_cols.values())]

    return (
        left.groupby(by)
        .cogroup(right.groupby(by))
        .applyInPandas(lambda l, r: join_group(l, r), out_schema)
    )
