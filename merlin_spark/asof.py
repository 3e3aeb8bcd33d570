"""As-of join — latest right row at-or-before each left row per key.

CDC point-in-time read shape (SURVEY.md §2.3). Spark has no built-in
as-of join; the idiomatic scale path is cogrouped-pandas: both sides are
hash-partitioned on the key (one shuffle each), then per-key groups are
joined vectorized with ``pd.merge_asof`` inside Arrow batches — no
driver collect, no per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


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
    """
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
