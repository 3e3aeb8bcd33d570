"""Pre-submit mirror of the driver's correctness gate: every qkey in
the registry runs on Spark AND (when present) its DuckDB oracle SQL,
compared on row count + column names + order-insensitive values
(__spark_entry__.py contract)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from merlin_spark.io_util import TABLES
from merlin_spark.queries import registry


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    # Mirror the driver exactly: it sort_values over ALL columns, which
    # RAISES TypeError on unhashable list/dict cells. r3's local mirror
    # stringified lists instead, masking the driver crash that zeroed
    # dedup_simhash/mm_embed_binary signal — do NOT soften this again
    # (tests/test_registry_lint.py is the schema-level guard).
    df = df.sort_values(by=list(df.columns))
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                vals.append("NULL")
            elif isinstance(v, (np.integer, int)) and not isinstance(v, bool):
                vals.append(str(int(v)))
            elif isinstance(v, (np.floating, float)):
                vals.append(f"{float(v):.4f}")
            elif isinstance(v, pd.Timestamp):
                vals.append(v.isoformat())
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_vs_oracle(spark, sf_dir, name):
    got = registry.QUERIES[name](spark, sf_dir).toPandas()
    if name not in registry.ORACLE_SQL:
        assert got is not None and len(got.columns) > 0  # rows-only check
        return
    exp = duck_run(registry.ORACLE_SQL[name], sf_dir)
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    cg, ce = _canon(got), _canon(exp)
    mism = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:5]
    assert cg == ce, f"{name}: first mismatches at {mism}: " + "; ".join(
        f"{cg[i]} != {ce[i]}" for i in mism
    )
