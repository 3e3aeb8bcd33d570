"""Last-writer-wins dedup — THE core CDC operator.

Spec: BASELINE.json:6 — "deduplicated per key with a last-writer-wins
window over (conv_id, turn_idx, ts, lsn)". ``lsn`` is unique, so the
winner is always deterministic.

Two physical strategies, same semantics:

- :func:`lww_dedup_window` — ranking window (row_number over
  (ts,lsn) desc). Requires a full sort of each key group after the
  shuffle; no map-side combine.
- :func:`lww_dedup` (max_by aggregate) — **the hot-path default**:
  Spark plans partial_max_by → shuffle → final_max_by, so duplicate
  events collapse map-side BEFORE the shuffle. On a 10^10-event log
  with redelivery storms this cuts shuffle bytes by the duplication
  factor; on hot keys the partial aggregate is also the first line of
  skew defense.
- :func:`lww_dedup_salted` — explicit two-phase salted variant for
  pathologically hot (conv_id, turn_idx) keys (BASELINE.json:6
  "explicit salting + AQE skew handling"): phase 1 aggregates per
  (key, salt) spreading one key over S reducers, phase 2 reduces the S
  survivors. max_by is associative ⇒ identical result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .schemas import LWW_ORDER, MERGE_KEYS


def _ord_struct() -> "F.Column":
    return F.struct(*[F.col(c) for c in LWW_ORDER])


def lww_dedup(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Keep the max-(ts,lsn) event per key via max_by (partial-agg friendly)."""
    keys = keys or MERGE_KEYS
    payload = [c for c in df.columns if c not in keys]
    row = F.max_by(F.struct(*[F.col(c) for c in payload]), _ord_struct())
    out = df.groupBy(*keys).agg(row.alias("_w"))
    return out.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])


def lww_dedup_salted(df: DataFrame, salt_buckets: int = 16,
                     keys: list[str] | None = None) -> DataFrame:
    """Two-phase salted LWW for hot keys; associative ⇒ same winners."""
    keys = keys or MERGE_KEYS
    payload = [c for c in df.columns if c not in keys]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col("lsn")), F.lit(salt_buckets)))
    row = F.max_by(F.struct(*[F.col(c) for c in payload]), _ord_struct())
    phase1 = salted.groupBy(*keys, "_salt").agg(row.alias("_w"))
    p1 = phase1.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])
    return lww_dedup(p1, keys=keys)


def lww_dedup_window(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Ranking-window formulation (kept for the queries()/oracle parity
    check — SQL-expressible as ROW_NUMBER() OVER (...))."""
    keys = keys or MERGE_KEYS
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in LWW_ORDER]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
