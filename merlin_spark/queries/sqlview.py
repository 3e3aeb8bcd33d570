"""SQL view layer (SURVEY.md §7 stretch item): the engine's tables as
temp views so any analysis is expressible in pure ``spark.sql`` — the
same declarative surface the DataFrame qkeys compile to, letting users
bring existing ANSI SQL instead of the Python API.

``register_views`` is idempotent per session and is exactly what a
Spark SQL catalog (or the Iceberg catalog on a real cluster) provides;
here it is backed by the parquet testdata loader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io_util import TABLES, load
from .base import query

_SQL = """
    SELECT n_name,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 4) AS total_price,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    GROUP BY n_name
"""


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every testdata table as a temp view for spark.sql use."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """Run an ANSI SQL statement against the registered table views."""
    register_views(spark, sf_dir)
    return spark.sql(statement)


# qkeys whose BUILD already executes work (table writes, fixture
# generation) — excluded from bulk view registration so registering
# views stays a lazy, side-effect-free operation
_SIDE_EFFECT_KEYS = {"icebox_time_travel", "binlog_ds_scan"}


def register_query_views(spark: SparkSession, sf_dir: str,
                         keys: list[str] | None = None) -> list[str]:
    """Expose operator RESULTS as temp views (``q_<qkey>``) so users
    compose SQL over them — e.g. join the dedup pair list against the
    text-quality scores. Registration is lazy (DataFrame graphs only;
    nothing executes until a view is queried). Returns the view names
    registered."""
    from .base import QUERIES

    names = []
    for k in (keys if keys is not None
              else [k for k in QUERIES if k not in _SIDE_EFFECT_KEYS]):
        QUERIES[k](spark, sf_dir).createOrReplaceTempView(f"q_{k}")
        names.append(f"q_{k}")
    return names


@query("sql_view_query", _SQL)
def sql_view_query(spark, sf_dir):
    """The SQL entry path end-to-end: views + spark.sql, Catalyst doing
    join ordering/broadcast on its own (nation and customer are small;
    AQE picks broadcast joins at runtime). The oracle is the IDENTICAL
    SQL string run by DuckDB — one dialect-neutral statement."""
    return sql(spark, sf_dir, _SQL)
