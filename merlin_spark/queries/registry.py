"""Query/oracle registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here with a
builder ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a
DuckDB oracle SQL string. The driver compares row-count + schema +
order-insensitive value hash at sf0.01 (__spark_entry__.py docstring).

Conventions (SURVEY.md §3.3):
- every computed column aliased identically in Spark and SQL;
- double aggregates rounded to 4 decimals to kill float-order drift;
- every query's output deterministic (unique sort keys on limits).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


# Importing the modules populates the registry.
from . import relational  # noqa: E402,F401
from . import cdc  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import textstats  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
