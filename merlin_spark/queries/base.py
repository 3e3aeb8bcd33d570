"""Registration surface for the query/oracle registry.

Query submodules import ``query`` from HERE (never from ``registry``),
so importing any submodule first — e.g. ``tests/test_multimodal_vec.py``
importing ``multimodal`` before anything touches ``registry`` — cannot
re-enter registry mid-initialisation and append keys AFTER the window
rotation ran (the order-dependent suite failure ADVICE r3 #1
reproduced). ``registry`` imports this module plus every submodule and
then rotates the dicts in place; rotation is deterministic regardless
of prior import order because it reorders the FULL key set.
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
