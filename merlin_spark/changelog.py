"""Changelog (binlog/WAL) sources — batch scan and streaming tail.

Spec: BASELINE.json:14 ("binlog/WAL tail → lake upsert"), BASELINE.json:6
("Structured Streaming micro-batches"). Schemas are always DECLARED
(EVENT_SCHEMA), never inferred — inference is nondeterministic and would
break replay determinism (SURVEY.md §1.4).

Scale notes: the LSN-range predicate lands in parquet PushedFilters →
row-group pruning on 10^10-event logs; `maxFilesPerTrigger` is the
micro-batch sizing knob (segment files are the natural unit of a binlog
tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col

from .schemas import EVENT_SCHEMA


def read_batch(
    spark: SparkSession,
    path: str,
    lsn_from: int | None = None,
    lsn_to: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Bounded scan of a changelog directory, optionally LSN-windowed.

    The `lsn` predicate stays on the raw column (no UDF wrapping) so
    Catalyst pushes it into the parquet scan (SURVEY.md §4).
    """
    reader = spark.read.schema(EVENT_SCHEMA)
    df = _by_fmt(reader, path, fmt)
    if lsn_from is not None:
        df = df.where(col("lsn") >= lsn_from)
    if lsn_to is not None:
        df = df.where(col("lsn") <= lsn_to)
    return df


def read_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Unbounded tail of the changelog directory (micro-batched).

    Pair with ``trigger(availableNow=True)`` for bounded replay (drain
    the log then stop — BASELINE.json:2 replay wall-time metric) or a
    processing-time trigger for continuous tailing.
    """
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return _by_fmt(reader, path, fmt)


def _by_fmt(reader, path: str, fmt: str):
    """Dispatch on changelog encoding. CSV options pin the round trip:
    header row, ISO-microsecond timestamps, and quote-doubling escapes
    (what pandas/arrow writers emit) instead of Spark's backslash
    default — without them quoted text payloads mis-parse silently."""
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        return (
            reader.option("header", True)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            .option("quote", '"')
            .option("escape", '"')
            .csv(path)
        )
    return reader.parquet(path)
