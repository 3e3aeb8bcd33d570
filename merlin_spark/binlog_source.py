"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) exposing
a binlog directory as `format("merlin_binlog")` — batch AND streaming.

Why a custom source when `changelog.py` already reads parquet?
The binlog abstraction is LSN-addressed, not file-addressed:

- **batch**: `lsn_from`/`lsn_to` options prune whole SEGMENT FILES by
  their parquet-footer lsn min/max before any executor task launches —
  planner-visible partition pruning driven by binlog semantics (the
  file-source equivalent needs row-group stats after scheduling a task
  per file).
- **streaming**: offsets ARE lsns (`{"lsn": N}`), not file names — the
  checkpoint stores binlog positions, so the stream can resume from an
  arbitrary LSN, exactly how a WAL/binlog tail (Debezium-style)
  checkpoints. `readBetweenOffsets` replays any historical LSN window.

Partition = one segment file; `read()` yields pyarrow RecordBatches
(zero row-at-a-time Python on the data path, BASELINE.json:15).

The streaming half uses the Simple stream-reader API (driver-side
fetch): right for control-plane-sized tails and tests; the bulk replay
path remains `changelog.read_stream` (executor-parallel file source).

Usage:
    spark.dataSource.register(BinlogDataSource)
    spark.read.format("merlin_binlog").option("path", d)
         .option("lsn_from", 100).load()
    spark.readStream.format("merlin_binlog").option("path", d).load()
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_DDL = (
    "lsn bigint, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp, evo_column string, "
    "evo_type string, extra string"
)
_COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts",
         "evo_column", "evo_type", "extra"]


def _segments(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def _lsn_range(fp: str) -> tuple[int, int]:
    """Segment lsn bounds from the parquet footer — metadata only."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fp).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    j = idx["lsn"]
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(j).statistics
        if st is None:
            return (-(2**62), 2**62)  # no stats → never prune
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return (int(lo), int(hi))


class _SegmentPartition(InputPartition):
    def __init__(self, fp: str, lsn_from: int | None, lsn_to: int | None):
        self.fp = fp
        self.lsn_from = lsn_from
        self.lsn_to = lsn_to


class BinlogBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.lsn_from = int(options["lsn_from"]) if "lsn_from" in options else None
        self.lsn_to = int(options["lsn_to"]) if "lsn_to" in options else None

    def partitions(self):
        parts = []
        for fp in _segments(self.path):
            lo, hi = _lsn_range(fp)
            if self.lsn_from is not None and hi < self.lsn_from:
                continue  # footer-pruned: segment entirely below window
            if self.lsn_to is not None and lo > self.lsn_to:
                continue  # entirely above window
            parts.append(_SegmentPartition(fp, self.lsn_from, self.lsn_to))
        # empty dir / fully pruned: Spark requires ≥1 partition only if
        # data exists; an empty list is accepted as an empty relation
        return parts or [_SegmentPartition("", None, None)]

    def read(self, partition: _SegmentPartition):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if not partition.fp:
            return iter(())
        table = pq.read_table(partition.fp, columns=_COLS)
        if partition.lsn_from is not None:
            table = table.filter(pc.field("lsn") >= partition.lsn_from)
        if partition.lsn_to is not None:
            table = table.filter(pc.field("lsn") <= partition.lsn_to)
        return iter(table.to_batches())


class BinlogStreamReader(SimpleDataSourceStreamReader):
    """LSN-offset streaming tail: offset dict = {"lsn": high_water}."""

    def __init__(self, options):
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"lsn": 0}

    def _rows_between(self, lo_excl: int, hi_incl: int | None) -> list[tuple]:
        # returns a LIST (not a generator): the Simple stream-reader
        # runner caches and copy.copy()s the iterator it receives, and
        # generators are not copyable
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        rows: list[tuple] = []
        for fp in _segments(self.path):
            flo, fhi = _lsn_range(fp)
            if fhi <= lo_excl or (hi_incl is not None and flo > hi_incl):
                continue
            t = pq.read_table(fp, columns=_COLS)
            t = t.filter(pc.field("lsn") > lo_excl)
            if hi_incl is not None:
                t = t.filter(pc.field("lsn") <= hi_incl)
            rows.extend(tuple(r[c] for c in _COLS) for r in t.to_pylist())
        return rows

    def read(self, start: dict):
        lo = int(start.get("lsn", 0))
        hi = lo
        for fp in _segments(self.path):
            hi = max(hi, _lsn_range(fp)[1])
        if hi <= lo:
            return iter([]), {"lsn": lo}
        return iter(self._rows_between(lo, hi)), {"lsn": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows_between(int(start.get("lsn", 0)), int(end["lsn"])))

    def commit(self, end: dict) -> None:
        pass  # source is an immutable log; nothing to ack


class BinlogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "merlin_binlog"

    def schema(self) -> str:
        return EVENT_DDL

    def reader(self, schema) -> DataSourceReader:
        return BinlogBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return BinlogStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(BinlogDataSource)
