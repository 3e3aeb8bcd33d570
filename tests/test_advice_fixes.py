"""Regression tests for the round-2 advisory fixes that did not already
have one (the binlog capped-restart fix is covered in
tests/test_binlog_source.py):

1. sink layout adoption — a default-constructed IceboxSink over a table
   written with a different bucket count must adopt the manifest's
   n_buckets (a ctor-supplied count would silently point read_key at
   the wrong bucket and compact() would re-bucket the table);
2. checkpoint-epoch exclusive publish — concurrent starters must all
   agree on ONE epoch (os.rename was last-writer-wins);
3. mor empty-batch rebase — after losing a commit race, an empty batch
   must commit the refreshed manifest's total_rows, not the stale one;
4. agg_pivot empty cells — a fixture missing a (status, priority)
   combination must still hash-match the SQL FILTER oracle (count 0,
   not NULL).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
import pytest

from merlin_spark.apply import prepare_batch, route_ops
from merlin_spark.sink import CommitConflictError, IceboxSink
from merlin_spark.stream import _checkpoint_epoch
from tests.test_sink_concurrency import _events


def test_reader_adopts_bucket_count_from_manifest(spark, tmp_path):
    path = str(tmp_path / "t")
    writer = IceboxSink(spark, path, n_buckets=4, mode="mor")
    writer.apply(_events(spark, "I", 1, "2025-01-01", conv="convZ"), 0)

    reader = IceboxSink(spark, path)  # ctor default is 16 — must adopt 4
    assert reader.n_buckets == 4
    got = reader.read_key("convZ").toPandas()
    assert len(got) == 5  # wrong bucket count would prune to empty

    # maintenance with the default ctor must not re-bucket the table
    reader.compact()
    assert IceboxSink(spark, path).manifest()["n_buckets"] == 4
    assert len(IceboxSink(spark, path).read_key("convZ").toPandas()) == 5


def test_checkpoint_epoch_concurrent_starters_agree(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    with ThreadPoolExecutor(max_workers=8) as ex:
        epochs = list(ex.map(lambda _: _checkpoint_epoch(ckpt), range(8)))
    assert len(set(epochs)) == 1, f"multiple live epochs: {set(epochs)}"
    # restart finds the same marker
    assert _checkpoint_epoch(ckpt) == epochs[0]


def test_mor_empty_batch_rebase_keeps_fresh_total_rows(spark, tmp_path):
    sink = IceboxSink(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    sink.apply(_events(spark, "I", 1, "2025-01-01", conv="convA"), 0)  # v0

    # writer holding the STALE v0 state (total_rows from batch 0)
    stale = sink.manifest(0)
    # a concurrent writer lands batch 1 first → total_rows now 5 again
    # but under a DIFFERENT version; then the stale writer applies an
    # EMPTY batch: its commit conflicts, rebases, and must carry the
    # REFRESHED total_rows forward
    sink.apply(_events(spark, "I", 100, "2025-01-02", conv="convB"), 1)  # v1
    fresh_total = sink.manifest()["total_rows"]

    empty = prepare_batch(
        route_ops(_events(spark, "I", 1, "2025-01-01").limit(0))[0], []
    )
    new_man = sink._apply_mor(stale, empty, 2, [])
    assert new_man["version"] == 2
    assert new_man["total_rows"] == fresh_total, (
        f"stale total_rows {new_man['total_rows']} overwrote the "
        f"concurrent writer's {fresh_total}"
    )


def test_agg_pivot_absent_cells_match_oracle(spark, tmp_path):
    import pyarrow.parquet as pq

    from merlin_spark.queries import registry
    from tests.test_queries_oracle import _canon, duck_run

    src = "/root/testdata/sf0.001/orders.parquet"
    t = pq.read_table(src)
    df = t.to_pandas()
    # remove every ('F', '1-URGENT') row so that pivot cell is absent
    keep = ~((df["o_orderstatus"] == "F") & (df["o_orderpriority"] == "1-URGENT"))
    assert (~keep).any(), "fixture unexpectedly lacks the combination"
    sf = tmp_path / "sf"
    os.makedirs(sf)
    import pyarrow as pa

    from merlin_spark.io_util import TABLES

    for name in TABLES:  # duck_run registers a view per table
        if name != "orders":
            os.symlink(f"/root/testdata/sf0.001/{name}.parquet",
                       str(sf / f"{name}.parquet"))
    pq.write_table(pa.Table.from_pandas(df[keep], preserve_index=False),
                   str(sf / "orders.parquet"))
    got = registry.QUERIES["agg_pivot"](spark, str(sf)).toPandas()
    exp = duck_run(registry.ORACLE_SQL["agg_pivot"], str(sf))
    assert _canon(got) == _canon(exp)
    f_row = got[got["o_orderstatus"] == "F"].iloc[0]
    assert f_row["urgent_n"] == 0  # coalesced, not NULL


# ---------------------------------------------------------------- round-4
# Regression tests for the round-3 advisories (ADVICE.md r3 #2-#4).


def test_empty_commit_carries_resolved_flag_forward(spark, tmp_path):
    """ADVICE r3 #2: a no-op commit after compact() must NOT clear the
    manifest's `resolved` flag — the table is still single-version, and
    clearing it silently reinstated the identity LWW shuffle on reads."""
    sink = IceboxSink(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    sink.apply(_events(spark, "I", 1, "2025-01-01", conv="convA"), 0)
    sink.compact()
    assert sink.manifest()["resolved"] is True

    empty = _events(spark, "I", 1, "2025-01-01").limit(0)
    sink.apply(empty, 1)  # empty micro-batch → ledger-only commit
    man = sink.manifest()
    assert man["resolved"] is True, (
        "empty commit cleared `resolved` on a still-single-version table"
    )
    # a REAL append must still clear it (new versions layer on top)
    sink.apply(_events(spark, "U", 2, "2025-01-02", conv="convA"), 2)
    assert sink.manifest()["resolved"] is False


def test_capped_latest_offset_never_regresses_below_floor(tmp_path):
    """ADVICE r3 #3: after partitions() reveals the committed start, a
    capped latestOffset must clamp to it — at most the FIRST post-restart
    planning call may emit a regressed end, so at most one regressed
    entry ever sits in the engine's offset log."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from merlin_spark.binlog_source import BinlogStreamReader

    log = tmp_path / "log"
    log.mkdir()
    pq.write_table(
        pa.table({"lsn": list(range(1, 1001))}),
        str(log / "seg-000.parquet"),
    )
    r = BinlogStreamReader({"path": str(log), "max_lsn_per_trigger": "50"})
    first = r.latestOffset()["lsn"]
    assert first == 50  # restart-blind first call counts from 0 (known)
    # engine now plans the replayed batch with the checkpointed start
    r.partitions({"lsn": 700}, {"lsn": first})
    # every subsequent planning call must clamp to the committed floor
    assert r.latestOffset()["lsn"] >= 700


def test_capped_replay_empty_log_is_graceful(spark, tmp_path):
    """ADVICE r3 #4: capped binlog replay of an EMPTY log directory must
    return like the uncapped path does, not raise max()-of-empty."""
    from merlin_spark.stream import StreamConfig, replay

    log = tmp_path / "log"
    log.mkdir()
    cfg = StreamConfig(
        log_path=str(log),
        table_path=str(tmp_path / "t"),
        checkpoint_path=str(tmp_path / "ckpt"),
        source_format="binlog",
        max_lsn_per_trigger=100,
    )
    replay(spark, cfg, timeout_s=60.0)  # must not raise
