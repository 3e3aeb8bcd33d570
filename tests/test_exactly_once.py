"""Exactly-once / crash-resume / idempotence (SURVEY.md §5.3;
BASELINE.json:6 "idempotent, transactional commits for exactly-once",
"crash-resumable replay")."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from merlin_spark.apply import table_view
from merlin_spark.fixtures import ChangelogSpec, gen_changelog, write_segments
from merlin_spark.lineage import read_lineage
from merlin_spark.oracle import expected_state
from merlin_spark.sink import IceboxSink
from merlin_spark.stream import StreamConfig, replay


def _final(spark, table_path) -> pd.DataFrame:
    got = table_view(IceboxSink(spark, table_path).read(), None).toPandas()
    return got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _expected(log) -> pd.DataFrame:
    return expected_state(log)


def _assert_state(got: pd.DataFrame, exp: pd.DataFrame):
    assert len(got) == len(exp)
    exp = exp.reset_index(drop=True)
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)
    pd.testing.assert_series_equal(
        got["conv_id"], exp["conv_id"], check_names=False
    )


@pytest.fixture()
def log():
    return gen_changelog(
        ChangelogSpec(seed=13, n_events=3000, n_convs=50, dup_rate=0.1, n_evo=2)
    )


def test_crash_resume_converges(spark, tmp_path, log):
    """Kill the stream mid-replay (injected crash AFTER the sink commit
    of batch 1), restart from the same checkpoint: the redelivered
    batch must be skipped by the ledger and the final state converge."""
    write_segments(log, str(tmp_path / "log"), n_segments=6)
    cfg = StreamConfig(
        log_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        fail_after_batch=1,
    )
    with pytest.raises(Exception, match="injected crash"):
        replay(spark, cfg, timeout_s=180)
    # restart without the crash hook — resumes from checkpoint
    cfg.fail_after_batch = None
    replay(spark, cfg, timeout_s=180)
    _assert_state(_final(spark, cfg.table_path), _expected(log))
    # ledger: every batch applied exactly once
    man = IceboxSink(spark, cfg.table_path).manifest()
    assert len(man["applied"]) == len(set(man["applied"]))
    # lineage LSN coverage: every original lsn applied (S events and
    # events that lost LWW within their batch still count in op stats)
    lin = read_lineage(spark, cfg.table_path)
    assert lin is not None and lin.count() > 0


def test_duplicate_segments_idempotent(spark, tmp_path, log):
    """Feed the log TWICE (whole-log duplicate delivery): final state
    must equal single-delivery state (BASELINE.json:6)."""
    seg_dir = str(tmp_path / "log")
    write_segments(log, seg_dir, n_segments=4)
    doubled = pd.concat([log, log], ignore_index=True)
    # deliver dups as later segments
    write_segments(
        log, seg_dir + "_tmp", n_segments=4
    )  # just to mirror file naming; actual dup segments below
    for i, p in enumerate(sorted(os.listdir(seg_dir))):
        src = os.path.join(seg_dir, p)
        dst = os.path.join(seg_dir, f"segment-9{i:05d}.parquet")
        with open(src, "rb") as a, open(dst, "wb") as b:
            b.write(a.read())
    cfg = StreamConfig(
        log_path=seg_dir,
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=3,
    )
    replay(spark, cfg, timeout_s=180)
    _assert_state(_final(spark, cfg.table_path), _expected(doubled))
    # doubled log converges to the same state as the single log
    _assert_state(_final(spark, cfg.table_path), _expected(log))


def test_fresh_checkpoint_same_path_applies_new_events(spark, tmp_path, log):
    """rm -rf checkpoint + re-tail at the SAME path (the common re-tail
    workflow) must not be mistaken for redelivery. The ledger epoch is a
    marker file INSIDE the checkpoint dir: deleting the checkpoint
    rotates the epoch, so the fresh run's batch 0 — which replays the
    whole log in one batch, id far below the old high-water — re-applies
    instead of being silently skipped (which would permanently drop any
    NEW events it contains)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from merlin_spark.fixtures import _event_arrow_schema

    seg_dir = str(tmp_path / "log")
    write_segments(log, seg_dir, n_segments=4)
    cfg = StreamConfig(
        log_path=seg_dir,
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # first run: 4 batches, high-water id 3
    )
    replay(spark, cfg, timeout_s=180)

    # a late segment arrives with one brand-new event
    upd = pd.DataFrame(
        {
            "lsn": pd.array([int(log["lsn"].max()) + 1], dtype="int64"),
            "op": ["U"],
            "conv_id": ["convFRESH"],
            "turn_idx": pd.array([0], dtype="Int32"),
            "role": ["user"],
            "text": ["fresh epoch row"],
            "tool": [None],
            "ts": [pd.Timestamp("2025-02-01")],
            "evo_column": [None],
            "evo_type": [None],
            "extra": [None],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(upd, schema=_event_arrow_schema(), preserve_index=False),
        os.path.join(seg_dir, "segment-900000.parquet"),
    )
    # operator re-tails from a FRESH checkpoint at the same path; the
    # whole log drains as ONE batch (batch_id=0 < old high-water 3)
    shutil.rmtree(cfg.checkpoint_path)
    cfg.max_files_per_trigger = None
    replay(spark, cfg, timeout_s=180)
    got = _final(spark, cfg.table_path)
    assert "convFRESH" in set(got["conv_id"].tolist())
    _assert_state(got, _expected(pd.concat([log, upd], ignore_index=True)))


def test_rerun_after_completion_is_noop(spark, tmp_path, log):
    write_segments(log, str(tmp_path / "log"), n_segments=3)
    cfg = StreamConfig(
        log_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    replay(spark, cfg, timeout_s=180)
    v1 = IceboxSink(spark, cfg.table_path).manifest()["version"]
    replay(spark, cfg, timeout_s=180)
    v2 = IceboxSink(spark, cfg.table_path).manifest()["version"]
    assert v1 == v2


def test_crash_between_data_write_and_manifest_swap(spark, tmp_path):
    """The commit protocol's other crash window (SURVEY.md §5.3): a
    batch that wrote its data files but died BEFORE the atomic manifest
    swap leaves only unreferenced staged files. The redelivered batch
    re-applies cleanly (the ledger never saw the doomed attempt), reads
    never see the orphans, and vacuum GCs them."""
    from merlin_spark.apply import prepare_batch, route_ops, to_stored
    from tests.test_sink_concurrency import _events

    sink = IceboxSink(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    ev = _events(spark, "I", 1, "2025-01-01")
    winners = prepare_batch(route_ops(ev)[0], [])
    # the doomed attempt: data files land, no commit follows
    orphans = sink._write_buckets(to_stored(winners), None, n_parts=4)
    n_orphans = sum(len(fl) for fl in orphans.values())
    assert n_orphans > 0
    assert sink.read_live().count() == 0  # invisible without a manifest

    sink.apply(ev, 0)  # redelivery runs to completion
    assert sink.read_live().count() == 5
    assert sink.vacuum() == n_orphans  # exactly the doomed files GC'd
    assert sink.read_live().count() == 5


def test_batch_vs_streaming_identical(spark, tmp_path, log):
    """The batch fast path and the streaming path are the same engine:
    byte-identical final states (SURVEY.md §3.2)."""
    from merlin_spark.apply import replay_batch
    from merlin_spark.changelog import read_batch

    write_segments(log, str(tmp_path / "log"), n_segments=5)
    cfg = StreamConfig(
        log_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    replay(spark, cfg, timeout_s=180)
    streamed = _final(spark, cfg.table_path)

    events = read_batch(spark, str(tmp_path / "log"))
    state, evolved = replay_batch(events)
    batch = (
        table_view(state, evolved)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(streamed, batch)


def test_metrics_emitted_per_batch(spark, tmp_path, log):
    """BASELINE.json:6,14: metrics each micro-batch — persisted from the
    streaming progress events (input rows, rows/sec, duration split)."""
    import glob
    import json as _json

    write_segments(log, str(tmp_path / "log"), n_segments=4)
    cfg = StreamConfig(
        log_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    replay(spark, cfg, timeout_s=180)
    files = glob.glob(str(tmp_path / "table" / "_metrics" / "*.jsonl"))
    assert files
    recs = [_json.loads(l) for f in files for l in open(f)]
    # exactly one record per applied micro-batch: the listener is
    # uncapped (recentProgress keeps only ~100 events — a long replay
    # would lose early batches if metrics were read once at the end)
    n_batches = IceboxSink(spark, cfg.table_path).manifest()["batch_id"] + 1
    assert len(recs) == n_batches >= 2
    assert all(r["num_input_rows"] > 0 for r in recs)
    # numInputRows counts source rows read during the batch; foreachBatch
    # sinks that trigger multiple actions (evolution scan, stats, write)
    # re-read the source, so the engine reports a multiple of the log size
    assert sum(r["num_input_rows"] for r in recs) >= len(log)
    assert all("addBatch" in r["duration_ms"] for r in recs)
