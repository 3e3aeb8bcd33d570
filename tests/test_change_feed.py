"""Change data feed (IceboxSink.read_changes): the net snapshot diff
must equal the pandas-oracle diff of expected states at the two LSN
cutoffs — inserts, deletes, and update pre/post images."""

from __future__ import annotations

import tempfile

import pandas as pd

from merlin_spark.fixtures import ChangelogSpec, gen_changelog, write_segments
from merlin_spark.oracle import expected_state
from merlin_spark.sink import IceboxSink
from merlin_spark.stream import StreamConfig, replay


def _oracle_diff(log: pd.DataFrame, lsn_from: int) -> dict[str, set]:
    """Expected change sets keyed by (conv_id, turn_idx)."""
    a = expected_state(log[log.lsn <= lsn_from]).set_index(["conv_id", "turn_idx"])
    b = expected_state(log).set_index(["conv_id", "turn_idx"])
    inserts = set(b.index) - set(a.index)
    deletes = set(a.index) - set(b.index)
    both = set(a.index) & set(b.index)
    # full-payload diff (read_changes suppresses rewrites whose payload
    # is identical null-safely, so the oracle must compare every
    # user-visible column, not just text)
    payload = [c for c in b.columns]
    updates = {
        k for k in both
        if any(
            not (pd.isna(a.loc[k, c]) and pd.isna(b.loc[k, c]))
            and a.loc[k, c] != b.loc[k, c]
            for c in payload
        )
    }
    return {"insert": inserts, "delete": deletes, "update": updates,
            "b_text": {k: b.loc[k, "text"] for k in updates | inserts},
            "a_text": {k: a.loc[k, "text"] for k in updates | deletes}}


def test_change_feed_matches_oracle_diff(spark):
    spec = ChangelogSpec(seed=7, n_events=6000, n_convs=60, dup_rate=0.1,
                         pct_delete=0.08, n_evo=0)
    log = gen_changelog(spec)
    tmp = tempfile.mkdtemp()
    write_segments(log, f"{tmp}/log", n_segments=4)
    cfg = StreamConfig(f"{tmp}/log", f"{tmp}/table", f"{tmp}/ckpt",
                       n_buckets=8, sink_mode="mor", max_files_per_trigger=1)
    replay(spark, cfg)
    sink = IceboxSink(spark, f"{tmp}/table", n_buckets=8, mode="mor")

    # v after first micro-batch (1 segment) vs final
    man0 = sink.manifest(0)
    lsn_from = man0["lsn_hi"]
    got = sink.read_changes(0).toPandas()
    exp = _oracle_diff(log, lsn_from)

    g_ins = {tuple(r) for r in got.loc[got._change_type == "insert",
                                       ["conv_id", "turn_idx"]].itertuples(index=False)}
    g_del = {tuple(r) for r in got.loc[got._change_type == "delete",
                                       ["conv_id", "turn_idx"]].itertuples(index=False)}
    g_pre = {tuple(r) for r in got.loc[got._change_type == "update_preimage",
                                       ["conv_id", "turn_idx"]].itertuples(index=False)}
    g_post = {tuple(r) for r in got.loc[got._change_type == "update_postimage",
                                        ["conv_id", "turn_idx"]].itertuples(index=False)}

    assert g_ins == exp["insert"]
    assert g_del == exp["delete"]
    assert g_pre == g_post
    # EXACT equality (ADVICE r4 #1): content-identical rewrites are
    # suppressed in read_changes, so the feed's update set must equal
    # the full-payload oracle diff — no superset workaround
    assert g_post == exp["update"]
    post = got[got._change_type.isin(["update_postimage", "insert"])]
    final = expected_state(log).set_index(["conv_id", "turn_idx"])["text"]
    for r in post.itertuples(index=False):
        assert final[(r.conv_id, r.turn_idx)] == r.text


def test_change_feed_same_version_is_empty(spark):
    spec = ChangelogSpec(seed=9, n_events=1500, n_convs=20, dup_rate=0.05, n_evo=0)
    log = gen_changelog(spec)
    tmp = tempfile.mkdtemp()
    write_segments(log, f"{tmp}/log", n_segments=2)
    cfg = StreamConfig(f"{tmp}/log", f"{tmp}/table", f"{tmp}/ckpt",
                       n_buckets=4, sink_mode="mor", max_files_per_trigger=1)
    replay(spark, cfg)
    sink = IceboxSink(spark, f"{tmp}/table", n_buckets=4, mode="mor")
    v = sink.current_version()
    assert sink.read_changes(v, v).count() == 0


def test_change_feed_spans_schema_evolution(spark):
    """Additive evolution between the snapshots: old side aligns to the
    new schema with NULL backfill, and the feed still classifies."""
    spec = ChangelogSpec(seed=11, n_events=4000, n_convs=40, dup_rate=0.1,
                         n_evo=2)
    log = gen_changelog(spec)
    tmp = tempfile.mkdtemp()
    write_segments(log, f"{tmp}/log", n_segments=4)
    cfg = StreamConfig(f"{tmp}/log", f"{tmp}/table", f"{tmp}/ckpt",
                       n_buckets=8, sink_mode="mor", max_files_per_trigger=1)
    replay(spark, cfg)
    sink = IceboxSink(spark, f"{tmp}/table", n_buckets=8, mode="mor")
    got = sink.read_changes(0).toPandas()
    assert len(got) > 0
    assert set(got._change_type) <= {
        "insert", "delete", "update_preimage", "update_postimage"
    }
    # pre/post images pair up
    assert (got._change_type == "update_preimage").sum() == (
        got._change_type == "update_postimage"
    ).sum()
