"""Opt-in convergence soak (set MERLIN_SOAK=1): 10^6 logical events
(~1.1M delivered with duplicates) through the capped binlog source,
merge-on-read sink, periodic compaction, and multi-row-group segments,
compared row-for-row against the pandas oracle.

Not part of the default suite (≈60 s). This exact scenario caught the
silent-partial-replay bug (availableNow single-batch fallback ×
max_lsn_per_trigger) that the small-fixture suite missed — scale soaks
exercise batch/window boundaries the small logs never hit.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

from merlin_spark.apply import table_view
from merlin_spark.fixtures import ChangelogSpec, gen_changelog, write_segments
from merlin_spark.oracle import expected_state
from merlin_spark.sink import IceboxSink
from merlin_spark.stream import StreamConfig, replay

pytestmark = pytest.mark.skipif(
    not os.environ.get("MERLIN_SOAK"),
    reason="slow soak; set MERLIN_SOAK=1 to run",
)


def test_million_event_capped_binlog_convergence(spark):
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="merlin-soak-", dir=base)
    log = gen_changelog(ChangelogSpec(seed=777, n_events=1_000_000,
                                      n_convs=5000, dup_rate=0.10, n_evo=3))
    write_segments(log, f"{tmp}/log", n_segments=24, row_group_size=20000)
    cfg = StreamConfig(f"{tmp}/log", f"{tmp}/table", f"{tmp}/ckpt",
                       source_format="binlog", sink_mode="mor",
                       max_lsn_per_trigger=250_000, compact_every=2)
    replay(spark, cfg, timeout_s=500)
    got = (
        table_view(IceboxSink(spark, f"{tmp}/table").read(), None)
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    exp = expected_state(log).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    pd.testing.assert_series_equal(got["text"], exp["text"], check_names=False)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
