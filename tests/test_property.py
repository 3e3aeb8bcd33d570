"""Property-based randomized convergence (SURVEY.md §5.5): for random
changelogs across skew/op-mix/duplication/batching, streaming replay ≡
batch replay ≡ pandas oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from merlin_spark.apply import replay_batch, table_view
from merlin_spark.changelog import read_batch
from merlin_spark.fixtures import ChangelogSpec, gen_changelog, write_segments
from merlin_spark.oracle import expected_state
from merlin_spark.sink import IceboxSink
from merlin_spark.stream import StreamConfig, replay

SPECS = [
    ChangelogSpec(seed=101, n_events=1500, n_convs=10, zipf_s=1.6, dup_rate=0.2,
                  pct_delete=0.2, n_evo=0),  # heavy skew + deletes
    ChangelogSpec(seed=102, n_events=1500, n_convs=300, zipf_s=0.0, dup_rate=0.0,
                  ooo_window=1, n_evo=1),  # uniform, in-order
    ChangelogSpec(seed=103, n_events=1500, n_convs=50, dup_rate=0.3,
                  ooo_window=400, n_evo=3, extra_rate=0.9),  # chaos
    ChangelogSpec(seed=104, n_events=1500, n_convs=5, max_turns=3,
                  pct_update=0.5, pct_delete=0.25, n_evo=0),  # churn on few keys
]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"seed{s.seed}")
def test_three_way_convergence(spark, tmp_path, spec):
    log = gen_changelog(spec)
    exp = expected_state(log).reset_index(drop=True)

    # streaming replay through the transactional sink
    write_segments(log, str(tmp_path / "log"), n_segments=5)
    cfg = StreamConfig(
        log_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "table"),
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        n_buckets=8,
    )
    replay(spark, cfg, timeout_s=240)
    streamed = (
        table_view(IceboxSink(spark, cfg.table_path).read(), None)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    # batch fast path over the same segments
    state, evolved = replay_batch(read_batch(spark, str(tmp_path / "log")))
    batch = (
        table_view(state, evolved)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    pd.testing.assert_frame_equal(streamed, batch)
    assert len(streamed) == len(exp)
    pd.testing.assert_series_equal(streamed["text"], exp["text"], check_names=False)
    pd.testing.assert_series_equal(
        streamed["conv_id"], exp["conv_id"], check_names=False
    )
    pd.testing.assert_series_equal(
        streamed["turn_idx"].astype("int64"),
        exp["turn_idx"].astype("int64"),
        check_names=False,
    )
