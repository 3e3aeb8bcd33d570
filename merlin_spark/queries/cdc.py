"""CDC-core operator qkeys, phrased over the driver's batch tables.

The engine's hot-path operators (op routing, LWW dedup in both physical
forms, conversation reassembly, text normalization UDF, as-of join,
lineage aggregation) proven against the DuckDB oracle on `events` /
`documents` — same DataFrame builders the streaming path uses, batch
substrate (SURVEY.md §2.2/2.4/2.5/2.9).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..asof import asof_join
from ..io_util import load
from ..textnorm import normalize_text
from .base import query

# LWW key/order stand-ins on the events table: key=(user_id, event_type),
# order=(ts, event_id) — event_id unique like lsn.

_QK_LOG_PATH = os.path.join(tempfile.gettempdir(), "merlin_qk_changelog_s42")


def _ensure_qk_log() -> str:
    """Seeded deterministic changelog fixture shared by the changelog /
    binlog scan qkeys AND their DuckDB oracles (the oracle SQL
    read_parquet()s the same segment files — driver hash check becomes
    exact instead of rows-only). Built atomically: write to a unique
    temp dir, rename into place (concurrent builders agree — content is
    deterministic)."""
    if not os.path.isdir(_QK_LOG_PATH) or not os.listdir(_QK_LOG_PATH):
        from ..fixtures import ChangelogSpec, gen_changelog, write_segments

        log = gen_changelog(ChangelogSpec(seed=42, n_events=5000, n_convs=50))
        stage = tempfile.mkdtemp(prefix="merlin_qk_stage_")
        write_segments(log, stage, n_segments=4)
        try:
            os.rename(stage, _QK_LOG_PATH)
        except OSError:  # lost the race: another process renamed first
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
    return _QK_LOG_PATH


# the fixture must exist whenever the ORACLE side runs too (the driver
# may evaluate either side first) — build it at registry-import time
_ensure_qk_log()

_CHANGELOG_ORACLE = f"""
SELECT lsn, op, conv_id, turn_idx, role, text
FROM read_parquet('{_QK_LOG_PATH}/*.parquet')
WHERE lsn BETWEEN 1000 AND 4000
"""


@query("changelog_scan", _CHANGELOG_ORACLE)
def changelog_scan(spark, sf_dir):
    """Bounded LSN-range scan of a binlog directory (SURVEY.md §2.1 qkey
    ``changelog_scan``): seeded synthetic segments (no external data),
    declared EVENT_SCHEMA, `lsn BETWEEN` pushed into the parquet scan
    (row-group pruning at 10^10-event scale). Oracle: DuckDB
    read_parquet over the same seeded segment files."""
    from ..changelog import read_batch

    return read_batch(spark, _ensure_qk_log(), lsn_from=1000, lsn_to=4000).select(
        "lsn", "op", "conv_id", "turn_idx", "role", "text"
    )


@query("binlog_ds_scan", _CHANGELOG_ORACLE)
def binlog_ds_scan(spark, sf_dir):
    """LSN-window scan through the custom `merlin_binlog` Python
    DataSource (Spark 4 pyspark.sql.datasource): segment files pruned
    by parquet-footer lsn bounds BEFORE task scheduling, Arrow-batch
    reads. Same seeded log and DuckDB oracle as changelog_scan — the
    custom DataSource must be value-identical to the plain scan."""
    from ..binlog_source import register

    path = _ensure_qk_log()
    register(spark)
    return (
        spark.read.format("merlin_binlog").option("path", path)
        .option("lsn_from", 1000).option("lsn_to", 4000).load()
        .select("lsn", "op", "conv_id", "turn_idx", "role", "text")
    )


@query(
    "cdc_op_route",
    """SELECT event_id, user_id, event_type, round(value, 4) AS value
       FROM events WHERE event_type IN ('purchase', 'error')""",
)
def cdc_op_route(spark, sf_dir):
    """Op-kind routing filter (split upserts/deletes/schema events)."""
    e = load(spark, sf_dir, "events")
    return e.where(F.col("event_type").isin("purchase", "error")).select(
        "event_id", "user_id", "event_type", F.round("value", 4).alias("value")
    )


_LWW_ORACLE = """
SELECT user_id, event_type, event_id, ts, round(value, 4) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""


@query("win_lww_dedup", _LWW_ORACLE)
def win_lww_dedup(spark, sf_dir):
    """LWW dedup, ranking-window formulation (SURVEY.md §2.5)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts",
                F.round("value", 4).alias("value"))
    )


@query("agg_lww_maxby", _LWW_ORACLE)
def agg_lww_maxby(spark, sf_dir):
    """LWW dedup, max_by-aggregate formulation — the hot-path physical
    strategy (map-side partial combine; SURVEY.md §2.4). Same oracle as
    win_lww_dedup: both must produce identical winners."""
    e = load(spark, sf_dir, "events")
    w = F.max_by(
        F.struct("event_id", "ts", "value"), F.struct("ts", "event_id")
    ).alias("_w")
    return (
        e.groupBy("user_id", "event_type")
        .agg(w)
        .select(
            "user_id", "event_type",
            F.col("_w.event_id").alias("event_id"),
            F.col("_w.ts").alias("ts"),
            F.round("_w.value", 4).alias("value"),
        )
    )


@query("agg_lww_salted", _LWW_ORACLE)
def agg_lww_salted(spark, sf_dir):
    """Two-phase SALTED LWW — the explicit hot-key skew strategy
    (BASELINE.json:6 "explicit salting"): phase 1 max_by per
    (key, salt = xxhash64(event_id) % 16) spreads a pathologically hot
    key across 16 reducers; phase 2 reduces the 16 survivors. max_by is
    associative, so the SAME oracle as win_lww_dedup/agg_lww_maxby must
    hash-match — driver-verified equivalence of the skew path
    (lww.lww_dedup_salted is the engine twin over the changelog
    schema, pytest-covered in tests/test_skew.py)."""
    e = load(spark, sf_dir, "events")
    w = F.max_by(
        F.struct("event_id", "ts", "value"), F.struct("ts", "event_id")
    ).alias("_w")
    p1 = (
        e.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
        .groupBy("user_id", "event_type", "_salt")
        .agg(w)
        .select(
            "user_id", "event_type",
            F.col("_w.event_id").alias("event_id"),
            F.col("_w.ts").alias("ts"),
            F.col("_w.value").alias("value"),
        )
    )
    w2 = F.max_by(
        F.struct("event_id", "ts", "value"), F.struct("ts", "event_id")
    ).alias("_w")
    return (
        p1.groupBy("user_id", "event_type")
        .agg(w2)
        .select(
            "user_id", "event_type",
            F.col("_w.event_id").alias("event_id"),
            F.col("_w.ts").alias("ts"),
            F.round("_w.value", 4).alias("value"),
        )
    )


@query(
    "agg_conv_reassembly",
    """SELECT user_id,
              string_agg(event_type, ',' ORDER BY ts, event_id) AS journey,
              count(*) AS n_events
       FROM events GROUP BY user_id""",
)
def agg_conv_reassembly(spark, sf_dir):
    """Reassemble an ordered per-key sequence (conversation turns →
    user journey): collect_list of (order-key, value) structs sorted
    post-hoc — sort_array on struct gives a deterministic order without
    a window shuffle."""
    e = load(spark, sf_dir, "events")
    seq = F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type")))
    return e.groupBy("user_id").agg(
        F.concat_ws(",", F.transform(seq, lambda s: s["event_type"])).alias("journey"),
        F.count("*").alias("n_events"),
    )


@query(
    "udf_normalize_text",
    r"""SELECT doc_id,
              trim(regexp_replace(regexp_replace(nfc_normalize(text),
                       '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                   '[ \t\n\r\x0b\x0c]+', ' ', 'g'),
                   ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))
                AS norm_text
       FROM documents""",
)
def udf_normalize_text(spark, sf_dir):
    """The vectorized text-normalization pandas UDF (BASELINE.json:6)
    vs an independent DuckDB regexp implementation of the same pinned
    spec (textnorm module docstring)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", normalize_text(F.col("text")).alias("norm_text"))


@query(
    "udaf_group_checksum",
    """SELECT source,
              md5(string_agg(text, '|' ORDER BY doc_id)) AS checksum,
              count(*) AS n_docs
       FROM documents GROUP BY source""",
)
def udaf_group_checksum(spark, sf_dir):
    """Custom vectorized aggregate via applyInPandas: deterministic
    per-group content checksum (the conversation-checksum shape,
    SURVEY.md §2.4) — order pinned by doc_id inside the group."""
    d = load(spark, sf_dir, "documents").select("source", "doc_id", "text")

    def checksum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        joined = "|".join(pdf["text"].tolist())
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "checksum": [hashlib.md5(joined.encode("utf-8")).hexdigest()],
                "n_docs": [len(pdf)],
            }
        )

    return d.groupBy("source").applyInPandas(
        checksum, "source string, checksum string, n_docs bigint"
    )


@query(
    "asof_join_events",
    """SELECT p.event_id, p.user_id, p.ts, round(p.value, 4) AS value,
              v.ts AS last_view_ts
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
         ON p.user_id = v.user_id AND v.ts <= p.ts""",
)
def asof_join_events(spark, sf_dir):
    """As-of join via the JVM-side union+window formulation (asof.asof_join) —
    for each purchase, the latest prior view by the same user. DuckDB's
    native ASOF JOIN is the oracle."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("value")
    )
    views = e.where(F.col("event_type") == "view").select("user_id", "ts")
    return asof_join(
        purchases, views, on="ts", by="user_id", right_cols={"ts": "last_view_ts"}
    )


@query(
    "asof_join_tolerance",
    """SELECT p.event_id, p.user_id, p.ts, round(p.value, 4) AS value,
              CASE WHEN v.ts IS NOT NULL AND p.ts - v.ts <= INTERVAL 2 HOUR
                   THEN v.ts END AS last_view_ts
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
         ON p.user_id = v.user_id AND v.ts <= p.ts""",
)
def asof_join_tolerance(spark, sf_dir):
    """As-of join with bounded lookback (`tolerance` = 2 h), hash-oracled
    vs DuckDB ASOF + CASE bound. Runs the JVM union+window form — since
    r4 it handles `tolerance` natively (one `when()` in the final
    projection, still zero Python); equivalence to the cogrouped-pandas
    `pd.merge_asof` form is pinned in tests/test_asof.py. DuckDB ASOF
    picks the latest prior view, and because that candidate is the
    CLOSEST one, nulling it when it falls outside the tolerance is
    exactly merge_asof's bounded-lookback semantics."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("value")
    )
    views = e.where(F.col("event_type") == "view").select("user_id", "ts")
    return asof_join(
        purchases, views, on="ts", by="user_id",
        right_cols={"ts": "last_view_ts"},
        tolerance=pd.Timedelta(hours=2),
    )


@query(
    "lineage_op_counts",
    """SELECT event_type AS op,
              count(*) AS n_rows,
              min(event_id) AS lsn_lo,
              max(event_id) AS lsn_hi,
              count(DISTINCT user_id) AS n_keys
       FROM events GROUP BY event_type""",
)
def lineage_op_counts(spark, sf_dir):
    """The lineage-emit aggregation shape (BASELINE.json:6: per-batch
    applied LSN ranges + row counts per op)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(F.col("event_type").alias("op")).agg(
        F.count("*").alias("n_rows"),
        F.min("event_id").alias("lsn_lo"),
        F.max("event_id").alias("lsn_hi"),
        F.countDistinct("user_id").alias("n_keys"),
    )


@query(
    "udtf_parse_wal",
    """SELECT event_id AS lsn,
              'I' AS op,
              user_id::VARCHAR AS conv_id,
              (event_id % 40)::INTEGER AS turn_idx,
              event_type AS payload
       FROM events""",
)
def udtf_parse_wal(spark, sf_dir):
    """Python UDTF (Spark 4) exploding raw text WAL lines into typed
    change events — the SURVEY.md §2.9 stretch row, kept ONLY to cover
    the UDTF operator itself. UDTF eval is per-row Python; the
    PRODUCTION raw-WAL ingestion path is `wal_parse_builtin` below
    (identical semantics + oracle, pure JVM `split` builtins, zero
    Python) — use that one in any hot path. The encode→parse round trip
    is pure string algebra over `events`, so the oracle reimplements it
    directly in SQL (hash-checked)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lsn bigint, op string, conv_id string, turn_idx int, payload string")
    class ParseWal:
        def eval(self, line: str):
            if not line:
                return
            parts = line.split("|", 4)
            if len(parts) == 5:
                yield int(parts[0]), parts[1], parts[2], int(parts[3]), parts[4]

    lines = load(spark, sf_dir, "events").select(
        F.concat_ws(
            "|",
            "event_id",
            F.lit("I"),
            "user_id",
            F.pmod("event_id", F.lit(40)),
            "event_type",
        ).alias("line")
    )
    lines.createOrReplaceTempView("_wal_lines")
    spark.udtf.register("parse_wal_udtf", ParseWal)
    return spark.sql(
        "SELECT w.lsn, w.op, w.conv_id, w.turn_idx, w.payload "
        "FROM _wal_lines, LATERAL parse_wal_udtf(line) w"
    )


@query(
    "wal_parse_builtin",
    """SELECT event_id AS lsn,
              'I' AS op,
              user_id::VARCHAR AS conv_id,
              (event_id % 40)::INTEGER AS turn_idx,
              event_type AS payload
       FROM events""",
)
def wal_parse_builtin(spark, sf_dir):
    """Production raw-WAL line parsing, zero Python (VERDICT r3 task
    #8): the same pipe-delimited lines `udtf_parse_wal` consumes, split
    with JVM builtins inside whole-stage codegen — `split(line, '|', 5)`
    (limit 5 keeps embedded pipes in the payload tail, mirroring the
    UDTF's `line.split('|', 4)`) + element_at casts. Identical output
    and oracle as the UDTF twin, so the driver hash proves the two
    formulations equivalent while this one stays Arrow/JVM-side — the
    path a 100 TB WAL tail actually uses."""
    lines = load(spark, sf_dir, "events").select(
        F.concat_ws(
            "|",
            "event_id",
            F.lit("I"),
            "user_id",
            F.pmod("event_id", F.lit(40)),
            "event_type",
        ).alias("line")
    )
    p = F.split("line", "\\|", 5)
    return lines.select(
        F.element_at(p, 1).cast("bigint").alias("lsn"),
        F.element_at(p, 2).alias("op"),
        F.element_at(p, 3).alias("conv_id"),
        F.element_at(p, 4).cast("int").alias("turn_idx"),
        F.element_at(p, 5).alias("payload"),
    ).where(F.size(p) == 5)


def _events_as_changelog(df, op, lsn_off=0, ts_shift=0, upper=False):
    """Shared fixture-builder for the icebox_* qkeys: reshape `events`
    rows into transcript changelog events (one definition — the
    time-travel and change-feed tables must never silently diverge)."""
    text = F.upper("event_type") if upper else F.col("event_type")
    return df.select(
        (F.col("event_id") + lsn_off).alias("lsn"),
        F.lit(op).alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        text.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.col("ts") + F.expr(f"INTERVAL {ts_shift} HOURS")).alias("ts"),
        F.lit(None).cast("string").alias("evo_column"),
        F.lit(None).cast("string").alias("evo_type"),
        F.lit(None).cast("string").alias("extra"),
    )


@query(
    "icebox_time_travel",
    """SELECT 'v0' AS snap, 'u' || CAST(user_id AS VARCHAR) AS conv_id,
              CAST(event_id AS INTEGER) AS turn_idx, event_type AS text
       FROM events WHERE event_id <= 5000
       UNION ALL
       SELECT 'v1', 'u' || CAST(user_id AS VARCHAR),
              CAST(event_id AS INTEGER),
              CASE WHEN event_id <= 1000 THEN upper(event_type)
                   ELSE event_type END
       FROM events""",
)
def icebox_time_travel(spark, sf_dir):
    """The transactional sink itself as a hash-oracled query: build an
    icebox mor table from `events` in two atomic commits — batch 0
    inserts event_id ≤ 5000, batch 1 inserts the rest AND re-emits
    event_id ≤ 1000 as later-(ts,lsn) LWW updates (text uppercased) —
    then read snapshot v0 (time travel) and the current version. The
    returned rows therefore hash-verify bucketed writes, atomic
    snapshot commits, merge-on-read LWW resolution, update-beats-insert
    ordering, and `VERSION AS OF` isolation against a pure-SQL oracle
    (sink.py read_version/read_live). The table is built under a
    per-invocation unique temp dir and removed after the result is
    materialized (localCheckpoint cuts the lineage first)."""
    import shutil

    from ..sink import IceboxSink

    ev = load(spark, sf_dir, "events")

    # per-invocation unique dir (VERDICT r3 wrong #5): a deterministic
    # md5(sf_dir) path raced when two harness processes hit the same
    # sf_dir — one rmtree'ing mid-build of the other. uuid suffix makes
    # builds disjoint; the tree is removed after materialization below.
    path = tempfile.mkdtemp(prefix="merlin-ttq-")
    sink = IceboxSink(spark, path, n_buckets=8, mode="mor")
    batch0 = _events_as_changelog(ev.where(F.col("event_id") <= 5000), "I")
    batch1 = _events_as_changelog(ev.where(F.col("event_id") > 5000), "I").unionByName(
        _events_as_changelog(ev.where(F.col("event_id") <= 1000), "U",
                     lsn_off=1_000_000, ts_shift=1, upper=True)
    )
    sink.apply(batch0, 0)
    sink.apply(batch1, 1)
    v0 = sink.read_live(man=sink.manifest(0))
    v1 = sink.read_live()
    out = (
        v0.select(F.lit("v0").alias("snap"), "conv_id", "turn_idx", "text")
        .unionByName(
            v1.select(F.lit("v1").alias("snap"), "conv_id", "turn_idx", "text")
        )
        .orderBy("snap", "conv_id", "turn_idx")
    )
    # eager localCheckpoint materializes the result into Spark-managed
    # storage and cuts the lineage back to the temp table's parquet
    # files, so the unique dir can be removed before returning (the
    # caller's later collect never touches `path`)
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "icebox_change_feed",
    """SELECT 'insert' AS _change_type,
              'u' || CAST(user_id AS VARCHAR) AS conv_id,
              CAST(event_id AS INTEGER) AS turn_idx, event_type AS text
       FROM events WHERE event_id > 5000
       UNION ALL
       SELECT 'update_preimage', 'u' || CAST(user_id AS VARCHAR),
              CAST(event_id AS INTEGER), event_type
       FROM events WHERE event_id <= 1000
       UNION ALL
       SELECT 'update_postimage', 'u' || CAST(user_id AS VARCHAR),
              CAST(event_id AS INTEGER), upper(event_type)
       FROM events WHERE event_id <= 1000
       UNION ALL
       SELECT 'delete', 'u' || CAST(user_id AS VARCHAR),
              CAST(event_id AS INTEGER), event_type
       FROM events WHERE event_id > 1000 AND event_id <= 1200""",
)
def icebox_change_feed(spark, sf_dir):
    """Change data feed (sink.read_changes — Delta CDF / Iceberg
    changelog-scan parity) as a hash-oracled query: build a mor table
    in two commits — batch 0 inserts event_id ≤ 5000; batch 1 inserts
    the rest, LWW-updates event_id ≤ 1000 (text uppercased), and
    deletes 1000 < event_id ≤ 1200 — then diff snapshot 0 against the
    current version. The driver hash verifies all four change types
    (insert / delete / update pre+post images) against a pure-SQL
    statement of the same delta."""
    import shutil

    from ..sink import IceboxSink

    ev = load(spark, sf_dir, "events")

    path = tempfile.mkdtemp(prefix="merlin-cfq-")
    sink = IceboxSink(spark, path, n_buckets=8, mode="mor")
    sink.apply(_events_as_changelog(ev.where(F.col("event_id") <= 5000), "I"), 0)
    batch1 = (
        _events_as_changelog(ev.where(F.col("event_id") > 5000), "I")
        .unionByName(_events_as_changelog(ev.where(F.col("event_id") <= 1000), "U",
                                  lsn_off=1_000_000, ts_shift=1, upper=True))
        .unionByName(_events_as_changelog(
            ev.where((F.col("event_id") > 1000) & (F.col("event_id") <= 1200)),
            "D", lsn_off=2_000_000, ts_shift=2))
    )
    sink.apply(batch1, 1)
    out = (
        sink.read_changes(0)
        .select("_change_type", "conv_id", "turn_idx", "text")
        .orderBy("_change_type", "conv_id", "turn_idx")
        .localCheckpoint(eager=True)  # cut lineage before rmtree (as above)
    )
    shutil.rmtree(path, ignore_errors=True)
    return out


# ----------------------------------------------------------- composition
# Round-5 flagship (VERDICT r4 task #1): the engine's two halves in ONE
# hash-oracled dataflow. Every §2.10 curation op so far read the static
# `documents` fixture; a real user's first pipeline is "CDC-replay the
# transcript changelog, THEN assemble training data from the converged
# table". These qkeys run that composition end-to-end: Structured
# Streaming replay (availableNow) → transactional icebox sink → LWW-
# resolved read → SFT pair assembly, with a single DuckDB statement
# re-deriving the SAME result straight from the log (LWW replay in SQL
# + the pinned normalize spec + pair windowing) — so the driver's hash
# check covers the whole chain: exactly-once apply, delete tombstones,
# schema evolution (meta_0 rides through), text normalization, and the
# training-pair window, in one signal.

_SFT_ORACLE = rf"""
WITH winners AS (
    SELECT * FROM (
        SELECT conv_id, turn_idx, op, role, text, extra, ts, lsn,
               row_number() OVER (PARTITION BY conv_id, turn_idx
                                  ORDER BY ts DESC, lsn DESC) AS rn
        FROM read_parquet('{_QK_LOG_PATH}/*.parquet')
        WHERE op IN ('I', 'U', 'D')
    ) WHERE rn = 1
),
live AS (
    SELECT conv_id, turn_idx, role,
           trim(regexp_replace(regexp_replace(nfc_normalize(text),
                    '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                '[ \t\n\r\x0b\x0c]+', ' ', 'g'),
                ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))
               AS text,
           json_extract_string(extra, '$.meta_0') AS meta_0
    FROM winners WHERE op <> 'D'
)
SELECT conv_id, turn_idx,
       coalesce(string_agg(role || ': ' || text, ' | ') OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING), '') AS context,
       role || ': ' || text AS target,
       meta_0,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
FROM live
"""


@query("transcript_sft_pairs", _SFT_ORACLE)
def transcript_sft_pairs(spark, sf_dir):
    """End-to-end CDC → training-data composition: replay the seeded
    changelog through the streaming engine (stream.replay: readStream →
    foreachBatch → IceboxSink mor, availableNow), read the converged
    transcript table (LWW-resolved, tombstones dropped, evolved meta_0
    backfilled), then assemble (context, target) SFT pairs — previous-2
    turns per conversation via a bounded ROWS-frame collect_list — plus
    whitespace token counts. The DuckDB oracle recomputes the identical
    rows from the RAW log in one SQL statement, so the hash check
    proves the replayed table state feeds the training path correctly.

    Convergence is batching-independent (tests/test_convergence.py), so
    the oracle needs no knowledge of micro-batch boundaries. Scale: the
    replay is the engine's hot path (bucketed, salted, AQE-ready); pair
    assembly is ONE hash shuffle on conv_id with O(k) window state."""
    import shutil

    from ..sink import IceboxSink
    from ..stream import StreamConfig, replay

    log = _ensure_qk_log()
    base = tempfile.mkdtemp(prefix="merlin-sftq-")
    try:
        cfg = StreamConfig(
            log_path=log,
            table_path=os.path.join(base, "table"),
            checkpoint_path=os.path.join(base, "ckpt"),
            n_buckets=8,
            sink_mode="mor",
        )
        replay(spark, cfg, timeout_s=600.0)
        live = IceboxSink(spark, cfg.table_path, 8, mode="mor").read_live()
        turn = F.concat_ws(": ", "role", "text")
        w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(-2, -1)
        out = live.select(
            "conv_id",
            "turn_idx",
            F.concat_ws(" | ", F.collect_list(turn).over(w)).alias("context"),
            turn.alias("target"),
            "meta_0",
            F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
        ).localCheckpoint(eager=True)  # materialize before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


_LINEAGE_AUDIT_ORACLE = rf"""
WITH winners AS (
    SELECT * FROM (
        SELECT op, lsn,
               row_number() OVER (PARTITION BY conv_id, turn_idx
                                  ORDER BY ts DESC, lsn DESC) AS rn
        FROM read_parquet('{_QK_LOG_PATH}/*.parquet')
        WHERE op IN ('I', 'U', 'D')
    ) WHERE rn = 1
)
SELECT op, COUNT(*) AS n_applied, MIN(lsn) AS lsn_lo, MAX(lsn) AS lsn_hi
FROM winners GROUP BY op
"""


@query("lineage_replay_audit", _LINEAGE_AUDIT_ORACLE)
def lineage_replay_audit(spark, sf_dir):
    """The per-partition lineage contract (BASELINE.json: "applied LSN
    ranges, row counts, commit snapshot ids … emitted each micro-batch")
    as a hash-oracled query — previously pytest-only. Apply the seeded
    log as one cow batch, then aggregate the `_lineage/` parquet the
    commit emitted: per op, rows applied + the applied LSN range. The
    DuckDB oracle re-derives the same numbers from the RAW log (LWW
    winners per key, grouped by op) — the lineage table must agree with
    the log it claims to describe, or the hash breaks.

    One batch by construction (direct sink.apply) so per-op winner
    counts are batching-independent. Per-BUCKET splits stay pytest-only:
    buckets are xxhash64 placements DuckDB cannot recompute."""
    import shutil

    from ..changelog import read_batch
    from ..lineage import read_lineage
    from ..sink import IceboxSink

    log = _ensure_qk_log()
    path = tempfile.mkdtemp(prefix="merlin-linq-")
    try:
        sink = IceboxSink(spark, path, n_buckets=8, mode="cow")
        sink.apply(read_batch(spark, log), 0)
        out = (
            read_lineage(spark, path)
            .groupBy("op")
            .agg(
                F.sum("n_rows").alias("n_applied"),
                F.min("lsn_lo").alias("lsn_lo"),
                F.max("lsn_hi").alias("lsn_hi"),
            )
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out
