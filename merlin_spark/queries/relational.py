"""Relational operator inventory — SURVEY.md §2.1-2.7 qkeys.

Each function is a thin declarative DataFrame graph; Catalyst supplies
pushdown/pruning/join selection (verified in tests/test_plans.py). The
paired DuckDB oracle SQL lives in the @query decorator.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io_util import load
from .base import query

# ---------------------------------------------------------------- scans


@query(
    "scan_lineitem",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
)
def scan_lineitem(spark, sf_dir):
    """Parquet scan with column pruning: ReadSchema must show only the
    four projected columns (SURVEY.md §4)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@query(
    "project_orders",
    """SELECT o_orderkey,
              upper(o_orderstatus) AS status,
              round(o_totalprice * 1.1, 4) AS gross
       FROM orders""",
)
def project_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 1.1, 4).alias("gross"),
    )


@query(
    "filter_lineitem_date",
    """SELECT l_orderkey, l_linenumber, l_shipdate, l_discount
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         AND l_discount BETWEEN 0.02 AND 0.06
         AND l_returnflag IN ('A','R')""",
)
def filter_lineitem_date(spark, sf_dir):
    """Conjunctive predicates on raw columns → parquet PushedFilters."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.06)
        & F.col("l_returnflag").isin("A", "R")
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_discount")


# ---------------------------------------------------------------- joins


@query(
    "join_broadcast_dim",
    """SELECT n.n_name AS nation, r.r_name AS region,
              count(*) AS n_customers,
              round(sum(c.c_acctbal), 4) AS total_acctbal
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                        JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY n.n_name, r.r_name""",
)
def join_broadcast_dim(spark, sf_dir):
    """Small dims broadcast explicitly — zero shuffle of the fact side
    for the join itself (only the final agg shuffles)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
    )


@query(
    "join_smj_orders_lineitem",
    """SELECT o.o_orderpriority,
              count(DISTINCT o.o_orderkey) AS n_orders,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE o.o_orderstatus <> 'F'
       GROUP BY o.o_orderpriority""",
)
def join_smj_orders_lineitem(spark, sf_dir):
    """Big×big equi-join — planner picks SMJ/SHJ above broadcast
    threshold; the MERGE matching-join shape (BASELINE.json:6)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "F")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


@query(
    "join_shuffle_hash",
    """SELECT l.l_orderkey,
              round(sum(l.l_extendedprice), 4) AS gross,
              max(o.o_orderdate) AS last_orderdate
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE o.o_totalprice > 150000
       GROUP BY l.l_orderkey""",
)
def join_shuffle_hash(spark, sf_dir):
    """Shuffled hash join (SURVEY.md §2.3): both sides exchange on the
    key, the smaller side builds a per-partition hash table — no sort
    of either side (vs SMJ). The right strategy at scale for big×medium
    joins whose per-partition build side fits executor memory. Strategy
    forced with hint("shuffle_hash") on the filtered (smaller) side;
    semantics are strategy-independent, so the oracle is plain SQL. The
    plan assertion lives in tests/test_plans.py."""
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("gross"),
            F.max("o_orderdate").alias("last_orderdate"),
        )
    )


@query(
    "join_semi",
    """SELECT o_orderkey, o_totalprice FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""",
)
def join_semi(spark, sf_dir):
    """Existence filter — the sink's idempotence gate shape."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def join_anti(spark, sf_dir):
    """Set-minus by key — delete application in the fallback sink."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_full_outer_diff",
    """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
              CASE WHEN c.c_custkey IS NULL THEN 'order_only'
                   WHEN o.o_custkey IS NULL THEN 'customer_only'
                   ELSE 'both' END AS side,
              count(*) AS n
       FROM customer c FULL OUTER JOIN
            (SELECT DISTINCT o_custkey FROM orders) o
            ON c.c_custkey = o.o_custkey
       GROUP BY 1, 2""",
)
def join_full_outer_diff(spark, sf_dir):
    """Convergence-diff shape: keep unmatched rows from both sides."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return (
        j.select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.when(F.col("c_custkey").isNull(), "order_only")
            .when(F.col("o_custkey").isNull(), "customer_only")
            .otherwise("both")
            .alias("side"),
        )
        .groupBy("custkey", "side")
        .agg(F.count("*").alias("n"))
    )


@query(
    "join_range_events",
    """SELECT a.user_id, count(*) AS n_followups
       FROM events a JOIN events b
         ON a.user_id = b.user_id
        AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
       WHERE a.event_type = 'error'
       GROUP BY a.user_id""",
)
def join_range_events(spark, sf_dir):
    """Range/theta join with an equi prefix (user_id) so Spark plans a
    hash join + residual range filter, not a cross product."""
    e = load(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "error").alias("a")
    b = e.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_followups"))
    )


@query(
    "join_salted_skew",
    """SELECT o.o_orderpriority, count(*) AS n_items,
              round(sum(l.l_extendedprice), 4) AS total_price
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       GROUP BY o.o_orderpriority""",
)
def join_salted_skew(spark, sf_dir):
    """Explicit salting (BASELINE.json:6): probe side salted by
    pmod(xxhash64(unique col), S); build side exploded ×S. Semantically
    identical to the plain join (oracle proves it); spreads a hot
    l_orderkey over S reducers. Layered under AQE skew-join."""
    S = 8
    li = load(spark, sf_dir, "lineitem").withColumn(
        "_salt", F.pmod(F.xxhash64("l_linenumber", "l_partkey"), F.lit(S)).cast("int")
    )
    o = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1))))
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li["_salt"] == o["_salt"]))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
        )
    )


@query(
    "subquery_decorrelated",
    """SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
       FROM orders o
       WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)""",
)
def subquery_decorrelated(spark, sf_dir):
    """Correlated subquery — Catalyst decorrelates to an aggregate+join
    (SURVEY.md §4 'expose one correlated-subquery qkey')."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
           FROM v_orders o
           WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM v_orders o2
                                      WHERE o2.o_custkey = o.o_custkey)"""
    )


# ----------------------------------------------------------- aggregates


@query(
    "agg_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 4) AS sum_qty,
              round(sum(l_extendedprice), 4) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_discount), 4) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-01'
       GROUP BY l_returnflag, l_linestatus""",
)
def agg_pricing_summary(spark, sf_dir):
    """Flagship (TPC-H Q1 shape): scan → pushed filter → partial+final
    hash aggregate. The canonical whole-stage-codegen pipeline."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    """SELECT o_orderstatus,
              count(DISTINCT o_custkey) AS n_customers,
              count(*) AS n_orders
       FROM orders GROUP BY o_orderstatus""",
)
def agg_count_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query("agg_approx_distinct")  # no oracle: HLL estimate ≠ exact (rows-only)
def agg_approx_distinct(spark, sf_dir):
    """HLL cardinality — the cheap lineage metric (distinct conv_ids
    touched per batch). Driver records rows-only check."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


_APPROX_DISTINCT_VERIFY_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY event_type
"""


@query("agg_approx_distinct_verify", _APPROX_DISTINCT_VERIFY_ORACLE)
def agg_approx_distinct_verify(spark, sf_dir):
    """Verify twin for the rows-only ``agg_approx_distinct`` (the r5
    twin pattern: the sketch's documented error guarantee becomes a
    driver-hashable boolean). HLL++ with rsd=0.02 estimates within 3
    relative standard deviations (6%) except with ~0.3% probability;
    on this fixed fixture the estimate is deterministic, so
    ``within_bound`` is a stable column the driver hash-checks against
    the oracle's literal TRUE — if the HLL estimate ever drifts
    outside its bound (or the column wiring breaks), the hash
    mismatches. The estimate VALUE itself stays un-emitted: it is
    engine-specific, which is exactly why the sibling key is
    rows-only. ``greatest(1, …)`` floors the band for tiny groups
    where 6% of the count rounds below one."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("_est"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_est") - F.col("exact_users"))
                <= F.greatest(
                    F.lit(1.0), F.lit(3 * 0.02) * F.col("exact_users")
                )
            ).alias("within_bound"),
        )
    )


@query(
    "agg_rollup",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_extendedprice), 4) AS sum_price,
              count(*) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def agg_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.count("*").alias("n"),
    )


@query(
    "agg_cube",
    """SELECT o_orderstatus, o_orderpriority,
              round(sum(o_totalprice), 4) AS sum_price, count(*) AS n
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)
def agg_cube(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        F.count("*").alias("n"),
    )


@query(
    "agg_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
              round(sum(o_totalprice), 4) AS sum_price, count(*) AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
)
def agg_grouping_sets(spark, sf_dir):
    """Arbitrary GROUPING SETS (r4) — the generalization rollup/cube are
    sugar for: per-status totals, per-priority totals, and the grand
    total in ONE pass (Spark plans a single Expand + hash aggregate, so
    the fact table is scanned once however many sets are requested —
    the 100 TB reason this beats unioning three groupBys)."""
    o = load(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus", "o_orderpriority",
    ).agg(
        F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        F.count("*").alias("n"),
    )


# -------------------------------------------------------------- windows


@query(
    "win_rank",
    """SELECT * FROM (
         SELECT o_orderkey, o_orderpriority, o_totalprice,
                CAST(rank() OVER (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
         FROM orders) WHERE rnk <= 5""",
)
def win_rank(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 5)
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "rnk")
    )


@query(
    "win_lag_lead",
    """SELECT o_custkey, o_orderkey,
              lag(o_totalprice) OVER w AS prev_price,
              lead(o_totalprice) OVER w AS next_price
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
)
def win_lag_lead(spark, sf_dir):
    """Analytic lag/lead — the turn-continuity / gap-detection shape."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "win_running_sum",
    """SELECT o_custkey, o_orderkey,
              round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                AS running_total
       FROM orders""",
)
def win_running_sum(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_total"),
    )


@query(
    "win_range_frame",
    """SELECT event_id, user_id,
              round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4)
                AS hour_sum
       FROM events""",
)
def win_range_frame(spark, sf_dir):
    """rangeBetween frame over event-time microseconds (sliding 1h sum)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("hour_sum")
    )


# --------------------------------------------------------- sorts/limits


@query(
    "sort_transcripts",
    """SELECT doc_id, lang, n_chars FROM documents
       ORDER BY lang, doc_id""",
)
def sort_transcripts(spark, sf_dir):
    """Global (range-partitioned) sort — the stable-ordering dump shape
    used by the final-state equality check (BASELINE.json:15)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", "n_chars").orderBy("lang", "doc_id")


@query(
    "topk_orders",
    """SELECT o_orderkey, round(o_totalprice, 4) AS totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def topk_orders(spark, sf_dir):
    """Global top-k: planner runs partial TakeOrdered per partition then
    merges k — no global sort. Unique tiebreak (o_orderkey) keeps the
    result deterministic."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 4).alias("totalprice"))
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "topk_per_group",
    """SELECT * FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
         FROM orders) WHERE rn <= 3""",
)
def topk_per_group(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ------------------------------------------------------------- set ops


@query(
    "set_union_evolved",
    """SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS mktsegment
       FROM customer
       UNION ALL
       SELECT s_name AS name, s_acctbal AS acctbal, NULL AS mktsegment
       FROM supplier""",
)
def set_union_evolved(spark, sf_dir):
    """unionByName(allowMissingColumns=True) — the additive
    schema-evolution union (SURVEY.md §2.7): supplier lacks mktsegment,
    backfills NULL."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionByName(s, allowMissingColumns=True)


@query(
    "set_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT
       SELECT s_nationkey AS nationkey FROM supplier""",
)
def set_intersect(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except_diff",
    """SELECT c_nationkey AS nationkey FROM customer
       EXCEPT
       SELECT s_nationkey AS nationkey FROM supplier""",
)
def set_except_diff(spark, sf_dir):
    """The convergence check shape: replayed EXCEPT expected = ∅."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct) semantics, matching the SQL


# ------------------------------------------------------ scalar builtins


@query(
    "scalar_string",
    """SELECT doc_id,
              upper(substring(text, 1, 10)) AS head,
              length(text) AS len,
              regexp_extract(text, '([a-z]+)', 1) AS first_word,
              concat_ws('|', lang, source) AS tag
       FROM documents""",
)
def scalar_string(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head"),
        F.length("text").alias("len"),
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.concat_ws("|", "lang", "source").alias("tag"),
    )


@query(
    "scalar_datetime",
    """SELECT event_id,
              date_trunc('day', ts) AS day,
              CAST(year(ts) AS INTEGER) AS yr,
              CAST(month(ts) AS INTEGER) AS mo,
              CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
              CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
       FROM events""",
)
def scalar_datetime(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day"),
        F.year("ts").alias("yr"),
        F.month("ts").alias("mo"),
        F.dayofweek("ts").alias("dow"),
        F.unix_timestamp("ts").alias("epoch_s"),
    )


@query(
    "scalar_json",
    """SELECT event_id,
              CAST(json_extract(props, '$.k') AS INTEGER) AS k_val
       FROM events""",
)
def scalar_json(spark, sf_dir):
    """from_json over the events.props JSON payload (SURVEY.md §1.2)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.from_json("props", "map<string,int>").getItem("k").alias("k_val"),
    )


@query(
    "scalar_array",
    """SELECT vec_id,
              len(embedding) AS dim,
              round(list_aggregate(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                                   'sum') + 1e-9, 4) + 0.0 AS sq_norm,
              round(CAST(embedding[1] AS DOUBLE) + 1e-9, 4) + 0.0 AS first_val
       FROM embeddings""",
)
def scalar_array(spark, sf_dir):
    """Higher-order array functions (transform/aggregate) — the JVM-side
    vector math primitive used by similarity search (no UDF).

    Two float-canonicalization guards applied identically on BOTH
    sides: +1e-9 before round() nudges values off exact .00005 tie
    boundaries (Spark HALF_UP vs DuckDB disagree there), and + 0.0
    after round() collapses IEEE negative zero (round(-8e-6, 4) is
    -0.0 in DuckDB but +0.0 in Spark; they format differently)."""
    e = load(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        (F.round(sq + F.lit(1e-9), 4) + F.lit(0.0)).alias("sq_norm"),
        (F.round(F.element_at("embedding", 1).cast("double") + F.lit(1e-9), 4)
         + F.lit(0.0)).alias("first_val"),
    )


@query(
    "agg_pivot",
    """SELECT o_orderstatus,
              count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent_n,
              count(*) FILTER (o_orderpriority = '2-HIGH') AS high_n,
              count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium_n,
              count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS notspec_n,
              count(*) FILTER (o_orderpriority = '5-LOW') AS low_n,
              round(sum(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 4)
                  AS urgent_total
       FROM orders GROUP BY o_orderstatus""",
)
def agg_pivot(spark, sf_dir):
    """Pivot (SURVEY.md §2.4 family): long→wide via groupBy().pivot()
    with the value list DECLARED — at scale an undeclared pivot needs an
    extra distinct-values job and an unbounded column count; declaring
    the spine keeps it one hash-aggregate pass. Column names pinned to
    match the SQL FILTER formulation."""
    o = load(spark, sf_dir, "orders")
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    wide = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", pri)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )
    # pivot yields NULL for a (status, priority) cell with no rows while
    # the SQL count(*) FILTER yields 0 — coalesce the counts so absent
    # combinations hash-match on every fixture (sums stay NULL in both)
    return wide.select(
        "o_orderstatus",
        F.coalesce(F.col("`1-URGENT_n`"), F.lit(0)).alias("urgent_n"),
        F.coalesce(F.col("`2-HIGH_n`"), F.lit(0)).alias("high_n"),
        F.coalesce(F.col("`3-MEDIUM_n`"), F.lit(0)).alias("medium_n"),
        F.coalesce(F.col("`4-NOT SPECIFIED_n`"), F.lit(0)).alias("notspec_n"),
        F.coalesce(F.col("`5-LOW_n`"), F.lit(0)).alias("low_n"),
        F.col("`1-URGENT_total`").alias("urgent_total"),
    )


@query(
    "set_unpivot",
    """SELECT l_orderkey, l_linenumber, metric, round(value, 4) AS value
       FROM (
         SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
                l_quantity AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
         FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
       )
       WHERE l_orderkey < 100""",
)
def set_unpivot(spark, sf_dir):
    """Unpivot / melt (wide→long, SURVEY.md §2.7 family): DataFrame
    .unpivot maps to a single generate/expand node — one scan, no
    self-union of the fact table (the UNION ALL oracle formulation
    would scan it three times)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    long = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "value",
    )
    return long.select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace("metric", "^l_", "").alias("metric"),
        F.round("value", 4).alias("value"),
    )


@query(
    "agg_percentiles",
    """SELECT l_returnflag,
              round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
              round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
              round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
              round(median(l_discount), 4) AS median_discount
       FROM lineitem GROUP BY l_returnflag""",
)
def agg_percentiles(spark, sf_dir):
    """Exact percentiles + median (SURVEY.md §2.4 family): Spark's
    `percentile` uses the same linear interpolation as SQL
    PERCENTILE_CONT / DuckDB quantile_cont, so results are
    hash-comparable. Exact percentile materializes per-group value
    buffers — at 100 TB swap to approx_percentile (t-digest, mergeable
    map-side) and accept rank error; both shapes shown here."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.median("l_discount"), 4).alias("median_discount"),
    )


@query(
    "agg_tumbling_window",
    """SELECT date_trunc('day', ts) AS bucket_start,
              count(*) AS n_events,
              round(sum(value), 4) AS total_value
       FROM events GROUP BY 1""",
)
def agg_tumbling_window(spark, sf_dir):
    """Tumbling event-time window as a BATCH aggregate (SURVEY.md §2.8
    family, hash-checkable form): `F.window` is the same expression the
    streaming path groups on — in batch mode it reduces to a
    deterministic bucketing, so the window assignment logic itself gets
    a value-hash oracle (DuckDB date_trunc; both engines bucket 1-day
    windows at UTC midnight — session timeZone pinned UTC)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n_events", "total_value")
    )


@query(
    "agg_sliding_window",
    """WITH h AS (
         SELECT time_bucket(INTERVAL 12 HOURS, ts)
                  - k * INTERVAL 12 HOURS AS bucket_start,
                value
         FROM events, (VALUES (0), (1)) t(k)
       )
       SELECT bucket_start, count(*) AS n_events,
              round(sum(value), 4) AS total_value
       FROM h GROUP BY 1""",
)
def agg_sliding_window(spark, sf_dir):
    """Sliding (hopping) event-time window as a BATCH aggregate —
    `F.window(ts, '1 day', '12 hours')`, the same expression the
    streaming path groups on; each event lands in exactly duration/slide
    = 2 windows. Oracle replays the hop algebra: an event at ts belongs
    to windows starting at time_bucket(12h, ts) − k·12h for k∈{0,1}
    (both engines align 12-hour buckets on UTC midnight — DuckDB's
    time_bucket origin 2000-01-03 is a whole multiple of 12 h from the
    epoch Spark aligns to). Previously pytest-only (VERDICT r3 missing
    #4); now hash-oracled."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n_events", "total_value")
    )


@query(
    "win_session_window",
    """WITH d AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR
                     THEN 1 ELSE 0 END AS brk
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), g AS (
         SELECT user_id, ts,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS grp
         FROM d
       )
       SELECT user_id, min(ts) AS sess_start, count(*) AS n_events
       FROM g GROUP BY user_id, grp""",
)
def win_session_window(spark, sf_dir):
    """Session window (gap = 1 hour) as a BATCH aggregate — the same
    `F.session_window` expression the streaming stateful path uses,
    here against a gaps-and-islands SQL oracle: two events share a
    session iff the later one starts strictly before prev_ts + gap, so
    the oracle breaks on `ts - lag(ts) >= gap`. Hash-verifies the
    session merge semantics that streaming tests can only row-count."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("sess_start"), "n_events"
        )
    )


@query("agg_percentiles_approx")  # sketch values drift vs any exact oracle
def agg_percentiles_approx(spark, sf_dir):
    """Approximate percentiles (SURVEY.md §2.4) — the 100 TB companion
    to agg_percentiles: `approx_percentile` (Greenwald–Khanna sketch,
    accuracy=10000 ⇒ rank error ≤ n/10000) is MERGEABLE, so it
    aggregates map-side and never materializes per-group value buffers
    the way exact `percentile`'s sort does. Rows-only driver check by
    design (sketch outputs are engine-specific); the quantitative
    error bound vs the exact path is asserted in
    tests/test_percentile_approx.py."""
    li = load(spark, sf_dir, "lineitem")
    acc = F.lit(10000)
    return li.groupBy("l_returnflag").agg(
        F.round(F.approx_percentile("l_extendedprice", F.lit(0.25), acc), 4).alias("p25"),
        F.round(F.approx_percentile("l_extendedprice", F.lit(0.50), acc), 4).alias("p50"),
        F.round(F.approx_percentile("l_extendedprice", F.lit(0.75), acc), 4).alias("p75"),
        F.round(F.approx_percentile("l_discount", F.lit(0.50), acc), 4).alias("median_discount"),
    )


_PCTL_VERIFY_ORACLE = """
SELECT l_returnflag, count(*) AS n, TRUE AS rank_ok
FROM lineitem GROUP BY l_returnflag
"""


@query("agg_percentiles_approx_verify", _PCTL_VERIFY_ORACLE)
def agg_percentiles_approx_verify(spark, sf_dir):
    """Verify twin for the rows-only ``agg_percentiles_approx``:
    Greenwald–Khanna at accuracy a guarantees the returned value's
    RANK is within n/a of the target rank, so the guarantee — unlike
    the sketch value — IS exactly checkable. Stage 1 computes the
    approximate median per group; the (3-row) sketch result is
    broadcast back onto lineitem and one conditional aggregate counts
    values strictly-below / at-or-below it. With duplicates the
    value's rank is the interval [lt+1, le]; ``rank_ok`` asserts that
    interval intersects [n/2 - n/a, n/2 + n/a] (±1 for the floor/ceil
    of an even/odd split). The oracle re-derives n exactly and emits
    literal TRUE — a sketch regression past its bound hash-mismatches
    at the driver. Two scans + a broadcast of G rows: scale-safe for
    any group count that fits a broadcast, which a verify harness's
    always does."""
    acc = 10000
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    sketch = li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.lit(0.5), F.lit(acc)
        ).alias("_p50")
    )
    return (
        li.join(F.broadcast(sketch), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("_p50"), 1).otherwise(0)
            ).alias("_lt"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("_p50"), 1).otherwise(0)
            ).alias("_le"),
        )
        .select(
            "l_returnflag",
            "n",
            (
                (F.col("_le") >= 0.5 * F.col("n") - F.col("n") / acc - 1)
                & (F.col("_lt") <= 0.5 * F.col("n") + F.col("n") / acc + 1)
            ).alias("rank_ok"),
        )
    )


@query(
    "win_rank_extended",
    """SELECT c_custkey, c_nationkey,
              ntile(4) OVER w AS quartile,
              round(percent_rank() OVER w, 4) AS pct_rank,
              round(cume_dist() OVER w, 4) AS cume
       FROM customer
       WINDOW w AS (PARTITION BY c_nationkey
                    ORDER BY c_acctbal DESC, c_custkey)""",
)
def win_rank_extended(spark, sf_dir):
    """Distribution-ranking windows (ntile / percent_rank / cume_dist,
    SURVEY.md §2.5): order pinned by the unique c_custkey tie-break so
    every engine computes identical ranks."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )
