"""Similarity search over `embeddings` (array<float>, dim 64).

Brute-force cosine top-k is the correctness baseline (oracled against
DuckDB); the LSH-bucketed variant is the 100 TB scale path: candidates
come from sign-bucket collisions (|buckets| ≪ n²), then exact cosine
re-ranks within buckets.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io_util import load
from .registry import query

K = 10
N_QUERIES = 5  # vec_id < 5 act as the query set


def _norm(c):
    return F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )


def _cos(a_col: str, b_col: str, a_nrm: str, b_nrm: str):
    """Cosine from a per-pair dot product and PRE-COMPUTED norms: norms
    cost O(n·dim) once instead of O(pairs·dim); identical arithmetic to
    dot/(|a|·|b|) so the DuckDB oracle still matches."""
    dot = F.aggregate(
        F.zip_with(a_col, b_col, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    return dot / (F.col(a_nrm) * F.col(b_nrm))


@query(
    "ann_bruteforce_topk",
    f"""SELECT q_id, vec_id, round(cos, 4) AS cos, CAST(rn AS INTEGER) AS rn
        FROM (
          SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
                 list_cosine_similarity(q.embedding::DOUBLE[],
                                        e.embedding::DOUBLE[]) AS cos,
                 row_number() OVER (PARTITION BY q.vec_id
                                    ORDER BY cos DESC, e.vec_id) AS rn
          FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
          WHERE q.vec_id < {N_QUERIES})
        WHERE rn <= {K}""",
)
def ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-k: tiny query set broadcast against the corpus
    (no shuffle of the big side), per-query top-k via ranking window.
    At cluster scale the window shuffles only (q_id, cos) pairs — the
    corpus is scanned exactly once."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn("nrm", _norm("emb"))
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .withColumn("cos_raw", _cos("q_emb", "emb", "q_nrm", "nrm"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= K)
        .select("q_id", "vec_id", F.round("cos_raw", 4).alias("cos"), "rn")
    )


N_PLANES = 8


def _plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1) —
    arithmetic hash so Spark and tests rebuild identical planes with
    no RNG state."""
    x = (p * 1_000_003 + d * 7919 + 12345) % 104729
    return (x / 104729.0) * 2.0 - 1.0


@query("ann_lsh_bucketed")  # approximate recall ⇒ rows-only check
def ann_lsh_bucketed(spark, sf_dir):
    """Scale path: random-hyperplane LSH. Each vector → 8 sign bits →
    bucket id; neighbor candidates = same-bucket rows (equi join on
    bucket), exact cosine re-rank, top-k per query within bucket.

    The bucket join replaces the all-pairs cross product: at 10^10
    vectors the shuffle is keyed on bucket (2^8 … 2^20 buckets with
    multi-probe), each partition does exact math on a tiny candidate
    set."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    planes = [
        F.array(*[F.lit(_plane_weight(p, d)) for d in range(64)])
        for p in range(N_PLANES)
    ]
    bucket = sum(
        (
            F.when(
                F.aggregate(
                    F.zip_with("emb", planes[p], lambda x, w: x * w),
                    F.lit(0.0),
                    lambda s, x: s + x,
                )
                > 0,
                F.lit(2**p),
            ).otherwise(0)
            for p in range(N_PLANES)
        ),
        F.lit(0),
    )
    eb = e.withColumn("bucket", bucket).withColumn("nrm", _norm("emb"))
    q = eb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"), "bucket",
    )
    cand = eb.join(F.broadcast(q), on="bucket").where(F.col("vec_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        cand.withColumn("cos_raw", _cos("q_emb", "emb", "q_nrm", "nrm"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= K)
        .select("q_id", "vec_id", F.round("cos_raw", 4).alias("cos"), "rn")
        .orderBy("q_id", "rn")
    )
