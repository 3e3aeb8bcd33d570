"""Dataset-assembly ops over `documents` — PII scrubbing, deterministic
train/holdout splitting, hash-stratified sampling (training-data
pipeline ops, task brief §"beyond the reference").

All three are map-only JVM builtins: no shuffle, no UDF, linear in the
corpus — the plan at 100 TB is one scan per op with every expression
inside whole-stage codegen. Regex patterns are restricted to the
Java-regex ∩ RE2 common subset (char classes, bounded repeats,
alternation — no lookarounds) so the DuckDB oracles run the literal
same patterns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_util import load
from .base import query

# Synthetic PII injected deterministically into the (PII-free) fixture
# text IDENTICALLY in the Spark query and the oracle SQL — the operator
# under test is the redaction, and it must actually bite to be tested.
_PII_SUFFIX = "@mail.example.com or 555-0123 id 987654321"
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\d{3}-\d{4}"
_LONG_ID = r"\d{9,}"


@query(
    "text_pii_scrub",
    rf"""SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(
                   text || ' reach user' || CAST(doc_id AS VARCHAR) || '{_PII_SUFFIX}',
                   '{_EMAIL}', '<EMAIL>', 'g'),
                   '{_LONG_ID}', '<ID>', 'g'),
                   '{_PHONE}', '<PHONE>', 'g') AS clean_text,
               CAST(len(regexp_extract_all(
                   text || ' reach user' || CAST(doc_id AS VARCHAR) || '{_PII_SUFFIX}',
                   '{_EMAIL}')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(
                   text || ' reach user' || CAST(doc_id AS VARCHAR) || '{_PII_SUFFIX}',
                   '{_PHONE}')) AS INTEGER) AS n_phones,
               CAST(len(regexp_extract_all(
                   text || ' reach user' || CAST(doc_id AS VARCHAR) || '{_PII_SUFFIX}',
                   '{_LONG_ID}')) AS INTEGER) AS n_ids
        FROM documents""",
)
def text_pii_scrub(spark, sf_dir):
    """PII redaction: emails, phone-shaped and long-digit-run tokens
    replaced with typed placeholders, plus per-category match counts.
    Scrub order matters and is pinned: email first (its local part
    contains digits), then long IDs, then phones."""
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"), F.lit(" reach user"),
        F.col("doc_id").cast("string"), F.lit(_PII_SUFFIX),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, _EMAIL, "<EMAIL>"),
            _LONG_ID, "<ID>"),
        _PHONE, "<PHONE>")

    def n(pat):
        return F.size(F.regexp_extract_all(raw, F.lit(pat), F.lit(0)))

    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        n(_EMAIL).alias("n_emails"),
        n(_PHONE).alias("n_phones"),
        n(_LONG_ID).alias("n_ids"),
    )


# Hex-string thresholds: md5 output is uniform over [0,16^32), so a
# lexicographic compare of the hex digest against a 2-hex-digit prefix
# is an exact deterministic Bernoulli with p = int(prefix,16)/256 —
# reproducible across engines, reruns, and cluster sizes (no RNG state,
# unlike df.sample), and any doc joins back to its split by re-hashing.
_HOLDOUT_LT = "0d"  # 13/256 ≈ 5.1% holdout


@query(
    "split_train_holdout",
    f"""SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS doc_hash,
               CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{_HOLDOUT_LT}'
                    THEN 'holdout' ELSE 'train' END AS split
        FROM documents""",
)
def split_train_holdout(spark, sf_dir):
    """Deterministic train/holdout assignment by key hash — the
    shuffle-free split every training-data pipeline needs: stable under
    re-runs and incremental ingest (a doc's split never changes), and
    exactly reproducible from doc_id alone."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        h.alias("doc_hash"),
        F.when(h < _HOLDOUT_LT, "holdout").otherwise("train").alias("split"),
    )


# Per-stratum keep thresholds: downsample the dominant language, keep
# half of everything else — the classic data-mix rebalance. Same
# hex-prefix Bernoulli as the split (deterministic sampleBy).
_EN_LT = "1a"     # ≈ 10.2% of en docs kept
_OTHER_LT = "80"  # 50% of other-language docs kept


@query(
    "sample_stratified_hash",
    f"""SELECT doc_id, lang,
               md5(CAST(doc_id AS VARCHAR)) AS doc_hash
        FROM documents
        WHERE CASE WHEN lang = 'en'
                   THEN md5(CAST(doc_id AS VARCHAR)) < '{_EN_LT}'
                   ELSE md5(CAST(doc_id AS VARCHAR)) < '{_OTHER_LT}' END""",
)
def sample_stratified_hash(spark, sf_dir):
    """Stratified sampling with per-language rates, hash-deterministic
    (df.sampleBy's semantics without its RNG nondeterminism): en docs
    kept at ~10%, every other language at 50%. Map-only filter — the
    100 TB plan is a scan with the predicate pushed into codegen."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    keep = F.when(F.col("lang") == "en", h < _EN_LT).otherwise(h < _OTHER_LT)
    return d.where(keep).select("doc_id", "lang", h.alias("doc_hash"))


@query(
    "conv_context_pairs",
    """SELECT doc_id, source,
              coalesce(string_agg(substr(text, 1, 40), ' | ') OVER (
                  PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING), '') AS context,
              text AS target
       FROM documents""",
)
def conv_context_pairs(spark, sf_dir):
    """(context, target) training-pair assembly — the transcripts-shape
    op every SFT data pipeline runs: for each turn, the concatenation
    of the previous k turns in its thread is the context, the turn
    itself the target (thread = `source`, order = `doc_id`; k = 2,
    truncated snippets). One window frame per thread key — a single
    hash shuffle on the thread id, no UDF, `collect_list` over a
    bounded ROWS frame so state per key is O(k), not O(thread).

    DuckDB's windowed `string_agg` over the identical frame is the
    oracle; an empty frame (thread head) is NULL there vs `[]` here, so
    the oracle coalesces to '' to match `concat_ws`'s empty result."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(-2, -1)
    )
    return d.select(
        "doc_id",
        "source",
        F.concat_ws(
            " | ", F.collect_list(F.substring("text", 1, 40)).over(w)
        ).alias("context"),
        F.col("text").alias("target"),
    )


# ------------------------------------------------------------- composition
# The flagship curation chain — what a training-data team actually runs:
# near-dup removal → quality gate → language rebalance → split. One
# DataFrame program, one end-to-end oracle.


@query(
    "curate_corpus",
    None,  # oracle assembled below (reuses the recursive-CTE closure)
)
def curate_corpus(spark, sf_dir):
    """End-to-end corpus curation composed from the §2.10 operators:

    1. drop near-duplicate non-canonical docs (connected components over
       the exact-Jaccard pair graph, keeper = min doc_id — the
       `dedup_cluster_canonical` operator);
    2. quality gate (the `text_quality` pass criteria: length band +
       punctuation ceiling);
    3. per-language rebalance (the `sample_stratified_hash` rates);
    4. deterministic train/holdout assignment (`split_train_holdout`).

    Hash-oracled END TO END against one DuckDB query whose stages are
    the same recursive-CTE closure + filters — so the driver verifies
    the composition, not just each stage in isolation.

    Scale: stages 2-4 are map-only and fuse into the scan; stage 1 is
    the CC labels anti-joined on doc_id (plain shuffled anti join — the
    dupe set at 10^10 docs can be a double-digit percent of the corpus,
    so it must NOT be broadcast)."""
    from .dedup import dedup_cluster_canonical

    d = load(spark, sf_dir, "documents")
    dupes = (
        dedup_cluster_canonical(spark, sf_dir)
        .where(~F.col("is_canonical"))
        .select("doc_id")
    )
    base = d.join(dupes, "doc_id", "left_anti")
    quality = base.where(
        F.length("text").between(100, 5000)
        & (
            F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
            < 0.1 * F.length("text")
        )
    )
    h = F.md5(F.col("doc_id").cast("string"))
    sampled = quality.where(
        F.when(F.col("lang") == "en", h < _EN_LT).otherwise(h < _OTHER_LT)
    )
    return sampled.select(
        "doc_id",
        "lang",
        F.when(h < _HOLDOUT_LT, "holdout").otherwise("train").alias("split"),
    )


def _register_curate_oracle() -> None:
    """The curate oracle reuses dedup's recursive-CTE transitive closure
    verbatim (single source of truth for the pair predicate)."""
    from .base import ORACLE_SQL
    from .dedup import _JACCARD_ORACLE

    ORACLE_SQL["curate_corpus"] = f"""
        WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        dupes AS (
            SELECT a AS doc_id FROM reach GROUP BY a
            HAVING a != least(a, min(b))
        ),
        base AS (
            SELECT d.doc_id, d.lang, d.text FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM dupes)
        ),
        quality AS (
            SELECT doc_id, lang FROM base
            WHERE length(text) BETWEEN 100 AND 5000
              AND length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                  < 0.1 * length(text)
        ),
        sampled AS (
            SELECT doc_id, lang FROM quality
            WHERE CASE WHEN lang = 'en'
                       THEN md5(CAST(doc_id AS VARCHAR)) < '{_EN_LT}'
                       ELSE md5(CAST(doc_id AS VARCHAR)) < '{_OTHER_LT}' END
        )
        SELECT doc_id, lang,
               CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{_HOLDOUT_LT}'
                    THEN 'holdout' ELSE 'train' END AS split
        FROM sampled"""


_register_curate_oracle()
