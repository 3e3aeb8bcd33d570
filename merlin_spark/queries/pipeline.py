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


# --------------------------------------------------------- decontamination
# Eval-set decontamination — the GPT-3/LLaMA-style pipeline step: flag
# training docs sharing any k-token n-gram with the held-out eval set.
# The eval slice IS this module's holdout split (same hash Bernoulli),
# so the two ops compose: "is my train split clean w.r.t. my eval split"
# is one query. Shape at 10^10 docs: explode → gram window → two
# hash-shuffle joins → agg — never quadratic; the gram STRING is the
# join key here so DuckDB can oracle it, and the one-line swap to
# `xxhash64(gram)` halves shuffle bytes at scale (gram strings are
# k×word-size; the winnowing op next door already does exactly that).

_DECON_K = 5  # tokens per contamination n-gram
# Planted overlap: the fixture corpus is random enough that natural
# 5-gram collisions are rare, and an operator that never fires is not
# tested — so a deterministic canary sentence is appended to every
# doc_id ≡ 0 (mod 7) IDENTICALLY in both engines (the PII-scrub
# pattern). Canary docs land in both splits (the hash Bernoulli is
# independent of doc_id mod 7), so detection provably bites.
_CANARY = " canary alpha beta gamma delta epsilon zeta"

_DECON_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || '{_CANARY}'
                    ELSE text END AS text
        FROM documents
    ),
    toks AS (
        -- parallel unnest = zip (DuckDB lacks WITH ORDINALITY)
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        FROM docs
    ),
    grams AS (
        SELECT doc_id,
               tok || ' ' || lead(tok, 1) OVER w || ' ' ||
               lead(tok, 2) OVER w || ' ' || lead(tok, 3) OVER w || ' ' ||
               lead(tok, 4) OVER w AS gram,
               lead(tok, {_DECON_K - 1}) OVER w IS NOT NULL AS _full
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    g AS (SELECT doc_id, gram FROM grams WHERE _full),
    ev AS (SELECT DISTINCT gram FROM g
           WHERE md5(CAST(doc_id AS VARCHAR)) < '{_HOLDOUT_LT}'),
    tr AS (SELECT DISTINCT doc_id, gram FROM g
           WHERE md5(CAST(doc_id AS VARCHAR)) >= '{_HOLDOUT_LT}'),
    ov AS (
        SELECT tr.doc_id,
               CAST(count(*) AS INTEGER) AS n_grams,
               CAST(count(ev.gram) AS INTEGER) AS n_overlap
        FROM tr LEFT JOIN ev USING (gram)
        GROUP BY tr.doc_id
    )
    SELECT d.doc_id,
           coalesce(ov.n_grams, 0) AS n_grams,
           coalesce(ov.n_overlap, 0) AS n_overlap,
           CASE WHEN coalesce(ov.n_overlap, 0) > 0 THEN 1 ELSE 0 END
               AS contaminated
    FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
    WHERE md5(CAST(d.doc_id AS VARCHAR)) >= '{_HOLDOUT_LT}'"""


def token_gram_table(df, k: int, id_col: str = "doc_id",
                     text_col: str = "text"):
    """(id, gram) rows: every k-token n-gram of every document, built
    relationally (posexplode once + lead() over the per-doc window —
    the same single-partitioning linear form as
    textstats.winnow_fingerprint_table, and for the same reason: the
    HOF-array formulation re-evaluates the captured array per element,
    measured O(n²)). Tail positions lack a full gram and are dropped
    explicitly — concat_ws skips nulls and would silently emit a
    SHORTER gram."""
    from pyspark.sql import Window

    toks = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    return (
        toks.select(
            id_col,
            F.concat_ws(" ", *parts).alias("gram"),
            F.lead("tok", k - 1).over(w).isNotNull().alias("_full"),
        )
        .where("_full")
        .drop("_full")
    )


@query("text_decontaminate", _DECON_ORACLE)
def text_decontaminate(spark, sf_dir):
    """Train/eval decontamination: per TRAIN doc, its distinct 5-gram
    count, how many of those grams also appear anywhere in the EVAL
    (holdout) slice, and a contaminated flag. Eval gram set is NOT
    broadcast — at 10^10 docs the 5% eval slice's gram set is itself
    huge, so it must flow through the shuffle join (AQE may still
    choose broadcast at small SF, which is exactly the right call
    there)."""
    d = load(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat("text", F.lit(_CANARY)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    h = F.md5(F.col("doc_id").cast("string"))
    grams = token_gram_table(planted, _DECON_K)
    eval_grams = grams.where(h < _HOLDOUT_LT).select("gram").distinct()
    train_grams = grams.where(h >= _HOLDOUT_LT).distinct()
    overlap = (
        train_grams.join(
            eval_grams.withColumn("_hit", F.lit(1)), "gram", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("int").alias("n_overlap"),
        )
    )
    return (
        d.where(h >= _HOLDOUT_LT)
        .select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


_REP_K = 3  # tokens per repetition n-gram (short: intra-doc phrasal echo)

_REP_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               tok || ' ' || lead(tok, 1) OVER w || ' ' ||
               lead(tok, 2) OVER w AS gram,
               lead(tok, {_REP_K - 1}) OVER w IS NOT NULL AS _full
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS INTEGER) AS n_grams,
               CAST(count(DISTINCT gram) AS INTEGER) AS n_distinct
        FROM grams WHERE _full GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_grams, 0) AS n_grams,
           coalesce(a.n_distinct, 0) AS n_distinct,
           CASE WHEN coalesce(a.n_grams, 0) = 0 THEN 0.0
                ELSE round(1.0 - CAST(a.n_distinct AS DOUBLE) / a.n_grams, 4)
           END AS dup_gram_frac
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"""


@query("text_repetition", _REP_ORACLE)
def text_repetition(spark, sf_dir):
    """Intra-document repetition (the Gopher/MassiveText quality
    signal): fraction of a doc's 3-gram occurrences that are repeats of
    an earlier 3-gram in the SAME doc — high values flag boilerplate,
    keyboard-mash and degenerate generations that length/punctuation
    gates miss. One groupBy over the gram table; count and
    count(distinct) share the doc-id partitioning the gram window
    already created, so the whole op is the explode + ONE shuffle.
    Docs shorter than one full gram keep a 0/0/0.0 row."""
    d = load(spark, sf_dir, "documents")
    agg = (
        token_gram_table(d, _REP_K)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_grams"),
            F.count_distinct("gram").cast("int").alias("n_distinct"),
        )
    )
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0)
            )
            .otherwise(
                F.round(
                    1.0 - F.col("n_distinct").cast("double") / F.col("n_grams"), 4
                )
            )
            .alias("dup_gram_frac"),
        )
    )


# ----------------------------------------------------------------- packing
# Sequence packing — concat-and-chunk (the GPT-style packer): documents
# are laid end-to-end in a deterministic order within a shard and cut
# into fixed token-budget chunks; each doc's pack assignment falls out
# of a running token sum. One window per shard key = one hash shuffle,
# no UDF. Shards come from an md5 hex prefix (uniform); ONE hex digit
# (16 shards) matches the fixture scale — at 10^10 docs widen the
# prefix (2 hex = 256, 3 = 4096 shards) so each shard's window state
# stays executor-sized; assignments within a shard are unaffected by
# the shard count of OTHER shards, so the knob only moves parallelism.

_PACK_BUDGET = 512  # tokens per training row


_PACK_ORACLE = f"""
    WITH base AS (
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, shard, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM base
    )
    SELECT doc_id, shard, n_tokens,
           CAST((cum - n_tokens) // {_PACK_BUDGET} AS INTEGER) AS pack_id,
           CAST((cum - n_tokens) % {_PACK_BUDGET} AS INTEGER) AS pack_offset,
           CASE WHEN (cum - 1) // {_PACK_BUDGET}
                     > (cum - n_tokens) // {_PACK_BUDGET}
                THEN 1 ELSE 0 END AS straddles
    FROM cum"""


@query("pack_sequences", _PACK_ORACLE)
def pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing: per doc its shard, whitespace
    token count, the {budget}-token pack it starts in, its offset
    inside that pack, and whether it straddles a pack boundary (the
    fraction of straddlers is the packer's truncation-loss metric).
    Deterministic — order is (shard, doc_id), no RNG — so packs are
    reproducible across reruns and engines, which is what makes the
    split/pack pair safely resumable under incremental ingest: docs
    arriving with higher doc_ids sort after every already-packed doc in
    their shard, so existing assignments never move (prefix stability —
    pinned in tests/test_pipeline_ops.py)."""
    return pack_docs(load(spark, sf_dir, "documents"))


def pack_docs(d):
    """The packer over any (doc_id, text) DataFrame — split out so the
    prefix-stability property is testable on arbitrary subsets."""
    from pyspark.sql import Window

    h = F.md5(F.col("doc_id").cast("string"))
    base = d.select(
        "doc_id",
        F.substring(h, 1, 1).alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / _PACK_BUDGET).cast("int").alias("pack_id"),
        (start % _PACK_BUDGET).cast("int").alias("pack_offset"),
        (
            F.floor((F.col("cum") - 1) / _PACK_BUDGET)
            > F.floor(start / _PACK_BUDGET)
        )
        .cast("int")
        .alias("straddles"),
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


# ------------------------------------------------------- epoch shuffle
# The LAST step a training-data pipeline runs (VERDICT r4 task #8):
# given pack ids from the packer, a seeded deterministic permutation
# fixes each epoch's read order. The permutation is a distributed sort
# by md5(shard:pack:epoch) — no RNG state, no global ORDER BY (ranks
# are per-shard, training readers consume shards independently), and a
# new epoch is a new literal, not a data rewrite.

_SHUFFLE_ORACLE = f"""
    WITH pack_rows AS ({_PACK_ORACLE}),
    packs AS (SELECT DISTINCT shard, pack_id FROM pack_rows),
    keyed AS (
        SELECT shard, pack_id,
               md5(shard || ':' || CAST(pack_id AS VARCHAR) || ':epoch=0')
                   AS shuffle_key
        FROM packs
    )
    SELECT shard, pack_id, shuffle_key,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY shuffle_key)
                AS INTEGER) AS pos
    FROM keyed"""


@query("shuffle_for_training", _SHUFFLE_ORACLE)
def shuffle_for_training(spark, sf_dir):
    """Deterministic epoch-0 shuffle over the packer's output: each
    (shard, pack_id) gets its seeded md5 permutation key and its rank
    within the shard under that key. Composes with pack_sequences
    (same shards, same pack ids) and closes the ingest → pack →
    shuffle story; curate.epoch_shuffle is the shared implementation
    the spark-submit job uses over CDC-replayed transcripts."""
    from ..curate import epoch_shuffle

    packs = pack_sequences(spark, sf_dir).select("shard", "pack_id")
    return epoch_shuffle(packs, epoch=0)


# ------------------------------------------------------ line-level ops
# Inter-document line dedup (MassiveText/C4's boilerplate removal) and
# C4-style heuristic line cleaning (VERDICT r4 tasks #3/#4). The fixture
# text is single-line word soup, so — the established planted-canary
# pattern (_CANARY, _PII_SUFFIX) — both engines deterministically
# reconstruct a multi-line document IDENTICALLY: the token stream is cut
# into 6-token chunk lines, chunk i gets a terminal '.' unless
# (doc_id + i) % 4 == 0, and boilerplate lines are appended on doc_id
# residues (%3 copyright footer, %5 newsletter plea, %11 lorem ipsum) so
# both the dedup and the cleaning rules provably bite.

_LINE_CHUNK = 6
_BP_COPY = "(c) example corp all rights reserved."
_BP_NEWS = "subscribe to our newsletter"
_BP_LOREM = "lorem ipsum dolor sit amet."

# DuckDB CTE producing (doc_id, pos, line) — the zip-unnest pattern from
# the decontamination oracle (unnest + generate_subscripts in one SELECT
# run in lockstep).
_LINES_CTE = f"""
    built AS (
        SELECT doc_id,
               list_concat(
                   list_concat(
                       list_transform(
                           range(CAST(ceil(len(string_split(text, ' ')) / {_LINE_CHUNK}.0)
                                      AS INTEGER)),
                           i -> array_to_string(
                                    string_split(text, ' ')[i * {_LINE_CHUNK} + 1 :
                                                            i * {_LINE_CHUNK} + {_LINE_CHUNK}],
                                    ' ')
                                || CASE WHEN (doc_id + i) % 4 <> 0
                                        THEN '.' ELSE '' END),
                       CASE WHEN doc_id % 3 = 0 THEN ['{_BP_COPY}']
                            ELSE [] END),
                   list_concat(
                       CASE WHEN doc_id % 5 = 0 THEN ['{_BP_NEWS}']
                            ELSE [] END,
                       CASE WHEN doc_id % 11 = 0 THEN ['{_BP_LOREM}']
                            ELSE [] END)) AS lines
        FROM documents
    ),
    doc_lines AS (
        SELECT doc_id,
               unnest(lines) AS line,
               generate_subscripts(lines, 1) - 1 AS pos
        FROM built
    )
"""


def _doc_lines(d):
    """Spark twin of _LINES_CTE: (doc_id, pos, line). One Generate over
    a transform'd array — all expressions JVM builtins in codegen."""
    toks = F.split("text", " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(_LINE_CHUNK))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat(
            F.array_join(F.slice(toks, i * _LINE_CHUNK + 1, _LINE_CHUNK), " "),
            F.when(((F.col("doc_id") + i) % 4) != 0, F.lit(".")).otherwise(""),
        ),
    )

    def _maybe(mod, line):
        return F.when(
            F.col("doc_id") % mod == 0, F.array(F.lit(line))
        ).otherwise(F.array().cast("array<string>"))

    lines = F.concat(chunks, _maybe(3, _BP_COPY), _maybe(5, _BP_NEWS),
                     _maybe(11, _BP_LOREM))
    return d.select("doc_id", F.posexplode(lines).alias("pos", "line"))


_LINE_DEDUP_ORACLE = f"""
    WITH {_LINES_CTE},
    hot AS (
        SELECT line FROM doc_lines
        GROUP BY line
        HAVING count(DISTINCT doc_id)
               > 0.05 * (SELECT count(DISTINCT doc_id) FROM documents)
    ),
    marked AS (
        SELECT l.doc_id, l.pos, l.line, (h.line IS NOT NULL) AS hot
        FROM doc_lines l LEFT JOIN hot h USING (line)
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_lines,
           CAST(sum(CASE WHEN hot THEN 1 ELSE 0 END) AS INTEGER) AS n_dropped,
           coalesce(string_agg(CASE WHEN NOT hot THEN line END, chr(10)
                               ORDER BY pos), '') AS clean_text
    FROM marked GROUP BY doc_id"""


@query("text_line_dedup", _LINE_DEDUP_ORACLE)
def text_line_dedup(spark, sf_dir):
    """Inter-document line-level dedup — the MassiveText/C4 boilerplate
    step the §2.10 family lacked: lines repeated verbatim across more
    than 5% of documents (copyright footers, newsletter pleas) are
    removed from every document; docs are reassembled in line order
    with per-doc drop counts.

    Shape at 10^10 docs: explode → ONE distinct-doc count per line
    (hash shuffle) → broadcast join of the hot set back → one groupBy
    doc_id with an ordered reassembly. The hot set is PROVABLY tiny:
    with relative threshold t and ≤L lines/doc, at most L/t distinct
    lines can each exceed t·n_docs (here L≈30, t=0.05 → ≤600 lines at
    ANY corpus size), so the broadcast never grows with the data —
    unlike dedup-cluster's dupe set, which correctly avoids broadcast
    (queries/dedup.py). The relative threshold also keeps the operator
    scale-invariant (an absolute DF cap would silently change meaning
    between sf0.001 and 10^10 docs)."""
    d = load(spark, sf_dir, "documents")
    lines = _doc_lines(d)
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    hot = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") > 0.05 * F.col("n_docs"))
        .select("line", F.lit(True).alias("hot"))
    )
    marked = lines.join(F.broadcast(hot), "line", "left").fillna(
        False, subset=["hot"]
    )
    kept = F.filter(
        F.sort_array(F.collect_list(F.struct("pos", "hot", "line"))),
        lambda s: ~s["hot"],
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_lines"),
        F.sum(F.col("hot").cast("int")).cast("int").alias("n_dropped"),
        F.concat_ws("\n", F.transform(kept, lambda s: s["line"]))
         .alias("clean_text"),
    )


_C4_ORACLE = f"""
    WITH {_LINES_CTE},
    judged AS (
        SELECT doc_id, pos, line,
               CASE WHEN contains(line, 'lorem ipsum') THEN 'block'
                    WHEN len(string_split(line, ' ')) < 4 THEN 'short'
                    WHEN NOT (line LIKE '%.') THEN 'punct'
               END AS drop_reason
        FROM doc_lines
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_lines,
           CAST(sum(CASE WHEN drop_reason = 'block' THEN 1 ELSE 0 END)
                AS INTEGER) AS n_block,
           CAST(sum(CASE WHEN drop_reason = 'short' THEN 1 ELSE 0 END)
                AS INTEGER) AS n_short,
           CAST(sum(CASE WHEN drop_reason = 'punct' THEN 1 ELSE 0 END)
                AS INTEGER) AS n_punct,
           coalesce(string_agg(CASE WHEN drop_reason IS NULL THEN line END,
                               chr(10) ORDER BY pos), '') AS clean_text
    FROM judged GROUP BY doc_id"""


@query("text_c4_clean", _C4_ORACLE)
def text_c4_clean(spark, sf_dir):
    """C4-style heuristic line cleaning (the public recipe: terminal-
    punctuation filter, min-words-per-line, lorem-ipsum blocklist) with
    per-rule drop counts per document. Rule precedence is pinned —
    blocklist, then min-words, then punctuation — so each dropped line
    is counted exactly once and both engines agree.

    Map-only after the line explode: the judge CASE is one codegen
    expression; the only shuffle is the per-doc reassembly groupBy.
    Same Java∩RE2 discipline as text_pii_scrub — the rules here need
    only substring/suffix/length tests, so the oracle runs literal
    twins."""
    d = load(spark, sf_dir, "documents")
    lines = _doc_lines(d)
    reason = (
        F.when(F.col("line").contains("lorem ipsum"), "block")
        .when(F.size(F.split("line", " ")) < 4, "short")
        .when(~F.col("line").endswith("."), "punct")
    )
    judged = lines.withColumn("drop_reason", reason)
    kept = F.filter(
        F.sort_array(F.collect_list(F.struct("pos", "drop_reason", "line"))),
        lambda s: s["drop_reason"].isNull(),
    )

    def _n(tag):
        # when/otherwise, NOT a bare boolean cast: a kept line's NULL
        # drop_reason would null the comparison, and a doc whose every
        # line is kept would sum to NULL instead of 0
        return (
            F.sum(F.when(F.col("drop_reason") == tag, 1).otherwise(0))
            .cast("int").alias(f"n_{tag}")
        )

    return judged.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_lines"),
        _n("block"),
        _n("short"),
        _n("punct"),
        F.concat_ws("\n", F.transform(kept, lambda s: s["line"]))
         .alias("clean_text"),
    )
