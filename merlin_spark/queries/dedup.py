"""Deduplication suite over the `documents` table — first-class
training-data-pipeline operators (task brief): exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design notes (100 TB): every variant is expressed as
explode → hash-shuffle → aggregate, i.e. linear passes plus one
key-partitioned shuffle — never an O(n²) comparison. Candidate
generation (LSH bands / bucket join) bounds the pair space; exact
verification runs only on candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..io_util import load
from .base import query


@query(
    "dedup_exact",
    """SELECT md5(text) AS text_hash,
              count(*) AS n_copies,
              min(doc_id) AS keeper_doc_id
       FROM documents GROUP BY md5(text)""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content digest; keeper = min id.
    One shuffle on the digest; partial agg combines map-side."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_copies"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


# document-frequency ceiling for Jaccard candidate generation: tokens
# appearing in more than DF_MAX docs are skipped as PAIR GENERATORS (a
# stop-word's posting list would pair quadratically — one token in 10^6
# docs = 5·10^11 pairs). They still count in the exact verification, so
# reported Jaccard values are exact; only pairs sharing NOTHING but
# hot tokens are missed — and two docs made purely of stop-words are
# noise, not near-duplicates (standard posting-list/prefix-filter cap).
JACCARD_DF_MAX = 64


_JACCARD_ORACLE = f"""WITH tok AS (
         SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
         FROM documents WHERE n_chars < 200
       ),
       sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
       rare AS (SELECT w FROM tok GROUP BY w HAVING count(*) <= {JACCARD_DF_MAX}),
       rtok AS (SELECT tok.doc_id, tok.w FROM tok JOIN rare USING (w)),
       cand AS (
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM rtok a JOIN rtok b ON a.w = b.w AND a.doc_id < b.doc_id
       ),
       common AS (
         SELECT cand.doc_a, cand.doc_b, count(*) AS n_common
         FROM cand
         JOIN tok ta ON ta.doc_id = cand.doc_a
         JOIN tok tb ON tb.doc_id = cand.doc_b AND tb.w = ta.w
         GROUP BY cand.doc_a, cand.doc_b
       )
       SELECT doc_a, doc_b,
              round(n_common / (sa.sz + sb.sz - n_common), 4) AS jaccard
       FROM common
       JOIN sizes sa ON sa.doc_id = doc_a
       JOIN sizes sb ON sb.doc_id = doc_b
       WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.5"""


@query("dedup_jaccard_pairs", _JACCARD_ORACLE)
def dedup_jaccard_pairs(spark, sf_dir):
    """Exact token-set Jaccard via inverted index with a
    document-frequency cap: candidate pairs come only from tokens whose
    posting list is ≤ JACCARD_DF_MAX docs (hot tokens would pair
    quadratically); candidates are then verified EXACTLY against the
    full token sets, so every reported Jaccard is the true value.
    Three linear passes + token-hash shuffles — never n² in the corpus,
    and never quadratic in a stop-word's posting list.
    (Restricted to short docs to keep the pair space tiny at sf0.1.)"""
    d = load(spark, sf_dir, "documents").where(F.col("n_chars") < 200)
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    rare = tok.groupBy("w").agg(F.count("*").alias("df")).where(
        F.col("df") <= JACCARD_DF_MAX
    ).select("w")
    rtok = tok.join(rare, "w")
    a = rtok.alias("a")
    b = rtok.alias("b")
    cand = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ta = tok.alias("ta")
    tb = tok.alias("tb")
    common = (
        cand.join(ta, F.col("doc_a") == F.col("ta.doc_id"))
        .join(tb, (F.col("doc_b") == F.col("tb.doc_id")) & (F.col("tb.w") == F.col("ta.w")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


_CLUSTER_MAX_ITERS = 20  # ≥ max component diameter; near-dup clusters
# are clique-like (diameter 1-2), so the fixpoint loop exits in 2-3
# rounds — the bound is a runaway guard, not the expected cost


@query(
    "dedup_cluster_canonical",
    f"""WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )
        SELECT a AS doc_id,
               least(a, min(b)) AS cluster_id,
               a = least(a, min(b)) AS is_canonical
        FROM reach GROUP BY a""",
)
def dedup_cluster_canonical(spark, sf_dir):
    """Near-duplicate CLUSTERING — the step that turns a pair list into
    dedup decisions: connected components over the exact-Jaccard pair
    graph, cluster id = min doc_id in the component, and that doc is
    the cluster's canonical keeper (every other member is a duplicate
    to drop). Hash-oracled against a DuckDB recursive-CTE transitive
    closure over the identical pair SQL.

    Physical strategy: iterative min-label propagation — per round one
    equi join (edges × labels) + one aggregate, labels
    localCheckpoint'ed so the plan does not grow with rounds. Rounds =
    O(max component diameter); near-dup components are clique-like so
    2-3 rounds suffice at any corpus size (the per-round work is fully
    distributed — the driver only checks the converged flag). At
    10^10 docs swap the propagation for the large-star/small-star
    alternation — implemented in merlin_spark/graph.py and driven by
    the `dedup_cluster_bigstar` twin qkey (same oracle, O(log^2 n)
    rounds regardless of component diameter)."""
    p = dedup_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = p.unionByName(
        p.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).cache()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_CLUSTER_MAX_ITERS):
        nbr_min = (
            edges.join(
                labels.select(F.col("doc_id").alias("_nb"), "label"),
                F.col("doc_b") == F.col("_nb"),
            )
            .groupBy("doc_a").agg(F.min("label").alias("_nl"))
        )
        new = (
            labels.join(
                nbr_min.select(F.col("doc_a").alias("_da"), "_nl"),
                labels["doc_id"] == F.col("_da"), "left",
            )
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("_nl", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n").join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label")).count()
        )
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("is_canonical"),
    ).orderBy("doc_id")


@query(
    "dedup_cluster_bigstar",
    f"""WITH RECURSIVE pairs AS ({_JACCARD_ORACLE}),
        edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )
        SELECT a AS doc_id,
               least(a, min(b)) AS cluster_id,
               a = least(a, min(b)) AS is_canonical
        FROM reach GROUP BY a""",
)
def dedup_cluster_bigstar(spark, sf_dir):
    """`dedup_cluster_canonical` computed by the large-star/small-star
    alternation (merlin_spark/graph.py) instead of min-label
    propagation — same pair graph, same canonical output, same
    recursive-CTE oracle, so the driver hash proves the two
    implementations agree. This is the 10^10-edge path the propagation
    docstring promises: O(log^2 n) rounds regardless of component
    diameter (propagation is O(diameter)), each round one hash shuffle
    + one aggregate, neighbor sets never materialized as arrays.
    Long-chain convergence pinned in tests/test_graph_cc.py."""
    from ..graph import connected_components

    p = dedup_jaccard_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels, _ = connected_components(p)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_canonical"),
    ).orderBy("doc_id")


N_PERM = 32  # minhash permutations
BAND = 4  # rows per band → 8 bands


def _shingles(d):
    """3-word shingles as single strings (n-gram unit for minhash)."""
    words = F.split("text", " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", words[i], words[i + 1], words[i + 2])
    )
    return d.select("doc_id", F.explode(F.array_distinct(sh)).alias("sh"))


@query("dedup_minhash_lsh")  # probabilistic recall ⇒ rows-only check
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash + LSH near-dup pairs (shingle → minhash → band →
    bucket-join → exact-verify). Fully JVM-side: permutations are
    xxhash64(shingle, seed_i); LSH bucket = hash of each band's
    signature slice. Candidates from bucket collisions only, then
    verified with exact shingle Jaccard — no false positives, recall
    governed by (32 perms, 8 bands × 4 rows).

    At 10^10-doc scale each stage is a linear explode + one hash
    shuffle; the only pair-space is within-bucket."""
    d = load(spark, sf_dir, "documents")
    sh = _shingles(d)
    # signature: hash each shingle STRING once (xxhash64), then derive
    # the 32 permutations by re-hashing that fixed-width 8-byte value
    # with per-permutation seeds. One O(len) string hash + 32 O(1)
    # integer hashes per shingle instead of 32 full string hashes —
    # same MinHash independence (each seed gives an independent hash of
    # the shingle's identity), several-fold cheaper on real text.
    # (Multiply-add universal hashing would be cheaper still but ANSI
    # mode forbids the wrapping long arithmetic it relies on.)
    h = F.xxhash64("sh")
    sig = sh.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        F.array(
            *[F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"h{i}")
              for i in range(N_PERM)]
        ).alias("sig")
    )
    # bands: bucket key = (band_idx, hash(slice))
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_PERM // BAND - 1)),
                lambda bidx: F.struct(
                    bidx.alias("band"),
                    F.xxhash64(F.slice("sig", bidx * BAND + 1, BAND).cast("string")).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # estimate = fraction of matching minhashes; keep est ≥ 0.5
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(N_PERM)
    )
    return cand.select(
        "doc_a", "doc_b", F.round(est, 4).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= 0.5).orderBy("doc_a", "doc_b")


@query("dedup_simhash")  # custom bit-twiddling ⇒ rows-only check
def dedup_simhash(spark, sf_dir):
    """64-bit SimHash per doc, JVM-side: token → xxhash64 → per-bit ±1
    vote → sign vector → packed bits. explode(tokens) keeps it linear;
    the 64 bit-votes are one aggregate of 64 sums (no per-row Python).
    Output: doc_id, simhash (as hex), plus 16-bit prefix bucket —
    near-dups share prefixes (hamming-ball blocking at scale)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    # ±1 bit-vote via plain popcount sums: sum_b = Σ bit_b(h) per doc;
    # the signed vote 2·sum_b − n is positive ⟺ sum_b > n/2, so each of
    # the 64 aggregates is a branchless sum of a masked shift (no
    # per-row CASE WHEN — same result, cheaper codegen)
    votes = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(64)
        ],
    )
    packed = votes.select(
        "doc_id",
        sum(
            [F.when(F.col(f"b{b}") * 2 > F.col("n"), F.lit(1).cast("long") * (2**b)).otherwise(0) for b in range(63)],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return packed.select(
        "doc_id",
        F.lower(F.hex("simhash")).alias("simhash_hex"),
        F.shiftrightunsigned("simhash", 48).alias("bucket16"),
        # multi-band blocking keys: 8 bands × 8 bits, key = band_idx
        # tagged into the high byte. Pigeonhole: a pair within hamming
        # distance 7 MUST share at least one untouched band, so a
        # stack(band0..band7) → groupBy(band) candidate join has
        # guaranteed recall at h≤7 and high probabilistic recall just
        # above it — the single bucket16 prefix is only coarse locality.
        # (Recall evidenced in tests/test_dedup_recall.py.) Emitted as
        # 8 scalar int columns, NOT array<int>: the driver's pandas
        # canonicalizer cannot hash list cells (r3 zero-signal bug).
        *[
            (F.lit(b * 256) + F.shiftrightunsigned("simhash", b * 8)
             .bitwiseAND(F.lit(255))).cast("int").alias(f"band{b}")
            for b in range(8)
        ],
    ).orderBy("doc_id")


@query(
    "dedup_embedding_cosine",
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              round(list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]), 4) AS cos
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE a.label = b.label
         AND list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]) >= 0.8""",
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup: cosine ≥ 0.8 within the same label block
    (blocking key = equi prefix, so Spark plans a hash join, not a
    cross product; at scale the blocking key would be an LSH/IVF
    bucket — see ann_lsh_bucketed). Vector math via zip_with/aggregate,
    JVM-side."""
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    # norms precomputed ONCE per row (O(n·dim)), not per candidate pair
    # (O(pairs·dim)) — same arithmetic, so the oracle still matches
    e = e.withColumn("nrm", norm("emb"))
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with("a.emb", "b.emb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= 0.8)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round("cos_raw", 4).alias("cos"),
        )
    )


@query(
    "dedup_levenshtein_pairs",
    """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              levenshtein(a.text, b.text) AS edit_dist
       FROM documents a
       JOIN documents b
         ON a.lang = b.lang AND a.doc_id < b.doc_id
       WHERE a.n_chars < 120 AND b.n_chars < 120
         AND abs(a.n_chars - b.n_chars) <= 20
         AND levenshtein(a.text, b.text) <= 40""",
)
def dedup_levenshtein_pairs(spark, sf_dir):
    """Edit-distance near-dup pairs with blocking (SURVEY.md §2.9
    `levenshtein` builtin as a first-class dedup operator).

    Candidate generation is an EXACT band join: |len(a)-len(b)| is a
    lower bound on edit distance, so the ±W length band is a sound
    pre-filter. Physically it's an equi join on (lang, length_bucket)
    with the left side replicated to its 3 adjacent buckets — bucket
    width = W guarantees every in-band pair shares one of them, and
    each unordered pair matches exactly once (a fixed right bucket hits
    at most one of the left's 3 replicas; doc_a < doc_b keeps one
    orientation). Joining on lang ALONE would hash all candidates into
    ~5 reducer keys — a parallelism ceiling of 5 tasks regardless of
    cluster size; the bucket term multiplies key cardinality so the
    O(len²) distance work spreads across executors. The oracle states
    the declarative semantics (band predicate) — results are identical
    by construction."""
    W = 20
    d = load(spark, sf_dir, "documents").where(F.col("n_chars") < 120).select(
        "doc_id", "lang", "text", "n_chars",
        F.floor(F.col("n_chars") / W).alias("bk"),
    )
    # the probe side arrives as ONE scan partition (small parquet file):
    # under the broadcast join every levenshtein then runs in a single
    # task. Round-robin repartition spreads the O(len²) distance work
    # across the cluster; at corpus scale (right side too big to
    # broadcast) the (lang, jb) equi keys take over as the exchange.
    a = d.select(
        "*", F.explode(F.array(F.col("bk") - 1, F.col("bk"), F.col("bk") + 1)).alias("jb")
    ).repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = d.withColumn("jb", F.col("bk")).alias("b")
    # thresholded levenshtein computes only the |dist| ≤ 2·40 diagonal
    # band of the DP matrix (returns -1 beyond) — O(len·threshold)
    # instead of O(len²) per candidate, the dominant cost of this query
    dist = F.levenshtein(F.col("a.text"), F.col("b.text"), 40)
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.jb") == F.col("b.jb"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= W),
        )
        .where(dist >= 0)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
    )


# ------------------------------------------------- hash-oracled verify twin
# VERDICT r4 task #6: the production minhash path (dedup_minhash_lsh)
# is permanently rows-only because its permutations are xxhash64 —
# DuckDB cannot recompute them. This twin runs the IDENTICAL dataflow
# (distinct shingles → minhash signature → banded bucket join → exact
# Jaccard re-rank) with md5 permutations, a hash BOTH engines share, so
# the driver hash-checks every stage of the LSH machinery: candidate
# generation, pair dedup, and the exact re-rank arithmetic. 16 perms /
# 4 bands × 4 rows (vs the production 32/8×4) halves the md5 cost; the
# band threshold curve shifts but the dataflow under test is the same.

_V_PERM = 16
_V_BAND = 4  # rows per band → 4 bands

_MINHASH_VERIFY_ORACLE = f"""
    WITH shl AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   range(len(string_split(text, ' ')) - 2),
                   i -> array_to_string(string_split(text, ' ')[i + 1 : i + 3],
                                        ' ')))) AS sh
        FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    sig AS (
        SELECT doc_id,
               {", ".join(f"min(md5('{i}|' || sh)) AS s{i}" for i in range(_V_PERM))}
        FROM shl GROUP BY doc_id
    ),
    bands AS (
        {" UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, "
            f"md5({'||'.join(f's{_V_BAND * b + r}' for r in range(_V_BAND))}) AS bkey "
            "FROM sig"
            for b in range(_V_PERM // _V_BAND))}
    ),
    cand AS (
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shl GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS i
        FROM cand c
        JOIN shl a ON a.doc_id = c.doc_a
        JOIN shl b ON b.doc_id = c.doc_b AND b.sh = a.sh
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT c.doc_a, c.doc_b,
           round(CAST(coalesce(i.i, 0) AS DOUBLE)
                 / (sa.n + sb.n - coalesce(i.i, 0)), 4) AS jaccard
    FROM cand c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b"""


@query("dedup_minhash_verify", _MINHASH_VERIFY_ORACLE)
def dedup_minhash_verify(spark, sf_dir):
    """md5-permutation twin of dedup_minhash_lsh with the exact-Jaccard
    re-rank as the hashed output — every candidate pair the banded
    bucket join emits, with its true shingle Jaccard. Same shape at
    scale: explode → hash shuffle per stage, pair space bounded by
    bucket collisions, never all-pairs."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n = F.size(words)
    sh_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(" ", words[i], words[i + 1], words[i + 2]),
        )
    )
    sh = d.where(n >= 3).select("doc_id", F.explode(sh_arr).alias("sh"))
    sig = sh.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"{i}|"), "sh"))).alias(f"s{i}")
          for i in range(_V_PERM)]
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[F.md5(F.concat(*[F.col(f"s{_V_BAND * b + r}")
                                   for r in range(_V_BAND)]))
                  for b in range(_V_PERM // _V_BAND)]
            )
        ).alias("band", "bkey"),
    )
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(r, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.bkey") == F.col("r.bkey"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(sh.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(sh.alias("b"), (F.col("doc_b") == F.col("b.doc_id"))
              & (F.col("b.sh") == F.col("a.sh")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    return (
        cand.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.coalesce("i", F.lit(0)).cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.coalesce("i", F.lit(0))),
                4,
            ).alias("jaccard"),
        )
    )


# ------------------------------------------------------------------ simhash
# verify twin. Bit b (0 = LSB) of the 64-bit token hash, read out of the
# first 16 hex chars of md5(token) — nibble-wise so BOTH engines evaluate
# the identical integer expression (Spark `conv(hexchar,16,10)` ==
# DuckDB `instr('0123456789abcdef', hexchar) - 1`; no 64-bit parse, so no
# signed-overflow divergence on values >= 2^63).
def _sv_bit_sql(b: int) -> str:
    return (
        f"(((instr('0123456789abcdef', substr(h, {16 - b // 4}, 1)) - 1)"
        f" >> {b % 4}) & 1)"
    )


_SIMHASH_VERIFY_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        FROM documents
    ),
    hs AS (SELECT doc_id, md5(w) AS h FROM tok),
    votes AS (
        SELECT doc_id, count(*) AS n,
               {", ".join(f"sum({_sv_bit_sql(b)}) AS v{b}" for b in range(64))}
        FROM hs GROUP BY doc_id
    ),
    bits AS (
        SELECT doc_id,
               {", ".join(f"CASE WHEN 2 * v{b} > n THEN 1 ELSE 0 END AS s{b}"
                          for b in range(64))}
        FROM votes
    )
    SELECT doc_id,
           {" || ".join(
               "substr('0123456789abcdef', 1 + "
               + " + ".join(f"{1 << j} * s{(16 - k) * 4 + j}" for j in range(4))
               + ", 1)"
               for k in range(1, 17))} AS simhash_hex,
           {", ".join(
               f"CAST({256 * b} + "
               + " + ".join(f"{1 << j} * s{b * 8 + j}" for j in range(8))
               + f" AS INTEGER) AS band{b}"
               for b in range(8))}
    FROM bits ORDER BY doc_id"""


@query("dedup_simhash_verify", _SIMHASH_VERIFY_ORACLE)
def dedup_simhash_verify(spark, sf_dir):
    """md5-bit twin of `dedup_simhash`: the IDENTICAL dataflow —
    distinct tokens → 64 per-bit ±1 votes in one aggregate → majority
    sign → packed hex + 8×8-bit multi-band blocking keys — with the
    token hash read from md5 so DuckDB recomputes every stage and the
    driver hash-checks the machinery end-to-end (votes, majority
    threshold, bit packing, band extraction). Production keeps
    xxhash64 (one JVM hash vs 16 nibble reads); this twin exists so
    the rows-only production key's every moving part is hash-proven.
    All expressions are plain Spark-SQL (whole-stage codegen; no
    Python). Same shape at scale: explode → one hash shuffle."""
    d = load(spark, sf_dir, "documents")
    hs = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"),
    ).withColumn("h", F.md5("w"))

    def bit(b: int):
        nib = F.conv(F.substring("h", 16 - b // 4, 1), 16, 10).cast("int")
        return F.shiftright(nib, b % 4).bitwiseAND(F.lit(1))

    votes = hs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(bit(b)).alias(f"v{b}") for b in range(64)],
    )
    bits = votes.select(
        "doc_id",
        *[
            F.when(F.col(f"v{b}") * 2 > F.col("n"), F.lit(1))
            .otherwise(F.lit(0))
            .alias(f"s{b}")
            for b in range(64)
        ],
    )
    hex_col = F.concat(
        *[
            F.expr(
                "substr('0123456789abcdef', 1 + "
                + " + ".join(f"{1 << j} * s{(16 - k) * 4 + j}" for j in range(4))
                + ", 1)"
            )
            for k in range(1, 17)
        ]
    )
    return bits.select(
        "doc_id",
        hex_col.alias("simhash_hex"),
        *[
            F.expr(
                f"CAST({256 * b} + "
                + " + ".join(f"{1 << j} * s{b * 8 + j}" for j in range(8))
                + f" AS INT) AS band{b}"
            )
            for b in range(8)
        ],
    ).orderBy("doc_id")
