"""Text analysis over `documents` — language-ID heuristic, quality
scoring, token counting, fingerprinting (training-data pipeline ops,
task brief). All JVM-side builtins; no UDFs in any of these paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_util import load
from .base import query

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
_SW_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


@query(
    "text_token_count",
    r"""SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
              CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                   AS INTEGER) AS bpe_ish_tokens,
              CAST(length(text) AS BIGINT) AS n_chars
       FROM documents""",
)
def text_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer
    (letter runs / digit runs / single other-chars)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0))).alias(
            "bpe_ish_tokens"
        ),
        F.length("text").cast("long").alias("n_chars"),
    )


@query(
    "text_quality",
    f"""SELECT doc_id,
              round(CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN {_SW_SQL})) AS DOUBLE)
                    / len(string_split(text, ' ')), 4) AS stopword_ratio,
              round(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                         AS DOUBLE) / length(text), 4) AS punct_ratio,
              round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                    / len(string_split(text, ' ')), 4) AS avg_word_len,
              CASE WHEN length(text) BETWEEN 100 AND 5000
                        AND length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                            < 0.1 * length(text)
                   THEN 1 ELSE 0 END AS quality_pass
       FROM documents""",
)
def text_quality(spark, sf_dir):
    """Quality scoring: stopword/punctuation ratios, mean word length,
    and a pass/fail gate (length band + punctuation ceiling)."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    sw = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    nonalnum = F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
    return d.select(
        "doc_id",
        F.round(sw.cast("double") / F.size(words), 4).alias("stopword_ratio"),
        F.round(nonalnum.cast("double") / F.length("text"), 4).alias("punct_ratio"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(words),
            4,
        ).alias("avg_word_len"),
        F.when(
            F.length("text").between(100, 5000)
            & (nonalnum < 0.1 * F.length("text")),
            1,
        )
        .otherwise(0)
        .alias("quality_pass"),
    )


# tiny marker lexicons for the n-gram/marker language heuristic
_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "les", "des"),
}


def _marker_count_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({words})))"


@query(
    "text_lang_guess",
    f"""SELECT doc_id, lang,
              CASE
                WHEN {_marker_count_sql('es')} > {_marker_count_sql('en')}
                     AND {_marker_count_sql('es')} >= {_marker_count_sql('de')}
                     AND {_marker_count_sql('es')} >= {_marker_count_sql('fr')} THEN 'es'
                WHEN {_marker_count_sql('de')} > {_marker_count_sql('en')}
                     AND {_marker_count_sql('de')} >= {_marker_count_sql('fr')} THEN 'de'
                WHEN {_marker_count_sql('fr')} > {_marker_count_sql('en')} THEN 'fr'
                ELSE 'en'
              END AS lang_guess
       FROM documents""",
)
def text_lang_guess(spark, sf_dir):
    """Marker-word language heuristic (argmax over marker hit counts,
    fixed tie-break order es>de>fr>en-default) — deterministic and
    SQL-oracled; a real pipeline swaps in fasttext behind the same
    column contract."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    def _counter(markers):
        # single-arg lambda (two-arg form would be the (elem, idx) variant)
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    cnt = {lang: _counter(m) for lang, m in _MARKERS.items()}
    guess = (
        F.when(
            (cnt["es"] > cnt["en"]) & (cnt["es"] >= cnt["de"]) & (cnt["es"] >= cnt["fr"]),
            "es",
        )
        .when((cnt["de"] > cnt["en"]) & (cnt["de"] >= cnt["fr"]), "de")
        .when(cnt["fr"] > cnt["en"], "fr")
        .otherwise("en")
    )
    return d.select("doc_id", "lang", guess.alias("lang_guess"))


@query(
    "text_fingerprint",
    """SELECT doc_id,
              md5(text) AS fp,
              substring(md5(text), 1, 4) AS fp_bucket
       FROM documents""",
)
def text_fingerprint(spark, sf_dir):
    """Content fingerprint + 16-bit bucket prefix (shard key for
    fingerprint-based dedup joins at scale)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.substring(F.md5("text"), 1, 4).alias("fp_bucket"),
    )


WINNOW_W = 4  # tokens per shingle (the "rolling" unit)
WINNOW_WIN = 5  # shingle-hashes per winnowing window


def winnow_fingerprints(text_col):
    """Winnowing fingerprint SET of a text column (public algorithm:
    Schleimer/Wilkerson/Aiken, MOSS): hash every WINNOW_W-token shingle,
    slide a WINNOW_WIN-wide window over the hash sequence, keep each
    window's minimum, dedupe. Guarantees any shared run of
    WINNOW_W + WINNOW_WIN - 1 tokens contributes at least one COMMON
    fingerprint to both docs — partial-overlap detection that a
    whole-document digest cannot do.

    Entirely JVM higher-order array functions (transform / slice /
    array_min / array_distinct): linear per doc, zero Python, no
    shuffle. Returns array<bigint> — library surface; driver-facing
    qkeys must reduce it to scalars (registry lint bans array outputs)."""
    toks = F.split(text_col, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - WINNOW_W + 1, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, WINNOW_W))),
    )
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(grams) - WINNOW_WIN + 1, F.lit(0))),
        lambda i: F.array_min(F.slice(grams, i, WINNOW_WIN)),
    )
    return F.array_distinct(mins)


@query("text_winnow_fingerprint")  # rows-only: xxhash64 has no DuckDB twin
def text_winnow_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprinting (task brief) via winnowing:
    per doc, the count of selected fingerprints and their XOR-fold as a
    stable digest. Containment property (an edited copy shares most
    fingerprints with its original; unrelated docs share none) is
    pinned in tests/test_winnow.py — that, not this scalar view, is
    the operator's correctness evidence."""
    d = load(spark, sf_dir, "documents")
    fps = winnow_fingerprints(F.col("text"))
    return d.select(
        "doc_id",
        F.size(fps).alias("n_fingerprints"),
        F.aggregate(fps, F.lit(0).cast("long"), lambda a, x: a.bitwiseXOR(x)).alias(
            "fp_xor"
        ),
    )
