"""Dataset-assembly ops (queries/pipeline.py): semantics beyond the
hash oracle — redaction completeness, split determinism + fraction,
stratified rates — and the 100 TB plan shape (map-only: no Exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from merlin_spark.queries.pipeline import (
    _PACK_BUDGET,
    pack_sequences,
    sample_stratified_hash,
    split_train_holdout,
    text_decontaminate,
    text_pii_scrub,
)



def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_scrub_removes_every_injected_pattern(spark, sf_dir_stats):
    out = text_pii_scrub(spark, sf_dir_stats)
    # nothing email/phone/long-id shaped survives in clean_text
    leftovers = out.where(
        F.col("clean_text").rlike(r"[A-Za-z0-9._%+-]+@")
        | F.col("clean_text").rlike(r"\d{3}-\d{4}")
        | F.col("clean_text").rlike(r"\d{9,}")
    ).count()
    assert leftovers == 0
    # every row had exactly the injected 1 email + 1 phone + 1 long id
    bad = out.where(
        (F.col("n_emails") != 1) | (F.col("n_phones") != 1) | (F.col("n_ids") != 1)
    ).count()
    assert bad == 0
    # placeholders actually present
    assert out.where(~F.col("clean_text").contains("<EMAIL>")).count() == 0


def test_split_is_deterministic_and_near_nominal_fraction(spark, sf_dir_stats):
    a = split_train_holdout(spark, sf_dir_stats).toPandas().set_index("doc_id")["split"]
    b = split_train_holdout(spark, sf_dir_stats).toPandas().set_index("doc_id")["split"]
    assert a.sort_index().equals(b.sort_index())
    frac = (a == "holdout").mean()
    # nominal 13/256 ≈ 5.1%; 500 docs → give binomial slack
    assert 0.01 < frac < 0.12, frac


def test_stratified_rates_differ_by_language(spark, sf_dir_stats):
    from pyspark.sql import functions as F  # noqa: F811

    from merlin_spark.io_util import load

    totals = (
        load(spark, sf_dir_stats, "documents").groupBy("lang").count().toPandas()
        .set_index("lang")["count"]
    )
    kept = (
        sample_stratified_hash(spark, sf_dir_stats).groupBy("lang").count().toPandas()
        .set_index("lang")["count"]
    )
    en_rate = kept.get("en", 0) / totals["en"]
    other_kept = kept.drop("en", errors="ignore").sum()
    other_total = totals.drop("en", errors="ignore").sum()
    assert 0.02 < en_rate < 0.20, en_rate            # nominal ~10.2%
    assert 0.35 < other_kept / other_total < 0.65    # nominal 50%


def test_decontaminate_detects_every_planted_canary(spark, sf_dir_stats):
    """Every train doc carrying the planted canary sentence shares its
    canary 5-grams with the eval slice (7 eval canary docs exist at
    sf0.01), so ALL of them must be flagged; the flag must also be
    exactly (n_overlap > 0), and n_overlap bounded by n_grams."""
    out = text_decontaminate(spark, sf_dir_stats).toPandas().set_index("doc_id")
    canary_train = [i for i in out.index if i % 7 == 0]
    assert len(canary_train) > 0
    assert (out.loc[canary_train, "contaminated"] == 1).all()
    assert ((out["n_overlap"] > 0) == (out["contaminated"] == 1)).all()
    assert (out["n_overlap"] <= out["n_grams"]).all()
    # eval docs themselves never appear in the (train-only) output
    import hashlib

    assert all(
        hashlib.md5(str(i).encode()).hexdigest() >= "0d" for i in out.index
    )


def test_repetition_flags_degenerate_text(spark, sf_dir_stats):
    """A doc that is one phrase repeated collapses to a single distinct
    gram (dup fraction → 1); fully novel text keeps n == distinct
    (fraction 0) — the two poles the Gopher-style gate separates."""
    from merlin_spark.queries.pipeline import token_gram_table

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    g = (
        token_gram_table(df, 3)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.count_distinct("gram").alias("d"))
        .toPandas()
        .set_index("doc_id")
    )
    assert g.loc[1, "n"] == 4 and g.loc[1, "d"] == 1
    assert g.loc[2, "n"] == 4 and g.loc[2, "d"] == 4


def test_pack_sequences_invariants(spark, sf_dir_stats):
    """Within every shard: offsets/pack ids are exactly the running-sum
    layout (first doc at pack 0 offset 0, assignments monotone in
    doc_id), every offset < budget, and a doc straddles iff its span
    crosses a budget boundary."""
    df = pack_sequences(spark, sf_dir_stats).toPandas()
    assert (df["pack_offset"] < _PACK_BUDGET).all()
    assert (df["pack_offset"] >= 0).all()
    for _, g in df.groupby("shard"):
        g = g.sort_values("doc_id")
        start = g["n_tokens"].cumsum() - g["n_tokens"]
        assert (g["pack_id"] == start // _PACK_BUDGET).all()
        assert (g["pack_offset"] == start % _PACK_BUDGET).all()
        end = start + g["n_tokens"] - 1
        assert (
            (g["straddles"] == 1)
            == (end // _PACK_BUDGET > start // _PACK_BUDGET)
        ).all()
        assert g["pack_id"].iloc[0] == 0 and g["pack_offset"].iloc[0] == 0
    # the packer must exercise both branches at this corpus size
    assert df["straddles"].sum() > 0
    assert (df["straddles"] == 0).sum() > 0


def test_pack_prefix_stable_under_incremental_ingest(spark, sf_dir_stats):
    """The resumability claim, pinned: packing only the docs with
    doc_id ≤ cutoff must yield EXACTLY the assignments those docs have
    when the full corpus is packed — later-arriving (higher-id) docs
    sort after them in every shard, so a CDC-appended batch never moves
    an already-emitted pack."""
    from merlin_spark.io_util import load
    from merlin_spark.queries.pipeline import pack_docs

    d = load(spark, sf_dir_stats, "documents")
    cutoff = d.approxQuantile("doc_id", [0.6], 0.0)[0]
    full = pack_docs(d).where(F.col("doc_id") <= cutoff)
    prefix = pack_docs(d.where(F.col("doc_id") <= cutoff))
    diff = full.exceptAll(prefix).unionByName(prefix.exceptAll(full))
    assert diff.count() == 0
    assert prefix.count() > 0


def test_all_three_plans_are_map_only(spark, sf_dir_stats):
    """No Exchange (shuffle) and no Python eval in any of the three —
    the 100 TB plan is one scan with codegen'd expressions."""
    for fn in (text_pii_scrub, split_train_holdout, sample_stratified_hash):
        plan = _plan(fn(spark, sf_dir_stats))
        assert "Exchange" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, fn.__name__
