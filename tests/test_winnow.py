"""Winnowing fingerprint properties (queries/textstats.py): the
guarantee that makes it a partial-dup detector — shared token runs
produce shared fingerprints; unrelated text produces none."""

from __future__ import annotations

from pyspark.sql import functions as F

from merlin_spark.queries.textstats import (
    WINNOW_W,
    WINNOW_WIN,
    text_winnow_fingerprint,
    winnow_fingerprint_table,
)

BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four"
)
# ~10% edit: swap two words mid-stream
EDITED = BASE.replace("oscar papa", "apple banana")
UNRELATED = " ".join(f"w{i}x" for i in range(30))


def _fps(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    rows = winnow_fingerprint_table(df, id_col="id", text_col="text").collect()
    out: dict[int, set] = {i: set() for i in range(len(texts))}
    for r in rows:
        out[r["id"]].add(r["fp"])
    return out


def test_edited_copy_shares_most_fingerprints(spark):
    fps = _fps(spark, [BASE, EDITED, UNRELATED])
    base, edited, unrelated = fps[0], fps[1], fps[2]
    shared = len(base & edited) / len(base)
    assert shared > 0.5, shared
    assert not (base & unrelated)


def test_any_long_shared_run_guarantees_a_common_fingerprint(spark):
    """The winnowing guarantee: a shared run of W + WIN - 1 tokens
    yields >=1 common fingerprint even when everything else differs."""
    run_len = WINNOW_W + WINNOW_WIN - 1
    run = " ".join(f"shared{i}" for i in range(run_len))
    a = "aa bb cc dd ee " + run + " ff gg hh ii jj"
    b = "zz yy xx ww vv " + run + " uu tt ss rr qq"
    fps = _fps(spark, [a, b])
    assert fps[0] & fps[1]


def test_qkey_scalar_view_is_deterministic(spark, sf_dir):
    a = text_winnow_fingerprint(spark, sf_dir).toPandas().sort_values("doc_id")
    b = text_winnow_fingerprint(spark, sf_dir).toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert (a["n_fingerprints"] > 0).all()
