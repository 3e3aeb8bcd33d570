"""Driver-canonicalizability lint (VERDICT r3 task #2).

The driver canonicalizes every qkey's result with pandas
``sort_values`` over ALL columns before hashing; list/dict cells are
unhashable, so a single top-level ArrayType/MapType/StructType column
silently destroys the key's entire correctness signal (r3:
``dedup_simhash`` + ``mm_embed_binary`` both returned ``spark_rows:
null``). This lint fails the build the moment any driver-facing query
schema regresses. BinaryType stays allowed — bytes hash fine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from merlin_spark.queries import registry

_BANNED = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_unhashable_top_level_columns(spark, sf_dir, name):
    schema = registry.QUERIES[name](spark, sf_dir).schema
    bad = [f"{f.name}: {f.dataType.simpleString()}"
           for f in schema.fields if isinstance(f.dataType, _BANNED)]
    assert not bad, (
        f"{name} exposes driver-unhashable top-level column(s) {bad} — "
        "the driver's pandas canonicalizer crashes on list/dict cells "
        "(zero correctness signal). Flatten to scalar columns "
        "(f0..fN / band0..bandN) or concat_ws-encode."
    )
