"""merlin_spark — a PySpark-native CDC / incremental-ingest engine.

Built from scratch against the contract in BASELINE.json (tier
``cdc_ingest``): tail a binlog/WAL-style change stream of conversation
transcript mutations and apply them as key-partitioned, exactly-once
MERGE upserts into an Iceberg-style lake table keyed on
``(conv_id, turn_idx)``, with last-writer-wins dedup over
``(conv_id, turn_idx, ts, lsn)``, additive schema evolution,
crash-resumable replay from an LSN/offset checkpoint store, and
per-partition lineage + metrics each micro-batch.

Spark-first design: every operator is declared through the DataFrame /
SQL API so Catalyst + AQE pick the physical plan; Python custom code is
confined to vectorized Arrow/pandas UDFs (text normalization, as-of
join) — no per-row Python, no RDDs anywhere.

NOTE on provenance: the reference repo (/root/reference, Mbaroudi/Merlin)
was empty in this sandbox (see SURVEY.md §0), so no reference file:line
citations exist; BASELINE.json is the authoritative spec and is cited
throughout.
"""

__version__ = "0.1.0"
