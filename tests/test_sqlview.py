"""SQL view layer: base-table views, the identical-SQL qkey, and
composing SQL over operator-result views (register_query_views)."""

from pyspark.sql import functions as F  # noqa: F401

from merlin_spark.queries.sqlview import register_query_views, register_views, sql


def test_base_table_views_register(spark, sf_dir):
    register_views(spark, sf_dir)
    got = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0]
    assert got.n > 0


def test_compose_sql_over_operator_results(spark, sf_dir):
    names = register_query_views(
        spark, sf_dir, keys=["dedup_exact", "text_quality"]
    )
    assert names == ["q_dedup_exact", "q_text_quality"]
    # join one operator's output against another's in pure SQL
    got = spark.sql("""
        SELECT count(*) AS n
        FROM q_dedup_exact d JOIN q_text_quality t
          ON d.keeper_doc_id = t.doc_id
    """).collect()[0]
    assert got.n > 0


def test_bulk_registration_is_lazy_and_skips_side_effects(spark, sf_dir):
    names = register_query_views(spark, sf_dir)
    assert "q_icebox_time_travel" not in names
    assert "q_binlog_ds_scan" not in names
    assert len(names) > 60  # the rest of the registry is exposed
