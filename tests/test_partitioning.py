"""Partitioning / skew behavior of the extraction plan.

North-rule requirement: partition by doc_id with explicit skew handling
for multi-table documents.  The pipeline's unit of work is the *page*
(``media_ref = img://<doc_id>/p<n>``), so a document's pages hash to
different partitions by construction — doc_id partitioning salted by
page ordinal — and the explicit ``repartition(2×cores, media_ref)``
before the kernel stage overrides AQE's byte-based coalescing (tiny
bytes, heavy compute).
"""

import pytest

from pyspark.sql import functions as F


def test_multi_page_docs_spread_across_partitions(spark):
    from table_transformer_spark.fixtures.spark_io import documents_df, media_df
    from table_transformer_spark.pipeline.extract import media_spans

    docs = documents_df(spark, 64)
    media = media_df(spark, 64)
    pages = (media_spans(docs)
             .join(media.select("media_ref", "payload"), "media_ref")
             .select("doc_id", "media_ref", "page_offset", "payload"))
    par = spark.sparkContext.defaultParallelism
    pages = pages.repartition(par * 2, "media_ref")

    dist = (pages.withColumn("pid", F.spark_partition_id())
            .groupBy("doc_id")
            .agg(F.countDistinct("pid").alias("n_partitions"),
                 F.count(F.lit(1)).alias("n_pages"))
            .collect())
    multi = [r for r in dist if r.n_pages >= 3]
    assert multi, "fixture corpus should contain multi-page docs"
    # pages of one doc are not funneled into a single partition
    assert any(r.n_partitions > 1 for r in multi)


def test_kernel_stage_partition_count_overrides_aqe(spark):
    from table_transformer_spark.fixtures.spark_io import documents_df, media_df
    from table_transformer_spark.pipeline.extract import run_cells

    docs = documents_df(spark, 32)
    media = media_df(spark, 32)
    cells = run_cells(docs, media)
    plan = cells._jdf.queryExecution().executedPlan().toString()
    # the explicit repartition must appear in the physical plan
    assert "hashpartitioning(media_ref" in plan


def test_extraction_deterministic_across_parallelism(spark):
    """Same corpus, different shuffle parallelism → byte-identical
    ordered output (the determinism-under-parallelism invariant)."""
    from table_transformer_spark.fixtures.spark_io import documents_df, media_df
    from table_transformer_spark.pipeline.extract import extract

    docs = documents_df(spark, 10)
    media = media_df(spark, 10)
    out1 = sorted((r.doc_id, r.offset, r.kind, r.text, r.media_ref)
                  for r in extract(docs, media).collect())
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        out2 = sorted((r.doc_id, r.offset, r.kind, r.text, r.media_ref)
                      for r in extract(docs, media).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert out1 == out2
