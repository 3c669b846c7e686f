"""Kill-and-resume semantics for the checkpointed extraction job."""

import pytest

from table_transformer_spark.fixtures.spark_io import documents_df, media_df
from table_transformer_spark.pipeline.checkpoint import (
    completed_buckets,
    run_checkpointed_extraction,
)
from table_transformer_spark.pipeline.extract import extract

N_DOCS = 16


@pytest.fixture(scope="module")
def corpus(spark):
    docs = documents_df(spark, N_DOCS).cache()
    media = media_df(spark, N_DOCS).cache()
    docs.count(), media.count()
    return docs, media


def spans_set(rows):
    return sorted((r.doc_id, r.offset, r.kind, r.text, r.media_ref)
                  for r in rows)


def test_kill_and_resume_produces_identical_output(spark, corpus, tmp_path):
    docs, media = corpus
    out = str(tmp_path / "job")

    # reference output: one straight run, no checkpointing
    expected = spans_set(extract(docs, media, mode="clean").collect())

    # run 1: crash injected after the first job group
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed_extraction(spark, docs, media, out,
                                    n_buckets=8, buckets_per_job=2,
                                    fail_after_jobs=1)
    done_after_crash = completed_buckets(spark, f"{out}/status")
    assert len(done_after_crash) == 2

    # run 2: resume — only incomplete buckets reprocess
    summary = run_checkpointed_extraction(spark, docs, media, out,
                                          n_buckets=8, buckets_per_job=2)
    assert sorted(summary["buckets_done_before"]) == sorted(done_after_crash)
    assert set(summary["buckets_processed"]).isdisjoint(done_after_crash)

    got = spans_set(spark.read.parquet(f"{out}/spans")
                    .select("doc_id", "offset", "kind", "text", "media_ref")
                    .collect())
    assert got == expected

    # status table carries lineage for every bucket
    status = spark.read.parquet(f"{out}/status")
    assert completed_buckets(spark, f"{out}/status") == set(range(8))
    rows = status.collect()
    assert all(r.run_id for r in rows)
    assert sum(r.n_docs for r in rows) == N_DOCS


def test_rerun_after_completion_is_noop(spark, corpus, tmp_path):
    docs, media = corpus
    out = str(tmp_path / "job2")
    run_checkpointed_extraction(spark, docs, media, out,
                                n_buckets=4, buckets_per_job=4)
    summary = run_checkpointed_extraction(spark, docs, media, out,
                                          n_buckets=4, buckets_per_job=4)
    assert summary["jobs_run"] == 0
    assert summary["buckets_processed"] == []
