"""Checkpointed, resumable extraction job with per-partition lineage.

North-rule requirement: the 10^12-doc job must restart from checkpoint,
reprocessing only incomplete partitions, with lineage + metrics per
partition.  Reference analogs: manual range sharding
(``scripts/process_pubmed.py:1392-1393``), progress counters (1396-1404)
and the OOM skip-list (``scripts/process_fintabnet.py:1086-1087``) —
all hand-operated there; automated here.

Design:

* documents are bucketed by a deterministic hash of ``doc_id``
  (``pmod(xxhash64(doc_id), n_buckets)``) — the explicit partitioning
  axis.  Skewed multi-table docs spread across buckets by construction
  since bucketing ignores content; *within* a bucket, AQE handles
  residual skew.
* buckets are processed in groups; each group is one Spark job writing
  ``out/cells/bucket=<b>/`` and appending one status row per bucket to
  the status table (parquet-backed here; the schema is the Iceberg
  ``extraction_status`` table of FIXTURES.md §6).
* on restart, completed buckets for the same corpus are anti-joined
  away — only incomplete buckets re-run.  Output writes are idempotent
  (dynamic overwrite per bucket directory).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract

STATUS_COLUMNS = ["bucket", "state", "n_docs", "n_spans", "run_id",
                  "wall_sec", "updated_at"]


def _group_dir(spans_dir: str, group: list[int]) -> str:
    return f"{spans_dir}/grp={'-'.join(str(b) for b in group)}"


def _reconcile(spans_dir: str, done: set[int]) -> None:
    """Delete group directories containing any not-yet-committed bucket
    (a crash between data write and status write leaves such orphans;
    their buckets are still in *todo* and would otherwise be written
    twice).  Local-FS implementation; on a real lakehouse this is the
    table format's transaction rollback."""
    import os
    import shutil

    if not os.path.isdir(spans_dir):
        return
    for name in os.listdir(spans_dir):
        if not name.startswith("grp="):
            continue
        buckets = {int(x) for x in name[len("grp="):].split("-")}
        if not buckets <= done:
            shutil.rmtree(os.path.join(spans_dir, name),
                          ignore_errors=True)


def bucketed(documents: DataFrame, n_buckets: int) -> DataFrame:
    return documents.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))


def completed_buckets(spark: SparkSession, status_dir: str) -> set[int]:
    try:
        status = spark.read.parquet(status_dir)
    except Exception:
        return set()
    rows = (status.filter(F.col("state") == "done")
            .select("bucket").distinct().collect())
    return {r.bucket for r in rows}


def run_checkpointed_extraction(spark: SparkSession,
                                documents: DataFrame,
                                media: DataFrame,
                                out_dir: str,
                                n_buckets: int = 8,
                                buckets_per_job: int = 4,
                                mode: str = "clean",
                                run_id: str | None = None,
                                fail_after_jobs: int | None = None) -> dict:
    """Run (or resume) the extraction job.  Returns a summary dict.

    ``fail_after_jobs`` injects a crash after N job groups — used by the
    kill-and-resume test.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    status_dir = f"{out_dir}/status"
    spans_dir = f"{out_dir}/spans"

    done = completed_buckets(spark, status_dir)
    todo = [b for b in range(n_buckets) if b not in done]
    docs_b = bucketed(documents, n_buckets)
    _reconcile(spans_dir, done)

    jobs_run = 0
    for i in range(0, len(todo), buckets_per_job):
        group = todo[i:i + buckets_per_job]
        t0 = time.perf_counter()
        group_docs = (docs_b.filter(F.col("bucket").isin(group))
                      .select("doc_id", "spans"))
        spans = extract(group_docs, media, mode=mode)
        # bucket is a pure function of doc_id — recompute instead of
        # joining back against the documents lineage
        spans = spans.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"),
                             F.lit(n_buckets)).cast("int"))

        # ONE write job per group into its own grp=<...> directory
        # (static overwrite — dynamic partition overwrite pays a
        # driver-serial commit).  Crash-safety: status rows land only
        # after the group directory is fully written; _reconcile
        # removed any partial directory from a crashed run before we
        # started.
        gdir = _group_dir(spans_dir, group)
        (spans.write.partitionBy("bucket").mode("overwrite")
         .parquet(gdir))

        # per-bucket lineage + metrics from the written output
        stats = (spark.read.parquet(gdir)
                 .groupBy("bucket")
                 .agg(F.countDistinct("doc_id").alias("n_docs"),
                      F.count(F.lit(1)).alias("n_spans"))
                 .collect())
        by_bucket = {r.bucket: r for r in stats}
        wall = round(time.perf_counter() - t0, 3)
        now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        status_rows = [
            (int(b),
             "done",
             int(by_bucket[b].n_docs) if b in by_bucket else 0,
             int(by_bucket[b].n_spans) if b in by_bucket else 0,
             run_id, wall, now)
            for b in group]
        (spark.createDataFrame(status_rows, STATUS_COLUMNS)
         .coalesce(1).write.mode("append").parquet(status_dir))

        jobs_run += 1
        if fail_after_jobs is not None and jobs_run >= fail_after_jobs:
            raise RuntimeError(
                f"injected failure after {jobs_run} job group(s)")

    return {"run_id": run_id, "buckets_done_before": sorted(done),
            "buckets_processed": todo, "jobs_run": jobs_run,
            "spans_dir": spans_dir, "status_dir": status_dir}
