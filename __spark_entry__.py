"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction job end-to-end;
``queries()`` / ``oracle_sql()`` expose the operator catalog
(table_transformer_spark.driver_queries) for the DuckDB correctness
gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from table_transformer_spark.driver_queries import ORACLES, QUERIES

_ENTRY_DOCS = 24


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the table-extraction pipeline over the
    BASELINE-contract corpus.

    The input table (``documents(doc_id, spans)`` interleaved text+media,
    BASELINE.json input_hint) does not exist in the driver testdata, so
    it is synthesized deterministically on executors (seed=42), exactly
    as the tests and bench do — no external data.  Returns the ordered
    output spans (doc_id, kind, text, media_ref, offset); row count and
    schema are stable across runs and parallelism levels.
    """
    from table_transformer_spark.fixtures.spark_io import documents_df, media_df
    from table_transformer_spark.pipeline.extract import extract

    docs = documents_df(spark, _ENTRY_DOCS)
    media = media_df(spark, _ENTRY_DOCS)
    return extract(docs, media, mode="clean")


def _extraction_query(mode: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # sf_dir carries the TPC-H-ish tables; the extraction corpus is
        # synthesized (input_hint shape) — size chosen to keep the
        # per-round check fast while covering the skew slice.
        from table_transformer_spark.fixtures.spark_io import (
            documents_df,
            media_df,
        )
        from table_transformer_spark.pipeline.extract import extract

        docs = documents_df(spark, _ENTRY_DOCS)
        media = media_df(spark, _ENTRY_DOCS)
        return extract(docs, media, mode=mode)

    return run


def _grits_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed GriTS (Top/Loc/Con + DAR) of the noisy pipeline vs
    the clean pipeline, rolled up over simple/complex/all slices.
    Not SQL-expressible (DP alignment kernels) → rows-only check."""
    from table_transformer_spark.eval.grits_distributed import (
        grits_summary,
        grits_table_metrics,
    )
    from table_transformer_spark.fixtures.spark_io import documents_df, media_df
    from table_transformer_spark.pipeline.extract import run_cells

    docs = documents_df(spark, _ENTRY_DOCS)
    media = media_df(spark, _ENTRY_DOCS)
    true_cells = run_cells(docs, media, mode="clean")
    pred_cells = run_cells(docs, media, mode="noisy")
    return grits_summary(grits_table_metrics(true_cells, pred_cells))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Operator inventory: every SQL-expressible operator from
    SURVEY.md §2 paired with a DuckDB oracle, plus the non-SQL
    extraction pipeline itself (rows-only check)."""
    out = dict(QUERIES)
    out["extract_spans_clean"] = _extraction_query("clean")
    out["extract_spans_noisy"] = _extraction_query("noisy")
    out["grits_summary_noisy_vs_clean"] = _grits_query
    out["canonicalize_tables"] = _canonicalize_query
    return out


def _canonicalize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FinTabNet-family canonicalization chain over extracted cells
    (annotate PRH → remove empty → merge spanned → header rules →
    blank absorption).  Order-sensitive kernel chain → rows-only check."""
    from table_transformer_spark.fixtures.spark_io import documents_df, media_df
    from table_transformer_spark.operators.canonicalize_df import (
        canonicalize_cells_df,
    )
    from table_transformer_spark.pipeline.extract import run_cells

    docs = documents_df(spark, _ENTRY_DOCS)
    media = media_df(spark, _ENTRY_DOCS)
    out = canonicalize_cells_df(run_cells(docs, media, mode="clean"))
    # The driver's value hasher sorts the output in pandas and cannot
    # handle list-typed cells — serialize the array columns to
    # deterministic strings for the query-facing contract (arrays stay
    # arrays inside the kernel chain).
    from pyspark.sql import functions as F
    return out.select(
        "doc_id", "media_ref", "table_num", "cell_num",
        F.concat_ws(",", "row_nums").alias("row_nums"),
        F.concat_ws(",", "column_nums").alias("column_nums"),
        "cell_text", "is_column_header", "is_projected_row_header",
        F.concat_ws("|", "reject").alias("reject"),
        F.concat_ws("|", "fix").alias("fix"))


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (see driver_queries for the paired
    implementations).  extract_spans_* are deliberately omitted: the
    cells kernel chain is not ANSI-SQL-expressible (driver records
    rows-only checks)."""
    return dict(ORACLES)
