"""Distributed GriTS evaluation: applyInPandas over per-table pairs.

The reference fans eval out with a ``multiprocessing.Pool``
(``src/eval.py:646-654``); here Spark *is* the pool: true cells and
predicted cells are cogrouped per (doc_id, media_ref, table_num) and the
per-table-pair metric kernel (``compute_metrics``, src/eval.py:266-331)
runs inside the group.  The rollup (``compute_metrics_summary``,
src/eval.py:394-423) is a plain slice-aggregation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.adjacency import (
    adjacency_pairs,
    adjacency_pairs_with_blanks,
    dar_con,
)
from ..kernels.grits import grits_con, grits_loc, grits_top

TABLE_KEY = ["doc_id", "media_ref", "table_num"]

METRICS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("table_num", T.IntegerType()),
    T.StructField("grits_top", T.DoubleType()),
    T.StructField("grits_top_upper_bound", T.DoubleType()),
    T.StructField("grits_loc", T.DoubleType()),
    T.StructField("grits_con", T.DoubleType()),
    T.StructField("acc_con", T.IntegerType()),
    T.StructField("dar_con_original", T.DoubleType()),
    T.StructField("dar_con", T.DoubleType()),
    T.StructField("num_true_cells", T.IntegerType()),
    T.StructField("num_pred_cells", T.IntegerType()),
    T.StructField("num_spanning_true", T.IntegerType()),
])


def _rows_to_cells(pdf: pd.DataFrame):
    cells = []
    for row in pdf.itertuples(index=False):
        cells.append({
            "bbox": list(row.bbox),
            "row_nums": list(row.row_nums),
            "column_nums": list(row.column_nums),
            "cell_text": row.cell_text,
        })
    return cells


def _metrics_kernel(key, true_pdf: pd.DataFrame,
                    pred_pdf: pd.DataFrame) -> pd.DataFrame:
    true_cells = _rows_to_cells(true_pdf)
    pred_cells = _rows_to_cells(pred_pdf)

    top_f, _, _, top_ub = grits_top(true_cells, pred_cells)
    loc_f, _, _, _ = grits_loc(true_cells, pred_cells)
    con_f, _, _, _ = grits_con(true_cells, pred_cells)
    _, _, dar_orig = dar_con(adjacency_pairs(true_cells),
                             adjacency_pairs(pred_cells))
    _, _, dar_new = dar_con(adjacency_pairs_with_blanks(true_cells),
                            adjacency_pairs_with_blanks(pred_cells))
    n_span = sum(1 for c in true_cells
                 if len(c["row_nums"]) > 1 or len(c["column_nums"]) > 1)

    return pd.DataFrame([{
        "doc_id": key[0], "media_ref": key[1], "table_num": int(key[2]),
        "grits_top": float(top_f),
        "grits_top_upper_bound": float(top_ub),
        "grits_loc": float(loc_f),
        "grits_con": float(con_f),
        "acc_con": int(con_f == 1),
        "dar_con_original": float(dar_orig),
        "dar_con": float(dar_new),
        "num_true_cells": len(true_cells),
        "num_pred_cells": len(pred_cells),
        "num_spanning_true": n_span,
    }])


def grits_table_metrics(true_cells: DataFrame,
                        pred_cells: DataFrame) -> DataFrame:
    """Per-table GriTS/DAR metrics: cogroup on the table key, metric
    kernel per pair.  Tables present on only one side still produce a
    row (empty-side F-score conventions apply)."""
    from ..partitioning import widen_for_cpu

    cols = TABLE_KEY + ["bbox", "row_nums", "column_nums", "cell_text"]
    # fresh aliases give each side distinct expression ids, so
    # true==pred (self-evaluation) does not trip the ambiguous
    # self-join analyzer check; explicit widen on both sides — the DP
    # metric kernels are CPU-bound on tiny rows, and AQE's byte-based
    # coalescing would otherwise run every table pair in one task
    # (user repartition satisfies the cogroup's hash-clustered
    # distribution, so no extra shuffle is added)
    left = widen_for_cpu(
        true_cells.select(*[F.col(c).alias(c) for c in cols]), *TABLE_KEY)
    right = widen_for_cpu(
        pred_cells.select(*[F.col(c).alias(c) for c in cols]), *TABLE_KEY)
    grouped_true = left.groupBy(*TABLE_KEY)
    grouped_pred = right.groupBy(*TABLE_KEY)
    return grouped_true.cogroup(grouped_pred).applyInPandas(
        _metrics_kernel, schema=METRICS_SCHEMA)


def grits_summary(metrics: DataFrame) -> DataFrame:
    """simple/complex/all rollup (compute_metrics_summary,
    src/eval.py:394-423): simple = no spanning cells in truth."""
    sliced = metrics.withColumn(
        "slice",
        F.when(F.col("num_spanning_true") == 0, "simple")
        .otherwise("complex"))
    aggs = [F.round(F.avg(c), 6).alias(f"avg_{c}")
            for c in ("grits_top", "grits_loc", "grits_con",
                      "acc_con", "dar_con")]
    per_slice = sliced.groupBy("slice").agg(
        F.count(F.lit(1)).alias("n_tables"), *aggs)
    overall = sliced.groupBy(F.lit("all").alias("slice")).agg(
        F.count(F.lit(1)).alias("n_tables"), *aggs)
    return per_slice.unionByName(overall).orderBy("slice")
