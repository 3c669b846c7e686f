"""FinTabNet entry-point connector.

* :func:`create_table_dict` — HTML structure + PDF cell annotations →
  table dict with the validity checks that feed the ``reject``
  provenance (``scripts/process_fintabnet.py:118-162``): cell-count
  mismatch, duplicated grid locations, missing grid locations.
* :func:`fintabnet_jsonl_scan` — the JSONL entry scan
  (``scripts/process_fintabnet.py:1111-1142``): one row per annotated
  table with its source line index and the per-document table index
  (``document_table_index``) assigned in file order, exactly like the
  reference's ``file_idx_to_table_idx``.

The scan is pure DataFrame algebra: line order is recovered from the
hidden file-metadata columns — within a scan task rows of one split
arrive in offset order (``monotonically_increasing_id`` is monotone
there), and splits of one file are ordered by ``_metadata.
file_block_start`` — so ``row_number() over (partition by file_path
order by block_start, mid)`` reproduces exact per-file line numbers
with no RDD hop, no extra count job, and no Python serialization,
robust to Spark's size-ordered split bin-packing.  ``line_idx`` is
per *source file*: a glob of several JSONLs numbers each file
independently (interleaving files can therefore never corrupt the
``document_table_index`` assignment, which orders by source file
first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .export import html_to_cells

__all__ = ["create_table_dict", "fintabnet_jsonl_scan", "FINTABNET_SCHEMA"]


def create_table_dict(html: str, pdf_cells) -> dict:
    """Parse *html* structure, zip with *pdf_cells*
    (``{"tokens": [...], "bbox": [...]|None}``), and run the grid
    validity checks.  Returns a table dict in the canonicalize-kernel
    convention (text / bbox / rows / columns / reject / fix)."""
    table = {"reject": [], "fix": []}
    cells = html_to_cells(html) or []

    pdf_cells = list(pdf_cells)
    if not cells:
        # the reference crashes on max() of the empty location list and
        # the table is dropped — surface that as an explicit reject so
        # degenerate annotations never pass the validity gate silently
        table["reject"].append("no cells parsed")
    if len(cells) != len(pdf_cells):
        table["reject"].append("annotation mismatch")
    for cell, pdf_cell in zip(cells, pdf_cells):
        cell["text"] = "".join(pdf_cell.get("tokens") or []).strip()
        cell["bbox"] = list(pdf_cell.get("bbox") or [])
        cell["is_column_header"] = bool(cell.pop("header", False))
        cell.pop("cell_text", None)

    locations = [(r, c) for cell in cells
                 for r in cell["row_nums"] for c in cell["column_nums"]]
    if len(locations) != len(set(locations)):
        table["reject"].append("HTML overlapping grid cells")

    num_rows = max((max(c["row_nums"]) for c in cells), default=-1) + 1
    num_columns = max((max(c["column_nums"]) for c in cells),
                      default=-1) + 1
    if cells and num_rows * num_columns != len(set(locations)):
        table["reject"].append("HTML missing grid cells")

    table["cells"] = cells
    table["rows"] = {r: {"is_column_header": False}
                     for r in range(num_rows)}
    table["columns"] = {c: {} for c in range(num_columns)}
    return table


FINTABNET_SCHEMA = T.StructType([
    T.StructField("filename", T.StringType()),
    T.StructField("table_id", T.LongType()),
    T.StructField("split", T.StringType()),
    T.StructField("html", T.StructType([
        T.StructField("structure", T.StructType([
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ])),
        T.StructField("cells", T.ArrayType(T.StructType([
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("bbox", T.ArrayType(T.DoubleType())),
        ]))),
    ])),
])


def fintabnet_jsonl_scan(spark: SparkSession, path: str) -> DataFrame:
    """FinTabNet_1.0.0_cell_*.jsonl → one row per table:
    (line_idx, filename, document_id, document_table_index, table_id,
    split, structure_html, pdf_cells).  ``line_idx`` is the exact
    per-source-file line number (see module docstring)."""
    raw = (spark.read.text(path)
           .select("value",
                   F.col("_metadata.file_path").alias("src_file"),
                   F.col("_metadata.file_block_start")
                   .alias("block_start"),
                   F.monotonically_increasing_id().alias("mid")))
    wline = Window.partitionBy("src_file").orderBy("block_start", "mid")
    parsed = (raw
              .withColumn("line_idx",
                          (F.row_number().over(wline) - 1).cast("long"))
              .select("src_file", "line_idx",
                      F.from_json("value", FINTABNET_SCHEMA).alias("j")))
    doc_id = F.array_join(
        F.split(F.element_at(F.split(F.col("j.filename"), r"\."), 1), "/"),
        "_")
    w = Window.partitionBy("document_id").orderBy("src_file", "line_idx")
    return (parsed.select(
                "line_idx",
                F.col("j.filename").alias("filename"),
                doc_id.alias("document_id"),
                F.col("j.table_id").alias("table_id"),
                F.col("j.split").alias("split"),
                F.array_join("j.html.structure.tokens", "")
                .alias("structure_html"),
                F.col("j.html.cells").alias("pdf_cells"),
                "src_file")
            .withColumn("document_table_index",
                        F.row_number().over(w) - 1)
            .drop("src_file"))
