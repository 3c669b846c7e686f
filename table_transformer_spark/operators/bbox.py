"""Box algebra as native Spark column expressions.

The DataFrame twins of :mod:`table_transformer_spark.geometry` — pure
column arithmetic, so they run JVM-side inside whole-stage codegen (no
Python in the hot path).  A bbox is an ``array<double>`` column
``[x0, y0, x1, y1]``.

Reference: ``iob`` (src/postprocess.py:48-58) is *the* join predicate of
the system; ``iou`` (src/postprocess.py:34-45); ``overlaps``
(src/postprocess.py:296-304).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "area_expr",
    "intersection_area_expr",
    "iob_expr",
    "iou_expr",
    "overlaps_expr",
    "translate_expr",
    "pad_expr",
]


def area_expr(b: Column) -> Column:
    """Box area, degenerate boxes → 0."""
    return (F.greatest(b[2] - b[0], F.lit(0.0))
            * F.greatest(b[3] - b[1], F.lit(0.0)))


def intersection_area_expr(b1: Column, b2: Column) -> Column:
    return (F.greatest(F.least(b1[2], b2[2]) - F.greatest(b1[0], b2[0]),
                       F.lit(0.0))
            * F.greatest(F.least(b1[3], b2[3]) - F.greatest(b1[1], b2[1]),
                         F.lit(0.0)))


def iob_expr(b1: Column, b2: Column) -> Column:
    """Intersection over area of *b1* — the containment join predicate."""
    a1 = area_expr(b1)
    return F.when(a1 > 0.0, intersection_area_expr(b1, b2) / a1).otherwise(F.lit(0.0))


def iou_expr(b1: Column, b2: Column) -> Column:
    """Intersection over union (plain-union form, valid boxes)."""
    inter = intersection_area_expr(b1, b2)
    union = area_expr(b1) + area_expr(b2) - inter
    return F.when(union > 0.0, inter / union).otherwise(F.lit(0.0))


def overlaps_expr(b1: Column, b2: Column, threshold: float = 0.5) -> Column:
    return iob_expr(b1, b2) >= F.lit(threshold)


def translate_expr(b: Column, dx: Column, dy: Column) -> Column:
    """Shift a bbox array column by (dx, dy) — the token-rebase step of
    the crop stage (src/inference.py:270-275)."""
    return F.array(b[0] + dx, b[1] + dy, b[2] + dx, b[3] + dy)


def pad_expr(b: Column, padding: float) -> Column:
    """Symmetric padding around a detected table before cropping
    (src/inference.py:265-266)."""
    p = F.lit(float(padding))
    return F.array(b[0] - p, b[1] - p, b[2] + p, b[3] + p)
