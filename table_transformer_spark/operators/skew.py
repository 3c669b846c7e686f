"""Explicit skew handling: salted join.

AQE's skew-join splitting handles most runtime skew, but a join whose
HOT KEY is known up front (a stopword event type, a mega-document) is
cheaper to fix structurally: replicate the build side over ``n_salts``
salt values and scatter the probe side's hot rows across them, so no
single task ever owns a whole hot key.  Equality with the unsalted
join is exact — the salt is an extra equi-join column that partitions
each key's rows, never drops or duplicates them.

This is the north rule's "explicit salting" as a reusable operator;
the extraction pipeline itself salts doc_id by page ordinal
(``media_ref``) at the partitioning layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                n_salts: int = 16, salt_from: str | None = None,
                how: str = "inner") -> DataFrame:
    """Join *probe* ⋈ *build* on *key* with an ``n_salts``-way salt.

    The probe side's salt must be deterministic per row but uniform
    within a key: a hash of *salt_from* (default: every probe column),
    mod ``n_salts``.  The build side is exploded ``n_salts``× (it is
    the small side — replication is the price of killing the hot-key
    straggler).  ``merge`` hint on the join so the demonstration stays
    a shuffle join even when the build side would broadcast — at real
    scale the build side is too big to broadcast, which is the only
    reason to salt at all.
    """
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        # a right/full outer join would emit every unmatched build row
        # n_salts times (one per replica) — equality with the unsalted
        # join only holds for probe-preserving join types
        raise ValueError(f"salted_join does not support how={how!r}")
    salt_cols = [salt_from] if salt_from else probe.columns
    p = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)))
    b = (build.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0),
                                          F.lit(n_salts - 1))))
         .withColumn("_salt", F.col("_salt").cast("bigint")))
    return (p.join(b.hint("merge"), [key, "_salt"], how)
            .drop("_salt"))
