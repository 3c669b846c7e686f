#!/usr/bin/env python3
"""Strict oracle sweep at 3× documents scale (round-3 verdict #8).

The driver's correctness gate runs at sf0.01/sf0.1; this script keeps
the "strict-clean ahead of the gate scale" claim honest by rebuilding
the documents-family tables at 3× row count and re-running the ENTIRE
oracle-parity suite (tests/test_driver_queries.py — every Spark query
vs its DuckDB twin, rows + columns + value multiset) against them.

Corpus construction (deterministic, no external data): documents and
embeddings are tripled with ids shifted by +10⁷ per copy; copies k>0
get a ``c{k}`` text prefix / a dyadic +2⁻⁷ jitter on one embedding
component so the copies are near- but not exact duplicates (realistic
for the dedup family, and n_chars is recomputed).  The relational
tables (lineitem, orders, …) pass through unchanged from the source
scale — the documents family is what the sweep stresses.

Usage:  python scripts/x3_sweep.py [source_sf_dir] [work_dir]
        (defaults: /root/testdata/sf0.1  /tmp/ttspark_x3)
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIFT = 10_000_000
PASSTHROUGH = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events"]


def build(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in PASSTHROUGH:
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
                    f" TO '{out}/{t}.parquet' (FORMAT parquet)")
    con.execute(f"""
        COPY (
          SELECT doc_id + k * {SHIFT} AS doc_id,
                 CASE WHEN k = 0 THEN text
                      ELSE 'c' || k || ' ' || text END AS text,
                 lang, source,
                 CAST(length(CASE WHEN k = 0 THEN text
                      ELSE 'c' || k || ' ' || text END) AS BIGINT)
                   AS n_chars
          FROM read_parquet('{src}/documents.parquet')
          CROSS JOIN range(3) tk(k)
        ) TO '{out}/documents.parquet' (FORMAT parquet)""")
    # jitter one component per copy k>0: +k*2^-7 on dim (k-1) — dyadic,
    # exact in float32, keeps copies near-identical but distinct
    con.execute(f"""
        COPY (
          SELECT vec_id + k * {SHIFT} AS vec_id,
                 CAST(list_transform(
                   list_zip(embedding,
                            range(len(embedding))) ,
                   z -> CAST(z[1] AS DOUBLE)
                        + CASE WHEN k > 0 AND z[2] = k - 1
                               THEN k * 0.0078125 ELSE 0.0 END)
                   AS FLOAT[]) AS embedding,
                 label
          FROM read_parquet('{src}/embeddings.parquet')
          CROSS JOIN range(3) tk(k)
        ) TO '{out}/embeddings.parquet' (FORMAT parquet)""")
    for t in PASSTHROUGH + ["documents", "embeddings"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"[x3] {t}: {n} rows", file=sys.stderr)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ttspark_x3"
    build(src, out)
    env = dict(os.environ, SPARK_GRAFT_TEST_SF_DIR=out)
    res = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(REPO, "tests", "test_driver_queries.py"),
         "-q", "--no-header"],
        cwd=REPO, env=env)
    sys.exit(res.returncode)


if __name__ == "__main__":
    main()
