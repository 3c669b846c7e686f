"""The design-side oracle builders (fixtures.design_oracle) emit SQL
whose result is exactly the generator's designed truth — checked here
against the Python design functions directly, with DuckDB as the SQL
engine (no Spark involved; the Spark-vs-oracle comparison itself is the
driver's correctness gate plus test_pipeline_e2e's span equality)."""

import duckdb

from table_transformer_spark.fixtures.design_oracle import (
    extract_spans_oracle_sql,
    grits_slice_counts,
    grits_summary_oracle_sql,
)
from table_transformer_spark.fixtures.generate import (
    expected_spans_clean,
    gen_document,
)

N_DOCS = 24  # __spark_entry__._ENTRY_DOCS


def test_extract_spans_sql_equals_designed_truth():
    expected = []
    for i in range(N_DOCS):
        doc = gen_document(f"DOC{i:07d}")
        for s in expected_spans_clean(doc):
            expected.append((doc["doc_id"], s["kind"], s["text"],
                             s["media_ref"], s["offset"]))
    got = duckdb.connect().execute(
        extract_spans_oracle_sql(N_DOCS)).fetchall()
    assert sorted(got) == sorted(expected)
    assert len(got) > 1000  # the corpus is non-trivial


def test_grits_summary_sql_matches_design_counts():
    counts = grits_slice_counts(N_DOCS)
    assert counts["simple"] > 0 and counts["complex"] > 0
    rows = duckdb.connect().execute(
        grits_summary_oracle_sql(N_DOCS)).fetchall()
    by_slice = {r[0]: r for r in rows}
    assert by_slice["simple"][1] == counts["simple"]
    assert by_slice["complex"][1] == counts["complex"]
    assert by_slice["all"][1] == counts["simple"] + counts["complex"]
    for r in rows:
        assert all(v == 1.0 for v in r[2:])


def test_entry_contract_fully_oracled():
    """Every queries() entry now carries a DuckDB oracle — the driver
    records zero rows-only checks."""
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o)
