"""DuckDB oracle SQL derived from the fixture corpus *design*.

The synthetic corpus (``fixtures.generate``) designs its ground truth —
``true_cells`` are laid out by the generator, never computed by the
extraction kernels — so the expected output span sequence of the
pipeline is known a priori (``expected_spans_clean``, the same function
the pytest suite uses as its oracle).  These builders emit that designed
truth as literal SQL (``VALUES`` lists), giving the driver's DuckDB gate
a fully independent expected answer: the Spark side runs the REAL
decode→detect→crop→recognize→cells→assemble pipeline; the oracle never
touches a kernel.

Both the clean and the noisy pipeline must reproduce the designed truth
exactly (the noisy structure perturbations — jittered boxes, a
low-confidence duplicate row, a sub-threshold spurious spanning cell —
are designed to be healed by thresholding + NMS), so the same oracle
serves both modes.
"""

from __future__ import annotations

from .generate import (
    corpus_media_refs,
    expected_spans_clean,
    gen_document,
    synth_page,
)


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def extract_spans_oracle_sql(n_docs: int) -> str:
    """Designed output spans of the extraction pipeline over the n_docs
    fixture corpus, as a literal VALUES relation (doc_id, kind, text,
    media_ref, offset)."""
    rows = []
    for i in range(n_docs):
        doc = gen_document(f"DOC{i:07d}")
        for s in expected_spans_clean(doc):
            rows.append(f"({_q(doc['doc_id'])},{_q(s['kind'])},"
                        f"{_q(s['text'])},{_q(s['media_ref'])},"
                        f"{s['offset']})")
    values = ",\n".join(rows)
    return (
        "-- designed truth from fixtures.generate.expected_spans_clean\n"
        "-- (generator-side ground truth, independent of the kernels)\n"
        "SELECT doc_id, kind, text, media_ref,\n"
        '       CAST(off AS INTEGER) AS "offset"\n'
        f"FROM (VALUES\n{values}\n)"
        ' AS t(doc_id, kind, text, media_ref, off)')


def grits_slice_counts(n_docs: int) -> dict[str, int]:
    """Designed table counts per GriTS summary slice: a table is
    'complex' iff its designed truth contains a spanning cell (multi-row
    or multi-column coverage — the generator's spanning header or
    projected row header)."""
    counts = {"simple": 0, "complex": 0}
    for i in range(n_docs):
        doc = gen_document(f"DOC{i:07d}")
        for ref in corpus_media_refs(doc):
            page = synth_page(ref)
            for table in page["tables"]:
                spanning = any(
                    len(c["row_nums"]) > 1 or len(c["column_nums"]) > 1
                    for c in table["design"]["true_cells"])
                counts["complex" if spanning else "simple"] += 1
    return counts


def grits_summary_oracle_sql(n_docs: int) -> str:
    """Designed GriTS summary for noisy-vs-clean self-evaluation: the
    noisy pipeline must recover the designed cells *exactly* (geometry
    included — cell bboxes are token hulls, and token assignment heals
    the designed perturbations), so every averaged metric is exactly
    1.0; the per-slice table counts come from the corpus design."""
    counts = grits_slice_counts(n_docs)
    rows = [
        ("all", counts["simple"] + counts["complex"]),
        ("complex", counts["complex"]),
        ("simple", counts["simple"]),
    ]
    values = ",\n".join(f"('{s}',{n})" for s, n in rows)
    return (
        "-- designed truth: noisy == clean cells exactly → all metrics 1\n"
        "SELECT slice, CAST(n AS BIGINT) AS n_tables,\n"
        "       1.0::DOUBLE AS avg_grits_top, 1.0::DOUBLE AS avg_grits_loc,\n"
        "       1.0::DOUBLE AS avg_grits_con, 1.0::DOUBLE AS avg_acc_con,\n"
        "       1.0::DOUBLE AS avg_dar_con\n"
        f"FROM (VALUES\n{values}\n) AS t(slice, n)")
