"""Distributed fixture-corpus materialization.

The corpus is generated *on executors* (``spark.range`` →
``mapInPandas``): every document and page derives deterministically from
its id, so generation parallelizes embarrassingly and never funnels
through the driver — the same property the real 10^12-doc corpus would
have (read from Iceberg instead of generated).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import schemas
from .generate import (
    corpus_media_refs,
    encode_page_payload,
    gen_document,
    synth_page,
)


def _doc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {"doc_id": [], "spans": []}
        for i in pdf["id"]:
            doc = gen_document(f"DOC{int(i):07d}")
            rows["doc_id"].append(doc["doc_id"])
            rows["spans"].append([
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in doc["spans"]])
        yield pd.DataFrame(rows)


def _media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {"media_ref": [], "payload": [], "width": [], "height": []}
        for i in pdf["id"]:
            doc = gen_document(f"DOC{int(i):07d}")
            for ref in corpus_media_refs(doc):
                page = synth_page(ref)
                rows["media_ref"].append(ref)
                rows["payload"].append(encode_page_payload(page))
                rows["width"].append(page["width"])
                rows["height"].append(page["height"])
        yield pd.DataFrame(rows)


def documents_df(spark: SparkSession, n_docs: int,
                 partitions: int | None = None) -> DataFrame:
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    return (spark.range(n_docs, numPartitions=parts)
            .mapInPandas(_doc_batches, schema=schemas.DOCUMENTS_SCHEMA))


def media_df(spark: SparkSession, n_docs: int,
             partitions: int | None = None) -> DataFrame:
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    return (spark.range(n_docs, numPartitions=parts)
            .mapInPandas(_media_batches, schema=schemas.MEDIA_SCHEMA))


def write_corpus(spark: SparkSession, n_docs: int, out_dir: str,
                 partitions: int | None = None) -> None:
    """Materialize documents + media as parquet (the test/bench stand-in
    for the Iceberg corpus tables)."""
    documents_df(spark, n_docs, partitions).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents")
    media_df(spark, n_docs, partitions).write.mode("overwrite") \
        .parquet(f"{out_dir}/media")


def read_corpus(spark: SparkSession, out_dir: str):
    return (spark.read.parquet(f"{out_dir}/documents"),
            spark.read.parquet(f"{out_dir}/media"))
