"""Incremental ingestion: Structured Streaming front-end for the
extraction pipeline.

The reference is a pure batch job; its incremental story is manual
range sharding.  Here, new document files are discovered by a streaming
source and each micro-batch runs the *same* batch extraction via
``foreachBatch`` — exactly-once per micro-batch with the streaming
checkpoint, composing with (not replacing) the bucket-level status
table of :mod:`.checkpoint`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import schemas
from .extract import extract


def stream_extract(spark: SparkSession, documents_dir: str,
                   media: DataFrame, out_dir: str,
                   checkpoint_dir: str, mode: str = "clean"):
    """Watch ``documents_dir`` for new parquet files; extract each
    micro-batch and append the ordered spans to ``out_dir``.

    Returns the started StreamingQuery (caller controls lifecycle:
    ``processAllAvailable()`` for tests, ``awaitTermination()`` in a
    job).
    """
    stream = (spark.readStream
              .schema(schemas.DOCUMENTS_SCHEMA)
              .option("maxFilesPerTrigger", 8)
              .parquet(documents_dir))

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (extract(batch_df, media, mode=mode)
         .write.mode("append").parquet(out_dir))

    return (stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
