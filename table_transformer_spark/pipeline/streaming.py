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


def windowed_event_stream(spark: SparkSession, events_dir: str,
                          event_schema, window: str = "5 minutes",
                          watermark: str = "10 minutes"):
    """Watermarked tumbling-window aggregation over an event stream —
    the Structured-Streaming twin of the batch ``windowed_event_counts``
    query (late data beyond the watermark is dropped; append mode emits
    a window once it can no longer change).
    """
    from pyspark.sql import functions as F

    stream = (spark.readStream.schema(event_schema).parquet(events_dir))
    # watermarks require a zoned timestamp; parquet NTZ timestamps cast
    return (stream
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


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
