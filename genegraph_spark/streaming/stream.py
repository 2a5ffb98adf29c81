"""Structured Streaming ingest: the reference's Kafka consumer loop
re-expressed as readStream → transform → foreachBatch MERGE.

Reference analog: per-topic consumer threads with manual offset
management and catch-up detection (``src/genegraph/sink/stream.clj:106-360``).
Spark mapping: source offsets/checkpointing replace the hand-rolled
offset file (``stream.clj:221-236``); each micro-batch is one idempotent
named-graph MERGE (the reference wraps each poll batch in one write tx,
``sink/event.clj:172-178``); ``Trigger.AvailableNow`` reproduces the
"consume to end offsets then stop" catch-up loop (``stream.clj:190-219``).

In the sandbox the source is a file stream over a pages parquet
directory (no Kafka broker); on a cluster the same plan reads
``format("kafka")`` with the html payload in ``value``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures
from ..functions.text import extract_text, is_tombstone
from ..operators import mentions as M

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "version int, doc_id long, tombstone boolean"
)


def write_pages_source(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """Materialize the pages table as a parquet directory usable as a
    file-stream source (one file per partition = multiple micro-batch
    splits)."""
    fixtures.pages_df(spark, sf_dir).repartition(4).write.mode("overwrite").parquet(out_dir)
    return out_dir


def stream_mention_counts(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, table_name: str = "stream_mentions"
) -> DataFrame:
    """Streaming mention detection: file stream → extract → gazetteer join
    → running per-entity mention counts in the memory sink. Runs with
    availableNow (process everything, then stop) and returns the result.
    """
    src = spark.readStream.schema(PAGE_SCHEMA).parquet(source_dir)
    extracted = (
        src.withColumn("etext", extract_text(F.col("html")))
        .where(F.col("etext").isNotNull() & ~is_tombstone(F.col("html")))
    )
    toks = extracted.select(
        "url", F.explode(F.split(F.col("etext"), " ")).alias("token")
    ).where(F.col("token") != "")
    alias = fixtures.alias_df(spark).where(F.col("label_kind") == "preferred")
    hits = toks.join(
        F.broadcast(alias.withColumnRenamed("label", "token")), "token", "inner"
    )
    counts = hits.groupBy("iri").agg(F.count("*").alias("n_mentions"))
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


def stream_windowed_events(
    spark: SparkSession, events_dir: str, checkpoint_dir: str, table_name: str = "stream_windows"
) -> DataFrame:
    """Event-time windowed aggregation with a watermark (late-data
    handling the reference lacks — its ordering is offset-based):
    5-minute tumbling windows of event counts per type."""
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )
    # complete mode: availableNow ends the stream before the watermark
    # would flush append-mode windows
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
