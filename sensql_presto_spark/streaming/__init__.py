"""Structured Streaming extension (beyond-reference; SURVEY.md §2.11).

The reference has no streaming execution at all — its Kafka/Redis
connectors read topics as batch tables — so nothing here owes parity.
These are the standard Spark streaming shapes a pipeline on the same data
would run: event-time tumbling windows with a watermark over the ``events``
table, executed with the ``availableNow`` trigger so a test (or the
driver's oracle) sees a deterministic, batch-equivalent result.

Production notes baked into the design: the memory sink is test-only (the
result set is a few hundred aggregate rows — window × event_type — never
raw events); a real deployment writes append-mode to files/Kafka and the
watermark bounds state store size. The aggregation itself is the same
partial/final shuffle as batch — state is keyed by (window, event_type),
so it holds at arbitrary input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensql_presto_spark import catalog


def tumbling_window_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    name: str = "events_stream_tumbling",
    timeout_s: int = 180,
) -> DataFrame:
    """Event-time tumbling-window aggregation over a file stream.

    Reads ``events.parquet`` through ``readStream`` (file source), applies
    a watermark + window aggregation, runs to completion with
    ``availableNow``, and returns the materialized result as a batch
    DataFrame. With a single availableNow pass the watermark drops nothing,
    so the result equals the batch ``date_trunc('hour', ts)`` aggregation —
    which is exactly what the DuckDB oracle checks.
    """
    catalog._ensure_session_conf(spark)
    path = f"{sf_dir}/events.parquet"
    # File streams need an explicit schema; take it from the batch reader's
    # footer-only metadata pass (ts arrives as raw nanos under
    # nanosAsLong, same as the batch path).
    schema = spark.read.parquet(path).schema

    # The file source wants a directory; glob-filter to the events table.
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_val"))
    )

    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_s)

    return (
        spark.table(name)
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            F.round("sum_val", 4).alias("sum_val"),
        )
        .orderBy("win_start", "event_type")
    )
