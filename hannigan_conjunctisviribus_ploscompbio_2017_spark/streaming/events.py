"""Structured Streaming surface (SURVEY §2.13).

The reference is batch-only (the Neo4j graph is dropped and rebuilt per
run, Makefile:461-473); this module adds the incremental path a
continuously-ingesting deployment needs: watermarked windowed aggregation
and sessionization over an event stream, plus an incremental
edge-abundance upsert via foreachBatch.

Batch/stream parity: the aggregations here are the streaming twins of
queries_testdata.ev_hourly_agg / ev_sessionize — same logic, plus
watermark. Tests drive them with a bounded file source +
processAllAvailable() (the documented local-smoke pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source event stream (swap for kafka in production — same
    downstream plan)."""
    return (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts + value sums per
    event_type. Late rows beyond the watermark are dropped; state is
    bounded by watermark horizon — required for an unbounded 100 TB/day
    stream."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_aggregates(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (session_window = the streaming analog of
    the batch lag/cumsum sessionization in queries_testdata.ev_sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded stream to completion synchronously into an
    in-memory table (local smoke pattern); returns the query handle —
    caller reads spark.sql(f'SELECT * FROM {name}')."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def incremental_edge_upsert(
    stream_df: DataFrame,
    target_path: str,
    checkpoint: str,
):
    """foreachBatch upsert: fold each micro-batch of (src, dst, abundance
    delta) into the Sampled-edge parquet store — the incremental
    replacement for the reference's drop-and-rebuild loads.

    Design: append-log of per-epoch partial aggregates (one write per
    micro-batch, no read-modify-write race between batches), compacted on
    read by `read_incremental_edges`. Exactly-once: a retried epoch
    appends identical rows under the same _epoch, deduped at read time.
    """

    def _append(batch: DataFrame, epoch_id: int) -> None:
        agg = (
            batch.groupBy("src", "dst")
            .agg(F.sum("abundance").alias("abundance"))
            .withColumn("_epoch", F.lit(int(epoch_id)))
        )
        agg.write.mode("append").parquet(target_path)

    return (
        stream_df.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def streaming_first_seen(
    events: DataFrame,
    key_col: str = "props",
    watermark: str = "2 hours",
    retention_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: cross-batch
    streaming dedup. Emits each key's FIRST event only; every later
    occurrence — same micro-batch or any later one — is dropped. The
    streaming twin of the batch exact-dedup operator (operators/dedup.py),
    for ingest pipelines that must never admit a duplicate document twice.

    State per key is one boolean, evicted by event-time timeout
    `retention_ms` past the group's max event time — bounded state on an
    unbounded stream, same discipline as the watermarked windows above.
    Output: (key, first_event_id, first_ts, n_dups) where n_dups counts
    suppressed duplicates in the first-seen batch."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("first_event_id", T.LongType()),
            T.StructField("first_ts", T.TimestampType()),
            T.StructField("n_dups", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def dedup(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
        elif state.exists:
            for _ in pdfs:  # drain: all rows are duplicates
                pass
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            first = rows.sort_values(["ts", "event_id"]).iloc[0]
            state.update((True,))
            state.setTimeoutTimestamp(
                int(rows["ts"].max().timestamp() * 1000) + retention_ms
            )
            yield pd.DataFrame(
                [
                    {
                        "key": key[0],
                        "first_event_id": int(first["event_id"]),
                        "first_ts": first["ts"],
                        "n_dups": int(len(rows) - 1),
                    }
                ]
            )

    return (
        events.withColumn("key", F.col(key_col))
        .withWatermark("ts", watermark)
        .groupBy("key")
        .applyInPandasWithState(
            dedup, out_schema, state_schema, "append", "EventTimeTimeout"
        )
    )


def read_incremental_edges(spark: SparkSession, target_path: str) -> DataFrame:
    """Compact the epoch append-log into current edge abundances
    (dedup epoch retries, then sum deltas)."""
    log = spark.read.parquet(target_path)
    return (
        log.dropDuplicates(["src", "dst", "_epoch"])
        .groupBy("src", "dst")
        .agg(F.sum("abundance").alias("abundance"))
    )
