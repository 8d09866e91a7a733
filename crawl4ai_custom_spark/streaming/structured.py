"""Structured Streaming operators: event-time windows + custom state.

Complements streaming/emission.py (the reference's stream=True emission
granularity) with REAL Spark Structured Streaming over the events table —
what a production deployment runs against a Kafka/files feed of crawl or
interaction events:

  stream_events_hourly   readStream -> withWatermark -> windowed agg
                         (late data handled by the watermark, not by code)
  stream_sessionize      applyInPandasWithState: per-user session counting
                         with a processing-timeout-free event-time gap rule —
                         the custom stateful operator shape for anything the
                         built-in windows can't express.

Both accept any streaming DataFrame with the events schema; helpers read a
parquet directory as a file-source stream so tests/benches can drive them
with Trigger.AvailableNow and compare against the batch oracle
(q_events_hourly / q_sessionize semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(EVENTS_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def stream_events_hourly(events: DataFrame,
                         watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type; the watermark
    bounds state and admits late rows inside its horizon. Batch twin:
    q_events_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type", "n", "avg_value",
        )
    )


_SESS_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("n_sessions", LongType())]
)
_SESS_STATE = StructType(
    [StructField("last_sec", LongType()), StructField("n_sessions", LongType())]
)


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Event-time session counting: a new session opens when the gap from
    the previous event exceeds 1800 s (same rule as the batch q_sessionize).
    State is (last event second, sessions so far) per user."""
    last_sec, n_sessions = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        secs = (pdf["ts"].astype("int64") // 1_000_000_000).sort_values()
        for s in secs:
            s = int(s)
            if last_sec is None or s - last_sec > 1800:
                n_sessions += 1
            last_sec = s
    state.update((last_sec, n_sessions))
    yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n_sessions]})


def stream_sessionize(events: DataFrame) -> DataFrame:
    """Per-user session counts via applyInPandasWithState — the custom
    stateful-operator seam (reference has no equivalent; this is the shape
    any bespoke streaming state takes in this engine). Emits the running
    count per user each trigger; the final micro-batch's rows equal the
    batch q_sessionize answer when events arrive in event-time order per
    user (file-source streams preserve file order; a real feed would add a
    watermark + sort buffer stage)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=_SESS_SCHEMA,
        stateStructType=_SESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(stream_df: DataFrame, out_table: str,
                      checkpoint: str, output_mode: str = "complete") -> None:
    """Drain the stream's current input with Trigger.AvailableNow into a
    memory sink (tests/benches); blocks until done."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


PAGES_DDL = "url string, warc_ts timestamp, html binary"


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a pages directory — the continuous-ingestion
    shape: a fetcher fleet appends parquet files, Spark streams them in."""
    r = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def stream_extract_pages(pages: DataFrame) -> DataFrame:
    """Continuous extraction: the SAME mapInPandas extraction stage the batch
    engine uses, applied to a streaming DataFrame — html arrives, cleaned
    text/markdown/links leave. Stateless, so it needs no watermark; each
    micro-batch is one Arrow-staged pass (identical per-row semantics to
    batch extract_pages — asserted by the batch-equivalence test)."""
    from ..operators.extraction import extract_pages

    return extract_pages(pages)
