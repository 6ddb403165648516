"""Structured Streaming surface: incremental page ingest + event analytics.

The reference's crawler is a long-running producer and its indexer is batch
(SURVEY.md §2.6); the Spark-native equivalent of "crawler keeps writing,
index stays fresh" is a streaming ingest of the `pages` table:

* ``stream_extract_pages``: ``readStream`` over a pages directory ->
  the same Arrow extraction as the batch indexer -> append sink of
  extracted docs (micro-batch = incremental crawl chunks). Downstream,
  ``build_index`` consumes the accumulated staging table (the batch/stream
  split the reference itself has: crawl corpus then index build).
* ``stream_events_windowed``: watermarked tumbling-window aggregation over
  the events stream (late data handled by the watermark).
* ``stream_sessionize``: 30-min-gap sessions via
  ``applyInPandasWithState`` — the custom stateful operator path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from .fixtures import PAGES_SCHEMA
from .indexer import EXTRACT_SCHEMA, _extract_arrow


def stream_extract_pages(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint_dir: str,
    trigger_once: bool = True,
):
    """readStream(pages parquet) -> extraction -> append parquet sink."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        .select("url", "html")
        .mapInArrow(_extract_arrow, schema=EXTRACT_SCHEMA)
    )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_windowed(events_stream: DataFrame) -> DataFrame:
    """Watermarked tumbling-hour counts per event_type (late data: 30 min)."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"), "event_type",
            "n_events", "total_value",
        )
    )


_SESSION_STATE_SCHEMA = "last_ts long, session_id long"
_SESSION_OUT_SCHEMA = "user_id long, session_id long, n_events long"
SESSION_GAP_S = 1800


def _session_fn(key, pdfs, state):
    """Custom stateful operator: 30-min-gap session assignment per user."""
    user_id = key[0]
    if state.exists:
        last_ts, session_id = state.get
    else:
        last_ts, session_id = -10**15, 0
    # Buffer the whole group before sorting: Spark hands a group as an
    # ITERATOR of Arrow-batch-sized chunks in shuffle order (it sorts by
    # grouping key only), so a user with more events than one batch — or
    # events interleaved across map partitions — arrives time-unordered
    # ACROSS chunks. A per-chunk sort sessionized those out of order,
    # diverging from the batch twin (code-review r5). Bounded memory:
    # one user's events per micro-batch.
    chunks = [pdf["ts"].astype("int64") // 10**9 for pdf in pdfs]
    ts_all = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
    n = 0
    for t in ts_all:
        if t - last_ts > SESSION_GAP_S:
            session_id += 1
        last_ts = t
        n += 1
    state.update((int(last_ts), int(session_id)))
    yield pd.DataFrame(
        {"user_id": [user_id], "session_id": [session_id], "n_events": [n]}
    )


def stream_sessionize(events_stream: DataFrame) -> DataFrame:
    """applyInPandasWithState sessionization (custom stateful streaming op)."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
