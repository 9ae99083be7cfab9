"""Structured Streaming execution: watermarked queries, streaming dedup,
custom stateful operators, and upsert sinks.

SURVEY.md §2.9 streaming additions + the reference's streaming surface
re-expressed (S3 streaming scans, S6 append sink with checkpoint, T1
one-shot drains). Everything here runs with ``trigger(availableNow=True)``
— the modern `trigger(once=True)` (`bronze_ingest_autoloader.py:24`) — so
jobs drain what exists and stop, the lakehouse batch-of-streams pattern.

Scale notes: every stateful op here declares a watermark, which is what
bounds state stores at 100 TB (session/dedup state is dropped once the
event-time frontier passes). `foreachBatch` + the CDC merge kernel gives
exactly-once upsert sinks (idempotent merge + checkpointed offsets).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from databricks_end_to_end_lakeflow_project_spark.operators.cdc import ManagedParquetTable
from databricks_end_to_end_lakeflow_project_spark.streaming.windows import tumbling_agg

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def stream_from_dir(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType = EVENT_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming scan over a parquet dir (reference S3 analogue)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drain a streaming query into an in-memory table and return it as a
    batch DataFrame (test/verification harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def watermarked_tumbling(stream_events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Watermarked 1-hour tumbling aggregation — the same plan as the
    batch `tumbling_agg`, demonstrating Spark's unified API. In append
    mode a window emits once the watermark passes its end (late rows
    beyond ``delay`` are dropped)."""
    return tumbling_agg(stream_events.withWatermark("ts", delay))


def dedup_within_watermark(
    stream_events: DataFrame, keys: Sequence[str], delay: str = "30 minutes"
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    `dropDuplicatesWithinWatermark` keeps a key's fingerprint only until
    the watermark passes, so state does not grow with the stream."""
    return stream_events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(list(keys))


# -- custom stateful operator (applyInPandasWithState) -----------------------

_RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _running_totals(
    key: tuple[Any, ...],
    batches: Any,
    state: GroupState,
):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})


def running_totals_per_user(stream_events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) maintained
    across micro-batches via `applyInPandasWithState` — the engine's
    pattern for operators Spark lacks natively (SURVEY §2.9). State is one
    tuple per user; emits the updated running totals each batch."""
    return (
        stream_events.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=_RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# -- exactly-once upsert sink ------------------------------------------------


def stream_upsert_into(
    stream_df: DataFrame,
    table: ManagedParquetTable,
    keys: Sequence[str],
    sequence_by: str,
    checkpoint_dir: str,
) -> None:
    """Stream → SCD1 table: every micro-batch merges through the CDC
    kernel inside `foreachBatch`. Checkpointed offsets + idempotent
    latest-wins merge = exactly-once table state (reference S8 as a
    streaming sink; DLT's APPLY CHANGES execution model)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        table.upsert(batch_df, keys, sequence_by)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
