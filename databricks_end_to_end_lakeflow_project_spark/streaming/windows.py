"""Event-time windowing operators: tumbling, sliding, session.

SURVEY.md §2.9 streaming additions (the reference has no event-time
windows — §2.8 notes late data is handled only by SCD latest-wins). Each
operator here is ONE function used two ways:

- batch mode (these registry queries): the same `F.window` /
  `F.session_window` expressions over the static events table, DuckDB
  oracle-checked;
- streaming mode (`streaming/structured.py`): identical expressions over
  `readStream` with a watermark — Spark's unified API guarantees the same
  semantics, and `tests/test_streaming.py` asserts stream == batch.

Scale notes: tumbling/sliding aggs are partial-aggregatable per window
key (shuffle carries (window, key) groups). Session windows shuffle on
the user key and merge per-key state; the watermark bounds state size —
without it a 100 TB stream would accumulate unbounded sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.functions.compat import dsum, money
from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table


def tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event type: count + exact value sum."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(money("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(events: DataFrame) -> DataFrame:
    """2-hour windows sliding every hour (each event lands in 2 windows)."""
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


@query(
    "stream_tumbling_window",
    """
    SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2)::DOUBLE AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(read_table(spark, sf_dir, "events"))


@query(
    "stream_sliding_window",
    """
    WITH buckets AS (
      SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start, event_type FROM events
      UNION ALL
      SELECT date_trunc('hour', ts)::TIMESTAMP - INTERVAL 1 HOUR AS window_start, event_type
      FROM events
    )
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM buckets GROUP BY 1, 2
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding = each event contributes to the two hourly-aligned 2-hour
    windows covering it; the oracle expands that membership explicitly."""
    return sliding_agg(read_table(spark, sf_dir, "events"))


@query(
    "stream_session_window",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM marked
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows; the oracle is the classic lag+cumsum
    sessionization, with end = last event + gap (Spark's session_window
    end semantics)."""
    return session_agg(read_table(spark, sf_dir, "events"))


def chained_window_agg(events: DataFrame) -> DataFrame:
    """Two CHAINED event-time window aggregations (Spark ≥3.4 multiple
    stateful operators): hourly count per event type, then a 6-hour
    super-window aggregating the hourly buckets (max + total). The
    second `F.window` consumes the first's window STRUCT column, which
    preserves the event-time watermark tag — the requirement for
    chaining stateful operators in one streaming query."""
    hourly = events.groupBy(
        F.window("ts", "1 hour").alias("w1"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        hourly.groupBy(F.window(F.col("w1"), "6 hours").alias("w6"), "event_type")
        .agg(
            F.max("n_events").alias("max_hourly_events"),
            F.sum("n_events").alias("total_events"),
        )
        .select(
            F.col("w6.start").alias("window_start"),
            "event_type",
            "max_hourly_events",
            "total_events",
        )
    )


@query(
    "stream_chained_window_agg",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts)::TIMESTAMP AS h, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT make_timestamp(((epoch(h)::BIGINT) // 21600) * 21600 * 1000000)
             AS window_start,
           event_type,
           MAX(n) AS max_hourly_events,
           SUM(n)::BIGINT AS total_events
    FROM hourly GROUP BY 1, 2
    """,
)
def stream_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-mode registry face of the chained windows (oracle nests the
    hourly buckets into epoch-aligned 6-hour buckets); the streaming
    drain — two stateful operators in one query — is asserted
    stream == batch in tests/test_streaming.py."""
    return chained_window_agg(read_table(spark, sf_dir, "events"))
