"""Incremental aggregate maintenance: keep a keyed rollup table current
from change batches without rescanning history.

The medallion pattern behind every gold-layer summary table (SURVEY.md
§1.1 Gold / §3-E3): at 100 TB you cannot rebuild ``GROUP BY`` tables from
scratch each run, so the engine maintains them algebraically — each new
batch partial-aggregates to (key, count, sum, min, max) and MERGES into
the stored rollup by combining commutative-monoid states:

    count' = count + Δcount      sum' = sum + Δsum
    min'   = least(min, Δmin)    max' = greatest(max, Δmax)

Only algebraic aggregates maintain this way (avg derives as sum/count;
holistic aggregates like exact percentiles do not decompose — use
sketches for those). Exact integer/decimal state keeps the maintained
table bit-identical to a from-scratch aggregation regardless of how the
input was batched — the invariant the registry query proves against the
DuckDB oracle.

Scale notes: each maintenance run shuffles ONLY the batch (partial-agg →
#touched-keys rows), then one keyed merge against the rollup (broadcast
when the delta is small, as it usually is). The rewrite is bounded the
same way as the CDC kernel's — partition the table to rewrite only
touched partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

STATE_COLS = ("n", "total", "min_v", "max_v")


def batch_state(df: DataFrame, keys: Sequence[str], value: Column) -> DataFrame:
    """Partial-aggregate one batch to mergeable rollup state."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value).alias("total"),
        F.min(value).alias("min_v"),
        F.max(value).alias("max_v"),
    )


def merge_rollup(existing: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Combine two rollup states key-wise (full outer + monoid merge)."""
    e = existing.select(*keys, *[F.col(c).alias(f"e_{c}") for c in STATE_COLS])
    d = delta.select(*keys, *[F.col(c).alias(f"d_{c}") for c in STATE_COLS])
    joined = e.join(d, list(keys), "full_outer")

    def z(c: str) -> Column:
        return F.coalesce(F.col(f"e_{c}"), F.lit(0)) + F.coalesce(F.col(f"d_{c}"), F.lit(0))

    # least/greatest are null-safe combiners here only because a missing
    # side yields NULL, which coalesce resolves to the present side
    return joined.select(
        *keys,
        z("n").alias("n"),
        z("total").alias("total"),
        F.coalesce(F.least("e_min_v", "d_min_v"), F.col("e_min_v"), F.col("d_min_v")).alias("min_v"),
        F.coalesce(F.greatest("e_max_v", "d_max_v"), F.col("e_max_v"), F.col("d_max_v")).alias("max_v"),
    )


@query(
    "rollup_incremental_maintenance",
    """
    SELECT user_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total,
           CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS min_v,
           CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS max_v
    FROM events GROUP BY user_id
    """,
)
def rollup_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-user rollup across three arrival batches (events
    split by time terciles) and return the final table — which must be
    bit-identical to aggregating the whole table at once, the oracle's
    form. Values are exact cents (long), so the monoid merge commutes
    with any batching."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    t1, t2 = (
        ev.agg(
            F.percentile_approx("ts", 0.33).alias("a"),
            F.percentile_approx("ts", 0.66).alias("b"),
        )
        .collect()[0]
    )
    batches = [
        ev.filter(F.col("ts") <= F.lit(t1)),
        ev.filter((F.col("ts") > F.lit(t1)) & (F.col("ts") <= F.lit(t2))),
        ev.filter(F.col("ts") > F.lit(t2)),
    ]
    state: DataFrame | None = None
    for b in batches:
        delta = batch_state(b, ["user_id"], F.col("cents"))
        state = delta if state is None else merge_rollup(state, delta, ["user_id"])
    return state.select("user_id", "n", "total", "min_v", "max_v")


def join_delta_maintain(
    m: DataFrame,
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on,
) -> DataFrame:
    """Incremental JOIN maintenance for append-only sources (classic IVM
    delta rule): given the materialized join M = A⋈B and append deltas
    ΔA, ΔB,

        M' = M ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    so a maintenance run joins only delta-sized inputs against the other
    side — never re-joining A with B. At 100 TB the delta sides are tiny
    and broadcast; the old sides are probed with one shuffle each (or
    zero when both are bucketed on the join key). Append-only is the
    contract (fact-table semantics); keyed upserts route through the CDC
    kernel instead. Sides must use distinct column names (expression
    joins keep both key columns).
    """
    return (
        m.unionByName(da.join(b_old, on))
        .unionByName(a_old.join(db, on))
        .unionByName(da.join(db, on))
    )


@query(
    "join_incremental_maintenance",
    """
    SELECT o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain lineitem⋈orders incrementally: both sides are split into
    append batches (by key parity), the join is materialized from the
    first batches and delta-maintained with the remaining ones, then
    aggregated — the result must be bit-identical to the oracle's
    from-scratch join, proving the delta rule loses and duplicates
    nothing regardless of batching."""
    from databricks_end_to_end_lakeflow_project_spark.functions.compat import money

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    a1, da = (li.filter(c) for c in [F.col("l_orderkey") % 2 == 0,
                                     F.col("l_orderkey") % 2 != 0])
    b1, db = (orders.filter(c) for c in [F.col("o_orderkey") % 3 == 0,
                                         F.col("o_orderkey") % 3 != 0])
    on = F.col("l_orderkey") == F.col("o_orderkey")
    m = a1.join(b1, on)
    maintained = join_delta_maintain(m, a1, da, b1, db, on)
    rev = F.sum(money("l_extendedprice") * (F.lit(1) - money("l_discount")))
    return maintained.groupBy("o_orderpriority").agg(
        rev.cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "reshape_transpose_metrics",
    """
    WITH agg AS (
      SELECT event_type, COUNT(*)::DOUBLE AS n, ROUND(AVG(value), 4) AS avg_value
      FROM events GROUP BY event_type
    )
    SELECT 'n' AS key,
           MAX(CASE WHEN event_type = 'click' THEN n END) AS click,
           MAX(CASE WHEN event_type = 'error' THEN n END) AS error,
           MAX(CASE WHEN event_type = 'purchase' THEN n END) AS purchase,
           MAX(CASE WHEN event_type = 'signup' THEN n END) AS signup,
           MAX(CASE WHEN event_type = 'view' THEN n END) AS view
    FROM agg
    UNION ALL
    SELECT 'avg_value',
           MAX(CASE WHEN event_type = 'click' THEN avg_value END),
           MAX(CASE WHEN event_type = 'error' THEN avg_value END),
           MAX(CASE WHEN event_type = 'purchase' THEN avg_value END),
           MAX(CASE WHEN event_type = 'signup' THEN avg_value END),
           MAX(CASE WHEN event_type = 'view' THEN avg_value END)
    FROM agg
    """,
)
def reshape_transpose_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 `DataFrame.transpose()`: flip a small metrics-per-group
    aggregate into groups-as-columns (the report/export orientation).
    Transpose is a DRIVER-SIDE reshape of an already-aggregated frame —
    correct use is strictly post-aggregation, never on table-sized data
    (the oracle's manual CASE pivot is what it replaces)."""
    ev = read_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("event_type")
    )
    return agg.transpose()
