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
