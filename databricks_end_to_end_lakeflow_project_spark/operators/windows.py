"""Window-function operator library.

Covers SURVEY.md §2.5 (the reference's latest-record-per-key CDC ordering,
W1 — `dlt.create_auto_cdc_flow` sequences rows per business key and keeps
the latest) and the §2.9 additions: ranking (row_number/rank/dense_rank/
ntile), offsets (lag/lead), analytic frames (rowsBetween/rangeBetween),
first/last values, and top-k-per-group.

Determinism rule: every window ORDER BY carries a unique tiebreaker key so
row_number/lag/frames are reproducible across partitionings — the same
property the CDC dedup needs at cluster scale (SURVEY §4.3).

Scale notes: a window partitioned by a high-cardinality key shuffles once
on that key and sorts within partitions — fine. Windows with no
PARTITION BY collapse to a single partition and are forbidden in this
library except over pre-aggregated (small) inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def topk_per_group(df: DataFrame, keys: list[str], order_by, k: int, rank_col: str = "rn") -> DataFrame:
    """Generic top-k-per-group: row_number over (keys, order) ≤ k.

    This is the library primitive; reused by similarity search and the
    CDC latest-by-key kernel (k=1).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


@query(
    "win_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (unique orderkey tiebreak)."""
    od = _t(spark, sf_dir, "orders")
    return topk_per_group(
        od.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )


@query(
    "win_rank_dense_ntile",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
           NTILE(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile in one window pass (single shuffle+sort)."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
    FROM orders
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset functions over each customer's order history."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "win_running_sum",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           (SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ))::DOUBLE AS running_spend
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum with an explicit rows frame. Decimal accumulator:
    a double running sum would drift order-dependently (compat.py)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "win_range_frame",
    """
    SELECT l_orderkey, l_linenumber,
           (SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
              PARTITION BY l_orderkey ORDER BY l_linenumber
              RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
           ))::DOUBLE AS qty_neighborhood
    FROM lineitem
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over an integer ordering column (±1 line number)."""
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber").rangeBetween(-1, 1)
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").alias("qty_neighborhood"),
    )


@query(
    "win_first_last",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS first_order_date,
           LAST_VALUE(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order_date
    FROM orders
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over the full partition frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_orderdate").over(w).alias("last_order_date"),
    )


@query(
    "win_cume_percent",
    """
    SELECT c_custkey, c_mktsegment,
           ROUND(CUME_DIST()    OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey), 6) AS cume,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal, c_custkey), 6) AS pct_rank
    FROM customer
    """,
)
def win_cume_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: cumulative distribution and percent
    rank of account balance within each market segment — one window pass,
    same shuffle/sort as the rank family. The custkey tiebreaker makes
    both values deterministic on balance ties."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "win_nth_value",
    """
    SELECT DISTINCT c_mktsegment,
           NTH_VALUE(c_custkey, 2) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_richest,
           NTH_VALUE(c_custkey, 3) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_richest
    FROM customer
    ORDER BY c_mktsegment
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full-partition frame: the 2nd and 3rd richest
    customer per market segment (custkey tiebreak on balance ties).
    DISTINCT collapses the per-row window output to one row per segment —
    the window shuffles once on the (tiny-cardinality) segment key, and
    the distinct is a partial-aggregated groupBy on 3 columns."""
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            F.nth_value("c_custkey", 2).over(w).alias("second_richest"),
            F.nth_value("c_custkey", 3).over(w).alias("third_richest"),
        )
        .distinct()
        .orderBy("c_mktsegment")
    )
