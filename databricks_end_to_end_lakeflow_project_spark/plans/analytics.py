"""Headline analytical queries (the engine's flagship workload).

These are the star-schema queries the reference's gold layer answers
(fact ⋈ small dims → aggregate; SURVEY.md §2.3 J3, §2.4), re-expressed on
the TPC-H-ish testdata so they are oracle-checkable. They exercise the full
batch relational core in one plan each: parquet scan with predicate
pushdown + column pruning, broadcast hash joins against small dimensions,
partial (map-side) aggregation, and top-k sort.

Money aggregates use the integer-cents fast path from
``functions.compat`` (``cents``/``csum``/``cdsum``): bit-identical to the
exact-decimal pattern (and to the DuckDB oracle, which keeps the decimal
SQL), but the per-row arithmetic stays in whole-stage-codegen longs
instead of precision-38 Decimal — see that module's docstring for the
exactness argument.

Scale notes (100 TB): constant-size dims (nation/region) carry explicit
broadcast hints; part/supplier/customer-scale sides carry NO hint (they
grow linearly with SF — AQE broadcasts small, shuffle-joins at cluster
scale). Every query aggregates before sorting (sort input is #groups,
not #rows) and filters on fact-scan columns so Parquet row-group min/max
skipping engages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.functions.compat import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    cdsum,
    cents,
    charge_cents,
    csum,
    disc_price_cents,
)
from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region/nation and order-month over the star schema.

    Mirrors the reference's fact-over-dims star join
    (`FACT_Gold_Layer.py:113-121` joins fact → 3 dims on business keys)
    with an aggregation on top. nation (25 rows) and region (5) are
    explicitly broadcast; customer is left to Catalyst/AQE, which
    broadcasts it at test SFs and picks shuffle joins at cluster scale.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    return (
        lineitem.filter(F.col("l_shipdate") >= "1995-06-01")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            cdsum(disc_price_cents(), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "region_name", "nation_name", "order_month")
    )


FLAGSHIP_ORACLE = f"""
SELECT
  r_name AS region_name,
  n_name AS nation_name,
  EXTRACT(month FROM o_orderdate) AS order_month,
  ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, 1, 2, 3
"""

query("flagship_star_revenue", FLAGSHIP_ORACLE)(flagship)


@query(
    "q1_pricing_summary",
    f"""
    SELECT
      l_returnflag, l_linestatus,
      ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2)::DOUBLE AS sum_qty,
      ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)::DOUBLE AS sum_base_price,
      ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS sum_disc_price,
      ROUND(SUM({SQL_CHARGE}), 2)::DOUBLE AS sum_charge,
      ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE / COUNT(*), 4) AS avg_qty,
      ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE / COUNT(*), 4) AS avg_price,
      ROUND(SUM(CAST(l_discount AS DECIMAL(18,2)))::DOUBLE / COUNT(*), 4) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical wide-aggregation scan.

    One pass over the fact table, two grouping columns with tiny
    cardinality → partial aggregation collapses almost everything
    map-side; the shuffle moves only (#groups × #partitions) rows.
    Averages are computed as exact-decimal SUM / COUNT so the double
    division is IEEE-identical in Spark and DuckDB.
    """
    li = _t(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            cdsum(cents("l_quantity")).alias("sum_qty"),
            cdsum(cents("l_extendedprice")).alias("sum_base_price"),
            cdsum(disc_price_cents(), 4).alias("sum_disc_price"),
            cdsum(charge_cents(), 6).alias("sum_charge"),
            F.round(csum(cents("l_quantity")).cast("double") / cnt, 4).alias("avg_qty"),
            F.round(csum(cents("l_extendedprice")).cast("double") / cnt, 4).alias("avg_price"),
            F.round(csum(cents("l_discount")).cast("double") / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    f"""
    SELECT
      l_orderkey,
      ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue,
      o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-k.

    The segment filter prunes customer before the join (Catalyst pushes
    it below); the final top-k compiles to TakeOrderedAndProject over the
    aggregated (small) output, never a full sort of the fact.
    """
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        cu.join(od, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(cdsum(disc_price_cents(), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    f"""
    SELECT
      n_name AS nation_name,
      ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, nation_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a compound join condition.

    Pre-filter (optimization guide §2.3/§3.2): the region filter keeps
    ~5 of 25 nations, and every surviving row must have its customer in
    one of them (c_nationkey = s_nationkey ∈ ASIA) — so the bounded
    5-row nation⋈region key set is broadcast-SEMI-joined onto customer
    BEFORE the big joins, and the customer⋈orders and ⋈lineitem stages
    carry ~1/5 of the rows the tail-filtered order would. The semi
    filter is implied by the original inner-join chain (pure
    reassociation — result-identical, oracle-hash-verified at three
    SFs), adds zero exchanges (5-row broadcast), and leaves the
    downstream join tree byte-identical so the supplier join keeps its
    size-estimate-driven strategy. Filtering supplier the same way is
    deliberately NOT done: it is row-redundant once customers are
    filtered, and the post-semi size estimate flips the supplier join
    to a static SortMergeJoin (measured — AQE converts it back, but the
    probe stream then pays a shuffle write)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # bounded classes (|nation| ≤ 25, |region| = 5): broadcast by contract
    asia_keys = (
        na.join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    cu_asia = cu.join(
        F.broadcast(asia_keys),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "semi",
    )
    return (
        cu_asia.join(od, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            # supplier scales with SF (not a bounded class) — AQE decides
            su,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(cdsum(disc_price_cents(), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation_name")
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2))), 4)::DOUBLE AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.

    The whole query is one parquet scan with every predicate pushed down
    (date range engages row-group min/max skipping) and a single partial
    sum — the cheapest possible distributed plan, and the yardstick for
    scan throughput at 100 TB.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            cdsum(
                cents("l_extendedprice") * cents("l_discount"), 4, 4
            ).alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue,
           n_name AS nation_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.

    Both fact filters sit on scan columns; the customer join keys the
    aggregation, and the top-k compiles to TakeOrderedAndProject."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = _t(spark, sf_dir, "nation")
    return (
        cu.join(od, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(cdsum(disc_price_cents(), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q18_large_volume_customer",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2)::DOUBLE AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    ORDER BY total_qty DESC, o_orderkey
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders via aggregate-then-filter
    (HAVING on a SUM). The quantity threshold (150, vs TPC's 300) is
    scaled to this generator's ~4 lineitems/order so the result is
    non-vacuous at every test SF.

    Plan: lineitem is aggregated per orderkey and HAVING-filtered BEFORE
    any join — the order grain makes the later joins 1:1, so the result
    is identical but the fact shuffles once on its natural key and the
    surviving orders (a tiny fraction) drive the joins, instead of
    dragging every lineitem row through a join and a 4-column group. At
    100 TB this is the difference between shuffling ~4 rows/order once
    and shuffling a wide joined row per lineitem."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(cdsum(cents("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big_orders.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


@query(
    "q12_priority_shipping",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE) counting over a fact-to-fact
    join — line counts split into high/low order priority per line
    status. (The testdata has no l_shipmode; o_orderpriority's CASE split
    is the operative pattern.) The shipdate filter is pushed into the
    lineitem scan; CASE-sums partial-aggregate map-side, so the shuffle
    carries 2 longs per (status × partition)."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q14_promo_revenue",
    f"""
    SELECT ROUND(
             100.00 * SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE}
                               ELSE CAST(0 AS DECIMAL(18,4)) END)::DOUBLE
                    / SUM({SQL_DISC_PRICE})::DOUBLE, 4) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for one ship month — a
    conditional-aggregate ratio over a fact ⋈ dimension join. part is
    broadcast; both sums are exact decimals and the single double
    division is IEEE-identical to the oracle's."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", disc_price_cents()).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
        )
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))  # part scales with SF — AQE decides
        .agg(
            F.round(
                F.lit(100.0)
                * csum(promo, 4).cast("double")
                / csum(disc_price_cents(), 4).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q8_market_share",
    f"""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,4)) END)::DOUBLE
                 / SUM(volume)::DOUBLE, 4) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             {SQL_DISC_PRICE} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    ) t
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's revenue
    per order year — the widest star join in the suite (fact ⋈ orders ⋈ 5
    dims, nation joined TWICE under different roles). All true dimensions
    broadcast; the only shuffles are the lineitem⋈orders key exchange and
    the tiny per-year aggregation. Share = conditional-decimal-sum /
    decimal-sum, divided once in doubles (oracle-identical)."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    pt = _t(spark, sf_dir, "part")
    sp = _t(spark, sf_dir, "supplier")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    rg = _t(spark, sf_dir, "region")
    n1 = na.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = na.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    volume = disc_price_cents()
    china = F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(
            od.filter(
                (F.col("o_orderdate") >= "1995-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(pt.filter(F.col("p_type") == "STANDARD"),  # O(part) even filtered — AQE decides
              F.col("l_partkey") == F.col("p_partkey"))
        .join(sp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(
            F.broadcast(rg.filter(F.col("r_name") == "ASIA")),
            F.col("c_rkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                csum(china, 4).cast("double") / csum(volume, 4).cast("double"), 4
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )
