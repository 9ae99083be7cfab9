"""Decision-support query shapes II: the remaining TPC-H patterns.

Completes the TPC-H shape coverage started in ``plans/analytics.py``
(reference's gold-layer star-join analytics generalized, SURVEY.md §2.3
J3 / §2.9). Each query here exercises a plan pattern not present in the
first batch:

- q2  — correlated-MIN join-back (cheapest supplier per part)
- q7  — dimension joined twice under different roles with a disjunctive
        pair predicate across the two roles
- q9  — computed-measure profit aggregation over fact ⋈ 2 dims
- q13 — left outer join with an ON-clause filter, then an aggregation of
        an aggregation (distribution of counts)
- q15 — aggregate CTE reused twice (revenue view + scalar MAX over it)
- q16 — COUNT(DISTINCT) with a NOT-IN anti-join exclusion
- q17 — correlated per-group AVG threshold (small-quantity revenue)
- q19 — disjunction of conjunctive range predicates across both join
        sides (OR-of-ANDs pushdown)
- q22 — scalar-subquery threshold + NOT EXISTS anti-join aggregation

Adaptations (testdata has no partsupp / l_commitdate / c_phone — see
TESTDATA.md): q2/q16 use lineitem as the part↔supplier bridge, q9 derives
cost as 5% of ``p_retailprice`` per unit, q22 uses ``c_nationkey`` as the
country code. TPC-H q4's EXISTS shape is ``subq_exists_late_orders``
(operators/relational.py); q20/q21 live in ``plans/analytics3.py``.

Money arithmetic follows functions/compat.py: exact decimals inside the
aggregate, one double division at the end, so results are bit-identical
to the DuckDB oracle and partition-order independent at cluster scale.

Scale notes (100 TB): constant-size dimension slices (nation/region,
1-row scalar thresholds) carry explicit broadcast hints; part/supplier/
customer-scale sides carry NO hint — they grow linearly with SF, so AQE
broadcasts them at small scale and shuffle-joins at cluster scale. The
only wide shuffles are keyed on the fact's join/group keys. q13's double
aggregation reduces to #customers then #distinct-counts rows; q15 takes
its scalar MAX with a window over the post-aggregate frame so the fact
is scanned exactly once; q17's per-part AVG is a partial-aggregable
pre-aggregation, not a window over the raw fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.functions.compat import (
    SQL_DISC_PRICE,
    disc_price,
    dsum,
    money,
)
from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


@query(
    "q2_min_cost_supplier",
    """
    WITH m AS (
      SELECT l_partkey, MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS min_price
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_partkey, p_brand,
           CAST(min_price AS DOUBLE) AS min_price,
           MIN(l_suppkey) AS best_suppkey
    FROM m
    JOIN lineitem ON lineitem.l_partkey = m.l_partkey
                 AND CAST(l_extendedprice AS DECIMAL(18,2)) = min_price
    JOIN part ON p_partkey = m.l_partkey
    WHERE p_size <= 5
    GROUP BY p_partkey, p_brand, min_price
    ORDER BY p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-MIN join-back — per part, the supplier
    quoting the minimum price (ties resolved to the lowest suppkey).

    Plan: pre-aggregate MIN per partkey (partial-aggregable, tiny output),
    join the fact back on (partkey, price == min). The p_size filter is
    applied via a broadcast semi-join of the pruned part dim BEFORE the
    aggregation so both passes scan only qualifying parts — at 100 TB the
    min-agg and join-back touch ~10% of lineitem, not all of it.
    """
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    li_small = li.join(
        pt.select("p_partkey"),  # part scales with SF — AQE decides
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    m = li_small.groupBy("l_partkey").agg(
        F.min(money("l_extendedprice")).alias("min_price")
    )
    return (
        m.join(
            li_small.select(
                F.col("l_partkey").alias("lp"),
                F.col("l_suppkey"),
                money("l_extendedprice").alias("price"),
            ),
            (F.col("l_partkey") == F.col("lp")) & (F.col("price") == F.col("min_price")),
        )
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))  # O(part) — AQE decides
        .groupBy("p_partkey", "p_brand", F.col("min_price").cast("double").alias("min_price"))
        .agg(F.min("l_suppkey").alias("best_suppkey"))
        .orderBy("p_partkey")
    )


@query(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2)::DOUBLE AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {SQL_DISC_PRICE} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    ) t
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations per ship
    year. nation joins twice under different roles (supplier side n1,
    customer side n2) with a disjunctive pair predicate spanning both.

    The two 2-row nation slices broadcast; filtering supplier/customer to
    the two nations BEFORE the fact joins prunes both inputs to ~8% (2/25
    nations), so the lineitem⋈orders shuffle carries only qualifying rows.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    od = _t(spark, sf_dir, "orders")
    na = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    sp = _t(spark, sf_dir, "supplier")
    cu = _t(spark, sf_dir, "customer")
    n1 = na.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = na.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    sp2 = sp.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    cu2 = cu.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    return (
        # supplier-scale side: no hint, AQE picks the strategy
        li.join(sp2, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu2, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(disc_price()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q9_product_profit",
    f"""
    SELECT nation_name, o_year, ROUND(SUM(amount), 2)::DOUBLE AS sum_profit
    FROM (
      SELECT n_name AS nation_name,
             EXTRACT(year FROM o_orderdate) AS o_year,
             {SQL_DISC_PRICE}
               - CAST(p_retailprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(0.05 AS DECIMAL(3,2)) AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) t
    GROUP BY nation_name, o_year
    ORDER BY nation_name, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by supplier nation and
    order year. Cost is modeled as 5% of retail price per unit (the
    testdata has no partsupp/ps_supplycost — TESTDATA.md), keeping Q9's
    operative pattern: a computed measure spanning columns of the fact AND
    two dimensions, aggregated by attributes of two other dimensions.

    The p_name LIKE filter prunes part before broadcast; profit stays in
    exact decimals until the final rounded cast."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sp = _t(spark, sf_dir, "supplier")
    od = _t(spark, sf_dir, "orders")
    na = _t(spark, sf_dir, "nation")
    amount = disc_price() - money("p_retailprice") * money("l_quantity") * F.lit(
        "0.05"
    ).cast("decimal(3,2)")
    return (
        li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .join(sp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation_name", F.col("o_year").desc())
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer — a left outer
    join whose ON clause carries an extra filter (which must NOT become a
    WHERE: customers with only urgent orders still count at 0), then an
    aggregation OF an aggregation.

    First groupBy reduces to one row per customer; the second input is
    already tiny. COUNT(o_orderkey) counts only matched rows — null-safe
    exactly like SQL COUNT(col)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cu.join(od, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — an aggregate CTE consumed twice (as join input and inside a
    scalar MAX subquery).

    Spark does not reuse the aggregation exchange between the two CTE
    consumers (the naive re-derivation scans lineitem twice), so the
    per-supplier revenue frame is PERSISTED and consumed twice from
    cache: once by a 1-row MAX aggregate (partial-aggregatable,
    parallel) and once by the broadcast scalar-threshold filter — the
    same sanctioned 1-row-cross-join pattern as q11/q22. ONE scan of
    the fact, one shuffle, and NO single-partition stage at any
    supplier count (the former formulation ran an unpartitioned MAX
    window over the |suppliers| frame — tiny at TPC-H scale, a one-task
    sort at 100 TB). Revenue is the exact-decimal sum rounded to 2dp on
    both sides, so the double equality against MAX is deterministic."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    sp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(disc_price()).alias("total_revenue")
    ).persist()
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(sp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#17'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%9'
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each qualifying
    (brand, type, size) — with a NOT-IN supplier exclusion list.

    lineitem is the part↔supplier bridge (no partsupp in the testdata).
    NOT IN over non-null keys compiles to a broadcast left-anti join; the
    negated/IN-list part predicates all push into the broadcast dim. The
    COUNT(DISTINCT) shuffles (group keys + suppkey) pairs — Spark expands
    it to a two-stage distinct-then-count aggregate automatically."""
    pt = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#17")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 7, 14, 21, 28, 35, 42, 49)
    )
    li = _t(spark, sf_dir, "lineitem")
    bad_sp = _t(spark, sf_dir, "supplier").filter(F.col("s_name").like("%9")).select(
        "s_suppkey"
    )
    return (
        li.join(bad_sp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE / 7.0, 2)
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue that would be lost by refusing small
    orders — a correlated per-part AVG threshold.

    The correlated subquery decorrelates to a per-partkey pre-aggregation
    joined back on partkey (partial-aggregable — far cheaper than a
    window over the raw fact at 100 TB). l_quantity holds integers in
    doubles, so SUM/COUNT (hence AVG) is exact and the 0.2× threshold is
    reduction-order independent."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select(
        "p_partkey"
    )
    li_b = li.join(
        pt, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li_b.join(avg_q, F.col("l_partkey") == F.col("ap"))  # per-part agg is O(part)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0), 2
            ).alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_revenue",
    f"""
    SELECT ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of conjunctive range predicates spanning
    BOTH join sides (part attributes AND lineitem quantity).

    Catalyst cannot split the disjunction across the join, but it DOES
    derive and push the per-side implied filters (p_size <= 15 etc. via
    constraint propagation with CNF conversion); part stays broadcast so
    the residual OR evaluates in the broadcast-join's codegen'd filter,
    never a shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(1, 15)
            & qty.between(20, 30)
        )
    )
    return (
        li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(dsum(disc_price()).alias("revenue"))
    )


@query(
    "q22_dormant_customers",
    """
    SELECT c_nationkey AS cntrycode,
           COUNT(*) AS numcust,
           ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2)::DOUBLE AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))::DOUBLE / COUNT(*)
        FROM customer
        WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
      )
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no recent orders, by
    country code (c_nationkey stands in for the phone prefix — no c_phone
    in the testdata; "dormant" = nothing since 2000-07, as this
    generator gives nearly every customer SOME order). Combines a
    scalar-subquery threshold (average positive balance, broadcast as a
    1-row cross join) with a NOT EXISTS that compiles to a left-anti join
    against the date-filtered orders slice.

    The average is exact-decimal SUM / COUNT so the threshold — and hence
    membership — is reduction-order independent; the anti join shuffles
    on custkey only for the small filtered candidate set."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    codes = [1, 3, 5, 7, 9, 11, 13]
    in_codes = cu.filter(F.col("c_nationkey").isin(codes))
    avg_bal = in_codes.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        in_codes.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            od.filter(F.col("o_orderdate") >= "2000-07-01"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(money("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q11_revenue_concentration",
    f"""
    SELECT s_nationkey AS nationkey,
           ROUND(SUM({SQL_DISC_PRICE}), 2)::DOUBLE AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    HAVING SUM({SQL_DISC_PRICE}) > (
      SELECT SUM({SQL_DISC_PRICE}) * CAST(0.045 AS DECIMAL(4,3))
      FROM lineitem
    )
    ORDER BY value DESC, nationkey
    """,
)
def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose aggregate exceeds a fixed fraction
    of the GLOBAL aggregate (revenue concentration by supplier nation;
    partsupp value replaced by lineitem revenue — no partsupp in the
    testdata).

    The global total is a scalar aggregate broadcast into the HAVING
    filter of the per-nation aggregate. Both aggregations are exact
    decimal, so the >-comparison is reduction-order independent. With 25
    nations the uniform share is 4%; the 4.5% bar keeps the result
    non-vacuous but selective at every SF."""
    li = _t(spark, sf_dir, "lineitem")
    sp = _t(spark, sf_dir, "supplier")
    per_nation = (
        li.join(sp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.sum(disc_price()).alias("value_exact"),
        )
    )
    total = li.agg(
        (F.sum(disc_price()) * F.lit("0.045").cast("decimal(4,3)")).alias("bar")
    )
    return (
        per_nation.join(F.broadcast(total), F.col("value_exact") > F.col("bar"))
        .select(
            "nationkey",
            F.round(F.col("value_exact"), 2).cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), "nationkey")
    )
