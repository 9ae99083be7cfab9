"""Batch relational operator library: joins, aggregations, set ops, sorts.

Covers SURVEY.md §2.2-2.4, §2.6 (the operator shapes the reference
exercises — projections/filters/casts, equi/left joins, scalar MAX,
COUNT, GROUP BY + HAVING, unionByName) and the §2.9 additions (semi/anti/
full/cross/range joins, the full aggregate suite incl. distinct,
rollup/cube/grouping sets, pivot, intersect/except, sort+limit).

Every query is a registry entry with a DuckDB oracle. All money sums use
the exact-decimal pattern (functions/compat.py). Integer SUMs are cast to
BIGINT on the oracle side because DuckDB widens integer SUM to HUGEINT.

Scale notes (100 TB): all joins here are expressed as equi-joins (plus
residual range predicates) so Catalyst can pick broadcast / shuffle-hash /
sort-merge; nothing forces a cartesian product except the explicit
cross-join demo on the two tiny dims. Aggregations are all
partial-aggregatable; rollup/cube expand in the partial phase so the
shuffle carries pre-combined groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.functions.compat import dsum, money
from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.session import load_tables
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# joins (SURVEY §2.3 J1-J4 analogues + §2.9 gap fills)
# ---------------------------------------------------------------------------


@query(
    "join_inner_projected",
    """
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F' AND c_acctbal > 5000
    """,
)
def join_inner_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join with pushed-down filters and pruned columns
    (reference J1 analogue: silver business join,
    dlt_bronze_to_silver_pipeline.py:127-131)."""
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return od.join(cu, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left_outer_counts",
    """
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched left rows (reference J2:
    new-vs-old dim detection, DIM_Gold_layer.py:176)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    return (
        cu.join(od, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_left_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 300000
    )
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): customers having at least one large order."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cu.join(od, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_left_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 250000
    )
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no large order — the
    primitive under the engine's MERGE emulation (SURVEY §4.1)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return cu.join(od, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_full_outer",
    """
    WITH c AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_rich_customers
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ), s AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_rich_suppliers
      FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           n_rich_customers, n_rich_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with mismatches on both sides."""
    cu = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_rich_customers"))
    )
    su = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_rich_suppliers"))
    )
    return cu.join(su, "nationkey", "full_outer").select(
        "nationkey", "n_rich_customers", "n_rich_suppliers"
    )


@query(
    "join_cross_dims",
    """
    SELECT r_name AS region_name, n_name AS nation_name
    FROM region CROSS JOIN nation
    """,
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join — only ever valid on tiny dims (5×25 here);
    anything larger must be an equi-join."""
    re = _t(spark, sf_dir, "region").select(F.col("r_name").alias("region_name"))
    na = _t(spark, sf_dir, "nation").select(F.col("n_name").alias("nation_name"))
    return re.crossJoin(na)


@query(
    "join_range_predicate",
    """
    SELECT o_orderkey,
           COUNT(*) AS n_late_items
    FROM orders JOIN lineitem
      ON o_orderkey = l_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderkey
    """,
)
def join_range_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a residual range predicate (items shipped >60 days
    after ordering). The equi key carries the shuffle; the range term is a
    post-join filter, so no cartesian blowup at scale."""
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    li = _t(spark, sf_dir, "lineitem")
    return (
        od.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_late_items"))
    )


# ---------------------------------------------------------------------------
# aggregations (SURVEY §2.4 A1-A3 + §2.9 full suite)
# ---------------------------------------------------------------------------


@query(
    "agg_scalar_max",
    "SELECT MAX(o_orderdate) AS max_orderdate, MAX(o_orderkey) AS max_orderkey FROM orders",
)
def agg_scalar_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped scalar MAX — the reference's incremental-load cursor
    (A1, DIM_Gold_layer.py:126)."""
    return _t(spark, sf_dir, "orders").agg(
        F.max("o_orderdate").alias("max_orderdate"),
        F.max("o_orderkey").alias("max_orderkey"),
    )


@query(
    "agg_basic_suite",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)::DOUBLE AS sum_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE / COUNT(*), 4) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_basic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/sum/min/max/avg in one grouped pass (map-side combinable)."""
    od = _t(spark, sf_dir, "orders")
    cnt = F.count(F.lit(1))
    return od.groupBy("o_orderpriority").agg(
        cnt.alias("n_orders"),
        dsum(money("o_totalprice")).alias("sum_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.round(F.sum(money("o_totalprice")).cast("double") / cnt, 4).alias("avg_price"),
    )


@query(
    "agg_count_distinct",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expands to a two-phase plan; Catalyst
    rewrites it so the distinct shuffle is on (group, value))."""
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "agg_group_having",
    """
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 15
    """,
)
def agg_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING — the reference's duplicate-key audit shape
    (A3, FACT_Gold_Layer.py:162)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 15)
    )


@query(
    "agg_rollup",
    """
    SELECT r_name AS region_name, n_name AS nation_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (region → nation → grand total)."""
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    return (
        cu.join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .rollup("region_name", "nation_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)::DOUBLE AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations via CUBE."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dsum(money("o_totalprice")).alias("sum_price"))
    )


@query(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_pivot",
    """
    SELECT l_returnflag,
           COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN 1 END), 0)::BIGINT AS F,
           COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN 1 END), 0)::BIGINT AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot a low-cardinality column into counts-per-value columns.
    The value list is given explicitly so the plan is one pass (no
    distinct-values pre-query) — mandatory at scale."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O"])
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the scale path for distinct
    counts. The raw estimate is engine-specific (Spark's HLL++ vs any
    oracle's estimator), so the HASHED output carries the bounded-error
    CONTRACT instead: the exact per-group distinct count plus a flag
    that the estimate landed within 5·rsd of it (rsd=0.01 → 5σ; the
    estimate still computes — the flag forces its evaluation). The
    DuckDB oracle checks exact counts and literal TRUE flags, turning
    the former rows-only entry into a hash-exact gate without pretending
    two different sketches agree digit-for-digit. rsd=0.01 keeps the
    sketch small enough to combine map-side."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.01).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("__approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("approx_within_5pct"),
        )
    )


query(
    "agg_approx_count_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)(agg_approx_distinct)


# ---------------------------------------------------------------------------
# set operations (SURVEY §2.6 U1 + §2.9)
# ---------------------------------------------------------------------------


@query(
    "setop_union_all",
    """
    SELECT c_custkey AS custkey, c_acctbal AS acctbal, 'rich' AS bucket
    FROM customer WHERE c_acctbal > 9500
    UNION ALL
    SELECT c_custkey AS custkey, c_acctbal AS acctbal, 'poor' AS bucket
    FROM customer WHERE c_acctbal < -900
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two labeled slices (reference U1,
    DIM_Gold_layer.py:263)."""
    cu = _t(spark, sf_dir, "customer")
    rich = cu.filter(F.col("c_acctbal") > 9500).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("rich").alias("bucket"),
    )
    poor = cu.filter(F.col("c_acctbal") < -900).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("poor").alias("bucket"),
    )
    return rich.unionByName(poor)


@query(
    "setop_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 0
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900).select(
        F.col("c_nationkey").alias("nationkey")
    )
    su = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cu.intersect(su)


@query(
    "setop_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics)."""
    cu = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    su = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cu.subtract(su)


# ---------------------------------------------------------------------------
# sorts / limits / distinct (SURVEY §2.9)
# ---------------------------------------------------------------------------


@query(
    "sort_multi_key_limit",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def sort_multi_key_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit → TakeOrderedAndProject (per-partition top-N
    then driver-side merge; never a global sort at scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(F.col("o_orderpriority").asc(), F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "distinct_projection",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT compiles to a groupBy — partial-aggregated before shuffle."""
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "filter_in_between_null",
    """
    SELECT p_partkey, p_brand, p_size, p_retailprice
    FROM part
    WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND p_size BETWEEN 10 AND 20
      AND p_retailprice IS NOT NULL
    """,
)
def filter_in_between_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN + null predicate, all pushed to the parquet scan
    (reference P6 null-predicate analogue, DIM_Gold_layer.py:204-207)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
            & F.col("p_size").between(10, 20)
            & F.col("p_retailprice").isNotNull()
        )
        .select("p_partkey", "p_brand", "p_size", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# subquery shapes (§2.9: correlated EXISTS, scalar subquery)
# ---------------------------------------------------------------------------


@query(
    "subq_exists_late_orders",
    f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def subq_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS over the fact table — orders in a
    quarter having any lineitem shipped >60 days after order date.

    Expressed via spark.sql so Catalyst's subquery decorrelation rewrites
    it to a left-semi join (the same plan the DataFrame `left_semi` form
    produces) — demonstrating the engine accepts the declarative SQL form
    too."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_sq_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM _sq_orders
        WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM _sq_lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        """
    )


@query(
    "subq_scalar_above_avg",
    """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part
    WHERE p_retailprice > 1.05 * (SELECT AVG(p_retailprice) FROM part)
    """,
)
def subq_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate: parts priced >1.5× the
    mean (prices sit in a tight 900-1000 band, hence the 1.05 factor). The scalar aggregate evaluates once and broadcasts into
    the scan filter — two passes over a column, no join shuffle."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("_sq_part")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM _sq_part
        WHERE p_retailprice > 1.05 * (SELECT AVG(p_retailprice) FROM _sq_part)
        """
    )


@query(
    "setop_union_evolving_schema",
    """
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CASE WHEN tier IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_tier
    FROM (
      SELECT c_mktsegment, NULL AS tier
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_mktsegment,
             CASE WHEN c_acctbal > 5000 THEN 'gold' ELSE 'std' END AS tier
      FROM customer WHERE c_custkey % 2 = 1
    ) t
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def setop_union_evolving_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union — the bronze-layer reality the reference's
    rescue mode exists for (SURVEY.md §2.1 S1/T4): a newer extract adds a
    `tier` column, the older one lacks it. `unionByName(
    allowMissingColumns=True)` aligns by NAME and null-fills the missing
    column — position-based `union` would silently misalign columns the
    moment schemas drift, the classic corruption bug this operator
    prevents. Zero-shuffle: the union concatenates partitions."""
    cu = _t(spark, sf_dir, "customer")
    old_extract = cu.filter(F.col("c_custkey") % 2 == 0).select("c_mktsegment")
    new_extract = cu.filter(F.col("c_custkey") % 2 == 1).select(
        "c_mktsegment",
        F.when(F.col("c_acctbal") > 5000, "gold").otherwise("std").alias("tier"),
    )
    return (
        old_extract.unionByName(new_extract, allowMissingColumns=True)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("tier").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_with_tier"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "subq_lateral_topk",
    """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """,
)
def subq_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 4 SQL surface): each BUILDING
    customer's top-2 orders by price, written the way an analyst would —
    a per-row dependent subquery — and executed through `spark.sql`
    against the registered views (reference S4's SQL entry path; the
    IDENTICAL SQL runs on the DuckDB oracle). Catalyst de-correlates
    this into the same window/top-k-per-group plan as
    `win_topk_per_group`: no per-row re-execution survives
    optimization, which is the point — the declarative form costs
    nothing at 100 TB."""
    load_tables(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


@query(
    "setop_except_intersect_all",
    """
    WITH ea AS (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey FROM supplier
    ), ia AS (
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
      INTERSECT ALL
      SELECT o_custkey % 25 FROM orders
    )
    SELECT 'except_all' AS op, nationkey, COUNT(*) AS n FROM ea GROUP BY nationkey
    UNION ALL
    SELECT 'intersect_all', nationkey, COUNT(*) AS n FROM ia GROUP BY nationkey
    ORDER BY op, nationkey
    """,
)
def setop_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations — EXCEPT ALL / INTERSECT ALL keep
    multiplicities (m−n and min(m,n) copies respectively), which is what
    data-reconciliation diffs actually need: 'how many rows of this key
    are missing', not 'is the key present'. Spark plans both as a
    single aggregate computing per-row counts on each side — one shuffle,
    no join. Multiplicities are summarized per key so the result is
    deterministic."""
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    od = _t(spark, sf_dir, "orders")
    ea = (
        cu.select(F.col("c_nationkey").alias("nationkey"))
        .exceptAll(su.select(F.col("s_nationkey").alias("nationkey")))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    ia = (
        cu.filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersectAll(od.select((F.col("o_custkey") % 25).alias("nationkey")))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    return ea.unionAll(ia).orderBy("op", "nationkey")


_JBLOOM_M = 8192  # filter bits; ~27 bits/key for the BUILDING-segment dim slice
_JBLOOM_K = 4


@query(
    "join_bloom_semi_reduction",
    f"""
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    ks AS (SELECT unnest(range({_JBLOOM_K})) AS j),
    dim_pos AS (
      SELECT DISTINCT
             ('0x' || substr(md5(c_custkey || ':' || j), 1, 8))::UBIGINT
               % {_JBLOOM_M} AS pos
      FROM dim, ks
    ),
    probe AS (
      SELECT o.o_orderkey, o.o_custkey,
             ('0x' || substr(md5(o.o_custkey || ':' || j), 1, 8))::UBIGINT
               % {_JBLOOM_M} AS pos
      FROM orders o, ks
    ),
    passed AS (
      SELECT o_orderkey, o_custkey,
             BOOL_AND(pos IN (SELECT pos FROM dim_pos)) AS maybe
      FROM probe GROUP BY o_orderkey, o_custkey
    ),
    truth AS (SELECT DISTINCT c_custkey FROM dim)
    SELECT COUNT(*) AS n_fact,
           COUNT(*) FILTER (WHERE maybe) AS n_pass_bloom,
           COUNT(*) FILTER (WHERE o_custkey IN (SELECT c_custkey FROM truth))
             AS n_true_match,
           COUNT(*) FILTER (WHERE maybe
             AND o_custkey NOT IN (SELECT c_custkey FROM truth))
             AS n_false_pos,
           ROUND(100.0 * COUNT(*) FILTER (WHERE NOT maybe) / COUNT(*), 4)
             AS pct_fact_skipped
    FROM passed
    """,
)
def join_bloom_semi_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction — the 100 TB trick for a
    selective dim⋈fact join: summarize the filtered dim's join keys into
    an M-bit filter, probe every fact row BEFORE the shuffle, and let
    only possible matches through (no false negatives; false positives
    are re-checked by the real join). Reports the reduction achieved and
    the filter's false-positive count against exact truth.

    Spark 3.3+ can inject this itself (runtime row-level filtering);
    this operator materializes the technique explicitly — the same
    md5-position arithmetic as `dedup_bloom_delta_probe`, so the oracle
    replays the filter bit-for-bit, false positives included.

    Plan: dim-side positions are a DISTINCT over |dim|·K rows broadcast
    to the probe side; the probe is a per-fact-row K-position lookup
    (broadcast semi join, no fact shuffle); the final audit is one
    scalar aggregate. At 100 TB only the summary row leaves the
    executors, and a production run would skip the audit columns and
    simply continue into the join with the `maybe` survivors.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    def pos(key, j):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(key.cast("string"), F.lit(f":{j}"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _JBLOOM_M
        )

    dim_pos = (
        dim.select(
            F.explode(
                F.array(*[pos(F.col("c_custkey"), j) for j in range(_JBLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    probe = orders.select(
        "o_orderkey",
        "o_custkey",
        F.explode(
            F.array(*[pos(F.col("o_custkey"), j) for j in range(_JBLOOM_K)])
        ).alias("pos"),
    )
    passed = (
        probe.join(F.broadcast(dim_pos.withColumn("hit", F.lit(True))), "pos", "left")
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(False))).alias("maybe"))
    )
    truth = dim.withColumn("is_true", F.lit(True)).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    audited = passed.join(F.broadcast(truth), "o_custkey", "left").select(
        "maybe", F.coalesce(F.col("is_true"), F.lit(False)).alias("is_true")
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return audited.agg(
        F.count(F.lit(1)).alias("n_fact"),
        cnt(F.col("maybe")).alias("n_pass_bloom"),
        cnt(F.col("is_true")).alias("n_true_match"),
        cnt(F.col("maybe") & ~F.col("is_true")).alias("n_false_pos"),
        F.round(100.0 * cnt(~F.col("maybe")) / F.count(F.lit(1)), 4).alias(
            "pct_fact_skipped"
        ),
    )


# ---------------------------------------------------------------------------
# round-6 addition (session 2): binned interval-overlap self-join
# ---------------------------------------------------------------------------

_IVL_SUPP_MAX = 10  # supplier cap bounds the audited slice (output contract)
_IVL_EPOCH = "1992-01-01"  # week-grid origin (TPC-H min ship date)


def _ivl_week(c):
    """Calendar-free week bucket: floor(days-since-epoch / 7)."""
    return F.floor(F.datediff(c, F.lit(_IVL_EPOCH).cast("date")) / 7)


@query(
    "join_interval_overlap",
    f"""
    WITH li AS (
      SELECT l_orderkey * 10 + l_linenumber AS key,
             l_suppkey, CAST(l_shipdate AS DATE) AS ship,
             CAST(l_shipdate AS DATE)
               + (CAST(l_quantity AS INT) % 21 + 7) AS rcpt
      FROM lineitem WHERE l_suppkey <= {_IVL_SUPP_MAX}
    )
    SELECT a.l_suppkey AS suppkey,
           COUNT(*) AS n_overlap_pairs,
           SUM(DATE_DIFF('day',
                         GREATEST(a.ship, b.ship),
                         LEAST(a.rcpt, b.rcpt)) + 1)
             AS sum_overlap_days
    FROM li a JOIN li b
      ON a.l_suppkey = b.l_suppkey AND a.key < b.key
     AND a.ship <= b.rcpt AND b.ship <= a.rcpt
    GROUP BY a.l_suppkey ORDER BY suppkey
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap SELF-join (pairs of in-transit shipments of the
    same supplier whose [shipdate, receiptdate] windows overlap),
    computed with the BINNED band-join pattern — the scale answer when
    BOTH interval sets are large so neither side broadcasts:

    - each interval explodes to the week buckets it spans (TPC-H transit
      windows are <= ~1 month, so the fan-out is a bounded 1-6 rows);
    - the join is EQUI on (supplier, week) — the shuffle key Catalyst
      can hash-partition, instead of the O(n²)-per-supplier residual
      range join the naive form plans;
    - a pair that overlaps across several shared weeks would match in
      each of them, so each pair is COUNTED ONLY IN ITS OWNER BUCKET —
      the week containing GREATEST(ship_a, ship_b), which every
      overlapping pair shares exactly once. No distinct needed: the
      dedup is a filter, not a shuffle.

    The DuckDB oracle is the naive residual-predicate join — same
    result, quadratic plan — proving the binned rewrite exact.
    Output is per-supplier (pair count, total overlap days).
    """
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= _IVL_SUPP_MAX)
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("key"),
            F.col("l_suppkey").alias("sk"),
            F.col("l_shipdate").cast("date").alias("ship"),
            # the trimmed synthetic lineitem carries no receiptdate —
            # derive a deterministic 7–27 day transit window from the
            # (whole-number) quantity, same formula as the oracle
            F.expr(
                "date_add(CAST(l_shipdate AS DATE), CAST(l_quantity AS INT) % 21 + 7)"
            ).alias("rcpt"),
        )
    )

    def side(tag: str) -> DataFrame:
        return li.select(
            F.col("key").alias(f"key_{tag}"),
            "sk",
            F.col("ship").alias(f"ship_{tag}"),
            F.col("rcpt").alias(f"rcpt_{tag}"),
            F.explode(
                F.sequence(_ivl_week(F.col("ship")), _ivl_week(F.col("rcpt")))
            ).alias("wk"),
        )

    owner_start = F.greatest(F.col("ship_a"), F.col("ship_b"))
    pairs = (
        side("a")
        .join(side("b"), ["sk", "wk"])
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.col("ship_a") <= F.col("rcpt_b"))
            & (F.col("ship_b") <= F.col("rcpt_a"))
            & (F.col("wk") == _ivl_week(owner_start))
        )
    )
    return (
        pairs.groupBy(F.col("sk").alias("suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n_overlap_pairs"),
            F.sum(
                F.datediff(
                    F.least(F.col("rcpt_a"), F.col("rcpt_b")), owner_start
                )
                + 1
            ).alias("sum_overlap_days"),
        )
        .orderBy("suppkey")
    )


@query(
    "agg_incremental_maintenance",
    """
    WITH base AS (
      SELECT * FROM orders WHERE o_orderkey % 20 <> 0
    ),
    final AS (
      SELECT o_orderpriority, o_totalprice FROM base
      WHERE NOT (o_orderkey % 40 = 1)
      UNION ALL
      SELECT o_orderpriority, o_totalprice + 10 FROM orders
      WHERE o_orderkey % 20 = 0
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)::DOUBLE
             AS sum_price
    FROM final GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a grouped aggregate under INSERTS AND
    DELETES — the retraction algebra behind materialized-view engines
    (DBSP/Differential Dataflow; `join_incremental_maintenance` is the
    join counterpart): each delta row carries a weight (+1 insert, −1
    retraction), the delta is aggregated ALONE, and the new state is
    state ⊕ Δstate via one full-outer merge on the group key — the base
    data is never rescanned. Groups whose maintained count reaches 0
    drop out (the part plain ever-growing upserts get wrong).

    Here: base = 95% of orders; the delta retracts every 40th key and
    inserts the held-out 5% re-priced (+10). The DuckDB oracle computes
    the FINAL state from scratch — equality proves the merge algebra.

    Scale: Δstate is |delta-groups| rows; the merge shuffles only group
    keys (or broadcasts when the delta touches few groups). Count and
    SUM are self-inverse under weights; MIN/MAX would need the per-group
    heap or a rescan-on-retract escape hatch (documented limitation of
    IVM for non-invertible aggregates).
    """
    od = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = od.filter(F.col("o_orderkey") % 20 != 0)
    state0 = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(money("o_totalprice")).alias("s0"),
    )
    deletes = base.filter(F.col("o_orderkey") % 40 == 1).select(
        "o_orderpriority", money("o_totalprice").alias("cents"), F.lit(-1).alias("w")
    )
    inserts = od.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderpriority",
        money(F.col("o_totalprice") + 10).alias("cents"),
        F.lit(1).alias("w"),
    )
    dstate = (
        deletes.unionByName(inserts)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("w").alias("dn"),
            F.sum(F.col("w") * F.col("cents")).alias("ds"),
        )
    )
    merged = state0.join(dstate, "o_orderpriority", "full_outer").select(
        "o_orderpriority",
        (F.coalesce(F.col("n0"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias(
            "n_rows"
        ),
        (
            F.coalesce(F.col("s0"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(18,2)"))
        ).alias("s"),
    )
    return (
        merged.filter(F.col("n_rows") > 0)
        .select(
            "o_orderpriority",
            "n_rows",
            F.round(F.col("s"), 2).cast("double").alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "join_null_safe",
    """
    WITH c AS (
      SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS k,
             COUNT(*) AS n_cust
      FROM customer GROUP BY 1
    ),
    s AS (
      SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END AS k,
             COUNT(*) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT c.k AS nationkey, c.n_cust, s.n_supp
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    ORDER BY nationkey NULLS FIRST
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the
    delinquent-balance rows on both sides collapse to a NULL key that
    MUST match (a plain `=` silently drops them — the classic
    sentinel-key reconciliation bug). Catalyst plans `<=>` as a hash
    join key like any equality, so the null bucket shuffles and matches
    normally — no fallback to nested loops.
    """
    cu = (
        read_table(spark, sf_dir, "customer")
        .groupBy(
            F.when(F.col("c_acctbal") < 0, None)
            .otherwise(F.col("c_nationkey"))
            .alias("k")
        )
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    su = (
        read_table(spark, sf_dir, "supplier")
        .groupBy(
            F.when(F.col("s_acctbal") < 0, None)
            .otherwise(F.col("s_nationkey"))
            .alias("kk")
        )
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cu.join(su, cu["k"].eqNullSafe(su["kk"]))
        .select(F.col("k").alias("nationkey"), "n_cust", "n_supp")
        .orderBy(F.col("nationkey").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# round-7 addition: quantified comparisons (ALL / ANY)
# ---------------------------------------------------------------------------


@query(
    "subq_quantified_all_any",
    """
    WITH nation_avg AS (
      SELECT c_nationkey,
             AVG(c_acctbal) AS nav
      FROM customer GROUP BY c_nationkey
    ),
    bounds AS (
      SELECT MAX(nav) AS max_nav, MIN(nav) AS min_nav FROM nation_avg
    )
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           COUNT(*) FILTER (WHERE c_acctbal > bounds.max_nav)
             AS n_above_all_nation_avgs,
           COUNT(*) FILTER (WHERE c_acctbal > bounds.min_nav)
             AS n_above_any_nation_avg
    FROM customer, bounds
    GROUP BY c_mktsegment, bounds.max_nav, bounds.min_nav
    ORDER BY segment
    """,
)
def subq_quantified_all_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons per market segment: customers whose
    balance exceeds ALL per-nation average balances (`> ALL (subquery)`
    ⇔ `> MAX(subquery)`) and those exceeding ANY (`⇔ > MIN`) — the
    standard rewrite Spark itself applies, made explicit because the
    DataFrame API has no ALL/ANY surface. Completes the subquery family
    ([[subq_exists_late_orders]] EXISTS, [[subq_scalar_above_avg]]
    scalar, [[subq_lateral_topk]] LATERAL).

    Exactness: the nation averages are exact-rational (decimal sums /
    counts in both engines reduce to the same double); the bounds are a
    1-row broadcast; per-segment counts are integers. Plan: one groupBy
    to the 25-row nation frame, a 1-row bounds aggregate broadcast over
    ONE customer scan — the quantifier never rescans per row.
    """
    cu = read_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    nav = cu.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nav"))
    bounds = nav.agg(F.max("nav").alias("max_nav"), F.min("nav").alias("min_nav"))
    return (
        cu.crossJoin(F.broadcast(bounds))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(
                F.when(F.col("c_acctbal") > F.col("max_nav"), 1).otherwise(0)
            ).alias("n_above_all_nation_avgs"),
            F.sum(
                F.when(F.col("c_acctbal") > F.col("min_nav"), 1).otherwise(0)
            ).alias("n_above_any_nation_avg"),
        )
        .orderBy("segment")
    )
