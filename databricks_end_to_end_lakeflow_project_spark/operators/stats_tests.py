"""Hypothesis-testing pack, round 8: the classical tests the round-7
stats module (stats.py) didn't yet cover — variance homogeneity, paired
binary contrasts, rank-based K-group comparison, outlier tests,
proportion z-tests, portmanteau autocorrelation, capture–recapture
population estimation, and quantile-forecast scoring.

Shared exactness protocol (see functions/compat.py and stats.py):
quantize to integer cents/half-cents BEFORE aggregation so every
groupwise moment is an exact integer sum in both engines; sums of
squares fold in decimal(38,0) (Spark) ↔ HUGEINT (DuckDB) so the ×128
magnitude sweep (tools/overflow_sweep.py) cannot wrap them; across-group
reductions of DOUBLE terms fold in pinned group order (sorted-array
sequential fold ↔ list_reduce(LIST(... ORDER BY ...))); the final
statistic is a fixed expression tree on identical operands, rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.scalerank import (
    RankSpec,
    with_global_ranks,
)
from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

_D38 = "decimal(38,0)"


def _sorted_fold(key_col, val_col):
    """Σ of per-group DOUBLE terms in pinned group order — the only
    cross-engine-stable way to reduce a handful of doubles."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(key_col, val_col.alias("v")))),
            lambda s: s["v"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# ---------------------------------------------------------------------------
# Brown–Forsythe (median-centered Levene) variance homogeneity
# ---------------------------------------------------------------------------


@query(
    "stats_levene_bf",
    """
    WITH src AS (
      SELECT c_mktsegment AS seg,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    med AS (
      SELECT seg, CAST(ROUND(2 * quantile_cont(cents, 0.5)) AS BIGINT) AS hm
      FROM src GROUP BY seg
    ),
    z AS (
      SELECT src.seg, ABS(2 * cents - hm) AS z2
      FROM src JOIN med ON src.seg = med.seg
    ),
    g AS (
      SELECT seg, COUNT(*) AS n, SUM(z2) AS sz, SUM(z2 * z2) AS szz
      FROM z GROUP BY seg
    ),
    tot AS (
      SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(sz) AS t1,
             CAST(SUM(szz) AS DOUBLE) AS t2,
             list_reduce(list_prepend(0.0::DOUBLE,
               (SELECT LIST(CAST(sz AS DOUBLE) * sz / n ORDER BY seg) FROM g)),
               (a, b) -> a + b) AS fb
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_rows,
           ROUND((CAST(nn - k AS DOUBLE) / (k - 1))
                 * (fb - CAST(t1 AS DOUBLE) * t1 / nn) / (t2 - fb), 4)
             AS levene_w
    FROM tot
    """,
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (median-centered Levene) for homogeneity of
    account-balance variance across market segments — the assumption
    check you run BEFORE trusting the equal-variance [[stats_anova_oneway]]
    F test (fail it and you fall back to [[stats_welch_ttest]]-style
    contrasts). Median centering (Brown–Forsythe 1974) keeps the test
    level-robust under skew, unlike mean-centered Levene.

    Exactness: |x − med| is computed in HALF-CENT integers (2·cents −
    round(2·median); the exact-percentile median of integer cents is
    always a whole or .5 value, so 2·med is an exact integer in both
    engines); group moments are exact integer sums with the z² fold in
    decimal(38,0) ↔ HUGEINT; the across-segment Σ S_i²/n_i folds in
    pinned segment order; W is one expression on those scalars (the
    half-cent scale cancels in the ratio). Plan: one exact-percentile
    aggregate (partial-aggregatable sketch + exact pass), one equi-join
    back, one map-side-combinable groupBy, algebra on the 5-row frame.
    """
    cust = read_table(spark, sf_dir, "customer")
    src = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    med = src.groupBy("seg").agg(
        F.round(2 * F.percentile("cents", F.lit(0.5))).cast("long").alias("hm")
    )
    z2 = F.abs(2 * F.col("cents") - F.col("hm"))
    g = (
        src.join(med, "seg")
        .select("seg", z2.alias("z2"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("z2").alias("sz"),
            F.sum((F.col("z2") * F.col("z2")).cast(_D38)).alias("szz"),
        )
    )
    fb = _sorted_fold(
        F.col("seg"), F.col("sz").cast("double") * F.col("sz") / F.col("n")
    )
    tot = g.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("sz").alias("t1"),
        F.sum("szz").cast("double").alias("t2"),
        fb.alias("fb"),
    )
    k, nn = F.col("k"), F.col("nn")
    w = (
        ((nn - k).cast("double") / (k - 1))
        * (F.col("fb") - F.col("t1").cast("double") * F.col("t1") / nn)
        / (F.col("t2") - F.col("fb"))
    )
    return tot.select(
        k.cast("long").alias("k_groups"),
        nn.cast("long").alias("n_rows"),
        F.round(w, 4).alias("levene_w"),
    )


# ---------------------------------------------------------------------------
# McNemar paired-proportion test
# ---------------------------------------------------------------------------


@query(
    "stats_mcnemar_paired",
    """
    WITH flags AS (
      SELECT c.c_custkey,
             (c.c_acctbal > 0) AS a1,
             (u.c_custkey IS NOT NULL) AS a2
      FROM customer c
      LEFT JOIN (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                 WHERE o_orderpriority = '1-URGENT') u
        ON c.c_custkey = u.c_custkey
    ),
    cells AS (
      SELECT COUNT(*) FILTER (WHERE a1 AND a2) AS n11,
             COUNT(*) FILTER (WHERE a1 AND NOT a2) AS n10,
             COUNT(*) FILTER (WHERE NOT a1 AND a2) AS n01,
             COUNT(*) FILTER (WHERE NOT a1 AND NOT a2) AS n00
      FROM flags
    )
    SELECT n11, n10, n01, n00,
           ROUND(POWER(ABS(CAST(n10 AS DOUBLE) - n01) - 1, 2)
                 / (n10 + n01), 4) AS mcnemar_chi2
    FROM cells
    """,
)
def stats_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired binary outcomes per customer — 'is in
    credit' (acctbal > 0) vs 'has ever placed an URGENT order' — the
    paired-data analogue of [[stats_two_proportion_ztest]]: only the
    DISCORDANT cells n10/n01 carry information, and the continuity-
    corrected χ² = (|n10−n01|−1)²/(n10+n01) tests their symmetry. The
    shape every paired label-flip eval (model A vs model B on the same
    examples) reduces to.

    Exactness: four exact integer cell counts from one aggregate over a
    left-semi-style join; χ² is one expression, rounded 4. Plan: DISTINCT
    on the filtered orders scan (map-side combinable), one broadcastable
    equi-join, one aggregate row.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("__u", F.lit(True))
    )
    flags = cust.join(urgent, "c_custkey", "left").select(
        (F.col("c_acctbal") > 0).alias("a1"),
        F.col("__u").isNotNull().alias("a2"),
    )
    cells = flags.agg(
        F.sum((F.col("a1") & F.col("a2")).cast("long")).alias("n11"),
        F.sum((F.col("a1") & ~F.col("a2")).cast("long")).alias("n10"),
        F.sum((~F.col("a1") & F.col("a2")).cast("long")).alias("n01"),
        F.sum((~F.col("a1") & ~F.col("a2")).cast("long")).alias("n00"),
    )
    chi2 = F.pow(
        F.abs(F.col("n10").cast("double") - F.col("n01")) - 1, 2
    ) / (F.col("n10") + F.col("n01"))
    return cells.select(
        "n11", "n10", "n01", "n00", F.round(chi2, 4).alias("mcnemar_chi2")
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test
# ---------------------------------------------------------------------------


@query(
    "stats_two_proportion_ztest",
    """
    WITH g AS (
      SELECT user_id % 2 AS cohort,
             COUNT(*) AS n,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS x
      FROM events GROUP BY user_id % 2
    ),
    w AS (
      SELECT MAX(CASE WHEN cohort = 0 THEN n END) AS n1,
             MAX(CASE WHEN cohort = 0 THEN x END) AS x1,
             MAX(CASE WHEN cohort = 1 THEN n END) AS n2,
             MAX(CASE WHEN cohort = 1 THEN x END) AS x2
      FROM g
    )
    SELECT n1, x1, n2, x2,
           ROUND(CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2, 6)
             AS rate_diff,
           ROUND((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                 / SQRT((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1.0 / n1 + 1.0 / n2)), 4) AS z_stat
    FROM w
    """,
)
def stats_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test of purchase rate between the two
    user-parity cohorts — the first read of any conversion A/B test
    (the proportion counterpart of [[stats_welch_ttest]]; its sample-size
    planning lives in [[stats_power_analysis]], its pre-test sanity check
    in [[stats_srm_check]]).

    Exactness: (n, x) per cohort are exact integer counts from ONE
    map-side-combinable groupBy; the pooled z is a fixed expression on
    those four integers, rounded 6/4.
    """
    ev = read_table(spark, sf_dir, "events")
    g = ev.groupBy((F.col("user_id") % 2).alias("cohort")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("x"),
    )
    w = g.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("cohort") == 0, F.col("x"))).alias("x1"),
        F.max(F.when(F.col("cohort") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("cohort") == 1, F.col("x"))).alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2"))
    z = (p1 - p2) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    return w.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.round(p1 - p2, 6).alias("rate_diff"),
        F.round(z, 4).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Grubbs-style maximum studentized deviate per group
# ---------------------------------------------------------------------------


@query(
    "stats_grubbs_extreme",
    """
    WITH src AS (
      SELECT c_mktsegment AS seg, c_custkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    g AS (
      SELECT seg, COUNT(*) AS n, SUM(cents) AS s1,
             SUM(cents * cents) AS s2
      FROM src GROUP BY seg
    ),
    dev AS (
      SELECT src.seg, src.c_custkey, src.cents, g.n, g.s1, g.s2,
             ABS(g.n * src.cents - g.s1) AS dev_scaled
      FROM src JOIN g ON src.seg = g.seg
    ),
    top AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY seg ORDER BY dev_scaled DESC, c_custkey) AS rn
        FROM dev
      ) WHERE rn = 1
    )
    SELECT seg, c_custkey AS outlier_key,
           ROUND(cents / 100.0, 2) AS outlier_value, n,
           ROUND((CAST(dev_scaled AS DOUBLE) / n / 100.0)
                 / SQRT((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) * 100.0
                 / 100.0, 4) AS grubbs_g
    FROM top ORDER BY seg
    """,
)
def stats_grubbs_extreme(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' maximum studentized deviate per market segment: the single
    most extreme account balance and its G = |x − x̄|/s — the classical
    one-outlier-at-a-time test ([[stats_mad_outliers]] is the robust
    mass-screening counterpart; Grubbs answers 'is the single worst point
    an outlier' with a distributional test).

    Exactness: the argmax uses INTEGER-SCALED deviation |n·x − Σx| (no
    division, no float compare — exact in longs), so the winning row is
    deterministic in both engines; G is then a fixed expression on exact
    moments. Plan: one groupBy for moments, one equi-join back, one
    PARTITIONED top-1 window, 5 result rows.
    """
    cust = read_table(spark, sf_dir, "customer")
    src = cust.select(
        F.col("c_mktsegment").alias("seg"),
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    g = src.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        # squared cents fold in decimal(38,0) per the module's overflow
        # protocol (DuckDB side promotes SUM(BIGINT) to HUGEINT): a plain
        # long sum wraps/raises under ANSI at x128 value magnitudes
        F.sum(F.col("cents").cast(_D38) * F.col("cents")).alias("s2"),
    )
    dev = src.join(g, "seg").withColumn(
        "dev_scaled", F.abs(F.col("n") * F.col("cents") - F.col("s1"))
    )
    w = Window.partitionBy("seg").orderBy(F.desc("dev_scaled"), "c_custkey")
    top = dev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    sd = F.sqrt(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    gstat = (F.col("dev_scaled").cast("double") / F.col("n") / 100.0) / sd * 100.0 / 100.0
    return top.select(
        "seg",
        F.col("c_custkey").alias("outlier_key"),
        F.round(F.col("cents") / 100.0, 2).alias("outlier_value"),
        "n",
        F.round(gstat, 4).alias("grubbs_g"),
    ).orderBy("seg")


# ---------------------------------------------------------------------------
# Kruskal–Wallis rank test (tie-corrected)
# ---------------------------------------------------------------------------


@query(
    "stats_kruskal_wallis",
    """
    WITH src AS (
      SELECT c_nationkey AS grp, c_custkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    rn AS (
      SELECT grp, cents,
             ROW_NUMBER() OVER (ORDER BY cents, c_custkey) AS i
      FROM src
    ),
    -- average rank per VALUE: min row_number within the tie group plus
    -- (t-1)/2, doubled to stay integral (2R = 2*min_i + t - 1)
    av AS (
      SELECT cents, 2 * MIN(i) + COUNT(*) - 1 AS r2, COUNT(*) AS t
      FROM rn GROUP BY cents
    ),
    g AS (
      SELECT grp, COUNT(*) AS n, SUM(r2) AS s2r
      FROM rn JOIN av USING (cents) GROUP BY grp
    ),
    ties AS (
      SELECT SUM(CAST(t AS HUGEINT) * t * t - t) AS tcub
      FROM (SELECT DISTINCT cents, t FROM av)
    ),
    tot AS (
      SELECT (SELECT SUM(n) FROM g) AS nn,
             (SELECT COUNT(*) FROM g) AS k,
             (SELECT CAST(tcub AS DOUBLE) FROM ties) AS tc,
             list_reduce(list_prepend(0.0::DOUBLE,
               (SELECT LIST(CAST(s2r AS DOUBLE) / 2 * s2r / 2 / n
                            ORDER BY grp) FROM g)),
               (a, b) -> a + b) AS fr
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_rows,
           ROUND((12.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * fr - 3.0 * (nn + 1))
                 / (1 - tc / (CAST(nn AS DOUBLE) * nn * nn - nn)), 4)
             AS kw_h
    FROM tot
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal–Wallis H across the 25 nations on account
    balance — the rank-based K-group test you reach for when
    [[stats_levene_bf]] rejects the variance homogeneity that
    [[stats_anova_oneway]] assumes (the K-group generalization of
    [[stats_mann_whitney_u]]).

    Exactness: average ranks are kept DOUBLED (2R = 2·min_rank + t − 1,
    an exact integer even for .5 average ranks); per-group Σ2R is an
    exact long; the across-group Σ(ΣR)²/n folds in pinned nation order;
    the tie term Σ(t³−t) folds in decimal(38,0) ↔ HUGEINT (t³ wraps
    int64 near sf1 — the [[graph_degree_assortativity]] lesson). Plan:
    exact global ranks come from the scalerank kernel (no unpartitioned
    window — boundary sketch + partitioned windows), then min-per-value
    + one groupBy; everything downstream is a ≤25-row frame.
    """
    cust = read_table(spark, sf_dir, "customer")
    src = cust.select(
        F.col("c_nationkey").alias("grp"),
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    ranked, _n = with_global_ranks(
        src, [RankSpec(out="i", value="cents", tiebreaks=["c_custkey"])]
    )
    av = ranked.groupBy("cents").agg(
        (2 * F.min("i") + F.count(F.lit(1)) - 1).alias("r2"),
        F.count(F.lit(1)).alias("t"),
    )
    g = (
        ranked.join(av, "cents")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("r2").alias("s2r"))
    )
    ties = av.agg(
        F.sum(
            (F.col("t").cast(_D38) * F.col("t") * F.col("t") - F.col("t")).cast(_D38)
        ).alias("tcub")
    )
    fr = _sorted_fold(
        F.col("grp"),
        F.col("s2r").cast("double") / 2 * F.col("s2r") / 2 / F.col("n"),
    )
    tot = g.groupBy().agg(
        F.sum("n").alias("nn"), F.count(F.lit(1)).alias("k"), fr.alias("fr")
    ).crossJoin(F.broadcast(ties))
    nn = F.col("nn").cast("double")
    h = 12.0 / (nn * (F.col("nn") + 1)) * F.col("fr") - 3.0 * (F.col("nn") + 1)
    c = 1 - F.col("tcub").cast("double") / (nn * F.col("nn") * F.col("nn") - F.col("nn"))
    return tot.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n_rows"),
        F.round(h / c, 4).alias("kw_h"),
    )


# ---------------------------------------------------------------------------
# Ljung–Box portmanteau test
# ---------------------------------------------------------------------------


@query(
    "stats_ljung_box",
    """
    WITH hourly AS (
      -- quantize-before-aggregate: the bucket mean folds an exact
      -- DECIMAL sum (order-free) before the 6dp round, so a
      -- round-boundary tie cannot flip between engines/partitionings
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 6) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    lagged AS (
      SELECT event_type, v,
             lag(v, 1) OVER w AS l1,
             lag(v, 2) OVER w AS l2,
             lag(v, 3) OVER w AS l3
      FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
    ),
    acf AS (
      SELECT event_type, lag, corr(v, vl) AS r, COUNT(*) AS npairs FROM (
        SELECT event_type, 1 AS lag, v, l1 AS vl FROM lagged WHERE l1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2, v, l2 FROM lagged WHERE l2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3, v, l3 FROM lagged WHERE l3 IS NOT NULL
      ) GROUP BY event_type, lag
    ),
    n AS (SELECT event_type, COUNT(*) AS nn FROM hourly GROUP BY event_type)
    SELECT acf.event_type,
           CAST(nn AS BIGINT) AS n_buckets,
           ROUND(CAST(nn AS DOUBLE) * (nn + 2)
                 * list_reduce(list_prepend(0.0::DOUBLE,
                     LIST(r * r / (nn - lag) ORDER BY lag)), (a, b) -> a + b),
                 4) AS lb_q,
           3 AS df
    FROM acf JOIN n ON acf.event_type = n.event_type
    GROUP BY acf.event_type, nn
    ORDER BY acf.event_type
    """,
)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau Q over lags 1–3 of each event type's hourly
    mean-value series: Q = n(n+2)·Σ r_k²/(n−k) — the ONE-number 'is
    there any autocorrelation at all' test on top of the per-lag ACF
    ([[ts_autocorr_lags]] reports the r_k themselves; Ljung–Box is the
    χ²(K) gate a forecasting pipeline checks residuals with).

    Exactness: the r_k are the same corr() co-moment aggregates as the
    ACF query (identical in both engines on identical pair sets); the
    Σ over the K=3 lags folds in pinned lag order; Q is one expression,
    rounded 4. Plan identical to [[ts_autocorr_lags]] plus one ≤|types|
    join.
    """
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    lagged = hourly.select(
        "event_type",
        "v",
        *[F.lag("v", k).over(w).alias(f"l{k}") for k in (1, 2, 3)],
    )
    stacked = lagged.select(
        "event_type",
        F.expr("stack(3, 1, l1, 2, l2, 3, l3) AS (lag, vl)"),
        "v",
    ).filter(F.col("vl").isNotNull())
    acf = stacked.groupBy("event_type", "lag").agg(F.corr("v", "vl").alias("r"))
    n = hourly.groupBy("event_type").agg(F.count(F.lit(1)).alias("nn"))
    joined = acf.join(n, "event_type")
    foldq = _sorted_fold(
        F.col("lag"), F.col("r") * F.col("r") / (F.col("nn") - F.col("lag"))
    )
    return (
        joined.groupBy("event_type", "nn")
        .agg(foldq.alias("s"))
        .select(
            "event_type",
            F.col("nn").cast("long").alias("n_buckets"),
            F.round(
                F.col("nn").cast("double") * (F.col("nn") + 2) * F.col("s"), 4
            ).alias("lb_q"),
            F.lit(3).alias("df"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Capture–recapture (Chapman) population estimate
# ---------------------------------------------------------------------------


@query(
    "stats_capture_recapture",
    """
    WITH marks AS (
      SELECT doc_id,
             (CAST(('0x' || substr(md5('s1|' || trim(text)), 1, 8)) AS BIGINT)
              % 2 = 0) AS in1,
             (CAST(('0x' || substr(md5('s2|' || trim(text)), 1, 8)) AS BIGINT)
              % 2 = 0) AS in2
      FROM documents
    ),
    c AS (
      SELECT COUNT(*) AS n_true,
             COUNT(*) FILTER (WHERE in1) AS n1,
             COUNT(*) FILTER (WHERE in2) AS n2,
             COUNT(*) FILTER (WHERE in1 AND in2) AS m
      FROM marks
    )
    SELECT n_true, n1, n2, m,
           CAST(FLOOR((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1)
                AS BIGINT) AS chapman_estimate
    FROM c
    """,
)
def stats_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture–recapture estimate of corpus size from two
    INDEPENDENT content-hash 'captures' (salted md5 halves of the
    document text): N̂ = (n1+1)(n2+1)/(m+1) − 1, where m is the overlap.
    The production use is estimating the size of a population you can
    only sample — e.g. how many distinct documents (or near-dup
    clusters, fed by [[dedup_minhash_lsh_pairs]]) a crawl actually
    contains when full enumeration is too expensive; here the true count
    rides along so the estimator's error is visible.

    Exactness: membership is a deterministic salted-hash bit (identical
    md5 hex → identical parity in both engines); all four counts are
    exact integers and the estimate floors one double expression. Plan:
    one projection + one aggregate row over the scan.
    """
    docs = read_table(spark, sf_dir, "documents")

    def mark(salt: str):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(salt + "|"), F.trim("text"))), 1, 8), 16, 10)
            .cast("long")
            % 2
            == 0
        )

    c = docs.select(mark("s1").alias("in1"), mark("s2").alias("in2")).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(F.col("in1").cast("long")).alias("n1"),
        F.sum(F.col("in2").cast("long")).alias("n2"),
        F.sum((F.col("in1") & F.col("in2")).cast("long")).alias("m"),
    )
    est = F.floor(
        (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (F.col("m") + 1) - 1
    ).cast("long")
    return c.select("n_true", "n1", "n2", "m", est.alias("chapman_estimate"))


# ---------------------------------------------------------------------------
# Pinball (quantile) loss forecast scoring
# ---------------------------------------------------------------------------


@query(
    "stats_pinball_loss",
    """
    WITH bounds AS (
      -- epoch-double midpoint, NOT interval/2: DuckDB halves an
      -- INTERVAL per-component (days and micros separately), which
      -- lands on a different boundary than (min+max)/2 in seconds
      SELECT (epoch(MIN(ts)) + epoch(MAX(ts))) / 2 AS mid FROM events
    ),
    train AS (
      SELECT event_type,
             quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5) AS q50,
             quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.9) AS q90
      FROM events, bounds WHERE epoch(ts) < mid GROUP BY event_type
    ),
    test AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events, bounds WHERE epoch(ts) >= mid
    ),
    loss AS (
      SELECT t.event_type,
             COUNT(*) AS n_test,
             SUM(CAST(ROUND(GREATEST(0.5 * (y - q50), -0.5 * (y - q50))
                            * 10000) AS BIGINT)) AS l50_q,
             SUM(CAST(ROUND(GREATEST(0.9 * (y - q90), -0.1 * (y - q90))
                            * 10000) AS BIGINT)) AS l90_q
      FROM test t JOIN train USING (event_type)
      GROUP BY t.event_type
    )
    SELECT event_type, n_test,
           ROUND(l50_q / 10000.0 / n_test / 100.0, 4) AS pinball_p50,
           ROUND(l90_q / 10000.0 / n_test / 100.0, 4) AS pinball_p90
    FROM loss ORDER BY event_type
    """,
)
def stats_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss scoring of a per-type quantile forecast:
    the first time-half's exact p50/p90 of event value predicts the
    second half, scored with L_τ(y,q) = max(τ(y−q), (τ−1)(y−q)) — the
    proper scoring rule for quantile forecasts (what 'is our p90
    latency/spend forecast any good' reduces to; [[ts_holt_linear]]
    produces point forecasts, this evaluates the distributional kind).

    Exactness: values quantized to integer cents; the train quantiles
    are exact interpolated percentiles of integers (identical doubles in
    both engines); each loss TERM is quantized to 1e-4 cents before the
    sum (quantize-before-aggregate — the per-term product is identical
    in both engines, the SUM must be integer to be order-free). Plan:
    one 1-row time-midpoint broadcast, one exact-percentile aggregate
    per type, one equi-join + groupBy over the test half.
    """
    ev = read_table(spark, sf_dir, "events")
    b = ev.agg(
        ((F.min("ts").cast("double") + F.max("ts").cast("double")) / 2).alias(
            "mid"
        )
    )
    tagged = ev.crossJoin(F.broadcast(b)).withColumn(
        "y", F.round(F.col("value") * 100).cast("long")
    )
    train = (
        tagged.filter(F.col("ts").cast("double") < F.col("mid"))
        .groupBy("event_type")
        .agg(
            F.percentile("y", F.lit(0.5)).alias("q50"),
            F.percentile("y", F.lit(0.9)).alias("q90"),
        )
    )
    test = tagged.filter(F.col("ts").cast("double") >= F.col("mid")).select(
        "event_type", "y"
    )

    def pin(tau: float, q):
        d = F.col("y") - q
        return F.round(F.greatest(tau * d, (tau - 1) * d) * 10000).cast("long")

    loss = (
        test.join(train, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(pin(0.5, F.col("q50"))).alias("l50_q"),
            F.sum(pin(0.9, F.col("q90"))).alias("l90_q"),
        )
    )
    return loss.select(
        "event_type",
        "n_test",
        F.round(F.col("l50_q") / 10000.0 / F.col("n_test") / 100.0, 4).alias(
            "pinball_p50"
        ),
        F.round(F.col("l90_q") / 10000.0 / F.col("n_test") / 100.0, 4).alias(
            "pinball_p90"
        ),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Hodges–Lehmann location estimator (Walsh-average median)
# ---------------------------------------------------------------------------


@query(
    "stats_hodges_lehmann",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    walsh AS (
      -- Walsh averages kept DOUBLED (x_i + x_j is integral) over i <= j
      SELECT a.x + b.x AS w2
      FROM daily a JOIN daily b ON a.d <= b.d
    )
    SELECT (SELECT COUNT(*) FROM daily) AS n_days,
           COUNT(*) AS n_walsh,
           CAST(quantile_cont(w2, 0.5) AS DOUBLE) / 2.0 AS hodges_lehmann,
           (SELECT CAST(quantile_cont(x, 0.5) AS DOUBLE) FROM daily)
             AS plain_median
    FROM walsh
    """,
)
def stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann location estimate of the daily event volume: the
    median of all Walsh averages (xᵢ+xⱼ)/2, i ≤ j — the estimator behind
    the Wilcoxon test, ~95% Gaussian efficiency yet 29%-breakdown
    robust (the plain median rides along for contrast). Pairs with
    [[stats_theil_sen_trend]] (the same pairwise-median idea applied to
    slopes) and [[stats_mad_outliers]] in the robust toolbox.

    Exactness: Walsh averages are kept DOUBLED (xᵢ+xⱼ — exact integers),
    halved only after the exact interpolated percentile. The pairwise
    frame is the calendar-day grain (~n²/2 ≈ 4k rows for a 90-day
    fixture; month/day-grain self-joins are the documented bounded-frame
    pattern, cf. the Theil–Sen whitelist entry). Plan: one daily
    pre-aggregate (map-side combinable), one bounded range self-join,
    one exact-percentile aggregate.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    walsh = a.join(b, F.col("da") <= F.col("db")).select(
        (F.col("xa") + F.col("xb")).alias("w2")
    )
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    med = daily.agg(F.percentile("x", F.lit(0.5)).alias("plain_median"))
    return (
        walsh.agg(
            F.count(F.lit(1)).alias("n_walsh"),
            (F.percentile("w2", F.lit(0.5)) / 2.0).alias("hodges_lehmann"),
        )
        .crossJoin(F.broadcast(n_days))
        .crossJoin(F.broadcast(med))
        .select("n_days", "n_walsh", "hodges_lehmann", "plain_median")
    )


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test
# ---------------------------------------------------------------------------


@query(
    "stats_runs_test",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    med AS (SELECT quantile_cont(x, 0.5) AS m FROM daily),
    signs AS (
      SELECT d, (x > m) AS above,
             LAG(x > m) OVER (ORDER BY d) AS prev_above
      FROM daily, med WHERE x <> m
    ),
    c AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE above) AS n_plus,
             COUNT(*) FILTER (WHERE NOT above) AS n_minus,
             1 + COUNT(*) FILTER (WHERE prev_above IS NOT NULL
                                    AND above <> prev_above) AS runs
      FROM signs
    )
    SELECT n_plus, n_minus, runs,
           ROUND(1 + 2.0 * n_plus * n_minus / n, 4) AS expected_runs,
           ROUND((runs - (1 + 2.0 * n_plus * n_minus / n))
                 / SQRT(2.0 * n_plus * n_minus
                        * (2.0 * n_plus * n_minus - n)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 4) AS z_stat
    FROM c
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of the daily event-volume
    series around its median: too FEW runs of above/below-median days
    means trending/clustering, too MANY means oscillation — the
    nonparametric 'is this series actually random' gate that
    [[stats_page_hinkley_alarm]] (drift) and [[ts_cusum_drift]] assume
    was checked. Median-tied days drop (the textbook convention).

    Exactness: run boundaries are exact integer comparisons on a
    PARTITION-FREE series... no — the lag window orders the ~90-row
    DAILY frame (calendar-bounded, the documented grain for ordered
    scans: the frame size is |days|, not |events|); counts are exact
    integers and the z-stat is one expression. The daily pre-aggregate
    is the only corpus-scale pass.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("x")
    )
    med = daily.agg(F.percentile("x", F.lit(0.5)).alias("m"))
    # calendar-bounded frame: sort once via the array fold (no
    # unpartitioned window — same device as the ts_* operators)
    arr = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("m"))
        .groupBy()
        .agg(
            F.sort_array(
                F.collect_list(F.struct("d", (F.col("x") > F.col("m")).alias("ab")))
            ).alias("s")
        )
    )
    ab = F.transform(F.col("s"), lambda e: e["ab"].cast("int"))
    n = F.size("s")
    n_plus = F.aggregate(ab, F.lit(0), lambda a, x: a + x)
    runs = F.lit(1) + F.aggregate(
        F.zip_with(ab, F.slice(ab, 2, F.greatest(n - 1, F.lit(0))), lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda a, x: a + F.coalesce(x, F.lit(0)),
    )
    stat = arr.select(
        n.alias("n"), n_plus.alias("n_plus"), (n - n_plus).alias("n_minus"), runs.alias("runs")
    )
    er = 1 + 2.0 * F.col("n_plus") * F.col("n_minus") / F.col("n")
    z = (F.col("runs") - er) / F.sqrt(
        2.0
        * F.col("n_plus")
        * F.col("n_minus")
        * (2.0 * F.col("n_plus") * F.col("n_minus") - F.col("n"))
        / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
    )
    return stat.select(
        "n_plus",
        "n_minus",
        "runs",
        F.round(er, 4).alias("expected_runs"),
        F.round(z, 4).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# 1-D Wasserstein (earth-mover) drift monitor, integer-exact
# ---------------------------------------------------------------------------

_W1_LO, _W1_HI, _W1_BINS = 0.0, 100000.0, 40  # o_totalprice public grid


@query(
    "monitor_wasserstein_drift",
    f"""
    WITH rng AS (
      SELECT (epoch_us(MIN(o_orderdate)) + epoch_us(MAX(o_orderdate))) // 2
        AS mid_us
      FROM orders
    ),
    binned AS (
      SELECT (epoch_us(o_orderdate) >= mid_us) AS late,
             LEAST(CAST(FLOOR(o_totalprice / {(_W1_HI - _W1_LO) / _W1_BINS})
                        AS INT), {_W1_BINS - 1}) AS bin
      FROM orders, rng
    ),
    cells AS (
      SELECT bin,
             COUNT(*) FILTER (WHERE NOT late) AS c0,
             COUNT(*) FILTER (WHERE late) AS c1
      FROM binned GROUP BY bin
    ),
    grid AS (SELECT UNNEST(range({_W1_BINS})) AS bin),
    cum AS (
      SELECT g.bin,
             COALESCE(SUM(c.c0) FILTER (WHERE c.bin <= g.bin), 0) AS cum0,
             COALESCE(SUM(c.c1) FILTER (WHERE c.bin <= g.bin), 0) AS cum1
      FROM grid g LEFT JOIN cells c ON c.bin <= g.bin
      GROUP BY g.bin
    ),
    tot AS (
      SELECT MAX(cum0) AS n0, MAX(cum1) AS n1 FROM cum
    )
    SELECT n0, n1,
           ROUND(SUM(ABS(CAST(cum0 AS HUGEINT) * n1
                         - CAST(cum1 AS HUGEINT) * n0))
                 * {(_W1_HI - _W1_LO) / _W1_BINS}
                 / (CAST(n0 AS DOUBLE) * n1), 4) AS wasserstein_1
    FROM cum, tot
    GROUP BY n0, n1
    """,
)
def monitor_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth-mover) distance between the early and
    late halves of the order-value distribution on a public 40-bin grid:
    W₁ = Δ·Σ|F₀(b) − F₁(b)| — the drift metric with UNITS (dollars of
    mass-shift), unlike [[monitor_psi_value_drift]] (dimensionless,
    bin-sensitive) and [[monitor_ks_value_drift]] (sup-norm only feels
    the worst bin). The standard trio a drift monitor publishes
    together.

    Exactness: fully INTEGER until the last division — the per-bin term
    is |cum₀·n₁ − cum₁·n₀| (exact HUGEINT/decimal(38,0) products; the
    common 1/(n₀n₁) factors out of the sum), so no float CDF is ever
    summed. Plan: one binned groupBy, a ≤40-bin cumulative triangle
    join, one aggregate row.
    """
    width = (_W1_HI - _W1_LO) / _W1_BINS
    orders = read_table(spark, sf_dir, "orders")
    ts_us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    rng = orders.agg(
        ((F.min(ts_us) + F.max(ts_us)) / F.lit(2)).cast("long").alias("mid_us")
    )
    binned = orders.crossJoin(F.broadcast(rng)).select(
        (ts_us >= F.col("mid_us")).alias("late"),
        F.least(
            F.floor(F.col("o_totalprice") / width).cast("int"),
            F.lit(_W1_BINS - 1),
        ).alias("bin"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum((~F.col("late")).cast("long")).alias("c0"),
        F.sum(F.col("late").cast("long")).alias("c1"),
    )
    grid = spark.range(_W1_BINS).select(F.col("id").cast("int").alias("bin"))
    cum = (
        grid.join(
            cells.select(F.col("bin").alias("xb"), "c0", "c1"),
            F.col("xb") <= F.col("bin"),
            "left",
        )
        .groupBy("bin")
        .agg(
            F.coalesce(F.sum("c0"), F.lit(0)).alias("cum0"),
            F.coalesce(F.sum("c1"), F.lit(0)).alias("cum1"),
        )
    )
    tot = cum.agg(F.max("cum0").alias("n0"), F.max("cum1").alias("n1"))
    term = F.abs(
        F.col("cum0").cast(_D38) * F.col("n1") - F.col("cum1").cast(_D38) * F.col("n0")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n0", "n1")
        .agg(
            F.round(
                F.sum(term).cast("double")
                * width
                / (F.col("n0").cast("double") * F.col("n1")),
                4,
            ).alias("wasserstein_1")
        )
        .select("n0", "n1", "wasserstein_1")
    )
