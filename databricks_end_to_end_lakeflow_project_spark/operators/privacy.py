"""Privacy / re-identification-risk audits for data release.

A training-data pipeline that exports user-derived tables (the reference's
gold layer publishes customer-grained dims, ``DIM_Gold_layer.py``) needs a
release gate: how identifiable is a row from its quasi-identifiers, and
what does a noisy release look like? This module implements the standard
audits — k-anonymity, l-diversity, generalization planning — plus a
deterministic differential-privacy noisy-count release.

Oracle notes: the DP mechanism draws its Laplace noise from a
*hash-derived* uniform (a 31-bit LCG over the group key) so both engines
compute bit-identical noise — this is a TEST HARNESS determinism device;
a production release would use a CSPRNG (the mechanism arithmetic is
otherwise the textbook inverse-CDF Laplace draw). All float outputs are
rounded before hashing.

Scale notes (100 TB): every audit here is one hash-aggregate over the
quasi-identifier key — partial-aggregatable, one shuffle, output rows
bounded by QI-group cardinality (not input rows). l-diversity's distinct
count is a two-level aggregate (exact distinct per group), which at
extreme sensitive-value cardinality would switch to an HLL sketch
(``approx_count_distinct``) with the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

# quasi-identifier projection shared by the k-anonymity family:
# nation + market segment + coarse account-balance band.
# (a function, not a module constant: Column construction needs an active
# SparkContext, which imports must not assume)
def _qi():
    return [
        F.col("c_nationkey").alias("qi_nation"),
        F.col("c_mktsegment").alias("qi_segment"),
        F.floor(F.col("c_acctbal") / F.lit(1000)).cast("long").alias("qi_bal_band"),
    ]

_QI_SQL = (
    "c_nationkey AS qi_nation, c_mktsegment AS qi_segment, "
    "CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS qi_bal_band"
)


@query(
    "privacy_k_anonymity",
    f"""
    WITH qi AS (
      SELECT {_QI_SQL} FROM customer
    ),
    grp AS (
      SELECT qi_nation, qi_segment, qi_bal_band, COUNT(*) AS sz
      FROM qi GROUP BY ALL
    ),
    ks AS (SELECT UNNEST([2, 5, 10, 25]) AS k)
    SELECT k,
           COUNT(*) FILTER (WHERE sz < k) AS groups_below_k,
           COALESCE(SUM(sz) FILTER (WHERE sz < k), 0) AS rows_at_risk,
           ROUND(100.0 * COALESCE(SUM(sz) FILTER (WHERE sz < k), 0)
                 / SUM(sz), 4) AS pct_at_risk
    FROM grp CROSS JOIN ks
    GROUP BY k ORDER BY k
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer quasi-identifier projection
    (nation, segment, $1000 balance band): for each candidate k, how many
    QI groups have fewer than k members and how many rows they expose.

    Plan: one hash-aggregate over the QI key (partial-aggregatable), then
    a 4-row threshold cross join over the *group* table — the second pass
    touches group-cardinality rows, never input rows, so at 100 TB the
    audit costs one shuffle of the QI projection.
    """
    cust = read_table(spark, sf_dir, "customer")
    grp = cust.select(*_qi()).groupBy("qi_nation", "qi_segment", "qi_bal_band").agg(
        F.count(F.lit(1)).alias("sz")
    )
    ks = spark.range(1).select(F.explode(F.array(*[F.lit(k) for k in (2, 5, 10, 25)])).alias("k"))
    below = F.when(F.col("sz") < F.col("k"), 1).otherwise(0)
    risk = F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(F.lit(0))
    return (
        grp.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(below).alias("groups_below_k"),
            F.sum(risk).alias("rows_at_risk"),
            F.round(100.0 * F.sum(risk) / F.sum("sz"), 4).alias("pct_at_risk"),
        )
        .orderBy("k")
    )


@query(
    "privacy_l_diversity",
    """
    WITH grp AS (
      SELECT c_nationkey AS qi_nation, c_mktsegment AS qi_segment,
             COUNT(*) AS group_size,
             COUNT(DISTINCT LEAST(GREATEST(
               CAST(FLOOR(c_acctbal / 2500) AS BIGINT), 0), 3))
               AS l_distinct
      FROM customer GROUP BY ALL
    )
    SELECT qi_nation, qi_segment, group_size, l_distinct
    FROM grp WHERE l_distinct < 3
    ORDER BY l_distinct, group_size, qi_nation, qi_segment
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: QI groups (nation, segment) whose sensitive
    attribute (account-balance band, clamped on BOTH ends to the 4
    buckets {0,1,2,3} — negative balances land in bucket 0) takes fewer
    than 3 distinct values — a homogeneity attack surface even when
    k-anonymity passes.

    Plan: exact distinct per group = two-level hash aggregate, one
    shuffle on the QI key; swap in ``approx_count_distinct`` at extreme
    sensitive-value cardinality (same shape, sketch mergeable).
    """
    cust = read_table(spark, sf_dir, "customer")
    sensitive = F.least(
        F.greatest(
            F.floor(F.col("c_acctbal") / F.lit(2500)).cast("long"), F.lit(0)
        ),
        F.lit(3),
    )
    return (
        cust.select(
            F.col("c_nationkey").alias("qi_nation"),
            F.col("c_mktsegment").alias("qi_segment"),
            sensitive.alias("sens"),
        )
        .groupBy("qi_nation", "qi_segment")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("sens").alias("l_distinct"),
        )
        .filter(F.col("l_distinct") < 3)
        .orderBy("l_distinct", "group_size", "qi_nation", "qi_segment")
    )


@query(
    "privacy_generalization_ladder",
    f"""
    WITH qi AS (SELECT {_QI_SQL} FROM customer),
    lvl0 AS (
      SELECT 0 AS level, COUNT(*) AS sz
      FROM qi GROUP BY qi_nation, qi_segment, qi_bal_band
    ),
    lvl1 AS (
      SELECT 1 AS level, COUNT(*) AS sz
      FROM qi GROUP BY qi_nation, qi_segment, CAST(FLOOR(qi_bal_band / 5) AS BIGINT)
    ),
    lvl2 AS (
      SELECT 2 AS level, COUNT(*) AS sz
      FROM qi GROUP BY qi_nation, qi_segment
    ),
    lvl3 AS (
      SELECT 3 AS level, COUNT(*) AS sz FROM qi GROUP BY qi_nation
    ),
    allg AS (
      SELECT * FROM lvl0 UNION ALL SELECT * FROM lvl1
      UNION ALL SELECT * FROM lvl2 UNION ALL SELECT * FROM lvl3
    )
    SELECT level, COUNT(*) AS n_groups, MIN(sz) AS min_group_size,
           COALESCE(SUM(sz) FILTER (WHERE sz < 5), 0) AS rows_at_risk_k5
    FROM allg GROUP BY level ORDER BY level
    """,
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization planning: re-run the k-anonymity group profile at
    four successive coarsenings of the QI (full → $5000 band → drop band →
    nation only) and report min group size + rows at risk (k=5) per
    level — the curve an anonymization step uses to pick the cheapest
    generalization that clears the release bar.

    Plan: four hash-aggregates over one cached QI projection, unioned at
    group granularity; each level is partial-aggregatable and the union
    holds group-cardinality rows only.
    """
    cust = read_table(spark, sf_dir, "customer")
    qi = cust.select(*_qi())
    levels = [
        (0, ["qi_nation", "qi_segment", "qi_bal_band"], None),
        (1, ["qi_nation", "qi_segment"], F.floor(F.col("qi_bal_band") / 5).cast("long")),
        (2, ["qi_nation", "qi_segment"], None),
        (3, ["qi_nation"], None),
    ]
    parts = []
    for lvl, keys, extra in levels:
        g = qi
        gb = list(keys)
        if extra is not None:
            g = g.withColumn("qi_coarse", extra)
            gb = gb + ["qi_coarse"]
        parts.append(
            g.groupBy(*gb)
            .agg(F.count(F.lit(1)).alias("sz"))
            .select(F.lit(lvl).alias("level"), "sz")
        )
    allg = parts[0]
    for p in parts[1:]:
        allg = allg.unionByName(p)
    risk = F.when(F.col("sz") < 5, F.col("sz")).otherwise(F.lit(0))
    return (
        allg.groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.min("sz").alias("min_group_size"),
            F.sum(risk).alias("rows_at_risk_k5"),
        )
        .orderBy("level")
    )


# 31-bit LCG over the release key — deterministic uniform. The raw
# residue is clamped into [1, M-1] (1 + hash % (M-1)) so u lies strictly
# inside (0, 1): an unclamped residue of 0 (keys ≡ -C·A⁻¹ mod M) would
# feed LN(0) = -inf into the Laplace inverse-CDF.
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2147483647


@query(
    "privacy_dp_noisy_counts",
    f"""
    WITH counts AS (
      SELECT c_nationkey AS nation, COUNT(*) AS true_n
      FROM customer GROUP BY c_nationkey
    ),
    noise AS (
      SELECT nation, true_n,
             (1 + ((CAST(nation AS BIGINT) * {_LCG_A}) + {_LCG_C})
                  % ({_LCG_M} - 1))
               / {_LCG_M}.0 AS u
      FROM counts
    )
    SELECT nation,
           ROUND(true_n
                 - 1.0 * SIGN(u - 0.5) * LN(1 - 2 * ABS(u - 0.5)), 6)
             AS noisy_count
    FROM noise ORDER BY nation
    """,
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy count release per nation (sensitivity 1,
    ε=1 → scale b=1), noise drawn by inverse-CDF from a key-derived
    uniform (clamped into (0,1), see `_LCG_M` note) so the test harness
    is deterministic.

    WARNING — the deterministic variant provides NO differential-privacy
    guarantee: the noise is a public function of the group key, so any
    consumer can recompute and subtract it, recovering the exact counts.
    It exists to pin the RELEASE ARITHMETIC (inverse-CDF, clamping,
    rounding) against the oracle; a production release must draw the
    uniform from a CSPRNG, which changes only the `u` expression.

    Plan: one hash-aggregate then per-group scalar arithmetic — the noise
    step is JVM-side expression work on group-cardinality rows.
    """
    cust = read_table(spark, sf_dir, "customer")
    counts = cust.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count(F.lit(1)).alias("true_n")
    )
    u = (
        1 + (F.col("nation").cast("long") * _LCG_A + _LCG_C) % (_LCG_M - 1)
    ) / F.lit(float(_LCG_M))
    lap = -F.lit(1.0) * F.signum(u - 0.5) * F.log(1 - 2 * F.abs(u - 0.5))
    return (
        counts.select(
            "nation", F.round(F.col("true_n") + lap, 6).alias("noisy_count")
        ).orderBy("nation")
    )


@query(
    "privacy_randomized_response",
    f"""
    WITH resp AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS truth,
             ((((CAST(c_custkey AS BIGINT) * {_LCG_A}) + {_LCG_C})
               % {_LCG_M}) / {_LCG_M}.0) < 0.75 AS keep
      FROM customer
    ),
    reported AS (
      SELECT CASE WHEN keep THEN truth ELSE 1 - truth END AS bit
      FROM resp
    )
    SELECT COUNT(*) AS n_respondents,
           SUM(bit) AS n_reported_yes,
           ROUND(AVG(1.0 * bit), 6) AS raw_share,
           ROUND((AVG(1.0 * bit) - 0.25) / 0.5, 6) AS debiased_share
    FROM reported
    """,
)
def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized response (Warner's local-DP mechanism, keep-probability
    p=0.75 → ε=ln 3): each respondent reports their sensitive bit
    ('is my balance negative') truthfully with probability p and flipped
    otherwise; the aggregate debiases via (observed − (1−p))/(2p−1). No
    row-level truth ever leaves the respondent — the collector sees only
    the flipped bits. The key-derived uniform keeps the harness
    deterministic (production: client-side CSPRNG, same estimator).

    Plan: row-local flip + one scalar aggregate — the entire mechanism
    is a projection, so it composes with any downstream aggregate at
    100 TB for free.
    """
    cust = read_table(spark, sf_dir, "customer")
    truth = F.when(F.col("c_acctbal") < 0, 1).otherwise(0)
    u = (
        (F.col("c_custkey").cast("long") * _LCG_A + _LCG_C) % _LCG_M
    ) / F.lit(float(_LCG_M))
    keep = u < 0.75
    bit = F.when(keep, truth).otherwise(1 - truth)
    return cust.select(bit.alias("bit")).agg(
        F.count(F.lit(1)).alias("n_respondents"),
        F.sum("bit").alias("n_reported_yes"),
        F.round(F.avg(1.0 * F.col("bit")), 6).alias("raw_share"),
        F.round((F.avg(1.0 * F.col("bit")) - 0.25) / 0.5, 6).alias(
            "debiased_share"
        ),
    )


# ---------------------------------------------------------------------------
# round-6 addition (session 2): t-closeness audit
# ---------------------------------------------------------------------------


@query(
    "privacy_t_closeness",
    """
    WITH bucketed AS (
      SELECT c_nationkey AS qi_nation, c_mktsegment AS qi_segment,
             LEAST(GREATEST(
               CAST(FLOOR(c_acctbal / 2500) AS BIGINT), 0), 3) AS b
      FROM customer
    ),
    grp AS (
      SELECT qi_nation, qi_segment,
             COUNT(*) AS n_g,
             SUM(CASE WHEN b <= 0 THEN 1 ELSE 0 END) AS cum0,
             SUM(CASE WHEN b <= 1 THEN 1 ELSE 0 END) AS cum1,
             SUM(CASE WHEN b <= 2 THEN 1 ELSE 0 END) AS cum2
      FROM bucketed GROUP BY qi_nation, qi_segment
    ),
    tot AS (
      SELECT SUM(n_g) AS n_all,
             SUM(cum0) AS call0, SUM(cum1) AS call1, SUM(cum2) AS call2
      FROM grp
    )
    SELECT qi_nation, qi_segment, n_g AS group_size,
           ROUND((ABS(cum0 * n_all - call0 * n_g)
                  + ABS(cum1 * n_all - call1 * n_g)
                  + ABS(cum2 * n_all - call2 * n_g))::DOUBLE
                 / (n_g * n_all * 3), 6) AS t_emd
    FROM grp, tot
    ORDER BY t_emd DESC, qi_nation, qi_segment LIMIT 20
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07) — the
    third rung of the anonymity-audit ladder after [[privacy_k_anonymity]]
    and [[privacy_l_diversity]]: a QI group can be k-anonymous AND
    l-diverse yet still leak if its sensitive-value DISTRIBUTION differs
    sharply from the corpus's. Reports the 20 worst (nation, segment)
    groups by Earth Mover's Distance between the group's and the global
    distribution over the 4 ordered balance buckets (the l-diversity
    bucketing, clamped both ends): EMD over an ordered domain is the
    mean absolute difference of the two CDFs.

    Exactness: the CDF differences are cross-multiplied into integers —
    |cum_g(j)·N − cum_all(j)·n_g| — summed exactly, with ONE double
    division by n_g·N·(B−1) at the end, rounded to 6.

    Scale: the 4-bucket cumulative counts are conditional sums inside
    ONE map-side-combinable groupBy (no per-group window, no pivot
    shuffle); the global row is a 1-row rollup of the group frame. The
    corpus is scanned once.
    """
    cust = read_table(spark, sf_dir, "customer")
    b = F.least(
        F.greatest(F.floor(F.col("c_acctbal") / F.lit(2500)).cast("long"), F.lit(0)),
        F.lit(3),
    )
    grp = (
        cust.select(
            F.col("c_nationkey").alias("qi_nation"),
            F.col("c_mktsegment").alias("qi_segment"),
            b.alias("b"),
        )
        .groupBy("qi_nation", "qi_segment")
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            *[
                F.sum(F.when(F.col("b") <= j, 1).otherwise(0)).alias(f"cum{j}")
                for j in range(3)
            ],
        )
    )
    tot = grp.agg(
        F.sum("n_g").alias("n_all"),
        *[F.sum(f"cum{j}").alias(f"call{j}") for j in range(3)],
    ).collect()[0]
    n_all = int(tot["n_all"])
    s = sum(
        F.abs(F.col(f"cum{j}") * F.lit(n_all) - F.lit(int(tot[f"call{j}"])) * F.col("n_g"))
        for j in range(3)
    )
    return (
        grp.select(
            "qi_nation",
            "qi_segment",
            F.col("n_g").alias("group_size"),
            F.round(
                s.cast("double") / (F.col("n_g") * F.lit(n_all) * F.lit(3)), 6
            ).alias("t_emd"),
        )
        .orderBy(F.desc("t_emd"), "qi_nation", "qi_segment")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# round-6 addition (session 2): iterative proportional fitting (raking)
# ---------------------------------------------------------------------------

_IPF_ROUNDS = 2  # row+column half-step pairs (unrolled in the oracle)


def _ipf_oracle() -> str:
    steps = []
    prev = "x0"
    for r in range(_IPF_ROUNDS):
        steps.append(
            f"""
    rs{r} AS (
      SELECT qi_nation, SUM(x) AS s FROM {prev} GROUP BY qi_nation
    ),
    xr{r} AS (
      SELECT p.qi_nation, p.qi_segment, p.x * (t.row_t / rs{r}.s) AS x
      FROM {prev} p
      JOIN rs{r} ON rs{r}.qi_nation = p.qi_nation
      CROSS JOIN targets t
    ),
    cs{r} AS (
      SELECT qi_segment, SUM(x) AS s FROM xr{r} GROUP BY qi_segment
    ),
    xc{r} AS (
      SELECT p.qi_nation, p.qi_segment, p.x * (t.col_t / cs{r}.s) AS x
      FROM xr{r} p
      JOIN cs{r} ON cs{r}.qi_segment = p.qi_segment
      CROSS JOIN targets t
    )"""
        )
        prev = f"xc{r}"
    chain = ",".join(steps)
    return f"""
    WITH cells AS (
      SELECT c_nationkey AS qi_nation, c_mktsegment AS qi_segment,
             COUNT(*)::DOUBLE AS x
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    tot AS (SELECT SUM(x) AS n FROM cells),
    dims AS (
      SELECT COUNT(DISTINCT qi_nation) AS nr,
             COUNT(DISTINCT qi_segment) AS nc
      FROM cells
    ),
    targets AS (
      SELECT tot.n / dims.nr AS row_t, tot.n / dims.nc AS col_t
      FROM tot, dims
    ),
    x0 AS (SELECT qi_nation, qi_segment, x FROM cells),
    {chain}
    SELECT qi_nation, qi_segment, ROUND(x, 6) AS raked
    FROM {prev} ORDER BY qi_nation, qi_segment
    """


@query("privacy_ipf_raking", _ipf_oracle())
def privacy_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking; Deming-Stephan 1940) of
    the (nation × segment) contingency table to UNIFORM target marginals
    — the workhorse behind survey reweighting and marginal-preserving
    synthetic microdata (release cell weights whose marginals match
    public totals while damping joint-cell disclosure). {_IPF_ROUNDS}
    row+column half-step pairs, bounded-round contract (same as
    PageRank's supersteps), unrolled in the oracle.

    Scale shape: the corpus is touched ONCE (the contingency groupBy);
    every IPF half-step is a marginal aggregate + broadcast-size join on
    the CELL table (|nations|·|segments| rows — model-sized). At 100 TB
    with high-cardinality margins the same plan holds: half-steps shuffle
    cells by one margin key at a time, never the data.
    """
    cu = read_table(spark, sf_dir, "customer")
    cells = (
        cu.groupBy(
            F.col("c_nationkey").alias("qi_nation"),
            F.col("c_mktsegment").alias("qi_segment"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .localCheckpoint(eager=True)
    )
    n = cells.agg(F.sum("x")).collect()[0][0]
    nr = cells.select("qi_nation").distinct().count()
    nc = cells.select("qi_segment").distinct().count()
    row_t, col_t = n / nr, n / nc
    x = cells
    for _r in range(_IPF_ROUNDS):
        rs = x.groupBy("qi_nation").agg(F.sum("x").alias("s"))
        x = x.join(F.broadcast(rs), "qi_nation").select(
            "qi_nation", "qi_segment",
            (F.col("x") * (F.lit(row_t) / F.col("s"))).alias("x"),
        )
        cs = x.groupBy("qi_segment").agg(F.sum("x").alias("s"))
        x = x.join(F.broadcast(cs), "qi_segment").select(
            "qi_nation", "qi_segment",
            (F.col("x") * (F.lit(col_t) / F.col("s"))).alias("x"),
        ).localCheckpoint(eager=True)
    return x.select(
        "qi_nation", "qi_segment", F.round("x", 6).alias("raked")
    ).orderBy("qi_nation", "qi_segment")


_DP_CAP = 5  # max rows one user may contribute to the release


@query(
    "privacy_contribution_capping",
    f"""
    WITH ranked AS (
      SELECT c_nationkey AS nation, o_custkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT nation,
           COUNT(*) AS raw_count,
           SUM(CASE WHEN rn <= {_DP_CAP} THEN 1 ELSE 0 END) AS capped_count,
           COUNT(*) - SUM(CASE WHEN rn <= {_DP_CAP} THEN 1 ELSE 0 END)
             AS rows_dropped
    FROM ranked GROUP BY nation ORDER BY nation
    """,
)
def privacy_contribution_capping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user contribution capping — the preprocessing step that makes
    user-level differential privacy POSSIBLE: an unbounded user can
    shift a count arbitrarily (infinite sensitivity), so each user keeps
    only their first {_DP_CAP} rows (deterministic order: date, key) and
    the release's sensitivity becomes exactly {_DP_CAP}. Reports
    raw-vs-capped per-nation counts and the clipped mass — the
    utility-vs-sensitivity trade the privacy engineer tunes before
    adding noise ([[privacy_dp_noisy_counts]] is the noise step).

    Plan: ONE per-user partitioned window (rank within contributor) +
    one grouped rollup — the cap never shuffles more than the raw scan.
    All integers.
    """
    od = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    cu = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = (
        od.join(cu, od["o_custkey"] == cu["c_custkey"])
        .select(F.col("c_nationkey").alias("nation"), "o_custkey",
                "o_orderdate", "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
    )
    capped = F.sum(F.when(F.col("rn") <= _DP_CAP, 1).otherwise(0))
    return (
        ranked.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("raw_count"),
            capped.alias("capped_count"),
            (F.count(F.lit(1)) - capped).alias("rows_dropped"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# round-7 addition: exponential mechanism (DP selection)
# ---------------------------------------------------------------------------

_EM_EPS = 1.0  # privacy budget for the selection


@query(
    "privacy_exponential_mechanism",
    f"""
    WITH cand AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    keyed AS (
      SELECT lang, n,
             -- Gumbel-max trick with a content-hash uniform draw:
             -- u = (md5(lang)[:7] + 1) / (16^7 + 1), g = -ln(-ln u)
             {_EM_EPS} * n / 2.0
               - LN(-LN((('0x' || SUBSTRING(md5(lang), 1, 7))::BIGINT + 1)
                        / 268435457.0)) AS dp_score
      FROM cand
    )
    SELECT lang, n,
           ROUND(dp_score, 6) AS dp_score,
           lang = (SELECT lang FROM keyed
                   ORDER BY dp_score DESC, lang LIMIT 1) AS chosen
    FROM keyed ORDER BY dp_score DESC, lang
    """,
)
def privacy_exponential_mechanism(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential mechanism (McSherry & Talwar) selecting the modal
    document language under ε={_EM_EPS} differential privacy, via the
    Gumbel-max formulation: score(c) = ε·u(c)/2Δ + Gumbel, argmax wins
    (count utility, sensitivity Δ=1). The DP answer to 'which category
    is biggest' that [[privacy_dp_noisy_counts]]' per-cell noise can't
    give directly (argmax of noisy counts burns budget per cell; the
    exponential mechanism pays once).

    The Gumbel draw is the house PRF convention ([[sample_weighted_reservoir]]):
    a content hash of the candidate, identical in both engines — the
    selection is a pure function of the data, so rerun/engine/cluster
    invariant. Plan: one groupBy to the K-candidate frame; the winner is
    a TakeOrderedAndProject 1-row broadcast (no unpartitioned ranking
    window — the house rule).
    """
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        hash_hex,
    )

    cand = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    u = (F.conv(hash_hex(F.col("lang"), 7), 16, 10).cast("double") + 1) / F.lit(
        float(16**7) + 1
    )
    keyed = cand.select(
        "lang", "n",
        (_EM_EPS * F.col("n") / 2.0 - F.log(-F.log(u))).alias("dp_score"),
    )
    from databricks_end_to_end_lakeflow_project_spark.session import persist_once

    keyed = persist_once(keyed)
    best = (
        keyed.orderBy(F.desc("dp_score"), "lang")
        .limit(1)
        .select(F.col("lang").alias("best_lang"))
    )
    return (
        keyed.crossJoin(F.broadcast(best))
        .select(
            "lang", "n",
            F.round("dp_score", 6).alias("dp_score"),
            (F.col("lang") == F.col("best_lang")).alias("chosen"),
        )
        .orderBy(F.desc("dp_score"), "lang")
    )


# ---------------------------------------------------------------------------
# round-8: DP quantile via the exponential mechanism over value bins
# ---------------------------------------------------------------------------

_DPQ_EPS = 1.0
_DPQ_LO, _DPQ_HI, _DPQ_BINS = -1000.0, 10000.0, 20  # acctbal domain, public


@query(
    "privacy_dp_quantile",
    f"""
    WITH src AS (SELECT c_acctbal AS x FROM customer),
    n AS (SELECT COUNT(*) AS nn FROM src),
    binned AS (
      SELECT LEAST(CAST(FLOOR((x - ({_DPQ_LO})) / {(_DPQ_HI - _DPQ_LO) / _DPQ_BINS})
                        AS INT), {_DPQ_BINS - 1}) AS bin,
             COUNT(*) AS c
      FROM src GROUP BY 1
    ),
    bins AS (SELECT UNNEST(range({_DPQ_BINS})) AS bin),
    cum AS (
      SELECT b.bin,
             COALESCE(SUM(x.c) FILTER (WHERE x.bin <= b.bin), 0) AS cum_count
      FROM bins b LEFT JOIN binned x ON x.bin <= b.bin
      GROUP BY b.bin
    ),
    keyed AS (
      SELECT bin, cum_count,
             -{_DPQ_EPS} * ABS(2 * cum_count - nn) / 4.0
               - LN(-LN((('0x' || SUBSTRING(md5('dpq|' || bin), 1, 7))::BIGINT
                         + 1) / 268435457.0)) AS dp_score
      FROM cum, n
    )
    SELECT bin,
           CAST(ROUND({_DPQ_LO} + bin * {(_DPQ_HI - _DPQ_LO) / _DPQ_BINS}, 2)
                AS DOUBLE) AS bin_lo,
           CAST(ROUND({_DPQ_LO} + (bin + 1) * {(_DPQ_HI - _DPQ_LO) / _DPQ_BINS}, 2)
                AS DOUBLE) AS bin_hi,
           cum_count,
           ROUND(dp_score, 6) AS dp_score,
           bin = (SELECT bin FROM keyed ORDER BY dp_score DESC, bin LIMIT 1)
             AS chosen
    FROM keyed ORDER BY bin
    """,
)
def privacy_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP MEDIAN of account balance via the exponential mechanism over
    a public 20-bin grid: utility u(bin) = −|cum_count(bin) − n/2|
    (sensitivity 1 — one person moves any cumulative count by one), the
    Gumbel-max formulation with the house content-hash PRF draw. The
    quantile counterpart of [[privacy_exponential_mechanism]] (categorical
    argmax) — DP quantiles are what a private data card publishes where
    [[profile_numeric_columns]] would leak exact order statistics.

    Exactness: cumulative counts are exact integers (per-bin counts
    reduced over the ≤20-bin grid); |2·cum − n| keeps the utility
    integral (no n/2 fraction); the Gumbel draw hashes only the public
    bin id. Plan: one binned groupBy (map-side combinable), a ≤20-row
    cumulative reduction, TakeOrdered(1) winner broadcast back.
    """
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        hash_hex,
    )
    from databricks_end_to_end_lakeflow_project_spark.session import persist_once

    width = (_DPQ_HI - _DPQ_LO) / _DPQ_BINS
    cust = read_table(spark, sf_dir, "customer")
    n = cust.agg(F.count(F.lit(1)).alias("nn"))
    binned = cust.select(
        F.least(
            F.floor((F.col("c_acctbal") - _DPQ_LO) / width).cast("int"),
            F.lit(_DPQ_BINS - 1),
        ).alias("bin")
    ).groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    bins = spark.range(_DPQ_BINS).select(F.col("id").cast("int").alias("bin"))
    cum = (
        bins.join(
            binned.select(F.col("bin").alias("xb"), "c"),
            F.col("xb") <= F.col("bin"),
            "left",
        )
        .groupBy("bin")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("cum_count"))
    )
    u = (F.conv(hash_hex(F.concat(F.lit("dpq|"), F.col("bin")), 7), 16, 10).cast(
        "double"
    ) + 1) / F.lit(float(16**7) + 1)
    keyed = persist_once(
        cum.crossJoin(F.broadcast(n)).select(
            "bin",
            "cum_count",
            (
                -_DPQ_EPS * F.abs(2 * F.col("cum_count") - F.col("nn")) / 4.0
                - F.log(-F.log(u))
            ).alias("dp_score"),
        )
    )
    best = (
        keyed.orderBy(F.desc("dp_score"), "bin")
        .limit(1)
        .select(F.col("bin").alias("best_bin"))
    )
    return (
        keyed.crossJoin(F.broadcast(best))
        .select(
            "bin",
            F.round(F.lit(_DPQ_LO) + F.col("bin") * width, 2).alias("bin_lo"),
            F.round(F.lit(_DPQ_LO) + (F.col("bin") + 1) * width, 2).alias("bin_hi"),
            "cum_count",
            F.round("dp_score", 6).alias("dp_score"),
            (F.col("bin") == F.col("best_bin")).alias("chosen"),
        )
        .orderBy("bin")
    )
