"""Round-6 session-2 operator pins: properties the DuckDB oracles can't
express (bounds, cross-operator consistency, pure-Python replicas)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark import registry
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


def _q(name):
    return registry.all_queries()[name]


def test_snm_candidate_volume_is_linear(spark):
    """SNM's contract: at most w candidates per record — candidate volume
    is w·n by construction, no bucket-skew blowup possible."""
    from databricks_end_to_end_lakeflow_project_spark.operators.dedup import (
        _SNM_WINDOW,
    )

    n_docs = read_table(spark, SF, "documents").count()
    pairs = _q("dedup_sorted_neighborhood_pairs")(spark, SF)
    assert pairs.count() <= _SNM_WINDOW * n_docs


def test_random_walks_follow_edges(spark):
    """Every consecutive (step t → t+1) pair in the walk corpus must be a
    real edge, and every walk must have exactly LEN+1 rows."""
    from databricks_end_to_end_lakeflow_project_spark.operators.graph import (
        _WALK_LEN,
        _WALK_PER_SEED,
        cooccurrence_edges,
    )

    walks = _q("graph_random_walks")(spark, SF).collect()
    li = read_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    edges = {
        (r["src"], r["dst"]) for r in cooccurrence_edges(li).collect()
    }
    by_walk: dict = {}
    for r in walks:
        by_walk.setdefault((r["seed"], r["walk_id"]), []).append(
            (r["step"], r["node"])
        )
    for (seed, _wid), steps in by_walk.items():
        steps.sort()
        assert len(steps) == _WALK_LEN + 1
        assert steps[0] == (0, seed)
        for (s0, a), (s1, b) in zip(steps, steps[1:]):
            assert s1 == s0 + 1
            assert (a, b) in edges, f"walk hop {a}->{b} is not an edge"
    n_seeds = len({k[0] for k in by_walk})
    assert len(by_walk) == n_seeds * _WALK_PER_SEED


def test_zorder_audit_bounds_both_dims(spark):
    """Z-order must bound the custkey spans the linear layout leaves at
    full range; linear stays at least as tight on its own sort dim."""
    rows = {r["layout"]: r for r in _q("sink_zorder_layout_audit")(spark, SF).collect()}
    lin, zor = rows["linear"], rows["zorder"]
    # total skipping power: linear leaves every file at the FULL custkey
    # range (sum = 256·files); z-order must cut that total sharply. A few
    # individual z files still straddle major quadrant transitions of the
    # curve (row-balanced cuts ≠ quadrant cuts), so assert on sums, not
    # max — the same property real OPTIMIZE ZORDER has.
    assert lin["sum_cust_span"] == 256 * lin["n_files"]
    assert zor["sum_cust_span"] < 0.6 * lin["sum_cust_span"]
    assert lin["sum_date_span"] < zor["sum_date_span"]


def test_spearman_matches_python_replica(spark):
    rows = (
        read_table(spark, SF_SMOKE, "customer")
        .join(
            read_table(spark, SF_SMOKE, "orders"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"))
        .collect()
    )
    xs = [float(r["c_acctbal"]) for r in rows]
    ys = [float(r["y"]) for r in rows]

    def doubled_ranks(vals):
        out = []
        for v in vals:
            out.append(2 * sum(1 for u in vals if u < v) + sum(1 for u in vals if u == v) + 1)
        return out

    rx, ry = doubled_ranks(xs), doubled_ranks(ys)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    rho = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    got = _q("stats_spearman_corr")(spark, SF_SMOKE).collect()[0]
    assert got["n"] == n
    assert got["spearman_rho"] == pytest.approx(rho, abs=1e-6)


def test_deletion_vectors_conservation(spark):
    """Visible + DV entries must partition the table exactly, and the
    data files must be byte-untouched."""
    row = _q("cdc_deletion_vectors")(spark, SF).collect()[0]
    n_total = read_table(spark, SF, "customer").count()
    assert row["n_visible"] + row["n_dv_entries"] == n_total
    assert row["files_untouched"] is True


def test_hill_alpha_matches_python_replica(spark):
    acts = sorted(
        (
            (r["cnt"], r["user_id"])
            for r in read_table(spark, SF_SMOKE, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )
    got = _q("events_hill_tail_index")(spark, SF_SMOKE).collect()[0]
    k = got["k"]
    assert k == min(100, len(acts) - 1)
    x_ref = acts[k][0]
    alpha = k / (sum(math.log(c) for c, _u in acts[:k]) - k * math.log(x_ref))
    assert got["x_ref"] == x_ref
    assert got["hill_alpha"] == pytest.approx(alpha, abs=1e-3)


def test_interval_overlap_equals_naive_join(spark):
    """The binned owner-bucket plan must equal the naive residual-predicate
    join row-for-row."""
    from databricks_end_to_end_lakeflow_project_spark.operators.relational import (
        _IVL_SUPP_MAX,
    )

    li = (
        read_table(spark, SF_SMOKE, "lineitem")
        .filter(F.col("l_suppkey") <= _IVL_SUPP_MAX)
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("key"),
            F.col("l_suppkey").alias("sk"),
            F.col("l_shipdate").cast("date").alias("ship"),
            F.expr(
                "date_add(CAST(l_shipdate AS DATE), CAST(l_quantity AS INT) % 21 + 7)"
            ).alias("rcpt"),
        )
    )
    a = li.select(
        F.col("key").alias("ka"), "sk",
        F.col("ship").alias("sa"), F.col("rcpt").alias("ra"),
    )
    b = li.select(
        F.col("key").alias("kb"), "sk",
        F.col("ship").alias("sb"), F.col("rcpt").alias("rb"),
    )
    naive = (
        a.join(b, "sk")
        .filter(
            (F.col("ka") < F.col("kb"))
            & (F.col("sa") <= F.col("rb"))
            & (F.col("sb") <= F.col("ra"))
        )
        .groupBy(F.col("sk").alias("suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n_overlap_pairs"),
            F.sum(
                F.datediff(F.least("ra", "rb"), F.greatest("sa", "sb")) + 1
            ).alias("sum_overlap_days"),
        )
        .orderBy("suppkey")
        .collect()
    )
    got = _q("join_interval_overlap")(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in naive]


def test_rake_phrases_contain_no_stopwords(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.textops import (
        _RAKE_STOPWORDS,
    )

    for r in _q("text_rake_keywords")(spark, SF).collect():
        assert not set(r["phrase"].split()) & set(_RAKE_STOPWORDS)
        assert r["score_x1e6"] > 0


def test_chao1_dominates_observed_vocab(spark):
    for r in _q("text_vocab_coverage_chao1")(spark, SF).collect():
        assert r["chao1_richness"] >= r["vocab"]
        assert 0.0 <= r["gt_unseen_mass"] <= 1.0


def test_loo_influence_sign_tracks_source_mean(spark):
    rows = _q("curation_loo_source_influence")(spark, SF).collect()
    n_all = sum(r["n_docs"] for r in rows)
    mean_all = sum(r["mean_chars"] * r["n_docs"] for r in rows) / n_all
    for r in rows:
        if r["mean_chars"] > mean_all:
            assert r["influence"] > 0
        elif r["mean_chars"] < mean_all:
            assert r["influence"] < 0


def test_waterfill_budget_and_maximality(spark):
    """Kept total must fit the budget, and level+1 must overflow it —
    the water level is the MAXIMAL feasible integer ceiling."""
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        _WF_BUDGET_SHARE,
    )

    rows = _q("sample_waterfill_source_caps")(spark, SF).collect()
    total = sum(r["n_docs"] for r in rows)
    budget = int(_WF_BUDGET_SHARE * total)
    level = rows[0]["water_level"]
    kept = sum(min(r["n_docs"], level) for r in rows)
    kept_next = sum(min(r["n_docs"], level + 1) for r in rows)
    assert kept == sum(r["n_kept"] for r in rows)
    assert kept <= budget < kept_next
    for r in rows:  # sources under the level are untouched
        if r["n_docs"] <= level:
            assert r["n_kept"] == r["n_docs"]
