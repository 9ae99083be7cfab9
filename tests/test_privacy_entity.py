"""Invariants for the round-5 operator additions: privacy audits
(operators/privacy.py), entity resolution (operators/entity.py), label
propagation, Holt smoothing, CUPED, and BPE merge counting."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.entity import (
    er_golden_record,
    er_match_quality,
)
from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
    ts_holt_linear,
)
from databricks_end_to_end_lakeflow_project_spark.operators.graph import (
    graph_label_propagation,
)
from databricks_end_to_end_lakeflow_project_spark.operators.privacy import (
    privacy_dp_noisy_counts,
    privacy_generalization_ladder,
    privacy_k_anonymity,
    privacy_l_diversity,
)
from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
    stats_ab_cuped,
)
from databricks_end_to_end_lakeflow_project_spark.operators.textops import (
    text_bpe_top_merges,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- privacy


def test_k_anonymity_monotone_in_k(spark):
    rows = {r["k"]: r for r in privacy_k_anonymity(spark, SF).collect()}
    ks = sorted(rows)
    for lo, hi in zip(ks, ks[1:]):
        # larger k can only flag more groups / more rows
        assert rows[lo]["groups_below_k"] <= rows[hi]["groups_below_k"]
        assert rows[lo]["rows_at_risk"] <= rows[hi]["rows_at_risk"]
    for r in rows.values():
        assert 0.0 <= r["pct_at_risk"] <= 100.0


def test_generalization_ladder_monotone(spark):
    """Each ladder level is a strict coarsening of the previous partition,
    so min group size is nondecreasing and rows-at-risk nonincreasing."""
    rows = sorted(
        privacy_generalization_ladder(spark, SF).collect(),
        key=lambda r: r["level"],
    )
    assert [r["level"] for r in rows] == [0, 1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b["min_group_size"] >= a["min_group_size"]
        assert b["rows_at_risk_k5"] <= a["rows_at_risk_k5"]
        assert b["n_groups"] <= a["n_groups"]


def test_l_diversity_threshold(spark):
    for r in privacy_l_diversity(spark, SF).collect():
        assert r["l_distinct"] < 3
        assert r["group_size"] >= r["l_distinct"] >= 1


def test_dp_noise_bounded_and_nonzero(spark):
    """Laplace(b=1) noise from a 31-bit uniform is bounded by
    |ln(1/2^31)| ≈ 21.5; it is exactly zero only at u=0.5 (measure-zero
    for the LCG on integer keys)."""
    truth = dict(
        duckdb.sql(
            f"SELECT c_nationkey, COUNT(*) FROM '{SF}/customer.parquet' GROUP BY 1"
        ).fetchall()
    )
    noised = 0
    for r in privacy_dp_noisy_counts(spark, SF).collect():
        true_n = truth[r["nation"]]
        assert abs(r["noisy_count"] - true_n) <= 22.0
        if abs(r["noisy_count"] - true_n) > 1e-9:
            noised += 1
    assert noised == len(truth)  # every group actually perturbed


# ----------------------------------------------------------------- graph


def test_label_propagation_deterministic_and_bounded(spark):
    a = graph_label_propagation(spark, SF).collect()
    b = graph_label_propagation(spark, SF).collect()
    assert a == b
    sizes = [r["n_members"] for r in a]
    assert sizes == sorted(sizes, reverse=True)
    assert all(s >= 1 for s in sizes)
    labels = [r["community"] for r in a]
    assert len(set(labels)) == len(labels)


# ------------------------------------------------------------ timeseries


def test_holt_matches_python_reference_fold(spark):
    daily = duckdb.sql(
        f"""
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
        FROM '{SF}/events.parquet' GROUP BY ALL ORDER BY event_type, d
        """
    ).fetchall()
    series: dict[str, list[float]] = {}
    for et, _, y in daily:
        series.setdefault(et, []).append(y)
    expect = {}
    for et, ys in series.items():
        lvl, tr = ys[0], 0.0
        for y in ys[1:]:
            new = 0.5 * y + 0.5 * (lvl + tr)
            tr = 0.3 * (new - lvl) + 0.7 * tr
            lvl = new
        expect[et] = (round(lvl, 4), round(tr, 4))
    for r in ts_holt_linear(spark, SF).collect():
        lvl, tr = expect[r["event_type"]]
        assert r["level"] == lvl and r["trend"] == tr
        # forecast rounds the UNROUNDED l+3b; compare against the rounded
        # reference within the induced tolerance
        assert abs(r["forecast_h3"] - (lvl + 3 * tr)) < 0.001


# ----------------------------------------------------------------- stats


def test_cuped_reduces_pooled_variance(spark):
    """θ = cov/var pooled is the OLS minimizer, so the POOLED variance of
    the adjusted metric cannot exceed the raw one; per-variant ratios are
    reported by the query and must be positive and finite."""
    rows = stats_ab_cuped(spark, SF).collect()
    assert {r["variant"] for r in rows} == {0, 1}
    for r in rows:
        assert r["n_users"] > 0
        assert r["var_ratio"] is not None and r["var_ratio"] > 0.0
    n_users = sum(r["n_users"] for r in rows)
    distinct = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert n_users == distinct


# ------------------------------------------------------------------ text


def test_bpe_top_merge_matches_reference(spark):
    ref = duckdb.sql(
        f"""
        WITH wf AS (
          SELECT w AS word, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split(trim(text), ' ')) AS w
            FROM '{SF}/documents.parquet') WHERE LENGTH(w) >= 2 GROUP BY w
        )
        SELECT substr(word, CAST(i AS INT), 2) AS pair, SUM(cnt) AS c
        FROM (SELECT word, cnt, unnest(generate_series(1, LENGTH(word)-1)) AS i
              FROM wf)
        GROUP BY pair ORDER BY c DESC, pair LIMIT 1
        """
    ).fetchone()
    got = text_bpe_top_merges(spark, SF).collect()
    assert (got[0]["pair"], got[0]["pair_count"]) == (ref[0], ref[1])
    assert all(len(r["pair"]) == 2 for r in got)
    counts = [r["pair_count"] for r in got]
    assert counts == sorted(counts, reverse=True)


# -------------------------------------------------------------------- er


def test_er_recall_perfect_precision_high(spark):
    """The true owner is always at edit distance exactly 1 inside its
    block, so every dirty record matches (recall 1.0); precision can dip
    below 1 only on single-digit-difference name ties."""
    r = er_match_quality(spark, SF).collect()[0]
    assert r["n_matched"] == r["n_dirty"]
    assert r["match_recall"] == 1.0
    assert r["match_precision"] >= 0.8
    assert r["n_correct"] <= r["n_matched"]


def test_er_golden_record_invariants(spark):
    rows = er_golden_record(spark, SF).collect()
    assert rows, "expected resolved entities"
    for r in rows:
        assert 1 <= r["match_dist"] <= 2
        assert r["n_sources"] == 2
        assert r["golden_name"].startswith("Customer#")


def test_er_capped_split_parity(spark):
    """The size-aware hot-block split is pure replication: forcing the
    cap to 1 (every multi-row block splits) must leave the candidate
    pair set bit-identical to the effectively-uncapped run."""
    from databricks_end_to_end_lakeflow_project_spark.operators.entity import (
        _capped_candidates,
        _dirty_feed,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    cust = read_table(spark, SF, "customer")
    dirty = _dirty_feed(cust)

    def pairs(cap):
        return {
            (r["true_key"], r["c_custkey"], r["dist"])
            for r in _capped_candidates(dirty, cust, max_block=cap)
            .select("true_key", "c_custkey", "dist")
            .collect()
        }

    uncapped = pairs(10**9)
    assert uncapped, "expected candidate pairs"
    assert pairs(1) == uncapped


def test_er_variant_blocks_bounded(spark):
    """Wildcard-variant blocks are bounded by the digit alphabet: no
    clean variant block can exceed 10 rows REGARDLESS of table size —
    the property that makes ER candidates O(N) at any scale. Checked on
    the largest local table (sf0.01, 1500 customers)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.entity import (
        _variants,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    cust = read_table(spark, "/root/testdata/sf0.01", "customer")
    sizes = (
        cust.select(
            F.col("c_nationkey").alias("bk_nation"),
            F.explode(_variants("c_name")).alias("v"),
        )
        .groupBy("bk_nation", "v.wpos", "v.vkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    assert sizes <= 10


def test_er_candidates_linear_in_dirty_rows(spark):
    """Candidate volume per dirty row is bounded by the block bound
    (≤ 10 per matching variant band), so total candidates are O(N)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.entity import (
        _capped_candidates,
        _dirty_feed,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    cust = read_table(spark, "/root/testdata/sf0.01", "customer")
    dirty = _dirty_feed(cust)
    n_dirty = dirty.count()
    n_cand = _capped_candidates(dirty, cust).count()
    assert n_cand <= 10 * n_dirty


# ------------------------------------------------- round-5 batch 2


def test_kmeans_partition_and_nonneg_sse(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.similarity import (
        sim_kmeans_lloyd,
    )

    rows = sim_kmeans_lloyd(spark, SF).collect()
    n_vecs = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r["n_members"] for r in rows) == n_vecs  # exact partition
    assert all(0 <= r["cluster"] <= 3 for r in rows)
    assert all(r["sse_q"] >= 0 for r in rows)
    assert rows == sim_kmeans_lloyd(spark, SF).collect()  # deterministic


def test_span_corruption_roundtrip(spark):
    """Splicing each target span back over its sentinel must reconstruct
    the original document exactly — the invariant that makes the pair
    usable as a denoising objective."""
    import re

    from databricks_end_to_end_lakeflow_project_spark.operators.textops import (
        text_span_corruption_pairs,
    )

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, trim(text) FROM '{SF}/documents.parquet' "
            f"WHERE doc_id % 10 = 0"
        ).fetchall()
    )
    rows = text_span_corruption_pairs(spark, SF).collect()
    assert len(rows) == len(docs)
    for r in rows[:20]:
        spans: dict[str, list[str]] = {}
        cur = None
        for tok in r["target_text"].split(" ") if r["target_text"] else []:
            if re.fullmatch(r"<extra_id_\d+>", tok):
                cur = tok
                spans[cur] = []
            else:
                spans[cur].append(tok)
        out = []
        for tok in r["input_text"].split(" "):
            if re.fullmatch(r"<extra_id_\d+>", tok):
                out.extend(spans[tok])
            else:
                out.append(tok)
        assert " ".join(out) == docs[r["doc_id"]]
        assert r["n_spans"] == len(spans)
        assert r["n_masked"] == sum(len(v) for v in spans.values())


def test_contract_check_clean_on_tpch(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.curation import (
        monitor_data_contract_check,
    )

    rows = {r["rule"]: r for r in monitor_data_contract_check(spark, SF).collect()}
    assert set(rows) == {
        "custkey_fk_resolves",
        "orderdate_in_window",
        "priority_format",
        "status_enum",
        "totalprice_positive",
    }
    # synthetic TPC-H is contract-clean; the point is the zero IS reported
    assert all(r["n_violations"] == 0 for r in rows.values())
    assert all(r["pct_violating"] == 0.0 for r in rows.values())


def test_bloom_join_no_false_negatives(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.relational import (
        join_bloom_semi_reduction,
    )

    r = join_bloom_semi_reduction(spark, SF).collect()[0]
    assert r["n_pass_bloom"] >= r["n_true_match"]  # Bloom never drops a match
    assert r["n_false_pos"] == r["n_pass_bloom"] - r["n_true_match"]
    assert 0.0 <= r["pct_fact_skipped"] <= 100.0


# ------------------------------------------------- round-5 batch 3


def test_asof_tolerance_subset_of_backward(spark):
    """Tolerance nulls matches but never invents them: every tolerated
    match must equal the unrestricted backward match, and every nulled
    row must be >1h stale there."""
    from databricks_end_to_end_lakeflow_project_spark.operators.asof import (
        join_asof_backward,
        join_asof_tolerance,
    )

    base = {r["event_id"]: r for r in join_asof_backward(spark, SF).collect()}
    tol = join_asof_tolerance(spark, SF).collect()
    assert len(tol) == len(base)
    for r in tol:
        b = base[r["event_id"]]
        if r["within_tolerance"]:
            assert r["click_ts"] == b["click_ts"]
            assert r["click_value"] == b["click_value"]
            assert (r["ts"] - r["click_ts"]).total_seconds() <= 3600
        else:
            assert r["click_ts"] is None and r["click_value"] is None
            if b["click_ts"] is not None:
                assert (r["ts"] - b["click_ts"]).total_seconds() > 3600


def test_km_survival_monotone_and_risk_consistent(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        events_survival_km,
    )

    rows = events_survival_km(spark, SF).collect()
    assert rows, "expected event times"
    last_s = 1.0
    for r in rows:
        assert r["n_events"] >= 1
        assert r["n_at_risk"] >= r["n_events"]
        assert r["survival"] <= last_s + 1e-9  # product-limit is nonincreasing
        last_s = r["survival"]
    risks = [r["n_at_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_kcenter_radius_curve_nonincreasing(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        sample_kcenter_coreset,
    )

    rows = sample_kcenter_coreset(spark, SF).collect()
    assert [r["sel_round"] for r in rows] == list(range(8))
    assert len({r["vec_id"] for r in rows}) == 8  # all distinct
    dists = [r["mind_q"] for r in rows[1:]]
    assert dists == sorted(dists, reverse=True)  # farthest-point property
    assert all(d > 0 for d in dists)


def test_bpe_round2_consumes_winner(spark):
    """Greedy left-to-right merging consumes every adjacency of the
    winning pair, so its 2-char string cannot reappear as a round-2
    symbol pair; round-2 candidates include multi-char merges."""
    from databricks_end_to_end_lakeflow_project_spark.operators.textops import (
        text_bpe_apply_merge_round2,
        text_bpe_top_merges,
    )

    winner = text_bpe_top_merges(spark, SF).collect()[0]["pair"]
    r2 = text_bpe_apply_merge_round2(spark, SF).collect()
    assert winner not in {r["pair"] for r in r2}
    assert all(len(r["pair"]) >= 2 for r in r2)
    counts = [r["pair_count"] for r in r2]
    assert counts == sorted(counts, reverse=True)


def test_mann_whitney_matches_python_reference(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        stats_mann_whitney_u,
    )

    rows = duckdb.sql(
        f"SELECT event_id, user_id % 2, value FROM '{SF}/events.parquet' "
        f"WHERE event_type = 'purchase'"
    ).fetchall()
    ordered = sorted(rows, key=lambda r: (r[2], r[0]))
    # midranks
    from collections import defaultdict

    pos = defaultdict(list)
    for i, r in enumerate(ordered, start=1):
        pos[r[2]].append(i)
    mid = {v: sum(ps) / len(ps) for v, ps in pos.items()}
    n1 = sum(1 for r in rows if r[1] == 0)
    n2 = len(rows) - n1
    r1 = sum(mid[r[2]] for r in rows if r[1] == 0)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    tcorr = sum(len(ps) ** 3 - len(ps) for ps in pos.values())
    var = n1 * n2 / 12.0 * ((n + 1) - tcorr / (1.0 * n * (n - 1)))
    z = round((u1 - n1 * n2 / 2.0) / var**0.5, 4)
    got = stats_mann_whitney_u(spark, SF).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert abs(got["u1"] - u1) < 1e-6
    assert got["z_score"] == z


def test_pca_power_iteration_matches_python_replica(spark):
    """Exact replica of the fixed-point power iteration (Python ints are
    arbitrary precision, so the DECIMAL accumulations are exact; the norm
    fold runs in the same dim order) must reproduce every quantized
    component."""
    from databricks_end_to_end_lakeflow_project_spark.operators.similarity import (
        sim_pca_power_iteration,
    )

    vecs = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    xq = [[int(round(float(x) * 1000000)) for x in emb] for _, emb in vecs]
    dim = len(xq[0])
    v = [1000000] + [0] * (dim - 1)
    for _ in range(2):
        dots = [sum(row[d] * v[d] for d in range(dim)) for row in xq]
        nsum = [
            float(sum(row[d] * dot for row, dot in zip(xq, dots)))
            for d in range(dim)
        ]
        acc = 0.0
        for nd in nsum:  # dim-ordered sequential fold, like both engines
            acc = acc + nd * nd
        nrm = acc**0.5
        v = [int(round(nd / nrm * 1000000)) for nd in nsum]
    got = sim_pca_power_iteration(spark, SF).collect()
    assert [r["v_q"] for r in got] == v
    norm2 = sum((c / 1e6) ** 2 for c in v)
    assert abs(norm2 - 1.0) < 1e-3  # unit direction up to grid quantization


def test_did_identity_and_z_consistency(spark):
    """The DiD estimate must equal (treated post−pre) − (control
    post−pre) computed from the reported cell means (within the 4dp
    rounding the cells carry)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        stats_did_estimator,
    )

    r = stats_did_estimator(spark, SF).collect()[0]
    approx = (r["treated_post"] - r["treated_pre"]) - (
        r["control_post"] - r["control_pre"]
    )
    assert abs(r["did_estimate"] - approx) < 2e-4  # cell means are 4dp-rounded
    assert r["n_treated"] + r["n_control"] > 0
    assert r["did_z"] is not None


def test_randomized_response_debias(spark):
    """The debiased share must invert the p=0.75 mechanism exactly:
    raw = truth*p + (1-truth)*(1-p) per respondent, so
    (raw-0.25)/0.5 recovers the truth share up to the realized flips."""
    from databricks_end_to_end_lakeflow_project_spark.operators.privacy import (
        privacy_randomized_response,
    )

    r = privacy_randomized_response(spark, SF).collect()[0]
    assert r["n_respondents"] > 0
    assert 0 <= r["n_reported_yes"] <= r["n_respondents"]
    assert abs((r["raw_share"] - 0.25) / 0.5 - r["debiased_share"]) < 1e-5
    # the mechanism must actually flip someone: reported yes count differs
    # from the exact truth count
    truth_yes = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/customer.parquet' WHERE c_acctbal < 0"
    ).fetchone()[0]
    assert r["n_reported_yes"] != truth_yes


def test_changepoint_split_reduces_sse(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        ts_changepoint_single_split,
    )

    rows = ts_changepoint_single_split(spark, SF).collect()
    assert len(rows) == 5  # one per event type
    for r in rows:
        assert r["sse_best_split"] <= r["sse_unsplit"] + 1e-6
        assert 0.0 <= r["variance_explained"] <= 1.0


def test_kfold_partition_complete_and_balanced(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        sample_stratified_kfold,
    )

    rows = sample_stratified_kfold(spark, SF).collect()
    total = sum(r["n_rows"] for r in rows)
    n_cust = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/customer.parquet'"
    ).fetchone()[0]
    assert total == n_cust  # every row assigned exactly once
    assert {r["fold"] for r in rows} <= {0, 1, 2, 3, 4}
    for r in rows:
        assert 0.0 < r["balance_ratio"] < 5.0


def test_jaccard_linkpred_bounds_and_shape(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.graph import (
        graph_jaccard_link_prediction,
    )

    rows = graph_jaccard_link_prediction(spark, SF).collect()
    assert rows
    per_anchor: dict[int, int] = {}
    for r in rows:
        assert 0 <= r["jaccard_q"] <= 1_000_000_000  # J in [0,1] on the grid
        per_anchor[r["part_a"]] = per_anchor.get(r["part_a"], 0) + 1
    assert all(v <= 2 for v in per_anchor.values())  # top-k per anchor


def test_power_analysis_monotone_in_lift(spark):
    """Bigger detectable lifts need fewer users; n scales ~1/lift²."""
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        stats_power_analysis,
    )

    rows = sorted(
        stats_power_analysis(spark, SF).collect(), key=lambda r: r["lift_pct"]
    )
    assert [r["lift_pct"] for r in rows] == [1, 2, 5, 10]
    ns = [r["n_per_arm"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(n >= 1 for n in ns)
    # quadratic scaling within ceil rounding: n(1%) ≈ 4 n(2%)
    assert abs(ns[0] / ns[1] - 4.0) < 0.1
