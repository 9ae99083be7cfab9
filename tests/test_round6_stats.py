"""Invariants + independent replicas for the round-6 statistics and
eval additions (calibration ECE, mutual information, MAD outliers,
BH-FDR, SPRT, SRM, NDCG/MRR/MAP, k-fold target encoding)."""

from __future__ import annotations

import math

import numpy as np

from databricks_end_to_end_lakeflow_project_spark.operators.retrieval import (
    retrieval_ndcg_mrr_eval,
)
from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
    sample_target_encode_kfold,
)
from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
    stats_calibration_ece,
    stats_fdr_bh,
    stats_mad_outliers,
    stats_mutual_information,
    stats_sprt_boundary,
    stats_srm_check,
)

SF = "/root/testdata/sf0.001"


def test_ece_bins_and_identity(spark):
    rows = stats_calibration_ece(spark, SF).collect()
    assert [r["bin"] for r in rows] == sorted({r["bin"] for r in rows})
    assert all(0 <= r["bin"] <= 9 for r in rows)
    n = sum(r["n"] for r in rows)
    manual = sum(r["n"] / n * r["abs_gap"] for r in rows)
    ece = rows[0]["ece"]
    assert all(r["ece"] == ece for r in rows)
    assert abs(manual - ece) < 1e-4
    assert 0 <= ece <= 1


def test_mutual_information_bounds(spark):
    r = stats_mutual_information(spark, SF).collect()[0]
    assert r["mi_nats"] >= -1e-9
    assert -1e-9 <= r["nmi"] <= 1 + 1e-9
    # MI cannot exceed either marginal entropy
    assert r["mi_nats"] <= min(r["h_x"], r["h_y"]) + 1e-6
    assert r["h_x"] <= math.log(25) + 1e-6  # ≤ ln(#nations)


def test_mad_outliers_vs_numpy(spark):
    import duckdb

    rows = {r["grp"]: r for r in stats_mad_outliers(spark, SF).collect()}
    df = duckdb.connect().execute(
        f"SELECT l_returnflag, l_extendedprice FROM '{SF}/lineitem.parquet'"
    ).df()
    for grp, sub in df.groupby("l_returnflag"):
        x = sub["l_extendedprice"].to_numpy(dtype=float)
        med = np.quantile(x, 0.5, method="linear")
        mad = np.quantile(np.abs(x - med), 0.5, method="linear")
        n_out = int((np.abs(x - med) > 3 * 1.4826 * mad).sum())
        r = rows[grp]
        assert abs(r["med"] - round(med, 2)) < 0.02
        assert abs(r["mad"] - round(mad, 2)) < 0.02
        assert r["n_outliers"] == n_out
        assert r["n"] == len(x)


def test_fdr_bh_stepup_properties(spark):
    rows = stats_fdr_bh(spark, SF).collect()
    m = len(rows)
    assert m > 0
    prev = 0.0
    for r in rows:  # ordered by rank
        assert r["p_adj"] >= r["p"] - 1e-9  # adjustment never shrinks p
        assert r["p_adj"] >= prev - 1e-9  # monotone non-decreasing in rank
        prev = r["p_adj"]
        assert (r["rejected_fdr05"] == 1) == (r["p_adj"] <= 0.05)
        assert 0 <= r["p"] <= 1 and 0 <= r["p_adj"] <= 1


def test_sprt_vs_python_replica(spark):
    import duckdb

    r = stats_sprt_boundary(spark, SF).collect()[0]
    df = duckdb.connect().execute(
        f"""SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS x
            FROM '{SF}/orders.parquet' ORDER BY o_orderdate, o_orderkey"""
    ).df()
    c1, c0 = math.log(0.6 / 0.5), math.log(0.4 / 0.5)
    up, lo = math.log(0.8 / 0.05), math.log(0.2 / 0.95)
    llr, t1, t0 = 0.0, None, None
    ones = 0
    for t, x in enumerate(df["x"].to_numpy(), start=1):
        ones += int(x)
        llr = ones * c1 + (t - ones) * c0
        if t1 is None and llr >= up:
            t1 = t
        if t0 is None and llr <= lo:
            t0 = t
    assert r["n"] == len(df)
    assert r["t_accept_h1"] == t1
    assert r["t_accept_h0"] == t0
    expect = (
        "accept_h1"
        if t1 is not None and (t0 is None or t1 < t0)
        else ("accept_h0" if t0 is not None else "continue")
    )
    assert r["decision"] == expect


def test_srm_consistency(spark):
    r = stats_srm_check(spark, SF).collect()[0]
    assert r["nt"] + r["nc"] == r["n"]
    assert r["chi2"] >= 0
    assert (r["srm_alarm"] == 1) == (r["chi2"] > 10.83)
    assert 0 <= r["p_bound"] <= 1


def test_ndcg_mrr_map_bounds_and_replica(spark):
    import duckdb

    rows = {r["query_id"]: r for r in retrieval_ndcg_mrr_eval(spark, SF).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    for r in rows.values():
        assert 0 <= r["ndcg_at_10"] <= 1 + 1e-9
        assert r["mrr_at_10"] == 0 or 0.1 - 1e-9 <= r["mrr_at_10"] <= 1
        assert 0 <= r["ap_at_10"] <= 1 + 1e-9

    # independent numpy replica for query 0
    con = duckdb.connect()
    em = con.execute(
        f"SELECT vec_id, embedding, label FROM '{SF}/embeddings.parquet'"
    ).df()
    q = em[em.vec_id == 0].iloc[0]
    cand = em[em.vec_id >= 5].copy()
    qv = np.asarray(q["embedding"], dtype=float)
    mats = np.array([np.asarray(v, dtype=float) for v in cand["embedding"]])
    scores = np.round(
        mats @ qv / (np.linalg.norm(mats, axis=1) * np.linalg.norm(qv)), 6
    )
    rel = np.where(
        cand["label"].to_numpy() == q["label"],
        2,
        np.where(np.abs(cand["label"].to_numpy() - q["label"]) == 1, 1, 0),
    )
    order = np.lexsort((cand["vec_id"].to_numpy(), -scores))
    top = rel[order][:10]
    dcg = sum((2.0**g - 1) / math.log2(i + 2) for i, g in enumerate(top))
    ideal = np.sort(rel)[::-1][:10]
    idcg = sum((2.0**g - 1) / math.log2(i + 2) for i, g in enumerate(ideal))
    assert abs(rows[0]["ndcg_at_10"] - dcg / idcg) < 1e-4


def test_target_encoding_out_of_fold(spark):
    rows = sample_target_encode_kfold(spark, SF).collect()
    assert rows
    prior = rows[0]["global_prior"]
    for r in rows:
        assert 0 <= r["target_enc"] <= 1
        assert r["n_oof"] >= 0
        # smoothing identity: enc·(n_oof+10) − 10·prior == integer Σy_oof
        y_oof = r["target_enc"] * (r["n_oof"] + 10) - 10 * prior
        assert abs(y_oof - round(y_oof)) < 5e-3


def test_qini_deciles_consistency(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        stats_uplift_qini_deciles,
    )

    rows = stats_uplift_qini_deciles(spark, SF).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # qini is cumulative: last value equals total y_t - y_c * n_t/n_c
    # recomputed from the decile cells
    n_t = sum(r["n_t"] for r in rows)
    n_c = sum(r["n_c"] for r in rows)
    # per-decile uplifts bounded
    for r in rows:
        assert -1 <= r["decile_uplift"] <= 1
        assert r["n_t"] > 0 and r["n_c"] > 0
    assert n_t + n_c == sum(r["n_t"] + r["n_c"] for r in rows)


def test_embedding_drift_monitor_bounds(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.similarity import (
        sim_embedding_drift_monitor,
    )

    r = sim_embedding_drift_monitor(spark, SF).collect()[0]
    assert -1 - 1e-9 <= r["centroid_cosine"] <= 1 + 1e-9
    assert r["base_centroid_norm"] > 0 and r["cand_centroid_norm"] > 0
    assert 0 <= r["max_dim_shift"]
    assert 1 <= r["worst_dim"] <= 64


def test_isotonic_calibration_vs_pav_replica(spark):
    """The minimax closed form must equal the classic sequential
    pool-adjacent-violators algorithm, and the fit must be monotone."""
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        stats_isotonic_calibration,
    )

    rows = stats_isotonic_calibration(spark, SF).collect()
    fits = [r["iso_acc"] for r in rows]
    assert fits == sorted(fits)  # monotone non-decreasing

    # sequential PAV replica over the same (n, raw_acc) cells
    pools = [[r["n"], r["raw_acc"] * r["n"]] for r in rows]  # [w, wy]
    merged: list[list[float]] = []
    for w, wy in pools:
        merged.append([w, wy])
        while len(merged) > 1 and (
            merged[-2][1] / merged[-2][0] > merged[-1][1] / merged[-1][0]
        ):
            w2, y2 = merged.pop()
            merged[-1][0] += w2
            merged[-1][1] += y2
    # expand pool means back to bins
    expect = []
    i = 0
    for w, wy in merged:
        mean = wy / w
        acc_w = 0
        while acc_w < w - 1e-9:
            acc_w += rows[i]["n"]
            expect.append(mean)
            i += 1
    assert len(expect) == len(fits)
    for got, exp in zip(fits, expect):
        assert abs(got - exp) < 5e-6


def test_theil_sen_robust_and_band(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        stats_theil_sen_trend,
    )

    r = stats_theil_sen_trend(spark, SF).collect()[0]
    assert r["n_pairs"] == r["n_months"] * (r["n_months"] - 1) // 2
    assert r["slope_p10"] <= r["theil_sen_slope"] <= r["slope_p90"]


def test_weighted_median_vs_numpy(spark):
    import duckdb

    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        agg_weighted_median,
    )

    rows = {r["grp"]: r for r in agg_weighted_median(spark, SF).collect()}
    df = duckdb.connect().execute(
        f"""SELECT l_returnflag AS g, l_extendedprice AS p,
                   CAST(l_quantity AS BIGINT) AS q
            FROM '{SF}/lineitem.parquet'"""
    ).df()
    for g, sub in df.groupby("g"):
        sub = sub.sort_values(["p", "q"])
        cw = sub["q"].cumsum()
        tw = int(sub["q"].sum())
        med = float(sub["p"].to_numpy()[(cw.to_numpy() * 2 >= tw).argmax()])
        assert rows[g]["weighted_median_price"] == med
        assert rows[g]["total_weight"] == tw


def test_ols_two_feature_vs_numpy(spark):
    import duckdb

    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        stats_ols_two_feature,
    )

    r = stats_ols_two_feature(spark, SF).collect()[0]
    df = duckdb.connect().execute(
        f"""SELECT CAST(l_quantity AS BIGINT) AS x1,
                   ROUND(l_discount * 100) AS x2,
                   ROUND(l_extendedprice * 100) AS y
            FROM '{SF}/lineitem.parquet'"""
    ).df()
    X = np.column_stack(
        [np.ones(len(df)), df["x1"].to_numpy(), df["x2"].to_numpy()]
    )
    y = df["y"].to_numpy(dtype=float)
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(r["beta_quantity"] - coef[1] / 100.0) < 1e-4
    assert abs(r["beta_discount_pct"] - coef[2]) < 1e-2
    assert abs(r["intercept"] - coef[0] / 100.0) < 1e-2
