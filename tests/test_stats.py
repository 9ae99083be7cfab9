"""Statistical-operator checks beyond the DuckDB oracle: sketch accuracy
bounds and estimator sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"


def test_approx_percentile_within_tolerance(spark):
    """The 100 TB percentile path (approx_percentile sketch) must land
    within its accuracy bound of the exact percentile: with accuracy=1000
    the rank error is ≤ n/1000, so compare against the exact value at
    rank ± n/1000 and assert containment."""
    od = read_table(spark, SF, "orders")
    row = od.agg(
        F.percentile("o_totalprice", 0.5).alias("exact"),
        F.approx_percentile("o_totalprice", 0.5, 1000).alias("approx"),
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    ).collect()[0]
    spread = row["hi"] - row["lo"]
    # rank-error bound translated loosely to value space: the sketch's
    # answer must sit inside [exact ± 5% of spread] on this distribution
    assert abs(row["approx"] - row["exact"]) <= 0.05 * spread


def test_moments_match_numpy(spark):
    """Spark's population skewness/kurtosis equal the numpy definitions —
    this is the fact the stats oracle relies on."""
    import numpy as np

    li = read_table(spark, SF, "lineitem").limit(5000)
    vals = np.array([r["l_quantity"] for r in li.select("l_quantity").collect()])
    got = li.agg(
        F.skewness("l_quantity").alias("s"), F.kurtosis("l_quantity").alias("k")
    ).collect()[0]
    m = vals.mean()
    m2 = ((vals - m) ** 2).mean()
    want_s = ((vals - m) ** 3).mean() / m2**1.5
    want_k = ((vals - m) ** 4).mean() / m2**2 - 3
    assert abs(got["s"] - want_s) < 1e-6
    assert abs(got["k"] - want_k) < 1e-6


def test_misra_gries_partial_bounds(spark):
    """Each partition summary has <= capacity items, and summed weights
    underestimate true counts by at most n/capacity (the MG guarantee)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        misra_gries_partial,
    )
    from pyspark.sql import functions as F

    # skewed synthetic stream: token t<i> with frequency ~ 1000/i
    data = [(f"t{i}",) for i in range(1, 60) for _ in range(1000 // i)]
    df = spark.createDataFrame(data, "token string").repartition(4)
    cap = 16
    summary = misra_gries_partial(df, "token", capacity=cap)
    per_part = summary.groupBy().agg(F.count("*")).collect()[0][0]
    assert per_part <= 4 * cap
    merged = {r["item"]: r["weight"] for r in
              summary.groupBy("item").agg(F.sum("weight").alias("weight")).collect()}
    true = {r["token"]: r["cnt"] for r in
            df.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
    n = sum(true.values())
    for item, w in merged.items():
        assert w <= true[item], "MG weight must never overestimate"
        assert true[item] - w <= n / cap * 4  # merged error bound (4 partials)


def test_heavy_hitters_exact_topk_matches_groupby(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        heavy_hitters_topk,
    )
    from pyspark.sql import functions as F

    data = [(f"t{i}",) for i in range(1, 60) for _ in range(1000 // i)]
    df = spark.createDataFrame(data, "token string").repartition(8)
    got = [(r["item"], r["cnt"]) for r in
           heavy_hitters_topk(df, "token", k=5, capacity=64).collect()]
    want = [(r["token"], r["cnt"]) for r in
            df.groupBy("token").agg(F.count("*").alias("cnt"))
              .orderBy(F.col("cnt").desc(), "token").limit(5).collect()]
    assert got == want


def test_join_delta_maintain_equals_full_recompute(spark):
    """IVM delta rule: any 2x2 batching of both join sides reproduces the
    full join exactly (no lost rows, no duplicates)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.rollup import (
        join_delta_maintain,
    )
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(k, f"a{k}") for k in range(20)], "ak int, av string")
    b = spark.createDataFrame(
        [(k, f"b{k}-{i}") for k in range(0, 20, 2) for i in range(2)],
        "bk int, bv string",
    )
    on = a["ak"] == b["bk"]
    full = {tuple(r) for r in a.join(b, on).collect()}
    for a_pred in [a["ak"] < 7, a["ak"] % 4 == 0]:
        for b_pred in [b["bk"] < 10, b["bk"] % 8 == 2]:
            a1, da = a.filter(a_pred), a.filter(~a_pred)
            b1, db = b.filter(b_pred), b.filter(~b_pred)
            m = a1.join(b1, on)
            got = join_delta_maintain(m, a1, da, b1, db, on).collect()
            assert {tuple(r) for r in got} == full
            assert len(got) == len(full), "delta rule produced duplicates"


def test_table_fingerprint_detects_single_row_change(spark):
    """Identical tables fingerprint identically (the sum is commutative,
    so row order / partitioning cannot matter), and shard keys stay in
    range."""
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        integrity_table_fingerprint,
    )

    sf = "/root/testdata/sf0.001"
    base = {(r["shard"]): (r["n_rows"], r["content_sum"])
            for r in integrity_table_fingerprint(spark, sf).collect()}
    again = {(r["shard"]): (r["n_rows"], r["content_sum"])
             for r in integrity_table_fingerprint(spark, sf).collect()}
    assert base == again
    assert set(base) <= set(range(16)) and len(base) >= 8


def test_fn_url_suite_roundtrip(spark):
    from databricks_end_to_end_lakeflow_project_spark.functions.scalar import (
        fn_url_suite,
    )

    out = fn_url_suite(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert r["proto"] == "https"
        assert r["host"].endswith(".example.com")
        assert r["path"] == f"/docs/{r['doc_id']}"
        assert r["query"].startswith("lang=") and "&q=ref" in r["query"]
        assert r["lang_param"] in {"en", "de", "es", "fr", "zh"}
        assert r["q_encoded"] == "a+b+c"


def test_hll_sketch_union_accurate(spark):
    """Daily-sketch union must sit within 5% of the exact distinct count
    (the sf0.1 sweep replaced the old exact-equality `union_lossless`
    contract: DataSketches' union promotes its accumulator to the HLL_8
    target type, so unioned and directly-built sketches legitimately
    diverge once sketches go dense — see the operator docstring)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        agg_hll_sketch_union,
    )

    rows = {r["day"]: r for r in agg_hll_sketch_union(spark, SF).collect()}
    ev = read_table(spark, SF, "events")
    exact = ev.select("user_id").distinct().count()
    tot = rows["__all_days__"]
    assert tot["exact_users"] == exact
    assert tot["union_within_5pct"] and tot["est_within_5pct"]
    assert all(
        r["est_within_5pct"] and r["union_within_5pct"] for r in rows.values()
    )
    assert all(r["exact_users"] <= exact for r in rows.values())


def test_drift_monitors_invariants(spark):
    """PSI and chi-square drift gates: non-negative by construction,
    exactly zero (resp. ~zero) when the two samples are IDENTICAL, and
    strictly positive under a planted shift."""
    import datetime as dt

    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        monitor_chisq_type_drift,
        monitor_psi_value_drift,
    )

    psi = monitor_psi_value_drift(spark, SF).collect()[0]
    chi = monitor_chisq_type_drift(spark, SF).collect()[0]
    assert psi["psi"] >= 0 and chi["chi2"] >= 0
    assert psi["n_ref"] + psi["n_cur"] == chi["n_ref"] + chi["n_cur"]
    assert psi["n_bins"] <= 10 and chi["dof"] >= 1

    # identical halves → PSI == 0 bit-exactly (symmetric smoothing):
    # mirror one day of events into both halves of a synthetic frame
    base = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), float(i % 97))
        for i in range(500)
    ]
    mirrored = base + [
        (i + 500, ts + dt.timedelta(days=10), v) for (i, ts, v) in base
    ]
    ev = spark.createDataFrame(
        mirrored, "event_id long, ts timestamp, value double"
    ).withColumn("event_type", ((F.col("event_id") % 500) % 3).cast("string"))
    ev.createOrReplaceTempView("__drift_mirror")
    # reuse the operator bodies on the synthetic frame via monkey table
    from databricks_end_to_end_lakeflow_project_spark.operators import stats as S

    orig = S.read_table
    try:
        S.read_table = lambda _s, _d, _n: ev
        psi0 = monitor_psi_value_drift(spark, SF).collect()[0]["psi"]
        chi0 = monitor_chisq_type_drift(spark, SF).collect()[0]["chi2"]
    finally:
        S.read_table = orig
    assert psi0 == 0.0
    assert chi0 == 0.0

    # planted categorical shift → strictly positive chi2
    shifted = ev.withColumn(
        "event_type",
        F.when(
            F.col("event_id") >= 500, F.lit("drifted")
        ).otherwise(F.col("event_type")),
    )
    try:
        S.read_table = lambda _s, _d, _n: shifted
        chi1 = monitor_chisq_type_drift(spark, SF).collect()[0]["chi2"]
    finally:
        S.read_table = orig
    assert chi1 > 100


def test_unigram_kl_drift_matches_pure_python(spark):
    """KL drift recomputed independently in pure Python from the same
    parquet: identical top-10 tokens, per-token quantized contributions,
    and total; the smoothed KL total must be non-negative."""
    import math

    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        monitor_unigram_kl_drift,
    )

    got = monitor_unigram_kl_drift(spark, SF).collect()

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    c_base, c_new = {}, {}
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        tgt = c_new if doc_id % 2 == 1 else c_base
        for t in text.strip().split(" "):
            tgt[t] = tgt.get(t, 0) + 1
    vocab = set(c_base) | set(c_new)
    n_base, n_new, v = sum(c_base.values()), sum(c_new.values()), len(vocab)
    contrib = {}
    for t in vocab:
        cb, cn = c_base.get(t, 0), c_new.get(t, 0)
        p = (cn + 1.0) / (n_new + v)
        term = p * math.log(((cn + 1.0) * (n_base + v)) / ((cb + 1.0) * (n_new + v)))
        contrib[t] = round(term * 1e12)
    total = sum(contrib.values())
    assert total >= 0  # KL of proper smoothed distributions
    top = sorted(contrib.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["tok"], r["contrib_q"]) for r in got] == top
    for r in got:
        assert r["kl_total_q"] == total
        assert r["c_base"] == c_base.get(r["tok"], 0)
        assert r["c_new"] == c_new.get(r["tok"], 0)


def test_winsorize_matches_pure_python(spark):
    """Rank-defined boundaries and clipped sums recomputed independently
    (exact Decimal arithmetic) from the parquet."""
    import math
    from decimal import Decimal

    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        stats_winsorize_price,
    )

    r = stats_winsorize_price(spark, SF).collect()[0]

    vals = sorted(
        Decimal(str(v))
        for v in pq.read_table(
            f"{SF}/lineitem.parquet", columns=["l_extendedprice"]
        ).column("l_extendedprice").to_pylist()
    )
    n = len(vals)
    lo, hi = vals[math.ceil(0.01 * n) - 1], vals[math.ceil(0.99 * n) - 1]
    assert r["n_rows"] == n
    assert Decimal(str(r["lo_bound"])) == lo
    assert Decimal(str(r["hi_bound"])) == hi
    assert r["n_clipped_low"] == sum(1 for v in vals if v < lo)
    assert r["n_clipped_high"] == sum(1 for v in vals if v > hi)
    wsum = sum(min(max(v, lo), hi) for v in vals)
    assert Decimal(str(r["winsorized_sum"])) == wsum
    assert Decimal(str(r["raw_sum"])) == sum(vals)


def test_count_min_sketch_guarantee_and_exact_grid(spark):
    """CM guarantee: every estimate >= exact count (one-sided), and the
    estimate equals the pure-Python grid's min-cell exactly."""
    import hashlib

    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        _CM_DEPTH,
        _CM_WIDTH,
        agg_count_min_sketch,
    )

    got = agg_count_min_sketch(spark, SF).collect()
    assert len(got) == 5

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    from collections import Counter

    exact = Counter(t for text in texts for t in text.strip().split(" "))

    def pos(tok, j):
        return int(hashlib.md5(f"{tok}:{j}".encode()).hexdigest()[:8], 16) % _CM_WIDTH

    grid = [[0] * _CM_WIDTH for _ in range(_CM_DEPTH)]
    for tok, c in exact.items():
        for j in range(_CM_DEPTH):
            grid[j][pos(tok, j)] += c
    for r in got:
        assert r["exact_cnt"] == exact[r["tok"]]
        want_est = min(grid[j][pos(r["tok"], j)] for j in range(_CM_DEPTH))
        assert r["cm_estimate"] == want_est
        assert r["is_upper_bound"] and r["cm_estimate"] >= r["exact_cnt"]


def test_bootstrap_poisson_matches_pure_python_and_sane(spark):
    """Replicate weights and means recomputed independently (integer
    cutoff draws + Decimal sums); replicate dispersion must sit near the
    CLT prediction sd/sqrt(n) (within 3x either way)."""
    import hashlib
    import math
    import statistics
    from decimal import Decimal

    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        _BOOT_B,
        _BOOT_CUTS,
        stats_bootstrap_poisson,
    )

    got = {r["b"]: r for r in stats_bootstrap_poisson(spark, SF).collect()}
    assert set(got) == set(range(_BOOT_B))

    tbl = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    keys = tbl.column("o_orderkey").to_pylist()
    vals = [Decimal(str(v)) for v in tbl.column("o_totalprice").to_pylist()]

    def weight(k, b):
        h = int(hashlib.md5(f"{k}:{b}".encode()).hexdigest()[:8], 16)
        for w, cut in enumerate(_BOOT_CUTS):
            if h < cut:
                return w
        return 4

    means = []
    for b in range(_BOOT_B):
        sw = swx = 0
        for k, x in zip(keys, vals):
            w = weight(k, b)
            sw += w
            swx += w * x
        rep = round(float(swx) / float(sw), 4)
        means.append(rep)
        assert got[b]["n_eff"] == sw
        assert got[b]["rep_mean"] == rep
    pop_mean = float(sum(vals)) / len(vals)
    pop_sd = statistics.pstdev(float(v) for v in vals)
    se_pred = pop_sd / math.sqrt(len(vals))
    se_obs = statistics.stdev(means)
    assert se_pred / 3 < se_obs < se_pred * 3
    assert abs(statistics.mean(means) - pop_mean) < 5 * se_pred
