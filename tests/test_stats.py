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
