"""Invariant tests for the round-7 operator additions.

The oracle gate (tools/check_oracle.py) pins VALUES; these tests pin the
STRUCTURAL claims the docstrings make — monotonicity, conservation,
gate-recall, and the equivalence of the distributed rewrites to their
naive single-partition forms.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


# --------------------------------------------------------------- ER gate


def test_er_balance_gate_is_pure_pruning(spark):
    """The pre-levenshtein balance gate may only REMOVE candidates, and
    the true match must survive it for every dirty row (recall 1.0)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.entity import (
        _capped_candidates,
        _dirty_feed,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    cust = read_table(spark, SF_SMOKE, "customer")
    dirty = _dirty_feed(cust)
    n_dirty = dirty.count()
    raw = _capped_candidates(dirty, cust)
    gated = _capped_candidates(dirty, cust, balance_gate=True)
    n_raw, n_gated = raw.count(), gated.count()
    assert n_gated <= n_raw
    # gated ⊆ raw on the pair key
    extra = gated.select("true_key", "c_custkey").exceptAll(
        raw.select("true_key", "c_custkey")
    )
    assert extra.count() == 0
    # the true pair survives the gate for EVERY dirty row
    true_pairs = gated.filter(F.col("true_key") == F.col("c_custkey"))
    assert true_pairs.select("true_key").distinct().count() == n_dirty


# --------------------------------------------------- dedup cascade funnel


def test_dedup_cascade_funnel_monotone(spark):
    rows = {r["stage"]: r["n"] for r in _q("pipeline_dedup_cascade")(spark, SF_SMOKE).collect()}
    assert rows["0_raw_docs"] >= rows["1_after_exact_dedup"] >= rows["2_after_shingleset_dedup"]
    assert rows["3_neardup_pairs_tau80"] >= 0


# ------------------------------------------------------ nprobe sweep


def test_nprobe_sweep_recall_monotone(spark):
    out = _q("sim_ivf_nprobe_sweep")(spark, SF_SMOKE).collect()
    recalls = [r["recall_at_10"] for r in sorted(out, key=lambda r: r["nprobe"])]
    assert recalls == sorted(recalls), recalls
    assert all(0.0 <= r <= 1.0 for r in recalls)


# --------------------------------------------------- permutation test


def test_permutation_test_bounds(spark):
    r = _q("stats_permutation_test")(spark, SF_SMOKE).collect()[0]
    assert 0 < r["p_value"] <= 1.0
    assert 0 <= r["n_as_extreme"] <= r["n_permutations"]


# --------------------------------- concurrency sweep: split == global form


def test_concurrency_split_sweep_equals_global(spark):
    """The per-day partitioned sweep + carry must reproduce the naive
    single-window global sweep exactly (the rewrite's whole claim)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        _CONC_GAP_MIN,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    got = {
        (r["day"], r["peak_concurrency"])
        for r in _q("events_concurrency_peak")(spark, SF_SMOKE).collect()
    }

    ev = read_table(spark, SF_SMOKE, "events").select("user_id", "ts", "event_id")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(wu).cast("long")
    marked = ev.select(
        "user_id", "ts",
        F.when(
            F.lag("ts").over(wu).isNull() | (gap > _CONC_GAP_MIN * 60), 1
        ).otherwise(0).alias("is_start"),
    )
    wcum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = (
        marked.withColumn("sid", F.sum("is_start").over(wcum))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr(f"INTERVAL {_CONC_GAP_MIN} MINUTE")).alias("s_end"),
        )
    )
    boundaries = sessions.select(
        F.col("s_start").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        sessions.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta"))
    )
    # naive single-partition reference (test-only)
    wglob = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = {
        (r["day"], r["peak"])
        for r in boundaries.select("t", F.sum("delta").over(wglob).alias("live"))
        .groupBy(F.col("t").cast("date").alias("day"))
        .agg(F.max("live").alias("peak"))
        .collect()
    }
    assert got == ref


# --------------------------------------------------------------- WAP


def test_wap_conservation(spark):
    r = _q("cdc_write_audit_publish")(spark, SF_SMOKE).collect()[0]
    assert r["n_published"] + r["n_quarantined"] == r["n_staged"]
    assert r["n_quarantined"] > 0  # the injected corruption must be caught


# ----------------------------------------------- snapshot chunk manifest


def test_snapshot_chunks_partition_the_table(spark):
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    rows = _q("cdc_snapshot_chunk_plan")(spark, SF_SMOKE).collect()
    n_total = read_table(spark, SF_SMOKE, "orders").count()
    assert sum(r["n_rows"] for r in rows) == n_total
    # chunks are key-disjoint and ordered
    for a, b in zip(rows, rows[1:]):
        assert a["high_key"] < b["low_key"]


# ------------------------------------------------- determinism spot checks


def test_round7_single_series_ops_deterministic(spark):
    for name in (
        "stats_page_hinkley_alarm",
        "ts_rolling_mad_anomaly",
        "ts_sax_symbolize",
        "events_rfm_migration",
    ):
        a = [tuple(r) for r in _q(name)(spark, SF_SMOKE).collect()]
        b = [tuple(r) for r in _q(name)(spark, SF_SMOKE).collect()]
        assert a == b, name
