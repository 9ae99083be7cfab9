"""As-of join semantics (at-or-before, strict, no-match, key isolation)
and UDF-suite sanity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.asof import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 101.0), (2, _ts(10), 50.0), (3, _ts(5), 9.0)],
        "sym int, trade_ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [(1, _ts(9), 99.5), (1, _ts(10), 99.9), (1, _ts(15), 100.5), (2, _ts(11), 49.0)],
        "sym int, quote_ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_at_or_before(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, ["sym"], "trade_ts", "quote_ts", ["bid"])
    rows = {(r["sym"], r["trade_ts"]): (r["quote_ts"], r["bid"]) for r in out.collect()}
    assert out.count() == trades.count()  # left join: every left row kept
    # equal timestamp matches (10:00 quote visible to 10:00 trade)
    assert rows[(1, _ts(10))] == (_ts(10), 99.9)
    # latest at-or-before, not first
    assert rows[(1, _ts(20))] == (_ts(15), 100.5)
    # key isolation: sym 2 never sees sym 1 quotes; 11:00 quote is after
    assert rows[(2, _ts(10))] == (None, None)
    # key with no right rows at all
    assert rows[(3, _ts(5))] == (None, None)


def test_asof_strict_excludes_equal_ts(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, ["sym"], "trade_ts", "quote_ts", ["bid"], strict=True)
    rows = {(r["sym"], r["trade_ts"]): (r["quote_ts"], r["bid"]) for r in out.collect()}
    assert rows[(1, _ts(10))] == (_ts(9), 99.5)  # equal-ts quote no longer visible


def test_asof_keeps_left_payload_columns(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, ["sym"], "trade_ts", "quote_ts", ["bid"])
    assert set(out.columns) == {"sym", "trade_ts", "price", "quote_ts", "bid"}
    assert out.filter(F.col("price").isNull()).count() == 0


def test_asof_nearest_picks_closer_side_and_tolerance(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.asof import (
        asof_join_nearest,
    )

    trades, quotes = _frames(spark)
    out = asof_join_nearest(
        trades, quotes, ["sym"], "trade_ts", "quote_ts", ["bid"],
        tolerance_us=6 * 60 * 1_000_000,  # 6 minutes
    )
    rows = {
        (r["sym"], r["trade_ts"]): (r["quote_ts"], r["bid"], r["matched_dir"])
        for r in out.collect()
    }
    assert out.count() == trades.count()
    # equal-ts match: backward wins at distance 0
    assert rows[(1, _ts(10))] == (_ts(10), 99.9, "backward")
    # 20' trade: backward 15' (5 min) beats nothing forward → backward
    assert rows[(1, _ts(20))] == (_ts(15), 100.5, "backward")
    # sym 2 at 10': only a FORWARD quote at 11' (1 min) → forward match
    assert rows[(2, _ts(10))] == (_ts(11), 49.0, "forward")
    # sym 3: nothing within tolerance in either direction
    assert rows[(3, _ts(5))] == (None, None, None)


def test_asof_nearest_single_window_exchange(spark):
    """Both direction resolutions must come from one exchange: the plan
    has exactly 1 hashpartitioning exchange (toy frames, no pre-agg)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.asof import (
        asof_join_nearest,
    )

    trades, quotes = _frames(spark)
    out = asof_join_nearest(
        trades, quotes, ["sym"], "trade_ts", "quote_ts", ["bid"],
        tolerance_us=10**9,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_temporal_scd2_join_matches_hand_replay(spark):
    """Every purchase must be attributed to the click-tier version whose
    validity interval contains its timestamp."""
    from databricks_end_to_end_lakeflow_project_spark.operators.asof import (
        join_temporal_scd2,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    ev = read_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).collect()

    def tier(v):
        return "low" if v < 5 else ("mid" if v < 15 else "high")

    # hand-build per-user tier intervals from click events (latest event_id
    # wins ties on ts; consecutive same-tier runs collapse)
    by_user = {}
    for r in sorted(
        (r for r in ev if r["event_type"] == "click"),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    ):
        by_user.setdefault(r["user_id"], []).append(r)
    versions = {}
    for uid, rows in by_user.items():
        dedup = {}
        for r in rows:
            dedup[r["ts"]] = tier(r["value"])  # later event_id overwrites
        vs = []
        for ts, t in sorted(dedup.items()):
            if not vs or vs[-1][1] != t:
                vs.append([ts, t])
        versions[uid] = vs
    expected = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        vs = versions.get(r["user_id"], [])
        cur = None
        for ts, t in vs:
            if r["ts"] >= ts:
                cur = t
        if cur is not None:
            expected.setdefault(cur, [0, 0.0])
            expected[cur][0] += 1
            expected[cur][1] += r["value"]
    got = {r["tier"]: r for r in join_temporal_scd2(spark, sf).collect()}
    assert set(got) == set(expected)
    for t, (n, rev) in expected.items():
        assert got[t]["n_purchases"] == n
        assert abs(got[t]["revenue"] - round(rev, 2)) < 0.05


def test_map_in_arrow_agrees_with_map_in_pandas(spark):
    """The Arrow-native batch path must produce the same doc_id→n_chars
    map as the pandas path (shared columns), plus a correct uppercase
    count on a hand row — guards the RecordBatch column plumbing."""
    from databricks_end_to_end_lakeflow_project_spark.functions.udfs import (
        udf_map_in_arrow,
        udf_map_in_pandas,
    )

    sf = "/root/testdata/sf0.001"
    arrow = {r["doc_id"]: r for r in udf_map_in_arrow(spark, sf).collect()}
    pandas = {r["doc_id"]: r for r in udf_map_in_pandas(spark, sf).collect()}
    assert set(arrow) == set(pandas)
    for did, r in arrow.items():
        assert r["n_chars"] == pandas[did]["n_chars"]

    df = spark.createDataFrame([(1, "The Quick brown Fox")], "doc_id long, text string")
    out = df.mapInArrow(
        __import__(
            "databricks_end_to_end_lakeflow_project_spark.functions.udfs",
            fromlist=["_arrow_stats_batches"],
        )._arrow_stats_batches,
        schema="doc_id long, n_chars long, n_tokens long, n_upper long",
    ).collect()[0]
    assert (out["n_chars"], out["n_tokens"], out["n_upper"]) == (19, 4, 3)


def test_apply_in_arrow_agrees_with_plain_groupby(spark):
    """The Arrow grouped path must equal the plain JVM aggregation."""
    from pyspark.sql import functions as F

    from databricks_end_to_end_lakeflow_project_spark.functions.udfs import (
        udf_apply_in_arrow,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in udf_apply_in_arrow(spark, sf).collect()}
    want = {
        tuple(r)
        for r in read_table(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(F.length("text")).cast("long").alias("min_chars"),
            F.max(F.length("text")).cast("long").alias("max_chars"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
        .collect()
    }
    assert got == want
