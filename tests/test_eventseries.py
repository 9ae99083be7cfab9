"""Event-series operators (operators/eventseries.py): value invariants
and the single-shuffle plan shapes the 100 TB story depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
    events_funnel_path_match,
    events_path_transitions,
    ts_resample_ohlc,
)
from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
    agg_histogram_price_bins,
)
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ohlc_bar_invariants(spark):
    """Every bar: low <= open/close <= high; bars partition the events."""
    bars = ts_resample_ohlc(spark, SF)
    bad = bars.filter(
        (F.col("low") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("close") > F.col("high"))
    )
    assert bad.count() == 0
    total = bars.agg(F.sum("n_events")).collect()[0][0]
    assert total == read_table(spark, SF, "events").count()


def test_ohlc_single_exchange(spark):
    """Both row_number windows and the groupBy share one hash partition
    on (event_type, bucket) — one shuffle total."""
    plan = _plan(ts_resample_ohlc(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_transitions_rows_normalize(spark):
    """Per-src transition probabilities sum to ~1 and counts conserve
    the number of adjacent pairs (n_events - n_users)."""
    tr = events_path_transitions(spark, SF).cache()
    sums = tr.groupBy("src").agg(F.sum("p_transition").alias("s")).collect()
    assert all(abs(r["s"] - 1.0) < 0.01 for r in sums)
    ev = read_table(spark, SF, "events")
    n_pairs = ev.count() - ev.select("user_id").distinct().count()
    assert tr.agg(F.sum("n_transitions")).collect()[0][0] == n_pairs
    tr.unpersist()


def test_funnel_path_consistent_with_min_ts_funnel(spark):
    """A user has the path pattern signup…purchase iff some purchase
    follows some signup — cross-check against direct min/max timestamps."""
    got = events_funnel_path_match(spark, SF)
    ev = read_table(spark, SF, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.max("ts").alias("t1"))
    )
    expect = (
        ev.select("user_id")
        .distinct()
        .join(su, "user_id", "left")
        .join(pu, "user_id", "left")
        .select(
            "user_id",
            F.when(
                F.col("t0").isNotNull() & (F.col("t1") > F.col("t0")), 1
            )
            .otherwise(0)
            .alias("expect_funnel"),
        )
    )
    # path match is ">=" on position, ts compare is ">" on time; with
    # unique event ids a purchase at the exact same ts as the signup is
    # the only divergence — assert agreement modulo that edge
    joined = got.join(expect, "user_id")
    disagree = joined.filter(F.col("has_funnel") != F.col("expect_funnel"))
    same_ts_edge = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id", "ts")
        .agg(F.count_distinct("event_type").alias("k"))
        .filter(F.col("k") == 2)
        .select("user_id")
    )
    assert disagree.join(same_ts_edge, "user_id", "left_anti").count() == 0


def test_histogram_partitions_rows(spark):
    """Bin counts sum to the table size; shares sum to ~1; bin ranges
    stay inside their arithmetic bounds."""
    h = agg_histogram_price_bins(spark, SF).cache()
    li_n = read_table(spark, SF, "lineitem").count()
    assert h.agg(F.sum("n")).collect()[0][0] == li_n
    assert abs(h.agg(F.sum("share")).collect()[0][0] - 1.0) < 0.01
    bad = h.filter(
        (F.col("lo") < F.col("bin") * 10000) | (F.col("hi") >= (F.col("bin") + 1) * 10000)
    )
    assert bad.count() == 0
    h.unpersist()


def test_python_datasource_uneven_split_complete(spark):
    """Custom DataSource: an n not divisible by the partition count must
    still yield every id exactly once (ceil-split leaves the tail
    partition short, never dropped rows)."""
    from databricks_end_to_end_lakeflow_project_spark.sources.pydatasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    docs = (
        spark.read.format("synthetic_corpus")
        .option("n", "1000")
        .option("partitions", "7")
        .load()
    )
    assert docs.count() == 1000
    assert docs.select("doc_id").distinct().count() == 1000
    assert docs.rdd.getNumPartitions() == 7


def test_late_arrivals_matches_watermark_drop_semantics(spark):
    """An event is late iff a streaming agg with 10-min watermark would
    drop it: verify against a hand-replayed high-watermark."""
    import datetime as dt

    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        events_late_arrivals,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        read_table(spark, sf, "events")
        .select("event_id", "event_type", "ts")
        .collect(),
        key=lambda r: r["event_id"],
    )
    hw = None
    expect: dict[str, list[int]] = {}
    for r in rows:
        late = hw is not None and r["ts"] < hw - dt.timedelta(minutes=10)
        n, nl = expect.get(r["event_type"], [0, 0])
        expect[r["event_type"]] = [n + 1, nl + (1 if late else 0)]
        hw = r["ts"] if hw is None else max(hw, r["ts"])
    got = {r["event_type"]: [r["n_events"], r["n_late"]]
           for r in events_late_arrivals(spark, sf).collect()}
    assert got == expect


def test_rate_anomaly_no_self_leakage(spark):
    """The trailing frame excludes the current row: an event equal to its
    window mean (z=0) never flags, and every flagged |z| really exceeds 3
    when recomputed by hand over the preceding-6h set."""
    import datetime as dt
    import statistics

    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        events_rate_anomaly,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    sf = "/root/testdata/sf0.001"
    rows = read_table(spark, sf, "events").select(
        "event_id", "event_type", "ts", "value"
    ).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    flagged = {r["event_id"]: r["zscore"]
               for r in events_rate_anomaly(spark, sf).collect()}
    checked = 0
    for et, evs in by_type.items():
        evs.sort(key=lambda r: r["ts"])
        for i, r in enumerate(evs):
            lo = r["ts"] - dt.timedelta(hours=6)
            prev = [e["value"] for e in evs
                    if lo <= e["ts"] < r["ts"]]
            if len(prev) >= 2:
                mu = statistics.fmean(prev)
                sd = statistics.stdev(prev)
                if sd > 0:
                    z = (r["value"] - mu) / sd
                    assert (abs(z) > 3) == (r["event_id"] in flagged), r
                    if r["event_id"] in flagged:
                        assert abs(flagged[r["event_id"]] - round(z, 4)) <= 1e-3
                        checked += 1
    assert checked == len(flagged) and checked > 0


def test_ts_ewma_matches_pandas_recursive(spark):
    """EWMA fold must equal pandas' ewm(alpha=0.3, adjust=False) —
    the same y←αx+(1−α)y recurrence seeded with the first value."""
    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        ts_ewma_final,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["user_id"]: r for r in ts_ewma_final(spark, sf).collect()}
    pdf = (
        read_table(spark, sf, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    checked = 0
    for uid, grp in pdf.groupby("user_id"):
        want = grp["value"].ewm(alpha=0.3, adjust=False).mean().iloc[-1]
        assert got[uid]["n_events"] == len(grp)
        assert abs(got[uid]["ewma"] - round(want, 6)) <= 1e-6, uid
        checked += 1
    assert checked == len(got) > 0


def test_ts_pattern_search_finds_planted_spike(spark, tmp_path):
    """A hand-planted exact spike-then-settle subsequence must rank
    first with distance 0 (z-normalization makes the match invariant to
    the planted window's offset and scale)."""
    import datetime as dt

    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        _PAT,
        ts_pattern_search,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: noise; user 2: noise + the pattern scaled by 3 and shifted by 10
    for i, v in enumerate([5.0, 5.1, 4.9, 5.0, 5.2, 4.8, 5.1, 5.0]):
        rows.append((eid, base + dt.timedelta(minutes=i), 1, "view", v, "{}")); eid += 1
    vals2 = [7.0, 6.8] + [10.0 + 3 * x for x in _PAT] + [6.9, 7.1]
    for i, v in enumerate(vals2):
        rows.append((eid, base + dt.timedelta(minutes=i), 2, "view", v, "{}")); eid += 1
    d = str(tmp_path / "events_planted")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(d + "/events.parquet")
    out = ts_pattern_search(spark, str(tmp_path / "events_planted")).collect()
    top = out[0]
    assert (top["user_id"], top["off"]) == (2, 3)
    assert top["zdist"] == 0.0


def test_autocorr_lags_bounded_and_complete(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        ts_autocorr_lags,
    )

    rows = ts_autocorr_lags(spark, SF).collect()
    types = {r["event_type"] for r in rows}
    # every type carries exactly lags 1..3
    for t in types:
        assert sorted(r["lag"] for r in rows if r["event_type"] == t) == [1, 2, 3]
    for r in rows:
        if r["acf"] is not None:
            assert -1.0 <= r["acf"] <= 1.0


def test_cusum_drift_nonnegative_and_complete(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        ts_cusum_drift,
    )

    rows = ts_cusum_drift(spark, SF).collect()
    assert len(rows) == 5  # one per event type
    for r in rows:
        assert r["cusum_pos"] >= 0.0 and r["cusum_neg"] >= 0.0
        assert r["n_hours"] > 0


def test_late_arrivals_per_shard_matches_hand_replay(spark):
    """2-shard fixture: per-shard watermark replay computed by hand must
    equal late_arrivals(shard_col=...), and the plan must partition the
    running-max window by the shard (no single-partition stage)."""
    import datetime as dt

    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        late_arrivals,
    )
    from tests.test_plans import unpartitioned_windows

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # (event_id = arrival order within shard, shard, event_type, ts)
    rows = [
        # shard A: watermark climbs 0→30; the 5-minute event is >10 min late
        (1, "A", "click", m(0)),
        (2, "A", "click", m(30)),
        (3, "A", "click", m(5)),    # late vs 30
        (4, "A", "buy", m(25)),     # NOT late (30-25 <= 10)
        # shard B: same timestamps arrive in order → nothing is late,
        # though a GLOBAL replay interleaved with A would mark m(5) late
        (5, "B", "click", m(0)),
        (6, "B", "click", m(5)),
        (7, "B", "buy", m(31)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, shard string, event_type string, ts timestamp"
    )
    got = late_arrivals(ev, shard_col="shard")
    by_type = {r["event_type"]: (r["n_events"], r["n_late"]) for r in got.collect()}
    assert by_type == {"click": (5, 1), "buy": (2, 0)}
    assert unpartitioned_windows(_plan(got)) == []

    # single-shard special case == the global form
    only_a = ev.filter(F.col("shard") == "A")
    glob = late_arrivals(only_a).collect()
    shrd = late_arrivals(only_a, shard_col="shard").collect()
    assert sorted(map(tuple, glob)) == sorted(map(tuple, shrd))


def test_bot_regularity_matches_pure_python(spark):
    """Per-user gap moments recomputed independently in pure Python; the
    top-20 selection, ppm ratios and bot flags must match exactly, and
    the ratio must be >= 1e6 (n·Σx²/(Σx)² >= 1 by Cauchy–Schwarz)."""
    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        _BOT_MIN_GAPS,
        _BOT_RATIO_PPM,
        events_bot_regularity_topk,
    )

    got = [tuple(r) for r in events_bot_regularity_topk(spark, SF).collect()]

    tbl = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"])
    per: dict[int, list[int]] = {}
    for uid, ts in zip(tbl.column("user_id").to_pylist(), tbl.column("ts").to_pylist()):
        per.setdefault(uid, []).append(int(ts.timestamp() * 1_000_000) // 1_000_000)
    import math

    stats = []
    for uid, tss in per.items():
        tss.sort()
        gaps = [b - a for a, b in zip(tss, tss[1:])]
        n, s, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        if n >= _BOT_MIN_GAPS and s > 0:
            ratio = math.floor(float(n * s2) * 1000000.0 / float(s * s))
            stats.append((uid, n, s, s2, ratio, ratio < _BOT_RATIO_PPM))
    want = sorted(stats, key=lambda t: (t[4], t[0]))[:20]
    assert got == want
    for row in got:
        assert row[4] >= 1_000_000


def test_seasonal_profile_shares_sum_and_bounds(spark):
    """Per type: hourly shares must sum to ~1e6 ppm (within 24 floor
    truncations), hours must cover 0..23, seasonal index is FLOOR'd
    n*24000/n_type, and a uniform-traffic type stays near 1000."""
    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        ts_seasonal_profile_hourly,
    )

    rows = ts_seasonal_profile_hourly(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        assert {r["hour_of_day"] for r in rs} <= set(range(24))
        total_ppm = sum(r["share_ppm"] for r in rs)
        assert 1_000_000 - 24 <= total_ppm <= 1_000_000
        n_type = sum(r["n_events"] for r in rs)
        for r in rs:
            assert r["seasonal_x1000"] == r["n_events"] * 24000 // n_type
            assert r["share_ppm"] == r["n_events"] * 1000000 // n_type


def test_source_freshness_head_and_staleness(spark):
    """Exactly one source sits at the global head (staleness 0); every
    staleness equals head − source max; flags match the threshold."""
    from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
        monitor_source_freshness,
    )

    rows = monitor_source_freshness(spark, SF).collect()
    head = max(r["latest_doc_id"] for r in rows)
    assert sum(1 for r in rows if r["staleness_docs"] == 0) >= 1
    for r in rows:
        assert r["staleness_docs"] == head - r["latest_doc_id"]
        assert r["is_stale"] == (r["staleness_docs"] > 100)


def test_attribution_first_last_matches_pure_python(spark):
    """First/last-touch picks recomputed independently with the 7-day
    lookback and (ts, id) tiebreak; first <= last in view order."""
    import datetime as dt

    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        events_attribution_first_last,
    )

    got = {r["purchase_id"]: r for r in events_attribution_first_last(spark, SF).collect()}

    tbl = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    rows = list(zip(*(tbl.column(c).to_pylist() for c in
                      ("event_id", "ts", "user_id", "event_type", "value"))))
    views_by_user: dict[int, list] = {}
    for eid, ts, uid, et, _v in rows:
        if et == "view":
            views_by_user.setdefault(uid, []).append((ts, eid))
    want = {}
    for eid, ts, uid, et, v in rows:
        if et != "purchase":
            continue
        lo = ts - dt.timedelta(days=7)
        touches = sorted(
            (vt, vid) for vt, vid in views_by_user.get(uid, [])
            if lo <= vt < ts
        )
        if touches:
            want[eid] = (uid, round(v, 2), len(touches), touches[0][1], touches[-1][1])
    assert set(got) == set(want)
    for pid, (uid, rev, n, first, last) in want.items():
        r = got[pid]
        assert (r["user_id"], r["n_touches"], r["first_touch_id"], r["last_touch_id"]) == (
            uid, n, first, last,
        )


def test_time_to_convert_matches_pure_python(spark):
    """Latencies and rank-defined percentiles recomputed independently."""
    import math

    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        events_time_to_convert,
    )

    r = events_time_to_convert(spark, SF).collect()[0]

    tbl = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"])
    first_signup: dict[int, object] = {}
    rows = list(zip(*(tbl.column(c).to_pylist() for c in ("user_id", "event_type", "ts"))))
    for uid, et, ts in rows:
        if et == "signup" and (uid not in first_signup or ts < first_signup[uid]):
            first_signup[uid] = ts
    first_purch: dict[int, object] = {}
    for uid, et, ts in rows:
        if et == "purchase" and uid in first_signup and ts > first_signup[uid]:
            if uid not in first_purch or ts < first_purch[uid]:
                first_purch[uid] = ts

    def secs(t):
        return int(t.timestamp() * 1_000_000) // 1_000_000

    lats = sorted(
        (secs(first_purch[u]) - secs(first_signup[u]), u) for u in first_purch
    )
    vals = [l for l, _ in lats]
    n = len(vals)
    assert r["n_converted"] == n
    assert r["min_latency_s"] == vals[0]
    assert r["median_latency_s"] == vals[math.ceil(0.5 * n) - 1]
    assert r["p90_latency_s"] == vals[math.ceil(0.9 * n) - 1]
    assert r["max_latency_s"] == vals[-1]


def test_cohort_ltv_matches_pure_python(spark):
    """Cohort sizes, per-offset revenue (integer cents), and cumulative
    LTV recomputed independently; cumulative must be non-decreasing."""
    import datetime as dt

    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.eventseries import (
        events_cohort_ltv,
    )

    got = [tuple(r) for r in events_cohort_ltv(spark, SF).collect()]

    tbl = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts", "value"]
    )
    rows = list(zip(*(tbl.column(c).to_pylist() for c in
                      ("user_id", "event_type", "ts", "value"))))

    def week_start(t):
        d = t.date()
        return d - dt.timedelta(days=d.weekday())

    first: dict[int, object] = {}
    for uid, et, ts, _v in rows:
        if et == "signup" and (uid not in first or ts < first[uid]):
            first[uid] = ts
    cohort = {u: week_start(t) for u, t in first.items()}
    sizes: dict = {}
    for c in cohort.values():
        sizes[c] = sizes.get(c, 0) + 1
    rev: dict = {}
    for uid, et, ts, v in rows:
        if et != "purchase" or uid not in cohort:
            continue
        cw = cohort[uid]
        if ts.date() < cw:
            continue
        off = (week_start(ts) - cw).days // 7
        rev[(cw, off)] = rev.get((cw, off), 0) + round(v * 100)
    want = []
    for cw in sorted(sizes):
        cum = 0
        for off in sorted(o for c, o in rev if c == cw):
            cum += rev[(cw, off)]
            want.append(
                (cw, off, sizes[cw], round(rev[(cw, off)] / 100.0, 2),
                 round(cum / 100.0, 2))
            )
    assert got == want
    by_cohort: dict = {}
    for cw, off, _n, _r, cum in got:
        by_cohort.setdefault(cw, []).append(cum)
    for cums in by_cohort.values():
        assert cums == sorted(cums)


def test_events_value_nonnegative_invariant(spark):
    """Fixture-contract guard (r9 ADVICE): ts_seasonal_hourly_profile's
    integral half-up mean ((200·Σvc + n) div (2n)) is HALF_UP only for
    non-negative sums — both engines would still agree on negatives
    (both truncate toward zero), but the documented 4-dp HALF_UP
    semantic assumes events.value ≥ 0. Pin the invariant the formula
    relies on at every oracle SF so a fixture change cannot silently
    void it."""
    from pyspark.sql import functions as F

    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        row = (
            read_table(spark, f"/root/testdata/{sf}", "events")
            .agg(F.min("value").alias("mn"))
            .collect()[0]
        )
        assert row["mn"] >= 0, (sf, row["mn"])
