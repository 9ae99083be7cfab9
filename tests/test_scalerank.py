"""operators/scalerank.py: exact distributed ranks/NTILE must match the
window-function forms bit-for-bit (they replace single-partition windows
in 5 registry queries) and must plan no unpartitioned WindowExec."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.scalerank import (
    RankSpec,
    ntile_from_rank,
    with_global_ranks,
    with_ntile,
)
from tests.test_plans import unpartitioned_windows


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _tied_frame(spark, n=500, seed=7):
    """Heavy-tie fixture: values drawn from a small domain so bins and
    tie-breaks are genuinely exercised."""
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 19), rng.random()) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long, noise double")


@pytest.mark.parametrize("tiles", [3, 7, 10])
@pytest.mark.parametrize("descending", [False, True])
def test_ntile_matches_window_form(spark, tiles, descending):
    df = _tied_frame(spark)
    got = with_ntile(df, tiles, "v", ["id"], "t", descending=descending)
    order = [F.col("v").desc() if descending else F.col("v"), F.col("id")]
    want = df.withColumn("t", F.ntile(tiles).over(Window.orderBy(*order)))
    assert (
        got.select("id", "t").exceptAll(want.select("id", "t")).count() == 0
        and got.count() == want.count()
    )


def test_rank_matches_row_number(spark):
    df = _tied_frame(spark)
    ranked, total = with_global_ranks(
        df, [RankSpec(out="r", value="v", tiebreaks=["id"])]
    )
    want = df.withColumn("r", F.row_number().over(Window.orderBy("v", "id")))
    assert total == df.count()
    assert ranked.select("id", "r").exceptAll(want.select("id", "r")).count() == 0


def test_multi_spec_shared_passes(spark):
    """Several orderings over one frame share the boundary + histogram
    passes and must each equal their window-form rank."""
    df = _tied_frame(spark)
    ranked, total = with_global_ranks(
        df,
        [
            RankSpec(out="ra", value="v", tiebreaks=["id"]),
            RankSpec(out="rd", value="v", tiebreaks=["id"], descending=True),
            RankSpec(out="rn", value="noise", tiebreaks=["id"]),
        ],
    )
    want = (
        df.withColumn("ra", F.row_number().over(Window.orderBy("v", "id")))
        .withColumn("rd", F.row_number().over(Window.orderBy(F.col("v").desc(), "id")))
        .withColumn("rn", F.row_number().over(Window.orderBy("noise", "id")))
    )
    assert (
        ranked.select("id", "ra", "rd", "rn")
        .exceptAll(want.select("id", "ra", "rd", "rn"))
        .count()
        == 0
    )
    assert total == df.count()


def test_ntile_formula_edge_cases(spark):
    """n < tiles (every rank its own tile) and n == tiles."""
    df = spark.createDataFrame([(i, i) for i in range(4)], "id long, v long")
    got = with_ntile(df, 10, "v", ["id"], "t").orderBy("id")
    assert [r["t"] for r in got.collect()] == [1, 2, 3, 4]
    got2 = with_ntile(df, 4, "v", ["id"], "t").orderBy("id")
    assert [r["t"] for r in got2.collect()] == [1, 2, 3, 4]


def test_constant_value_single_bin(spark):
    """Degenerate distribution: all values equal → one bin; ranks still
    exact via tie-breaks."""
    df = spark.createDataFrame([(i, 5) for i in range(50)], "id long, v long")
    ranked, total = with_global_ranks(
        df, [RankSpec(out="r", value="v", tiebreaks=["id"])]
    )
    rows = ranked.orderBy("id").collect()
    assert [r["r"] for r in rows] == list(range(1, 51))
    assert total == 50


def test_plan_has_no_unpartitioned_window(spark):
    df = _tied_frame(spark)
    ranked, _ = with_global_ranks(
        df,
        [
            RankSpec(out="ra", value="v", tiebreaks=["id"]),
            RankSpec(out="rd", value="v", tiebreaks=["id"], descending=True),
        ],
    )
    assert unpartitioned_windows(_plan(ranked)) == []


def test_ntile_from_rank_against_sql_ntile(spark):
    """Pure-arithmetic NTILE must equal the SQL window on every (n, k)
    in a grid, including the uneven-remainder cases."""
    for n in [1, 5, 9, 10, 11, 97]:
        df = spark.range(1, n + 1).withColumnRenamed("id", "r")
        for k in [1, 2, 3, 8]:
            got = df.select(
                "r", ntile_from_rank(F.col("r"), n, k).alias("t")
            ).orderBy("r")
            want = df.select(
                "r", F.ntile(k).over(Window.orderBy("r")).alias("t")
            ).orderBy("r")
            assert [x["t"] for x in got.collect()] == [
                x["t"] for x in want.collect()
            ], (n, k)


def test_cumsum_matches_window_form(spark):
    """with_global_cumsums must equal the single-partition running-sum
    window bit-for-bit (integer weights, heavy ties) and plan no
    unpartitioned WindowExec."""
    from databricks_end_to_end_lakeflow_project_spark.operators.scalerank import (
        with_global_cumsums,
    )

    df = _tied_frame(spark).withColumn("w1", (F.col("id") % 7)).withColumn(
        "w2", F.lit(1)
    )
    got, totals = with_global_cumsums(
        df, "v", ["id"], {"cs1": F.col("w1"), "cs2": F.col("w2")}
    )
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cs1", F.sum("w1").over(w)).withColumn(
        "cs2", F.sum("w2").over(w)
    )
    assert (
        got.select("id", "cs1", "cs2")
        .exceptAll(want.select("id", "cs1", "cs2"))
        .count()
        == 0
    )
    n = df.count()
    assert totals["cs2"] == n
    assert totals["cs1"] == df.agg(F.sum("w1")).collect()[0][0]
    assert unpartitioned_windows(_plan(got)) == []


@pytest.mark.parametrize("exclusive", [True, False])
def test_running_max_matches_window_form(spark, exclusive):
    """with_global_running_max must equal the single-partition running-max
    window (incl. the NULL leading rows of the exclusive frame) and plan
    no unpartitioned WindowExec."""
    from databricks_end_to_end_lakeflow_project_spark.operators.scalerank import (
        with_global_running_max,
    )

    df = _tied_frame(spark).withColumnRenamed("noise", "m")
    got = with_global_running_max(df, "id", "m", "rm", exclusive=exclusive)
    end = -1 if exclusive else 0
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, end)
    want = df.withColumn("rm", F.max("m").over(w))
    assert got.select("id", "rm").exceptAll(want.select("id", "rm")).count() == 0
    assert got.count() == want.count()
    assert unpartitioned_windows(_plan(got)) == []


def test_empty_input_frames(spark):
    """All three primitives must survive an empty input with typed null
    outputs and zero totals (the midnight-empty-partition case)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.scalerank import (
        with_global_cumsums,
        with_global_running_max,
    )

    df = spark.createDataFrame([], "id long, v long, m double")
    ranked, total = with_global_ranks(
        df, [RankSpec(out="r", value="v", tiebreaks=["id"])]
    )
    assert total == 0 and ranked.count() == 0
    assert dict(ranked.dtypes)["r"] == "bigint"

    cum, totals = with_global_cumsums(df, "v", ["id"], {"c": F.lit(1)})
    assert totals == {"c": 0} and cum.count() == 0

    rm = with_global_running_max(df, "id", "m", "hw")
    assert rm.count() == 0 and dict(rm.dtypes)["hw"] == "double"


# -- property-based equivalence (hypothesis) ----------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_rank_cases = st.tuples(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=120),
    st.booleans(),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=12),  # nbins — tiny values stress binning
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(case=_rank_cases)
def test_property_rank_and_ntile_match_window(spark, case):
    """For ANY value multiset, direction, tile count and bin count, the
    distributed rank/NTILE must equal the window forms exactly."""
    values, descending, tiles, nbins = case
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v long"
    )
    ranked, total = with_global_ranks(
        df,
        [RankSpec(out="r", value="v", tiebreaks=["id"], descending=descending, nbins=nbins)],
    )
    got = ranked.withColumn(
        "t", ntile_from_rank(F.col("r"), total, tiles)
    ).select("id", "r", "t")
    order = [F.col("v").desc() if descending else F.col("v"), F.col("id")]
    w = Window.orderBy(*order)
    want = df.select(
        "id",
        F.row_number().over(w).alias("r"),
        F.ntile(tiles).over(w).alias("t"),
    )
    assert got.exceptAll(want).count() == 0 and total == len(values)


def test_kernel_persists_input_single_scan(spark, tmp_path):
    """The kernel must materialize its input ONCE: the boundary sketch,
    the bin histogram, and the caller's final action all read the
    persisted frame, not three recomputations of the upstream. Pinned by
    counting per-partition evaluations of an instrumented source."""
    marker = tmp_path / "evals"
    marker.mkdir()

    def tag(batches):
        import os
        import uuid

        for b in batches:
            # one file per partition-evaluation; O_CREAT is atomic
            open(os.path.join(str(marker), uuid.uuid4().hex), "w").close()
            yield b

    src = (
        spark.range(0, 1000, 1, 4)
        .withColumn("v", (F.col("id") * 37) % 101)
        .mapInPandas(tag, "id long, v long")
    )
    ranked, total = with_global_ranks(src, [RankSpec(out="r", value="v", tiebreaks=["id"])])
    assert ranked.count() == 1000 and total == 1000
    evals = len(list(marker.iterdir()))
    # 4 partitions × 1 evaluation; without the persist this is 12 (3 passes)
    assert evals == 4, f"expected one evaluation per partition, saw {evals}"
    src.unpersist()


def test_monotone_bin_value_string_order(spark):
    """The string bin image must be monotone in Spark's UTF8_BINARY
    string order (ties allowed — shared 7-byte prefixes merge bins), so
    string-keyed ranks are exact."""
    from databricks_end_to_end_lakeflow_project_spark.operators.scalerank import (
        monotone_bin_value,
    )

    vals = [
        "", "a", "A", "ab", "abcdefg", "abcdefgh", "abcdefgz", "z",
        "ÿ", "日本語テキスト", "0", "00", "zz", "Zz", "~", " ",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = (
        df.withColumn("m", monotone_bin_value(F.col("s"), df.schema["s"].dataType))
        .orderBy("s")
        .collect()
    )
    ms = [r["m"] for r in rows]
    assert all(a <= b for a, b in zip(ms, ms[1:])), ms


def test_string_keyed_ranks_exact(spark):
    """End-to-end: ranking a STRING value via monotone_bin_value matches
    the window row_number over the same order."""
    from databricks_end_to_end_lakeflow_project_spark.operators.scalerank import (
        monotone_bin_value,
    )

    random.seed(11)
    alphabet = "abcXYZ0 ~ÿ日"
    vals = [
        "".join(random.choice(alphabet) for _ in range(random.randrange(0, 12)))
        for _ in range(400)
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, s string")
    spec = RankSpec(
        out="r",
        value="s",
        tiebreaks=["id"],
        bin_value=monotone_bin_value(F.col("s"), df.schema["s"].dataType),
        nbins=13,
    )
    ranked, total = with_global_ranks(df, [spec])
    want = df.select(
        "id", F.row_number().over(Window.orderBy("s", "id")).alias("r")
    )
    assert ranked.select("id", "r").exceptAll(want).count() == 0
    assert total == 400
