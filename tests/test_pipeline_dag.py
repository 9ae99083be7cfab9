from __future__ import annotations

import pytest

from databricks_end_to_end_lakeflow_project_spark.pipeline.dag import Pipeline
from databricks_end_to_end_lakeflow_project_spark.pipeline.expectations import (
    ExpectationFailed,
    Policy,
    apply_expectations,
)


@pytest.fixture
def df(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (None, "d")], "id int, val string"
    )


def test_expect_drop(df):
    out, m = apply_expectations(
        df, {"id_set": "id IS NOT NULL", "val_set": "val IS NOT NULL"}, Policy.DROP, "ds"
    )
    assert out.count() == 2
    assert m.failed_rows == 2 and m.passed_rows == 2
    assert m.per_rule_failures == {"id_set": 1, "val_set": 1}


def test_expect_warn_keeps_rows(df):
    out, m = apply_expectations(df, {"id_set": "id IS NOT NULL"}, Policy.WARN, "ds")
    assert out.count() == 4
    assert m.failed_rows == 1


def test_expect_fail_raises(df):
    with pytest.raises(ExpectationFailed):
        apply_expectations(df, {"id_set": "id IS NOT NULL"}, Policy.FAIL, "ds")


def test_expect_fail_passes_when_clean(df):
    clean = df.filter("id IS NOT NULL AND val IS NOT NULL")
    out, m = apply_expectations(clean, {"id_set": "id IS NOT NULL"}, Policy.FAIL, "ds")
    assert m.failed_rows == 0 and out.count() == 2


def test_pipeline_cycle_detection(spark, tmp_path):
    p = Pipeline(spark, str(tmp_path))

    @p.view(name="a")
    def a(pl):
        return pl.read("b")

    @p.view(name="b")
    def b(pl):
        return pl.read("a")

    with pytest.raises(ValueError, match="cycle"):
        p.read("a")


def test_pipeline_view_chaining(spark, tmp_path, df):
    p = Pipeline(spark, str(tmp_path))

    @p.view(name="src")
    def src(pl):
        return df

    @p.view(name="doubled")
    def doubled(pl):
        from pyspark.sql import functions as F

        return pl.read("src").withColumn("id2", F.col("id") * 2)

    assert p.read("doubled").filter("id2 = 6").count() == 1


def test_cdc_flow_requires_declared_table(spark, tmp_path):
    p = Pipeline(spark, str(tmp_path))
    with pytest.raises(KeyError):
        p.create_auto_cdc_flow(target="missing", source="src", keys=["k"], sequence_by="s")


def test_observed_expectations_single_pass(spark):
    """Observation-based expectations: metrics come from the SAME action
    that materializes the gated frame — counts must match the classic
    two-pass variant, including rows dropped by the gate."""
    from databricks_end_to_end_lakeflow_project_spark.pipeline.expectations import (
        Policy,
        apply_expectations,
        apply_expectations_observed,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c"), (4, "d")], "id int, name string"
    )
    rules = {"id_set": "id IS NOT NULL", "name_set": "name IS NOT NULL"}

    gated, _, finish = apply_expectations_observed(df, rules, Policy.DROP, "t")
    kept = gated.count()  # the one action; metrics piggyback on it
    got = finish()

    _, want = apply_expectations(df, rules, Policy.DROP, "t")
    assert kept == 2
    assert got.failed_rows == want.failed_rows == 2
    assert got.passed_rows == want.passed_rows == 2
    assert got.per_rule_failures == want.per_rule_failures
