from __future__ import annotations

import pytest

from databricks_end_to_end_lakeflow_project_spark import registry

QUERIES = registry.all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_has_rows(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    # schema is resolvable and the query executes; most queries must be
    # non-vacuous at sf0.001 (a few highly selective ones may be empty)
    assert df.columns
    n = df.count()
    assert n >= 0


def test_every_oracle_has_query():
    oracles = registry.all_oracles()
    assert set(oracles) <= set(QUERIES)
    # bulk of the surface should be oracle-checked, not rows-only
    assert len(oracles) >= 0.8 * len(QUERIES)


def test_topk_per_group_primitive(spark, sf_dir):
    from pyspark.sql import functions as F

    from databricks_end_to_end_lakeflow_project_spark.operators.windows import topk_per_group
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

    od = read_table(spark, sf_dir, "orders")
    top2 = topk_per_group(od, ["o_custkey"], [F.col("o_totalprice").desc(), "o_orderkey"], 2)
    sizes = top2.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    assert sizes <= 2


def test_binaryfile_manifest_matches_python_read(spark):
    """The binaryFile source must deliver byte-exact content: lengths and
    md5 digests equal Python's own read of the same files."""
    import hashlib
    import os

    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        source_binaryfile_manifest,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["file_name"]: (r["length"], r["content_md5"])
        for r in source_binaryfile_manifest(spark, sf).collect()
    }
    want = {}
    for name in os.listdir(sf):
        if name.endswith(".parquet"):
            data = open(os.path.join(sf, name), "rb").read()
            want[name] = (len(data), hashlib.md5(data).hexdigest())
    assert got == want and len(got) >= 10


def test_scratch_pid_dir_lifecycle(tmp_path, monkeypatch):
    """Dead processes' pid-tagged scratch dirs are pruned on first use;
    this process's own dirs are registered and legacy untagged dirs are
    left alone."""
    import os

    from databricks_end_to_end_lakeflow_project_spark.sources import scratch

    monkeypatch.setattr(scratch.tempfile, "gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(scratch, "_pruned", False)
    base = tmp_path / "lakeflow_sources"
    base.mkdir()
    (base / "sf_x_999999999").mkdir()  # dead pid
    (base / f"sf_x_{os.getpid()}").mkdir()  # us
    (base / "sf_x_legacy").mkdir()  # no pid suffix

    d = scratch.pid_scratch_dir("lakeflow_sources", "/data/sf_y", "json")
    assert not (base / "sf_x_999999999").exists(), "dead pid dir must be pruned"
    assert (base / f"sf_x_{os.getpid()}").exists(), "own dirs survive"
    assert (base / "sf_x_legacy").exists(), "untagged dirs are left alone"
    assert d.endswith(os.path.join(f"data_sf_y_{os.getpid()}", "json"))
    top = os.path.dirname(d)
    assert top in scratch._own_dirs, "own dir registered for atexit removal"
