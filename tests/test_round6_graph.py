"""Star-contraction connected components + bitext margin mining
(round-6 graph/similarity additions)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.dedup import (
    connected_components,
)
from databricks_end_to_end_lakeflow_project_spark.operators.graph import (
    connected_components_star,
    graph_cc_star_contraction,
)
from databricks_end_to_end_lakeflow_project_spark.operators.similarity import (
    sim_bitext_margin_pairs,
)

SF = "/root/testdata/sf0.001"


def _mapping(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_star_cc_equals_minlabel_cc(spark):
    """Star contraction and min-label propagation must produce the
    IDENTICAL node → min-reachable-id mapping (both are canonical)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (8, 9), (9, 7), (20, 21)], "src long, dst long"
    )
    nodes = spark.createDataFrame(
        [(n,) for n in [1, 2, 3, 7, 8, 9, 20, 21, 99]], "node long"
    )
    star = _mapping(connected_components_star(nodes, edges))
    label = _mapping(connected_components(nodes, edges, small_graph_rows=0))
    assert star == label
    assert star[99] == 99  # singleton untouched
    assert star[1] == star[3] == 1 and star[7] == star[9] == 7


def test_star_cc_path_graph_logarithmic_rounds(spark):
    """The adversarial case for O(diameter) kernels: a 5000-node PATH.
    Star contraction must converge in O(log² n) rounds (≲ 25 here) and
    find exactly one component — min-label propagation would need 5000
    rounds."""
    n = 5000
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    nodes = spark.range(n).select(F.col("id").alias("node"))
    stats: dict = {}
    comp = connected_components_star(nodes, edges, stats_out=stats)
    comps = comp.select("component").distinct().collect()
    assert len(comps) == 1 and comps[0]["component"] == 0
    assert comp.count() == n
    assert stats["rounds"] <= 25, stats


def test_star_cc_registry_query_shape(spark):
    rows = graph_cc_star_contraction(spark, SF).collect()
    assert rows
    sizes = [r["n_members"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert all(r["n_members"] >= 1 for r in rows)


def test_bitext_margin_vs_numpy(spark):
    """Full numpy replica of the margin-mining pipeline at sf0.001."""
    import duckdb

    got = sim_bitext_margin_pairs(spark, SF).collect()
    assert len(got) > 0
    margins = [r["margin"] for r in got]
    assert margins == sorted(margins, reverse=True)
    for r in got:
        assert r["src"] % 2 == 0 and r["dst"] % 2 == 1

    em = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    ids = em["vec_id"].to_numpy()
    mat = np.array([np.asarray(v, dtype=float) for v in em["embedding"]])
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    a_idx, b_idx = np.where(ids % 2 == 0)[0], np.where(ids % 2 == 1)[0]
    cos = np.round(unit[a_idx] @ unit[b_idx].T, 6)
    k = 4
    nn_a = np.sort(cos, axis=1)[:, ::-1][:, :k].mean(axis=1)
    nn_b = np.sort(cos, axis=0)[::-1][:k, :].mean(axis=0)
    margin = cos / ((nn_a[:, None] + nn_b[None, :]) / 2)
    # best mined pair must match numpy's argmax margin (6dp)
    best = got[0]
    i, j = np.unravel_index(np.argmax(margin), margin.shape)
    assert best["src"] == ids[a_idx][i] and best["dst"] == ids[b_idx][j]
    assert abs(best["margin"] - round(float(margin[i, j]), 6)) < 2e-6
