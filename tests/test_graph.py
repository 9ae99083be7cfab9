"""Iterative-graph invariants (operators/graph.py) and the sketch
percentile registry query."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.graph import (
    cooccurrence_edges,
    graph_pagerank_parts,
    pagerank,
)
from databricks_end_to_end_lakeflow_project_spark.operators.stats import (
    agg_approx_percentile,
)
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def test_edges_symmetric_no_self_loops(spark):
    e = cooccurrence_edges(read_table(spark, SF, "lineitem"))
    assert e.filter(F.col("src") == F.col("dst")).count() == 0
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert e.exceptAll(rev).count() == 0  # symmetric edge set


def test_pagerank_bounds_and_mass(spark):
    """Every rank ≥ the damping floor 0.15; with a symmetric graph (no
    dangling mass) total rank stays ≈ node count through the iterations."""
    e = cooccurrence_edges(read_table(spark, SF, "lineitem"))
    n_nodes = e.select("src").distinct().count()
    ranks = pagerank(e, n_iter=6)
    assert ranks.filter(F.col("rank") < 0.15).count() == 0
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - n_nodes) / n_nodes < 0.02


def test_pagerank_partition_invariant(spark):
    """Repartitioning the fact input must not change the top-50 (ranks
    are rounded to 6dp — far above float reduction-order noise)."""
    a = graph_pagerank_parts(spark, SF).collect()
    li = read_table(spark, SF, "lineitem").repartition(17)
    b_ranks = pagerank(cooccurrence_edges(li))
    b = (
        b_ranks.select(
            F.col("node").alias("part_id"), F.round("rank", 6).alias("pagerank")
        )
        .orderBy(F.desc("pagerank"), "part_id")
        .limit(50)
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_approx_percentile_query_orders_correctly(spark):
    """Every group reports its exact row count and all three GK
    rank-error contract flags TRUE (the sketch's guarantee held)."""
    rows = agg_approx_percentile(spark, SF).collect()
    assert rows
    li = read_table(spark, SF, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert r["n_rows"] == exact[r["l_returnflag"]]
        assert r["p50_in_bounds"] and r["p95_in_bounds"] and r["p99_in_bounds"]


def test_triangle_count_on_hand_graph(spark, tmp_path):
    """K4 minus one edge has exactly 2 triangles; per-node participation
    is 2 for the shared-edge endpoints and 1 for the others. Built as a
    fake lineitem where each 'order' is one edge."""
    from databricks_end_to_end_lakeflow_project_spark.operators.graph import (
        graph_triangle_count,
    )

    # nodes 4,8,12,16 (multiples of 4 to pass the op's deterministic
    # subsample); edges 4-8,4-12,4-16,8-12,8-16 (no 12-16) → 2 triangles
    edges = [(4, 8), (4, 12), (4, 16), (8, 12), (8, 16)]
    rows = []
    for oid, (a, b) in enumerate(edges):
        rows.append((oid, a)); rows.append((oid, b))
    d = str(tmp_path / "toy")
    spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01")
         for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    ).write.parquet(d + "/lineitem.parquet")
    got = {r["node"]: r["n_triangles"] for r in graph_triangle_count(spark, d).collect()}
    assert got == {4: 2, 8: 2, 12: 1, 16: 1}


def test_common_neighbors_candidates_not_linked_and_counts_exact(spark):
    """Every predicted pair must be UNLINKED in the co-order graph, its
    common-neighbor count must match a pure-Python recount, each anchor
    surfaces its per-anchor top-k exactly, and anchors stay in the
    bounded batch."""
    from databricks_end_to_end_lakeflow_project_spark.operators.graph import (
        _LINKPRED_ANCHORS,
        _LINKPRED_PER_ANCHOR,
        graph_common_neighbors_topk,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    got = graph_common_neighbors_topk(spark, sf).collect()
    assert len(got) > 0

    rows = read_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order: dict[int, set[int]] = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    nbrs: dict[int, set[int]] = {}
    for parts in by_order.values():
        for p in parts:
            nbrs.setdefault(p, set()).update(x for x in parts if x != p)
    by_anchor: dict[int, list] = {}
    for r in got:
        a, b = r["part_a"], r["part_b"]
        assert a <= _LINKPRED_ANCHORS
        assert b not in nbrs.get(a, set()), "predicted pair already linked"
        assert r["common_neighbors"] == len(nbrs[a] & nbrs[b])
        by_anchor.setdefault(a, []).append(r)
    for a, rs in by_anchor.items():
        assert len(rs) <= _LINKPRED_PER_ANCHOR
        want = sorted(
            (
                (len(nbrs[a] & nbrs[b]), b)
                for b in nbrs
                if b != a and b not in nbrs[a] and nbrs[a] & nbrs[b]
            ),
            key=lambda t: (-t[0], t[1]),
        )[:_LINKPRED_PER_ANCHOR]
        assert [(r["common_neighbors"], r["part_b"]) for r in rs] == want


def test_adamic_adar_matches_pure_python(spark):
    """AA scores (fixed-point 1/ln(deg) sums over shared neighbors,
    anchors only, unlinked pairs, per-anchor top-k) recomputed
    independently."""
    import math

    from databricks_end_to_end_lakeflow_project_spark.operators.graph import (
        _LINKPRED_ANCHORS,
        _LINKPRED_PER_ANCHOR,
        graph_adamic_adar_topk,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in graph_adamic_adar_topk(spark, sf).collect()]

    rows = read_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order: dict[int, set[int]] = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    nbrs: dict[int, set[int]] = {}
    for parts in by_order.values():
        for p in parts:
            nbrs.setdefault(p, set()).update(x for x in parts if x != p)
    aa_q = {v: round(1000000000.0 / math.log(len(ns))) for v, ns in nbrs.items()}
    want = []
    for a in sorted(nbrs):
        if a > _LINKPRED_ANCHORS:
            continue
        scored = [
            (sum(aa_q[n] for n in nbrs[a] & nbrs[b]), b)
            for b in nbrs
            if b != a and b not in nbrs[a] and nbrs[a] & nbrs[b]
        ]
        top = sorted(scored, key=lambda t: (-t[0], t[1]))[:_LINKPRED_PER_ANCHOR]
        want.extend((a, b, s) for s, b in top)
    assert got == want
