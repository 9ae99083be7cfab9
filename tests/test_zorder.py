"""Z-order clustering (operators/partitioning.py cluster_zorder):
row preservation and actual file-level data-skipping effectiveness,
measured from the written parquet min/max statistics."""

from __future__ import annotations

import pyarrow.parquet as pq
from pathlib import Path

from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.partitioning import (
    cluster_zorder,
)
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"
N_FILES = 16


def _file_ranges(out_dir: str, cols):
    """Per-file (min, max) of each column from parquet footer stats."""
    out = []
    for p in sorted(Path(out_dir).glob("*.parquet")):
        md = pq.ParquetFile(p).metadata
        rng = {}
        for c in cols:
            idx = md.schema.to_arrow_schema().get_field_index(c)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            rng[c] = (lo, hi)
        out.append(rng)
    return out


def _files_overlapping(ranges, col, lo, hi):
    return sum(1 for r in ranges if not (r[col][1] < lo or r[col][0] > hi))


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice"
    )
    zdir = str(tmp_path / "z")
    rdir = str(tmp_path / "r")
    n = cluster_zorder(spark, li, ["l_partkey", "l_suppkey"], zdir, n_files=N_FILES)
    assert n == N_FILES
    # baseline: same file count, no clustering (round-robin repartition)
    li.repartition(N_FILES).write.mode("overwrite").parquet(rdir)

    # rows preserved exactly
    assert spark.read.parquet(zdir).count() == li.count()

    zr = _file_ranges(zdir, ["l_partkey", "l_suppkey"])
    rr = _file_ranges(rdir, ["l_partkey", "l_suppkey"])

    pk_max = li.agg(F.max("l_partkey")).collect()[0][0]
    sk_max = li.agg(F.max("l_suppkey")).collect()[0][0]
    # a 10%-wide probe on EACH dimension independently: z-order must let
    # file stats prune a majority of files on either column; the
    # unclustered layout overlaps essentially every file
    probes = [
        ("l_partkey", 0, int(pk_max * 0.1)),
        ("l_suppkey", 0, int(sk_max * 0.1)),
    ]
    for col, lo, hi in probes:
        z_hit = _files_overlapping(zr, col, lo, hi)
        r_hit = _files_overlapping(rr, col, lo, hi)
        assert r_hit >= N_FILES - 1  # unclustered: no skipping
        assert z_hit <= N_FILES // 2, (col, z_hit)  # clustered: real pruning


def test_zorder_date_dimension(spark, tmp_path):
    """Date columns bucket via day number; clustering on (shipdate,
    partkey) must prune a one-month shipdate probe."""
    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    )
    zdir = str(tmp_path / "zd")
    cluster_zorder(spark, li, ["l_shipdate", "l_partkey"], zdir, n_files=N_FILES)
    zr = _file_ranges(zdir, ["l_shipdate"])
    import datetime

    # l_shipdate is a (ntz) timestamp in the testdata; footer stats
    # deserialize as datetime.datetime
    lo = datetime.datetime(1994, 1, 1)
    hi = datetime.datetime(1994, 1, 31, 23, 59, 59)
    z_hit = _files_overlapping(zr, "l_shipdate", lo, hi)
    assert z_hit <= N_FILES // 2


def test_key_skew_profile_matches_pure_python(spark):
    """Profile recomputed independently from the parquet: per-key counts,
    ppm shares, skew ratio and salt factor — all integer-exact."""
    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.partitioning import (
        _SKEW_TARGET_ROWS,
        diag_key_skew_profile,
    )

    sf = "/root/testdata/sf0.01"
    got = [tuple(r) for r in diag_key_skew_profile(spark, sf).collect()]

    keys = pq.read_table(f"{sf}/orders.parquet", columns=["o_custkey"]).column(
        "o_custkey"
    ).to_pylist()
    cnt: dict[int, int] = {}
    for k in keys:
        cnt[k] = cnt.get(k, 0) + 1
    n_keys, total, max_cnt = len(cnt), sum(cnt.values()), max(cnt.values())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = [
        (
            k,
            c,
            c * 1000000 // total,
            n_keys,
            max_cnt,
            max_cnt * n_keys * 1000 // total,
            (max_cnt + _SKEW_TARGET_ROWS - 1) // _SKEW_TARGET_ROWS,
        )
        for k, c in top
    ]
    assert got == want
