"""Partitioning strategies: salted joins for skewed keys, partitioned
sinks with partition-pruned reads, and explicit repartitioning.

Scale notes (100 TB) — these are the knobs the rest of the engine
assumes:

- **Salted join**: a shuffle join on a skewed key puts one key's entire
  row set on one reducer. Salting splits each key into S sub-keys —
  the big side gets a deterministic content-hash salt, the small side is
  replicated S× — bounding any reducer's share at 1/S of the hottest
  key. AQE's skew-join split (enabled in session.py) handles moderate
  skew at runtime; explicit salting is for the pathological tail where
  one key exceeds an executor, and composes with any join type Spark
  plans underneath (hash/SMJ). Results are bit-identical to the unsalted
  join — which is exactly what the DuckDB oracle checks.
- **Partitioned sink + pruning**: gold tables are laid out
  ``PARTITIONED BY`` low-cardinality audit/filter columns so selective
  reads list only matching directories (`PartitionFilters` in the scan,
  zero I/O for pruned partitions) — the file-layout complement to
  row-group min/max skipping.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.functions.compat import disc_price, dsum
from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's rows scattered over ``num_salts``
    sub-keys and the small side replicated to every sub-key.

    The salt is a content hash of the big side's row (deterministic —
    no rand(), so retried tasks and oracle replays agree); any salt
    distribution is correct, uniform ones balance best."""
    keys = list(keys)
    big_salted = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    )
    small_replicated = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return big_salted.join(small_replicated, [*keys, _SALT], how).drop(_SALT)


@query(
    "join_salted_skew",
    f"""
    SELECT o_orderpriority,
           ROUND(SUM({'CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))'}), 2)::DOUBLE AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim join (8 salts) + aggregate; the oracle is the
    plain unsalted join — salting must not change a single row."""
    li = read_table(spark, sf_dir, "lineitem")
    od = read_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    joined = salted_join(li, od, ["l_orderkey"], num_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        dsum(disc_price()).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "sink_partitioned_pruning",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sink_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-pruned read-back:
    orders written ``partitionBy(o_orderstatus)``, then only the 'F'
    directory is read (the scan shows PartitionFilters, not a filter over
    all rows). Oracle = the same aggregate straight off the source."""
    out = os.path.join(
        tempfile.gettempdir(),
        "lakeflow_partitioned",
        sf_dir.strip("/").replace("/", "_"),
        "orders_by_status",
    )
    od = read_table(spark, sf_dir, "orders")
    od.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    return (
        spark.read.parquet(out)
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
        )
    )


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int, path: str) -> None:
    """Bucketed external table: rows hash-clustered into ``buckets`` files
    per partition by ``key``, sorted within buckets. Joins/aggregations on
    ``key`` between co-bucketed tables need NO shuffle exchange — the
    bucketing IS the exchange, paid once at write time."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


@query(
    "sink_bucketed_colocated_join",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def sink_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing: lineitem and orders both written
    ``bucketBy(8, join-key)``, then joined — the physical plan has no
    shuffle exchange on either side (asserted in tests). At 100 TB this
    is the difference between re-shuffling the fact table per query and
    paying the shuffle once at ingest. Oracle = the same join straight
    off the source files."""
    # process-unique scratch: the bucketed copies are session-cached via
    # tableExists, but a CONCURRENT process (driver gate + local pytest)
    # sharing one path would overwrite files the other is mid-read on.
    # scratch.py prunes dead pids' leftovers and removes ours at exit.
    from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
        pid_scratch_dir,
        pid_tag,
    )

    tag = pid_tag(sf_dir)
    base = pid_scratch_dir("lakeflow_bucketed", sf_dir)
    li_tbl, od_tbl = f"li_bkt_{tag}", f"od_bkt_{tag}"
    if not spark.catalog.tableExists(li_tbl):
        li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(li, li_tbl, "l_orderkey", 8, os.path.join(base, "lineitem"))
    if not spark.catalog.tableExists(od_tbl):
        od = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
        write_bucketed(od, od_tbl, "o_orderkey", 8, os.path.join(base, "orders"))
    li, od = spark.table(li_tbl), spark.table(od_tbl)
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
    )


def compact_small_files(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = False,
) -> int:
    """Small-file compaction (the OPTIMIZE-style maintenance pass a
    streaming-ingest lakehouse needs: availableNow micro-batches leave
    one file per trigger per partition, and scan-task scheduling
    degrades once file count >> task count).

    Bin-packs a parquet directory into ceil(total_bytes / target_bytes)
    files. Default is `coalesce` — merges partitions WITHOUT a shuffle,
    which is the right trade for pure compaction at scale; pass
    shuffle=True to rebalance pathologically skewed file sizes at the
    cost of one exchange. Returns the output file count.

    Mirrors the role of Delta OPTIMIZE for the reference's bronze layer
    (append-only streaming ingest, SURVEY.md §2.1 S6) without a Delta
    dependency: write-to-new-dir keeps the operation atomic-by-rename at
    the directory level.
    """
    import math

    total = sum(
        f.stat().st_size
        for f in Path(src_dir).rglob("*.parquet")
        if f.is_file()
    )
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_dir)
    df = df.repartition(n) if shuffle else df.coalesce(n)
    df.write.mode("overwrite").parquet(dest_dir)
    return len([f for f in Path(dest_dir).rglob("part-*.parquet") if f.is_file()])


# ---------------------------------------------------------------------------
# Z-order clustering (OPTIMIZE ZORDER-style data-skipping layout)
# ---------------------------------------------------------------------------

_Z_BITS = 8  # 2^8 buckets per dimension → 16-bit interleaved key


def zorder_key(cols: Sequence[str], mins: dict, maxs: dict, bits: int = _Z_BITS):
    """Interleaved-bit (Morton) sort key over ``cols``, each normalized
    to ``2**bits`` equal-width buckets via the supplied global min/max.
    Pure JVM expressions (shifts + bitwise OR) — no UDF, stays inside
    whole-stage codegen."""
    n = len(cols)
    scale = (1 << bits) - 1
    bucket_exprs = []
    for c in cols:
        lo, hi = float(mins[c]), float(maxs[c])
        span = (hi - lo) or 1.0
        b = F.least(
            F.lit(scale),
            F.greatest(
                F.lit(0),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * scale).cast("int"),
            ),
        )
        bucket_exprs.append(b)
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, b in enumerate(bucket_exprs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b.cast("long"), bit).bitwiseAND(F.lit(1)), bit * n + i)
            )
    return z


def cluster_zorder(
    spark: SparkSession,
    df: DataFrame,
    cols: Sequence[str],
    out_dir: str,
    n_files: int = 16,
    bits: int = _Z_BITS,
) -> int:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the
    Morton (Z-order) curve over ``cols`` — the layout maintenance pass
    that makes parquet row-group/file min-max statistics selective on
    EVERY clustered column at once, where a plain sort is selective only
    on its leading column (Delta's OPTIMIZE ZORDER, re-expressed on open
    parquet).

    Cost model at 100 TB: one tiny global min/max aggregate (2 scalars
    per column), then exactly one range-exchange + in-partition sort —
    identical to what any global sort costs; the benefit (queries
    pruning most files on any clustered predicate) is paid for once per
    maintenance window. Returns the file count written. Numeric/date/
    timestamp columns supported (dates bucket via their day number).
    """
    numeric = {}
    for c in cols:
        dt = dict(df.dtypes)[c]
        if dt == "date":
            numeric[c] = F.datediff(F.col(c), F.lit("1970-01-01"))
        elif dt.startswith("timestamp"):
            numeric[c] = F.unix_micros(F.col(c).cast("timestamp"))
        else:
            numeric[c] = F.col(c)
    proj = df.select("*", *[e.alias(f"__n_{c}") for c, e in numeric.items()])
    stats = proj.agg(
        *[F.min(f"__n_{c}").alias(f"mn_{c}") for c in cols],
        *[F.max(f"__n_{c}").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    mins = {c: stats[f"mn_{c}"] for c in cols}
    maxs = {c: stats[f"mx_{c}"] for c in cols}
    z = zorder_key([f"__n_{c}" for c in cols],
                   {f"__n_{c}": mins[c] for c in cols},
                   {f"__n_{c}": maxs[c] for c in cols}, bits)
    (
        proj.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__n_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return len([p for p in Path(out_dir).glob("*.parquet")])


@query(
    "join_dynamic_partition_pruning",
    """
    SELECT o.o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is a parquet table
    partitioned by the JOIN key's hash bucket; the dimension filter is
    only known at runtime, so Catalyst injects a `dynamicpruning`
    subquery that evaluates the dim side FIRST and prunes fact
    partition directories before the scan. This is the mechanism that
    lets a 100 TB date-partitioned fact read only the days a filtered
    dimension touches — without any literal partition predicate in the
    query text. tests/test_plans.py asserts `dynamicpruning` appears in
    this plan and that the fact scan reads fewer partitions than exist.
    Oracle: same join/aggregate straight off the source table."""
    out = os.path.join(
        tempfile.gettempdir(),
        "lakeflow_partitioned",
        sf_dir.strip("/").replace("/", "_"),
        "orders_by_custbucket",
    )
    od = read_table(spark, sf_dir, "orders").withColumn(
        "cust_bucket", F.pmod(F.col("o_custkey"), F.lit(32))
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        od.write.mode("overwrite").partitionBy("cust_bucket").parquet(out)
    fact = spark.read.parquet(out).withColumn(
        "o_custkey", F.col("o_custkey").cast("long")
    )
    dim = (
        read_table(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000))
        .withColumn("cust_bucket", F.pmod(F.col("c_custkey"), F.lit(32)))
    )
    return (
        fact.join(dim, ["cust_bucket"])
        .filter(F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
        .orderBy("o_orderstatus")
    )


_SKEW_TARGET_ROWS = 10_000  # rows a single join task should carry


@query(
    "diag_key_skew_profile",
    f"""
    WITH per_key AS (
      SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ), tot AS (
      SELECT COUNT(*) AS n_keys, SUM(cnt) AS total, MAX(cnt) AS max_cnt
      FROM per_key
    )
    SELECT p.key, CAST(p.cnt AS BIGINT) AS cnt,
           CAST(FLOOR(p.cnt * 1000000 / t.total) AS BIGINT) AS share_ppm,
           CAST(t.n_keys AS BIGINT) AS n_keys,
           CAST(t.max_cnt AS BIGINT) AS max_cnt,
           CAST(FLOOR(t.max_cnt * t.n_keys * 1000 / t.total) AS BIGINT)
             AS skew_x1000,
           CAST(FLOOR((t.max_cnt + {_SKEW_TARGET_ROWS - 1})
                      / {_SKEW_TARGET_ROWS}) AS BIGINT) AS salt_factor
    FROM per_key p CROSS JOIN tot t
    ORDER BY p.cnt DESC, p.key LIMIT 10
    """,
)
def diag_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle skew diagnosis — the profile you run BEFORE picking a
    salting factor or trusting AQE's skew-join split on a 100 TB join
    key: the 10 heaviest keys with their row share (ppm), the key-space
    size, the hottest key's absolute count, the skew ratio
    (max/mean, x1000 — 1000 means perfectly uniform), and the salt
    factor that would cap any single task at ~{_SKEW_TARGET_ROWS} rows
    (`salted_join`'s input parameter, computed instead of guessed).

    Everything is integer arithmetic on exact counts (shares in ppm,
    ratios x1000 via integer cross-multiplication — the repo's
    cross-engine exactness rule). One partial-aggregatable groupBy on
    the key, a 1-row totals broadcast, top-10 via TakeOrdered — the
    profile costs one scan regardless of key-space size."""
    per_key = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
    )
    t = _SKEW_TARGET_ROWS
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "key",
            F.col("cnt").cast("long").alias("cnt"),
            F.floor(F.col("cnt") * 1000000 / F.col("total"))
            .cast("long")
            .alias("share_ppm"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("max_cnt").cast("long").alias("max_cnt"),
            F.floor(F.col("max_cnt") * F.col("n_keys") * 1000 / F.col("total"))
            .cast("long")
            .alias("skew_x1000"),
            F.floor((F.col("max_cnt") + (t - 1)) / t)
            .cast("long")
            .alias("salt_factor"),
        )
        .orderBy(F.col("cnt").desc(), "key")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# round-6 addition (session 2): Z-ORDER layout audit (OPTIMIZE ZORDER parity)
# ---------------------------------------------------------------------------

_Z_FILES = 16  # target file count for the simulated OPTIMIZE rewrite
_Z_EPOCH = "1995-01-01"  # corpus min orderdate (TESTDATA contract window)


def _z_bits_sql(bd: str, bc: str) -> str:
    """Morton/Z-value of two 8-bit buckets as pure integer arithmetic —
    the same string parses in Spark SQL and DuckDB (div vs // avoided:
    both support %, *, + and CAST; the bit test (x // 2^i) % 2 is
    written with FLOOR-free integer ops via CAST)."""
    terms = []
    for i in range(8):
        terms.append(f"(({bd} % {1 << (i + 1)}) - ({bd} % {1 << i})) * {1 << (i + 1)}")
        terms.append(f"(({bc} % {1 << (i + 1)}) - ({bc} % {1 << i})) * {1 << i}")
    return " + ".join(terms)


@query(
    "sink_zorder_layout_audit",
    f"""
    WITH base AS (
      SELECT o_orderkey,
             DATE_DIFF('day', DATE '{_Z_EPOCH}',
                       CAST(o_orderdate AS DATE)) AS d,
             o_custkey
      FROM orders
    ),
    mx AS (SELECT MAX(o_custkey) AS maxc FROM base),
    bkt AS (
      SELECT o_orderkey, d,
             LEAST(255, d // 10) AS bd,
             (o_custkey * 256) // (maxc + 1) AS bc
      FROM base, mx
    ),
    zed AS (
      SELECT o_orderkey, d, bd, bc,
             {_z_bits_sql('bd', 'bc')} AS z
      FROM bkt
    ),
    filed AS (
      SELECT bd, bc,
             NTILE({_Z_FILES}) OVER (ORDER BY d, o_orderkey) AS f_lin,
             NTILE({_Z_FILES}) OVER (ORDER BY z, o_orderkey) AS f_z
      FROM zed
    ),
    lin AS (
      SELECT 'linear' AS layout, f_lin AS f,
             MAX(bd) - MIN(bd) + 1 AS bd_span,
             MAX(bc) - MIN(bc) + 1 AS bc_span
      FROM filed GROUP BY f_lin
    ),
    zor AS (
      SELECT 'zorder' AS layout, f_z AS f,
             MAX(bd) - MIN(bd) + 1 AS bd_span,
             MAX(bc) - MIN(bc) + 1 AS bc_span
      FROM filed GROUP BY f_z
    ),
    layouts AS (SELECT * FROM lin UNION ALL SELECT * FROM zor)
    SELECT layout, COUNT(*) AS n_files,
           SUM(bd_span) AS sum_date_span, MAX(bd_span) AS max_date_span,
           SUM(bc_span) AS sum_cust_span, MAX(bc_span) AS max_cust_span
    FROM layouts GROUP BY layout ORDER BY layout
    """,
)
def sink_zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout audit for multi-dimensional file skipping — the
    compute core of Delta's OPTIMIZE ZORDER BY (orderdate, custkey)
    (reference runs on Databricks where this is the table-maintenance
    story; `cdc_table_optimize` covers compaction, this covers
    CLUSTERING): simulate rewriting orders into {_Z_FILES} files under
    (a) a linear sort on orderdate and (b) a Morton/Z-curve interleave
    of the 8-bit orderdate × custkey buckets, then report each file's
    min/max span per dimension — the exact statistics a reader's
    min/max pruning sees. Linear layout gives perfect date spans and
    USELESS custkey spans (every file covers the full key range);
    Z-order bounds BOTH dims near √(buckets·files/…), which is why a
    two-dimensional filter workload skips more files under it.

    Plan shape: the Z-value is pure integer arithmetic (bit test via
    (x mod 2^{{i+1}} − x mod 2^i) — no UDF, whole-stage codegen); file
    assignment is EXACT NTILE via the scalerank three-stage kernel (no
    global window, no global sort); the two layouts reuse one persisted
    bucketed frame. At 100 TB this is the same plan OPTIMIZE runs:
    range-partition by the clustering key, write each range as a file.
    """
    from databricks_end_to_end_lakeflow_project_spark.operators.scalerank import (
        with_ntile,
    )
    from databricks_end_to_end_lakeflow_project_spark.session import persist_once

    od = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_custkey"
    )
    maxc = od.agg(F.max("o_custkey")).collect()[0][0]
    d = F.datediff(F.col("o_orderdate").cast("date"), F.lit(_Z_EPOCH).cast("date"))
    base = od.select(
        "o_orderkey",
        d.alias("d"),
        F.least(F.lit(255), F.expr(
            f"DATEDIFF(CAST(o_orderdate AS DATE), DATE'{_Z_EPOCH}') div 10"
        )).alias("bd"),
        F.expr(f"(o_custkey * 256) div ({int(maxc)} + 1)").alias("bc"),
    )
    zed = persist_once(
        base.withColumn("z", F.expr(_z_bits_sql("bd", "bc")))
    )
    lin = with_ntile(zed, _Z_FILES, "d", ["o_orderkey"], "f")
    zor = with_ntile(zed, _Z_FILES, "z", ["o_orderkey"], "f")

    def spans(df: DataFrame, layout: str) -> DataFrame:
        return df.groupBy("f").agg(
            (F.max("bd") - F.min("bd") + 1).alias("bd_span"),
            (F.max("bc") - F.min("bc") + 1).alias("bc_span"),
        ).select(F.lit(layout).alias("layout"), "bd_span", "bc_span")

    both = spans(lin, "linear").unionByName(spans(zor, "zorder"))
    return (
        both.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bd_span").alias("sum_date_span"),
            F.max("bd_span").alias("max_date_span"),
            F.sum("bc_span").alias("sum_cust_span"),
            F.max("bc_span").alias("max_cust_span"),
        )
        .orderBy("layout")
    )


# ---------------------------------------------------------------------------
# round-7 addition: partition-level manifest audit
# ---------------------------------------------------------------------------


@query(
    "sink_partition_manifest",
    """
    SELECT o_orderstatus AS order_status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_checksum
    FROM orders GROUP BY o_orderstatus ORDER BY order_status
    """,
)
def sink_partition_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level publish manifest: write orders PARTITIONED BY
    status to a scratch sink, then read each partition directory BACK
    and emit (rows, key checksum, integer-cents value checksum) per
    partition — the Iceberg/Delta manifest-summary analogue that lets a
    downstream consumer (or this oracle) verify a partitioned publish
    without rescanning the source. The value-hash twin of
    [[sink_partitioned_pruning]] (which verifies the pruning side).

    Exactness: both checksums are exact integer sums computed FROM THE
    SINK; the oracle recomputes them from the source, so any row lost,
    duplicated, or value-mangled by the partitioned write round trip
    hash-fails. Plan: one partitioned write (shuffle on the partition
    key), one partition-pruned read-back aggregate.
    """
    import os as _os

    from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
        ephemeral_dir,
    )

    od = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = _os.path.join(ephemeral_dir("manifest_"), "orders_by_status")
    od.repartition("o_orderstatus").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("o_orderstatus").alias("order_status"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_checksum"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents_checksum"),
        )
        .orderBy("order_status")
    )
