"""Concurrent-execution isolation: the claim the conf guard
(tests/test_plans.py::test_no_conf_set_in_query_bodies) has always
implied, proven by actually running it.

Eight registry queries — two streaming drains, a full medallion pipeline
replay, and five batch operators — run CONCURRENTLY in ONE session via a
thread pool, and every result must hash-match its serial run. This is
the test that fails if any query mutates the shared session conf (or any
other shared state) in a window another query can observe: the round-8
implementation of ``run_to_memory`` (save/restore ``spark.conf.set`` on
the shared session for the duration of a drain) is exactly the kind of
code this catches.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor

from databricks_end_to_end_lakeflow_project_spark import registry

SF = "/root/testdata/sf0.001"

# two streaming drains (builder-form run_to_memory w/ conf overrides), a
# 9-node pipeline replay (cloned-session eager section), and five batch
# shapes spanning join/agg/window/cdc/dedup
NAMES = [
    "stream_stateful_totals",
    "stream_stream_interval_join",
    "pipeline_medallion_scd_replay",
    "flagship_star_revenue",
    "q1_pricing_summary",
    "cdc_merge_upsert",
    "dedup_exact_prefix",
    "agg_group_having",
]


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _run(qs, name, spark):
    df = qs[name](spark, SF)
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(tuple(_canon(r[i]) for i in order) for r in df.collect())
    return (tuple(sorted(cols)), rows)


def test_concurrent_queries_match_serial(spark):
    qs = registry.all_queries()
    missing = [n for n in NAMES if n not in qs]
    assert not missing, missing

    serial = {n: _run(qs, n, spark) for n in NAMES}
    for n in NAMES:
        assert serial[n][1], f"{n}: serial run returned no rows"

    spark.catalog.clearCache()
    with ThreadPoolExecutor(max_workers=len(NAMES)) as ex:
        futs = {n: ex.submit(_run, qs, n, spark) for n in NAMES}
        concurrent = {n: f.result(timeout=600) for n, f in futs.items()}

    for n in NAMES:
        assert concurrent[n][0] == serial[n][0], f"{n}: column drift under concurrency"
        assert concurrent[n][1] == serial[n][1], (
            f"{n}: value drift under concurrency "
            f"(first diff: {next(((a, b) for a, b in zip(concurrent[n][1], serial[n][1]) if a != b), None)})"
        )
