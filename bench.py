"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a cheap count-style action so the measured time
is plan execution, not result serialization to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from databricks_end_to_end_lakeflow_project_spark.session import get_spark  # noqa: E402
from databricks_end_to_end_lakeflow_project_spark import registry  # noqa: E402

# Headline set: the flagship star join + the canonical agg/join/topk shapes,
# plus one representative per operator family (window, as-of, CDC merge,
# event-time window, LLM-ops dedup/similarity, Arrow UDF path).
HEADLINE = [
    "flagship_star_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "q21_sole_late_supplier",
    "win_topk_per_group",
    "join_asof_backward",
    "cdc_merge_upsert",
    "stream_tumbling_window",
    "stream_stream_interval_join",
    "dedup_minhash_lsh_pairs",
    "sim_cosine_topk",
    "udf_map_in_pandas",
    "text_quality_score",
    "text_chunk_fixed",
    "sample_split_train_val_test",
    "dedup_contamination_ngram",
    "events_sessionize",
    "text_bm25_topk",
    "text_tfidf_keywords",
    "text_heavy_hitters_topk",
    "sim_jl_projection",
    "cdc_scd2_history",
    "retrieval_hybrid_rrf",
    "dedup_semdedup_keep",
    "text_bigram_nll",
    "stream_chained_window_agg",
    "ts_autocorr_lags",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    except ValueError:
        sf = -1.0  # unrecognized dir layout; still run and report
    spark = get_spark("lakeflow-bench")
    qs = registry.all_queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE and n.startswith("bench_")
    ]

    # warm the JVM + file listing once with the cheapest query
    qs[names[0]](spark, sf_dir).count()

    # min-of-N damps same-machine load noise (±30% observed run-to-run);
    # the min is the least-interfered measurement of the same fixed plan
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    times: dict[str, float] = {}
    for name in names:
        # drop persisted frames leaked by earlier queries (e.g. LSH shingle
        # cache): accumulated storage memory evicts shuffle/exec memory and
        # skews later measurements by 2-3x
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(max(1, repeat)):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
