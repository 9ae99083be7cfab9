"""Deterministic-sampling invariants: the properties seeded Bernoulli
sampling can NOT guarantee and the hash-based ops must."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
    split_assign,
    stratified_hash_sample,
)
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return read_table(spark, SF, "documents")


def test_split_partition_invariant(spark):
    """Membership must be a pure row function: repartitioning the input
    (the thing a cluster resize does) must not move any document across
    splits."""
    docs = _docs(spark)
    a = docs.select("doc_id", split_assign(F.col("doc_id")).alias("s"))
    b = docs.repartition(13).select("doc_id", split_assign(F.col("doc_id")).alias("s"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_split_rates_and_totality(spark):
    """Every doc lands in exactly one split; fractions near 75/12.5/12.5
    within binomial noise at n=500."""
    docs = _docs(spark)
    counts = dict(
        docs.select(split_assign(F.col("doc_id")).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    n = docs.count()
    assert sum(counts.values()) == n
    assert abs(counts["train"] / n - 0.75) < 0.08
    assert abs(counts["val"] / n - 0.125) < 0.06
    assert abs(counts["test"] / n - 0.125) < 0.06


def test_stratified_rates(spark):
    """Per-language sample rates approximate the configured 256ths."""
    docs = _docs(spark)
    rate = (
        F.when(F.col("lang") == "en", 128)
        .when(F.col("lang") == "de", 64)
        .otherwise(32)
    )
    sampled = dict(
        stratified_hash_sample(docs, F.col("doc_id"), rate)
        .groupBy("lang").count().collect()
    )
    totals = dict(docs.groupBy("lang").count().collect())
    for lang, want in [("en", 0.5), ("de", 0.25), ("fr", 0.125)]:
        got = sampled.get(lang, 0) / totals[lang]
        # n per language is only 60-220 docs → generous binomial tolerance
        assert abs(got - want) < 0.14, (lang, got, want)


def test_stratified_sample_is_subset_and_rerun_stable(spark):
    """The sample is a subset of the corpus and identical when recomputed
    — reproducibility across reruns is the point of hash sampling."""
    docs = _docs(spark)
    rate = F.lit(64)
    s1 = stratified_hash_sample(docs, F.col("doc_id"), rate).select("doc_id")
    s2 = stratified_hash_sample(docs.repartition(7), F.col("doc_id"), rate).select(
        "doc_id"
    )
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    assert s1.join(docs, "doc_id", "left_anti").count() == 0


def test_weighted_reservoir_size_bias_and_partition_invariance(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        sample_weighted_reservoir,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.01"
    out = sample_weighted_reservoir(spark, sf)
    rows = out.collect()
    # 5 per language, unique docs
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert all(len(v) == 5 == len(set(v)) for v in per_lang.values())
    # size-biased: sampled docs should be longer than the corpus average
    corpus_mean = (
        read_table(spark, sf, "documents").agg({"n_chars": "avg"}).collect()[0][0]
    )
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean
    # deterministic under arbitrary repartitioning: same pick set
    docs = read_table(spark, sf, "documents").repartition(13, "source")
    docs.createOrReplaceTempView("___wr_docs")
    again = {(r["lang"], r["doc_id"]) for r in sample_weighted_reservoir(spark, sf).collect()}
    assert again == {(r["lang"], r["doc_id"]) for r in rows}


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """No verified near-dup pair may cross a split boundary, and the
    cluster-keyed split must still be the standard hash split for
    singleton documents."""
    from databricks_end_to_end_lakeflow_project_spark.operators.dedup import (
        dedup_minhash_lsh_pairs,
    )
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        sample_split_leakage_safe,
    )

    out = {r["doc_id"]: r for r in sample_split_leakage_safe(spark, SF).collect()}
    pairs = [(r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh_pairs(spark, SF).collect()]
    assert pairs  # corpus plants near-dups; the invariant must be exercised
    for a, b in pairs:
        assert out[a]["split"] == out[b]["split"]
        assert out[a]["cluster_id"] == out[b]["cluster_id"]
    # every split is populated at roughly the configured proportions
    from collections import Counter
    c = Counter(r["split"] for r in out.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_temporal_split_windows_are_disjoint_and_ordered(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        sample_split_temporal,
    )

    rows = {r["split"]: r for r in sample_split_temporal(spark, SF).collect()}
    assert set(rows) == {"train", "val", "test"}
    assert rows["train"]["to_ts"] <= rows["val"]["from_ts"]
    assert rows["val"]["to_ts"] <= rows["test"]["from_ts"]
    total = sum(r["n_events"] for r in rows.values())
    assert abs(rows["train"]["n_events"] / total - 0.8) < 0.01


def test_dsir_importance_matches_pure_python(spark, monkeypatch):
    """DSIR scores on a hand corpus must equal an independent pure-Python
    computation of the smoothed target/raw log-ratio model, and target
    docs must never be scored."""
    import math
    from collections import Counter

    from databricks_end_to_end_lakeflow_project_spark.operators import sampling

    rows = [
        (0, "ml data model data", "en", "src0", 0),     # target
        (1, "ml ml model", "en", "src0", 0),            # target
        (2, "data model data noise", "en", "srcX", 0),  # raw, target-like
        (3, "noise junk junk spam", "en", "srcY", 0),   # raw, off-target
        (4, "model data", "en", "srcX", 0),             # raw, target-like
    ]
    fake = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(sampling, "read_table", lambda s, d, n: fake)
    got = {r["doc_id"]: r for r in sampling.sample_dsir_importance(spark, "x").collect()}
    assert set(got) == {2, 3, 4}, "only raw-pool docs are scored"

    tc, rc = Counter(), Counter()
    for _, text, _, src, _ in rows:
        (tc if src == "src0" else rc).update(text.split(" "))
    vocab = set(tc) | set(rc)
    nt, nr, v = sum(tc.values()), sum(rc.values()), len(vocab)
    def lr(w):
        return math.log((tc[w] + 1) / (nt + v)) - math.log((rc[w] + 1) / (nr + v))
    for did, text, _, src, _ in rows:
        if src == "src0":
            continue
        toks = text.split(" ")
        want = round(sum(lr(w) for w in toks) / len(toks), 4)
        assert got[did]["avg_log_imp"] == want
        assert got[did]["n_tokens"] == len(toks)
    # target-like raw docs outrank the off-target one
    assert got[4]["avg_log_imp"] > got[3]["avg_log_imp"]
    assert got[2]["avg_log_imp"] > got[3]["avg_log_imp"]


def test_epoch_shuffle_is_permutation_and_partition_invariant(spark):
    """(shard, pos) must cover every doc exactly once with dense 1..n
    positions per shard, be identical under repartitioning, and be
    balanced across shards (uniform hash prefix)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        _EPOCH_SEED,
        _EPOCH_SHARDS,
        epoch_shuffle,
    )

    docs = _docs(spark)
    n = docs.count()
    out = epoch_shuffle(docs, F.col("doc_id"), _EPOCH_SEED, _EPOCH_SHARDS)
    rows = out.collect()
    assert len(rows) == n
    assert len({r["k"] for r in rows}) == n  # every doc exactly once
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert 0 <= shard < _EPOCH_SHARDS
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense ranks
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 3 * n / _EPOCH_SHARDS  # no hot shard
    again = epoch_shuffle(
        docs.repartition(13), F.col("doc_id"), _EPOCH_SEED, _EPOCH_SHARDS
    ).collect()
    assert {(r["k"], r["shard"], r["pos"]) for r in again} == {
        (r["k"], r["shard"], r["pos"]) for r in rows
    }


def test_epoch_shuffle_epoch_changes_order(spark):
    """A different epoch seed must produce a genuinely different
    permutation (that is the point of per-epoch shuffling)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        _EPOCH_SHARDS,
        epoch_shuffle,
    )

    docs = _docs(spark)
    e1 = {(r["k"], r["shard"], r["pos"]) for r in
          epoch_shuffle(docs, F.col("doc_id"), 1, _EPOCH_SHARDS).collect()}
    e2 = {(r["k"], r["shard"], r["pos"]) for r in
          epoch_shuffle(docs, F.col("doc_id"), 2, _EPOCH_SHARDS).collect()}
    assert len(e1 & e2) < len(e1) / 4  # almost every coordinate moved


def test_epoch_shuffle_sharded_write_preserves_training_order(spark, tmp_path):
    """The documented consumption pattern: repartition by shard, sort
    within partitions by pos, write partitioned by shard — reading any
    one shard file back yields its rows already in pos order, so a
    trainer streaming shards in (shard, pos) order replays the exact
    deterministic permutation with no sort at read time."""
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        _EPOCH_SEED,
        _EPOCH_SHARDS,
        epoch_shuffle,
    )

    docs = _docs(spark)
    out = epoch_shuffle(docs, F.col("doc_id"), _EPOCH_SEED, _EPOCH_SHARDS)
    dest = str(tmp_path / "epoch1")
    (
        out.repartition(_EPOCH_SHARDS, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .parquet(dest)
    )
    expected = {
        (r["shard"], r["pos"]): r["k"] for r in out.collect()
    }
    import glob

    shard_dirs = sorted(glob.glob(f"{dest}/shard=*"))
    assert len(shard_dirs) == len({s for s, _ in expected})
    seen = 0
    for sd in shard_dirs:
        shard = int(sd.rsplit("=", 1)[1])
        rows = spark.read.parquet(sd).collect()
        poss = [r["pos"] for r in rows]
        assert poss == sorted(poss)  # file order IS training order
        for r in rows:
            assert expected[(shard, r["pos"])] == r["k"]
            seen += 1
    assert seen == len(expected)


def test_token_budget_mixture_solver_invariants(spark):
    """The mixture solver's emitted counts must agree with its own
    arithmetic (full epochs x domain size + the fractional-pass count),
    full epochs must be floor(target/avail), the fractional threshold
    must encode the leftover epoch fraction, and emitted tokens must
    land within one fractional-sample noise band of the target."""
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        sample_token_budget_mixture,
    )

    rows = {r["domain"]: r for r in sample_token_budget_mixture(spark, SF).collect()}
    assert set(rows) == {"en", "de", "fr", "other"}
    budget = sum(r["avail_tokens"] for r in rows.values())
    weights = {"en": 0.30, "de": 0.25, "fr": 0.05, "other": 0.40}
    for d, r in rows.items():
        target = weights[d] * budget
        assert r["target_tokens"] == int(target)
        epochs = target / r["avail_tokens"]
        assert r["n_full_epochs"] == int(epochs)
        assert r["frac_threshold"] == int((epochs - int(epochs)) * 16777216.0)
        # emission agrees with the solver: full copies exactly, the
        # fractional pass within hash-sampling noise of its expectation
        assert r["n_docs_emitted"] >= r["n_docs"] * r["n_full_epochs"]
        assert r["emitted_tokens"] >= r["avail_tokens"] * r["n_full_epochs"]
        frac_tokens = r["emitted_tokens"] - r["avail_tokens"] * r["n_full_epochs"]
        expect_frac = (epochs - int(epochs)) * r["avail_tokens"]
        # 500-doc fixture: allow generous but bounded sampling noise
        assert abs(frac_tokens - expect_frac) <= 0.5 * r["avail_tokens"]
    # a rerun is bit-identical (pure function of the data)
    again = {r["domain"]: r for r in sample_token_budget_mixture(spark, SF).collect()}
    assert {d: tuple(r) for d, r in rows.items()} == {
        d: tuple(r) for d, r in again.items()
    }


def test_curriculum_order_pools_and_determinism(spark):
    """Epoch pools grow cumulatively by quartile; every epoch's order is
    a contiguous per-shard ranking; quartiles partition the corpus into
    near-equal bins; reruns are bit-identical; and different epochs
    genuinely reorder their common pool."""
    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        sample_curriculum_order,
    )

    rows = sample_curriculum_order(spark, SF).collect()
    n_docs = read_table(spark, SF, "documents").count()
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == {1, 2, 3}
    # cumulative pools: epoch e carries quartiles 1..e+1
    for e, rs in by_epoch.items():
        assert {r["quartile"] for r in rs} == set(range(1, e + 2))
        # per-shard positions are 1..len contiguous
        shards: dict[int, list[int]] = {}
        for r in rs:
            shards.setdefault(r["shard"], []).append(r["pos"])
        for poss in shards.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
    assert len(by_epoch[3]) == n_docs  # final epoch = full corpus
    assert abs(len(by_epoch[1]) - n_docs // 2) <= 2  # 2 of 4 quartiles
    # different epochs reshuffle: the common pool's (shard, pos) differ
    coords = {
        e: {r["doc_id"]: (r["shard"], r["pos"]) for r in rs}
        for e, rs in by_epoch.items()
    }
    common = set(coords[1]) & set(coords[2])
    assert any(coords[1][d] != coords[2][d] for d in common)
    again = sample_curriculum_order(spark, SF).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_negative_sampling_table_matches_pure_python(spark):
    """count^0.75 weights, fixed-point quantization, and ppm shares
    recomputed independently; shares must flatten relative to raw counts
    (the smoothing the 0.75 exponent exists for)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.sampling import (
        sample_negative_table_skipgram,
    )

    got = [tuple(r) for r in sample_negative_table_skipgram(spark, SF).collect()]

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    cnt = Counter(t for text in texts for t in text.strip().split(" "))
    wq = {t: round((float(c) ** 0.75) * 1000000000) for t, c in cnt.items()}
    total = sum(wq.values())
    top = sorted(wq.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = [(t, cnt[t], w, w * 1000000 // total) for t, w in top]
    assert got == want
    # smoothing: the heaviest token's sampled share sits below its raw share
    heavy = got[0]
    raw_share = cnt[heavy[0]] * 1000000 // sum(cnt.values())
    assert heavy[3] < raw_share
