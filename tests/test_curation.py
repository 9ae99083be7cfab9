"""Corpus-curation & behavioral-analytics invariants (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.curation import (
    PACK_BUDGET,
    dedup_contamination_ngram,
    events_funnel_conversion,
    events_retention_cohorts,
    events_sessionize,
    pack_sequences_token_budget,
    sample_temperature_mixture,
    text_repetition_gopher,
)
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"


def test_repetition_features_bounded(spark):
    """Shares and ratios are in (0, 1]; every document gets a row."""
    rep = text_repetition_gopher(spark, SF)
    n_docs = read_table(spark, SF, "documents").count()
    assert rep.count() == n_docs
    bad = rep.filter(
        (F.col("top_bigram_share") <= 0)
        | (F.col("top_bigram_share") > 1)
        | (F.col("uniq_token_ratio") <= 0)
        | (F.col("uniq_token_ratio") > 1)
    )
    assert bad.count() == 0


def test_contamination_never_flags_benchmark_docs(spark):
    """The benchmark slice itself (hash digit '0') must not appear as a
    contaminated corpus document, and every hit count is positive."""
    hits = dedup_contamination_ngram(spark, SF)
    flagged_in_bench = hits.filter(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1) == "0"
    )
    assert flagged_in_bench.count() == 0
    assert hits.filter(F.col("n_contaminated_grams") <= 0).count() == 0
    assert hits.count() > 0  # non-vacuous on this corpus


def test_packing_preserves_tokens_and_caps_bins(spark):
    """Packing must conserve total tokens exactly, and every bin except
    possibly the last per shard stays within budget + one straddling doc."""
    docs = read_table(spark, SF, "documents")
    total = docs.select(
        F.sum(F.size(F.split(F.trim(F.col("text")), " "))).alias("t")
    ).collect()[0]["t"]
    bins = pack_sequences_token_budget(spark, SF)
    assert bins.agg(F.sum("n_tokens")).collect()[0][0] == total
    # a bin holds < budget + the max single doc length that straddles in
    max_doc = docs.select(
        F.max(F.size(F.split(F.trim(F.col("text")), " "))).alias("m")
    ).collect()[0]["m"]
    assert bins.filter(F.col("n_tokens") >= PACK_BUDGET + max_doc).count() == 0


def test_temperature_mixture_flattens_and_normalizes(spark):
    rows = sample_temperature_mixture(spark, SF).collect()
    assert abs(sum(r["temp_rate"] for r in rows) - 1.0) < 1e-2  # rates sum to ~1
    for r in rows:  # sqrt scaling pulls every language toward uniform
        if r["token_share"] > 1 / len(rows):
            assert r["temp_rate"] <= r["token_share"] + 1e-9
        else:
            assert r["temp_rate"] >= r["token_share"] - 1e-9


def test_sessionize_counts_consistent(spark):
    """Sessions per user are between 1 and n_events; totals cover the log."""
    s = events_sessionize(spark, SF)
    ev = read_table(spark, SF, "events")
    assert s.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    bad = s.filter(
        (F.col("n_sessions") < 1) | (F.col("n_sessions") > F.col("n_events"))
    )
    assert bad.count() == 0


def test_funnel_and_cohorts_shape(spark):
    f = events_funnel_conversion(spark, SF).collect()[0]
    assert 0 <= f["n_converted"] <= f["n_signup_users"]
    assert 0.0 <= f["conv_rate"] <= 1.0
    coh = events_retention_cohorts(spark, SF)
    assert coh.filter(F.col("week_offset") < 0).count() == 0
    # week-0 actives per cohort == cohort size (every user is active in
    # the week of their own first event)
    n_users = read_table(spark, SF, "events").select("user_id").distinct().count()
    week0 = coh.filter(F.col("week_offset") == 0).agg(F.sum("n_active_users"))
    assert week0.collect()[0][0] == n_users


def test_pretraining_export_invariants(spark):
    """The capstone export must (a) cover all three splits, (b) never
    exceed the gated-corpus size after dedup, and (c) keep per-split
    average quality at or above the gate threshold."""
    from databricks_end_to_end_lakeflow_project_spark.operators.curation import (
        pipeline_pretraining_export,
    )

    rows = {r["split"]: r for r in pipeline_pretraining_export(spark, SF).collect()}
    assert set(rows) == {"train", "val", "test"}
    total_docs = sum(r["n_docs"] for r in rows.values())
    n_corpus = read_table(spark, SF, "documents").count()
    assert 0 < total_docs < n_corpus  # gate + dedup both removed something
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]
    for r in rows.values():
        assert r["avg_quality"] >= 0.55
        assert r["total_tokens"] > 0


def test_source_reputation_gate_matches_pure_python(spark):
    """Gate semantics recomputed independently in pure Python from the
    same parquet: per-source fixed-point mean quality, pass iff source
    mean >= corpus mean (integer cross-multiplication), kept = docs at
    or above their source's mean within passing sources."""
    from databricks_end_to_end_lakeflow_project_spark.operators.curation import (
        curation_source_reputation_gate,
    )

    got = {r["source"]: r for r in curation_source_reputation_gate(spark, SF).collect()}

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
    per = {}
    for source, text in zip(
        tbl.column("source").to_pylist(), tbl.column("text").to_pylist()
    ):
        w = text.strip().split(" ")
        n = float(len(w))
        score = (
            0.4 * min(n / 100.0, 1.0)
            + 0.4 * len(set(w)) / n
            + 0.2 * (1.0 - sum(1 for x in w if x in ("the", "a")) / n)
        )
        q = round(score * 10000.0)
        per.setdefault(source, []).append(q)

    n_all = sum(len(v) for v in per.values())
    sum_all = sum(sum(v) for v in per.values())
    assert set(got) == set(per)
    for src, qs in per.items():
        r = got[src]
        assert r["n_docs"] == len(qs)
        passed = sum(qs) * n_all >= sum_all * len(qs)
        assert r["passed"] == passed
        expect_kept = (
            sum(1 for q in qs if q * len(qs) >= sum(qs)) if passed else 0
        )
        assert r["n_docs_kept"] == expect_kept
        assert r["mean_quality"] == round(sum(qs) / len(qs) / 10000.0, 4)
    # at least one source on each side of the gate, or the gate is vacuous
    assert any(r["passed"] for r in got.values())
    assert any(not r["passed"] for r in got.values())


def test_pack_efficiency_matches_pure_python_and_monotone(spark):
    """Padding waste recomputed independently; waste must not increase
    as the candidate length shrinks toward typical doc length (the
    decision signal the op exists for) and every padded total must
    cover the content total."""
    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.curation import (
        _PACK_CANDIDATE_LENS,
        curation_pack_efficiency,
    )

    got = {r["seq_len"]: r for r in curation_pack_efficiency(spark, SF).collect()}
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    toks = [len(t.strip().split(" ")) for t in texts]
    for L in _PACK_CANDIDATE_LENS:
        padded = sum(-(-n // L) * L for n in toks)
        total = sum(toks)
        r = got[L]
        assert r["n_docs"] == len(toks)
        assert r["total_tokens"] == total
        assert r["padded_tokens"] == padded
        assert r["waste_ppm"] == (padded - total) * 1000000 // padded
        assert r["padded_tokens"] >= r["total_tokens"]
    # docs are shorter than 512 tokens in this corpus, so larger seq_len
    # strictly worsens tail padding
    wastes = [got[L]["waste_ppm"] for L in sorted(_PACK_CANDIDATE_LENS)]
    assert wastes == sorted(wastes)


def test_dataset_card_matches_pure_python(spark):
    """Every card number recomputed independently from the parquet."""
    from collections import Counter

    import pyarrow.parquet as pq

    from databricks_end_to_end_lakeflow_project_spark.operators.curation import (
        pipeline_dataset_card,
    )

    r = pipeline_dataset_card(spark, SF).collect()[0]
    tbl = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars", "text"]
    )
    langs = tbl.column("lang").to_pylist()
    sources = tbl.column("source").to_pylist()
    n_chars = tbl.column("n_chars").to_pylist()
    texts = tbl.column("text").to_pylist()

    n_docs = len(texts)
    toks = [t.strip().split(" ") for t in texts]
    assert r["n_docs"] == n_docs
    assert r["n_tokens"] == sum(len(w) for w in toks)
    assert r["n_chars"] == sum(n_chars)
    assert r["n_sources"] == len(set(sources))
    assert r["n_langs"] == len(set(langs))
    lc = Counter(langs)
    top = sorted(lc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert r["top_lang"] == top[0]
    assert r["top_lang_ppm"] == top[1] * 1000000 // n_docs
    fps = Counter(" ".join(w[:10]) for w in toks)
    n_dup = sum(c for c in fps.values() if c > 1)
    assert r["n_dup_docs"] == n_dup
    assert r["dup_ppm"] == n_dup * 1000000 // n_docs
    qs = []
    for w in toks:
        n = float(len(w))
        score = (
            0.4 * min(n / 100.0, 1.0)
            + 0.4 * len(set(w)) / n
            + 0.2 * (1.0 - sum(1 for x in w if x in ("the", "a")) / n)
        )
        qs.append(round(score * 10000.0))
    assert r["mean_quality"] == round(sum(qs) / n_docs / 10000.0, 4)
