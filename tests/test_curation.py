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


def test_pretraining_run_pure_python_parity(spark):
    """Full 8-stage pipeline vs an independent pure-Python replay on a
    synthetic corpus engineered to hit every branch: unknown-language
    docs (langid gate), low-quality spam (quality gate), near-identical
    duplicates (LSH dedup), a benchmark hash-slice overlap
    (decontamination), 4 source domains with unequal token mass
    (mixture full copies + fractional pass), and enough emitted rows to
    cut multiple pack bins per shard."""
    import hashlib
    import math
    import random

    from databricks_end_to_end_lakeflow_project_spark.operators.curation import (
        PACK_BUDGET,
        _RUN_CK_A,
        _RUN_CK_B,
        _RUN_CK_PACK,
        _RUN_EPOCH_CAP,
        _RUN_EPOCH_SEED,
        _RUN_QUALITY_MIN,
        _RUN_SHARDS,
        pretraining_run,
    )
    from databricks_end_to_end_lakeflow_project_spark.operators.textops import (
        LEXICONS,
        STOPWORDS,
    )

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    rng = random.Random(7)
    lexwords = sorted({w for lex in LEXICONS.values() for w in lex})
    filler = [f"w{i}" for i in range(60)]
    # sources chosen by md5 bucket: beta→books, alpha→code, s2→forums —
    # three balanced domains (epochs < 1: fractional pass), plus ONE tiny
    # web-bucket doc below so the web domain's epochs hit the repeat cap
    cyc = ["beta", "alpha", "s2"]
    rows = []
    for d in range(40):
        nw = rng.randint(30, 120)
        words = [
            rng.choice(lexwords) if rng.random() < 0.3 else rng.choice(filler)
            for _ in range(nw)
        ]
        rows.append((d, " ".join(words), cyc[d % 3]))
    # unknown-language docs: no lexicon token anywhere
    rows.append((40, " ".join(rng.choice(filler) for _ in range(50)), "beta"))
    rows.append((41, "zz1 zz2 zz3 zz4", "alpha"))
    # low-quality spam: one token repeated (uniq ratio ~0)
    rows.append((42, " ".join(["the"] * 80), "s2"))
    # near-identical duplicates of doc 0 (jaccard ~1 > 0.8)
    base = rows[0][1]
    rows.append((43, base + " extraword", "beta"))
    rows.append((44, base, "alpha"))
    # the lone web-domain doc ('s1' hashes to bucket 0): ~30 unique tokens
    # out of ~2.5k total → epochs = min(0.35·total/30, 4) = the CAP
    rows.append(
        (45, " ".join(["the", "a"] + [f"wf{i}" for i in range(28)]), "s1")
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    got = [
        (r["stage_ord"], r["stage"], r["n_rows"], r["n_tokens"], r["checksum"])
        for r in pretraining_run(docs).collect()
    ]

    # ---- independent replay ----
    DOMS = ["web", "books", "code", "forums"]
    W = {"web": 0.35, "books": 0.25, "code": 0.25, "forums": 0.15}

    def dom(src):
        return DOMS[int(md5(src)[0], 16) % 4]

    t = [(d, x.strip().split(" "), dom(src)) for d, x, src in rows]
    stages = []

    def stage(ord_, name, items, tok, ck):
        stages.append(
            (
                ord_,
                name,
                len(items),
                sum(tok(i) for i in items) if items else None,
                sum(ck(i) for i in items) if items else None,
            )
        )

    stage(1, "raw", t, lambda i: len(i[1]), lambda i: i[0])
    langid = [
        (d, w, dm)
        for d, w, dm in t
        if any(x in lex for lex in LEXICONS.values() for x in w)
    ]
    stage(2, "langid", langid, lambda i: len(i[1]), lambda i: i[0])

    def score(w):
        n = float(len(w))
        return (
            0.4 * min(n / 100.0, 1.0)
            + 0.4 * len(set(w)) / n
            + 0.2 * (1.0 - sum(1 for x in w if x in STOPWORDS) / n)
        )

    gated = [(d, w, dm) for d, w, dm in langid if score(w) >= _RUN_QUALITY_MIN]
    stage(3, "quality", gated, lambda i: len(i[1]), lambda i: i[0])

    def sh3(w):
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    shs = {d: sh3(w) for d, w, _ in gated if len(w) >= 3}
    parent = {d: d for d, _, _ in gated}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(shs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(shs[a] & shs[b])
            union = len(shs[a] | shs[b])
            if union and inter / union >= 0.8:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    best = {}
    for d, w, dm in gated:
        c = find(d)
        cur = best.get(c)
        key = (-score(w), d)
        if cur is None or key < cur[0]:
            best[c] = (key, (d, w, dm))
    deduped = sorted((v[1] for v in best.values()), key=lambda i: i[0])
    stage(4, "dedup", deduped, lambda i: len(i[1]), lambda i: i[0])

    def g5(w):
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}

    bench_grams = set()
    for d, w, _ in t:
        if md5(str(d))[0] == "0":
            bench_grams |= g5(w)
    clean = [
        (d, w, dm)
        for d, w, dm in deduped
        if md5(str(d))[0] != "0" and not (g5(w) & bench_grams)
    ]
    stage(5, "decontam", clean, lambda i: len(i[1]), lambda i: i[0])

    avail = {}
    for d, w, dm in clean:
        avail[dm] = avail.get(dm, 0) + len(w)
    total = float(sum(avail.values()))
    plan = {}
    for dm, av in avail.items():
        epochs = min(W[dm] * total / float(av), _RUN_EPOCH_CAP)
        plan[dm] = (int(math.floor(epochs)), int(math.floor((epochs - math.floor(epochs)) * 16777216.0)))
    emitted = []
    for d, w, dm in clean:
        n_full, thr = plan[dm]
        n_copies = n_full + (1 if int(md5(f"mix:{d}")[:6], 16) < thr else 0)
        for c in range(n_copies):
            emitted.append((d * 8 + c, dm, len(w)))
    stage(6, "mixture", emitted, lambda i: i[2], lambda i: i[0])

    shuffled = []
    for k, dm, ntok in emitted:
        hk = md5(f"{_RUN_EPOCH_SEED}:{k}")
        shuffled.append((int(hk[:4], 16) % _RUN_SHARDS, hk, k, dm, ntok))
    ordered = []
    for shard in range(_RUN_SHARDS):
        inshard = sorted(
            (s for s in shuffled if s[0] == shard), key=lambda s: (s[1], s[2])
        )
        for pos, (sd, _hk, k, dm, ntok) in enumerate(inshard, start=1):
            ordered.append((sd, pos, k, dm, ntok))
    stage(
        7,
        "shuffle",
        ordered,
        lambda i: i[4],
        lambda i: (i[2] % _RUN_CK_A) * (i[1] % _RUN_CK_B),
    )

    bins = {}
    for shard in range(_RUN_SHARDS):
        cum = 0
        for sd, pos, k, dm, ntok in sorted(
            (o for o in ordered if o[0] == shard), key=lambda o: o[1]
        ):
            cum += ntok
            b = int(math.floor((cum - ntok) / PACK_BUDGET))
            bins[(shard, b)] = bins.get((shard, b), 0) + ntok
    binrows = sorted(bins.items())
    stage(
        8,
        "pack",
        binrows,
        lambda i: i[1],
        lambda i: (i[0][0] + 1) * (i[0][1] + 1) * (i[1] % _RUN_CK_PACK),
    )
    perdom = {}
    for k, dm, ntok in emitted:
        n, tk, ck = perdom.get(dm, (0, 0, 0))
        perdom[dm] = (n + 1, tk + ntok, ck + k)
    for dm in sorted(perdom):
        n, tk, ck = perdom[dm]
        stages.append((9, f"export:{dm}", n, tk, ck))

    want = sorted(stages)
    assert sorted(got) == want, f"\ngot:  {sorted(got)}\nwant: {want}"
    # the synthetic corpus must actually exercise every gate
    by = {s[1]: s for s in want}
    assert by["raw"][2] > by["langid"][2] > by["quality"][2] > by["dedup"][2]
    assert by["dedup"][2] > by["decontam"][2]
    assert any(k % 8 == 3 for k, _, _ in emitted), (
        "the tiny web domain must hit the 4-epoch repeat cap"
    )
    assert any(
        0 < plan[dm][1] < 16777216 for dm in plan
    ), "a fractional pass must be exercised"
    assert by["pack"][2] >= _RUN_SHARDS, "several bins per shard expected"


def test_distinct_ngram_kernel_matches_expression(spark):
    """exploded_distinct_ngrams must reproduce the interpreted
    explode(array_distinct(grams_all)) formulation exactly — same
    (doc_id, gram) set — on real corpora for the n used by the
    contamination (5), novelty (3) and shingle-adjacent (2) consumers."""
    from pyspark.sql import functions as F

    from databricks_end_to_end_lakeflow_project_spark.operators.curation import (
        exploded_distinct_ngrams,
        grams_all,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    for n in (2, 3, 5):
        expr = {
            (r["doc_id"], r["g"])
            for r in docs.filter(
                F.size(F.split(F.trim(F.col("text")), " ")) >= n
            )
            .select(
                "doc_id",
                F.explode(F.array_distinct(grams_all(F.col("text"), n))).alias("g"),
            )
            .collect()
        }
        kern = {
            (r["doc_id"], r["g"])
            for r in exploded_distinct_ngrams(docs, n).collect()
        }
        assert kern == expr, n


def test_doc_token_counts_kernel_matches_expression(spark):
    """doc_token_counts must reproduce explode(tokens) +
    groupBy(doc_id, token).count() exactly on a real corpus."""
    from pyspark.sql import functions as F

    from databricks_end_to_end_lakeflow_project_spark.operators.textops import (
        doc_token_counts,
        tokens,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.readers import (
        read_table,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    expr = {
        (r["doc_id"], r["token"]): r["tf"]
        for r in docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    }
    kern = {
        (r["doc_id"], r["token"]): r["tf"]
        for r in doc_token_counts(docs).collect()
    }
    assert kern == expr
