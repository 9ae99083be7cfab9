"""Text-curation mining pack, round 8: corpus-statistics operators a
pretraining-data pipeline runs between ingestion and mixing — automatic
stopword discovery, boilerplate-template detection, character-level LM
held-out scoring, quality-gate threshold sweeps, and sentence-length
profiling. Complements operators/textops.py (which owns the tokenizer /
LM / keyword / dedup-span families).

Exactness protocol as everywhere: token/char counts are exact integers;
log terms are quantized to 1e-6 longs BEFORE summation so reductions are
order-free; ratios round at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.functions.compat import asc_seq
from databricks_end_to_end_lakeflow_project_spark.operators.textops import tokens
from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# automatic stopword discovery by document frequency
# ---------------------------------------------------------------------------


@query(
    "text_stopword_discovery",
    """
    WITH n AS (SELECT COUNT(*) AS nd FROM documents),
    tok AS (
      SELECT DISTINCT doc_id, u.w
      FROM documents, UNNEST(string_split(trim(text), ' ')) AS u(w)
      WHERE length(u.w) > 0
    ),
    df AS (SELECT w AS token, COUNT(*) AS doc_freq FROM tok GROUP BY w)
    SELECT token, doc_freq,
           ROUND(CAST(doc_freq AS DOUBLE) / nd, 4) AS doc_share,
           ROUND(LN(CAST(nd AS DOUBLE) / doc_freq), 6) AS idf
    FROM df, n
    ORDER BY doc_freq DESC, token
    LIMIT 15
    """,
)
def text_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-driven stopword discovery: the 15 tokens with the highest
    DOCUMENT frequency (lowest IDF) — the language-agnostic way to build
    the stopword list that [[text_quality_score]]'s stopword-ratio
    feature and every BM25/TF-IDF variant ([[text_bm25_topk]],
    [[text_tfidf_keywords]]) consume, instead of shipping a hand-curated
    English list to a multilingual corpus.

    Exactness: document frequency is an exact integer COUNT over the
    per-doc DISTINCT token set; share/idf are single expressions on
    (df, N), rounded. Plan: explode → per-doc distinct (map-side
    combinable aggregate) → token groupBy → TakeOrdered(15) — the only
    driver-side rows are the 15 winners; the 1-row corpus count rides a
    broadcast.
    """
    docs = read_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("nd"))
    tok = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )
    df = tok.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    return (
        df.crossJoin(F.broadcast(n))
        .select(
            "token",
            "doc_freq",
            F.round(F.col("doc_freq").cast("double") / F.col("nd"), 4).alias(
                "doc_share"
            ),
            F.round(
                F.log(F.col("nd").cast("double") / F.col("doc_freq")), 6
            ).alias("idf"),
        )
        .orderBy(F.desc("doc_freq"), "token")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# boilerplate-template detection by prefix hash
# ---------------------------------------------------------------------------


@query(
    "text_boilerplate_templates",
    """
    WITH keyed AS (
      SELECT doc_id, md5(substring(trim(text), 1, 48)) AS tmpl
      FROM documents
    ),
    grp AS (
      SELECT tmpl, COUNT(*) AS n_docs FROM keyed GROUP BY tmpl
    ),
    n AS (SELECT COUNT(*) AS nd FROM documents)
    SELECT tmpl, n_docs,
           ROUND(CAST(n_docs AS DOUBLE) / nd, 4) AS corpus_share
    FROM grp, n
    WHERE n_docs >= 3
    ORDER BY n_docs DESC, tmpl
    LIMIT 10
    """,
)
def text_boilerplate_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-template detector: 48-char-prefix hash groups with ≥3
    documents, largest first — the cheap screen for machine-generated /
    templated mass (cookie banners, scraped listings) that exact dedup
    misses because the tails differ. Feeds the same curation decision as
    [[text_repetition_gopher]] (intra-doc repetition) but across docs;
    the flagged groups are what [[dedup_minhash_lsh_pairs]] would verify
    pairwise.

    Exactness: integer group counts over a deterministic md5 prefix key;
    one share division. Plan: one map-side-combinable groupBy on the
    hash + TakeOrdered(10); the corpus count is a 1-row broadcast.
    """
    docs = read_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("nd"))
    grp = docs.select(
        F.md5(F.substring(F.trim(F.col("text")), 1, 48)).alias("tmpl")
    ).groupBy("tmpl").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        grp.filter(F.col("n_docs") >= 3)
        .crossJoin(F.broadcast(n))
        .select(
            "tmpl",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("nd"), 4).alias(
                "corpus_share"
            ),
        )
        .orderBy(F.desc("n_docs"), "tmpl")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# character-trigram LM, held-out NLL
# ---------------------------------------------------------------------------


@query(
    "text_char_trigram_nll",
    """
    WITH split AS (
      SELECT doc_id, trim(text) AS t,
             (CAST(('0x' || substr(md5(trim(text)), 1, 8)) AS BIGINT) % 2 = 0)
               AS is_train
      FROM documents
    ),
    tri AS (
      SELECT is_train, substring(t, i, 3) AS g
      FROM split CROSS JOIN LATERAL UNNEST(range(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 3
    ),
    train AS (
      SELECT g, COUNT(*) AS c FROM tri WHERE is_train GROUP BY g
    ),
    consts AS (
      SELECT (SELECT SUM(c) FROM train) AS tot,
             (SELECT COUNT(*) FROM train) AS v
    ),
    scored AS (
      SELECT CAST(ROUND(
               -LN((COALESCE(train.c, 0) + 1.0) / (tot + v + 1.0)) * 1000000)
             AS BIGINT) AS nll_q
      FROM (SELECT g FROM tri WHERE NOT is_train) te
      LEFT JOIN train ON te.g = train.g
      CROSS JOIN consts
    )
    SELECT COUNT(*) AS n_test_trigrams,
           ROUND(SUM(nll_q) / 1000000.0 / COUNT(*), 4) AS nll_per_trigram
    FROM scored
    """,
)
def text_char_trigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language model scored on a held-out half: add-1
    smoothed trigram frequencies from the content-hash train split,
    mean NLL per trigram on the test split. The CHARACTER-level
    companion to [[text_bigram_nll]] / [[text_backoff_lm_heldout_nll]] —
    char LMs are the robust quality signal for noisy multilingual text
    where tokenization itself is unreliable, and the standard langid
    backbone ([[text_langid]]'s n-gram heuristic is its thresholded
    cousin).

    Exactness: trigram counts are exact integers; each test trigram's
    −ln p is quantized to a 1e-6 long BEFORE the sum (the per-term
    double is identical in both engines; only the reduction needs to be
    integer). Plan: one explode over a guarded index sequence, one
    train-side groupBy, one equi-join of test trigrams against it
    (broadcastable vocabulary), one aggregate row; the (total, V)
    scalars ride a 1-row broadcast.
    """
    docs = read_table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    split = docs.select(
        t.alias("t"),
        (F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % 2 == 0).alias(
            "is_train"
        ),
    )
    tri = split.filter(F.length("t") >= 3).select(
        "is_train",
        F.explode(
            F.transform(
                asc_seq(F.lit(1), F.length("t") - 2),
                lambda i: F.substring(F.col("t"), i, 3),
            )
        ).alias("g"),
    )
    train = tri.filter("is_train").groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    consts = train.agg(
        F.sum("c").alias("tot"), F.count(F.lit(1)).alias("v")
    )
    test = tri.filter(~F.col("is_train")).select("g")
    p = (F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (
        F.col("tot") + F.col("v") + 1.0
    )
    scored = (
        test.join(train, "g", "left")
        .crossJoin(F.broadcast(consts))
        .select(F.round(-F.log(p) * 1_000_000).cast("long").alias("nll_q"))
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_test_trigrams"),
        F.round(F.sum("nll_q") / 1_000_000.0 / F.count(F.lit(1)), 4).alias(
            "nll_per_trigram"
        ),
    )


# ---------------------------------------------------------------------------
# quality-gate threshold sweep
# ---------------------------------------------------------------------------


@query(
    "text_quality_gate_sweep",
    """
    WITH tok AS (
      SELECT doc_id, u.w
      FROM documents, UNNEST(string_split(trim(text), ' ')) AS u(w)
      WHERE length(u.w) > 0
    ),
    uni AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    consts AS (SELECT SUM(c) AS tot, COUNT(*) AS v FROM uni),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_tok,
             SUM(CAST(ROUND(-LN((uni.c + 1.0) / (tot + v + 1.0)) * 1000000)
                 AS BIGINT)) AS nll_q
      FROM tok JOIN uni USING (w) CROSS JOIN consts
      GROUP BY doc_id
    ),
    th AS (SELECT UNNEST([500, 550, 600, 650]) AS thr_centinat),
    -- a doc passes the gate when its mean token NLL <= thr (centinats)
    sweep AS (
      SELECT thr_centinat,
             COUNT(*) FILTER (WHERE nll_q <= thr_centinat * 10000.0 * n_tok)
               AS docs_kept,
             SUM(n_tok) FILTER (WHERE nll_q <= thr_centinat * 10000.0 * n_tok)
               AS tokens_kept,
             COUNT(*) AS docs_total, SUM(n_tok) AS tokens_total
      FROM perdoc, th GROUP BY thr_centinat
    )
    SELECT thr_centinat, docs_kept,
           COALESCE(tokens_kept, 0) AS tokens_kept,
           ROUND(CAST(docs_kept AS DOUBLE) / docs_total, 4) AS doc_keep_rate,
           ROUND(CAST(COALESCE(tokens_kept, 0) AS DOUBLE) / tokens_total, 4)
             AS token_keep_rate
    FROM sweep ORDER BY thr_centinat
    """,
)
def text_quality_gate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate design sweep: documents kept (and token mass kept)
    at four unigram-perplexity thresholds (mean token NLL ≤ 5.0/5.5/
    6.0/6.5 nats) — the keep-rate-vs-strictness table you read BEFORE
    committing a perplexity filter to a pretraining run (the classic
    CCNet/Gopher-style LM gate; [[text_quality_score]] is the
    feature-based gate, [[sample_dsir_importance]] reweights instead of
    gating). One corpus pass; the 4-threshold fan-out is a 4-row
    broadcast over the per-doc frame.

    Exactness: per-doc NLL is a sum of 1e-6-quantized per-token terms
    (integer, order-free); the gate compares that integer against
    thr·n_tok in one exact double product identical in both engines.
    """
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.length("w") > 0)
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    consts = uni.agg(F.sum("c").alias("tot"), F.count(F.lit(1)).alias("v"))
    nll_term = F.round(
        -F.log((F.col("c") + 1.0) / (F.col("tot") + F.col("v") + 1.0)) * 1_000_000
    ).cast("long")
    perdoc = (
        tok.join(uni, "w")
        .crossJoin(F.broadcast(consts))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tok"), F.sum(nll_term).alias("nll_q"))
    )
    th = spark.createDataFrame([(t,) for t in (500, 550, 600, 650)], "thr_centinat int")
    kept = F.col("nll_q") <= F.col("thr_centinat") * 10000.0 * F.col("n_tok")
    sweep = (
        perdoc.crossJoin(F.broadcast(th))
        .groupBy("thr_centinat")
        .agg(
            F.sum(kept.cast("long")).alias("docs_kept"),
            F.coalesce(
                F.sum(F.when(kept, F.col("n_tok"))), F.lit(0)
            ).alias("tokens_kept"),
            F.count(F.lit(1)).alias("docs_total"),
            F.sum("n_tok").alias("tokens_total"),
        )
    )
    return sweep.select(
        "thr_centinat",
        "docs_kept",
        "tokens_kept",
        F.round(F.col("docs_kept").cast("double") / F.col("docs_total"), 4).alias(
            "doc_keep_rate"
        ),
        F.round(
            F.col("tokens_kept").cast("double") / F.col("tokens_total"), 4
        ).alias("token_keep_rate"),
    ).orderBy("thr_centinat")


# ---------------------------------------------------------------------------
# sentence-length profile per source
# ---------------------------------------------------------------------------


@query(
    "text_sentence_length_profile",
    """
    WITH sent AS (
      SELECT source, u.s
      FROM documents,
           UNNEST(string_split_regex(trim(text), '[.!?] ')) AS u(s)
      WHERE length(trim(u.s)) > 0
    ),
    lens AS (
      SELECT source, len(string_split(trim(s), ' ')) AS n_words FROM sent
    )
    SELECT source,
           COUNT(*) AS n_sentences,
           ROUND(AVG(n_words), 4) AS mean_words,
           CAST(quantile_cont(n_words, 0.95) AS DOUBLE) AS p95_words
    FROM lens GROUP BY source ORDER BY source
    """,
)
def text_sentence_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-length profile per source: sentence count, mean words
    per sentence, exact p95 — the structural fingerprint that separates
    prose from listings/logs/code at a glance (curation pairs it with
    [[text_quality_score]]'s ratios; a source whose p95 sentence length
    is 4 words is a catalog, not text, whatever its langid says).

    Exactness: sentence segmentation is one shared regex split
    ('[.!?] '); word counts are exact integers; mean is AVG of integers
    (exact sum / exact count — same division both engines) and p95 is
    the exact interpolated percentile of integers. Plan: explode →
    per-source groupBy with an exact-percentile aggregate.
    """
    docs = read_table(spark, sf_dir, "documents")
    sent = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"[.!?] ")).alias("s"),
    ).filter(F.length(F.trim("s")) > 0)
    lens = sent.select(
        "source", F.size(F.split(F.trim("s"), " ")).alias("n_words")
    )
    return (
        lens.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.round(F.avg("n_words"), 4).alias("mean_words"),
            F.percentile("n_words", F.lit(0.95)).alias("p95_words"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# bigram conditional-entropy rate
# ---------------------------------------------------------------------------


@query(
    "text_entropy_rate_bigram",
    """
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> length(x) > 0)
               AS w
      FROM documents
    ),
    big AS (
      SELECT w[u.i] AS w1, w[u.i + 1] AS w2
      FROM d CROSS JOIN LATERAL UNNEST(range(1, len(w))) AS u(i)
      WHERE len(w) >= 2
    ),
    cnt2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
    cnt1 AS (SELECT w1, SUM(c2) AS c1 FROM cnt2 GROUP BY w1),
    n AS (SELECT SUM(c2) AS nb FROM cnt2),
    terms AS (
      SELECT CAST(ROUND(c2 * LN(CAST(c1 AS DOUBLE) / c2) * 1000000) AS BIGINT)
        AS t_q
      FROM cnt2 JOIN cnt1 USING (w1)
    )
    SELECT CAST(nb AS BIGINT) AS n_bigrams,
           ROUND(SUM(t_q) / 1000000.0 / nb, 6) AS entropy_rate_nats
    FROM terms, n GROUP BY nb
    """,
)
def text_entropy_rate_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional-entropy rate of the corpus,
    H(W₂|W₁) = Σ p(w₁,w₂)·ln(c(w₁)/c(w₁,w₂)) — the sequence-level
    predictability number (natural text ≈ 2-4 nats/token; machine
    boilerplate collapses toward 0; random token soup approaches the
    unigram entropy). Sits between [[text_source_mix_entropy]] (unigram,
    per-source) and the held-out LM NLLs ([[text_bigram_nll]] measures a
    MODEL; this measures the CORPUS itself).

    Exactness: bigram counts are exact integers from one ordinal-joined
    pass; each summand c₂·ln(c₁/c₂) is quantized to 1e-6 longs before
    the global sum. Plan: posexplode → one self-equi-join on
    (doc, position+1) → two map-side-combinable groupBys.
    """
    docs = read_table(spark, sf_dir, "documents")
    # filter empties BEFORE indexing — adjacency is over the CLEANED
    # token sequence on both sides
    clean = F.filter(tokens(F.col("text")), lambda x: F.length(x) > 0)
    tok = docs.select("doc_id", F.posexplode(clean).alias("i", "w"))
    a = tok.select("doc_id", F.col("i").alias("ia"), F.col("w").alias("w1"))
    b = tok.select("doc_id", F.col("i").alias("ib"), F.col("w").alias("w2"))
    big = a.join(b, (a["doc_id"] == b["doc_id"]) & (F.col("ib") == F.col("ia") + 1))
    cnt2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    cnt1 = cnt2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    t_q = F.round(
        F.col("c2") * F.log(F.col("c1").cast("double") / F.col("c2")) * 1_000_000
    ).cast("long")
    terms = cnt2.join(cnt1, "w1").select(t_q.alias("t_q"), "c2")
    return terms.agg(
        F.sum("c2").cast("long").alias("n_bigrams"),
        F.round(F.sum("t_q") / 1_000_000.0 / F.sum("c2"), 6).alias(
            "entropy_rate_nats"
        ),
    )
