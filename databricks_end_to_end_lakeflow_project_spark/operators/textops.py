"""Text-analysis operators for training-data pipelines: token statistics,
quality scoring, language ID, document fingerprinting.

North-star additions (SURVEY.md §2.9; no reference citation — the
reference has no text operators). All implementations are JVM-side array/
string expressions (split → higher-order functions), no Python UDFs: at
100 TB these run inside whole-stage codegen as a pure scan → project
pipeline with zero shuffles.

Tokenization contract (shared with every oracle): tokens = split of
trimmed text on single spaces. Real corpora would swap in a regex/BPE
tokenizer here; the operator shapes are identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

# tiny demonstration lexicons (a real deployment ships per-language tables)
LEXICONS = {
    "en": ["the", "a", "fast", "slow", "big", "small"],
    "fr": ["le", "la", "les", "et", "vite"],
    "es": ["el", "los", "rapido", "y"],
    "de": ["der", "die", "das", "und", "schnell"],
}

STOPWORDS = ["the", "a"]


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), " ")


def stopword_hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


@query(
    "text_stats",
    """
    WITH t AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents)
    SELECT doc_id, lang,
           LENGTH(w) AS n_tokens,
           LENGTH(list_distinct(w)) AS n_uniq_tokens,
           ROUND(list_reduce(list_transform(w, x -> LENGTH(x)::DOUBLE), (a, b) -> a + b)
                 / LENGTH(w), 4) AS avg_token_len,
           ROUND(LENGTH(list_filter(w, x -> x IN ('the', 'a')))::DOUBLE / LENGTH(w), 4)
             AS stopword_ratio
    FROM t
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: counts, uniqueness, mean token
    length, stopword ratio — the raw features for quality filtering."""
    docs = read_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_uniq_tokens"),
        F.round(
            F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double"))
            / F.size(w),
            4,
        ).alias("avg_token_len"),
        F.round(stopword_hits(w, STOPWORDS).cast("double") / F.size(w), 4).alias(
            "stopword_ratio"
        ),
    )


@query(
    "text_quality_score",
    """
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    s AS (
      SELECT doc_id,
             LENGTH(w)::DOUBLE AS n_tokens,
             LENGTH(list_distinct(w))::DOUBLE / LENGTH(w) AS uniq_ratio,
             LENGTH(list_filter(w, x -> x IN ('the', 'a')))::DOUBLE / LENGTH(w) AS stop_ratio
      FROM t
    )
    SELECT doc_id,
           ROUND(0.4 * LEAST(n_tokens / 100.0, 1.0)
               + 0.4 * uniq_ratio
               + 0.2 * (1.0 - stop_ratio), 4) AS quality_score
    FROM s
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: length saturation + lexical diversity +
    low stopword density (the standard pretraining-filter shape)."""
    docs = read_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    n = F.size(w).cast("double")
    uniq_ratio = F.size(F.array_distinct(w)).cast("double") / n
    stop_ratio = stopword_hits(w, STOPWORDS).cast("double") / n
    score = (
        0.4 * F.least(n / 100.0, F.lit(1.0)) + 0.4 * uniq_ratio + 0.2 * (1.0 - stop_ratio)
    )
    return docs.select("doc_id", F.round(score, 4).alias("quality_score"))


def _langid_sql_hits() -> str:
    parts = []
    for lang, lex in LEXICONS.items():
        inlist = ", ".join(f"'{w}'" for w in lex)
        parts.append(f"LENGTH(list_filter(w, x -> x IN ({inlist}))) AS hits_{lang}")
    return ",\n           ".join(parts)


@query(
    "text_langid",
    f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    h AS (
      SELECT doc_id,
           {_langid_sql_hits()}
      FROM t
    )
    SELECT doc_id, hits_en, hits_fr, hits_es, hits_de,
           CASE
             WHEN hits_en = 0 AND hits_fr = 0 AND hits_es = 0 AND hits_de = 0 THEN 'unknown'
             WHEN hits_en >= hits_fr AND hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
             WHEN hits_fr >= hits_es AND hits_fr >= hits_de THEN 'fr'
             WHEN hits_es >= hits_de THEN 'es'
             ELSE 'de'
           END AS predicted_lang
    FROM h
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-hit language ID (n-gram-free heuristic): count hits per
    language lexicon, argmax with a deterministic preference order.
    The oracle replicates the scoring rule exactly — the operator is
    specified by its formula, not by ground-truth labels."""
    docs = read_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    out = docs.select("doc_id", *[
        stopword_hits(w, lex).alias(f"hits_{lang}") for lang, lex in LEXICONS.items()
    ])
    h = {lang: F.col(f"hits_{lang}") for lang in LEXICONS}
    pred = (
        F.when((h["en"] == 0) & (h["fr"] == 0) & (h["es"] == 0) & (h["de"] == 0), "unknown")
        .when((h["en"] >= h["fr"]) & (h["en"] >= h["es"]) & (h["en"] >= h["de"]), "en")
        .when((h["fr"] >= h["es"]) & (h["fr"] >= h["de"]), "fr")
        .when(h["es"] >= h["de"], "es")
        .otherwise("de")
    )
    return out.withColumn("predicted_lang", pred)


@query(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(trim(text), ' '))), ' '))
             AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint: MD5 over the sorted distinct
    token set. Word-shuffled copies of a document collide — the cheap
    first-pass signal before MinHash; MD5 so any engine reproduces it."""
    docs = read_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(w)), " ")).alias("fingerprint"),
    )


# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit runs,
# symbol runs (no backslash escapes that differ between Java and RE2)
_BPE_ISH = "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"
_BPE_ISH_SQL = _BPE_ISH.replace("'", "''")


@query(
    "text_token_count_bpe",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_ISH_SQL}')) AS INT) AS n_bpe_tokens,
           CAST(LENGTH(string_split(trim(text), ' ')) AS INT) AS n_ws_tokens,
           ROUND(LENGTH(text)::DOUBLE
                 / len(regexp_extract_all(text, '{_BPE_ISH_SQL}')), 4) AS chars_per_token
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex (runs of
    letters / digits / symbols + contractions) counted JVM-side — the
    standard cheap estimate of LLM token cost per document, with
    chars-per-token as the compression proxy. Whitespace count alongside
    for the ratio features in quality filtering."""
    docs = read_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(_BPE_ISH), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
        F.round(F.length("text").cast("double") / F.size(bpe), 4).alias("chars_per_token"),
    )


@query(
    "pipeline_docs_quality_corpus",
    """
    WITH t AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS w,
             md5(array_to_string(string_split(trim(text), ' ')[1:10], ' ')) AS fp
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, fp,
             LENGTH(w) AS n_tokens,
             LENGTH(list_filter(w, x -> x IN ('the', 'a')))::DOUBLE / LENGTH(w) AS stop_ratio
      FROM t WHERE LENGTH(w) >= 5
    ), kept AS (
      SELECT * FROM scored
      WHERE stop_ratio >= 0.02
      QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_tokens), 4) AS avg_tokens
    FROM kept GROUP BY lang
    """,
)
def pipeline_docs_quality_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation in ONE plan: length gate →
    stopword-ratio quality gate → exact dedup (keep lowest doc_id per
    fingerprint) → per-language corpus stats. The composition every
    100 TB text pipeline runs nightly; each stage is a narrow transform
    except the dedup window (one shuffle on the fingerprint) and the
    final tiny aggregation."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    scored = (
        docs.select(
            "doc_id",
            "lang",
            F.size(w).alias("n_tokens"),
            (stopword_hits(w, STOPWORDS).cast("double") / F.size(w)).alias("stop_ratio"),
            F.md5(F.concat_ws(" ", F.slice(w, 1, 10))).alias("fp"),
        )
        .filter(F.col("n_tokens") >= 5)
        .filter(F.col("stop_ratio") >= 0.02)
    )
    kept = scored.withColumn(
        "rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    ).filter(F.col("rn") == 1)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


@query(
    "text_chunk_fixed",
    """
    SELECT doc_id, 180*n AS chunk_start,
           length(substring(text, 180*n + 1, 200)) AS chunk_chars,
           md5(substring(text, 180*n + 1, 200)) AS chunk_md5
    FROM documents
    JOIN (SELECT unnest(range(0, 64)) AS n) t ON 180*n < length(text)
    WHERE length(text) > 0
    """,
)
def text_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking with overlap — the context-window packing step
    of an LLM training pipeline: 200-char chunks on a 180-char stride
    (20-char overlap so no boundary text is ever lost to truncation).

    Offsets come from `sequence()` + `posexplode` — pure JVM expression
    work, one output row per chunk, no Python and no shuffle at all (the
    explode is pipelined into the scan). Chunks are checksummed so the
    oracle verifies content, not just counts; VARCHAR slicing matches
    byte slicing because the corpus is ASCII (asserted in tests)."""
    docs = read_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    offsets = F.sequence(
        F.lit(0), F.greatest(F.length("text") - 1, F.lit(0)), F.lit(180)
    )
    chunk = F.substring(F.col("text"), F.col("chunk_start") + 1, 200)
    return (
        docs.select("doc_id", "text", F.explode(offsets).alias("chunk_start"))
        .select(
            "doc_id",
            "chunk_start",
            F.length(chunk).alias("chunk_chars"),
            F.md5(chunk.cast("binary")).alias("chunk_md5"),
        )
    )


@query(
    "text_top_tokens_per_lang",
    """
    SELECT lang, token, cnt, rn
    FROM (
      SELECT lang, token, cnt,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY cnt DESC, token
             ) AS rn
      FROM (
        SELECT lang, token, COUNT(*) AS cnt
        FROM (
          SELECT lang, unnest(string_split(trim(text), ' ')) AS token
          FROM documents
        ) raw
        WHERE token <> ''
        GROUP BY lang, token
      ) counted
    ) ranked
    WHERE rn <= 5
    """,
)
def text_top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus frequency analysis: the 5 most common tokens per language
    (the Zipf-head inspection every data-mixture audit starts with).

    explode → two-level reduction: the (lang, token) count partial-
    aggregates map-side, so the shuffle carries distinct tokens, not
    token occurrences; the top-k window then runs on the already-tiny
    per-language count frame. Token ties rank deterministically
    (count DESC, token ASC)."""
    docs = read_table(spark, sf_dir, "documents")
    counted = (
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "token")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "token", "cnt", "rn")
    )
