"""Scalar function packs: string, regexp, date/time, math, JSON, array,
conditional expressions.

Covers SURVEY.md §2.7 (the reference's scalar surface: current_timestamp,
to_date, casts, literal arithmetic — F1-F6) plus the §2.9 function-pack
additions. Everything is built-in `pyspark.sql.functions` — JVM-side,
inside whole-stage codegen; no Python UDFs anywhere in this module.

Cross-engine parity notes (vs the DuckDB oracle):
- `regexp_extract` returns '' on no-match in both engines.
- Spark `date_trunc` yields TIMESTAMP, DuckDB yields DATE → both sides
  normalized to DATE.
- Transcendentals (ln/sqrt/pow) may differ by 1 ulp between libm
  implementations → rounded to 6 decimals on both sides.
- Array folds use an explicit sequential left-fold on both sides
  (`F.aggregate` ↔ `list_reduce`) so double accumulation order matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


@query(
    "fn_string_basic",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT_WS('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS custkey_padded,
           TRIM('  pad  ') AS trimmed
    FROM customer WHERE c_custkey <= 200
    """,
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/length/substring/concat_ws/lpad/trim."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.lower("c_mktsegment").alias("seg_lower"),
            F.length("c_name").alias("name_len"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("seg_nation"),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("custkey_padded"),
            F.trim(F.lit("  pad  ")).alias("trimmed"),
        )
    )


@query(
    "fn_string_regexp",
    r"""
    SELECT p_partkey, p_name,
           regexp_extract(p_name, '(\w+)') AS first_word,
           regexp_replace(p_name, ' ', '_') AS snake_name,
           string_split(p_name, ' ')[1] AS word1,
           LENGTH(string_split(p_name, ' ')) AS n_words,
           (p_name LIKE '%a%') AS has_a,
           levenshtein(p_brand, 'Brand#10') AS brand_dist
    FROM part WHERE p_partkey <= 500
    """,
)
def fn_string_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract/replace, split, LIKE, levenshtein."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            "p_name",
            F.regexp_extract("p_name", r"(\w+)", 1).alias("first_word"),
            F.regexp_replace("p_name", " ", "_").alias("snake_name"),
            F.split("p_name", " ").getItem(0).alias("word1"),
            F.size(F.split("p_name", " ")).alias("n_words"),
            F.col("p_name").like("%a%").alias("has_a"),
            F.levenshtein("p_brand", F.lit("Brand#10")).alias("brand_dist"),
        )
    )


@query(
    "fn_date_suite",
    """
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)  AS order_year,
           EXTRACT(month FROM o_orderdate) AS order_month,
           EXTRACT(day FROM o_orderdate)   AS order_day,
           EXTRACT(doy FROM o_orderdate)   AS order_doy,
           date_trunc('month', o_orderdate)::DATE AS month_start,
           last_day(o_orderdate)::DATE AS month_end,
           (o_orderdate::DATE + 30) AS due_date,
           date_diff('day', o_orderdate, TIMESTAMP '1996-01-01 00:00:00') AS days_to_1996
    FROM orders WHERE o_orderkey <= 3000
    """,
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayofyear, date_trunc, last_day, date_add, datediff
    (reference F2/F6: to_date parsing + date literals)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.dayofyear("o_orderdate").alias("order_doy"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
            F.last_day("o_orderdate").alias("month_end"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
            F.datediff(F.lit("1996-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
                "days_to_1996"
            ),
        )
    )


@query(
    "fn_math_suite",
    """
    SELECT p_partkey,
           ABS(p_retailprice - 950) AS abs_dev,
           CEIL(p_retailprice) AS price_ceil,
           FLOOR(p_retailprice) AS price_floor,
           ROUND(SQRT(p_retailprice), 6) AS price_sqrt,
           ROUND(LN(p_retailprice), 6) AS price_ln,
           ROUND(POW(p_size, 2), 1) AS size_sq,
           p_size % 7 AS size_mod,
           SIGN(p_retailprice - 950) AS dev_sign
    FROM part WHERE p_partkey <= 500
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/sqrt/ln/pow/mod/sign."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.abs(F.col("p_retailprice") - 950).alias("abs_dev"),
            F.ceil("p_retailprice").alias("price_ceil"),
            F.floor("p_retailprice").alias("price_floor"),
            F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
            F.round(F.log("p_retailprice"), 6).alias("price_ln"),
            F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
            (F.col("p_size") % 7).alias("size_mod"),
            F.signum(F.col("p_retailprice") - 950).alias("dev_sign"),
        )
    )


@query(
    "fn_json_extract",
    """
    SELECT event_id, event_type,
           json_extract_string(props, '$.k') AS k_str,
           json_extract(props, '$.k')::INT AS k_int
    FROM events
    WHERE json_extract(props, '$.k')::INT >= 50
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + typed cast + predicate on the extracted
    value (events.props is a JSON string column)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "event_type",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        )
        .filter(F.col("k_int") >= 50)
    )


@query(
    "fn_json_schema",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(json_extract(props, '$.k')::INT) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def fn_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing (from_json → struct) then aggregate —
    the pattern for semi-structured columns at scale: parse once in the
    scan stage, aggregate JVM-side."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k INT"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("p.k").cast("bigint").alias("sum_k"),
    )


@query(
    "fn_array_suite",
    """
    SELECT vec_id, label,
           LENGTH(embedding) AS dim,
           embedding[1] AS first_component,
           ROUND(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), (a, b) -> a + b), 6) AS sq_norm,
           ROUND(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 6) AS comp_sum
    FROM embeddings WHERE vec_id < 100
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over embedding vectors: size, element_at, and sequential
    left-folds (F.aggregate) for squared-norm and component sum — the
    JVM-side primitives under the similarity-search operators."""
    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return em.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            ),
            6,
        ).alias("sq_norm"),
        F.round(F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6).alias(
            "comp_sum"
        ),
    )


@query(
    "fn_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS balance_bucket,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           LEAST(c_acctbal, 1000.0) AS capped_low,
           GREATEST(c_acctbal, 0.0) AS capped_high
    FROM customer WHERE c_custkey <= 500
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / least / greatest."""
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return cu.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("balance_bucket"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("capped_low"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("capped_high"),
    )


@query(
    "fn_map_suite",
    """
    SELECT event_id,
           CAST(len(json_keys(props)) + 1 AS INT) AS n_keys,
           json_extract(props, '$.k')::INT AS k_val,
           list_contains(json_keys(props), 'k') AS has_k,
           array_to_string(list_sort(list_append(json_keys(props), 'etype_len')), ',') AS keys_csv,
           CAST(LENGTH(event_type) * 2 AS INT) AS etype_len_x2
    FROM events WHERE event_id < 2000
    """,
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function pack: from_json→map, create_map, map_concat,
    map_keys, map_contains_key, element_at, transform_values — the
    semi-structured map surface (§2.9). The oracle mirrors each result
    through DuckDB's JSON functions since its MAP type hashes
    differently."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json("props", "map<string,int>")
    m2 = F.map_concat(m, F.create_map(F.lit("etype_len"), F.length("event_type")))
    return ev.select(
        "event_id",
        F.size(m2).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.map_contains_key(m, "k").alias("has_k"),
        F.array_join(F.array_sort(F.map_keys(m2)), ",").alias("keys_csv"),
        F.element_at(F.transform_values(m2, lambda k, v: v * 2), "etype_len").alias(
            "etype_len_x2"
        ),
    )


@query(
    "fn_bitwise_suite",
    """
    SELECT CAST(o_orderkey & 7 AS BIGINT) AS bucket,
           COUNT(*) AS n,
           SUM(o_orderkey >> 3) AS sum_shifted,
           SUM(xor(o_orderkey, 255)) AS sum_xor,
           SUM(o_orderkey | 1) AS sum_or
    FROM orders GROUP BY 1
    """,
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator pack (&, |, xor, >>) — hash-bucketing and flag
    arithmetic primitives; all JVM expressions inside one
    map-side-combinable aggregate."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.groupBy(k.bitwiseAND(F.lit(7)).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.shiftright(k, 3)).alias("sum_shifted"),
        F.sum(k.bitwiseXOR(F.lit(255))).alias("sum_xor"),
        F.sum(k.bitwiseOR(F.lit(1))).alias("sum_or"),
    )


@query(
    "agg_mode_per_group",
    """
    SELECT l_returnflag, l_linenumber AS mode_linenumber, n FROM (
      SELECT l_returnflag, l_linenumber, COUNT(*) AS n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_linenumber) AS rn
      FROM lineitem GROUP BY l_returnflag, l_linenumber
    ) WHERE rn = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent line number per return
    flag, count-desc then value-asc tie order — built-in `mode()` is
    tie-nondeterministic in both engines, so it's expressed as
    count + rank): two-phase count aggregate, then a window over the
    tiny grouped frame."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linenumber").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_linenumber")
    )
    return (
        counts.select(
            "l_returnflag",
            F.col("l_linenumber").alias("mode_linenumber"),
            "n",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "fn_variant_json",
    """
    SELECT event_type,
           COUNT(*) AS n,
           SUM(json_extract(props, '$.k')::INT) AS sum_k,
           SUM(CASE WHEN json_extract(props, '$.k')::INT >= 50 THEN 1 ELSE 0 END)
             AS n_high
    FROM events GROUP BY event_type
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    `parse_json` once, then typed `variant_get` extraction — the
    shredded-encoding path that replaces per-access string re-parsing
    (`get_json_object`, the fn_json_extract baseline) with one parse and
    cheap binary field reads. At 100 TB the difference is parsing the
    JSON corpus once vs once per extracted field."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.sum(F.when(F.col("k") >= 50, 1).otherwise(0)).alias("n_high"),
    )


@query(
    "fn_url_suite",
    """
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '://([^/]+)/', 1) AS host,
           regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           replace('a b c', ' ', '+') AS q_encoded
    FROM (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&q=ref' AS url
      FROM documents
    )
    """,
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function pack: build a canonical URL per document, then take
    it apart with `parse_url` (PROTOCOL/HOST/PATH/QUERY + keyed query
    parameter) and form-encode a query string with `url_encode` — the
    log-hygiene ops a web-crawl curation pipeline runs first. All
    JVM-side expressions in one codegen stage over the scan; the DuckDB
    oracle decomposes the same URLs with equivalent regexps (DuckDB has
    no parse_url)."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id"), F.lit("?lang="), F.col("lang"), F.lit("&q=ref"),
    )
    d = docs.select("doc_id", url.alias("url"))
    return d.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.url_encode(F.lit("a b c")).alias("q_encoded"),
    )


@query(
    "fn_higher_order_suite",
    """
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    )
    SELECT doc_id,
           LENGTH(list_filter(w, x -> x = 'spark')) > 0 AS has_spark,
           LENGTH(list_filter(w, x -> LENGTH(x) = 0)) = 0 AS all_nonempty,
           LENGTH(list_filter(w, x -> LENGTH(x) = 4)) AS n_len4,
           list_transform(list_zip(w, list_reverse(w)),
                          p -> p[1] || '_' || p[2])[1] AS first_mirror,
           LENGTH(flatten([w[1:3], w[4:6]])) AS flat_n
    FROM t
    """,
)
def fn_higher_order_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas: exists / forall / filter / zip_with /
    flatten+slice — all JVM-side codegen over the token array, zero
    shuffles (the §2.7 lambda pack the shingle/minhash operators build
    on). Beware the re-evaluation pitfall documented in README: outer
    expressions referenced inside a lambda re-evaluate per element, so
    every lambda here closes only over its element args."""
    docs = _t(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    d = docs.select("doc_id", w.alias("w"))
    toks = F.col("w")
    return d.select(
        "doc_id",
        F.exists(toks, lambda x: x == "spark").alias("has_spark"),
        F.forall(toks, lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.size(F.filter(toks, lambda x: F.length(x) == 4)).alias("n_len4"),
        F.element_at(
            F.zip_with(toks, F.reverse(toks), lambda a, b: F.concat_ws("_", a, b)), 1
        ).alias("first_mirror"),
        F.size(
            F.flatten(F.array(F.slice(toks, 1, 3), F.slice(toks, 4, 3)))
        ).alias("flat_n"),
    )


@query(
    "fn_try_suite",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE ROUND(l_extendedprice / l_discount, 4) END AS price_per_disc,
           TRY_CAST(l_returnflag AS INT) AS flag_as_int,
           TRY_CAST(l_returnflag AS TIMESTAMP) AS flag_as_ts,
           [l_quantity, l_extendedprice][3] AS oob_element
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
)
def fn_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: the `try_*` family that turns runtime
    errors into NULLs row-locally instead of failing the job — the
    difference between one malformed row killing a 100 TB pipeline and
    it landing in a quarantine filter. Spark 4 ships with ANSI mode ON,
    so plain division/cast THROW on bad input; `try_divide` /
    `try_cast` / `try_element_at` are the production idiom. DuckDB
    oracle: TRY_CAST + guarded CASE (its list indexing is already
    NULL-on-out-of-bounds)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide(F.col("l_extendedprice"), F.col("l_discount")), 4).alias(
            "price_per_disc"
        ),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_returnflag").try_cast("timestamp").alias("flag_as_ts"),
        F.try_element_at(
            F.array(F.col("l_quantity"), F.col("l_extendedprice")), F.lit(3)
        ).alias("oob_element"),
    )


@query(
    "fn_collation_group",
    """
    WITH u AS (
      SELECT c_mktsegment AS seg FROM customer
      UNION ALL
      SELECT UPPER(SUBSTRING(c_mktsegment, 1, 1))
             || LOWER(SUBSTRING(c_mktsegment, 2)) FROM customer
    )
    SELECT LOWER(seg) AS segment, COUNT(*) AS n
    FROM u GROUP BY LOWER(seg) ORDER BY segment
    """,
)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4): a mixed-case union of market
    segments grouped under the UTF8_LCASE collation — comparisons and
    hashing become case-insensitive INSIDE the engine (one aggregate, no
    normalization pass materialized), which is how multi-source string
    keys with inconsistent casing join/group at scale without a rewrite.
    The output key is lowercased only for a deterministic display form;
    the oracle reproduces the semantics with LOWER() grouping."""
    cu = _t(spark, sf_dir, "customer")
    mixed = cu.select(F.col("c_mktsegment").alias("seg")).unionAll(
        cu.select(F.initcap(F.col("c_mktsegment")).alias("seg"))
    )
    return (
        mixed.groupBy(F.collate(F.col("seg"), "UTF8_LCASE").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower(F.col("k")).alias("segment"), "n")
        .orderBy("segment")
    )


@query(
    "fn_xml_extract",
    """
    SELECT o_orderkey,
           regexp_extract(x, '<status>([^<]*)</status>', 1) AS status,
           CAST(regexp_extract(x, '<cents>([0-9]+)</cents>', 1) AS BIGINT)
             AS cents,
           regexp_extract(x, '<priority>([^<]*)</priority>', 1) AS priority
    FROM (
      SELECT o_orderkey,
             '<order><status>' || o_orderstatus || '</status><cents>'
               || CAST(ROUND(o_totalprice * 100) AS BIGINT)
               || '</cents><priority>' || o_orderpriority
               || '</priority></order>' AS x
      FROM orders
    )
    WHERE o_orderkey % 101 = 0
    """,
)
def fn_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion (Spark 4 `from_xml`): construct a canonical XML
    payload per order, then parse it back with a typed schema — the
    path for feeds that still arrive as XML. Parsing is row-local
    codegen'd Jackson-XML, no shuffle; the DuckDB oracle decomposes the
    same payloads with regexps (no XML reader there)."""
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0)
    xml = F.concat(
        F.lit("<order><status>"), F.col("o_orderstatus"),
        F.lit("</status><cents>"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.lit("</cents><priority>"), F.col("o_orderpriority"),
        F.lit("</priority></order>"),
    )
    parsed = od.select(
        "o_orderkey",
        F.from_xml(xml, "status STRING, cents BIGINT, priority STRING").alias("v"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("v.status").alias("status"),
        F.col("v.cents").alias("cents"),
        F.col("v.priority").alias("priority"),
    )


_RCTE_ORACLE = """
    WITH RECURSIVE seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ), edges AS (
      SELECT DISTINCT event_type AS src, next_type AS dst
      FROM seq WHERE next_type IS NOT NULL AND next_type <> event_type
    ), reach AS (
      SELECT 'signup' AS t, 0 AS hops
      UNION ALL
      SELECT e.dst, r.hops + 1
      FROM reach r JOIN edges e ON e.src = r.t
      WHERE r.hops < 4
    )
    SELECT t AS event_type, MIN(hops) AS min_hops
    FROM reach GROUP BY t ORDER BY t
"""


@query("sql_recursive_cte_reachability", _RCTE_ORACLE)
def sql_recursive_cte_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark ≥4.0 `WITH RECURSIVE`) doing BFS over the
    event-type transition graph: derive distinct prev→next edges from
    each user's ordered stream (one window), then recursively expand
    from 'signup' with a hop cap and keep each type's minimum hop count.
    The recursion runs INSIDE Spark SQL — no driver-side loop — the
    declarative counterpart of the iterative `connected_components`
    operator (which remains the right tool when the frontier is
    table-sized and needs per-round checkpointing)."""
    ev = read_table(spark, sf_dir, "events")
    view = "evt_for_rcte"
    ev.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE seq AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
          FROM {view}
        ), edges AS (
          SELECT DISTINCT event_type AS src, next_type AS dst
          FROM seq WHERE next_type IS NOT NULL AND next_type <> event_type
        ), reach AS (
          SELECT 'signup' AS t, 0 AS hops
          UNION ALL
          SELECT e.dst, r.hops + 1
          FROM reach r JOIN edges e ON e.src = r.t
          WHERE r.hops < 4
        )
        SELECT t AS event_type, MIN(hops) AS min_hops
        FROM reach GROUP BY t ORDER BY t
        """
    )
