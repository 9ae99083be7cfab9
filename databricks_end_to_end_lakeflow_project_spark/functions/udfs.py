"""User-defined function surface: Arrow-vectorized pandas UDFs (scalar +
grouped-agg), `applyInPandas` grouped transforms, and `mapInPandas`
batch iterators.

SURVEY.md §2.9 UDF/UDAF additions — the reference itself contains no
UDFs (its entire scalar surface is built-ins, §2.7), but a complete
engine needs the escape hatch for semantics the built-ins can't express.

Scale notes (100 TB): every UDF here is Arrow-batched (pandas_udf /
applyInPandas / mapInPandas) — columnar blocks cross the JVM↔Python
boundary once per batch, not once per row (~10-100× over row UDFs).
The grouped forms shuffle once on the group key, identical to a
groupBy; the scalar/map forms are narrow (no shuffle). Each query's
semantics is deliberately SQL-expressible so the DuckDB oracle proves
the UDF path bit-for-bit: sums are over exact integers (no fp
accumulation-order drift between pandas and the oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table


@pandas_udf(T.IntegerType())
def _acctbal_bucket(balance: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: 1000-wide balance bucket (floor division)."""
    return np.floor(balance / 1000.0).astype("int32")


@query(
    "udf_pandas_scalar",
    """
    SELECT CAST(FLOOR(c_acctbal / 1000.0) AS INT) AS bucket,
           COUNT(*) AS n_customers,
           MIN(c_custkey) AS min_custkey
    FROM customer
    GROUP BY 1
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF in the row pipeline, then a JVM-side aggregate —
    the hybrid pattern: Python only for the expression Spark lacks,
    everything around it stays in whole-stage codegen."""
    cu = read_table(spark, sf_dir, "customer")
    return (
        cu.withColumn("bucket", _acctbal_bucket("c_acctbal"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").alias("min_custkey"),
        )
    )


@pandas_udf(T.LongType())
def _sum_qty_grouped(qty: pd.Series) -> int:
    """Grouped-agg pandas UDF: exact integer sum (quantities are integral)."""
    return int(qty.astype("int64").sum())


@query(
    "udf_pandas_grouped_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF): partial batches per group
    arrive as a pandas Series; result is one scalar per group."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _sum_qty_grouped("l_quantity").alias("sum_qty")
    )


def _order_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group pandas transform: order-count + exact cent total + span."""
    cents = np.rint(pdf["o_totalprice"].to_numpy() * 100).astype("int64")
    return pd.DataFrame(
        {
            "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
            "n_orders": [len(pdf)],
            "total_cents": [int(cents.sum())],
            "first_date": [pdf["o_orderdate"].min()],
            "last_date": [pdf["o_orderdate"].max()],
        }
    )


@query(
    "udf_apply_in_pandas",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped transform: each group materializes as one
    pandas DataFrame in Python — the pattern for per-group logic that
    is genuinely imperative (model scoring, per-entity fitting). Money
    is summed in integer cents so pandas and the oracle agree exactly."""
    od = read_table(spark, sf_dir, "orders")
    return od.groupBy("o_orderpriority").applyInPandas(
        _order_stats,
        schema=(
            "o_orderpriority string, n_orders long, total_cents long, "
            "first_date timestamp, last_date timestamp"
        ),
    )


def _tokenize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: whitespace token count + char count per document."""
    for pdf in batches:
        toks = pdf["text"].str.split().str.len().fillna(0).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": toks,
                "n_chars": pdf["text"].str.len().astype("int64"),
            }
        )


@query(
    "udf_map_in_pandas",
    """
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas partition-batch iterator — the streaming-friendly
    Arrow path used by the multimodal decode operators; output schema is
    declared up front, batches flow without a shuffle."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(_tokenize_batches, schema="doc_id long, n_tokens long, n_chars long")


class _SplitSentences:
    """Python UDTF: one row per '. '-delimited sentence with its index."""

    def eval(self, text: str):
        for i, sent in enumerate((text or "").split(". "), start=1):
            yield i, sent


@query(
    "udf_udtf_sentences",
    """
    SELECT doc_id,
           generate_subscripts(parts, 1) AS sent_idx,
           unnest(parts) AS sentence
    FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents WHERE doc_id < 50)
    """,
)
def udf_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): text → (sent_idx, sentence) rows via
    a LATERAL join — the one-row-to-many escape hatch (§2.9 UDTF). The
    oracle mirrors the literal '. ' split with unnest + subscripts."""
    from pyspark.sql.functions import udtf

    split_sentences = udtf(_SplitSentences, returnType="sent_idx int, sentence string")
    spark.udtf.register("split_sentences", split_sentences)
    read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence FROM _udtf_docs d, LATERAL split_sentences(d.text) s"
    )


class _TextStatsPoly:
    """Polymorphic UDTF: the OUTPUT SCHEMA is computed at plan time by
    `analyze()` from the literal field-list argument — callers pick which
    stat columns materialize and Catalyst sees the exact schema."""

    @staticmethod
    def analyze(text_arg, fields_arg):
        from pyspark.sql.types import IntegerType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        st = StructType()
        for name in str(fields_arg.value).split(","):
            st = st.add(name.strip(), IntegerType())
        return AnalyzeResult(schema=st)

    def eval(self, text: str, fields: str):
        toks = (text or "").split(" ")
        stats = {
            "n_chars": len(text or ""),
            "n_tokens": len(toks),
            "n_upper": sum(1 for c in (text or "") if c.isupper()),
        }
        yield tuple(stats[name.strip()] for name in fields.split(","))


@query(
    "udtf_polymorphic_stats",
    """
    SELECT doc_id,
           LENGTH(string_split(text, ' ')) AS n_tokens,
           LENGTH(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
    FROM documents WHERE doc_id < 50
    """,
)
def udtf_polymorphic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 polymorphic Python UDTF: `analyze()` derives the output
    schema from the literal field-list argument at PLAN time, so the
    same function serves any column subset with full Catalyst schema
    knowledge (projection pruning included). The oracle recomputes the
    two requested stats in SQL."""
    from pyspark.sql.functions import udtf

    spark.udtf.register("text_stats_poly", udtf(_TextStatsPoly))
    read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("_poly_docs")
    return spark.sql(
        "SELECT d.doc_id, s.n_tokens, s.n_upper "
        "FROM _poly_docs d, LATERAL text_stats_poly(d.text, 'n_tokens,n_upper') s"
    )


def _arrow_stats_batches(batches):
    """mapInArrow: text stats computed entirely in Arrow compute kernels —
    zero pandas conversion, zero per-row Python. All outputs are integers
    (character / token / uppercase counts), so the DuckDB oracle matches
    exactly with no float contract."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        text = b.column(b.schema.get_field_index("text"))
        n_tokens = pc.list_value_length(
            pc.split_pattern(pc.utf8_trim(text, " "), " ")
        ).cast(pa.int64())
        yield pa.RecordBatch.from_arrays(
            [
                b.column(b.schema.get_field_index("doc_id")),
                pc.utf8_length(text).cast(pa.int64()),
                n_tokens,
                pc.count_substring_regex(text, "[A-Z]").cast(pa.int64()),
            ],
            names=["doc_id", "n_chars", "n_tokens", "n_upper"],
        )


@query(
    "udf_map_in_arrow",
    """
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper
    FROM documents
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` partition-batch iterator — the RecordBatch-native
    sibling of `udf_map_in_pandas` that skips the Arrow→pandas→Arrow
    round trip entirely: batches stay in Arrow memory and all work runs
    in vectorized Arrow compute kernels (split/length/regex-count). The
    right tier for byte- and string-shaped transforms where pandas'
    object-dtype boxing IS the cost — on a 100 TB text corpus the
    conversion tax is the difference between an I/O-bound and a
    CPU-bound scan. Output schema declared up front; batches flow with
    no shuffle."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        _arrow_stats_batches,
        schema="doc_id long, n_chars long, n_tokens long, n_upper long",
    )


def _arrow_lang_profile(table):
    """applyInArrow: per-language length profile computed on the whole
    group as ONE Arrow table — pure pyarrow.compute, integer outputs
    (exact oracle), no pandas anywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lens = pc.utf8_length(table.column("text"))
    return pa.table(
        {
            "lang": [table.column("lang")[0].as_py()],
            "n_docs": [table.num_rows],
            "min_chars": [pc.min(lens).as_py()],
            "max_chars": [pc.max(lens).as_py()],
            "total_chars": [pc.sum(lens).as_py()],
        },
        schema=pa.schema(
            [
                ("lang", pa.string()),
                ("n_docs", pa.int64()),
                ("min_chars", pa.int64()),
                ("max_chars", pa.int64()),
                ("total_chars", pa.int64()),
            ]
        ),
    )


@query(
    "udf_apply_in_arrow",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(LENGTH(text)) AS BIGINT) AS min_chars,
           CAST(MAX(LENGTH(text)) AS BIGINT) AS max_chars,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`applyInArrow` grouped transform (Spark 4) — the group-wise
    sibling of `udf_map_in_arrow`: each language's documents arrive as
    ONE Arrow table and the profile is computed with pyarrow.compute
    kernels, no pandas materialization of the group. The right tier for
    group-wise logic that needs the whole group in columnar form
    (custom aggregates, per-group model scoring) without object-dtype
    boxing. Integer outputs keep the oracle exact; groups are
    bounded-cardinality languages, so the per-group table is corpus/
    #langs-sized — at 100 TB use it on session/user-scale groups, not
    whole-language groups (noted contract)."""
    docs = read_table(spark, sf_dir, "documents").select("lang", "text")
    return (
        docs.groupBy("lang")
        .applyInArrow(
            _arrow_lang_profile,
            schema=(
                "lang string, n_docs long, min_chars long, "
                "max_chars long, total_chars long"
            ),
        )
        .orderBy("lang")
    )
