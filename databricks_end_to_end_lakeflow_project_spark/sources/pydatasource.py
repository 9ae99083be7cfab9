"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-corpus source, the extension point for reading systems Spark
has no built-in connector for.

Reference parity: the reference's only source is Auto Loader CSV
(`/root/reference/DatabricksFlightProject/bronze_ingest_autoloader.py:15-19`);
this adds the OSS mechanism a lakehouse uses when the upstream isn't a
file format at all (an internal API, a queue, a proprietary store) —
implemented once as a `DataSource`, then consumed with the ordinary
`spark.read.format(...)` surface.

Scale note: `partitions()` is the contract that makes a Python source
parallel — each `InputPartition` becomes one task, so a 1000-executor
cluster drives 1000 concurrent `read()` generators; rows stream out in
Arrow batches without ever landing on the driver.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from databricks_end_to_end_lakeflow_project_spark.registry import query

_N_DOCS = 4096
_N_PARTS = 8


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", str(_N_DOCS)))
        self.parts = int(options.get("partitions", str(_N_PARTS)))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        # contiguous id range per partition: deterministic, no overlap
        per = -(-self.n // self.parts)  # ceil
        start = partition.value * per
        end = min(start + per, self.n)
        for doc_id in range(start, end):
            digest = hashlib.md5(str(doc_id).encode()).hexdigest()
            yield (doc_id, doc_id % 16, digest)


class SyntheticCorpusDataSource(DataSource):
    """`spark.read.format("synthetic_corpus").option("n", …)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return "doc_id long, shard int, digest string"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticCorpusReader(self.options)


def register_synthetic_source(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticCorpusDataSource)


@query(
    "source_python_datasource",
    f"""
    SELECT CAST(i % 16 AS INT) AS shard,
           COUNT(*) AS n,
           SUM(i) AS sum_ids,
           MIN(md5(CAST(i AS VARCHAR))) AS min_digest
    FROM range({_N_DOCS}) t(i)
    GROUP BY 1
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the custom Python DataSource and aggregate per shard; the
    oracle regenerates the same deterministic corpus with DuckDB's
    range() + md5, proving the source's partitioned read is complete,
    non-overlapping, and content-correct."""
    register_synthetic_source(spark)
    docs = spark.read.format("synthetic_corpus").option("n", str(_N_DOCS)).load()
    return docs.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("sum_ids"),
        F.min("digest").alias("min_digest"),
    )


# ---------------------------------------------------------------------------
# streaming Python DataSource (Spark 4 SimpleDataSourceStreamReader)
# ---------------------------------------------------------------------------


class SyntheticTickStreamReader(SimpleDataSourceStreamReader):
    """Deterministic unbounded stream: micro-batch k yields rows with ids
    [k·batch, (k+1)·batch). Offsets are ``{"id": next_unread}`` — the
    engine checkpoints them, so restart resumes exactly where the last
    commit left off (exactly-once with a replayable source).

    ``readBetweenOffsets`` re-derives any committed range on replay —
    possible because row content is a pure function of the id."""

    def __init__(self, options: dict):
        self.batch = int(options.get("rows_per_batch", "100"))

    def initialOffset(self) -> dict:
        return {"id": 0}

    def read(self, start: dict):
        s = int(start["id"])
        # a LIST, not a generator: the engine's prefetch cache copy.copy()s
        # the iterator when planning partitions, and generators don't copy
        return self._rows(s, s + self.batch), {"id": s + self.batch}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["id"]), int(end["id"]))

    @staticmethod
    def _rows(lo: int, hi: int) -> list:
        return [
            (i, i % 16, hashlib.md5(str(i).encode()).hexdigest())
            for i in range(lo, hi)
        ]


class SyntheticTickDataSource(DataSource):
    """`spark.readStream.format("synthetic_ticks")` — the streaming face
    of the Python DataSource API (driver-side simple reader; Spark
    handles offset tracking, WAL and replay)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ticks"

    def schema(self) -> str:
        return "tick_id long, shard int, digest string"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return SyntheticTickStreamReader(self.options)


def register_tick_stream(spark: SparkSession) -> None:
    spark.dataSource.register(SyntheticTickDataSource)


# -- custom Python DataSource WRITER (Spark 4) --------------------------------


class _JsonSinkCommit(WriterCommitMessage):
    def __init__(self, tmp: str, rows: int):
        self.tmp = tmp
        self.rows = rows


class SyntheticJsonSinkWriter(DataSourceWriter):
    """Each task writes its partition to a private temp file and returns
    a commit message; the driver publishes every temp (rename) only
    after ALL tasks succeeded, or removes them on abort — the standard
    two-phase task-commit protocol, so a failed/retried task never
    leaves partial output visible."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid as _uuid

        self.path = options["path"]
        self.overwrite = overwrite
        # job-unique token baked into published file names: append jobs can
        # never clobber a previous job's parts (commit() runs per job with
        # messages indexed from 0, so bare part-{i} names would collide)
        self.job_id = _uuid.uuid4().hex[:12]

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        _os.makedirs(self.path, exist_ok=True)
        tmp = _os.path.join(self.path, f".tmp-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonSinkCommit(tmp, n)

    def commit(self, messages):
        import glob as _glob
        import os as _os

        if self.overwrite:
            # honor mode("overwrite"): clear previously published parts as
            # part of the atomic publish step (temps are already written)
            for old in _glob.glob(_os.path.join(self.path, "part-*.jsonl")):
                _os.remove(old)
        for i, m in enumerate(messages):
            _os.rename(
                m.tmp, _os.path.join(self.path, f"part-{self.job_id}-{i:05d}.jsonl")
            )

    def abort(self, messages):
        import os as _os

        for m in messages:
            try:
                _os.remove(m.tmp)
            except FileNotFoundError:
                pass


class SyntheticJsonSinkDataSource(DataSource):
    """Write-side custom DataSource: `df.write.format("jsonsink")` with
    two-phase task commit (temps -> all-or-nothing driver rename)."""

    @classmethod
    def name(cls) -> str:
        return "jsonsink"

    def writer(self, schema, overwrite: bool):
        return SyntheticJsonSinkWriter(self.options, overwrite)


@query(
    "sink_python_datasource",
    """
    SELECT lang, COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource WRITE path: documents stream through
    `jsonsink` (per-task temp files, all-or-nothing driver commit) and
    are read back as JSON-lines with an explicit schema; the per-lang
    aggregate must match the direct table — proving the sink neither
    lost, duplicated, nor mangled rows across task commits."""
    import os
    import shutil
    import tempfile
    import uuid

    spark.dataSource.register(SyntheticJsonSinkDataSource)
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "lang", "n_chars")
    )
    # invocation-unique dir: concurrent runs (driver gate + a local
    # check_oracle) must never append into each other's sink output
    path = os.path.join(
        tempfile.gettempdir(), "lakeflow_sources",
        os.path.basename(sf_dir.rstrip("/")), f"jsonsink-{uuid.uuid4().hex[:12]}",
    )
    shutil.rmtree(path, ignore_errors=True)
    docs.write.format("jsonsink").option("path", path).mode("append").save()
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        os.path.join(path, "*.jsonl")
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )
