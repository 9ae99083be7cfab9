"""Batch table readers for the standard testdata layout.

One quirk handled here centrally: ``events.parquet`` is written with
nanosecond timestamps (Parquet TIMESTAMP(NANOS)), which Spark rejects by
default. We read them as longs (legacy conf) and convert ns → µs
timestamps, matching DuckDB's ns→µs truncation so oracle hashes agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet`` with engine-standard normalization."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: ns values exceed 2^53, double division
            # would round the microsecond (seen live as ±1 µs vs DuckDB)
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df
    return spark.read.parquet(path)
