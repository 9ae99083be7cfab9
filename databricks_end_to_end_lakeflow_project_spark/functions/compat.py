"""Oracle-compatibility numeric helpers.

Money columns in the testdata are 2-decimal values stored as parquet
doubles. Summing them as doubles is order-dependent (last-bit fp noise)
and rounding a double sum can land on a .xx5 tie that Spark (HALF_UP) and
DuckDB resolve differently. The deterministic pattern used by every
oracle-checked money aggregate in this repo:

  cast each 2-dp input to DECIMAL → exact decimal arithmetic → exact sum
  → ROUND in the decimal domain (both engines round decimal ties away
  from zero) → cast back to DOUBLE.

This costs a little CPU versus double sums, but the aggregate input is
exact so the result is bit-identical across engines, partition counts, and
reduction orders — which is also the property you want at 1000-executor
scale, where double-sum reduction order is nondeterministic run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def asc_seq(start: Column, stop: Column) -> Column:
    """``sequence(start, stop)`` that is EMPTY when ``stop < start``.

    Spark's ``sequence()`` defaults the step to -1 when start > stop, so
    ``sequence(1, 0)`` yields a DESCENDING ``[1, 0]`` — not the empty
    array that DuckDB's ``range(start, stop+1)`` (and every oracle in this
    repo) produces. A descending index sequence then feeds 0/negative
    positions into ``slice``/``element_at`` and raises a
    SparkRuntimeException on otherwise-valid short inputs. Every computed
    index fan-out must use this instead of raw ``F.sequence``.
    """
    return F.when(stop >= start, F.sequence(start, stop)).otherwise(
        F.array().cast("array<int>")
    )


def money(c: Column | str) -> Column:
    """Exact 2-dp decimal view of a money/rate column stored as double."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(MONEY)


def dsum(expr: Column, scale: int = 2) -> Column:
    """Exact decimal SUM rounded at ``scale``, returned as double."""
    return F.round(F.sum(expr), scale).cast("double")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal(·,4)."""
    return money("l_extendedprice") * (F.lit(1) - money("l_discount"))


def charge() -> Column:
    """disc_price * (1 + l_tax), exact decimal(·,6).

    The intermediate is re-capped at decimal(18,4) (its true scale) so the
    second product stays within precision 38 in both Spark and DuckDB.
    """
    return disc_price().cast("decimal(18,4)") * (F.lit(1) + money("l_tax"))


# SQL fragments for the DuckDB oracle — keep in lockstep with the columns above.
SQL_DISC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
SQL_CHARGE = (
    f"CAST({SQL_DISC_PRICE} AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2)))"
)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    return f"ROUND(SUM({expr}), {scale})::DOUBLE AS {alias}"
