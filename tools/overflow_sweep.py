"""Scaled-MAGNITUDE overflow sweep (round-8 brief #6).

`33a0e6b` fixed an int64 wrap in graph_degree_assortativity that only
manifested near sf1 — the hazard class is quantized-long folds whose
intermediates grow with VALUE magnitude (cents sums, cross-moments
Σ x·y, squared sums), not row count. This sweep rebuilds an sf dir with
every money/value column scaled by ``SCALE`` (a POWER OF TWO: a double
×128 only shifts the exponent, so the mantissa — and therefore every
downstream quantization — is exact, introducing zero new rounding ties)
and reruns the oracle compare there. A wrap surfaces as either a Spark
ANSI ARITHMETIC_OVERFLOW (fails closed) or a value mismatch against
DuckDB, whose SUM promotes to HUGEINT and cannot wrap.

Usage: python tools/overflow_sweep.py [--src DIR] [--keep DIR]
Exit 0 = every selected query matches its oracle at ×128 magnitudes.
"""

from __future__ import annotations

import argparse
import inspect
import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SCALE = 128  # power of two: exact in doubles, ~2 decimal orders of magnitude

# magnitude-like columns only — rates (l_discount, l_tax) keep their
# semantics, keys/dates/strings pass through
SCALED_COLS = {
    "lineitem": {"l_extendedprice"},
    "orders": {"o_totalprice"},
    "customer": {"c_acctbal"},
    "supplier": {"s_acctbal"},
    "part": {"p_retailprice"},
    "events": {"value"},
}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# a query is magnitude-sensitive if it touches a money/value column AND
# folds through fixed-point/long/decimal arithmetic
_MONEY = re.compile(
    r"extendedprice|totalprice|acctbal|retailprice|['\"]value['\"]|disc_price|charge\("
)
_FOLD = re.compile(
    r'cast\("long"\)|CAST\(.*AS BIGINT\)|\* 100\)|\*100\)|dsum|money\(|decimal\('
)


def selected_names() -> list[str]:
    from databricks_end_to_end_lakeflow_project_spark import registry

    registry._collect()
    out = []
    for name, fn in sorted(registry._QUERIES.items()):
        src = inspect.getsource(fn)
        if _MONEY.search(src) and _FOLD.search(src):
            out.append(name)
    return out


def build_scaled_dir(src: str, dst: str, scale: int = SCALE) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(sp):
            continue
        cols = [
            c[0]
            for c in con.sql(f"DESCRIBE SELECT * FROM '{sp}'").fetchall()
        ]
        to_scale = SCALED_COLS.get(t, set())
        sel = ", ".join(
            f'("{c}" * {scale}) AS "{c}"' if c in to_scale else f'"{c}"'
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{sp}') TO '{os.path.join(dst, t + '.parquet')}'"
            " (FORMAT PARQUET)"
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--keep", default=None, help="build the scaled dir HERE and keep it")
    ap.add_argument("names", nargs="*", help="subset; default = auto-selected")
    args = ap.parse_args()

    dst = args.keep or tempfile.mkdtemp(prefix="sf_x128_")
    build_scaled_dir(args.src, dst)
    names = args.names or selected_names()
    print(f"sweeping {len(names)} magnitude-sensitive queries at {dst}", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "check_oracle.py"),
         "--sf-dir", dst, *names],
        cwd=_REPO,
    )
    return r.returncode


if __name__ == "__main__":
    raise SystemExit(main())
