"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 (or --sf-dir) side-by-side with
its ``oracle_sql()`` via DuckDB and compares row count, column-name set,
and order-insensitive values (exact string canonicalization — the driver
hashes values, so exact match is the bar; float diffs are reported to
judge rounding risk).

Usage: python tools/check_oracle.py [--sf-dir DIR] [name ...]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

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


def _oracle_child(sql: str, sf_dir: str, q) -> None:
    """Subprocess body for the timeout-guarded oracle run. Module-level so
    the SPAWN start method can pickle it — spawn (not fork) is required:
    forking the sweep process, which hosts a JVM and py4j threads, can
    inherit mutexes held by threads that don't exist in the child and
    deadlock inside duckdb.connect (observed live: trivial 0.04 s oracles
    'timing out' at 180 s)."""
    try:
        con = duckdb.connect()
        for t in TABLES:
            p = Path(sf_dir) / f"{t}.parquet"
            if p.exists():
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        cur = con.execute(sql)
        q.put(("ok", [d[0] for d in cur.description], cur.fetchall()))
    except Exception as ex:  # noqa: BLE001
        q.put(("err", str(ex), None))


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: catches real mismatches, absorbs last-bit fp noise
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--json-out", default=None,
                    help="also write a machine-readable per-query result file")
    ap.add_argument("--timeout-per-query", type=float, default=None,
                    help="seconds per side (Spark collect / DuckDB oracle); a "
                         "breach cancels the side's jobs and records status "
                         "'timeout' instead of wedging the sweep (sf0.1 runs: "
                         "some oracles are superlinear in SF by design)")
    ap.add_argument("--start-after", default=None,
                    help="resume an alphabetical sweep: skip names <= this")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from databricks_end_to_end_lakeflow_project_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = e.queries()
    oracles = e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = Path(args.sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    names = args.names or sorted(qs)
    if args.start_after:
        names = [n for n in names if n > args.start_after]
    failures = 0
    results: dict[str, dict] = {}

    import multiprocessing as mp
    import threading
    import time as _time

    def record(name, status, rows=None, detail=None, sec=None):
        results[name] = {"status": status, "rows": rows, "detail": detail,
                         "sec": sec}

    class _SideTimeout(Exception):
        pass

    def _timed(fn, cancel):
        """Run fn(); if --timeout-per-query elapses first, invoke the
        side-specific cancel hook (Spark cancelAllJobs) and surface
        _SideTimeout."""
        if not args.timeout_per_query:
            return fn()
        hit = threading.Event()

        def _fire():
            hit.set()
            try:
                cancel()
            except Exception:  # noqa: BLE001
                pass

        t = threading.Timer(args.timeout_per_query, _fire)
        t.start()
        try:
            out = fn()
        except Exception:
            if hit.is_set():
                raise _SideTimeout() from None
            raise
        finally:
            t.cancel()
        if hit.is_set():
            raise _SideTimeout()
        return out

    _spawn = mp.get_context("spawn")

    def _oracle_subprocess(sql):
        """DuckDB 1.0.0's interrupt() cannot reliably stop an in-process
        query from another thread, so when a per-query timeout is set the
        oracle runs in a SPAWNED child that can be SIGKILLed (see
        _oracle_child for why spawn, not fork). Views are re-registered
        per call (parquet views — milliseconds)."""
        import queue as _queue

        q = _spawn.Queue()
        proc = _spawn.Process(target=_oracle_child, args=(sql, args.sf_dir, q))
        proc.start()
        try:
            # drain BEFORE join: a child with a result bigger than the
            # queue's pipe buffer (~64 KB) cannot exit until the parent
            # reads it — join-first deadlocks and misreports fast oracles
            # as timeouts (observed live on every >~1k-row result)
            status, a, b = q.get(timeout=args.timeout_per_query)
        except _queue.Empty:
            proc.kill()
            proc.join()
            raise _SideTimeout() from None
        proc.join(30)
        if proc.is_alive():
            proc.kill()
            proc.join()
        if status == "err":
            raise RuntimeError(a)
        return a, b

    for name in names:
        spark.catalog.clearCache()  # free persists leaked by prior queries
        t0 = _time.perf_counter()
        try:
            def _spark_side():
                # construction is inside the timed window too: several
                # queries run eager driver-side sections (iterative
                # loops, bounded collects) before returning their frame
                sdf = qs[name](spark, args.sf_dir)
                return sdf, sdf.collect()

            sdf, srows = _timed(_spark_side, spark.sparkContext.cancelAllJobs)
            scols = sdf.columns
        except _SideTimeout:
            sec = round(_time.perf_counter() - t0, 1)
            print(f"TIMEOUT  {name}: spark side exceeded "
                  f"{args.timeout_per_query}s")
            record(name, "timeout", detail="spark side", sec=sec)
            failures += 1
            continue
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            record(name, "fail", detail=f"spark error: {ex}",
                   sec=round(_time.perf_counter() - t0, 1))
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows (no oracle)")
            record(name, "rows-only", rows=len(srows),
                   sec=round(_time.perf_counter() - t0, 1))
            continue
        try:
            if args.timeout_per_query:
                dcols, drows = _oracle_subprocess(oracles[name])
            else:
                cur = con.execute(oracles[name])
                dcols, drows = [d[0] for d in cur.description], cur.fetchall()
        except _SideTimeout:
            sec = round(_time.perf_counter() - t0, 1)
            print(f"TIMEOUT  {name}: duckdb oracle exceeded "
                  f"{args.timeout_per_query}s")
            record(name, "timeout", detail="duckdb side", sec=sec)
            failures += 1
            continue
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            record(name, "fail", detail=f"duckdb error: {ex}",
                   sec=round(_time.perf_counter() - t0, 1))
            failures += 1
            continue

        sec = round(_time.perf_counter() - t0, 1)
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            record(name, "fail", detail="column mismatch", sec=sec)
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            record(name, "fail", detail=f"rowcount {len(srows)} vs {len(drows)}",
                   sec=sec)
            failures += 1
            continue
        sc = canon_rows(scols, [tuple(r) for r in srows])
        dc = canon_rows(dcols, drows)
        if sc != dc:
            bad = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {bad}")
            record(name, "fail", rows=len(srows), detail=f"value mismatch: {bad}",
                   sec=sec)
            failures += 1
            continue
        print(f"OK    {name}: {len(srows)} rows ({sec}s)")
        record(name, "ok", rows=len(srows), sec=sec)

    if args.json_out:
        import json

        summary = {
            "sf_dir": args.sf_dir,
            "n_queries": len(names),
            "n_ok": sum(1 for r in results.values() if r["status"] == "ok"),
            "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows-only"),
            "n_timeout": sum(1 for r in results.values() if r["status"] == "timeout"),
            "n_fail": failures,
            "results": results,
        }
        with open(args.json_out, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
