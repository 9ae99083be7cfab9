"""Registry-complete per-query timing artifact (TIMINGS_sf001_r{N}.json).

One cold run per registered query at the correctness-gate scale; the
completeness assert guarantees the artifact can never silently drift from
the registry again (round-4 defect: 249/265 coverage because late
additions landed after the artifact was cut — run this LAST each round).

Usage: python tools/dump_timings.py --out TIMINGS_sf001_r5.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import __spark_entry__ as e
    from databricks_end_to_end_lakeflow_project_spark.session import get_spark

    spark = get_spark("timings")
    qs = e.queries()

    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.monotonic()
        try:
            qs[name](spark, args.sf_dir).collect()
            timings[name] = round(time.monotonic() - t0, 3)
        except Exception as ex:  # a failure must be visible, not a gap
            timings[name] = -1.0
            print(f"FAIL {name}: {ex}", file=sys.stderr)

    # the round-4 lesson, mechanized: artifact keys == registry keys
    assert set(timings) == set(qs), (
        f"timings drifted from registry: missing={set(qs) - set(timings)} "
        f"extra={set(timings) - set(qs)}"
    )

    out = {
        "mode": "one cold run per query, local[32]",
        "n_queries": len(timings),
        "sf": 0.01,
        "timings": timings,
    }
    Path(args.out).write_text(json.dumps(out, indent=0) + "\n")
    failed = [k for k, v in timings.items() if v < 0]
    print(f"wrote {args.out}: {len(timings)} queries, {len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
