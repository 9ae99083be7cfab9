"""Scaled-magnitude overflow sweep (round-8 brief #6).

The int64-wrap hazard class (quantized-long folds, cents sums,
cross-moments) grows with VALUE magnitude, not row count — so the sweep
scales every money/value column by 128 (exact in doubles) and reruns the
oracle compare: a wrap is either a Spark ANSI ARITHMETIC_OVERFLOW or a
mismatch against DuckDB's HUGEINT sums. See tools/overflow_sweep.py.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)


def test_money_fold_queries_survive_128x_magnitudes(tmp_path):
    from tools.overflow_sweep import build_scaled_dir, selected_names

    dst = str(tmp_path / "sf_x128")
    build_scaled_dir("/root/testdata/sf0.001", dst)
    names = selected_names()
    assert len(names) >= 70, "selection regex drifted — sweep lost coverage"
    r = subprocess.run(
        [
            sys.executable,
            str(Path(_REPO) / "tools" / "check_oracle.py"),
            "--sf-dir",
            dst,
            *names,
        ],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    lines = r.stdout.splitlines()
    fails = [ln for ln in lines if ln.startswith("FAIL")]
    oks = [ln for ln in lines if ln.startswith("OK")]
    assert not fails, fails[:5]
    assert len(oks) == len(names), (len(oks), len(names))
