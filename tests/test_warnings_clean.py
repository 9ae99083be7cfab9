"""Warnings-clean bar for the oracle path (round-5 brief item #4).

The bench harness already enforces zero ``CacheManager`` /
``WindowExec: No Partition Defined`` warnings on its own stderr; this
test extends the same bar to the ORACLE path by running a curated
`tools/check_oracle.py` batch in a subprocess and failing on any of the
warning classes this engine has individually fixed:

- ``WARN Column`` — "trivially true equals predicate" (same-lineage
  self-joins missing an alias; fixed in `sim_recall_at_k_eval`).
- ``WARN WindowExec``/``WindowGroupLimitExec`` — "No Partition Defined"
  (a window collapsing to one partition; plan-guarded per query in
  `tests/test_plans.py`, re-checked here end-to-end).
- ``WARN CacheManager`` — "Asked to cache already cached data" (the
  double-persist `session.persist_once` exists to prevent; the batch
  runs the LSH query TWICE to exercise the repeat path).

A subprocess (local[8]) is used because these warnings are emitted by
log4j on the JVM's stderr — invisible to in-process pytest capture. The
batch covers the surfaces where each class historically fired; the
full-registry run happens in the round-closing `check_oracle.py` pass.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# one query per historical warning source, plus the broad shapes
# (windows, star joins, stream replay) most likely to regress
BATCH = [
    "sim_recall_at_k_eval",  # WARN Column (fixed round 5)
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_lsh_pairs",  # repeat: exercises persist_once
    "dedup_semdedup_keep",
    "win_topk_per_group",
    "win_rank_dense_ntile",
    "flagship_star_revenue",
    "graph_adamic_adar_topk",
]

FORBIDDEN = re.compile(
    r"WARN (Column|WindowExec|WindowGroupLimitExec|CacheManager)\b"
)


def test_oracle_batch_emits_no_known_warning_classes():
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_oracle.py"), *BATCH],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        env=env,
        timeout=560,
    )
    assert proc.returncode == 0, (
        f"oracle batch failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
    # every query must be oracle-OK, not merely warning-free
    ok = sum(1 for line in proc.stdout.splitlines() if line.startswith("OK"))
    assert ok == len(BATCH), f"expected {len(BATCH)} OK lines:\n{proc.stdout}"
    bad = [
        line
        for line in proc.stderr.splitlines()
        if FORBIDDEN.search(line)
    ]
    assert bad == [], "forbidden warning classes on oracle path:\n" + "\n".join(bad)
