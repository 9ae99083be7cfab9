"""Artifact/harness coherence guards.

Round-8 incident: ``bench.py``'s bitext ×100 truth protocol changed AFTER
``BENCH_FULL_r8.json`` was cut, so the committed artifact described a
measurement the harness no longer performs. Every BENCH_FULL cut now
carries a ``protocol`` stamp (sha256 content hash of bench.py, first 10
hex chars); this test fails whenever the newest committed BENCH_FULL
artifact was cut by a different bench.py than HEAD's — i.e. a harness
change without a re-cut cannot ship green.
"""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parent.parent


def _bench_protocol() -> str:
    return hashlib.sha256((_REPO / "bench.py").read_bytes()).hexdigest()[:10]


def test_bench_full_protocol_matches_head():
    arts = {}
    for p in _REPO.glob("BENCH_FULL_r*.json"):
        m = re.fullmatch(r"BENCH_FULL_r(\d+)\.json", p.name)
        if m:
            arts[int(m.group(1))] = p
    if not arts:
        pytest.skip("no BENCH_FULL artifacts committed yet")
    newest = arts[max(arts)]
    data = json.loads(newest.read_text())
    proto = data.get("protocol")
    if proto is None:
        pytest.skip(f"{newest.name} predates the protocol stamp (r<=8)")
    assert proto == _bench_protocol(), (
        f"{newest.name} was cut by a different bench.py (artifact protocol "
        f"{proto}, HEAD {_bench_protocol()}): re-cut the BENCH_FULL artifact "
        "after any bench.py change"
    )
