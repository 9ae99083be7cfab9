from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
    ManagedParquetTable,
    latest_by_key,
    merge_upsert_plan,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture
def base_rows():
    return [
        ("A", "v1", _ts("2024-01-01T00:00:00")),
        ("B", "v1", _ts("2024-01-01T00:00:00")),
        ("C", "v1", _ts("2024-01-01T00:00:00")),
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, val string, seq timestamp")


def test_latest_by_key_picks_max_sequence(spark):
    df = _df(
        spark,
        [
            ("A", "old", _ts("2024-01-01T00:00:00")),
            ("A", "new", _ts("2024-01-02T00:00:00")),
            ("B", "only", _ts("2024-01-01T00:00:00")),
        ],
    )
    out = {r["key"]: r["val"] for r in latest_by_key(df, ["key"], ["seq"]).collect()}
    assert out == {"A": "new", "B": "only"}


def test_latest_by_key_tiebreaker_deterministic(spark):
    df = spark.createDataFrame(
        [("A", "x", 1, 1), ("A", "y", 1, 2)], "key string, val string, seq int, tid int"
    )
    out = latest_by_key(df, ["key"], ["seq"], ["tid"]).collect()
    assert len(out) == 1 and out[0]["val"] == "y"


def test_upsert_insert_update_latest_wins(spark, tmp_path, base_rows):
    t = ManagedParquetTable(spark, str(tmp_path / "t"), keys=["key"], sequence_by="seq")
    t.upsert(_df(spark, base_rows))
    updates = _df(
        spark,
        [
            ("A", "v2", _ts("2024-01-02T00:00:00")),  # newer → wins
            ("B", "stale", _ts("2023-12-31T00:00:00")),  # older → ignored
            ("D", "new", _ts("2024-01-02T00:00:00")),  # new key → insert
        ],
    )
    t.upsert(updates)
    state = {r["key"]: r["val"] for r in t.read().collect()}
    assert state == {"A": "v2", "B": "v1", "C": "v1", "D": "new"}


def test_upsert_equal_sequence_update_wins(spark, tmp_path, base_rows):
    # reference semantics: whenMatchedUpdateAll(condition="src.seq >= trg.seq")
    t = ManagedParquetTable(spark, str(tmp_path / "t"), keys=["key"], sequence_by="seq")
    t.upsert(_df(spark, base_rows))
    t.upsert(_df(spark, [("A", "same-ts-update", _ts("2024-01-01T00:00:00"))]))
    state = {r["key"]: r["val"] for r in t.read().collect()}
    assert state["A"] == "same-ts-update"


def test_upsert_idempotent(spark, tmp_path, base_rows):
    t = ManagedParquetTable(spark, str(tmp_path / "t"), keys=["key"], sequence_by="seq")
    updates = _df(spark, [("A", "v2", _ts("2024-01-02T00:00:00"))])
    t.upsert(_df(spark, base_rows))
    t.upsert(updates)
    first = sorted(map(tuple, t.read().collect()))
    t.upsert(updates)  # re-apply same batch
    assert sorted(map(tuple, t.read().collect())) == first


def test_upsert_key_uniqueness_with_intra_batch_dups(spark, tmp_path, base_rows):
    t = ManagedParquetTable(spark, str(tmp_path / "t"), keys=["key"], sequence_by="seq")
    t.upsert(_df(spark, base_rows))
    # two changes for the same key in one batch → only the latest applies
    t.upsert(
        _df(
            spark,
            [
                ("A", "mid", _ts("2024-01-02T00:00:00")),
                ("A", "final", _ts("2024-01-03T00:00:00")),
            ],
        )
    )
    rows = t.read().filter(F.col("key") == "A").collect()
    assert len(rows) == 1 and rows[0]["val"] == "final"
    counts = t.read().groupBy("key").count().filter("count > 1").collect()
    assert counts == []


def test_merge_plan_no_sequence_updates_always_win(spark, base_rows):
    target = _df(spark, base_rows)
    updates = _df(spark, [("A", "forced", _ts("2020-01-01T00:00:00"))])
    out = {r["key"]: r["val"] for r in merge_upsert_plan(target, updates, ["key"], None).collect()}
    assert out["A"] == "forced"


def test_overwrite_swap_preserves_readability(spark, tmp_path, base_rows):
    t = ManagedParquetTable(spark, str(tmp_path / "t"), keys=["key"], sequence_by="seq")
    t.upsert(_df(spark, base_rows))
    assert t.exists()
    t.overwrite(_df(spark, [("Z", "z", _ts("2024-01-01T00:00:00"))]))
    assert [r["key"] for r in t.read().collect()] == ["Z"]


def _ddf(spark, rows):
    return spark.createDataFrame(
        rows, "key string, val string, seq timestamp, is_del boolean"
    )


def test_delete_removes_key(spark, base_rows):
    target = _df(spark, base_rows)
    updates = _ddf(spark, [("A", "x", _ts("2024-01-02T00:00:00"), True)])
    out = merge_upsert_plan(target, updates, ["key"], "seq", delete_col="is_del")
    got = {r["key"] for r in out.collect()}
    assert got == {"B", "C"}


def test_stale_delete_is_ignored(spark, base_rows):
    """A delete with an OLDER sequence than the target row must not win."""
    target = _df(spark, base_rows)
    updates = _ddf(spark, [("A", "x", _ts("2023-12-31T00:00:00"), True)])
    out = merge_upsert_plan(target, updates, ["key"], "seq", delete_col="is_del")
    row = {r["key"]: r["val"] for r in out.collect()}
    assert row["A"] == "v1"


def test_delete_then_reinsert_in_one_batch(spark, base_rows):
    """Within a batch, the LATEST change per key decides: delete then a
    newer upsert → the key survives with the new value."""
    target = _df(spark, base_rows)
    updates = _ddf(
        spark,
        [
            ("A", "gone", _ts("2024-01-02T00:00:00"), True),
            ("A", "back", _ts("2024-01-03T00:00:00"), False),
            ("B", "gone", _ts("2024-01-03T00:00:00"), True),
        ],
    )
    out = merge_upsert_plan(target, updates, ["key"], "seq", delete_col="is_del")
    row = {r["key"]: r["val"] for r in out.collect()}
    assert row == {"A": "back", "C": "v1"}


def test_delete_absent_key_is_noop(spark, base_rows):
    target = _df(spark, base_rows)
    updates = _ddf(spark, [("Z", "x", _ts("2024-01-02T00:00:00"), True)])
    out = merge_upsert_plan(target, updates, ["key"], "seq", delete_col="is_del")
    assert out.count() == 3


def test_table_upsert_with_deletes_first_and_incremental(spark, tmp_path):
    tbl = ManagedParquetTable(spark, str(tmp_path / "t"), keys=["key"], sequence_by="seq")
    first = _ddf(
        spark,
        [
            ("A", "v1", _ts("2024-01-01T00:00:00"), False),
            ("B", "v1", _ts("2024-01-01T00:00:00"), True),  # never materializes
        ],
    )
    tbl.upsert(first, delete_col="is_del")
    assert {r["key"] for r in tbl.read().collect()} == {"A"}
    second = _ddf(
        spark,
        [
            ("A", "v2", _ts("2024-01-02T00:00:00"), True),
            ("C", "v1", _ts("2024-01-02T00:00:00"), False),
        ],
    )
    tbl.upsert(second, delete_col="is_del")
    assert {r["key"] for r in tbl.read().collect()} == {"C"}


def test_time_travel_versions_and_vacuum(spark, tmp_path):
    """retain_versions: each overwrite snapshots the replaced state;
    read(version=n) returns the historical table; vacuum prunes."""
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
    )

    t = ManagedParquetTable(
        spark, str(tmp_path / "tt"), keys=["k"], sequence_by="seq",
        retain_versions=2,
    )
    t.upsert(spark.createDataFrame([(1, 1, "a")], "k int, seq int, v string"))
    t.upsert(spark.createDataFrame([(1, 2, "b")], "k int, seq int, v string"))
    t.upsert(spark.createDataFrame([(2, 3, "c")], "k int, seq int, v string"))

    assert t.history() == [0, 1]
    assert {r["v"] for r in t.read().collect()} == {"b", "c"}
    assert {r["v"] for r in t.read(version=0).collect()} == {"a"}
    assert {r["v"] for r in t.read(version=1).collect()} == {"b"}

    # a 4th write rolls the oldest snapshot out (retain_versions=2)
    t.upsert(spark.createDataFrame([(1, 4, "d")], "k int, seq int, v string"))
    assert t.history() == [1, 2]

    assert t.vacuum(retain_last=1) == 1
    assert t.history() == [2]
    import pytest

    with pytest.raises(ValueError):
        t.read(version=0)


def test_restore_to_version_is_history_preserving(spark, tmp_path):
    """RESTORE makes a retained snapshot current again AND archives the
    replaced state first, so a bad restore is itself restorable."""
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
    )

    t = ManagedParquetTable(
        spark, str(tmp_path / "rst"), keys=["k"], sequence_by="seq",
        retain_versions=3,
    )
    for i, v in enumerate(["a", "b", "c"]):
        t.upsert(spark.createDataFrame([(1, i + 1, v)], "k int, seq int, v string"))
    assert {r["v"] for r in t.read().collect()} == {"c"}
    assert t.history() == [0, 1]

    t.restore(0)  # back to the "a" state
    assert {r["v"] for r in t.read().collect()} == {"a"}
    # pre-restore "c" state was archived as version 2
    assert t.history() == [0, 1, 2]
    assert {r["v"] for r in t.read(version=2).collect()} == {"c"}

    t.restore(2)  # undo the restore
    assert {r["v"] for r in t.read().collect()} == {"c"}
    import pytest

    with pytest.raises(ValueError):
        t.restore(99)


# ---------------------------------------------------------------------------
# SCD Type 2
# ---------------------------------------------------------------------------


def _scd2_rows():
    return [
        # key A: x @1, x @2 (no-op), y @4, x @6  -> versions x[1,4) y[4,6) x[6,∞)
        ("A", 1, "x"), ("A", 2, "x"), ("A", 4, "y"), ("A", 6, "x"),
        # key B: single change -> one open version
        ("B", 3, "z"),
    ]


def _scd2_df(spark, rows):
    return spark.createDataFrame(rows, "k string, seq int, attr string")


def test_scd2_versions_and_noop_collapse(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        scd2_from_history,
    )

    out = scd2_from_history(_scd2_df(spark, _scd2_rows()), ["k"], "seq")
    got = {(r["k"], r["attr"], r["__START_AT"], r["__END_AT"]) for r in out.collect()}
    assert got == {
        ("A", "x", 1, 4),
        ("A", "y", 4, 6),
        ("A", "x", 6, None),
        ("B", "z", 3, None),
    }


def test_scd2_tie_resolution_latest_tiebreaker_wins(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        scd2_from_history,
    )

    rows = [("A", 1, 10, "x"), ("A", 1, 20, "y"), ("A", 2, 5, "z")]
    df = spark.createDataFrame(rows, "k string, seq int, tb int, attr string")
    out = scd2_from_history(df, ["k"], "seq", tiebreakers=["tb"])
    got = {(r["attr"], r["__START_AT"], r["__END_AT"]) for r in out.collect()}
    assert got == {("y", 1, 2), ("z", 2, None)}
    assert "tb" not in out.columns  # tiebreaker is ordering-only


def test_scd2_incremental_equals_one_shot(spark, tmp_path):
    """Two-batch scd2_apply == one-shot rebuild, including a LATE
    out-of-order change (seq 5 arrives in batch 2, splitting an already
    recorded version)."""
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
        scd2_apply,
        scd2_from_history,
    )

    all_rows = _scd2_rows() + [("A", 5, "w"), ("B", 7, "q")]
    batch1 = _scd2_df(spark, _scd2_rows())
    batch2 = _scd2_df(spark, [("A", 5, "w"), ("B", 7, "q")])

    t = ManagedParquetTable(spark, str(tmp_path / "scd2"))
    scd2_apply(t, batch1, ["k"], "seq")
    scd2_apply(t, batch2, ["k"], "seq")
    got = {(r["k"], r["attr"], r["__START_AT"], r["__END_AT"])
           for r in t.read().collect()}
    want = {(r["k"], r["attr"], r["__START_AT"], r["__END_AT"])
            for r in scd2_from_history(_scd2_df(spark, all_rows), ["k"], "seq").collect()}
    assert got == want
    # the late seq-5 change split A's [4,6) version
    assert ("A", "w", 5, 6) in got and ("A", "y", 4, 5) in got


def test_scd2_pipeline_flow(spark, tmp_path):
    """stored_as_scd_type=2 in the DAG runtime maintains a version table."""
    from databricks_end_to_end_lakeflow_project_spark.pipeline.dag import Pipeline

    src_rows = [("A", 1, "x"), ("A", 4, "y")]
    p = Pipeline(spark, str(tmp_path / "pl"))

    @p.view(name="changes")
    def changes(pl):
        return _scd2_df(spark, src_rows)

    p.create_streaming_table("dim_hist")
    p.create_auto_cdc_flow(
        target="dim_hist", source="changes", keys=["k"],
        sequence_by="seq", stored_as_scd_type=2,
    )
    p.run()
    assert {(r["attr"], r["__END_AT"]) for r in p.table("dim_hist").read().collect()} \
        == {("x", 4), ("y", None)}

    src_rows.append(("A", 6, "x"))
    p.run()
    got = {(r["attr"], r["__START_AT"], r["__END_AT"])
           for r in p.table("dim_hist").read().collect()}
    assert got == {("x", 1, 4), ("y", 4, 6), ("x", 6, None)}


def test_scd2_rejects_deletes(spark, tmp_path):
    from databricks_end_to_end_lakeflow_project_spark.pipeline.dag import Pipeline

    p = Pipeline(spark, str(tmp_path / "pl2"))
    p.create_streaming_table("t")
    with pytest.raises(NotImplementedError):
        p.create_auto_cdc_flow(
            target="t", source="s", keys=["k"], sequence_by="seq",
            stored_as_scd_type=2, apply_as_deletes="del",
        )


# ---------------------------------------------------------------------------
# Change Data Feed (table_changes)
# ---------------------------------------------------------------------------


def test_table_changes_all_four_types(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        table_changes,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    got = {(r["k"], r["s"], r["v"], r["_change_type"])
           for r in table_changes(old, new, ["k"]).collect()}
    assert got == {
        (1, "a", 10.0, "delete"),
        (3, "c", None, "update_preimage"),   # NULL flip detected (null-safe)
        (3, "c", 30.0, "update_postimage"),
        (4, "d", 40.0, "insert"),
    }  # key 2 unchanged -> absent


def test_table_changes_identical_states_empty(spark):
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        table_changes,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    assert table_changes(df, df, ["k"]).count() == 0


# ---------------------------------------------------------------------------
# delete_where + multi-table publish
# ---------------------------------------------------------------------------


def test_delete_where_purges_and_reports(spark, tmp_path):
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
        delete_where,
    )

    t = ManagedParquetTable(spark, str(tmp_path / "dw"), keys=["k"], sequence_by="seq")
    t.upsert(spark.createDataFrame(
        [("u1", 1, "a"), ("u2", 1, "b"), ("u3", 1, "c")],
        "k string, seq int, v string",
    ))
    assert delete_where(t, "k = 'u2'") == 1
    assert {r["k"] for r in t.read().collect()} == {"u1", "u3"}
    # NULL-safe: a condition evaluating to NULL keeps the row
    assert delete_where(t, "v = 'nope'") == 0
    assert t.read().count() == 2


def test_publish_atomically_all_or_nothing_on_prepare_failure(spark, tmp_path):
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
        publish_atomically,
    )

    t1 = ManagedParquetTable(spark, str(tmp_path / "p1"))
    t2 = ManagedParquetTable(spark, str(tmp_path / "p2"))
    t1.overwrite(spark.createDataFrame([(1,)], "x int"))
    t2.overwrite(spark.createDataFrame([(2,)], "x int"))

    bad = spark.createDataFrame([(0,)], "x int").selectExpr("1/x AS x")  # fails in ANSI
    ok = spark.createDataFrame([(10,)], "x int")
    import pytest as _pytest

    with _pytest.raises(Exception):
        publish_atomically([(t1, ok), (t2, bad)])
    # prepare failed -> neither table changed, no temp junk left behind
    assert [r["x"] for r in t1.read().collect()] == [1]
    assert [r["x"] for r in t2.read().collect()] == [2]
    import os

    leftovers = [d for d in os.listdir(tmp_path) if "__tmp" in d]
    assert leftovers == []

    publish_atomically([(t1, ok), (t2, ok)])
    assert [r["x"] for r in t1.read().collect()] == [10]
    assert [r["x"] for r in t2.read().collect()] == [10]


def test_snapshot_as_of_boundaries(spark):
    """AS-OF semantics at interval edges: v == __START_AT selects the new
    version; v == __END_AT selects the successor, never both."""
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        scd2_from_history,
        snapshot_as_of,
    )

    hist = scd2_from_history(_scd2_df(spark, _scd2_rows()), ["k"], "seq")
    for v, want in [(1, "x"), (3, "x"), (4, "y"), (5, "y"), (6, "x"), (99, "x")]:
        got = {r["attr"] for r in
               snapshot_as_of(hist, v).filter(F.col("k") == "A").collect()}
        assert got == {want}, (v, got)
    assert snapshot_as_of(hist, 0).filter(F.col("k") == "A").count() == 0


def test_upsert_merge_schema_evolution(spark, tmp_path):
    """merge_schema=True adds new update columns to the table (null for
    untouched rows); without it, unknown columns are dropped."""
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
    )

    t = ManagedParquetTable(spark, str(tmp_path / "ev"), keys=["k"], sequence_by="seq")
    t.upsert(spark.createDataFrame([("a", 1, "v1"), ("b", 1, "v1")],
                                   "k string, seq int, v string"))
    evolved = spark.createDataFrame(
        [("a", 2, "v2", 9.5), ("c", 2, "v1", 7.0)],
        "k string, seq int, v string, score double",
    )
    t.upsert(evolved, merge_schema=True)
    rows = {r["k"]: (r["v"], r["score"]) for r in t.read().collect()}
    assert rows == {"a": ("v2", 9.5), "b": ("v1", None), "c": ("v1", 7.0)}

    # default strictness: a further unknown column is silently dropped
    t.upsert(spark.createDataFrame(
        [("b", 3, "v3", 1.0, "x")],
        "k string, seq int, v string, score double, junk string",
    ))
    assert "junk" not in t.read().columns
    assert {r["k"]: r["v"] for r in t.read().collect()}["b"] == "v3"


def test_scd2_from_snapshots_hand_scenario(spark):
    """Snapshot-diff SCD2 including the re-insert-after-delete path:
    A appears, changes, disappears, reappears; B never changes; C is
    born in snapshot 3."""
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        scd2_from_snapshots,
    )

    def snap(rows):
        return spark.createDataFrame(rows, "k string, val int")

    s1 = snap([("A", 1), ("B", 9)])
    s2 = snap([("A", 2), ("B", 9)])          # A updated
    s3 = snap([("B", 9)])                    # A deleted
    s4 = snap([("A", 5), ("B", 9), ("C", 7)])  # A re-inserted, C born
    hist = {
        (r["k"], r["val"], r["__START_AT"], r["__END_AT"])
        for r in scd2_from_snapshots(
            [(1, s1), (2, s2), (3, s3), (4, s4)], ["k"]
        ).collect()
    }
    assert hist == {
        ("A", 1, 1, 2),      # closed by the update
        ("A", 2, 2, 3),      # closed by the delete (no row for the delete)
        ("A", 5, 4, None),   # re-insert opens a fresh interval
        ("B", 9, 1, None),   # never changed: one open version
        ("C", 7, 4, None),
    }


def test_occ_conditional_commit_conflict_and_retry(spark, tmp_path):
    """Delta-style optimistic concurrency: a write conditional on a
    stale snapshot version raises ConcurrentWriteError (and cleans its
    staged dir); re-reading and retrying at the fresh version succeeds.
    Unconditional writes still serialize and bump the version."""
    import os

    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ConcurrentWriteError,
        ManagedParquetTable,
    )

    t = ManagedParquetTable(
        spark, str(tmp_path / "t"), keys=["k"], sequence_by="seq"
    )
    df = lambda rows: spark.createDataFrame(rows, "k long, v string, seq long")
    t.upsert(df([(1, "a", 1)]))
    assert t.version() == 1

    # writer A reads its snapshot…
    v_a = t.version()
    # …writer B commits in between…
    t.upsert(df([(2, "b", 1)]))
    assert t.version() == 2
    # …A's conditional commit must conflict, not clobber B
    with pytest.raises(ConcurrentWriteError):
        t.upsert(df([(1, "a2", 2)]), expect_version=v_a)
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows == {1: "a", 2: "b"}, "failed commit must leave the table intact"
    # no abandoned stage dirs
    leftovers = [d for d in os.listdir(tmp_path) if "__tmp_" in d]
    assert leftovers == []

    # retry from a fresh read succeeds
    t.upsert(df([(1, "a2", 2)]), expect_version=t.version())
    assert {r["k"]: r["v"] for r in t.read().collect()} == {1: "a2", 2: "b"}
    assert t.version() == 3


def test_occ_append_serializes_and_conflicts(spark, tmp_path):
    """Appends go through the same commit protocol: they bump the
    version, a conditional append on a stale version conflicts, and
    appended batches accumulate rows."""
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ConcurrentWriteError,
        ManagedParquetTable,
    )

    t = ManagedParquetTable(spark, str(tmp_path / "t"))
    df = lambda n: spark.range(n).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    t.append(df(3))
    v1 = t.version()
    assert v1 == 1 and t.read().count() == 3
    t.append(df(2))
    assert t.version() == 2 and t.read().count() == 5
    with pytest.raises(ConcurrentWriteError):
        t.append(df(1), expect_version=v1)
    assert t.read().count() == 5


def test_occ_concurrent_threads_one_wins(spark, tmp_path):
    """Two writers race COMMITS based on the same snapshot version:
    exactly one lands, the other gets ConcurrentWriteError — never a
    lost update. Each writer's batch is precomputed from literals (the
    protocol under test is commit-time conflict detection; re-reading
    the table mid-swap is the separate, documented swap-table reader
    caveat and would only make the race flaky)."""
    import threading

    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ConcurrentWriteError,
        ManagedParquetTable,
    )

    t = ManagedParquetTable(spark, str(tmp_path / "t"), keys=["k"], sequence_by="seq")
    t.upsert(spark.createDataFrame([(1, "base", 1)], "k long, v string, seq long"))
    v0 = t.version()
    frames = {
        n: spark.createDataFrame(
            [(1, "base", 1), (2, n, 1)], "k long, v string, seq long"
        )
        for n in ("A", "B")
    }
    results = {}
    gate = threading.Barrier(2)

    def writer(name):
        gate.wait()
        try:
            t.overwrite(frames[name], expect_version=v0)
            results[name] = "ok"
        except ConcurrentWriteError:
            results[name] = "conflict"

    th = [threading.Thread(target=writer, args=(n,)) for n in ("A", "B")]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert sorted(results.values()) == ["conflict", "ok"], results
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows[1] == "base" and rows[2] in ("A", "B")
    assert t.version() == v0 + 1


def test_stale_lock_of_dead_owner_is_broken(spark, tmp_path):
    """A writer SIGKILLed between mkdir and rmdir leaves the lock dir
    behind with its pid inside; the NEXT commit must break that lock
    (the pid is dead — it cannot be mid-commit) instead of timing out
    forever with no remediation path."""
    import os
    import subprocess

    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
    )

    t = ManagedParquetTable(spark, str(tmp_path / "t"))
    df = spark.range(3).selectExpr("id AS k")
    # a pid that existed but is now certainly dead
    p = subprocess.Popen(["true"])
    p.wait()
    lock = f"{t.path}.__lock"
    os.makedirs(lock)
    with open(os.path.join(lock, "pid"), "w") as fh:
        fh.write(str(p.pid))

    t.overwrite(df)  # must break the stale lock, not TimeoutError
    assert t.read().count() == 3 and t.version() == 1
    assert not os.path.exists(lock), "lock released after the commit"


def test_stale_lock_without_pid_breaks_after_grace(spark, tmp_path):
    """A lock dir that never grew a pid file (owner died inside the
    two-syscall acquire window) is broken once its mtime is older than
    the grace period."""
    import os
    import time as _time

    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
    )

    t = ManagedParquetTable(spark, str(tmp_path / "t"))
    lock = f"{t.path}.__lock"
    os.makedirs(lock)
    past = _time.time() - 60
    os.utime(lock, (past, past))

    t.overwrite(spark.range(2).selectExpr("id AS k"))
    assert t.read().count() == 2
    assert not os.path.exists(lock)


def test_lock_timeout_cleans_staged_tmp(spark, tmp_path, monkeypatch):
    """A commit that times out on a held lock must clean its staged
    __tmp_ dir just like a version conflict does — a busy table must
    not leak one abandoned stage per failed writer."""
    import os

    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
    )

    orig = ManagedParquetTable._commit
    monkeypatch.setattr(
        ManagedParquetTable,
        "_commit",
        lambda self, ev, timeout=30.0: orig(self, ev, timeout=0.3),
    )
    t = ManagedParquetTable(spark, str(tmp_path / "t"))
    # a LIVE owner holds the lock (this process), so breaking is illegal
    lock = f"{t.path}.__lock"
    os.makedirs(lock)
    with open(os.path.join(lock, "pid"), "w") as fh:
        fh.write(str(os.getpid()))
    try:
        with pytest.raises(TimeoutError):
            t.overwrite(spark.range(1).selectExpr("id AS k"))
        leftovers = [d for d in os.listdir(tmp_path) if "__tmp_" in d]
        assert leftovers == [], "staged dir must be cleaned on timeout"
    finally:
        os.remove(os.path.join(lock, "pid"))
        os.rmdir(lock)


def test_append_publishes_atomic_batch_dir_unpartitioned(spark, tmp_path):
    """Unpartitioned appends land as ONE batch subdirectory per commit
    (a single rename — readers see all of a batch or none of it), and
    reads/overwrites over the nested layout behave identically to the
    flat one."""
    import os

    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
    )

    t = ManagedParquetTable(spark, str(tmp_path / "t"))
    df = lambda lo, n: spark.range(lo, lo + n).selectExpr("id AS k")
    t.append(df(0, 3))
    t.append(df(10, 2))
    batch_dirs = [d for d in os.listdir(t.path) if d.startswith("batch_")]
    assert len(batch_dirs) == 2, "one dir rename per append commit"
    assert sorted(r["k"] for r in t.read().collect()) == [0, 1, 2, 10, 11]
    # an overwrite collapses back to a fresh state and still reads fine
    t.overwrite(df(100, 1))
    assert [r["k"] for r in t.read().collect()] == [100]


def test_append_partitioned_still_per_file(spark, tmp_path):
    """Partitioned tables keep the per-file append path (batch dirs are
    incompatible with partition discovery): rows land in their partition
    dirs and the partition column reads back."""
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
    )

    t = ManagedParquetTable(spark, str(tmp_path / "t"), partition_by=["p"])
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, p string")
    t.append(df)
    t.append(spark.createDataFrame([(3, "a")], "k long, p string"))
    got = sorted((r["k"], r["p"]) for r in t.read().collect())
    assert got == [(1, "a"), (2, "b"), (3, "a")]


def test_optimize_compacts_files_and_preserves_content(spark, tmp_path):
    """OPTIMIZE analogue: appends accumulate small files / batch dirs;
    optimize() collapses them into ≈target-row bins via an ordinary OCC
    overwrite commit — content identical, file count strictly down, and
    history/time-travel still works across the compaction."""
    import os

    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ConcurrentWriteError,
        ManagedParquetTable,
    )

    t = ManagedParquetTable(spark, str(tmp_path / "t"), retain_versions=2)
    t.overwrite(spark.range(0, 100).selectExpr("id AS k").repartition(4))
    for lo in (100, 200, 300):
        t.append(spark.range(lo, lo + 100).selectExpr("id AS k").repartition(4))

    def n_files():
        return sum(
            1
            for _root, _dirs, files in os.walk(t.path)
            for f in files
            if not f.startswith(("_", "."))
        )

    before = n_files()
    v = t.version()
    bins = t.optimize(target_rows_per_file=1_000_000, expect_version=v)
    assert bins == 1
    assert n_files() < before
    assert t.read().count() == 400
    assert sorted(r["k"] for r in t.read().collect()) == list(range(400))
    # compaction is a real commit: OCC version bumped, the pre-compaction
    # state retained as a time-travel snapshot, and a stale
    # expect_version conflicts
    assert t.version() == v + 1
    snap = t.history()[-1]
    assert t.read(version=snap).count() == 400
    import pytest

    with pytest.raises(ConcurrentWriteError):
        t.optimize(expect_version=v)


# ---------------------------------------------------------------------------
# partition-pruned MERGE (upsert on a date-partitioned fact)
# ---------------------------------------------------------------------------


def _file_inventory(table_path):
    """{partition_rel_dir: {(filename, inode, size)}} for data files."""
    import os

    inv = {}
    for root, _dirs, files in os.walk(table_path):
        rel = os.path.relpath(root, table_path)
        data = {
            (f, os.stat(os.path.join(root, f)).st_ino,
             os.stat(os.path.join(root, f)).st_size)
            for f in files
            if not f.startswith(("_", "."))
        }
        if data:
            inv[rel] = data
    return inv


def _mk_partitioned(spark, tmp_path, retain_versions=0):
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
    )

    rows = [
        (k, month, f"p{k}")
        for month in ("2024-01", "2024-02", "2024-03")
        for k in range(10)
        if k % 3 != 0  # hold out %3==0 keys for insert coverage
    ]
    df = spark.createDataFrame(rows, "k long, month string, attr string")
    t = ManagedParquetTable(
        spark,
        str(tmp_path / "fact"),
        keys=["month", "k"],
        partition_by=["month"],
        retain_versions=retain_versions,
    )
    t.overwrite(df)
    return t


def test_upsert_prunes_untouched_partitions(spark, tmp_path):
    """The gold.py claim: a one-partition update batch on a
    date-partitioned fact rewrites ONLY that partition directory —
    untouched partitions keep the exact same files (same inodes, so not
    even rewritten-in-place), and the merged values are right."""
    t = _mk_partitioned(spark, tmp_path)
    before = _file_inventory(t.path)
    assert set(before) == {"month=2024-01", "month=2024-02", "month=2024-03"}
    v0 = t.version()

    updates = spark.createDataFrame(
        [(k, "2024-02", f"u{k}") for k in range(10)],
        "k long, month string, attr string",
    )
    t.upsert(updates)

    after = _file_inventory(t.path)
    assert after["month=2024-01"] == before["month=2024-01"], "untouched rewritten"
    assert after["month=2024-03"] == before["month=2024-03"], "untouched rewritten"
    assert after["month=2024-02"] != before["month=2024-02"], "touched unchanged"
    assert t.version() == v0 + 1

    state = {(r["k"], r["month"]): r["attr"] for r in t.read().collect()}
    expected = {}
    for month in ("2024-01", "2024-03"):
        for k in range(10):
            if k % 3 != 0:
                expected[(k, month)] = f"p{k}"
    for k in range(10):  # updated existing + inserted held-out keys
        expected[(k, "2024-02")] = f"u{k}"
    assert state == expected


def test_pruned_upsert_new_partition_and_partition_delete(spark, tmp_path):
    """Inserting a brand-new month creates exactly one new partition dir;
    a delete batch wiping every row of a month removes its dir; other
    partitions keep their exact files either way."""
    import pyspark.sql.functions as F  # noqa: N812

    t = _mk_partitioned(spark, tmp_path)
    before = _file_inventory(t.path)

    new_month = spark.createDataFrame(
        [(k, "2024-04", f"n{k}") for k in range(3)],
        "k long, month string, attr string",
    )
    t.upsert(new_month)
    inv = _file_inventory(t.path)
    assert set(inv) == set(before) | {"month=2024-04"}
    for rel in before:
        assert inv[rel] == before[rel], f"{rel} disturbed by new-partition insert"

    wipe = spark.createDataFrame(
        [(k, "2024-01", "x", True) for k in range(10)],
        "k long, month string, attr string, is_del boolean",
    )
    t.upsert(wipe, delete_col="is_del")
    inv2 = _file_inventory(t.path)
    assert "month=2024-01" not in inv2, "emptied partition dir must go"
    assert inv2["month=2024-02"] == inv["month=2024-02"]
    assert inv2["month=2024-03"] == inv["month=2024-03"]
    assert inv2["month=2024-04"] == inv["month=2024-04"]
    assert t.read().filter(F.col("month") == "2024-01").count() == 0


def test_pruned_upsert_time_travel_hardlink_snapshot(spark, tmp_path):
    """With retention on, a pruned upsert snapshots the FULL pre-state via
    hardlinks (metadata-only): time travel reads the old values, restore
    round-trips, and the snapshot survives the touched-dir removal."""
    t = _mk_partitioned(spark, tmp_path, retain_versions=2)
    pre = {(r["k"], r["month"]): r["attr"] for r in t.read().collect()}

    t.upsert(
        spark.createDataFrame(
            [(1, "2024-02", "changed")], "k long, month string, attr string"
        )
    )
    snap = t.history()[-1]
    old = {(r["k"], r["month"]): r["attr"] for r in t.read(version=snap).collect()}
    assert old == pre, "snapshot must hold the complete pre-merge state"
    assert {
        (r["k"], r["month"]): r["attr"] for r in t.read().collect()
    } != pre

    t.restore(snap)
    assert {(r["k"], r["month"]): r["attr"] for r in t.read().collect()} == pre


def test_upsert_falls_back_when_partition_not_in_keys(spark, tmp_path):
    """Partition column outside the merge key → rows may move partitions,
    so upsert must take the full-rewrite path and still be correct: the
    moved key exists ONCE, in its new partition."""
    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ManagedParquetTable,
    )

    df = spark.createDataFrame(
        [(1, "2024-01", "a"), (2, "2024-02", "b")],
        "k long, month string, attr string",
    )
    t = ManagedParquetTable(
        spark, str(tmp_path / "t"), keys=["k"], partition_by=["month"]
    )
    t.overwrite(df)
    # key 1 MOVES from 2024-01 to 2024-03
    t.upsert(
        spark.createDataFrame(
            [(1, "2024-03", "a2")], "k long, month string, attr string"
        )
    )
    rows = {(r["k"]): (r["month"], r["attr"]) for r in t.read().collect()}
    assert rows == {1: ("2024-03", "a2"), 2: ("2024-02", "b")}


def test_pruned_upsert_occ_conflict_cleans_tmp(spark, tmp_path):
    """A pruned upsert conditional on a stale version must raise
    ConcurrentWriteError, leave the table untouched, and clean its
    staged tmp dir."""
    import os

    import pytest

    from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
        ConcurrentWriteError,
    )

    t = _mk_partitioned(spark, tmp_path)
    v0 = t.version()
    t.append(
        spark.createDataFrame(
            [(100, "2024-03", "later")], "k long, month string, attr string"
        )
    )
    before = _file_inventory(t.path)
    with pytest.raises(ConcurrentWriteError):
        t.upsert(
            spark.createDataFrame(
                [(1, "2024-02", "stale")], "k long, month string, attr string"
            ),
            expect_version=v0,
        )
    assert _file_inventory(t.path) == before
    parent = os.path.dirname(t.path)
    assert [d for d in os.listdir(parent) if "__tmp_" in d] == []
