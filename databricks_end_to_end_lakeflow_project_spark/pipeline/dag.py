"""DLT-style declarative pipeline runtime (batch-incremental execution).

Re-expression of the reference's 9-node DLT pipeline surface
(SURVEY.md §2.8 T5; `dlt_bronze_to_silver_pipeline.py` registers 4
expectation-gated views, 4 streaming tables maintained by SCD1 CDC flows,
and a joined view):

- ``@pipeline.view`` — named transform; may carry expectations.
- ``pipeline.create_streaming_table(name)`` — a managed target table.
- ``pipeline.create_auto_cdc_flow(target, source, keys, sequence_by,
  stored_as_scd_type=1)`` — per-run: dedup source to latest-per-key and
  MERGE into the target (operators/cdc.py kernel).

Execution model: ``run()`` resolves the dataset graph by demand
(memoized recursion over ``ctx.read`` calls — the same dependency
discovery trick DLT does statically), applies expectations with metrics,
executes CDC flows in registration order, and materializes any requested
tables. Each ``run()`` is one incremental batch: re-running after new
source data arrives upserts the delta (idempotent for unchanged input —
the reference's `trigger(once=True)` job pattern, T1).

Scale notes: views are lazy DataFrames — nothing materializes twice; CDC
flows shuffle once on the business key; targets are ManagedParquetTables
which can be partitioned for pruned rewrites.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
    ManagedParquetTable,
    scd2_apply,
)
from databricks_end_to_end_lakeflow_project_spark.pipeline.expectations import (
    ExpectationResult,
    Policy,
    apply_expectations,
    split_expectations,
)


@dataclass
class _View:
    name: str
    fn: Callable[["Pipeline"], DataFrame]
    expectations: dict[str, str] = field(default_factory=dict)
    policy: Policy = Policy.DROP
    quarantine_to: str | None = None


@dataclass
class _AppendFlow:
    target: str
    source: str
    sequence_by: str


@dataclass
class _SnapshotFlow:
    target: str
    source: str
    keys: list[str]
    stored_as_scd_type: int = 1


@dataclass
class _CdcFlow:
    target: str
    source: str
    keys: list[str]
    sequence_by: str
    stored_as_scd_type: int = 1
    except_columns: list[str] = field(default_factory=list)
    apply_as_deletes: str | None = None
    apply_as_truncates: str | None = None


class Pipeline:
    """Registry + topological executor for a medallion pipeline."""

    def __init__(self, spark: SparkSession, storage_root: str) -> None:
        self.spark = spark
        self.storage_root = storage_root
        self._views: dict[str, _View] = {}
        self._tables: dict[str, ManagedParquetTable] = {}
        self._flows: list[_CdcFlow] = []
        self._append_flows: list[_AppendFlow] = []
        self._snapshot_flows: list[_SnapshotFlow] = []
        self._cache: dict[str, DataFrame] = {}
        self._resolving: list[str] = []
        self.metrics: dict[str, ExpectationResult] = {}
        self._pending_quarantine: dict[str, tuple[str, DataFrame]] = {}
        self._mviews: list[str] = []
        self._run_id = 0
        self._lineage: set[tuple[str, str]] = set()
        self._resolve_lock = threading.RLock()

    @property
    def cdc_flows(self):
        """Read-only view of the registered CDC flows, for callers that
        schedule flows themselves (e.g. the flight lake's overlapped
        bronze→silver chains) instead of calling ``run()``. Public so
        such callers never reach into ``_flows``."""
        return tuple(self._flows)

    # -- registration -------------------------------------------------------

    def view(
        self,
        name: str | None = None,
        expectations: dict[str, str] | None = None,
        policy: Policy = Policy.DROP,
        quarantine_to: str | None = None,
    ):
        """Decorator: register a named view. The function receives this
        pipeline and returns a DataFrame (use ``p.read`` inside for
        dependencies — that's how the DAG edges are discovered).

        ``quarantine_to`` names a managed side table: instead of silently
        dropping expectation violations, each ``run()`` appends them
        there with ``__failed_rules``/``__dataset``/``__batch_id``
        audit columns (the DLT quarantine pattern). Requires
        expectations and a DROP policy."""
        if quarantine_to and policy is not Policy.DROP:
            raise ValueError("quarantine_to requires Policy.DROP")

        def deco(fn: Callable[[Pipeline], DataFrame]):
            vname = name or fn.__name__
            if quarantine_to and not expectations:
                raise ValueError(f"view {vname!r}: quarantine_to without expectations")
            self._views[vname] = _View(
                vname, fn, dict(expectations or {}), policy, quarantine_to
            )
            return fn

        return deco

    def create_streaming_table(
        self,
        name: str,
        partition_by: Sequence[str] | None = None,
    ) -> None:
        """Declare a managed target table (reference S9)."""
        self._tables[name] = ManagedParquetTable(
            self.spark,
            os.path.join(self.storage_root, name),
            partition_by=partition_by,
        )

    def materialized_view(
        self,
        name: str | None = None,
        partition_by: Sequence[str] | None = None,
        expectations: dict[str, str] | None = None,
        policy: Policy = Policy.DROP,
    ):
        """Decorator: register a view that each ``run()`` fully recomputes
        and persists as a managed table (DLT ``@dlt.table`` / materialized
        view — the batch counterpart of a streaming table: correct under
        arbitrary upstream change because it never carries state forward;
        the upsert-based streaming tables handle the incremental path)."""

        def deco(fn: Callable[[Pipeline], DataFrame]):
            vname = name or fn.__name__
            self.view(vname, expectations, policy)(fn)
            self._tables[vname] = ManagedParquetTable(
                self.spark,
                os.path.join(self.storage_root, vname),
                partition_by=partition_by,
            )
            self._mviews.append(vname)
            return fn

        return deco

    def create_auto_cdc_flow(
        self,
        *,
        target: str,
        source: str,
        keys: Sequence[str],
        sequence_by: str,
        stored_as_scd_type: int = 1,
        except_column_list: Sequence[str] = (),
        apply_as_deletes: str | None = None,
        apply_as_truncates: str | None = None,
    ) -> None:
        """Register an APPLY CHANGES edge (reference W1).

        ``stored_as_scd_type=1`` (the reference's setting,
        `dlt_bronze_to_silver_pipeline.py:35`) keeps latest-per-key;
        ``stored_as_scd_type=2`` (the DLT API's other documented value)
        maintains a version table with ``__START_AT``/``__END_AT``
        validity columns (operators/cdc.py ``scd2_apply``).

        ``apply_as_deletes`` names a boolean source column marking delete
        events (the DLT API's parameter of the same name): when the latest
        change for a key is a flagged delete, the key is removed from the
        target. ``apply_as_truncates`` names a boolean column marking
        TRUNCATE directives (full-snapshot reload): target rows and
        same-batch changes older than the truncate's sequence are
        discarded. Both supported for type 1 only."""
        if stored_as_scd_type not in (1, 2):
            raise ValueError("stored_as_scd_type must be 1 or 2")
        if stored_as_scd_type == 2 and (apply_as_deletes or apply_as_truncates):
            raise NotImplementedError(
                "apply_as_deletes/apply_as_truncates require stored_as_scd_type=1"
            )
        if target not in self._tables:
            raise KeyError(f"unknown streaming table {target!r}; declare it first")
        self._flows.append(
            _CdcFlow(target, source, list(keys), sequence_by, stored_as_scd_type,
                     list(except_column_list), apply_as_deletes, apply_as_truncates)
        )

    def create_auto_cdc_from_snapshot_flow(
        self,
        *,
        target: str,
        source: str,
        keys: Sequence[str],
        stored_as_scd_type: int = 1,
    ) -> None:
        """Register a SNAPSHOT-diff CDC edge (DLT
        ``create_auto_cdc_from_snapshot_flow`` / apply_changes_from_
        snapshot): the source is a FULL table snapshot each run, with no
        change feed — changes are inferred by diffing against the
        previous run's snapshot (persisted as a side table).

        Type 1 keeps the target equal to the latest snapshot (an atomic
        swap — the diff only matters for engines with file-level MERGE).
        Type 2 maintains ``__START_AT``/``__END_AT`` validity intervals
        versioned by a persisted per-flow snapshot counter: updates and
        deletes close the open version; inserts (including re-inserts
        after a delete) open a new one. Incremental runs reproduce the
        one-shot `scd2_from_snapshots` fold exactly."""
        if stored_as_scd_type not in (1, 2):
            raise ValueError("stored_as_scd_type must be 1 or 2")
        if target not in self._tables:
            raise KeyError(f"unknown streaming table {target!r}; declare it first")
        self._snapshot_flows.append(
            _SnapshotFlow(target, source, list(keys), stored_as_scd_type)
        )

    def _snapshot_ver_path(self, flow: _SnapshotFlow) -> str:
        d = os.path.join(self.storage_root, "__snapshot_versions")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{flow.target}__{flow.source}.json")

    def _run_snapshot_flows(self) -> None:
        import json

        from databricks_end_to_end_lakeflow_project_spark.operators.cdc import (
            table_changes,
        )

        for flow in self._snapshot_flows:
            cur = self.read(flow.source)
            self._lineage.add((flow.source, flow.target))
            prev_tbl = ManagedParquetTable(
                self.spark,
                os.path.join(self.storage_root, f"{flow.target}__prev_snapshot"),
            )
            vpath = self._snapshot_ver_path(flow)
            ver = 0
            if os.path.exists(vpath):
                with open(vpath) as fh:
                    ver = json.load(fh)["version"]
            ver += 1
            prev = prev_tbl.read() if prev_tbl.exists() else cur.limit(0)
            changes = table_changes(prev, cur, flow.keys).filter(
                F.col("_change_type") != "update_preimage"
            )
            target = self._tables[flow.target]
            if flow.stored_as_scd_type == 1:
                target.overwrite(cur)
            else:
                attrs = [
                    c for c in changes.columns
                    if c not in (*flow.keys, "_change_type")
                ]
                opens = changes.filter(F.col("_change_type") != "delete").select(
                    *flow.keys,
                    *attrs,
                    F.lit(ver).alias("__START_AT"),
                    F.lit(None).cast("int").alias("__END_AT"),
                )
                closers = (
                    changes.select(*flow.keys)
                    .distinct()
                    .withColumn("__close", F.lit(True))
                )
                if target.exists():
                    hist = target.read()
                    closed = (
                        hist.join(closers, flow.keys, "left")
                        .withColumn(
                            "__END_AT",
                            F.when(
                                F.col("__END_AT").isNull() & F.col("__close"),
                                F.lit(ver),
                            ).otherwise(F.col("__END_AT")),
                        )
                        .drop("__close")
                        .select(*opens.columns)
                    )
                else:
                    closed = opens.limit(0)
                new_hist = closed.unionByName(opens).localCheckpoint()
                target.overwrite(new_hist)
            prev_tbl.overwrite(cur)
            with open(vpath, "w") as fh:
                json.dump({"version": ver}, fh)

    def create_append_flow(
        self,
        *,
        target: str,
        source: str,
        sequence_by: str,
    ) -> None:
        """Register an append flow (DLT ``@dlt.append_flow``): several
        sources multiplex into ONE streaming table, each appending only
        rows it has not delivered yet. Incrementality is tracked with a
        per-flow high-watermark on ``sequence_by`` persisted next to the
        tables, so flows survive process restarts — the batch analogue
        of the streaming checkpoint append_flow relies on. Requires a
        monotonically growing sequence per source (event-time or ingest
        id), the same contract as the streaming original."""
        if target not in self._tables:
            raise KeyError(f"unknown streaming table {target!r}; declare it first")
        self._append_flows.append(_AppendFlow(target, source, sequence_by))

    def _watermark_path(self, flow: _AppendFlow) -> str:
        d = os.path.join(self.storage_root, "__watermarks")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{flow.target}__{flow.source}.json")

    def _run_append_flows(self) -> None:
        import json

        for flow in self._append_flows:
            src = self.read(flow.source)
            path = self._watermark_path(flow)
            wm = None
            if os.path.exists(path):
                with open(path) as fh:
                    wm = json.load(fh)["watermark"]
            if wm is not None:
                src = src.filter(F.col(flow.sequence_by) > F.lit(wm))
            new_max = src.agg(F.max(flow.sequence_by).alias("m")).collect()[0]["m"]
            if new_max is None:
                continue  # nothing new from this source
            self._tables[flow.target].append(src)
            with open(path, "w") as fh:
                json.dump({"watermark": new_max}, fh)

    # -- resolution ---------------------------------------------------------

    def read(self, name: str) -> DataFrame:
        """Read a sibling dataset (view or managed table) — reference S5
        (`dlt.readStream("bookings_silver")`).

        Thread-safe: view resolution mutates the shared cache / lineage /
        metrics / resolving-stack structures, so the whole call holds the
        pipeline's re-entrant resolve lock (recursive ``pl.read`` calls
        inside view bodies re-enter it on the same thread). Concurrent
        callers — the per-entity ingest→silver chains and a deferred
        ``finalize_run`` overlapping downstream work — serialize on
        resolution only; the Spark jobs they launch still interleave."""
        with self._resolve_lock:
            return self._read_locked(name)

    def _read_locked(self, name: str) -> DataFrame:
        if self._resolving:
            # dependency edge: the dataset being resolved reads `name`
            self._lineage.add((name, self._resolving[-1]))
        if name in self._cache:
            return self._cache[name]
        if name in self._views:
            if name in self._resolving:
                raise ValueError(f"cycle in pipeline graph at {name!r}: {self._resolving}")
            self._resolving.append(name)
            try:
                v = self._views[name]
                df = v.fn(self)
                if v.quarantine_to:
                    _, quarantined = split_expectations(df, v.expectations, dataset=name)
                    self._pending_quarantine[name] = (v.quarantine_to, quarantined)
                df, metrics = apply_expectations(
                    df, v.expectations, v.policy, dataset=name,
                    collect_metrics=bool(v.expectations),
                )
                if metrics:
                    self.metrics[name] = metrics
            finally:
                self._resolving.pop()
            self._cache[name] = df
            return df
        if name in self._tables:
            return self._tables[name].read()
        raise KeyError(f"unknown dataset {name!r}")

    def table(self, name: str) -> ManagedParquetTable:
        return self._tables[name]

    def lineage(self) -> set[tuple[str, str]]:
        """(upstream, downstream) dataset edges discovered so far — the
        DLT pipeline-graph surface. View→view edges are recorded during
        demand-driven resolution; CDC flow edges are declared, so both
        appear after a run()."""
        edges = set(self._lineage)
        for f in self._flows:
            edges.add((f.source, f.target))
        return edges

    # -- execution ----------------------------------------------------------

    def run(self, materialize: Sequence[str] = ()) -> None:
        """One incremental batch: execute all CDC flows (dedup + upsert),
        recompute materialized views, then force any ``materialize``
        views (for side-effect-only runs). View cache is cleared first so
        a second ``run()`` observes new source data. Quarantined rows
        from every view resolved during the run are appended to their
        quarantine tables at the end, stamped with this run's
        ``__batch_id``; expectation metrics for the run are appended to
        the ``__event_log`` table (the DLT event-log analogue —
        `p.event_log()` to query it)."""
        # resolve every flow's source (view resolution serializes on the
        # resolve lock — it mutates the cache/lineage/metrics structures
        # and collects expectation metrics eagerly), then run the table
        # upserts CONCURRENTLY: each flow targets its own managed table
        # with its own commit lock, so Spark's scheduler interleaves the
        # independent write jobs exactly like DLT runs independent DAG
        # nodes in parallel. Results are identical to the sequential
        # order by target independence. begin/resolve/execute/finalize
        # are public pieces so an orchestrator can overlap them with its
        # OWN work (per-entity ingest→silver chains, a deferred finalize
        # racing a downstream read of the finished tables).
        from concurrent.futures import ThreadPoolExecutor

        self.begin_run()
        resolved = [self.resolve_flow(flow) for flow in self._flows]
        if len(resolved) > 1:
            with ThreadPoolExecutor(max_workers=len(resolved)) as ex:
                for f in [ex.submit(self.execute_flow, fl, s) for fl, s in resolved]:
                    f.result()  # re-raise the first failure, if any
        elif resolved:
            self.execute_flow(*resolved[0])
        self.finalize_run(materialize)

    def begin_run(self) -> None:
        """Open a new incremental batch: drop cached view resolutions so
        the run observes new source data, reset per-run metric and
        quarantine accumulators, bump the run id."""
        self._cache.clear()
        self.metrics.clear()
        self._pending_quarantine.clear()
        self._run_id += 1

    def resolve_flow(self, flow: _CdcFlow) -> tuple[_CdcFlow, DataFrame]:
        """Resolve one CDC flow's source view (expectations applied,
        metrics collected) — safe to call from concurrent entity chains;
        resolution itself serializes on the resolve lock."""
        src = self.read(flow.source)
        if flow.except_columns:
            src = src.drop(*flow.except_columns)
        return flow, src

    def execute_flow(self, flow: _CdcFlow, src: DataFrame) -> None:
        """Apply one resolved CDC flow to its target table (SCD1 upsert /
        SCD2 apply). Concurrency-safe across flows: each target is an
        independent managed table with its own commit lock."""
        if flow.stored_as_scd_type == 2:
            scd2_apply(self._tables[flow.target], src, flow.keys, flow.sequence_by)
        else:
            self._tables[flow.target].upsert(
                src, flow.keys, flow.sequence_by,
                delete_col=flow.apply_as_deletes,
                truncate_col=flow.apply_as_truncates,
            )

    def finalize_run(self, materialize: Sequence[str] = ()) -> None:
        """Close the batch: append flows, snapshot flows, materialized
        views, quarantine appends, event log. None of these outputs is
        read by the CDC target tables themselves, so a caller whose
        downstream only reads those tables may run finalize CONCURRENTLY
        with that downstream work (it still serializes internally on the
        resolve lock for any view reads it performs)."""
        self._run_append_flows()
        self._run_snapshot_flows()
        for name in self._mviews:
            self._tables[name].overwrite(self.read(name))
        for name in materialize:
            self.read(name).count()
        for _vname, (qtable, qdf) in self._pending_quarantine.items():
            if qtable not in self._tables:
                self.create_streaming_table(qtable)
            self._tables[qtable].append(
                qdf.withColumn("__batch_id", F.lit(self._run_id))
            )
        self._pending_quarantine.clear()
        self._append_event_log()

    def full_refresh(self, materialize: Sequence[str] = ()) -> None:
        """DLT "full refresh": drop every managed target plus ALL
        incremental side state (append-flow watermarks, snapshot-diff
        previous snapshots and version counters), then run once from
        scratch. The guarantee — and the test's assertion — is that a
        refreshed pipeline's tables are indistinguishable from a brand
        new pipeline's.

        The whole ``storage_root`` is cleared — not just the tables
        registered on THIS instance — so lazily-created state from a
        prior process (``__event_log``, quarantine tables never
        re-declared this session) cannot survive the reset ``_run_id``
        and collide with post-refresh ``__batch_id`` values."""
        import shutil as _sh

        _sh.rmtree(self.storage_root, ignore_errors=True)
        os.makedirs(self.storage_root, exist_ok=True)
        self._run_id = 0
        self.run(materialize=materialize)

    _EVENT_LOG = "__event_log"

    def _append_event_log(self) -> None:
        if not self.metrics:
            return
        rows = [
            (
                self._run_id,
                m.dataset,
                m.policy.value,
                rule,
                m.passed_rows + m.failed_rows,
                n_failed,
            )
            for m in self.metrics.values()
            for rule, n_failed in m.per_rule_failures.items()
        ]
        if self._EVENT_LOG not in self._tables:
            self.create_streaming_table(self._EVENT_LOG)
        self._tables[self._EVENT_LOG].append(
            self.spark.createDataFrame(
                rows,
                "run_id int, dataset string, policy string, rule string, "
                "n_rows long, n_failed long",
            )
        )

    def event_log(self) -> DataFrame:
        """Per-run, per-dataset, per-rule expectation outcomes as a
        queryable table (DLT event-log parity: the audit surface for
         'which rule failed how often in which update')."""
        return self._tables[self._EVENT_LOG].read()
