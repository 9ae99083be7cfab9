"""CDC / SCD Type 1 kernel: sequence-ordered dedup + keyed upsert (MERGE
emulation) on parquet-backed managed tables.

This is the engine's re-expression of the reference's two CDC primitives
(SURVEY.md §2.5 W1, §2.1 S8):

- ``dlt.create_auto_cdc_flow(..., keys, sequence_by, stored_as_scd_type=1)``
  (`dlt_bronze_to_silver_pipeline.py:30-36`): per business key, order
  change rows by the sequence column, keep the latest → `latest_by_key`.
- ``DeltaTable.merge(...).whenMatchedUpdateAll(condition="src.modifiedDate
  >= trg.modifiedDate").whenNotMatchedInsertAll()``
  (`DIM_Gold_layer.py:273-283`): latest-wins keyed upsert →
  `ManagedParquetTable.upsert`.

No delta-spark is available in this environment, so MERGE is emulated with
a pure DataFrame plan: tag target rows and deduped updates, union, and keep
one winner per key by (sequence DESC, is_update DESC) — which reproduces
the reference's `src.seq >= trg.seq` tie-goes-to-update semantics exactly.
The result is written to a temp dir and atomically swapped in.

Scale notes (100 TB): the winner-per-key plan is ONE shuffle on the
business key (same cost class as Delta MERGE's join). The rewrite cost is
full-table here; a real deployment bounds it by partitioning the table
(``partition_by``) so only partitions containing updated keys rewrite —
`upsert` prunes untouched partitions when the table is partitioned by a
column derivable from the keys. Updates are usually ≪ target, so the
update side broadcasts under AQE automatically.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.sources.readers import read_table

_SRC = "__is_update"
_RN = "__cdc_rn"


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    sequence_by: Sequence[str],
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Latest record per business key, ordered by sequence columns DESC.

    Reference W1 (`dlt.create_auto_cdc_flow` sequence semantics). Pass
    ``tiebreakers`` (unique within key+sequence) to make the choice
    deterministic when the sequence column ties — mandatory for
    oracle-reproducible results and for cluster-scale determinism.
    """
    order = [F.col(c).desc_nulls_last() for c in [*sequence_by, *tiebreakers]]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)


def _apply_truncates(
    df: DataFrame, sequence_by: str, truncate_col: str | None, markers: DataFrame | None
) -> DataFrame:
    """Drop rows whose sequence predates the latest truncate marker.
    ``markers`` is the (possibly empty) marker frame; its MAX(sequence)
    broadcasts as a 1-row literal — no driver collect, no shuffle."""
    tmax = (markers if markers is not None else df.limit(0)).agg(
        F.max(sequence_by).alias("__tseq")
    )
    out = (
        df.crossJoin(F.broadcast(tmax))
        .filter(F.col("__tseq").isNull() | (F.col(sequence_by) >= F.col("__tseq")))
        .drop("__tseq")
    )
    return out


def merge_upsert_plan(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    sequence_by: str | None,
    delete_col: str | None = None,
    truncate_col: str | None = None,
) -> DataFrame:
    """Pure-DataFrame MERGE: latest-wins upsert of ``updates`` into
    ``target``; returns the new table contents.

    Semantics match `DIM_Gold_layer.py:276-283`:
    - not matched → insert;
    - matched → update iff ``updates.seq >= target.seq`` (tie → update);
    - with ``sequence_by=None`` updates always win on match.

    ``delete_col`` names a boolean column on ``updates`` flagging delete
    events (DLT ``apply_as_deletes``, supported by the reference's
    `dlt.create_auto_cdc_flow` API though its pipeline never passes it):
    the latest change per key decides — if that winner is a flagged
    delete, the key leaves the table; an out-of-sequence delete (older
    than the target's row) is ignored like any stale update.

    No tombstones are retained: an update arriving in a LATER batch with
    a sequence older than an already-applied delete re-inserts the row
    (the delete left nothing to compare against). DLT bounds this with a
    tombstone retention window; here the contract is the usual streaming
    one — feed batches in sequence order per key (the pipeline's
    micro-batches do), and intra-batch disorder resolves correctly.

    ``truncate_col`` names a boolean column flagging TRUNCATE directives
    (DLT ``apply_as_truncates`` — full-snapshot reload support): every
    target row AND every change older than the newest truncate's
    sequence is discarded before the merge; changes at or after it apply
    normally. Requires ``sequence_by``.
    """
    cols = list(target.columns)
    extra = [c for c in (delete_col, truncate_col) if c]
    updates = updates.select(*cols, *extra)
    if truncate_col:
        if not sequence_by:
            raise ValueError("truncate_col requires sequence_by")
        markers = updates.filter(F.coalesce(F.col(truncate_col), F.lit(False)))
        updates = _apply_truncates(
            updates.filter(~F.coalesce(F.col(truncate_col), F.lit(False))).drop(
                truncate_col
            ),
            sequence_by, truncate_col, markers,
        )
        target = _apply_truncates(target, sequence_by, truncate_col, markers)
    if sequence_by:
        updates = latest_by_key(updates, keys, [sequence_by])
        order = [F.col(sequence_by).desc_nulls_last(), F.col(_SRC).desc()]
    else:
        updates = updates.dropDuplicates(list(keys))
        order = [F.col(_SRC).desc()]
    if delete_col:
        target = target.withColumn(delete_col, F.lit(False))
    tagged = updates.withColumn(_SRC, F.lit(1)).unionByName(
        target.withColumn(_SRC, F.lit(0))
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    merged = (
        tagged.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN, _SRC)
    )
    if delete_col:
        merged = merged.filter(~F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )
    return merged


class ConcurrentWriteError(RuntimeError):
    """Delta ``ConcurrentAppendException`` analogue: the table's commit
    version moved past the snapshot a conditional write was based on —
    the caller must re-read and retry (optimistic concurrency)."""


class ManagedParquetTable:
    """Parquet-backed managed table with atomic overwrite and MERGE-style
    upsert (the engine's stand-in for a Delta table, SURVEY §4.1).

    Writes go to a sibling temp dir and are swapped in with directory
    renames, so readers never observe a half-written table and a failed
    job leaves the previous version intact.

    Delta-style OPTIMISTIC CONCURRENCY on top of the swap: every commit
    (overwrite / upsert / append / restore) increments a sidecar commit
    version under a directory-lock mutex (``os.mkdir`` is atomic on
    POSIX, so the lock works across processes sharing the filesystem —
    the Delta-on-object-store analogue of the log's putIfAbsent).
    Writers that based their batch on a snapshot pass
    ``expect_version=table.version()``; if another writer committed in
    between, the commit raises :class:`ConcurrentWriteError` instead of
    silently clobbering — read-modify-write cycles (MERGE, SCD flows)
    retry from a fresh read, exactly Delta's protocol. Unconditional
    writes still serialize through the lock (last-wins, never torn).
    The expensive Spark write stages OUTSIDE the lock; only the O(1)
    rename-and-bump holds it.

    Reader caveat (the part only a real commit LOG can fix): a read that
    is mid-scan while a commit swaps the directory can fail on vanished
    files when ``retain_versions == 0`` (the old dir is deleted after
    the swap). ``retain_versions > 0`` keeps replaced states as
    snapshots, so in-flight scans finish against inodes that still
    exist. Single-process pipelines (this engine's DLT runtime) order
    reads and commits and never hit it.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str] | None = None,
        sequence_by: str | None = None,
        partition_by: Sequence[str] | None = None,
        retain_versions: int = 0,
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = list(keys or [])
        self.sequence_by = sequence_by
        self.partition_by = list(partition_by or [])
        # >0 enables Delta-style time travel: each overwrite snapshots
        # the replaced state under {path}.__versions/<n> (directory
        # renames — O(1) regardless of table size) and keeps the newest
        # `retain_versions` snapshots. 0 preserves pure swap-and-delete.
        self.retain_versions = retain_versions

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            not f.startswith(("_", ".")) for f in os.listdir(self.path)
        )

    def read(self, version: int | None = None) -> DataFrame:
        """Current state, or a retained snapshot by version number
        (Delta time-travel analogue; see :meth:`history`).

        If a DEAD writer's intent journal is present (crash mid-commit),
        the read first completes that commit under the lock — so a
        reader observes old-or-new at every kill point, never the torn
        mid-swap window. A LIVE writer's journal is left alone (the
        documented lock-less-reader caveat applies while it runs)."""
        it = self._read_intent()
        if it is not None:
            from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
                _alive,
            )

            if not _alive(int(it.get("pid", 0) or 0)):
                self.recover()
        if version is None:
            return self._read_dir(self.path)
        vpath = os.path.join(self._versions_dir(), str(version))
        if not os.path.isdir(vpath):
            raise ValueError(
                f"version {version} not retained; available: {self.history()}"
            )
        return self._read_dir(vpath)

    def _read_dir(self, path: str) -> DataFrame:
        # unpartitioned tables publish appends as whole batch SUBDIRS
        # (one atomic rename per commit — see `append`), so reads must
        # descend into them; recursiveFileLookup is incompatible with
        # partition discovery, which is exactly why partitioned tables
        # keep the per-file append path instead
        reader = self.spark.read
        if not self.partition_by:
            reader = reader.option("recursiveFileLookup", "true")
        return reader.parquet(path)

    def _versions_dir(self) -> str:
        return f"{self.path}.__versions"

    # -- optimistic-concurrency commit protocol -----------------------------

    def version(self) -> int:
        """Current commit version (0 for a never-committed table). Pass
        this as ``expect_version`` to a later write to make it
        conditional on no intervening commit."""
        try:
            with open(f"{self.path}.__version") as fh:
                return int(fh.read().strip() or 0)
        except FileNotFoundError:
            return 0

    def _bump_version(self) -> None:
        vf = f"{self.path}.__version"
        tmp = f"{vf}.tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(str(self.version() + 1))
        os.replace(tmp, vf)

    @contextlib.contextmanager
    def _commit(self, expect_version: int | None, timeout: float = 30.0):
        """Directory-lock mutex around the O(1) commit section; verifies
        the expected version INSIDE the lock, bumps it on success.

        WRITE-AHEAD INTENT (crash atomicity): every destructive commit
        body first journals its remaining steps to ``{path}.__intent``
        (atomic ``os.replace``) and only then starts renaming. The
        intent write is the COMMIT POINT — Delta's log-entry analogue:
        a writer that dies before it leaves only stage litter (swept by
        pid liveness); a writer that dies after it leaves a journal the
        NEXT lock holder (writer, or a reader that observes a dead
        writer's intent) rolls FORWARD idempotently via the same
        ``_redo_*`` step functions the live path runs, then bumps the
        version exactly once and clears the journal. Readers therefore
        see old-or-new state at every kill point — including the
        previously torn mid-swap window where the table dir was absent
        between the two renames. See `tests/test_crash_recovery.py` for
        the kill-point matrix.

        STALE-LOCK RECOVERY: the owner writes its pid into
        ``{lock}/pid`` right after acquiring; a writer SIGKILLed between
        mkdir and rmdir would otherwise brick the table (every later
        commit timing out with no remediation path). Contenders that find
        the pid belonging to a dead process (scratch.py's liveness probe)
        break the lock and re-contend; a lock dir that never grew a pid
        file (owner died inside the two-syscall acquire window) is broken
        once its mtime is older than a grace period. Breaking is ATOMIC:
        the whole lock dir is renamed aside to a unique grave first
        (``_break_lock``), so rename wins for exactly one breaker and a
        lock that was meanwhile released-and-re-acquired can never be
        torn apart piecemeal (the old remove-pid-then-rmdir sequence
        could delete a NEW live owner's pid). A live owner whose lock is
        renamed aside before its pid write FAILS LOUDLY — the pid write
        targets a path inside the now-gone dir — instead of silently
        entering the critical section; a pid-carrying live owner found
        inside the grave (stale decision made against a prior incarnation
        of the path) gets its lock renamed back untouched."""
        from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
            _alive,
        )

        with self._locked(timeout):
            self._recover_locked()
            if expect_version is not None and self.version() != expect_version:
                raise ConcurrentWriteError(
                    f"{self.path}: version moved {expect_version} -> "
                    f"{self.version()}; re-read and retry"
                )
            yield
            self._bump_version()
            self._clear_intent()

    @contextlib.contextmanager
    def _locked(self, timeout: float = 30.0):
        """Bare directory-lock mutex (acquire → pid stamp → release);
        the stale-lock breaking documented on `_commit` lives here."""
        from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
            _alive,
        )

        lock = f"{self.path}.__lock"
        pid_file = os.path.join(lock, "pid")
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        deadline = time.monotonic() + timeout
        while True:
            try:
                os.mkdir(lock)
                break
            except FileExistsError:
                owner: int | None = None
                try:
                    with open(pid_file) as fh:
                        owner = int(fh.read().strip() or 0)
                except (FileNotFoundError, ValueError, OSError):
                    owner = None
                stale = False
                if owner is not None:
                    stale = not _alive(owner)
                else:
                    # no pid yet: give a live owner time to write it; a dir
                    # whose mtime stopped advancing past the grace window
                    # has a dead owner (pid write bumps the dir mtime).
                    # Generous grace: a live owner suspended here (SIGSTOP,
                    # swap, GC pause) that outlives it STILL cannot commit
                    # unlocked — its pid write lands inside the renamed-away
                    # dir and raises, so a too-eager break aborts the owner
                    # rather than admitting two writers.
                    try:
                        stale = time.time() - os.stat(lock).st_mtime > 30.0
                    except FileNotFoundError:
                        continue  # released between mkdir and stat — retry
                if stale:
                    self._break_lock(lock)
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(f"commit lock busy: {lock}")
                time.sleep(0.02)
        try:
            with open(pid_file, "w") as fh:
                fh.write(str(os.getpid()))
            yield
        finally:
            with contextlib.suppress(OSError):
                os.remove(pid_file)
            with contextlib.suppress(OSError):
                os.rmdir(lock)

    # -- write-ahead intent journal (crash atomicity) ------------------------

    def _intent_path(self) -> str:
        return f"{self.path}.__intent"

    def _write_intent(self, intent: dict) -> None:
        """Journal the remaining commit steps — MUST be called inside the
        lock, before the first destructive rename. Atomic publish via
        ``os.replace``, so a crashed half-write is impossible."""
        import json

        intent = {**intent, "pid": os.getpid(), "bump_from": self.version()}
        tmp = f"{self._intent_path()}.tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(json.dumps(intent))
        os.replace(tmp, self._intent_path())

    def _read_intent(self) -> dict | None:
        import json

        try:
            with open(self._intent_path()) as fh:
                return json.loads(fh.read())
        except (FileNotFoundError, ValueError):
            return None

    def _clear_intent(self) -> None:
        with contextlib.suppress(OSError):
            os.remove(self._intent_path())

    def recover(self, timeout: float = 30.0) -> None:
        """Complete a crashed writer's journaled commit (roll forward)
        and sweep dead writers' stage litter. Runs under the commit
        lock; a no-op on a healthy table."""
        with self._locked(timeout):
            self._recover_locked()

    def _recover_locked(self) -> None:
        """Recovery, lock already held. An intent present while WE hold
        the lock can only come from a crashed writer (the live path
        clears it before releasing), so it is rolled forward
        unconditionally: the `_redo_*` functions are idempotent against
        every intermediate on-disk state, recovery that itself crashes
        simply re-enters. The version is bumped exactly once
        (``bump_from`` guards double-bump when the writer died between
        its bump and its journal clear)."""
        it = self._read_intent()
        if it is not None:
            op = it.get("op")
            if op == "swap":
                self._redo_swap(it["tmp"], it.get("nxt"), it.get("old"))
            elif op == "append":
                self._redo_append(it["tmp"], it["tag"])
            elif op == "pruned":
                self._redo_pruned(
                    it["tmp"], it["old_rels"], it["new_rels"], it["graves"]
                )
            if self.version() == it.get("bump_from"):
                self._bump_version()
            self._clear_intent()
        self._sweep_stage_litter()

    def _sweep_stage_litter(self) -> None:
        """Remove stage/grave dirs abandoned by DEAD writers (crash
        before the intent write = abort, like a Delta write that never
        reached the log). Dir names embed the owner pid
        (``__tmp_<pid>_…``); a live writer staging concurrently is
        never touched."""
        import glob as _glob
        import re as _re

        from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
            _alive,
        )

        for pattern in (f"{self.path}.__tmp_*", f"{self.path}.__old_*"):
            for d in _glob.glob(pattern):
                m = _re.match(r"\.__(?:tmp|old)_(\d+)_", d[len(self.path):])
                if m and not _alive(int(m.group(1))):
                    shutil.rmtree(d, ignore_errors=True)
        vdir = self._versions_dir()
        if os.path.isdir(vdir):
            for d in os.listdir(vdir):
                # partial snapshot staging from a crashed pruned MERGE
                if d.startswith(".staging_"):
                    parts = d.split("_")
                    if len(parts) >= 2 and parts[1].isdigit() and not _alive(
                        int(parts[1])
                    ):
                        shutil.rmtree(os.path.join(vdir, d), ignore_errors=True)

    def _stage_name(self) -> str:
        return f"{self.path}.__tmp_{os.getpid()}_{uuid.uuid4().hex[:8]}"

    @staticmethod
    def _break_lock(lock: str) -> None:
        """Atomically retire a lock dir judged stale: rename the WHOLE dir
        aside to a unique grave, then rmtree the grave. ``os.rename`` of a
        directory is atomic and succeeds for at most one breaker, so two
        contenders that both observed a dead owner cannot interleave their
        removals, and a released-then-re-acquired lock is never half
        deleted. Safety re-check: if the grave turns out to contain a LIVE
        pid (the stale decision was made against a previous incarnation of
        the path and the rename grabbed a fresh owner's lock), rename it
        straight back — the owner never notices. A live owner broken
        BEFORE its pid write fails loudly instead (its ``open`` targets a
        path inside the gone dir), so no path admits two writers."""
        from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
            _alive,
        )

        grave = f"{lock}.broken.{os.getpid()}.{uuid.uuid4().hex}"
        try:
            os.rename(lock, grave)
        except OSError:
            return  # another breaker won, or the owner released — re-contend
        owner = 0
        try:
            with open(os.path.join(grave, "pid")) as fh:
                owner = int(fh.read().strip() or 0)
        except (FileNotFoundError, ValueError, OSError):
            owner = 0
        if owner and _alive(owner):
            # we grabbed a live writer's freshly re-acquired lock: undo.
            with contextlib.suppress(OSError):
                os.rename(grave, lock)
            return
        shutil.rmtree(grave, ignore_errors=True)

    @staticmethod
    def _link_tree(src: str, dst: str) -> None:
        """Snapshot ``src`` into ``dst`` with hardlinks — O(#files)
        metadata operations, ZERO data bytes copied. Safe because table
        data files are immutable by construction: every writer creates
        new names (append batch tags, tmp-dir swaps), nothing rewrites a
        parquet file in place, so a hardlinked snapshot can never be
        mutated through the live table. This is what makes
        partition-pruned commits compatible with time travel at scale:
        the snapshot cost tracks file COUNT, not table bytes."""
        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            droot = dst if rel == "." else os.path.join(dst, rel)
            os.makedirs(droot, exist_ok=True)
            for f in files:
                os.link(os.path.join(root, f), os.path.join(droot, f))

    def history(self) -> list[int]:
        """Retained snapshot versions, oldest first (the CURRENT state is
        always one newer than the last entry)."""
        vdir = self._versions_dir()
        if not os.path.isdir(vdir):
            return []
        return sorted(int(d) for d in os.listdir(vdir) if d.isdigit())

    def restore(self, version: int) -> None:
        """Delta `RESTORE TABLE ... TO VERSION AS OF` analogue: make a
        retained snapshot the CURRENT state again. The restore itself is
        an overwrite, so the replaced (pre-restore) state is archived as
        a new version first — a bad restore is itself restorable, exactly
        like Delta's history-preserving RESTORE. Directory copy of the
        snapshot (it must survive under version retention), then the
        standard atomic swap."""
        vpath = os.path.join(self._versions_dir(), str(version))
        if not os.path.isdir(vpath):
            raise ValueError(
                f"version {version} not retained; available: {self.history()}"
            )
        tmp = self._stage_name()
        shutil.copytree(vpath, tmp)
        # same journaled swap as overwrite: restore survives kill points
        self._swap_commit(tmp, None)

    def optimize(
        self,
        target_rows_per_file: int = 1 << 20,
        expect_version: int | None = None,
    ) -> int:
        """Delta ``OPTIMIZE`` analogue: rewrite the table's current
        content into ≈``target_rows_per_file``-row files, collapsing the
        small files (and batch subdirectories) that accumulate under
        append-heavy workloads. Pure compaction — ``coalesce``, never a
        shuffle: bin-packing does not need co-location, and at 100 TB a
        repartition would move every byte twice (use `cluster_zorder`
        when data-skipping LAYOUT is the goal, not file count). The
        rewrite is an ordinary optimistic-concurrency overwrite commit:
        readers see old-or-new atomically, and a concurrent append
        conflicts via ``expect_version`` instead of being silently
        dropped. When the caller does not pass ``expect_version``, the
        CURRENT version is captured up front — compaction reads the table
        twice outside the lock (count for bin sizing, then the staging
        scan), so an unconditional overwrite would silently discard any
        append landing between those reads; pinning the version makes
        every concurrent commit a loud ``ConcurrentWriteError`` instead
        of a lost update. Returns the output file-bin count."""
        if expect_version is None:
            expect_version = self.version()
        n = self.read().count()
        bins = max(1, -(-n // target_rows_per_file))
        self.overwrite(self.read().coalesce(bins), expect_version=expect_version)
        return bins

    def vacuum(self, retain_last: int = 0) -> int:
        """Drop all but the newest ``retain_last`` snapshots; returns the
        number removed (Delta VACUUM analogue at directory granularity)."""
        versions = self.history()
        doomed = versions[: max(0, len(versions) - retain_last)]
        for v in doomed:
            shutil.rmtree(os.path.join(self._versions_dir(), str(v)), ignore_errors=True)
        return len(doomed)

    def overwrite(self, df: DataFrame, expect_version: int | None = None) -> None:
        tmp = self._stage_name()
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(tmp)  # expensive stage: OUTSIDE the commit lock
        self._swap_commit(tmp, expect_version)

    def _swap_commit(self, tmp: str, expect_version: int | None) -> None:
        """Publish a fully-staged table dir atomically-with-recovery:
        journal the swap plan (intent = commit point), then run the
        idempotent redo steps the recovery path would run."""
        try:
            with self._commit(expect_version):
                nxt = old = None
                if os.path.exists(self.path):
                    if self.retain_versions > 0:
                        nxt = (self.history() or [-1])[-1] + 1
                    else:
                        old = (
                            f"{self.path}.__old_{os.getpid()}_"
                            f"{uuid.uuid4().hex[:8]}"
                        )
                self._write_intent(
                    {"op": "swap", "tmp": tmp, "nxt": nxt, "old": old}
                )
                self._redo_swap(tmp, nxt, old)
        except (ConcurrentWriteError, TimeoutError):
            shutil.rmtree(tmp, ignore_errors=True)  # abandoned stage
            raise

    def _redo_swap(self, tmp: str, nxt: int | None, old: str | None) -> None:
        """Idempotent swap steps — safe to re-enter from recovery at any
        intermediate state. State decode: (tmp ∧ path) ⇒ nothing moved;
        (tmp ∧ ¬path) ⇒ old state archived, new not yet in place;
        (¬tmp) ⇒ swap done, cleanup pending."""
        if os.path.isdir(tmp):
            if os.path.exists(self.path):
                if nxt is not None:
                    vdir = self._versions_dir()
                    os.makedirs(vdir, exist_ok=True)
                    os.rename(self.path, os.path.join(vdir, str(nxt)))
                elif old:
                    os.rename(self.path, old)
            os.rename(tmp, self.path)
        # only discard the previous state once the new one is in place
        if old and os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)
        if self.retain_versions > 0:
            self.vacuum(retain_last=self.retain_versions)

    def append(self, df: DataFrame, expect_version: int | None = None) -> None:
        """Append commit: the batch stages to a sibling dir OUTSIDE the
        lock, then publishes inside it.

        UNPARTITIONED tables publish the whole staged batch as ONE
        directory rename (``{table}/batch_<tag>/``) — atomic, so a
        concurrent reader or a crash mid-commit observes either the
        entire batch or none of it, matching the class guarantee; reads
        descend into batch dirs via ``recursiveFileLookup`` (see
        `_read_dir`).

        PARTITIONED tables cannot nest batch dirs (recursive lookup is
        incompatible with partition discovery), so their batch files
        move with O(#files-per-touched-partition) renames — concurrent
        appends still serialize through the lock, but a lock-less
        READER racing the rename loop, or a crash mid-loop (which also
        skips the version bump), can observe a partial batch: the same
        reader caveat as the overwrite swap, and the part only a real
        commit LOG fixes."""
        tmp = self._stage_name()
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(tmp)
        try:
            with self._commit(expect_version):
                tag = uuid.uuid4().hex[:8]
                self._write_intent({"op": "append", "tmp": tmp, "tag": tag})
                self._redo_append(tmp, tag)
        except (ConcurrentWriteError, TimeoutError):
            shutil.rmtree(tmp, ignore_errors=True)
            raise

    def _redo_append(self, tmp: str, tag: str) -> None:
        """Idempotent append-publish steps. Unpartitioned: one atomic
        batch-dir rename (already done ⇒ tmp is gone ⇒ no-op).
        Partitioned: the per-file rename loop resumes where a crash
        stopped it — destination names are deterministic per (tag, file),
        so already-moved files are skipped, and the batch completes
        exactly once."""
        if not os.path.isdir(tmp):
            return  # publish finished before the crash; cleanup-only
        if not self.partition_by:
            os.makedirs(self.path, exist_ok=True)
            os.rename(tmp, os.path.join(self.path, f"batch_{tag}"))
            return
        for root, _dirs, files in os.walk(tmp):
            rel = os.path.relpath(root, tmp)
            dest_dir = (
                self.path if rel == "." else os.path.join(self.path, rel)
            )
            os.makedirs(dest_dir, exist_ok=True)
            for f in files:
                if f.startswith(("_", ".")):
                    continue  # markers/CRCs: not data
                dst = os.path.join(dest_dir, f"app_{tag}_{f}")
                if not os.path.exists(dst):
                    os.rename(os.path.join(root, f), dst)
        shutil.rmtree(tmp, ignore_errors=True)

    def upsert(self, updates: DataFrame, keys: Sequence[str] | None = None,
               sequence_by: str | None = None, delete_col: str | None = None,
               truncate_col: str | None = None,
               merge_schema: bool = False,
               expect_version: int | None = None) -> None:
        """Latest-wins keyed upsert (reference S8). First write degrades to
        a plain create (deduped to one row per key; flagged deletes, if
        ``delete_col`` is given, simply never materialize; truncate
        markers, if ``truncate_col`` is given, discard same-batch changes
        older than the truncate's sequence).

        ``merge_schema=True`` is Delta's ``mergeSchema`` analogue (the
        schema-drift companion to the bronze layer's ``_rescued_data``,
        reference T4): update columns the target lacks are ADDED to the
        table, null-filled for untouched rows. Without it, unknown
        update columns are dropped (Delta's default strictness). Column
        removals never propagate — existing columns are null-filled on
        the update side either way.

        PARTITION PRUNING: when the table is partitioned and every
        partition column is part of the merge key (so a row can never
        move between partitions — Delta's documented pruned-MERGE
        precondition), the merge reads ONLY the partitions the updates
        batch touches and the commit swaps only those directories; see
        `_upsert_pruned`. Otherwise (partition column not in the key,
        ``merge_schema``, or ``truncate_col`` — a truncate is a
        whole-table directive) the merge falls back to the full-table
        rewrite, trading cost for unconditional correctness."""
        keys = list(keys or self.keys)
        sequence_by = sequence_by or self.sequence_by
        if not keys:
            raise ValueError("upsert requires business keys")
        if not self.exists():
            if truncate_col:
                if not sequence_by:
                    raise ValueError("truncate_col requires sequence_by")
                markers = updates.filter(
                    F.coalesce(F.col(truncate_col), F.lit(False))
                )
                updates = _apply_truncates(
                    updates.filter(
                        ~F.coalesce(F.col(truncate_col), F.lit(False))
                    ).drop(truncate_col),
                    sequence_by, truncate_col, markers,
                )
            first = (
                latest_by_key(updates, keys, [sequence_by])
                if sequence_by
                else updates.dropDuplicates(keys)
            )
            if delete_col:
                first = first.filter(
                    ~F.coalesce(F.col(delete_col), F.lit(False))
                ).drop(delete_col)
            self.overwrite(first, expect_version=expect_version)
            return
        if (
            self.partition_by
            and not merge_schema
            and not truncate_col
            and set(self.partition_by) <= set(keys)
            and all(p in updates.columns for p in self.partition_by)
        ):
            self._upsert_pruned(
                updates,
                keys,
                sequence_by,
                delete_col=delete_col,
                expect_version=expect_version,
            )
            return
        target = self.read()
        if merge_schema:
            extra = [c for c in (delete_col, truncate_col) if c]
            utypes = dict(updates.dtypes)
            for c in updates.columns:
                if c not in target.columns and c not in extra:
                    # widen lazily; the single merge overwrite persists it
                    target = target.withColumn(c, F.lit(None).cast(utypes[c]))
        merged = merge_upsert_plan(
            target, updates, keys, sequence_by, delete_col=delete_col,
            truncate_col=truncate_col,
        )
        # conditional on the version the merge READ (optimistic MERGE):
        # a concurrent commit between read and swap raises instead of
        # clobbering, matching Delta's conflict detection
        self.overwrite(merged, expect_version=expect_version)

    def _upsert_pruned(
        self,
        updates: DataFrame,
        keys: Sequence[str],
        sequence_by: str | None,
        *,
        delete_col: str | None = None,
        expect_version: int | None = None,
    ) -> None:
        """Partition-pruned MERGE — the `plans/gold.py` fact-builder
        contract ("partition the fact target by a date column for pruned
        rewrites"), valid because `upsert` routes here only when the
        partition columns are part of the merge key, so a key's rows can
        never move between partitions and a partition the updates batch
        does not name is provably unaffected.

        Cost shape (the point at 100 TB): the touched partition VALUES
        come off the updates batch (bounded — a micro-batch touches a
        handful of dates); the target scan filters on them, so Catalyst
        prunes every other partition directory (zero read); the merge
        plan runs over that slice only (one shuffle on the grain key,
        sized by the slice, not the table); and the commit swaps ONLY
        the touched partition dirs (zero write, zero rename elsewhere).
        With version retention on, the pre-state snapshot is hardlinked
        (`_link_tree`) — metadata-only, so time travel stays O(#files)
        instead of O(table bytes).

        Reader caveat: per-directory swaps are not one atomic rename, so
        a lock-less reader racing the commit can observe some partitions
        new and others old — the same caveat as the partitioned `append`
        path, and the part only a real commit LOG fixes."""
        import functools
        import operator
        from urllib.parse import unquote, urlparse

        touched = [
            tuple(r[p] for p in self.partition_by)
            for r in updates.select(*self.partition_by).distinct().collect()
        ]
        if not touched:
            return  # empty batch: nothing to merge, no commit
        pred = functools.reduce(
            operator.or_,
            [
                functools.reduce(
                    operator.and_,
                    [
                        # eqNullSafe: a NULL partition value must select the
                        # __HIVE_DEFAULT_PARTITION__ directory, not nothing
                        F.col(p).eqNullSafe(F.lit(v))
                        for p, v in zip(self.partition_by, vals)
                    ],
                )
                for vals in touched
            ],
        )
        target_slice = self.read().filter(pred)
        # the OLD touched partition dirs, engine-encoded: parents of the
        # files the pruned scan actually reads. Asking Spark (instead of
        # hand-rolling hive path escaping) keeps value encoding — dates,
        # specials, __HIVE_DEFAULT_PARTITION__ — exactly consistent with
        # what the writer produced. The scan is partition-pruned and
        # column-empty, so it costs one pass over the touched slice only.
        old_dirs = sorted(
            {
                os.path.dirname(unquote(urlparse(r["__f"]).path))
                for r in target_slice.select(F.input_file_name().alias("__f"))
                .distinct()
                .collect()
            }
        )
        merged = merge_upsert_plan(
            target_slice, updates, keys, sequence_by, delete_col=delete_col
        )
        tmp = self._stage_name()
        merged.write.mode("overwrite").partitionBy(*self.partition_by).parquet(
            tmp
        )  # expensive stage: OUTSIDE the commit lock
        # new partition dirs present in the merge output (a touched
        # partition whose rows all got deleted simply has no dir here)
        new_rels = sorted(
            {
                os.path.relpath(root, tmp)
                for root, _dirs, files in os.walk(tmp)
                if any(not f.startswith(("_", ".")) for f in files)
            }
        )
        try:
            with self._commit(expect_version):
                if self.retain_versions > 0 and os.path.exists(self.path):
                    # snapshot BEFORE the intent (it must capture the
                    # pre-state, never a torn mid-swap state) and publish
                    # it atomically: link into a dot-staging dir, one
                    # rename to the version number. A crash mid-link
                    # leaves only dead-pid staging litter (swept), never
                    # a half snapshot masquerading as a version.
                    vdir = self._versions_dir()
                    os.makedirs(vdir, exist_ok=True)
                    nxt = (self.history() or [-1])[-1] + 1
                    staging = os.path.join(
                        vdir, f".staging_{os.getpid()}_{uuid.uuid4().hex[:8]}"
                    )
                    self._link_tree(self.path, staging)
                    os.rename(staging, os.path.join(vdir, str(nxt)))
                old_rels = [os.path.relpath(d, self.path) for d in old_dirs]
                graves = (
                    f"{self.path}.__old_{os.getpid()}_{uuid.uuid4().hex[:8]}"
                )
                self._write_intent(
                    {
                        "op": "pruned",
                        "tmp": tmp,
                        "old_rels": old_rels,
                        "new_rels": new_rels,
                        "graves": graves,
                    }
                )
                self._redo_pruned(tmp, old_rels, new_rels, graves)
        except (ConcurrentWriteError, TimeoutError):
            shutil.rmtree(tmp, ignore_errors=True)
            raise

    def _redo_pruned(
        self,
        tmp: str,
        old_rels: list[str],
        new_rels: list[str],
        graves: str,
    ) -> None:
        """Idempotent pruned-MERGE publish in four re-enterable phases.
        Old touched partition dirs are ARCHIVED by rename into a grave
        root (never rmtree'd in place: after a crash, the same path may
        already hold the republished NEW partition — an in-place delete
        on re-entry would destroy committed data, which is exactly what
        the kill-point matrix caught). Graves are pruned only once the
        stage dir is gone, which doubles as the phase marker:

        A (tmp exists): path/rel → graves/rel for each old rel whose
          grave is absent (grave present ⇒ archived; path/rel then holds
          NEW data and must not be touched).
        B (tmp exists): tmp/rel → path/rel for each staged rel still in
          tmp (gone ⇒ already published).
        C: rmtree(tmp) — marks all publishes durable.
        D: rmtree(graves), vacuum — pure cleanup, safe last.
        """
        if os.path.isdir(tmp):
            for rel in old_rels:
                cur = os.path.join(self.path, rel)
                grave = os.path.join(graves, rel)
                if os.path.isdir(cur) and not os.path.isdir(grave):
                    os.makedirs(os.path.dirname(grave), exist_ok=True)
                    os.rename(cur, grave)
            for rel in new_rels:
                src = os.path.join(tmp, rel)
                if not os.path.isdir(src):
                    continue  # this partition already published
                dest = os.path.join(self.path, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                if os.path.isdir(dest):
                    # touched partition dir that held no readable data
                    # (it is not among old_rels): clear it pre-swap
                    shutil.rmtree(dest)
                os.rename(src, dest)
            shutil.rmtree(tmp, ignore_errors=True)
        if os.path.isdir(graves):
            shutil.rmtree(graves, ignore_errors=True)
        if self.retain_versions > 0:
            self.vacuum(retain_last=self.retain_versions)


def scd2_from_history(
    df: DataFrame,
    keys: Sequence[str],
    sequence_by: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Build an SCD Type 2 version table from a change history.

    The DLT API the reference uses (`dlt.create_auto_cdc_flow`,
    `dlt_bronze_to_silver_pipeline.py:30-36`) accepts
    ``stored_as_scd_type=2``; the reference only exercises type 1, so this
    is the engine's coverage of the other half of that API surface, with
    DLT's column convention: each output row is one version of a key with
    ``__START_AT`` (the sequence value that opened it) and ``__END_AT``
    (the sequence value that superseded it; NULL for the current version).

    Semantics: per key, order changes by the sequence column; ties are
    resolved to one row by ``tiebreakers`` (latest wins); consecutive
    changes with identical attribute state collapse into one version
    (no-op updates do not open versions). Deterministic given a unique
    (keys, sequence_by, tiebreakers) ordering.

    Scale notes: ONE shuffle on the business key — the tie-dedup lag,
    the change-detection lag and the closing lead all run over the same
    (partitionBy=keys, orderBy=seq…) sort, so Catalyst plans a single
    exchange+sort for the whole build. Until r10 the tie-dedup was a
    `latest_by_key` window partitioned by (keys, seq) — a SECOND hash
    exchange on a different key that the (keys)-window then re-shuffled
    (2 Exchange / 2 Sort, confirmed in
    plans/r10/cdc_scd2_history_before.txt); sorting by
    (seq asc, tiebreakers desc) instead makes the first row of every
    seq-run exactly the row_number()=1 winner of the old window, and the
    downstream windows' (seq asc) requirement is prefix-satisfied by the
    same sort.
    """
    keys = list(keys)
    attrs = [c for c in df.columns if c not in {*keys, sequence_by, *tiebreakers}]
    # resolve sequence ties to one change (latest tiebreaker wins)
    if tiebreakers:
        ws = Window.partitionBy(*keys).orderBy(
            F.col(sequence_by).asc(),
            *[F.col(t).desc_nulls_last() for t in tiebreakers],
        )
        # first row of each seq run == latest_by_key's winner (the old
        # (keys, seq)-window ordered tiebreakers desc_nulls_last; this
        # sort puts that row first within the run); detected with one
        # lag over the SAME exchange+sort the change/close windows reuse
        df = (
            df.withColumn(
                "__dup",
                F.lag(sequence_by).over(ws).eqNullSafe(F.col(sequence_by)),
            )
            .filter(~F.col("__dup"))
            .drop("__dup")
        )
    else:
        df = df.dropDuplicates([*keys, sequence_by])
    df = df.select(*keys, sequence_by, *attrs)
    w = Window.partitionBy(*keys).orderBy(F.col(sequence_by).asc())
    state = F.struct(*[F.col(c) for c in attrs])
    changed = ~F.lag(state).over(w).eqNullSafe(state)  # null lag → first row → True
    versions = df.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")
    return versions.select(
        *keys,
        *attrs,
        F.col(sequence_by).alias("__START_AT"),
        F.lead(sequence_by).over(w).alias("__END_AT"),
    )


def scd2_apply(
    table: "ManagedParquetTable",
    updates: DataFrame,
    keys: Sequence[str],
    sequence_by: str,
    tiebreakers: Sequence[str] = (),
) -> None:
    """Incremental SCD Type 2 upsert into a managed version table.

    Existing versions are re-interpreted as change events at their
    ``__START_AT`` sequence and unioned with the new updates, then the
    history is rebuilt with :func:`scd2_from_history`. A version table
    encodes the boundaries of its own change history (END_AT is always
    the next version's START_AT), so this reproduces the one-shot build
    exactly whenever late changes land BETWEEN surviving version
    boundaries — true retro-insertion, which a close-and-append merge
    cannot do. The one irrecoverable case: a late change that lands
    INSIDE an already-collapsed same-value run (the interior change
    rows were no-ops and were not stored, so the run cannot re-open
    after the insertion). With micro-batches arriving in event-time
    order — the production file-ingest arrival pattern — that case
    cannot occur and streamed == one-shot exactly
    (tests/test_streaming.py); under arbitrary shuffling of history it
    is the documented divergence.

    Scale notes: rewrite cost is one shuffle over (current table +
    batch), the same cost class as Delta MERGE on an unpartitioned
    table; partition the table on a key-derived column to bound it.
    """
    updates = updates.select(*keys, sequence_by,
                             *[c for c in updates.columns
                               if c not in {*keys, sequence_by}])
    if table.exists():
        existing = table.read()
        attrs = [c for c in existing.columns
                 if c not in {*keys, "__START_AT", "__END_AT"}]
        replay = existing.select(
            *keys, F.col("__START_AT").alias(sequence_by), *attrs
        )
        updates = replay.unionByName(
            updates.select(*keys, sequence_by, *attrs), allowMissingColumns=False
        )
        history = scd2_from_history(updates, keys, sequence_by)
    else:
        history = scd2_from_history(updates, keys, sequence_by, tiebreakers)
    table.overwrite(history)


def table_changes(
    old: DataFrame, new: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Change Data Feed between two keyed table states (reference T10:
    `README.md:91` names Delta CDF as the alternative CDC source; this is
    its engine-side analogue over any two versions, e.g. from
    ``ManagedParquetTable.read(version=...)`` time travel).

    Emits one row per change with ``_change_type`` ∈ {insert, delete,
    update_preimage, update_postimage}; unchanged keys emit nothing.
    Null-safe struct comparison, so NULL attribute flips are detected.

    Scale notes: one full-outer shuffle join on the key (broadcast if one
    side is small under AQE); classification + the pre/post fan-out run
    inside the same stage via array+explode — no second scan.
    """
    keys = list(keys)
    attrs = [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*attrs).alias("__o"))
    n = new.select(*keys, F.struct(*attrs).alias("__n"))
    j = o.join(n, keys, "full_outer")
    oc, nc = F.col("__o"), F.col("__n")

    def tagged(state, kind: str):
        return F.struct(state.alias("state"), F.lit(kind).alias("_change_type"))

    change = F.explode(
        F.when(oc.isNull(), F.array(tagged(nc, "insert")))
        .when(nc.isNull(), F.array(tagged(oc, "delete")))
        .when(
            ~oc.eqNullSafe(nc),
            F.array(tagged(oc, "update_preimage"), tagged(nc, "update_postimage")),
        )
        .otherwise(F.array())
    ).alias("__c")
    out = j.select(*keys, change)
    return out.select(*keys, "__c.state.*", "__c._change_type")


# ---------------------------------------------------------------------------
# registry queries
# ---------------------------------------------------------------------------


@query(
    "cdc_latest_by_key",
    """
    SELECT event_id, user_id, event_type, ts, value
    FROM (
      SELECT event_id, user_id, event_type, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def cdc_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the APPLY CHANGES dedup step (W1) run as a
    batch query with event_id as the deterministic tiebreaker."""
    ev = read_table(spark, sf_dir, "events")
    return latest_by_key(
        ev.select("event_id", "user_id", "event_type", "ts", "value"),
        ["user_id"],
        ["ts"],
        ["event_id"],
    )


@query(
    "cdc_merge_upsert",
    """
    SELECT user_id, event_type, ts, value
    FROM (
      SELECT user_id, event_type, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MERGE emulation, oracle-checked: build a target from the
    first half of the event stream (by ts), upsert the second half, and
    return the final state — which must equal latest-per-key over the whole
    stream. Exercises insert + update + latest-wins paths in one query.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    cutoff = ev.agg(F.percentile_approx("ts", 0.5).alias("c")).collect()[0][0]
    base = ev.filter(F.col("ts") <= F.lit(cutoff))
    late = ev.filter(F.col("ts") > F.lit(cutoff))
    target = latest_by_key(base, ["user_id"], ["ts"], ["event_id"])
    # one upsert of all late-arriving changes; event_id not part of the
    # sequence → drop it for a pure attribute-comparison on the oracle side
    merged = merge_upsert_plan(target, latest_by_key(late, ["user_id"], ["ts"], ["event_id"]),
                               ["user_id"], "ts")
    return merged.select("user_id", "event_type", "ts", "value")


@query(
    "cdc_merge_upsert_deletes",
    """
    SELECT user_id, event_type, ts, value
    FROM (
      SELECT user_id, event_type, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) t WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_merge_upsert_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with apply-as-deletes, oracle-checked: 'error' events are
    delete markers. Target is built from the first half of the stream,
    the second half is merged on top — the final state must equal
    latest-per-key over the WHOLE stream minus keys whose latest change
    is a delete, which is exactly what the oracle computes."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    is_del = (F.col("event_type") == "error").alias("__is_delete")
    cutoff = ev.agg(F.percentile_approx("ts", 0.5).alias("c")).collect()[0][0]
    base = ev.filter(F.col("ts") <= F.lit(cutoff)).withColumn("__is_delete", is_del)
    late = ev.filter(F.col("ts") > F.lit(cutoff)).withColumn("__is_delete", is_del)
    target_tbl = latest_by_key(base, ["user_id"], ["ts"], ["event_id"])
    target = target_tbl.filter(~F.col("__is_delete")).drop("__is_delete")
    merged = merge_upsert_plan(
        target,
        latest_by_key(late, ["user_id"], ["ts"], ["event_id"]),
        ["user_id"],
        "ts",
        delete_col="__is_delete",
    )
    return merged.select("user_id", "event_type", "ts", "value")


@query(
    "cdc_scd2_history",
    """
    WITH dedup AS (
      SELECT user_id, ts, event_type FROM (
        SELECT user_id, ts, event_type,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, ts ORDER BY event_id DESC
               ) AS rn
        FROM events
      ) t WHERE rn = 1
    ), flagged AS (
      SELECT user_id, ts, event_type,
             LAG(event_type) OVER w IS DISTINCT FROM event_type AS chg
      FROM dedup
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, event_type,
           ts AS start_at,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS end_at
    FROM flagged WHERE chg
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 version table built from the event change history: one
    row per (user, contiguous event_type run) with validity interval.
    The DLT surface's ``stored_as_scd_type=2`` path (reference API
    `dlt_bronze_to_silver_pipeline.py:35` passes 1; 2 is the other
    documented value)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    hist = scd2_from_history(ev, ["user_id"], "ts", tiebreakers=["event_id"])
    return hist.select(
        "user_id",
        "event_type",
        F.col("__START_AT").alias("start_at"),
        F.col("__END_AT").alias("end_at"),
    )


@query(
    "cdc_changes_feed",
    """
    WITH ranked AS (
      SELECT event_id, user_id, event_type, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ), new_state AS (
      SELECT user_id, event_type, ts, value FROM ranked
      WHERE rn = 1 AND event_type <> 'error'
    ), half AS (
      SELECT event_id, user_id, event_type, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
      WHERE event_id <= (SELECT MAX(event_id) // 2 FROM events)
    ), old_state AS (
      SELECT user_id, event_type, ts, value FROM half WHERE rn = 1
    ), j AS (
      SELECT COALESCE(o.user_id, n.user_id) AS user_id,
             o.user_id IS NOT NULL AS has_o, n.user_id IS NOT NULL AS has_n,
             o.event_type AS oet, o.ts AS ots, o.value AS ov,
             n.event_type AS net, n.ts AS nts, n.value AS nv
      FROM old_state o FULL OUTER JOIN new_state n ON o.user_id = n.user_id
    )
    SELECT user_id, net AS event_type, nts AS ts, nv AS value,
           'insert' AS _change_type
    FROM j WHERE NOT has_o
    UNION ALL
    SELECT user_id, oet, ots, ov, 'delete' FROM j WHERE NOT has_n
    UNION ALL
    SELECT user_id, oet, ots, ov, 'update_preimage' FROM j
    WHERE has_o AND has_n AND (oet, ots, ov) IS DISTINCT FROM (net, nts, nv)
    UNION ALL
    SELECT user_id, net, nts, nv, 'update_postimage' FROM j
    WHERE has_o AND has_n AND (oet, ots, ov) IS DISTINCT FROM (net, nts, nv)
    """,
)
def cdc_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed between two table versions (reference T10). The
    old version is latest-per-user over the first half of the stream; the
    new version is latest-per-user over the whole stream minus users whose
    final event is an 'error' (so all four change types occur: second-half
    users insert, changed users update pre+post, error-final users
    delete)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    cutoff = ev.agg((F.max("event_id") / F.lit(2)).cast("long").alias("c")).collect()[0][0]
    old = latest_by_key(
        ev.filter(F.col("event_id") <= F.lit(cutoff)), ["user_id"], ["ts"], ["event_id"]
    ).select("user_id", "event_type", "ts", "value")
    new = (
        latest_by_key(ev, ["user_id"], ["ts"], ["event_id"])
        .filter(F.col("event_type") != "error")
        .select("user_id", "event_type", "ts", "value")
    )
    return table_changes(old, new, ["user_id"])


def delete_where(table: "ManagedParquetTable", condition) -> int:
    """DELETE FROM emulation: atomically rewrite the table without rows
    matching ``condition`` (SQL string or Column); returns rows deleted.
    The right-to-be-forgotten/GDPR primitive — combine with
    ``retain_versions=0`` and ``vacuum()`` so purged rows leave no
    recoverable snapshot. On a partitioned table Catalyst prunes the
    scan, but the rewrite here is whole-table; a production variant
    rewrites only affected partitions (same swap mechanics per
    partition directory)."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    df = table.read()
    kept = df.filter(~F.coalesce(cond, F.lit(False)))
    n_deleted = df.count() - kept.count()
    if n_deleted:
        table.overwrite(kept)
    return n_deleted


def publish_atomically(
    writes: Sequence[tuple["ManagedParquetTable", DataFrame]],
) -> None:
    """Two-phase multi-table publish: PREPARE writes every DataFrame to
    its table's temp directory first (the expensive, failure-prone
    phase — any error here aborts with all tables untouched), then
    COMMIT swaps all temp dirs in via directory renames. Readers can
    observe a brief window where early tables show the new version and
    later ones the old (rename-speed, not write-speed) — the practical
    cross-table guarantee a lakehouse without a shared transaction log
    can offer, and why Delta/Iceberg keep multi-table transactions out
    of scope too."""
    import uuid as _uuid

    staged: list[tuple[ManagedParquetTable, str]] = []
    try:
        for table, df in writes:
            tmp = f"{table.path}.__tmp_{_uuid.uuid4().hex[:8]}"
            # register BEFORE writing so a mid-write failure's partial
            # directory is cleaned up with the rest
            staged.append((table, tmp))
            writer = df.write.mode("overwrite")
            if table.partition_by:
                writer = writer.partitionBy(*table.partition_by)
            writer.parquet(tmp)
    except Exception:
        for _, tmp in staged:
            shutil.rmtree(tmp, ignore_errors=True)
        raise
    # commit phase: pure renames
    for table, tmp in staged:
        old = None
        if os.path.exists(table.path):
            old = f"{table.path}.__old_{_uuid.uuid4().hex[:8]}"
            os.rename(table.path, old)
        os.rename(tmp, table.path)
        if old:
            shutil.rmtree(old, ignore_errors=True)


def snapshot_as_of(history: DataFrame, sequence_value) -> DataFrame:
    """Point-in-time state from an SCD2 version table: the rows whose
    validity interval covers ``sequence_value`` (``__START_AT <= v <
    __END_AT``, open-ended current versions included) with the validity
    columns dropped — Delta/Iceberg ``AS OF`` semantics over the
    engine's version tables. Pure filter → partition-prunable when the
    history is partitioned on a __START_AT-derived column."""
    v = F.lit(sequence_value)
    return history.filter(
        (F.col("__START_AT") <= v)
        & (F.col("__END_AT").isNull() | (F.col("__END_AT") > v))
    ).drop("__START_AT", "__END_AT")


@query(
    "cdc_scd2_snapshot_asof",
    """
    WITH cutoff AS (
      SELECT MAX(ts) AS c FROM events WHERE event_id <= 5000
    )
    SELECT user_id, event_type
    FROM (
      SELECT user_id, event_type, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events, cutoff WHERE ts <= cutoff.c
    ) t WHERE rn = 1
    """,
)
def cdc_scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF temporal query: build the SCD2 history of user event_type
    changes, then reconstruct the state as of a historical sequence value
    — which must equal latest-per-key over the raw events up to that
    point (the oracle computes it that way, independently of the version
    table). Proves interval chaining end-to-end: any gap or overlap in
    __START_AT/__END_AT would surface as a missing or duplicated user."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    cutoff = (
        ev.filter(F.col("event_id") <= 5000).agg(F.max("ts").alias("c")).collect()[0]["c"]
    )
    hist = scd2_from_history(ev, ["user_id"], "ts", tiebreakers=["event_id"])
    return snapshot_as_of(hist, cutoff).select("user_id", "event_type")


def scd2_from_snapshots(
    snapshots: Sequence[tuple[int, DataFrame]], keys: Sequence[str]
) -> DataFrame:
    """SCD Type 2 history from successive FULL table snapshots — the
    engine analogue of DLT ``create_auto_cdc_from_snapshot_flow``
    (``apply_changes_from_snapshot``): no change feed exists, so changes
    are INFERRED by diffing consecutive snapshots (``table_changes``),
    then folded into validity intervals in ONE window pass per key:
    every surviving (insert/update) change opens a version at its
    snapshot id; ``lead()`` over the per-key change sequence closes it at
    the NEXT change — so a disappeared key's delete closes its last
    version without emitting a row, and a later re-insert opens a fresh
    interval. ``__END_AT`` NULL marks the open version.

    Scale notes: cost is one keyed full-outer join per snapshot pair
    (exactly what any snapshot-diff must pay) + one window shuffle over
    the CHANGE rows only — never over unchanged snapshot mass."""
    keys = list(keys)
    all_events: DataFrame | None = None
    prev: DataFrame | None = None
    for ver, snap in sorted(snapshots, key=lambda p: p[0]):
        base = prev if prev is not None else snap.limit(0)
        ch = table_changes(base, snap, keys).filter(
            F.col("_change_type") != "update_preimage"
        )
        ev = ch.withColumn("__v", F.lit(int(ver)))
        all_events = ev if all_events is None else all_events.unionByName(ev)
        prev = snap
    assert all_events is not None, "need at least one snapshot"
    w = Window.partitionBy(*keys).orderBy("__v")
    attrs = [c for c in all_events.columns if c not in (*keys, "_change_type", "__v")]
    return (
        all_events.withColumn("__END_AT", F.lead("__v").over(w))
        .filter(F.col("_change_type") != "delete")
        .select(
            *keys,
            *attrs,
            F.col("__v").alias("__START_AT"),
            "__END_AT",
        )
    )


@query(
    "cdc_scd2_from_snapshots",
    """
    WITH base AS (
      SELECT c_custkey AS k, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ), s1 AS (
      SELECT k, cents FROM base WHERE k < 300
    ), s2 AS (
      SELECT k, CASE WHEN k % 7 = 0 THEN cents + 1000 ELSE cents END AS cents
      FROM base WHERE k < 350
    ), ev AS (
      SELECT k, cents, 1 AS v, FALSE AS is_del FROM s1
      UNION ALL
      SELECT s2.k, s2.cents, 2, FALSE
      FROM s2 LEFT JOIN s1 USING (k)
      WHERE s1.k IS NULL OR s1.cents <> s2.cents
      UNION ALL
      SELECT k, cents, 3, TRUE FROM s2 WHERE k % 5 = 0
    ), iv AS (
      SELECT k, cents, is_del, v,
             LEAD(v) OVER (PARTITION BY k ORDER BY v) AS end_at
      FROM ev
    )
    SELECT k, cents, v AS start_at, end_at
    FROM iv WHERE NOT is_del
    """,
)
def cdc_scd2_from_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLT ``create_auto_cdc_from_snapshot_flow`` analogue: three FULL
    snapshots of a customer slice (initial load → wider slice with some
    balances changed → some keys gone) folded into SCD2 validity
    intervals by snapshot-diff CDC. Deletes close the last version
    without emitting a row; money is integer cents so the diff is exact
    in both engines."""
    cu = read_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    base = cu.select(k.alias("k"), cents.alias("cents"))
    s1 = base.filter(F.col("k") < 300)
    s2 = base.filter(F.col("k") < 350).select(
        "k",
        F.when(F.col("k") % 7 == 0, F.col("cents") + 1000)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    s3 = s2.filter(F.col("k") % 5 != 0)
    hist = scd2_from_snapshots([(1, s1), (2, s2), (3, s3)], ["k"])
    return hist.select(
        "k", "cents",
        F.col("__START_AT").alias("start_at"),
        F.col("__END_AT").alias("end_at"),
    )


@query(
    "cdc_table_optimize",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
           TRUE AS files_reduced,
           TRUE AS content_preserved
    FROM orders
    """,
)
def cdc_table_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ``OPTIMIZE`` end-to-end through the managed table: create
    from one quarter of ``orders``, append the other three quarters as
    separate commits (accumulating small files / batch dirs — the
    append-heavy degradation OPTIMIZE exists for), then compact with
    :meth:`ManagedParquetTable.optimize` under an OCC-conditional
    commit.

    Contract oracle (the sketch-query pattern): the exact row count and
    orderkey checksum AFTER compaction must equal the source table's —
    DuckDB computes both from the parquet directly — and two invariant
    flags must hold: ``files_reduced`` (data file count strictly
    dropped) and ``content_preserved`` (pre- vs post-compaction count
    and checksum identical). File counts themselves are
    environment-dependent, so they assert as a flag, not a value.

    Scale notes: compaction is a ``coalesce`` rewrite — no shuffle, each
    output bin streams its input files; at 100 TB run it per partition
    (the table's ``partition_by`` dirs) so only append-churned
    partitions rewrite."""
    import os as _os

    from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
        ephemeral_dir,
    )

    od = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = ManagedParquetTable(spark, _os.path.join(ephemeral_dir("optimize_tbl_"), "t"))
    for i in range(4):
        part = od.filter(F.col("o_orderkey") % 4 == i)
        if i == 0:
            t.overwrite(part)
        else:
            t.append(part)

    def n_data_files() -> int:
        total = 0
        for root, _dirs, files in _os.walk(t.path):
            total += sum(1 for f in files if not f.startswith(("_", ".")))
        return total

    def checksum():
        row = t.read().agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("s"),
        ).collect()[0]
        return row["n"], row["s"]

    files_before = n_data_files()
    pre = checksum()
    t.optimize(target_rows_per_file=1_000_000, expect_version=t.version())
    files_after = n_data_files()
    post = checksum()
    return spark.createDataFrame(
        [(post[0], post[1], files_after < files_before, pre == post)],
        "n_rows long, key_checksum long, files_reduced boolean, content_preserved boolean",
    )


@query(
    "cdc_table_ttl_purge",
    """
    SELECT CAST(COUNT(*) FILTER (WHERE o_orderdate >= DATE '1996-01-01')
                AS BIGINT) AS n_retained,
           CAST(COUNT(*) FILTER (WHERE o_orderdate < DATE '1996-01-01')
                AS BIGINT) AS n_purged,
           CAST(SUM(o_orderkey) FILTER (WHERE o_orderdate >= DATE '1996-01-01')
                AS BIGINT) AS retained_checksum,
           TRUE AS purged_unrecoverable
    FROM orders
    """,
)
def cdc_table_ttl_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy purge end-to-end (`DELETE FROM ... WHERE age >
    ttl` — the GDPR/TTL primitive): a managed table is built from
    ``orders``, rows older than the 1996-01-01 cutoff are deleted via
    :func:`delete_where`, and the snapshot history is vacuumed so the
    purged rows leave NO recoverable version (the compliance
    requirement that distinguishes purge from ordinary delete).

    Contract oracle: the retained count/checksum must equal what DuckDB
    computes from the cutoff directly; ``n_purged`` is the operator's
    own deletion report; ``purged_unrecoverable`` asserts the table has
    zero retained snapshots AND the live directory equals the retained
    set exactly. Scale: delete_where is one filtered rewrite commit —
    on a date-partitioned table the scan prunes to affected partitions."""
    import os as _os

    from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
        ephemeral_dir,
    )

    od = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    t = ManagedParquetTable(
        spark, _os.path.join(ephemeral_dir("ttl_tbl_"), "t"), retain_versions=2
    )
    t.overwrite(od)
    n_purged = delete_where(t, "o_orderdate < DATE '1996-01-01'")
    t.vacuum(retain_last=0)
    row = t.read().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
        F.max(F.col("o_orderdate") < F.lit("1996-01-01").cast("date")).alias(
            "any_old"
        ),
    ).collect()[0]
    unrecoverable = (t.history() == []) and (not row["any_old"])
    return spark.createDataFrame(
        [(row["n"], n_purged, row["s"], unrecoverable)],
        "n_retained long, n_purged long, retained_checksum long, "
        "purged_unrecoverable boolean",
    )


@query(
    "cdc_merge_upsert_pruned",
    """
    WITH base AS (
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS o_month,
             o_orderpriority
      FROM orders
    ), tm AS (
      SELECT MAX(o_month) AS m FROM base
    )
    SELECT o_orderkey, o_month,
           CASE WHEN o_month = (SELECT m FROM tm)
                THEN 'U-' || o_orderpriority
                ELSE o_orderpriority END AS o_orderpriority
    FROM base
    WHERE o_orderkey % 5 <> 0 OR o_month = (SELECT m FROM tm)
    ORDER BY o_orderkey, o_month
    """,
)
def cdc_merge_upsert_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned fact MERGE end-to-end — the `plans/gold.py`
    "partition the fact target by a date column for pruned rewrites"
    claim exercised through a real date-partitioned
    :class:`ManagedParquetTable` (reference S8/`FACT_Gold_Layer.py:182-192`,
    the MERGE-at-scale shape: grain includes the date, so the partition
    column is part of the merge key and a one-month update batch rewrites
    exactly one partition directory — `tests/test_cdc.py` pins the
    file-level pruning, this query pins the merged VALUES).

    Setup: a table over (o_orderkey, o_month, o_orderpriority)
    partitioned by order month, seeded with keys where ``o_orderkey % 5
    != 0``. The updates batch is the LAST month's full slice with
    priorities rewritten to ``U-<priority>`` — so the merge must update
    that month's existing keys, insert its held-out ``% 5 == 0`` keys,
    and leave every other month byte-untouched. The oracle recomputes
    the expected final state from ``orders`` directly."""
    import os as _os

    from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
        ephemeral_dir,
    )

    od = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
        "o_orderpriority",
    )
    target_month = od.agg(F.max("o_month")).collect()[0][0]
    t = ManagedParquetTable(
        spark,
        _os.path.join(ephemeral_dir("pruned_merge_tbl_"), "t"),
        keys=["o_month", "o_orderkey"],
        partition_by=["o_month"],
    )
    t.overwrite(od.filter(F.col("o_orderkey") % 5 != 0))
    updates = od.filter(F.col("o_month") == target_month).withColumn(
        "o_orderpriority", F.concat(F.lit("U-"), F.col("o_orderpriority"))
    )
    t.upsert(updates)
    return (
        t.read()
        .select("o_orderkey", "o_month", "o_orderpriority")
        .orderBy("o_orderkey", "o_month")
    )


# ---------------------------------------------------------------------------
# round-6 addition (session 2): deletion-vector emulation (DELETE w/o rewrite)
# ---------------------------------------------------------------------------


@query(
    "cdc_deletion_vectors",
    """
    WITH visible AS (
      SELECT * FROM customer
      WHERE NOT (c_acctbal < 0) AND NOT (c_mktsegment = 'BUILDING')
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_visible,
           CAST(SUM(c_custkey) AS BIGINT) AS key_checksum,
           CAST((SELECT COUNT(*) FROM customer) - COUNT(*) AS BIGINT)
             AS n_dv_entries,
           TRUE AS files_untouched
    FROM visible
    """,
)
def cdc_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector DELETE — Delta Lake's modern delete path
    (`delta.enableDeletionVectors`): instead of rewriting every file
    that contains a matching row (the copy-on-write `delete_where`
    above), record the (file, row-position) of deleted rows in a
    sidecar and have the READ path subtract them — merge-on-read. Two
    successive DELETEs (negative balances, then the BUILDING segment)
    accumulate into one DV sidecar; the data files are never touched.

    Spark mechanics: row positions come from the hidden
    ``_metadata.file_path`` / ``_metadata.row_index`` columns of the
    parquet scan (public Spark 3.5+ API — the same row-tracking
    primitive Delta's DV implementation reads); the serve path is a
    LEFT ANTI join of the scan against the broadcast DV sidecar on
    (file, position). At 100 TB the DV is MBs against TBs of data —
    broadcast, never shuffled — and a periodic OPTIMIZE (the
    `cdc_table_optimize` path) folds mature DVs back into rewritten
    files.

    Contract oracle: visible row count + key checksum must equal
    DuckDB's direct predicate evaluation; ``n_dv_entries`` must equal
    exactly the deleted-row count; ``files_untouched`` asserts the data
    files' (name, size) inventory is byte-identical across both
    DELETEs.
    """
    import os as _os

    from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
        ephemeral_dir,
    )

    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    path = _os.path.join(ephemeral_dir("dv_tbl_"), "t")
    cu.repartition(4).write.mode("overwrite").parquet(path)

    def inventory() -> list[tuple[str, int]]:
        out = []
        for root, _dirs, files in _os.walk(path):
            for f in files:
                if not f.startswith(("_", ".")):
                    fp = _os.path.join(root, f)
                    out.append((fp, _os.path.getsize(fp)))
        return sorted(out)

    inv0 = inventory()
    scan = spark.read.parquet(path).select(
        "*",
        F.col("_metadata.file_path").alias("__file"),
        F.col("_metadata.row_index").alias("__pos"),
    )

    dv: DataFrame | None = None  # the sidecar: (file, position) pairs

    def visible() -> DataFrame:
        if dv is None:
            return scan
        return scan.join(
            F.broadcast(dv),
            (scan["__file"] == dv["file"]) & (scan["__pos"] == dv["pos"]),
            "left_anti",
        )

    def delete_where(cond) -> DataFrame:
        hit = visible().filter(cond).select(
            F.col("__file").alias("file"), F.col("__pos").alias("pos")
        )
        return hit if dv is None else dv.unionByName(hit)

    # DELETE #1: negative balances; DELETE #2: BUILDING segment (of the
    # rows still visible — a DV DELETE must not double-count).
    dv = delete_where(F.col("c_acctbal") < 0).localCheckpoint(eager=True)
    dv = delete_where(F.col("c_mktsegment") == "BUILDING").localCheckpoint(eager=True)

    files_untouched = inventory() == inv0
    n_dv = dv.count()
    return visible().agg(
        F.count(F.lit(1)).alias("n_visible"),
        F.sum("c_custkey").alias("key_checksum"),
        F.lit(n_dv).cast("long").alias("n_dv_entries"),
        F.lit(bool(files_untouched)).alias("files_untouched"),
    )


@query(
    "cdc_merge_schema_evolution",
    """
    WITH base AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer
    ),
    evolved AS (
      SELECT c_custkey, c_name,
             ROUND(c_acctbal + 50.0, 2) AS c_acctbal,
             c_mktsegment AS segment
      FROM customer WHERE c_custkey % 4 = 0
    ),
    merged AS (
      SELECT b.c_custkey,
             COALESCE(e.c_name, b.c_name) AS c_name,
             COALESCE(e.c_acctbal, b.c_acctbal) AS c_acctbal,
             e.segment
      FROM base b LEFT JOIN evolved e ON e.c_custkey = b.c_custkey
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(segment) AS n_with_new_col,
           ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2)::DOUBLE
             AS sum_acctbal
    FROM merged
    """,
)
def cdc_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with automatic schema evolution — Delta's
    ``spark.databricks.delta.schema.autoMerge`` behavior on the managed
    table: the update batch carries a column the target lacks
    (``segment``) plus re-priced balances for every 4th customer; after
    ``upsert(merge_schema=True)`` the table has the widened schema with
    NULLs on untouched rows and latest-wins values on touched ones.
    The oracle recomputes the expected final state as a LEFT JOIN
    against the evolved batch.

    Scale notes: schema widening forces the full-table rewrite path
    (a row's width changes, so partition pruning's never-moves
    precondition is moot — same trade real Delta makes: autoMerge
    commits rewrite the touched files with the union schema). Contract
    aggregate: row count, new-column coverage, exact-decimal balance
    checksum.
    """
    import os as _os

    from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
        ephemeral_dir,
    )

    cu = read_table(spark, sf_dir, "customer")
    base = cu.select("c_custkey", "c_name", "c_acctbal")
    evolved = cu.filter(F.col("c_custkey") % 4 == 0).select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") + 50.0, 2).alias("c_acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    t = ManagedParquetTable(
        spark, _os.path.join(ephemeral_dir("schema_evo_"), "t"), keys=["c_custkey"]
    )
    t.overwrite(base)
    t.upsert(evolved, merge_schema=True)
    out = t.read()
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("segment").alias("n_with_new_col"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_acctbal"),
    )


# ---------------------------------------------------------------------------
# round-7 addition: Write-Audit-Publish (WAP)
# ---------------------------------------------------------------------------


@query(
    "cdc_write_audit_publish",
    """
    WITH batch AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 70 = 0 THEN -o_totalprice
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 140 = 0 THEN NULL
                  ELSE o_custkey END AS o_custkey
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    audit AS (
      SELECT *,
             (o_custkey IS NOT NULL) AND (o_totalprice > 0) AS ok
      FROM batch
    )
    SELECT CAST((SELECT COUNT(*) FROM audit) AS BIGINT) AS n_staged,
           CAST(COUNT(*) FILTER (WHERE ok) AS BIGINT) AS n_published,
           CAST(COUNT(*) FILTER (WHERE NOT ok) AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN ok
                    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS published_cents,
           CAST(SUM(CASE WHEN ok THEN o_orderkey END) AS BIGINT)
             AS published_key_checksum
    FROM audit
    """,
)
def cdc_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish (the Iceberg/Netflix WAP pattern) end to end
    through the managed-table commit protocol: STAGE an incoming batch
    (a deterministic 1-in-7 orders sample with 1-in-70 corrupted prices
    and 1-in-140 nulled keys injected) into a staging table, AUDIT it
    with DLT-style expectations (non-null key, positive total), PUBLISH
    only passing rows to the target as one atomic commit and quarantine
    the rest — then report the staged/published/quarantined counts plus
    the published value checksum, all read back FROM THE TABLES (the
    oracle recomputes them from the source, so the whole
    stage→audit→publish→read path is value-verified).

    Scale notes: the audit is one predicate pass over the staged batch
    (no corpus rescan); publish is the table's staged-rename commit —
    the same journaled protocol the crash matrix pins
    (tests/test_crash_recovery.py), which is exactly what makes
    audit-then-publish safe: a crash between audit and publish leaves
    the target untouched.
    """
    import os as _os

    from databricks_end_to_end_lakeflow_project_spark.pipeline.expectations import (
        split_expectations,
    )
    from databricks_end_to_end_lakeflow_project_spark.sources.scratch import (
        ephemeral_dir,
    )

    od = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    batch = od.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 70 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 140 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
    )
    root = ephemeral_dir("wap_")
    staging = ManagedParquetTable(spark, _os.path.join(root, "staging"))
    target = ManagedParquetTable(spark, _os.path.join(root, "target"))
    quarantine = ManagedParquetTable(spark, _os.path.join(root, "quarantine"))
    # WRITE: the batch lands in staging (atomic, but invisible to consumers)
    staging.overwrite(batch)
    # AUDIT: expectations over the staged rows only
    passed, violated = split_expectations(
        staging.read(),
        {
            "valid_custkey": "o_custkey IS NOT NULL",
            "positive_total": "o_totalprice > 0",
        },
        dataset="wap_batch",
    )
    # PUBLISH: one atomic commit per side
    target.overwrite(passed)
    quarantine.overwrite(violated.drop("__failed_rules", "__dataset"))
    pub = target.read().agg(
        F.count(F.lit(1)).alias("n_published"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "published_cents"
        ),
        F.sum("o_orderkey").alias("published_key_checksum"),
    )
    sizes = (
        staging.read()
        .agg(F.count(F.lit(1)).alias("n_staged"))
        .crossJoin(F.broadcast(quarantine.read().agg(F.count(F.lit(1)).alias("n_quarantined"))))
    )
    return sizes.crossJoin(F.broadcast(pub)).select(
        "n_staged",
        "n_published",
        "n_quarantined",
        "published_cents",
        F.col("published_key_checksum").cast("long").alias("published_key_checksum"),
    )


_SNAPSHOT_CHUNK_ROWS = 5_000


@query(
    "cdc_snapshot_chunk_plan",
    f"""
    WITH ranked AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
      FROM orders
    )
    SELECT (rn - 1) // {_SNAPSHOT_CHUNK_ROWS} AS chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_orderkey) AS low_key,
           MAX(o_orderkey) AS high_key,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_checksum
    FROM ranked GROUP BY chunk_id ORDER BY chunk_id
    """,
)
def cdc_snapshot_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-snapshot chunk plan (the DBZ/Netflix watermark
    algorithm's first half): split the initial snapshot of ``orders``
    into ~{_SNAPSHOT_CHUNK_ROWS}-row key-ordered chunks and emit each
    chunk's key range + row count + integer-cents checksum — the unit
    of work a chunked initial load interleaves with the CDC stream, and
    the manifest that lets a resumed snapshot skip verified chunks
    ([[cdc_changes_feed]] handles the stream side; this plans the
    snapshot side).

    Scale shape: the global key rank comes from the scalerank kernel
    (range-bin + partitioned window — never a single-partition sort);
    chunk aggregates are map-side-combinable on the chunk id. All
    outputs exact integers.
    """
    from databricks_end_to_end_lakeflow_project_spark.operators.scalerank import (
        RankSpec,
        with_global_ranks,
    )

    od = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked, _n = with_global_ranks(
        od, [RankSpec(out="rn", value="o_orderkey", tiebreaks=[], descending=False)]
    )
    return (
        ranked.groupBy(
            ((F.col("rn") - 1) / _SNAPSHOT_CHUNK_ROWS).cast("long").alias("chunk_id")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_orderkey").alias("low_key"),
            F.max("o_orderkey").alias("high_key"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents_checksum"),
        )
        .orderBy("chunk_id")
    )
