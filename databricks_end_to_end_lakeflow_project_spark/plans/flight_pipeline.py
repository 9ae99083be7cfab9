"""The flight-booking medallion lakehouse, end to end — this engine's
idiomatic build of everything the reference project does.

Maps 1:1 onto the reference's architecture (SURVEY.md §1, §3):

| layer  | reference                                   | here                          |
|--------|---------------------------------------------|-------------------------------|
| raw    | CSVs per entity dir (Setup.py:25-28)        | ``raw_root/{entity}/*.csv``   |
| bronze | Auto Loader → Delta (bronze_ingest_autoloader.py) | checkpointed stream → parquet |
| silver | DLT views + SCD1 CDC tables (dlt_bronze_to_silver_pipeline.py) | Pipeline views + auto CDC flows |
| gold   | DIM_Gold_layer.py / FACT_Gold_Layer.py      | build_dim / build_fact        |

The silver DAG replicates the reference's 9 datasets: 4 expectation-gated
staging views, 4 SCD1 tables (keyed by booking_id / flight_id /
passenger_id / airport_id, sequenced by ``modifiedDate``), and the
``business_silver`` 4-way join view (`dlt_bronze_to_silver_pipeline.py`
entire file; DAG pictured in the reference's images/dlt_pipeline.png).

``clock`` is injectable wherever the reference calls
``current_timestamp()`` (SURVEY §2.7 F1 flags the nondeterminism), so
golden tests replay runs deterministically.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_end_to_end_lakeflow_project_spark.operators.cdc import ManagedParquetTable
from databricks_end_to_end_lakeflow_project_spark.pipeline.dag import Pipeline
from databricks_end_to_end_lakeflow_project_spark.plans.gold import (
    DimConfig,
    FactConfig,
    FactDimSpec,
    build_dim,
    build_fact,
)
from databricks_end_to_end_lakeflow_project_spark.streaming.ingest import (
    INGEST_FILE_COL,
    INGEST_TIME_COL,
    RESCUE_COL,
    drain_ingest_stream,
    start_ingest_csv_stream,
)

ENTITIES = ["bookings", "flights", "customers", "airports"]

BOOKING_RULES = {
    "valid_booking_id": "booking_id IS NOT NULL",
    "valid_passenger_id": "passenger_id IS NOT NULL",
    "valid_flight_id": "flight_id IS NOT NULL",
    "valid_airport_id": "airport_id IS NOT NULL",
}


class FlightLakehouse:
    """Bronze→silver→gold runtime for the flight star schema."""

    def __init__(self, spark: SparkSession, raw_root: str, storage_root: str) -> None:
        self.spark = spark
        self.raw_root = raw_root
        self.storage_root = storage_root
        self.bronze_root = os.path.join(storage_root, "bronze")
        self.silver = self._build_silver_pipeline()
        self.gold_root = os.path.join(storage_root, "gold")

    # -- bronze -------------------------------------------------------------

    def ingest_bronze(self, clock: dt.datetime | None = None) -> dict[str, int]:
        """Drain new raw CSV files into bronze, one checkpointed stream per
        entity (the reference's per-entity job fan-out, SourceParameters.py).
        Rows are stamped with the drain's ingest time (or ``clock``), which
        silver uses as the CDC sequence.
        """
        # start every entity's availableNow query FIRST, then await them
        # together: the four drains execute concurrently in the shared
        # session, so the per-query startup/commit latency (the dominant
        # cost at micro-batch sizes) overlaps — replay wall for this
        # phase is max(entity), not Σ(entity). Output is byte-identical
        # to the sequential form: each entity has its own checkpoint,
        # target dir and schema, nothing is shared across queries.
        from concurrent.futures import ThreadPoolExecutor

        live = [
            e for e in ENTITIES if os.path.isdir(os.path.join(self.raw_root, e))
        ]
        if not live:
            return {}
        with ThreadPoolExecutor(max_workers=len(live)) as ex:
            started = {
                entity: ex.submit(
                    start_ingest_csv_stream,
                    self.spark,
                    os.path.join(self.raw_root, entity),
                    os.path.join(self.bronze_root, entity),
                    os.path.join(self.storage_root, "_checkpoints", entity),
                    os.path.join(self.storage_root, "_schemas", entity),
                    clock,
                )
                for entity in live
            }
            return {e: drain_ingest_stream(f.result()) for e, f in started.items()}

    def _bronze(self, entity: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.bronze_root, entity))

    def ingest_and_silver(self, clock: dt.datetime | None = None, then=None):
        """Overlapped bronze→silver pass: one chain per entity that
        drains the entity's bronze ingest stream and then immediately
        resolves + upserts THAT entity's silver CDC flow (its only
        upstream), all four chains concurrent. Versus the phase-barrier
        form (``ingest_bronze()`` then ``run_silver()``) the wall clock
        is max(chainₑ), not max(ingestₑ) + max(silverₑ) — the per-query
        startup/commit fixed costs of one entity's drain overlap another
        entity's upsert. Output is byte-identical: each chain touches
        only its own checkpoint, bronze dir and silver target, and view
        resolution serializes on the pipeline's resolve lock.

        Returns a ``finalize()`` callable (quarantine + event-log
        appends — nothing the silver TABLES depend on) that the caller
        may run concurrently with downstream work that reads only those
        tables; it must be awaited before the next pipeline run.

        ``then``, if given, extends each chain past the silver upsert —
        e.g. ``run_all`` hangs the entity's GOLD DIMENSION build on it,
        since a dim depends only on its own silver table (DLT-DAG
        semantics: a node runs as soon as its parents are done, not when
        the whole previous layer is)."""
        from concurrent.futures import ThreadPoolExecutor

        p = self.silver
        p.begin_run()
        flows_by_source = {f.source: f for f in p.cdc_flows}
        # The chained path hand-schedules one CDC flow per entity; if the
        # silver DAG ever grows a flow this loop would silently skip (or an
        # entity's flow goes missing → bare KeyError mid-chain), fail loudly
        # here instead so run_all/run_silver parity can't drift.
        expected = {f"{e}_raw" for e in ENTITIES}
        if len(p.cdc_flows) != len(expected) or set(flows_by_source) != expected:
            raise RuntimeError(
                "ingest_and_silver chains cover flows sourced from "
                f"{sorted(expected)} but the silver pipeline registers "
                f"{sorted(flows_by_source)}; update the chain builder to "
                "match (or run via run_silver, which executes all flows)"
            )

        def chain(entity: str) -> None:
            if os.path.isdir(os.path.join(self.raw_root, entity)):
                drain_ingest_stream(
                    start_ingest_csv_stream(
                        self.spark,
                        os.path.join(self.raw_root, entity),
                        os.path.join(self.bronze_root, entity),
                        os.path.join(self.storage_root, "_checkpoints", entity),
                        os.path.join(self.storage_root, "_schemas", entity),
                        clock,
                    )
                )
            flow = flows_by_source[f"{entity}_raw"]
            p.execute_flow(*p.resolve_flow(flow))
            if then is not None:
                then(entity)

        with ThreadPoolExecutor(max_workers=len(ENTITIES)) as ex:
            for f in [ex.submit(chain, e) for e in ENTITIES]:
                f.result()  # re-raise the first failure, if any
        return p.finalize_run

    # -- silver -------------------------------------------------------------

    def _build_silver_pipeline(self) -> Pipeline:
        p = Pipeline(self.spark, os.path.join(self.storage_root, "silver"))
        lake = self

        # staging views (reference :12-24, :39-51, :67-77, :93-104)
        @p.view(name="bookings_raw", expectations=BOOKING_RULES)
        def bookings_raw(pl: Pipeline) -> DataFrame:
            return (
                lake._bronze("bookings")
                .withColumn("amount", F.col("amount").cast("double"))
                .withColumn("booking_date", F.to_date("booking_date"))
                .withColumn("modifiedDate", F.col(INGEST_TIME_COL))
                .drop(RESCUE_COL, INGEST_TIME_COL, INGEST_FILE_COL)
            )

        @p.view(name="flights_raw")
        def flights_raw(pl: Pipeline) -> DataFrame:
            return (
                lake._bronze("flights")
                .withColumn("flight_date", F.to_date("flight_date"))
                .withColumn("modifiedDate", F.col(INGEST_TIME_COL))
                .drop(RESCUE_COL, INGEST_TIME_COL, INGEST_FILE_COL)
            )

        @p.view(name="customers_raw")
        def customers_raw(pl: Pipeline) -> DataFrame:
            return (
                lake._bronze("customers")
                .withColumn("modifiedDate", F.col(INGEST_TIME_COL))
                .drop(RESCUE_COL, INGEST_TIME_COL, INGEST_FILE_COL)
            )

        @p.view(name="airports_raw")
        def airports_raw(pl: Pipeline) -> DataFrame:
            return (
                lake._bronze("airports")
                .withColumn("modifiedDate", F.col(INGEST_TIME_COL))
                .drop(RESCUE_COL, INGEST_TIME_COL, INGEST_FILE_COL)
            )

        # SCD1 streaming tables + CDC flows (reference :27-36, :54-64,
        # :80-90, :107-117)
        for table, source, keys in [
            ("bookings_silver", "bookings_raw", ["booking_id"]),
            ("flights_silver", "flights_raw", ["flight_id"]),
            ("customers_silver", "customers_raw", ["passenger_id"]),
            ("airports_silver", "airports_raw", ["airport_id"]),
        ]:
            p.create_streaming_table(table)
            p.create_auto_cdc_flow(
                target=table, source=source, keys=keys, sequence_by="modifiedDate"
            )

        # joined business view (reference :121-133)
        @p.view(name="business_silver")
        def business_silver(pl: Pipeline) -> DataFrame:
            return (
                pl.read("bookings_silver")
                .drop("modifiedDate")
                .join(pl.read("flights_silver").drop("modifiedDate"), "flight_id")
                .join(pl.read("customers_silver").drop("modifiedDate"), "passenger_id")
                .join(pl.read("airports_silver").drop("modifiedDate"), "airport_id")
            )

        return p

    def run_silver(self) -> None:
        """One silver batch: apply expectations and upsert all four SCD1
        tables (modifiedDate comes from the bronze ingest stamp)."""
        self.silver.run()

    # -- gold ---------------------------------------------------------------

    def _gold_table(self, name: str) -> ManagedParquetTable:
        return ManagedParquetTable(self.spark, os.path.join(self.gold_root, name))

    DIMS = {
        "DimFlights": DimConfig("DimFlights", ["flight_id"], "DimFlightsKey"),
        "DimCustomers": DimConfig("DimCustomers", ["passenger_id"], "DimCustomersKey"),
        "DimAirports": DimConfig("DimAirports", ["airport_id"], "DimAirportsKey"),
    }
    DIM_SOURCES = {
        "DimFlights": "flights_silver",
        "DimCustomers": "customers_silver",
        "DimAirports": "airports_silver",
    }

    def build_gold(self, clock: dt.datetime | None = None) -> None:
        """Build the three dimensions then the fact (reference E3 order).

        The dimensions are INDEPENDENT (separate silver sources, separate
        target tables, separate commit locks), so they build concurrently
        on the shared session — Spark's scheduler interleaves their jobs
        and the per-build fixed costs (cursor collects, rank kernel,
        staged parquet write, commit) overlap instead of summing. Results
        are identical to the sequential order by independence; the fact
        build stays AFTER the barrier because it joins every dim's
        surrogate mapping."""
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(self.DIMS)) as ex:
            futures = [
                ex.submit(self.build_one_dim, name, clock) for name in self.DIMS
            ]
            for f in futures:
                f.result()  # re-raise the first failure, if any
        self.build_fact_table(clock)

    def build_one_dim(self, name: str, clock: dt.datetime | None = None) -> None:
        """Build a single gold dimension from its silver source — the
        unit the per-entity chains schedule as soon as THAT silver table
        is upserted (a dim's only upstream)."""
        build_dim(
            self.silver.read(self.DIM_SOURCES[name]),
            self._gold_table(name),
            self.DIMS[name],
            clock,
        )

    DIM_BY_ENTITY = {
        "flights": "DimFlights",
        "customers": "DimCustomers",
        "airports": "DimAirports",
    }

    def build_fact_table(self, clock: dt.datetime | None = None) -> None:
        """Build the fact AFTER every dim exists (it joins all three
        surrogate mappings — the one true barrier in the gold DAG)."""
        fact_cfg = FactConfig(
            name="Fact_Bookings",
            grain_keys=["booking_id"],
            measures=["amount", "booking_date"],
            dims=[
                FactDimSpec(
                    self._gold_table("DimCustomers"),
                    {"passenger_id": "passenger_id"},
                    "DimCustomersKey",
                ),
                FactDimSpec(
                    self._gold_table("DimFlights"), {"flight_id": "flight_id"}, "DimFlightsKey"
                ),
                FactDimSpec(
                    self._gold_table("DimAirports"), {"airport_id": "airport_id"}, "DimAirportsKey"
                ),
            ],
        )
        build_fact(
            self.silver.read("bookings_silver"),
            self._gold_table("Fact_Bookings"),
            fact_cfg,
            clock=clock,
        )

    def run_all(self, clock: dt.datetime | None = None) -> None:
        """Raw → bronze → silver → gold in one call (one 'job run').

        The whole job runs as a dependency DAG, not layer barriers:
        per-entity chains drain bronze, upsert silver, and — for the
        three dimension entities — build the GOLD DIM as soon as its own
        silver lands (`ingest_and_silver(then=...)`). After the chains,
        the fact build (which joins every dim — the one true barrier)
        overlaps the silver finalize (quarantine + event-log appends,
        which gold never reads); both are awaited before returning, so a
        following run observes a fully-closed batch."""
        from concurrent.futures import ThreadPoolExecutor

        def then(entity: str) -> None:
            dim = self.DIM_BY_ENTITY.get(entity)
            if dim:
                self.build_one_dim(dim, clock)

        finalize = self.ingest_and_silver(clock, then=then)
        with ThreadPoolExecutor(max_workers=1) as ex:
            fin = ex.submit(finalize)
            self.build_fact_table(clock)
            fin.result()  # re-raise a finalize failure, if any


# ---------------------------------------------------------------------------
# registry query: end-to-end medallion replay, golden-oracle checked
# ---------------------------------------------------------------------------

import tempfile  # noqa: E402

from databricks_end_to_end_lakeflow_project_spark.registry import query
from databricks_end_to_end_lakeflow_project_spark.session import cloned_session  # noqa: E402
from databricks_end_to_end_lakeflow_project_spark.sources.scratch import ephemeral_dir  # noqa: E402
from databricks_end_to_end_lakeflow_project_spark.sources import flight_fixtures  # noqa: E402

_T1 = dt.datetime(2025, 8, 1, 0, 0, 0)
_T2 = dt.datetime(2025, 8, 2, 0, 0, 0)


def _expected_dim_airports_values() -> str:
    """Golden final state of DimAirports after base→scd replay, derived
    from the deterministic fixture formulas: scd attributes win for
    changed keys, surrogates are 1..50 in airport_id order, create_date
    from run 1, update/modified dates reflect the reprocessing run."""
    rows = []
    for i in range(1, 51):
        scd = i in flight_fixtures.AIRPORT_SCD_IDS
        aid, name, city, country = flight_fixtures.airport_row(i, scd=scd)
        modified = _T2 if scd else _T1
        rows.append(
            f"('{aid}', '{name}', '{city}', '{country}', {i}, "
            f"TIMESTAMP '{_T1}', TIMESTAMP '{_T2}', TIMESTAMP '{modified}')"
        )
    return ",\n      ".join(rows)


DIM_AIRPORTS_GOLDEN_ORACLE = f"""
    SELECT * FROM (VALUES
      {_expected_dim_airports_values()}
    ) AS t(airport_id, airport_name, city, country, DimAirportsKey,
           create_date, update_date, modifiedDate)
"""


@query("pipeline_medallion_scd_replay", DIM_AIRPORTS_GOLDEN_ORACLE)
def pipeline_medallion_scd_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full medallion replay (ignores sf_dir — input is the deterministic
    flight fixture set): base load then SCD drop, two complete
    raw→bronze→silver→gold runs, returning the final DimAirports state.
    Hash-checked against a golden VALUES oracle, so this single query
    verifies ingest checkpointing, expectations, SCD1 CDC, surrogate
    assignment, and audit-column semantics end to end."""
    root = ephemeral_dir("flight_demo_")
    raw = os.path.join(root, "raw")
    flight_fixtures.write_base(raw)
    # The replay executes EAGERLY here (availableNow drains + upserts),
    # over fixture-sized micro-batches where 32-partition shuffles are
    # pure scheduling overhead (~13% of wall at sf0.01). Run the whole
    # eager section on an ISOLATED cloned session with a small shuffle
    # width — the caller's session conf is never touched, so concurrent
    # registry queries in one session can't observe it. At 100 TB the
    # replay's batches are data-sized and the override disappears with
    # the fixture.
    eager = cloned_session(spark, {"spark.sql.shuffle.partitions": "8"})
    lake = FlightLakehouse(eager, raw, os.path.join(root, "lake"))
    lake.run_all(clock=_T1)
    flight_fixtures.write_scd(raw)
    lake.run_all(clock=_T2)
    return lake._gold_table("DimAirports").read().select(
        "airport_id", "airport_name", "city", "country", "DimAirportsKey",
        "create_date", "update_date", "modifiedDate",
    )


# ---------------------------------------------------------------------------
# the 4-way join AS STREAMS — the reference's business_silver as written
# (dlt_bronze_to_silver_pipeline.py:127-131 composes four STREAMING reads)
# ---------------------------------------------------------------------------


def business_silver_stream(lake: FlightLakehouse) -> DataFrame:
    """`business_silver` in its streaming form: three CHAINED watermarked
    stream-stream joins over the four silver streams, drained with
    availableNow — the reference's J1 as written
    (`dlt_bronze_to_silver_pipeline.py:127-131`), where the batch view
    (`silver` DAG above) is the SURVEY §7 first-step equivalent.

    The reference's joins are bare equi-joins; an unbounded stream-stream
    equi-join can never evict state. Here every side carries a 1-hour
    watermark on its CDC stamp and every join adds the ±1-day
    co-arrival constraint `other.modifiedDate BETWEEN booking.modifiedDate
    - 1 day AND + 1 day` — the standard production bounding: state per
    side is (watermark + interval) of data, not the whole stream, and for
    any batch where dimensions arrive with their facts (the replay
    fixture and any daily-loaded lakehouse) the result is row-identical
    to the batch view (pinned by `tests/test_flight_pipeline.py`).

    Returns the DRAINED join as a batch DataFrame (memory-sink
    verification harness, like the other stream queries)."""
    import uuid as _uuid

    from databricks_end_to_end_lakeflow_project_spark.streaming.structured import (
        STATE_PARTITIONS,
        run_to_memory,
    )

    # capture only paths + schemas so the join plan can be rebuilt on the
    # run_to_memory builder session (conf overrides bind to a cloned
    # session; lake.spark's conf is never mutated)
    sides = {
        t: (lake.silver._tables[t].path, lake.silver._tables[t].read().schema)
        for t in (
            "bookings_silver",
            "flights_silver",
            "customers_silver",
            "airports_silver",
        )
    }

    def build(s: SparkSession) -> DataFrame:
        def side(table: str, md: str) -> DataFrame:
            path, schema = sides[table]
            return (
                s.readStream.schema(schema)
                .parquet(path)
                .withColumnRenamed("modifiedDate", md)
                .withWatermark(md, "1 hour")
            )

        b = side("bookings_silver", "b_md")
        f = side("flights_silver", "f_md")
        c = side("customers_silver", "c_md")
        a = side("airports_silver", "a_md")

        def co_arrival(md: str):
            return F.expr(
                f"{md} BETWEEN b_md - INTERVAL 1 DAY AND b_md + INTERVAL 1 DAY"
            )

        return (
            b.join(f, (b["flight_id"] == f["flight_id"]) & co_arrival("f_md"))
            .drop(f["flight_id"])
            .join(c, (b["passenger_id"] == c["passenger_id"]) & co_arrival("c_md"))
            .drop(c["passenger_id"])
            .join(a, (b["airport_id"] == a["airport_id"]) & co_arrival("a_md"))
            .drop(a["airport_id"])
            .drop("b_md", "f_md", "c_md", "a_md")
        )

    # INNER stream-stream joins emit every match in the data batch where
    # both sides are present; the trailing no-data micro-batch only
    # advances the watermark to EVICT state — it can't add or change
    # output rows. A drain-and-discard pass doesn't need the eviction
    # sweep, so skip it: at fixture scale the empty batch costs as much
    # as the data batch (full queryPlanning + 6 state-store commit
    # rounds for zero rows). A LEFT OUTER join would need it back on —
    # null-padded rows emit on eviction.
    # state_partitions=2 (not the global STATE_PARTITIONS=8): this drain
    # runs THREE chained stream-stream joins, and every partition of
    # every join carries 4 state stores — 3×8×4 = 96 store
    # init+commit lifecycles per micro-batch at width 8 vs 24 at width
    # 2, on a fixture-sized batch (~1k rows/side). Measured (r10,
    # warmed session, same drain): width 8 ≈ 4.8–5.2 s, width 2 ≈
    # 3.7 s. Width is a per-call knob — a production deployment sizes
    # it to the arrival rate; rows are width-invariant (the golden
    # VALUES oracle pins them).
    return run_to_memory(
        build,
        f"bizsilver_{_uuid.uuid4().hex[:8]}",
        state_partitions=2,
        extra_conf={"spark.sql.streaming.noDataMicroBatches.enabled": "false"},
        spark=lake.spark,
    )


def _expected_business_silver_values() -> str:
    """Golden per-airport rollup of the base-run business_silver join,
    derived from the fixture formulas (`flight_fixtures.booking_row`):
    a booking joins iff its passenger id ≤ 200 (the fixture plants
    P0201-P0205 references to exercise inner-join drops); flight and
    airport keys always resolve."""
    from collections import defaultdict

    agg: dict[int, list] = defaultdict(lambda: [0, 0, set(), set()])
    for i in range(1, 1001):
        pid = 1 + (i * 7) % 205
        if pid > 200:
            continue
        aid = 1 + (i * 5) % 50
        a = agg[aid]
        a[0] += 1
        a[1] += (100 + (i * 17) % 900) * 100 + i % 100
        a[2].add(1 + (i * 3) % 100)
        a[3].add(pid)
    rows = [
        f"('A{aid:03d}', {v[0]}, {v[1]}, {len(v[2])}, {len(v[3])})"
        for aid, v in sorted(agg.items())
    ]
    return ",\n      ".join(rows)


STREAM_BUSINESS_ORACLE = f"""
    SELECT * FROM (VALUES
      {_expected_business_silver_values()}
    ) AS t(airport_id, n_bookings, total_cents, n_flights, n_passengers)
    ORDER BY airport_id
"""


@query("stream_business_silver", STREAM_BUSINESS_ORACLE)
def stream_business_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end STREAMING business_silver (ignores sf_dir — input is
    the deterministic flight fixture base set): raw→bronze→silver once,
    then the three chained watermarked stream-stream joins over the four
    silver streams (`business_silver_stream`), rolled up per airport.
    Hash-checked against a golden VALUES oracle computed from the
    fixture formulas — the one reference behavior (J1 as literal stream
    composition) the batch `pipeline_medallion_scd_replay` doesn't
    exercise."""
    root = ephemeral_dir("flight_stream_")
    raw = os.path.join(root, "raw")
    flight_fixtures.write_base(raw)
    # Fixed-cost shape (the registry's slowest entry before this form):
    # per-entity ingest→silver chains instead of two phase barriers, the
    # whole eager section on an ISOLATED cloned session with a
    # fixture-sized shuffle width (the caller's conf is never mutated —
    # same rationale as the medallion replay above), and the silver
    # finalize (quarantine/event-log — the join reads only the silver
    # TABLES) overlapped with the stream drain. Identical rows by
    # construction; the golden VALUES oracle pins it.
    from concurrent.futures import ThreadPoolExecutor

    eager = cloned_session(spark, {"spark.sql.shuffle.partitions": "8"})
    lake = FlightLakehouse(eager, raw, os.path.join(root, "lake"))
    finalize = lake.ingest_and_silver(clock=_T1)
    with ThreadPoolExecutor(max_workers=1) as ex:
        fin = ex.submit(finalize)
        rows = business_silver_stream(lake)
        fin.result()
    return (
        rows.groupBy("airport_id")
        .agg(
            F.count(F.lit(1)).alias("n_bookings"),
            F.sum(F.round(F.col("amount") * 100).cast("long")).alias("total_cents"),
            F.countDistinct("flight_id").alias("n_flights"),
            F.countDistinct("passenger_id").alias("n_passengers"),
        )
        .orderBy("airport_id")
    )
