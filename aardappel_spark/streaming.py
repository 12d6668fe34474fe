"""Streaming replication: Structured Streaming wrapper around the batch
kernel (parse -> quorum gate -> cut -> compact -> cast -> merge).

Lifecycle parity with the reference (SURVEY.md §3.3, W1-W5):
  * quorum gate across ALL partitions of ALL streams (hb_tracker.go) —
    heartbeat state persists across micro-batches;
  * events at-or-above the quorum CARRY OVER to the next batch
    (strictly-less cut, tx_queue.go:26-33);
  * stage machine INITIAL_SCAN -> RUN (processor.go:621-726);
  * exactly-once effect via the §4.3 idempotent-replay recipe: position
    guard in `_state` + MERGE idempotence + Spark's checkpointed source
    offsets (offsets commit AFTER the batch succeeds = the reference's
    commit order, README.md:183-192);
  * FATAL_ERROR persisted to `_state` before the query dies
    (problem_strategy='stop', reader.go:192-204).

Storage: destination tables and `_state` are versioned parquet
directories (a stand-in for Delta/Iceberg MERGE INTO on a cluster —
same commit protocol: write new version, flip pointer, replay
overwrites the same version deterministically).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .apply import apply_batch
from .casting import TableMeta
from .cmdqueue import parse_commands, resolve_problem_actions
from .keyfilter import filter_blocked_keys
from .metrics import MetricsRegistry
from .parse import parse_messages, split_events, split_heartbeats, split_problems
from .quorum import cut_below_quorum, get_quorum
from .types import CDC_EVENT_SCHEMA, pos, pos_lit

STATE_OK = "OK"
STATE_FATAL = "FATAL_ERROR"
STAGE_INITIAL_SCAN = "INITIAL_SCAN"
STAGE_RUN = "RUN"


class StateStore:
    """The `_state` checkpoint row (FIXTURES.md §5) as a tiny versioned
    parquet dir. write() is atomic at the pointer-file level."""

    def __init__(self, spark: SparkSession, path: str, instance_id: str):
        self.spark = spark
        self.path = path
        self.instance_id = instance_id
        os.makedirs(path, exist_ok=True)

    def _ptr(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def read(self) -> dict:
        if not os.path.exists(self._ptr()):
            return {
                "id": self.instance_id,
                "step_id": Decimal(0),
                "tx_id": Decimal(0),
                "state": STATE_OK,
                "stage": STAGE_INITIAL_SCAN,
                "last_msg": "",
            }
        with open(self._ptr()) as f:
            version = f.read().strip()
        row = json.loads(
            open(os.path.join(self.path, f"v{version}.json")).read()
        )
        row["step_id"] = Decimal(row["step_id"])
        row["tx_id"] = Decimal(row["tx_id"])
        return row

    def write(
        self,
        position: tuple[Decimal, Decimal],
        stage: str,
        state: str = STATE_OK,
        last_msg: str = "",
        version: int | None = None,
        extra: dict | None = None,
    ) -> None:
        cur = 0
        if os.path.exists(self._ptr()):
            cur = int(open(self._ptr()).read().strip())
        version = cur + 1 if version is None else version
        row = {
            "id": self.instance_id,
            "step_id": str(position[0]),
            "tx_id": str(position[1]),
            "state": state,
            "stage": stage,
            "last_msg": last_msg,
            **(extra or {}),
        }
        with open(os.path.join(self.path, f"v{version}.json"), "w") as f:
            f.write(json.dumps(row))
        tmp = self._ptr() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._ptr())

    def ensure_startable(self) -> dict:
        """Refuse to start unless state == OK (selectReplicationState,
        processor.go:308-310 — manual recovery required)."""
        st = self.read()
        if st["state"] != STATE_OK:
            raise RuntimeError(
                f"replication state is {st['state']} ({st['last_msg']}); "
                "manual recovery required"
            )
        return st


class VersionedTable:
    """Destination table as versioned parquet snapshots with a CURRENT
    pointer. Replaying a batch rewrites the same target version —
    deterministic, so replays converge (§4.3)."""

    def __init__(self, spark: SparkSession, path: str, meta: TableMeta, schema: str):
        self.spark = spark
        self.path = path
        self.meta = meta
        self.schema = schema
        os.makedirs(path, exist_ok=True)

    def _ptr(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def current_version(self) -> int:
        if not os.path.exists(self._ptr()):
            return 0
        return int(open(self._ptr()).read().strip())

    def current(self) -> DataFrame:
        v = self.current_version()
        if v == 0:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.parquet(os.path.join(self.path, f"v{v}"))

    def commit(self, df: DataFrame, version: int) -> None:
        target = os.path.join(self.path, f"v{version}")
        # Materialize into a staging dir FIRST: on a crashed-batch replay
        # the incoming df lazily READS the existing v{version} (merge input),
        # so deleting it before the write would pull files out from under
        # the running plan.
        staging = target + ".staging"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        df.write.mode("overwrite").parquet(staging)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.rename(staging, target)
        tmp = self._ptr() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._ptr())


@dataclass
class StreamConfig:
    """One replicated stream (reference config.go:15-21)."""

    table_id: int
    meta: TableMeta
    dst_path: str
    dst_schema: str
    problem_strategy: str = "stop"  # 'stop' | 'continue'


@dataclass
class ReplicationEngine:
    """Driver-side engine state shared across micro-batches."""

    spark: SparkSession
    streams: list[StreamConfig]
    expected_partitions: int
    work_dir: str
    instance_id: str = "aardappel"
    topic_path: str = ""
    blocked_keys: DataFrame | None = None  # BINARY serialized keys (S13)
    commands: DataFrame | None = None  # raw command-topic messages (S12)
    metrics: MetricsRegistry = field(default_factory=MetricsRegistry)
    step_to_ms: float = 1e-3  # CDC step unit -> milliseconds (default: micros)
    # W4: start in INITIAL_SCAN (reference seeds it always, main.go:99-117).
    # False seeds stage RUN for pure change-stream deployments with no
    # snapshot backlog to sync past.
    initial_scan: bool = False
    hb_state: dict[tuple[int, int], tuple[Decimal, Decimal]] = field(default_factory=dict)
    batches_applied: int = 0
    modifications: int = 0

    def __post_init__(self):
        self.state = StateStore(self.spark, os.path.join(self.work_dir, "_state"), self.instance_id)
        if not self.initial_scan and self.state.read()["stage"] == STAGE_INITIAL_SCAN:
            # seed straight to RUN when no initial-scan sync is wanted
            st = self.state.read()
            if not os.path.exists(self.state._ptr()):
                self.state.write((st["step_id"], st["tx_id"]), STAGE_RUN)
        self.tables = {
            s.table_id: VersionedTable(self.spark, s.dst_path, s.meta, s.dst_schema)
            for s in self.streams
        }
        self.pending_dir = os.path.join(self.work_dir, "_pending")
        self.dlq_dir = os.path.join(self.work_dir, "_dlq")
        os.makedirs(self.pending_dir, exist_ok=True)

    # -- pending events (above-quorum carryover) ------------------------

    def _pending_versions(self) -> list[int]:
        if not os.path.exists(self.pending_dir):
            return []
        return sorted(
            int(f[1:]) for f in os.listdir(self.pending_dir) if f.startswith("v")
        )

    def _read_pending(self, before_batch_id: int) -> DataFrame | None:
        """Pending state as of BEFORE this batch. A replayed batch N must
        not see the v{N} it wrote before crashing, or its events double."""
        versions = [v for v in self._pending_versions() if v < before_batch_id]
        if not versions:
            return None
        # explicit schema: an empty pending snapshot has no footer to infer
        return self.spark.read.schema(CDC_EVENT_SCHEMA).parquet(
            os.path.join(self.pending_dir, f"v{versions[-1]}")
        )

    def _write_pending(self, df: DataFrame, version: int) -> None:
        target = os.path.join(self.pending_dir, f"v{version}")
        if os.path.exists(target):
            shutil.rmtree(target)  # crashed-batch replay
        df.select(*[f.name for f in CDC_EVENT_SCHEMA.fields]).write.mode(
            "overwrite"
        ).parquet(target)
        # keep version-1: a crash before the state write replays THIS batch,
        # which reads the previous pending version. Older ones are dead
        # (their batch's source offsets are already committed).
        for v in self._pending_versions():
            if v < version - 1:
                shutil.rmtree(os.path.join(self.pending_dir, f"v{v}"), ignore_errors=True)

    # -- heartbeat tracking across batches ------------------------------

    def _update_hb_state(self, heartbeats: DataFrame) -> None:
        for r in heartbeats.groupBy("table_id", "partition").agg(
            F.max(pos()).alias("hb")
        ).collect():
            k = (r.table_id, r.partition)
            cur = self.hb_state.get(k)
            cand = (r.hb.step, r.hb.tx_id)
            if cur is None or cand > cur:
                self.hb_state[k] = cand

    def quorum(self) -> tuple[Decimal, Decimal] | None:
        if len(self.hb_state) < self.expected_partitions:
            return None
        return min(self.hb_state.values())

    # -- the per-batch kernel -------------------------------------------

    def process_batch(self, raw: DataFrame, batch_id: int) -> None:
        """foreachBatch body. `raw` columns: value (JSON string), and
        optionally partition/offset."""
        import time as _time

        t_start = _time.perf_counter()
        st = self.state.ensure_startable()
        checkpoint = (st["step_id"], st["tx_id"])

        cols = raw.columns
        parsed = parse_messages(
            raw,
            table_id_col="table_id" if "table_id" in cols else None,
            partition_col="partition" if "partition" in cols else None,
            offset_col="offset" if "offset" in cols else None,
        ).persist()
        try:
            problems = split_problems(parsed)
            n_problems = problems.count()
            if n_problems:
                self._route_problems(problems, st)

            # snapshot BEFORE this batch's heartbeats: out-of-order means
            # older than a heartbeat the stream had already emitted
            # (verifyStream, reader.go:150-207)
            hb_before = dict(self.hb_state)
            self._update_hb_state(split_heartbeats(parsed))

            events = split_events(parsed).select(
                *[f.name for f in CDC_EVENT_SCHEMA.fields]
            )
            # out-of-order routing first (read-path order: verifyStream runs
            # before EnqueueTx's stale filter, reader.go:243); an 'apply'
            # override below the checkpoint is still dropped by F1 next,
            # exactly like EnqueueTx would drop it.
            events = self._route_out_of_order(events, hb_before, st)
            # stale filter (F1): strictly-below-checkpoint replays dropped
            events = events.filter(pos() >= pos_lit(*checkpoint))
            if self.blocked_keys is not None:
                events = filter_blocked_keys(
                    events, self.blocked_keys, table_path=self.topic_path
                )

            pend = self._read_pending(before_batch_id=batch_id)
            if pend is not None:
                events = pend.unionByName(events)

            q = self.quorum()

            if st["stage"] == STAGE_INITIAL_SCAN:
                # W4 (DoInitialScan, processor.go:621-726): remember the MAX
                # of the first complete heartbeat set as the sync point;
                # nothing applies until the quorum passes it (the snapshot
                # backlog must have fully arrived). The apply below then
                # writes position AND stage=RUN in one state commit — the
                # reference's atomic final-batch flip (:679-698).
                if (
                    st.get("sync_step") is None
                    and len(self.hb_state) >= self.expected_partitions
                ):
                    sync = max(self.hb_state.values())
                    self.state.write(
                        checkpoint,
                        STAGE_INITIAL_SCAN,
                        extra={"sync_step": str(sync[0]), "sync_tx": str(sync[1])},
                    )
                    st = self.state.read()
                synced = (
                    st.get("sync_step") is not None
                    and q is not None
                    and q > (Decimal(st["sync_step"]), Decimal(st["sync_tx"]))
                )
                if not synced:
                    self._write_pending(events, batch_id)
                    return

            if q is None or q <= checkpoint:
                # no safe boundary yet — everything stays pending
                self._write_pending(events, batch_id)
                return

            import time as _time

            quorum_wait = _time.perf_counter() - t_start
            batch = cut_below_quorum(events, q).persist()
            remainder = events.filter(pos() >= pos_lit(*q))

            t_commit = _time.perf_counter()
            per_table: dict[str, int] = {}
            for s in self.streams:
                tbl = self.tables[s.table_id]
                ev_t = batch.filter(F.col("table_id") == s.table_id)
                merged = apply_batch(tbl.current(), ev_t, s.meta)
                tbl.commit(merged, version=batch_id + 1)
                per_table[s.meta.name] = ev_t.count()
            n_mods = sum(per_table.values())
            self.modifications += n_mods

            self._write_pending(remainder, batch_id)
            stage = STAGE_RUN  # first successful quorum apply flips stage
            self.state.write(q, stage)
            self.batches_applied += 1
            self.metrics.on_batch_applied(
                modifications=n_mods,
                per_table=per_table,
                commit_seconds=_time.perf_counter() - t_commit,
                quorum_wait_seconds=quorum_wait,
                quorum_step_ms=float(q[0]) * self.step_to_ms,
            )
            batch.unpersist()
        finally:
            parsed.unpersist()

    def _route_out_of_order(
        self,
        events: DataFrame,
        hb_before: dict[tuple[int, int], tuple[Decimal, Decimal]],
        st: dict,
    ) -> DataFrame:
        """F4/W3: events older than their partition's last-known heartbeat
        are problem messages. Resolution order (README.md:577-610):
        command-queue override ('apply' keeps, 'skip' drops+DLQ), else the
        stream's problem strategy ('continue' = DLQ+drop, 'stop' = persist
        FATAL_ERROR and die)."""
        if not hb_before:
            return events
        hb_rows = [
            (t, p, s, x) for (t, p), (s, x) in hb_before.items()
        ]
        hb_df = self.spark.createDataFrame(
            hb_rows,
            "table_id int, partition int, hb_step decimal(20,0), hb_tx decimal(20,0)",
        )
        marked = events.join(F.broadcast(hb_df), ["table_id", "partition"], "left")
        late_cond = F.col("hb_step").isNotNull() & (
            pos() < F.struct(F.col("hb_step").alias("step"), F.col("hb_tx").alias("tx_id"))
        )
        late = marked.filter(late_cond).drop("hb_step", "hb_tx")
        if late.isEmpty():
            return events
        ok = marked.filter(~F.coalesce(late_cond, F.lit(False))).drop("hb_step", "hb_tx")

        if self.commands is not None:
            resolved = resolve_problem_actions(
                late, parse_commands(self.commands), self.instance_id, self.topic_path
            )
        else:
            resolved = late.withColumn("action", F.lit(None).cast("string"))
        resolved = resolved.persist()
        try:
            applied = resolved.filter(F.col("action") == "apply").drop("action")
            dropped = resolved.filter(
                F.col("action").isNull() | (F.col("action") == "skip")
            )
            unresolved = resolved.filter(F.col("action").isNull())
            os.makedirs(self.dlq_dir, exist_ok=True)
            dropped.drop("action").withColumn(
                "_reason", F.lit("out_of_order")
            ).write.mode("append").parquet(self.dlq_dir)

            if not unresolved.isEmpty() and any(
                s.problem_strategy == "stop" for s in self.streams
            ):
                first = unresolved.first()
                msg = (
                    f"out-of-order change at ({first.step},{first.tx_id}) "
                    f"partition {first.partition}"
                )
                self.state.write(
                    (st["step_id"], st["tx_id"]), st["stage"], STATE_FATAL, msg
                )
                raise RuntimeError(msg)
            return ok.unionByName(applied)
        finally:
            resolved.unpersist()

    def _route_problems(self, problems: DataFrame, st: dict) -> None:
        """W3: DLQ + (stop|continue). 'stop' persists FATAL_ERROR before
        failing, like reader.go:192-204."""
        os.makedirs(self.dlq_dir, exist_ok=True)
        problems.withColumn("_ts", F.current_timestamp()).write.mode("append").parquet(
            self.dlq_dir
        )
        if any(s.problem_strategy == "stop" for s in self.streams):
            first = problems.first()
            msg = f"problem message: {first.error}"
            self.state.write(
                (st["step_id"], st["tx_id"]), st["stage"], STATE_FATAL, msg
            )
            raise RuntimeError(msg)

    # -- entry points ----------------------------------------------------

    @classmethod
    def from_config(
        cls,
        spark: SparkSession,
        cfg,
        table_metas: dict[str, tuple[TableMeta, str]],
        work_dir: str,
        **overrides,
    ) -> "ReplicationEngine":
        """doMain parity (main.go:140-229): build the engine from an
        EngineConfig. ``table_metas`` maps dst_table -> (TableMeta,
        dst schema DDL); dst paths are the configured dst_table strings.
        Command topic / key filter / DLQ attach when configured."""
        from .sources import read_file_batch

        streams = []
        expected = 0
        for i, s in enumerate(cfg.streams):
            meta, ddl = table_metas[s.dst_table]
            streams.append(
                StreamConfig(
                    table_id=i,
                    meta=meta,
                    dst_path=s.dst_table,
                    dst_schema=ddl,
                    problem_strategy=s.problem_strategy,
                )
            )
        eng = cls(
            spark=spark,
            streams=streams,
            expected_partitions=overrides.pop("expected_partitions", 1),
            work_dir=work_dir,
            instance_id=cfg.instance_id,
            topic_path=cfg.streams[0].src_topic if cfg.streams else "",
            **overrides,
        )
        if cfg.cmd_queue_path:
            eng.commands = read_file_batch(spark, cfg.cmd_queue_path)
        if cfg.key_filter_table:
            blocked = spark.read.parquet(cfg.key_filter_table)
            from .keyfilter import blocked_keys_from_table

            eng.blocked_keys = blocked_keys_from_table(blocked, cfg.instance_id)
        if cfg.dead_letter_queue_path:
            eng.dlq_dir = cfg.dead_letter_queue_path
        return eng

    def run_stream(
        self,
        source: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
    ):
        """Attach the kernel to a streaming DataFrame (file/Kafka source).
        Source offsets live in Spark's checkpoint; they commit after each
        successful batch — the reference's offset-commit order (S10)."""
        writer = (
            source.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
