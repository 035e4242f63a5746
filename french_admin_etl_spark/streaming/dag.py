"""FK-ordered multi-table CDC apply: one log, many tables, one DAG.

The reference's pipeline is itself a small DAG: ``cmd/main.go:110-120``
loads regions, then departments, then communes, because each child table
declares an FK to its parent (``migrations/000003:28,63-65``) and loading
out of order would violate it. The engine generalizes this to a job-level
operator: a :class:`DagApplyJob` owns one :class:`CDCApplyJob` per table
plus the FK edges between them, and applies each LSN window of a shared
multi-table envelope log (:mod:`..sources.envelope_log`) to every table in
**topological order** — parents always land before the children that
reference them, so referential integrity holds at every window boundary,
not just at end-of-stream.

Exactly-once: each table's merges are fenced under its own writer
namespace ``<writer_id>.<table>``. A crash after table k of a window has
committed but before the window checkpoint advances replays the whole
window — tables 1..k fence to no-ops, tables k+1.. apply, and the stream
converges with no double-apply and no gap. One checkpoint therefore
covers the whole DAG.

FK gates (both broadcast-shaped — the parent/probe side of every join is
the small side, so at 100 TB these are map-side filters, never shuffles):

- **per-window** (default): the child table's LIVE rows for the keys the
  window touched are anti-joined against the parent table AFTER the
  window applied (post-merge state — immune to superseded/stale/replayed
  events); parent deletes are cross-checked against surviving children.
  O(window + one keyed child probe, + one child scan only when a parent
  was deleted).
- **deep** (:meth:`DagApplyJob.deep_fk_check`): the e2e gate — every
  child ROW against its parent table, the assertable form of the
  declarative constraint. O(child tables); run on demand, not per window.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import CycleError, TopologicalSorter

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.operators.dim_join import fk_orphans
from french_admin_etl_spark.sources.envelope_log import MultiTableLog
from french_admin_etl_spark.streaming.apply import BatchResult, CDCApplyJob
from french_admin_etl_spark.streaming.checkpoint import CheckpointStore


@dataclass
class FKEdge:
    """child.fk_col references parent.parent_key (NULL FKs are legal)."""

    child: str
    fk_col: str
    parent: str
    parent_key: str


@dataclass
class WindowResult:
    batch_id: int
    lo: int
    hi: int
    tables: dict[str, BatchResult] = field(default_factory=dict)


class FKViolation(AssertionError):
    pass


class DagApplyJob:
    def __init__(
        self,
        jobs: dict[str, CDCApplyJob],
        edges: list[FKEdge],
        writer_id: str = "dag",
        fk_check: bool = True,
    ):
        self.jobs = jobs
        self.edges = edges
        self.writer_id = writer_id
        self.fk_check = fk_check
        for e in edges:
            for t in (e.child, e.parent):
                if t not in jobs:
                    raise ValueError(f"FK edge references unknown table {t!r}")
        self.order = self._topo_order()

    def _topo_order(self) -> list[str]:
        """Parents before children; ties broken by name for determinism."""
        ts = TopologicalSorter({t: set() for t in self.jobs})
        for e in self.edges:
            ts.add(e.child, e.parent)
        try:
            ts.prepare()
        except CycleError as exc:
            raise ValueError(f"FK graph has a cycle: {exc.args[1]}") from exc
        order: list[str] = []
        while ts.is_active():
            ready = sorted(ts.get_ready())
            order.extend(ready)
            ts.done(*ready)
        return order

    # ------------------------------------------------------------ per window

    def _parse_schema(self, name: str, markers: list) -> T.StructType:
        """Payload parse schema for this window: the table's current
        logical columns, EXTENDED with columns that SCHEMA events inside
        the window are about to add or rename — an event after the
        mid-window evolution already carries the new key in its JSON, and
        parsing with only the pre-window schema would silently drop it.
        (Old names are kept too: pre-rename events still use them.)
        ``markers`` are this table's SCHEMA rows, pre-collected once for
        the whole window by :meth:`apply_window`."""
        import json

        snap = self.jobs[name].table.snapshot()
        fields = {
            f["name"]: T.StructField.fromJson(f)
            for f in snap["schemas"][str(snap["schema_version"])]["fields"]
            if f["name"] != "content_sha"  # derived, never in the payload
        }
        for m in sorted(markers, key=lambda r: r["lsn"]):
            p = json.loads(m["props"])
            if p["action"] == "add_column":
                fields[p["name"]] = T.StructField(
                    p["name"], T._parse_datatype_string(p["type"]), True
                )
            elif p["action"] == "widen":
                fields[p["name"]] = T.StructField(
                    p["name"], T._parse_datatype_string(p["type"]), True
                )
            elif p["action"] == "rename_column":
                old = fields[p["from"]]
                fields[p["to"]] = T.StructField(p["to"], old.dataType, True)
        return T.StructType(list(fields.values()))

    def apply_window(
        self,
        window: DataFrame,
        batch_id: int,
        lo: int,
        hi: int,
        fence_ns: str | None = None,
    ) -> WindowResult:
        """Apply one envelope window to every table in FK order, then gate.

        Driver cost is O(tables WITH events in the window), not O(all
        tables): one distinct scan finds the tables present and one pushed
        filter collects every table's SCHEMA markers, then absent tables
        are skipped entirely (no per-table jobs, no fence advance — a
        replay re-skips them identically). With hundreds of tables sharing
        one binlog, most windows touch a handful; this keeps the per-window
        scheduler cost proportional to actual work.

        ``fence_ns`` — fence namespace prefix; defaults to ``writer_id``.
        Drivers with INDEPENDENT batch-id sequences must pass distinct
        namespaces or one driver's replays would fence out the other's
        fresh windows (see :meth:`run_stream`)."""
        ns = fence_ns or self.writer_id
        res = WindowResult(batch_id, lo, hi)
        we_cached = window.is_cached
        if not we_cached:
            window = window.persist()
        try:
            # one scan: per-(table, op) counts — presence, delete presence,
            # and gate applicability all come from this single job
            ops: dict[tuple[str, str], int] = {
                (r["table"], r["op"]): r["n"]
                for r in window.groupBy("table", "op").agg(F.count("*").alias("n")).collect()
            }
            present = {t for (t, _op) in ops}
            markers: dict[str, list] = {name: [] for name in self.jobs}
            # a shared binlog may carry SCHEMA events for tables this DAG
            # doesn't own — they are skipped like un-owned data events
            if any(op == "SCHEMA" and t in self.jobs for (t, op) in ops):
                for m in (
                    window.filter(
                        (F.col("op") == "SCHEMA")
                        & F.col("table").isin(list(self.jobs))
                    )
                    .select("table", "lsn", "props")
                    .collect()
                ):
                    markers[m["table"]].append(m)
            typed: dict[str, DataFrame] = {}
            for name in self.order:
                if name not in present:
                    continue
                job = self.jobs[name]
                typed[name] = MultiTableLog.for_table(
                    window, name, self._parse_schema(name, markers[name])
                )
                res.tables[name] = job.apply_batch(
                    typed[name], batch_id, fence_writer=f"{ns}.{name}"
                )
            if self.fk_check:
                self._check_window(typed, ops)
        finally:
            if not we_cached:
                window.unpersist()
        return res

    def _check_window(
        self, typed: dict[str, DataFrame], ops: dict[tuple[str, str], int] | None = None
    ) -> None:
        """Referential gate scoped to THIS window's events (O(window), plus
        one broadcast-filtered child scan only when a parent was deleted).
        ``ops`` — per-(table, op) counts precomputed by :meth:`apply_window`
        — lets legs with provably nothing to check skip their jobs."""

        def has(table: str, *which: str) -> bool:
            return ops is None or any((table, op) in ops for op in which)

        for e in self.edges:
            child_job, parent_job = self.jobs[e.child], self.jobs[e.parent]
            if e.child in typed and has(e.child, "I", "U"):
                # Gate what the window actually LEFT IN THE TABLE: the
                # child's live rows for the keys this window touched,
                # against the parent's post-window state. Checking raw (or
                # even folded) EVENTS false-positives whenever the table
                # is ahead of the event — a superseded U in a
                # delete-children-then-parent cascade, a stale event the
                # LSN guard rejected, or a whole replayed window during a
                # convergent re-apply (reviewer findings, rounds 3+3cont).
                # Post-merge state is the invariant the DAG promises
                # ("FK integrity holds at every window boundary"), so it
                # is also the thing to assert. O(window): touched keys are
                # broadcast into a semi-join probe of the child table.
                touched = (
                    typed[e.child]
                    .filter(F.col("op").isin("I", "U"))
                    .select(*child_job.keys)
                    .distinct()
                )
                live = child_job.table.read().join(
                    F.broadcast(touched), child_job.keys, "left_semi"
                )
                refs = live.filter(F.col(e.fk_col).isNotNull())
                bad = fk_orphans(
                    refs, parent_job.table.read(), e.fk_col, e.parent_key
                ).take(5)
                if bad:
                    raise FKViolation(
                        f"window events of {e.child}.{e.fk_col} reference missing "
                        f"{e.parent}.{e.parent_key}; sample: {bad}"
                    )
            if e.parent not in typed or not has(e.parent, "D"):
                continue  # parent absent or delete-free -> nothing to orphan
            # parent deletes that actually survived (no later reinsert in
            # the window) must leave no child rows behind
            deleted = (
                typed[e.parent]
                .filter(F.col("op") == "D")
                .select(F.col(e.parent_key).alias(e.fk_col))
                .distinct()
            )
            if deleted.take(1):
                still_absent = deleted.join(
                    parent_job.table.read().select(
                        F.col(e.parent_key).alias(e.fk_col)
                    ),
                    [e.fk_col],
                    "left_anti",
                )
                orphaned = (
                    child_job.table.read()
                    .filter(F.col(e.fk_col).isNotNull())
                    .join(F.broadcast(still_absent), [e.fk_col], "left_semi")
                    .take(5)
                )
                if orphaned:
                    raise FKViolation(
                        f"deleting {e.parent} rows orphaned {e.child} rows via "
                        f"{e.fk_col}; sample: {orphaned}"
                    )

    def deep_fk_check(self) -> dict[str, int]:
        """Whole-table FK audit (the reference's declarative constraint as
        an assertion): orphan count per edge; raises on any violation."""
        counts = {}
        for e in self.edges:
            n = fk_orphans(
                self.jobs[e.child].table.read(),
                self.jobs[e.parent].table.read(),
                e.fk_col,
                e.parent_key,
            ).count()
            counts[f"{e.child}.{e.fk_col}->{e.parent}.{e.parent_key}"] = n
        bad = {k: v for k, v in counts.items() if v}
        if bad:
            raise FKViolation(f"FK audit failed: {bad}")
        return counts

    # ---------------------------------------------------------------- driver

    def run_incremental(
        self,
        log: MultiTableLog,
        checkpoint: CheckpointStore,
        batch_lsns: int = 10_000,
        max_batches: int | None = None,
    ) -> list[WindowResult]:
        """LSN-windowed batches over the shared log; ONE checkpoint for the
        whole DAG. Kill it anywhere — mid-window, between tables — and the
        rerun reconverges (per-table fences make replayed merges no-ops)."""
        state = checkpoint.load()
        if state is not None and ("next_lsn" not in state or "bounds" in state):
            # e.g. a CDCApplyJob.run_incremental_balanced checkpoint —
            # silently re-windowing a foreign driver's state would crash
            # or replan from LSN 0 (reviewer finding); refuse up front
            raise ValueError(
                "checkpoint was not written by DagApplyJob.run_incremental; "
                "use the driver that owns it (or a fresh checkpoint path)"
            )
        state = state or {"batch_id": 0, "next_lsn": 0}
        results: list[WindowResult] = []
        hi_all = log.max_lsn() + 1
        while state["next_lsn"] < hi_all:
            if max_batches is not None and len(results) >= max_batches:
                break
            lo, hi = state["next_lsn"], state["next_lsn"] + batch_lsns
            window = log.lsn_range(lo, hi)
            results.append(self.apply_window(window, state["batch_id"], lo, hi))
            state = {"batch_id": state["batch_id"] + 1, "next_lsn": hi}
            checkpoint.save(state)
        return results

    def run_stream(
        self,
        log: MultiTableLog,
        checkpoint_dir: str,
        max_files_per_trigger: int = 4,
    ) -> list[WindowResult]:
        """Structured Streaming driver for the whole DAG: foreachBatch over
        the envelope log directory, availableNow trigger (bounded replay).
        Spark's file-source offsets define the micro-batches; each batch is
        applied to every table in FK order, so exactly-once comes from
        Spark offsets + the per-table writer fences (a replayed epoch
        fences every table's merge to a no-op).

        Epoch ids are Spark's own sequence, scoped to ONE stream
        checkpoint dir, so the fence namespace must be too: this driver
        fences under ``<writer_id>.stream.<stream_uid>.<table>``, where
        ``stream_uid`` is minted once per checkpoint dir (persisted in
        ``<dir>/engine_id``). Replays within a checkpoint reuse the uid
        (fences work); a FRESH checkpoint dir gets a fresh uid, so its
        restarted epoch-0 can never be fenced out by a previous stream's
        or driver's fence — the worst case is a convergent, LSN-guarded
        re-apply (reviewer finding: a shared namespace across checkpoint
        dirs silently dropped fresh events when epoch ids restarted).

        Requires the producer to land log segments in LSN order (see
        :meth:`MultiTableLog.read_stream`) so the per-window FK gates see
        parents before children; out-of-order EVENTS inside a segment are
        fine (LSN-guarded merge), out-of-order SEGMENTS are a producer
        bug this driver surfaces as an FKViolation rather than hiding."""
        import os

        from french_admin_etl_spark.streaming.checkpoint import stream_fence_uid

        stream_uid = stream_fence_uid(checkpoint_dir)
        results: list[WindowResult] = []

        def handle(df: DataFrame, epoch_id: int) -> None:
            df = df.persist()
            try:
                bounds = df.agg(
                    F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
                ).collect()[0]
                if bounds["lo"] is None:
                    return
                results.append(
                    self.apply_window(
                        df,
                        int(epoch_id),
                        int(bounds["lo"]),
                        int(bounds["hi"]) + 1,
                        fence_ns=f"{self.writer_id}.stream.{stream_uid}",
                    )
                )
            finally:
                df.unpersist()

        q = (
            log.read_stream(max_files_per_trigger)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", os.path.join(checkpoint_dir, "stream"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return results
