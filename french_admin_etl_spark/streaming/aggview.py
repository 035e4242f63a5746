"""Incrementally-maintained aggregate views over a CDC-fed MOR table.

``AggregateView`` keeps ``SELECT group_cols, count(*) AS cnt, sum(x)...
GROUP BY group_cols`` over a source table's LIVE rows continuously
up-to-date WITHOUT rescanning the source — the materialized-view
maintenance problem (Materialize / Flink dynamic tables / Delta MV), built
from two existing engine pieces:

- the source's ``changes(from_v, to_v)`` CDF read supplies the AFTER
  image of every key that changed in the window;
- the BEFORE image comes from time travel: the source at ``from_v``,
  read only for the touched buckets (bucket-pruned, same trick as the
  COW merge) and semi-joined to the changed keys.

Every changed key contributes a RETRACTION of its old contribution
(cnt −1, sums −old) if it was live at ``from_v``, and an INSERTION
(+1, +new) if it is live at ``to_v``. The net per-group increments land
in an ADDITIVE LakeTable (``merge_add``) whose reads resolve SUM per key
— so the view write is O(changed keys), never O(groups) or O(source).

Exactly-once: the increment batch is fenced by ``batch_id = to_version``
under the view's writer namespace, and the synced-source-version marker
is written in the SAME commit — a crash anywhere replays the window and
either fences out (already applied) or recomputes identically. When the
window's deltas were compacted away (or the source merges in coalesce
mode), ``changes()`` refuses and the view falls back to a full resync —
recompute-and-overwrite, always correct.

Groups whose count reaches zero stay as cnt=0 rows until compaction;
``read()`` filters them (count-based liveness, as Materialize does).

Reference parity: the reference recomputes its per-run aggregates from
scratch each import (``internal/processor/csv_processor.go:75-95``'s
processed/failed batch counters, re-accumulated on every run); this
maintains them continuously at 10^10-event scale — part of the engine
surface beyond the reference, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.table.lake_table import LakeTable, _bucket_expr


class AggregateView:
    def __init__(
        self,
        spark: SparkSession,
        source: LakeTable,
        view: LakeTable,
        group_cols: list[str],
        sums: dict[str, str] | None = None,
        mins: dict[str, str] | None = None,
        maxs: dict[str, str] | None = None,
        writer_id: str = "aggview",
    ):
        """``sums`` maps view output columns to source numeric columns
        (summed over live rows; SQL SUM semantics — nulls contribute 0).
        The count column ``cnt`` is always maintained: it is what decides
        group liveness.

        ``mins``/``maxs`` add MIN/MAX aggregates with the Materialize-style
        MONOTONIC fast path: min/max combine under insertion but cannot be
        retracted incrementally (the retracted value might BE the current
        extreme, and the runner-up is not in the view's state). So windows
        containing only inserts of NEW keys maintain min/max by combining
        — the append-only common case of a CDC log — and any window with a
        delete or an update of a live key falls back to the full-resync
        path (recompute-and-overwrite, always correct). Count/sum-only
        views never take that hit; declare min/max only when needed."""
        self.spark = spark
        self.source = source
        self.view = view
        self.group_cols = list(group_cols)
        self.sums = dict(sums or {})
        self.mins = dict(mins or {})
        self.maxs = dict(maxs or {})
        overlap = (
            set(self.group_cols) | {"cnt"} | set(self.sums) | set(self.mins) | set(self.maxs)
        )
        if len(overlap) != (
            len(self.group_cols) + 1 + len(self.sums) + len(self.mins) + len(self.maxs)
        ):
            raise ValueError(
                "output column collision across group_cols/cnt/sums/mins/maxs: "
                f"groups={sorted(self.group_cols)} sums={sorted(self.sums)} "
                f"mins={sorted(self.mins)} maxs={sorted(self.maxs)}"
            )
        self.writer_id = writer_id
        self._synced_key = f"aggview.synced.{writer_id}"
        # per-sum accumulation type, read from the VIEW's declared schema
        # (create() types integer-source sums as bigint): integer sums
        # accumulate as long end-to-end — a double accumulator silently
        # loses exactness past 2^53 before merge_add casts back to long
        vfields: dict = {}
        if view is not None and self.sums:
            vsnap = view.snapshot()
            vfields = {
                f["name"]: f["type"]
                for f in vsnap["schemas"][str(vsnap["schema_version"])]["fields"]
            }
        self._sum_cast = {
            out: ("long" if vfields.get(out) == "long" else "double") for out in self.sums
        }

    # ------------------------------------------------------------- create

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        source: LakeTable,
        root: str,
        group_cols: list[str],
        sums: dict[str, str] | None = None,
        mins: dict[str, str] | None = None,
        maxs: dict[str, str] | None = None,
        num_buckets: int = 16,
        writer_id: str = "aggview",
    ) -> "AggregateView":
        """Create the backing additive table: group cols typed from the
        source's logical schema; ``cnt`` bigint; sum columns bigint for
        integer sources, double otherwise; min/max columns keep the
        source column's own type (min/max never widen) and register their
        combine function as ``additive.agg.<col>`` table properties."""
        snap = source.snapshot()
        fields = {f["name"]: f["type"] for f in snap["schemas"][str(snap["schema_version"])]["fields"]}
        cols = [
            T.StructField(g, _src_type(fields, g), True) for g in group_cols
        ]
        cols.append(T.StructField("cnt", T.LongType(), True))
        for out, src_col in (sums or {}).items():
            st = _src_type(fields, src_col)
            num = st if isinstance(st, (T.LongType, T.IntegerType, T.ShortType)) else None
            cols.append(
                T.StructField(out, T.LongType() if num is not None else T.DoubleType(), True)
            )
        props: dict = {"resolution": "additive"}
        for out, src_col in {**(mins or {}), **(maxs or {})}.items():
            cols.append(T.StructField(out, _src_type(fields, src_col), True))
        for out in (mins or {}):
            props[f"additive.agg.{out}"] = "min"
        for out in (maxs or {}):
            props[f"additive.agg.{out}"] = "max"
        view = LakeTable.create(
            spark,
            root,
            T.StructType(cols),
            key_cols=list(group_cols),
            num_buckets=num_buckets,
            write_mode="mor",
            properties=props,
        )
        return cls(spark, source, view, group_cols, sums, mins, maxs, writer_id)

    # --------------------------------------------------------------- sync

    def synced_version(self) -> int:
        v = self.view.snapshot()["properties"].get(self._synced_key)
        return int(v) if v is not None else 0

    def _contrib(self, rows: DataFrame, sign: int) -> DataFrame:
        """Per-row view contribution with the given sign (+1 insert /
        −1 retract)."""
        out = [F.col(g) for g in self.group_cols]
        out.append(F.lit(sign).cast("long").alias("cnt"))
        for col_out, col_src in self.sums.items():
            # accumulate in the view column's own family: long for integer
            # sources (exact), double only for fractional ones
            ct = self._sum_cast[col_out]
            zero = F.lit(0).cast(ct)
            out.append(
                (F.lit(sign).cast(ct) * F.coalesce(F.col(col_src).cast(ct), zero)).alias(
                    col_out
                )
            )
        for col_out, col_src in {**self.mins, **self.maxs}.items():
            # min/max contributions exist only for insertions; the sync
            # path guarantees sign=-1 never reaches a min/max view
            # (retractions force a resync), but emit NULL defensively —
            # F.min/F.max ignore nulls, so a stray retraction row can
            # never fabricate an extreme
            # F.when with no otherwise = typed NULL of col_src's own type
            # (keeps the retract/insert unionByName type-aligned)
            out.append(
                (F.col(col_src) if sign > 0 else F.when(F.lit(False), F.col(col_src))).alias(
                    col_out
                )
            )
        return rows.select(*out)

    def _increments(self, contribs: DataFrame) -> DataFrame:
        agg = [F.sum("cnt").alias("cnt")]
        nonzero = F.col("cnt") != 0
        for col_out in self.sums:
            agg.append(F.sum(col_out).alias(col_out))
            nonzero = nonzero | (F.col(col_out) != 0)
        for col_out in self.mins:
            agg.append(F.min(col_out).alias(col_out))
        for col_out in self.maxs:
            agg.append(F.max(col_out).alias(col_out))
        return contribs.groupBy(*self.group_cols).agg(*agg).filter(nonzero)

    def sync(self) -> dict:
        """Advance the view to the source's current version. Returns a
        small report dict. Idempotent: replaying a window fences out."""
        from_v = self.synced_version()
        to_v = self.source.current_version()
        if to_v <= from_v:
            return {"from": from_v, "to": to_v, "mode": "noop"}
        if from_v == 0:
            return self._bootstrap(to_v)
        try:
            changed = self.source.changes(from_v, to_v)
        except ValueError:
            # window folded by compaction (or coalesce deltas): the
            # increments are unrecoverable — full resync, always correct
            return self._resync(to_v)
        snap = self.source.snapshot(to_v)
        keys, nb = snap["key_cols"], snap["num_buckets"]
        changed = changed.localCheckpoint(eager=True)  # one CDF scan, reused 3x
        # touched buckets: ≤ num_buckets ints through the driver — the
        # same bounded collect the COW merge uses
        touched = sorted(
            r[0]
            for r in changed.select(_bucket_expr(keys, nb).alias("_b")).distinct().collect()
        )
        if not touched:
            # no data change in the window (metadata-only commits): advance
            # the sync marker with a property-only commit
            return self._mark_synced(from_v, to_v, "empty")
        try:
            # the BEFORE image time-travels to from_v; expire_snapshots
            # (routine maintenance) may have dropped that snapshot — a
            # lagging view must fall back to resync, not wedge on
            # FileNotFoundError forever (ADVICE round-3 medium finding)
            # the changed-keys semi join rides BELOW the MOR resolution
            # (``key_filter``): the before-image shuffle moves only the
            # window's keys' physical rows, not the whole touched bucket.
            # ``changed`` is window-sized and checkpointed → broadcast.
            before = self.source.read_raw(
                buckets=touched, version=from_v,
                key_filter=F.broadcast(changed.select(*keys)),
            )
        except FileNotFoundError:
            return self._resync(to_v)
        old_live = before.filter(~F.col("_deleted"))
        new_live = changed.filter(~F.col("_deleted"))
        if self.mins or self.maxs:
            # min/max cannot retract incrementally (the retracted value
            # might be the current extreme; its runner-up is not in view
            # state). Monotonic fast path: a window of pure NEW-key
            # inserts combines min/max like any other increment; any
            # delete or update-of-a-live-key forces the full resync.
            monotonic = (
                changed.filter(F.col("_deleted")).limit(1).count() == 0
                and old_live.limit(1).count() == 0
            )
            if not monotonic:
                return self._resync(to_v)
        inc = self._increments(
            self._contrib(old_live, -1).unionByName(self._contrib(new_live, +1))
        )
        stats = self.view.merge_add(
            inc,
            batch_id=to_v,
            writer_id=self.writer_id,
            lsn=to_v,
            extra_properties={self._synced_key: to_v},
        )
        if stats.buckets_touched == 0 and not stats.fenced:
            # every increment netted to zero (e.g. an update that changed
            # neither group nor summed values): nothing staged, so the
            # marker needs its own property-only commit
            return self._mark_synced(from_v, to_v, "net-zero")
        return {
            "from": from_v,
            "to": to_v,
            "mode": "incremental",
            "fenced": stats.fenced,
            "increment_rows": stats.rows_upserted,
        }

    def _bootstrap(self, to_v: int) -> dict:
        live = self.source.read(version=to_v)
        inc = self._increments(self._contrib(live, +1))
        stats = self.view.merge_add(
            inc,
            batch_id=to_v,
            writer_id=self.writer_id,
            lsn=to_v,
            extra_properties={self._synced_key: to_v},
        )
        if stats.buckets_touched == 0 and not stats.fenced:
            return self._mark_synced(0, to_v, "bootstrap-empty")
        return {"from": 0, "to": to_v, "mode": "bootstrap", "fenced": stats.fenced}

    def _resync(self, to_v: int) -> dict:
        """Recompute from scratch and overwrite — the fallback when the
        incremental window is unrecoverable. Idempotent (same input →
        same state); the synced marker rides the overwrite commit."""
        from_v = self.synced_version()
        live = self.source.read(version=to_v)
        full = self._increments(self._contrib(live, +1))
        self.view.overwrite(full, extra_properties={self._synced_key: to_v})
        return {"from": from_v, "to": to_v, "mode": "resync"}

    def _mark_synced(self, from_v: int, to_v: int, mode: str) -> dict:
        """Advance the marker with a metadata-only commit (bounded retry
        against concurrent view writers)."""
        from french_admin_etl_spark.table.lake_table import CommitConflict

        for attempt in range(10):
            if self.synced_version() >= to_v:
                break
            snap = self.view.snapshot()
            new = dict(snap)
            props = dict(snap["properties"])
            props[self._synced_key] = to_v
            new.update(version=snap["version"] + 1, properties=props, parent=snap["version"])
            try:
                self.view._commit(new)
                break
            except CommitConflict:
                if attempt == 9:
                    raise
        return {"from": from_v, "to": to_v, "mode": mode}

    # --------------------------------------------------------------- read

    def read(self) -> DataFrame:
        """The view's live groups (cnt > 0) — additive resolution
        underneath, zero-count (fully retracted) groups filtered out."""
        return self.view.read().filter(F.col("cnt") > 0)


def _src_type(fields: dict, name: str) -> T.DataType:
    if name not in fields:
        raise ValueError(f"source has no column {name!r}")
    return _parse(fields[name])


def _parse(tj) -> T.DataType:
    from french_admin_etl_spark.table.lake_table import _parse_type_json

    return _parse_type_json(tj)
