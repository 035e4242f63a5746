"""Incrementally-maintained JOIN views over CDC-fed tables.

``JoinView`` keeps ``SELECT l.*, r.<picked> FROM left l LEFT JOIN right r
ON l.fk = r.key`` continuously up-to-date as BOTH sides change — the
dimension-enrichment half of materialized-view maintenance (Materialize
delta joins / Flink temporal joins), and the reference's own enrichment
shape: communes are stored with their department AND region codes
denormalized onto the row (``internal/infrastructure/repository/
commune_repository.go:40-46`` upserts code_insee_departement and
code_insee_region beside each commune). Here that enrichment is a TABLE
kept fresh by CDC instead of a per-import denormalized write.

Maintenance is O(changed keys + dimension fan-out), never O(left table):

- **left deltas** (``left.changes()``): each changed key's view row is
  recomputed against the dimension and upserted; deletes ride through as
  deletes. The window IS the work — no scan of either table beyond the
  touched keys' buckets.
- **right deltas** (``right.changes()``): the changed dimension keys are
  broadcast-semi-joined against the left table to find the rows that
  reference them (the fan-out), and those are recomputed. The probe
  reads only the fk + key columns (column-pruned scan); passing a
  ``fk_index`` (:class:`~french_admin_etl_spark.operators.
  secondary_index.SecondaryIndex` on the fk columns) replaces the scan
  with a probe of the narrow value-clustered index table — the sublinear
  path a 100-TB fact table needs.

Exactly-once: each sync's merge is fenced by ``batch_id = l_version +
r_version`` (strictly increasing across effective syncs) under the
view's writer namespace, and both synced-version markers ride the SAME
commit — a crash anywhere replays the window idempotently. When either
side's window is unrecoverable (folded by compaction / coalesce deltas),
the view falls back to a full recompute-and-overwrite resync, always
correct. Because the view is itself a MOR LakeTable written through
``merge``, its own ``changes()`` windows feed further consumers — join
views CHAIN (commune→department, then that→region: the reference's
3-level COG hierarchy as two maintained hops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from french_admin_etl_spark.operators.secondary_index import SecondaryIndex
from french_admin_etl_spark.table.lake_table import LakeTable, _bucket_expr


class JoinView:
    def __init__(
        self,
        spark: SparkSession,
        left: LakeTable,
        right: LakeTable,
        view: LakeTable,
        on: list[tuple[str, str]],
        select: dict[str, str],
        writer_id: str = "joinview",
        fk_index: SecondaryIndex | None = None,
    ):
        """``on`` — (left_fk_col, right_key_col) pairs; must cover the
        right table's key columns exactly. ``select`` — view column →
        right column to denormalize onto the left rows (NULL when the fk
        is null or dangling — same null-out contract as ``fk_validate``).

        ``fk_index`` — optional secondary index on the left fk columns;
        MUST be synced to at least the left table's current version
        before each ``sync()`` (a stale index misses fan-out rows).
        Omit when unsure: the fallback probe scans left (column-pruned),
        which is always correct."""
        self.spark = spark
        self.left = left
        self.right = right
        self.view = view
        self.on = list(on)
        self.select = dict(select)
        self.writer_id = writer_id
        self.fk_index = fk_index
        rkeys = right.snapshot()["key_cols"]
        if sorted(r for _, r in on) != sorted(rkeys):
            raise ValueError(
                f"on={on!r} must cover the right key columns {rkeys!r} exactly"
            )
        if fk_index is not None:
            fks = [l for l, _ in on]
            if sorted(fk_index.columns) != sorted(fks):
                raise ValueError(
                    f"fk_index covers {fk_index.columns!r}, join needs {fks!r}"
                )
        self._synced_l = f"joinview.synced_left.{writer_id}"
        self._synced_r = f"joinview.synced_right.{writer_id}"

    # ------------------------------------------------------------- create

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        left: LakeTable,
        right: LakeTable,
        root: str,
        on: list[tuple[str, str]],
        select: dict[str, str],
        num_buckets: int | None = None,
        writer_id: str = "joinview",
        fk_index: SecondaryIndex | None = None,
    ) -> "JoinView":
        """Create the backing view table: the left table's logical schema
        plus the selected right columns (typed from the right schema),
        keyed by the LEFT keys, MOR (view writes are delta appends)."""
        lsnap, rsnap = left.snapshot(), right.snapshot()
        lfields = [
            T.StructField.fromJson(f)
            for f in lsnap["schemas"][str(lsnap["schema_version"])]["fields"]
        ]
        rtypes = {
            f["name"]: T.StructField.fromJson(f).dataType
            for f in rsnap["schemas"][str(rsnap["schema_version"])]["fields"]
        }
        names = {f.name for f in lfields}
        for out, src in select.items():
            if out in names or out in ("lsn", "op"):
                raise ValueError(f"view column {out!r} collides")
            if src not in rtypes:
                raise ValueError(f"right column {src!r} does not exist")
            names.add(out)
            lfields.append(T.StructField(out, rtypes[src], True))
        view = LakeTable.create(
            spark,
            root,
            T.StructType(lfields),
            key_cols=list(lsnap["key_cols"]),
            num_buckets=num_buckets or lsnap["num_buckets"],
            write_mode="mor",
        )
        return cls(spark, left, right, view, on, select, writer_id, fk_index)

    # --------------------------------------------------------------- sync

    def synced_versions(self) -> tuple[int, int]:
        props = self.view.snapshot()["properties"]
        return (
            int(props.get(self._synced_l, 0)),
            int(props.get(self._synced_r, 0)),
        )

    def _enrich(self, left_rows: DataFrame, r_version: int) -> DataFrame:
        """left rows ⟕ right@r_version with the selected columns appended.
        Dimension-join shape: Catalyst/AQE broadcasts the dimension when
        it fits; nulls for unmatched/null fks."""
        lcols = left_rows.columns
        need = sorted({r for _, r in self.on} | set(self.select.values()))
        r = self.right.read(version=r_version).select(
            *[F.col(c).alias(f"_r_{c}") for c in need]
        )
        cond = None
        for lc, rc in self.on:
            c = F.col(lc) == F.col(f"_r_{rc}")
            cond = c if cond is None else (cond & c)
        out = left_rows.join(r, on=cond, how="left")
        return out.select(
            *lcols, *[F.col(f"_r_{src}").alias(v) for v, src in self.select.items()]
        )

    def _full(self, l_version: int, r_version: int) -> DataFrame:
        return self._enrich(self.left.read(version=l_version), r_version)

    def sync(self) -> dict:
        """Advance the view to both sources' current versions."""
        from_l, from_r = self.synced_versions()
        to_l = self.left.current_version()
        to_r = self.right.current_version()
        if to_l <= from_l and to_r <= from_r:
            return {"mode": "noop", "left": (from_l, to_l), "right": (from_r, to_r)}
        if from_l == 0 and from_r == 0:
            self.view.overwrite(
                self._full(to_l, to_r),
                extra_properties={self._synced_l: to_l, self._synced_r: to_r},
            )
            return {"mode": "bootstrap", "left": (0, to_l), "right": (0, to_r)}
        try:
            dl = (
                self.left.changes(from_l, to_l)
                if to_l > from_l
                else None
            )
            dr = (
                self.right.changes(from_r, to_r)
                if to_r > from_r
                else None
            )
        except ValueError:
            # a window was folded away (compaction/rebucket/overwrite) or
            # carries coalesce deltas — recompute from scratch
            return self._resync(to_l, to_r)

        lkeys = self.left.snapshot()["key_cols"]
        fks = [lc for lc, _ in self.on]
        # ONE maintenance scan: the left window's changed keys (with their
        # delete flag) and the dimension fan-out probe union into a single
        # per-key frame that is checkpointed ONCE — previously the left
        # window and the affected-key union were two separate checkpoint
        # jobs (round-3 verdict: per-sync fixed cost is the bench's only
        # amortize-not-shrink number). The bucket/delete summary is then a
        # trivial aggregate over the already-materialized partitions.
        key_parts = []
        if dl is not None:
            key_parts.append(dl.select(*lkeys, F.col("_deleted")))
        if dr is not None:
            # fan-out probe: left keys referencing a changed dimension key.
            # changes() is per-key deduped, so cr is O(window) — broadcast.
            cr = dr.select(
                *[F.col(rc).alias(f"_c_{rc}") for _, rc in self.on]
            ).distinct()
            probe = (
                self.fk_index.table.read()
                if self.fk_index is not None
                else self.left.read(version=to_l).select(*lkeys, *fks)
            )
            cond = None
            for lc, rc in self.on:
                c = F.col(lc) == F.col(f"_c_{rc}")
                cond = c if cond is None else (cond & c)
            key_parts.append(
                probe.join(F.broadcast(cr), on=cond, how="left_semi")
                .select(*lkeys)
                .withColumn("_deleted", F.lit(False))
            )
        changed = key_parts[0]
        for p in key_parts[1:]:
            changed = changed.unionByName(p)
        # one row per key. A key deleted in the left window cannot also be
        # a live fan-out hit (the probe reads live rows / a synced index),
        # but max() keeps the fold safe either way: delete wins.
        changed = (
            changed.groupBy(*lkeys)
            .agg(F.max("_deleted").alias("_deleted"))
            .localCheckpoint(eager=True)
        )

        # bucket-restricted read of the affected left rows (≤ num_buckets
        # ints through the driver — the COW-merge bounded collect); reads
        # the checkpointed partitions, no lineage recompute
        nb = self.left.snapshot(to_l)["num_buckets"]
        summary = (
            changed.groupBy(
                F.when(~F.col("_deleted"), _bucket_expr(lkeys, nb)).alias("_b")
            )
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        touched = sorted(r["_b"] for r in summary if r["_b"] is not None)
        n_dels = sum(r["_n"] for r in summary if r["_b"] is None)
        affected = changed.filter(~F.col("_deleted")).select(*lkeys)
        deletes = changed.filter(F.col("_deleted")).select(*lkeys) if n_dels else None
        seq = to_l + to_r
        parts = []
        if touched:
            # the affected-keys semi join rides BELOW the MOR resolution
            # (``key_filter``): the resolution shuffle moves only the
            # changed keys' physical rows, not the whole touched bucket —
            # the same pre-resolution pruning the DAG FK gate uses, and
            # the difference between O(changed keys) and O(bucket) on a
            # 100-TB fact table. ``affected`` is window-sized and already
            # checkpointed → broadcast.
            lsnap_to = self.left.snapshot(to_l)
            live = (
                self.left.read_raw(
                    buckets=touched, version=to_l,
                    key_filter=F.broadcast(affected),
                )
                .filter(~F.col("_deleted"))
                .select(*[f["name"] for f in lsnap_to["schemas"][
                    str(lsnap_to["schema_version"])]["fields"]])
            )
            up = self._enrich(live, to_r).withColumn("op", F.lit("U"))
            parts.append(up)
        if deletes is not None:
            vsnap = self.view.snapshot()  # once, not twice per comprehension
            vcols = [
                f["name"]
                for f in vsnap["schemas"][str(vsnap["schema_version"])]["fields"]
            ]
            dd = deletes
            for c in vcols:
                if c not in lkeys:
                    dd = dd.withColumn(c, F.lit(None))
            parts.append(dd.select(*vcols).withColumn("op", F.lit("D")))
        if not parts:
            return self._mark_synced(to_l, to_r, "empty")
        src = parts[0]
        for p in parts[1:]:
            src = src.unionByName(p)
        src = src.withColumn("lsn", F.lit(seq).cast("long"))
        stats = self.view.merge(
            src,
            batch_id=seq,
            writer_id=self.writer_id,
            extra_properties={self._synced_l: to_l, self._synced_r: to_r},
        )
        if stats.buckets_touched == 0 and not stats.fenced:
            # every part was empty at runtime (e.g. the fan-out probe
            # matched nothing): the merge skipped its commit, so the
            # markers need their own metadata-only advance
            return self._mark_synced(to_l, to_r, "empty")
        return {
            "mode": "incremental",
            "left": (from_l, to_l),
            "right": (from_r, to_r),
            "fenced": stats.fenced,
            "upserts": stats.rows_upserted,
            "deletes": stats.rows_deleted,
        }

    def _resync(self, to_l: int, to_r: int) -> dict:
        self.view.overwrite(
            self._full(to_l, to_r),
            extra_properties={self._synced_l: to_l, self._synced_r: to_r},
        )
        return {"mode": "resync", "left": to_l, "right": to_r}

    def _mark_synced(self, to_l: int, to_r: int, mode: str) -> dict:
        def mutate(props: dict) -> dict | None:
            cur_l = int(props.get(self._synced_l, 0))
            cur_r = int(props.get(self._synced_r, 0))
            if cur_l >= to_l and cur_r >= to_r:
                return None  # a racing sync already advanced the markers
            # per-marker MAX, never a blind set: a racing sync that read
            # one side further ahead must not be REGRESSED by this one
            # (review finding — both-behind guard + both-set write could
            # record a mixed state matching no actual sync, forcing a
            # wasted re-apply or a spurious resync next time)
            props[self._synced_l] = max(cur_l, to_l)
            props[self._synced_r] = max(cur_r, to_r)
            return props

        self.view.update_properties(mutate)
        return {"mode": mode, "left": to_l, "right": to_r}

    # --------------------------------------------------------------- read

    def read(self) -> DataFrame:
        """The maintained join — live rows of the backing table."""
        return self.view.read()
