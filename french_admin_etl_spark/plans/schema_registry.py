"""Versioned schema registry — the reference's migration runner, generalized.

Reference: golang-migrate over ordered SQL files with a version-tracking
table (``internal/infrastructure/repository/run_migrations.go:16-80``,
invoked at startup from ``cmd/main.go:33-37``). Here: a JSON-file registry
of named schema versions + the evolution ops between them; ``ensure``
replays pending ops onto a LakeTable idempotently (same monotonic,
recorded-current-version contract).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from french_admin_etl_spark.table.lake_table import LakeTable, SchemaOp


class SchemaRegistry:
    def __init__(self, path: str):
        self.path = path
        if os.path.exists(path):
            with open(path) as fh:
                self._doc = json.load(fh)
        else:
            self._doc = {"versions": {}}  # version -> {"ops": [...]}

    def save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._doc, fh, indent=1)
        os.replace(tmp, self.path)

    def register(self, version: int, ops: list[SchemaOp]) -> None:
        """Record the ops that move a table from version-1 to version."""
        self._doc["versions"][str(version)] = {"ops": [o.to_dict() for o in ops]}
        self.save()

    def latest(self) -> int:
        vs = [int(v) for v in self._doc["versions"]]
        return max(vs) if vs else 1

    def ops_between(self, from_v: int, to_v: int) -> list[tuple[int, list[SchemaOp]]]:
        out = []
        for v in range(from_v + 1, to_v + 1):
            entry = self._doc["versions"].get(str(v))
            if entry is None:
                raise KeyError(f"registry missing version {v}")
            out.append((v, [SchemaOp.from_dict(d) for d in entry["ops"]]))
        return out

    def ensure(self, table: LakeTable, target_version: int | None = None) -> int:
        """Bring the table's schema to target (default latest). Idempotent —
        the run_migrations contract (run_migrations.go:64-77)."""
        target = target_version or self.latest()
        current = table.snapshot()["schema_version"]
        for _v, ops in self.ops_between(current, target):
            table.evolve(ops)
        return table.snapshot()["schema_version"]

    def schema_for(self, base: T.StructType, version: int) -> T.StructType:
        """U5 analog: compute the StructType at a registry version from the
        v1 base schema by replaying ops."""
        fields = {f.name: f for f in base.fields}
        order = [f.name for f in base.fields]
        for _v, ops in self.ops_between(1, version):
            for op in ops:
                if op.action == "add_column":
                    fields[op.name] = T.StructField(op.name, T._parse_datatype_string(op.type), True)
                    order.append(op.name)
                elif op.action == "widen":
                    fields[op.name] = T.StructField(
                        op.name, T._parse_datatype_string(op.type), True
                    )
                elif op.action == "rename_column":
                    f = fields.pop(op.from_name)
                    fields[op.to_name] = T.StructField(op.to_name, f.dataType, True)
                    order[order.index(op.from_name)] = op.to_name
        return T.StructType([fields[n] for n in order])
