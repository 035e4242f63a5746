"""T7: atomic checkpoint store for the incremental batch driver.

The reference has no checkpointing (whole-file rerun is its recovery,
SURVEY §2.9 T7); the engine checkpoints (batch_id, next_lsn) after every
committed batch. Crash *between* table commit and checkpoint write is the
classic exactly-once hole — closed by the table-side batch fence
(``LakeTable.merge(batch_id=...)``), so the checkpoint only needs
atomic-replace durability, not transactionality.
"""

from __future__ import annotations

import json
import os


class CheckpointStore:
    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as fh:
            return json.load(fh)

    def save(self, state: dict) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self.path)  # atomic on POSIX
