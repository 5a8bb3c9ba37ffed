"""Pipeline + table state tracking.

Reference: PipelineStateService (save-on-change),
/root/reference/delta-app/src/main/java/io/cdap/delta/app/
PipelineStateService.java:58-127; states PipelineState ∈ {OK, FAILING},
TableState ∈ {SNAPSHOTTING, REPLICATING, FAILING} (TableState.java:22-26).

Stored as one JSON doc per pipeline under the table's metadata dir,
rewritten only when the state actually changes (the reference's
save-on-change), readable while the pipeline runs.
"""

from __future__ import annotations

import json
import os
import time

PIPELINE_OK = "OK"
PIPELINE_FAILING = "FAILING"
TABLE_SNAPSHOTTING = "SNAPSHOTTING"
TABLE_REPLICATING = "REPLICATING"
TABLE_FAILING = "FAILING"


class StateStore:
    def __init__(self, table_path: str, pipeline_name: str):
        self.path = os.path.join(table_path, "metadata", f"state-{pipeline_name}.json")
        self._cur: dict | None = None

    def read(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {"pipeline": PIPELINE_OK, "tables": {}, "error": None, "updated_ms": 0}

    def _save(self, st: dict) -> None:
        st = dict(st, updated_ms=int(time.time() * 1000))
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self.path)
        self._cur = st

    def _update(self, **changes) -> None:
        st = self._cur or self.read()
        new = dict(st)
        tables = dict(new["tables"])
        if "table" in changes:
            tables[changes.pop("table")] = changes.pop("table_state")
        new["tables"] = tables
        new.update(changes)
        # save-on-change only (reference :107-121); first touch always
        # persists so the state is observable
        if not os.path.exists(self.path) or {
            k: v for k, v in new.items() if k != "updated_ms"
        } != {k: v for k, v in st.items() if k != "updated_ms"}:
            self._save(new)

    def set_snapshotting(self, table: str) -> None:
        self._update(table=table, table_state=TABLE_SNAPSHOTTING)

    def set_replicating(self, table: str) -> None:
        self._update(table=table, table_state=TABLE_REPLICATING)

    def set_table_failing(self, table: str) -> None:
        self._update(table=table, table_state=TABLE_FAILING)

    def set_ok(self) -> None:
        self._update(pipeline=PIPELINE_OK, error=None)

    def set_failing(self, error: str) -> None:
        self._update(pipeline=PIPELINE_FAILING, error=str(error)[:2000])
