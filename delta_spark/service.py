"""Read-only diagnostics + assessment HTTP service (stdlib only).

The reference runs a REST service beside the worker: assessment
endpoints (AssessmentHandler.java — v1/contexts/{ctx}/assessTable,
assessPipeline, listTables, describeTable) and offset/state lookups
(OffsetStateHandler.java — .../generations/{gen}/instances/{id}/offset
and /states/{state}). The CDAP draft/remote-task plumbing around those
handlers is platform machinery (SURVEY.md §7.4), but the *observable
surface* — "ask a running deployment what it replicates, how far it
has gotten, and whether a schema would be supported" — is engine
function, rebuilt here as a small ``http.server`` app over the same
on-disk artifacts the engine maintains:

  GET  /health
  GET  /v1/tables                      catalog listing (listTables)
  GET  /v1/tables/{name}               schema + snapshot summary (describeTable)
  GET  /v1/tables/{name}/offsets[?writer=]   last committed seq per
       writer — OffsetStateHandler.getOffset over snapshot summaries
  GET  /v1/tables/{name}/state[?pipeline=]   pipeline/table state doc
       (SNAPSHOTTING / REPLICATING / FAILING — getState analog)
  GET  /v1/tables/{name}/lineage       per-batch commit lineage records
  POST /v1/assessTable                 {"fields": [{"name","type"}],
       "key_cols": [...], "table": optional} → column support merge
  POST /v1/assessPipeline              {"tables": {name: {...}}}

Deliberately Spark-free: every answer is derived from the JSON
metadata/state/lineage documents the engine commits (the same
decoupling as the reference, whose handlers read the SQL state store,
not the worker). Start it next to — or long after — a pipeline run.
"""

from __future__ import annotations

import glob
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import types as T

from .assess import assess_pipeline, assess_table
from .catalog import Catalog
from .lake.table import LakeTable

_SCALARS = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
}


def _parse_type(s: str) -> T.DataType:
    """Parse a DDL-ish type string without a JVM (fromDDL needs a
    session): scalars, decimal(p,s), array<t>, map<k,v>."""
    s = s.strip()
    if s in _SCALARS:
        return _SCALARS[s]
    if s.startswith("decimal(") and s.endswith(")"):
        p, sc = (int(x) for x in s[len("decimal("):-1].split(","))
        return T.DecimalType(p, sc)
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(_parse_type(s[len("array<"):-1]))
    if s.startswith("map<") and s.endswith(">"):
        inner, depth, cut = s[len("map<"):-1], 0, None
        for i, ch in enumerate(inner):  # split on the top-level comma
            depth += ch in "<("
            depth -= ch in ">)"
            if ch == "," and depth == 0:
                cut = i
                break
        if cut is None:
            raise ValueError(f"bad map type {s!r}")
        return T.MapType(_parse_type(inner[:cut]), _parse_type(inner[cut + 1:]))
    raise ValueError(f"unsupported type string {s!r}")


def _schema_from_fields(fields: list[dict]) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f["name"], _parse_type(f["type"]), f.get("nullable", True))
            for f in fields
        ]
    )


def _load_table_meta(path: str) -> dict:
    from .lake.interop import read_metadata

    return read_metadata(path)


class DiagnosticsService:
    """Serve diagnostics for the tables under a catalog root (multi-
    table layout) and/or an explicit {name: table_path} map."""

    def __init__(
        self,
        catalog_root: str | None = None,
        tables: dict[str, str] | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.catalog_root = catalog_root
        self.tables = dict(tables or {})
        self.host, self.port = host, port
        self._httpd: ThreadingHTTPServer | None = None

    # ------------------------------------------------------ resolution

    def _table_paths(self) -> dict[str, str]:
        out = dict(self.tables)
        if self.catalog_root:
            meta = Catalog._read_meta(self.catalog_root)
            for name, ent in meta["tables"].items():
                out[name] = os.path.join(self.catalog_root, ent["dir"])
        return out

    def _describe(self, name: str, path: str) -> dict:
        m = _load_table_meta(path)
        cur = m["schemas"][str(m["schema_version"])]
        snaps = m["snapshots"]
        by_id = {f["id"]: f["name"] for f in cur}
        return {
            "name": name,
            "path": path,
            "schema_version": m["schema_version"],
            "fields": cur,
            "key_cols": [by_id[i] for i in m["key_ids"]],
            "bucket_col": by_id[m["bucket_id"]],
            "num_buckets": m["num_buckets"],
            "bucket_spec_id": m.get("bucket_spec_id", 0),
            "bucket_specs": m.get("bucket_specs", {"0": m["num_buckets"]}),
            # files still on a pre-rebucket spec (migrated by compact)
            "foreign_spec_files": self._foreign_spec_files(m, path),
            "snapshots": len(snaps),
            "current_snapshot_id": m["current_snapshot_id"],
            # named refs (Iceberg tags/branches): what an operator asks
            # a deployment before expiring or publishing anything
            "tags": {k: int(v) for k, v in m.get("tags", {}).items()},
            "branches": {
                k: (int(v["head"]) if isinstance(v, dict) else int(v))
                for k, v in m.get("branches", {}).items()
            },
            "last_commit": snaps[-1]["summary"] if snaps else None,
            # bad-deploy drill state (jobs/rollback_table.py): snapshots
            # whose exactly-once markers were revoked by a rollback —
            # still time-travelable until expiry, never replay-skipped
            "rolled_back_snapshots": [
                int(s["id"]) for s in snaps if s.get("rolled_back")
            ],
        }

    @staticmethod
    def _foreign_spec_files(m: dict, path: str) -> int:
        from .lake.interop import resolve_snapshot

        snap = resolve_snapshot(m, path)
        if snap is None:
            return 0
        cur_spec = int(m.get("bucket_spec_id", 0))
        return sum(1 for f in snap["files"] if int(f.get("spec", 0)) != cur_spec)

    @staticmethod
    def _offsets(meta: dict, writer: str | None) -> dict:
        """Last committed seq per writer (OffsetStateHandler.getOffset
        analog: the snapshot summaries ARE the offset store)."""
        seqs: dict[str, int] = {}
        for s in meta["snapshots"]:
            if s.get("rolled_back"):
                # revoked by a rollback drill: the engine's
                # last_committed_seq ignores these, so the offset the
                # service reports must fall back the same way
                continue
            w, mx = s["summary"].get("writer-id"), s["summary"].get("max-seq")
            if w is None or mx is None:
                continue
            seqs[w] = max(seqs.get(w, -1), int(mx))
        if writer is not None:
            return {"writer_id": writer, "max_seq": seqs.get(writer, -1)}
        return {"writers": seqs}

    @staticmethod
    def _state(path: str, pipeline: str) -> dict:
        p = os.path.join(path, "metadata", f"state-{pipeline}.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"pipeline": "OK", "tables": {}, "error": None, "updated_ms": 0}

    @staticmethod
    def _plan(path: str, q: dict) -> dict:
        """Dry-run scan planning from manifest column-bounds stats
        (Iceberg's plan-files surface as a diagnostics endpoint): how
        many files would a range read open, without opening any."""
        from .lake.interop import resolve_snapshot
        from .lake.stats import prune_files

        m = _load_table_meta(path)
        snap = resolve_snapshot(m, path)
        files = snap["files"] if snap else []
        cur = m["schemas"][str(m["schema_version"])]
        col = q["col"]
        fld = next((f for f in cur if f["name"] == col), None)
        if fld is None:
            raise KeyError(f"no column {col}")

        def conv(s):
            if s is None:
                return None
            t = fld["type"]
            if t in ("int", "bigint", "smallint", "tinyint"):
                return int(s)
            if t in ("float", "double"):
                return float(s)
            if t == "timestamp":
                import datetime as dt

                return dt.datetime.fromisoformat(s)
            return s

        planned = prune_files(
            files, cur, m["key_ids"], {col: (conv(q.get("lo")), conv(q.get("hi")))}
        )
        return {
            "column": col,
            "lo": q.get("lo"),
            "hi": q.get("hi"),
            "files_total": len(files),
            "files_planned": len(planned),
            "files_skipped": len(files) - len(planned),
            "rows_planned": sum(f.get("rows") or 0 for f in planned),
        }

    @staticmethod
    def _changes(path: str, q: dict) -> dict:
        """Change-feed summary between two snapshots, computed
        Spark-free via the interop CDC-out SQL (DuckDB): counts by
        change type plus the snapshot range actually used — the
        "what happened between these two commits" ops question.
        ``?branch=NAME`` instead summarizes what PUBLISHING that
        branch would change (main head → branch head): the WAP audit
        question, answered with no Spark session."""
        import duckdb

        from .lake.interop import changes_sql, read_metadata

        meta = read_metadata(path)
        if "branch" in q:
            from .lake.interop import branch_ref

            try:
                head, fork = branch_ref(meta, q["branch"])
            except ValueError as e:
                raise KeyError(str(e)) from e
            frm = meta["current_snapshot_id"]
            # same divergence rule as LakeTable.audit_diff: a diff
            # against a non-ancestor main would conflate the two lines
            # (answering it would report main's own commits as
            # would-be deletes). Published branch → empty feed.
            if frm != head and frm != fork:
                by_id = {s["id"]: s for s in meta["snapshots"]}
                sid, ok = head, False
                while sid is not None:
                    if sid == frm:
                        ok = True
                        break
                    s = by_id.get(sid)
                    sid = s.get("parent") if s else None
                if not ok:
                    raise KeyError(
                        f"branch {q['branch']!r} diverged from main "
                        f"(main {frm}, fork {fork}, head {head}) — "
                        f"not auditable"
                    )
            to = head
        else:
            frm = int(q["from"]) if "from" in q else None
            to = int(q["to"]) if "to" in q else None
        sql = changes_sql(path, frm, to)
        rows = duckdb.sql(
            f"SELECT _change_type, count(*) AS n, max(_seq) AS max_seq "
            f"FROM (\n{sql}\n) GROUP BY _change_type"
        ).fetchall()
        return {
            "from": frm,
            "to": to if to is not None else meta["current_snapshot_id"],
            "counts": {r[0]: r[1] for r in rows},
            "max_seq": max((r[2] for r in rows), default=None),
        }

    @staticmethod
    def _lineage(path: str) -> list[dict]:
        recs = []
        for p in sorted(glob.glob(os.path.join(path, "metadata", "lineage", "*.json"))):
            with open(p) as f:
                recs.append(json.load(f))
        return recs

    # ------------------------------------------------------ assessment

    @staticmethod
    def _iceberg_status(dest: str) -> dict:
        """Inspect a published Iceberg destination (publish_iceberg /
        export_iceberg output) from its metadata only — version chain,
        publish cursor, live file counts, delete-stack depth (squash
        pressure). Spark-free like every other endpoint."""
        from .lake.iceberg import scan_files

        meta_dir = os.path.join(dest, "metadata")
        with open(os.path.join(meta_dir, "version-hint.text")) as f:
            v = int(f.read().strip())
        md_path = os.path.join(meta_dir, f"v{v}.metadata.json")
        with open(md_path) as f:
            md = json.load(f)
        scan = scan_files(md_path)
        return {
            "metadata_version": v,
            "metadata_path": md_path,
            "format_version": md["format-version"],
            "last_sequence_number": md["last-sequence-number"],
            "current_snapshot_id": md["current-snapshot-id"],
            "snapshots": len(md["snapshots"]),
            "schemas": len(md["schemas"]),
            "current_schema_id": md["current-schema-id"],
            "lake_snapshot_cursor": int(
                md.get("properties", {}).get("delta-spark.lake-snapshot-id", "-1")
            ),
            "data_files": len(scan["data"]),
            "delete_files": len(scan["deletes"]),
        }

    @staticmethod
    def _cursor_lag(base_meta: dict, cursor) -> dict:
        """Shared cursor-freshness walk for every derived-state
        endpoint (matview / curation / vocab): lag counts MAIN-lineage
        commits only (WAP-staged branch snapshots share the base's
        snapshot list but are never folded, so they must not report a
        perpetually-lagging view that is in sync), and a cursor that is
        neither the head nor on the lineage is off-lineage/expired —
        bound the lag and flag the O(base) rebootstrap."""
        head = base_meta["current_snapshot_id"]
        ids = {s["id"] for s in base_meta["snapshots"]}
        by_id = {s["id"]: s for s in base_meta["snapshots"]}
        lag, cur = 0, head
        while cur is not None and cur != cursor and cur in by_id:
            lag += 1
            cur = by_id[cur].get("parent")
        if cursor is not None and cur != cursor:
            lag = len(ids)
        return {
            "base_head": head,
            "in_sync": cursor == head,
            "lag_commits": lag,
            "cursor_expired": (
                cursor is not None and cursor != head and cursor not in ids
            ),
        }

    @staticmethod
    def _matview_status(root: str) -> dict:
        """Inspect a materialized view (lake/materialized.py) from its
        on-disk metadata only: the ``matview.json`` definition sidecar
        names the base table, the view's cursor is parsed from its own
        exactly-once markers (the same derivation MaterializedAggregate
        uses), and comparing it to the base head gives the freshness
        answer an operator actually asks — how many base commits is
        this view behind, and has base retention already expired the
        cursor (next advance = O(base) rebootstrap, not O(delta))."""
        from .lake.materialized import cursor_from_metadata

        with open(os.path.join(root, "matview.json")) as f:
            defn = json.load(f)
        vmeta = _load_table_meta(defn["view_path"])
        cursor = cursor_from_metadata(vmeta)
        bmeta = _load_table_meta(defn["base_path"])
        return {
            "base_path": defn["base_path"],
            "view_path": defn["view_path"],
            "group_cols": defn["group_cols"],
            "sums": defn["sums"],
            "cursor": cursor,
            **DiagnosticsService._cursor_lag(bmeta, cursor),
            "view_snapshots": len(vmeta["snapshots"]),
        }

    @staticmethod
    def _curation_status(root: str) -> dict:
        """Inspect an incremental curation index
        (functions/curation_incremental.py) from on-disk metadata only:
        the ``curation.json`` sidecar names the docs table, the cursor
        is derived from the status table's own exactly-once markers
        (crash-consistent — the side cursor file only drives the next
        advance), and comparing it to the docs head answers the
        operator's questions: how many docs commits behind, has docs
        retention expired the cursor (next advance = O(corpus)
        rebootstrap), and how big is the verdict state."""
        from .functions.curation_incremental import (
            cursor_from_status_metadata,
        )
        from .lake.interop import resolve_snapshot

        with open(os.path.join(root, "curation.json")) as f:
            defn = json.load(f)
        smeta = _load_table_meta(defn["status_path"])
        # truth = max(marker cursor, file cursor): a docs commit whose
        # change set is empty for this index (compaction, no-op replay)
        # advances the FILE past the last marker without a new status
        # snapshot, while a crash between merge and file write leaves
        # the MARKER ahead — whichever is larger is where the index
        # actually stands
        cursor = cursor_from_status_metadata(smeta)
        try:
            with open(os.path.join(root, "_cursor.json")) as f:
                fc = json.load(f).get("last_snapshot")
            if fc is not None and (cursor is None or fc > cursor):
                cursor = fc
        except (FileNotFoundError, json.JSONDecodeError):
            pass
        dmeta = _load_table_meta(defn["docs_path"])
        freshness = DiagnosticsService._cursor_lag(dmeta, cursor)
        freshness["docs_head"] = freshness.pop("base_head")
        snap = resolve_snapshot(smeta, defn["status_path"])
        files = snap["files"] if snap else []
        return {
            "docs_path": defn["docs_path"],
            "status_path": defn["status_path"],
            "params": {
                k: defn[k] for k in ("top_cap", "budget", "n_shards")
            },
            "cursor": cursor,
            **freshness,
            "status_snapshots": len(smeta["snapshots"]),
            "status_base_rows": sum(
                f["rows"] or 0 for f in files if f.get("kind") != "delta"
            ),
            "status_delta_rows": sum(
                f["rows"] or 0 for f in files if f.get("kind") == "delta"
            ),
        }

    @staticmethod
    def _vocab_status(root: str) -> dict:
        """Inspect an incremental vocabulary index from on-disk
        metadata only: the ``vocab.json`` sidecar names the docs table,
        the cursor IS the vocab table's last merge marker (there is no
        side file by design — additive folds make the marker the only
        safe cursor), and the lag/expiry walk answers the same operator
        questions as ``/v1/curation``. One honest asymmetry: a docs
        commit whose fold nets to zero token deltas (compaction, a
        row-neutral replay) commits no marker, so ``lag_commits`` may
        overcount past such commits until the next non-empty fold —
        the conservative direction (stale-looking, never wrong-counts).
        """
        from .functions.curation_incremental import _marker_cursor
        from .lake.interop import resolve_snapshot

        with open(os.path.join(root, "vocab.json")) as f:
            defn = json.load(f)
        vmeta = _load_table_meta(defn["vocab_path"])
        cursor = _marker_cursor(vmeta, "vocab-index")
        dmeta = _load_table_meta(defn["docs_path"])
        freshness = DiagnosticsService._cursor_lag(dmeta, cursor)
        freshness["docs_head"] = freshness.pop("base_head")
        snap = resolve_snapshot(vmeta, defn["vocab_path"])
        files = snap["files"] if snap else []
        return {
            "docs_path": defn["docs_path"],
            "vocab_path": defn["vocab_path"],
            "id_cols": defn["id_cols"],
            "text_col": defn["text_col"],
            "cursor": cursor,
            **freshness,
            "vocab_snapshots": len(vmeta["snapshots"]),
            "vocab_base_rows": sum(
                f["rows"] or 0 for f in files if f.get("kind") != "delta"
            ),
            "vocab_delta_rows": sum(
                f["rows"] or 0 for f in files if f.get("kind") == "delta"
            ),
        }

    @staticmethod
    def _conv_curation_status(root: str) -> dict:
        """/v1/curation's conversation-level sibling: sidecar-described
        definition, marker-or-file cursor (the merge is idempotent, so
        the side file is legal — same max() rule as _curation_status),
        lag/expiry vs the docs head, verdict-state size."""
        from .functions.curation_incremental import _marker_cursor
        from .lake.interop import resolve_snapshot

        with open(os.path.join(root, "conv_curation.json")) as f:
            defn = json.load(f)
        smeta = _load_table_meta(defn["status_path"])
        cursor = _marker_cursor(smeta, "conv-curation-index")
        try:
            with open(os.path.join(root, "_cursor.json")) as f:
                fc = json.load(f).get("last_snapshot")
            if fc is not None and (cursor is None or fc > cursor):
                cursor = fc
        except (FileNotFoundError, json.JSONDecodeError):
            pass
        dmeta = _load_table_meta(defn["docs_path"])
        freshness = DiagnosticsService._cursor_lag(dmeta, cursor)
        freshness["docs_head"] = freshness.pop("base_head")
        snap = resolve_snapshot(smeta, defn["status_path"])
        files = snap["files"] if snap else []
        return {
            "docs_path": defn["docs_path"],
            "status_path": defn["status_path"],
            "cols": defn["cols"],
            "params": {
                k: defn[k] for k in ("top_cap", "budget", "n_shards")
            },
            "cursor": cursor,
            **freshness,
            "status_snapshots": len(smeta["snapshots"]),
            "status_base_rows": sum(
                f["rows"] or 0 for f in files if f.get("kind") != "delta"
            ),
            "status_delta_rows": sum(
                f["rows"] or 0 for f in files if f.get("kind") == "delta"
            ),
        }

    def _assess_one(self, body: dict) -> dict:
        schema = _schema_from_fields(body["fields"])
        target = None
        tname = body.get("table")
        if tname:
            tpath = self._table_paths()[tname]
            target = LakeTable(None, tpath, _load_table_meta(tpath))
        a = assess_table(schema, body["key_cols"], target)
        return {
            "ok": a.ok,
            "problems": a.problems,
            "columns": [vars(c) for c in a.columns],
        }

    def _assess_pipeline(self, body: dict) -> dict:
        tables = {
            name: (_schema_from_fields(spec["fields"]), spec["key_cols"])
            for name, spec in body["tables"].items()
        }
        paths = self._table_paths()
        targets = {
            name: LakeTable(None, paths[name], _load_table_meta(paths[name]))
            for name in body["tables"]
            if name in paths
        }
        return {
            name: {"ok": a.ok, "problems": a.problems,
                   "columns": [vars(c) for c in a.columns]}
            for name, a in assess_pipeline(tables, targets).items()
        }

    # ------------------------------------------------------ routing

    def handle(self, method: str, url: str, body: dict | None) -> tuple[int, dict | list]:
        """Pure request → (status, payload) function (HTTP-free, so
        tests can drive it directly and the handler stays trivial)."""
        u = urlparse(url)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        parts = [p for p in u.path.split("/") if p]
        try:
            if method == "GET":
                if parts == ["health"]:
                    return 200, {"status": "ok"}
                if parts == ["v1", "iceberg"]:
                    return 200, self._iceberg_status(q["dest"])
                if parts == ["v1", "matview"]:
                    return 200, self._matview_status(q["root"])
                if parts == ["v1", "curation"]:
                    return 200, self._curation_status(q["root"])
                if parts == ["v1", "vocab"]:
                    return 200, self._vocab_status(q["root"])
                if parts == ["v1", "conv_curation"]:
                    return 200, self._conv_curation_status(q["root"])
                if parts == ["v1", "tables"]:
                    return 200, {"tables": sorted(self._table_paths())}
                if len(parts) >= 3 and parts[:2] == ["v1", "tables"]:
                    name = parts[2]
                    paths = self._table_paths()
                    if name not in paths:
                        return 404, {"error": f"no table {name}"}
                    path = paths[name]
                    if len(parts) == 3:
                        return 200, self._describe(name, path)
                    sub = parts[3]
                    if sub == "offsets":
                        return 200, self._offsets(_load_table_meta(path), q.get("writer"))
                    if sub == "state":
                        return 200, self._state(path, q.get("pipeline", "transcripts"))
                    if sub == "lineage":
                        return 200, {"lineage": self._lineage(path)}
                    if sub == "plan":
                        return 200, self._plan(path, q)
                    if sub == "changes":
                        return 200, self._changes(path, q)
            elif method == "POST":
                if parts == ["v1", "assessTable"]:
                    return 200, self._assess_one(body or {})
                if parts == ["v1", "assessPipeline"]:
                    return 200, self._assess_pipeline(body or {})
            return 404, {"error": f"no route {method} {u.path}"}
        except (KeyError, FileNotFoundError) as e:
            return 400, {"error": repr(e)}

    # ------------------------------------------------------ server

    def start(self) -> tuple[str, int]:
        svc = self

        class Handler(BaseHTTPRequestHandler):
            def _reply(self, method):
                body, status, payload = None, None, None
                if method == "POST":
                    n = int(self.headers.get("Content-Length") or 0)
                    try:
                        body = json.loads(self.rfile.read(n) or b"{}")
                    except json.JSONDecodeError as e:
                        # a malformed body must get an HTTP answer, not
                        # kill the connection with a server-side raise
                        status, payload = 400, {"error": f"bad JSON body: {e}"}
                if status is None:
                    try:
                        status, payload = svc.handle(method, self.path, body)
                    except Exception as e:  # keep the connection answering
                        status, payload = 500, {"error": repr(e)}
                data = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._reply("GET")

            def do_POST(self):
                self._reply("POST")

            def log_message(self, *a):  # quiet test output
                pass

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self.host, self.port

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
