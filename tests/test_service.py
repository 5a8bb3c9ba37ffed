"""Diagnostics/assessment HTTP service (delta_spark/service.py) — the
reference's AssessmentHandler / OffsetStateHandler surface rebuilt as a
Spark-free stdlib server over the engine's on-disk artifacts."""

import json
import urllib.request

import pytest

from delta_spark.changelog import ChangelogSpec, generate_and_write
from delta_spark.pipeline import Pipeline, PipelineConfig
from delta_spark.service import DiagnosticsService
from delta_spark.state import StateStore


def _run_pipeline(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    generate_and_write(log_dir, ChangelogSpec(n_events=2000, n_convs=40, seed=7))
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        num_buckets=8,
    )
    p = Pipeline(spark, cfg)
    st = p.run_batch()
    return cfg, st


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:  # 4xx still carries a JSON body
        return e.code, json.loads(e.read())


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_service_end_to_end_over_http(spark, tmp_path):
    cfg, st = _run_pipeline(spark, tmp_path)
    svc = DiagnosticsService(tables={"transcripts": cfg.table_path})
    _, port = svc.start()
    try:
        assert _get(port, "/health")[1]["status"] == "ok"
        assert _get(port, "/v1/tables")[1]["tables"] == ["transcripts"]

        code, desc = _get(port, "/v1/tables/transcripts")
        assert code == 200
        assert desc["key_cols"] == ["conv_id", "turn_idx"]
        assert desc["num_buckets"] == 8
        assert desc["snapshots"] >= 1
        assert desc["last_commit"]["writer-id"] == cfg.writer_id

        # named refs surface in describe (empty here; shape pinned)
        assert desc["tags"] == {} and desc["branches"] == {}
        from delta_spark.lake import LakeTable

        t = LakeTable.load(spark, cfg.table_path)
        t.tag("v1")
        t.create_branch("staged")
        desc2 = _get(port, "/v1/tables/transcripts")[1]
        assert desc2["tags"] == {"v1": t.tags["v1"]}
        assert desc2["branches"] == {"staged": t.branches["staged"]}
        assert desc2["rolled_back_snapshots"] == []

        # offsets: the snapshot summaries ARE the offset store
        code, offs = _get(port, f"/v1/tables/transcripts/offsets?writer={cfg.writer_id}")
        assert code == 200 and offs["max_seq"] == st.max_seq
        assert _get(port, "/v1/tables/transcripts/offsets")[1]["writers"] == {
            cfg.writer_id: st.max_seq
        }

        # lineage records written by apply_batch
        code, lin = _get(port, "/v1/tables/transcripts/lineage")
        assert code == 200
        assert [r["batch_id"] for r in lin["lineage"]] == ["batch-0"]
        assert lin["lineage"][0]["rows_in"] == st.rows_in

        # state doc: default when never written, then a real FAILING one
        assert _get(port, "/v1/tables/transcripts/state")[1]["pipeline"] == "OK"
        StateStore(cfg.table_path, "transcripts").set_failing("boom")
        assert _get(port, "/v1/tables/transcripts/state")[1]["pipeline"] == "FAILING"

        # change-feed summary, Spark-free via interop CDC-out SQL:
        # from=None..current over a fresh replay = all inserts
        code, ch = _get(port, "/v1/tables/transcripts/changes")
        assert code == 200
        assert ch["to"] == 1 and ch["counts"].get("insert", 0) > 0
        assert "update" not in ch["counts"] and "delete" not in ch["counts"]
        assert ch["max_seq"] == st.max_seq

        # WAP audit over HTTP, Spark-free: ?branch= summarizes what
        # publishing the staged branch would change (main → head)
        bt = t.for_branch("staged")
        import datetime as _dt

        bt.merge(
            spark.createDataFrame(
                [("c0", 0, "user", "staged-x", "", _dt.datetime(2026, 1, 1),
                  "UPDATE", 10_000_000)],
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp, op string, seq long",
            ),
            "aud", "ab1",
        )
        code, au = _get(port, "/v1/tables/transcripts/changes?branch=staged")
        assert code == 200
        assert au["counts"] == {"update": 1} and au["max_seq"] == 10_000_000

        # diverged branch → clean 400 refusal (mirrors audit_diff),
        # never a conflated diff or a raw range error
        t.refresh().merge(
            spark.createDataFrame(
                [("c1", 0, "user", "main-x", "", _dt.datetime(2026, 1, 1),
                  "UPDATE", 10_000_001)],
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp, op string, seq long",
            ),
            "mainw", "mb1",
        )
        code, body = _get(port, "/v1/tables/transcripts/changes?branch=staged")
        assert code == 400 and "diverged" in body["error"]

        # bad-deploy drill state: a rollback's revoked snapshots are
        # visible Spark-free, and the reported offsets fall back with
        # the engine's last_committed_seq (what an operator checks
        # mid-drill before re-running the fixed pipeline)
        t = t.refresh()
        good_sid = t.metadata["current_snapshot_id"]
        t.merge(
            spark.createDataFrame(
                [("cZ", 0, "user", "POISON", "", _dt.datetime(2026, 1, 1),
                  "UPDATE", 20_000_000)],
                "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp, op string, seq long",
            ),
            "w-drill", "bad-1", mode="auto",
        )
        t = t.refresh()
        bad_sid = t.metadata["current_snapshot_id"]
        offs = _get(port, "/v1/tables/transcripts/offsets?writer=w-drill")[1]
        assert offs["max_seq"] == 20_000_000
        t.rollback_to(good_sid)
        desc3 = _get(port, "/v1/tables/transcripts")[1]
        assert desc3["rolled_back_snapshots"] == [bad_sid]
        assert desc3["last_commit"]["operation"] == "rollback"
        offs = _get(port, "/v1/tables/transcripts/offsets?writer=w-drill")[1]
        assert offs["max_seq"] == -1  # revoked with the rollback

        # scan planning from manifest stats: a narrow key range plans
        # fewer files than the full table, a no-op range plans all
        code, plan = _get(port, "/v1/tables/transcripts/plan?col=conv_id&lo=c1&hi=c1")
        assert code == 200
        assert 0 < plan["files_planned"] < plan["files_total"]
        assert plan["files_skipped"] == plan["files_total"] - plan["files_planned"]
        code, full = _get(port, "/v1/tables/transcripts/plan?col=conv_id")
        assert code == 200 and full["files_planned"] == full["files_total"]
        assert _get(port, "/v1/tables/transcripts/plan?col=nope")[0] == 400

        assert _get(port, "/v1/tables/nope")[0] == 404
    finally:
        svc.stop()


def test_assess_endpoints(spark, tmp_path):
    cfg, _ = _run_pipeline(spark, tmp_path)
    svc = DiagnosticsService(tables={"transcripts": cfg.table_path})
    _, port = svc.start()
    try:
        fields = [
            {"name": "conv_id", "type": "string"},
            {"name": "turn_idx", "type": "int"},
            {"name": "text", "type": "string"},
            {"name": "blob", "type": "map<string,string>"},  # unsupported
        ]
        code, a = _post(
            port, "/v1/assessTable",
            {"fields": fields, "key_cols": ["conv_id", "turn_idx"], "table": "transcripts"},
        )
        assert code == 200 and a["ok"] is False
        sup = {c["name"]: c["support"] for c in a["columns"]}
        assert sup["conv_id"] == "YES" and sup["blob"] == "NO"

        code, p = _post(
            port, "/v1/assessPipeline",
            {"tables": {"transcripts": {"fields": fields[:3],
                                        "key_cols": ["conv_id", "turn_idx"]}}},
        )
        assert code == 200 and p["transcripts"]["ok"] is True
    finally:
        svc.stop()


def test_iceberg_status_endpoint(spark, tmp_path):
    """GET /v1/iceberg?dest=… inspects a published Iceberg table from
    its exported metadata only (version chain, publish cursor, delete-
    stack depth) — the squash-pressure signal an operator watches."""
    from delta_spark.lake import LakeTable
    from delta_spark.lake.iceberg import publish_iceberg

    cfg, st = _run_pipeline(spark, tmp_path)
    t = LakeTable.load(spark, cfg.table_path)
    ice = str(tmp_path / "ice")
    publish_iceberg(t, ice)

    svc = DiagnosticsService(tables={"transcripts": cfg.table_path})
    _, port = svc.start()
    try:
        import urllib.parse

        code, body = _get(port, "/v1/iceberg?dest=" + urllib.parse.quote(ice))
        assert code == 200
        assert body["metadata_version"] == 1
        assert body["format_version"] == 2
        assert body["data_files"] >= 1
        assert body["lake_snapshot_cursor"] == t.metadata["current_snapshot_id"]
        assert body["delete_files"] in (0, 1)
        # unknown dest → clean 400, not a 500
        code, _err = _get(port, "/v1/iceberg?dest=" + urllib.parse.quote(str(tmp_path / "nope")))
        assert code == 400
    finally:
        svc.stop()


def test_matview_status_endpoint(spark, tmp_path):
    """GET /v1/matview?root=… answers the operator question about a
    materialized view from on-disk metadata alone: what it computes
    (the matview.json definition sidecar), where its cursor sits, and
    how many base commits it lags — including the expired-cursor signal
    that predicts an O(base) rebootstrap on the next advance."""
    import datetime
    import urllib.parse

    from delta_spark.lake import LakeTable, MaterializedAggregate

    cfg, _st = _run_pipeline(spark, tmp_path)
    t = LakeTable.load(spark, cfg.table_path)
    root = str(tmp_path / "mv")
    mv = MaterializedAggregate(
        spark, t, root, ["role"], {"sum_chars": "length(text)"}
    )
    mv.advance()

    svc = DiagnosticsService(tables={"transcripts": cfg.table_path})
    _, port = svc.start()
    try:
        code, body = _get(port, "/v1/matview?root=" + urllib.parse.quote(root))
        assert code == 200
        assert body["in_sync"] and body["lag_commits"] == 0
        assert body["cursor"] == t.metadata["current_snapshot_id"]
        assert body["group_cols"] == ["role"]
        assert body["sums"] == {"sum_chars": "length(text)"}
        assert not body["cursor_expired"]

        # one more base commit: the view lags by exactly one
        ddl = (
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp, op string, seq long"
        )
        t.merge(
            spark.createDataFrame(
                [("c0", 0, "user", "late", "",
                  datetime.datetime(2026, 1, 1), "UPDATE", 10_000_000)],
                ddl,
            ),
            "w",
            "late-1",
        )
        code, body = _get(port, "/v1/matview?root=" + urllib.parse.quote(root))
        assert code == 200
        assert not body["in_sync"] and body["lag_commits"] == 1
        assert not body["cursor_expired"]

        # catching up restores in_sync (fresh handle — restart shape)
        MaterializedAggregate(
            spark, t.refresh(), root, ["role"], {"sum_chars": "length(text)"}
        ).advance()
        code, body = _get(port, "/v1/matview?root=" + urllib.parse.quote(root))
        assert body["in_sync"] and body["lag_commits"] == 0

        # WAP staging must not inflate lag: branch commits share the
        # snapshot list but are off main's lineage — the view (which
        # folds main only) is still in sync and still lag 0
        t = t.refresh()
        bt = t.ensure_branch("wip")
        bt.merge(
            spark.createDataFrame(
                [("c0", 0, "user", "staged", "",
                  datetime.datetime(2026, 1, 1), "UPDATE", 15_000_000)],
                ddl,
            ),
            "w-stage", "sb1",
        )
        code, body = _get(port, "/v1/matview?root=" + urllib.parse.quote(root))
        assert code == 200
        assert body["in_sync"] and body["lag_commits"] == 0
        t = t.refresh()
        t.drop_branch("wip")

        # base retention running ahead of the cursor is flagged
        for i in range(3):
            t.merge(
                spark.createDataFrame(
                    [("c0", 0, "user", f"v{i}", "",
                      datetime.datetime(2026, 1, 1), "UPDATE",
                      10_000_001 + i)],
                    ddl,
                ),
                "w",
                f"late-2-{i}",
            )
        t.expire_snapshots(keep_last=1)
        code, body = _get(port, "/v1/matview?root=" + urllib.parse.quote(root))
        assert code == 200
        assert not body["in_sync"] and body["cursor_expired"]

        # unknown root → clean 400, not a 500
        code, _err = _get(
            port,
            "/v1/matview?root=" + urllib.parse.quote(str(tmp_path / "nope")),
        )
        assert code == 400
    finally:
        svc.stop()
