"""Golden replay: changelog → batch apply → final table state equals
the pandas oracle (reference analog: testOneRun golden compare,
/root/reference/delta-app/src/test/java/io/cdap/delta/app/
DeltaPipelineStateStoreBaseTest.java:126-173)."""

import json

import pandas as pd
import os

import pytest

from delta_spark.changelog import ChangelogSpec, generate_and_write, oracle_apply
from delta_spark.pipeline import Pipeline, PipelineConfig
from delta_spark.lake import LakeTable

from conftest import assert_pdf_equal


def _run(spark, tmp_path, spec, **cfg_kw):
    log_dir = str(tmp_path / "changelog")
    df = generate_and_write(log_dir, spec)
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        generation=1,
        **cfg_kw,
    )
    p = Pipeline(spark, cfg)
    st = p.run_batch()
    table = LakeTable.load(spark, cfg.table_path)
    return df, st, table


def test_replay_basic(spark, tmp_path):
    spec = ChangelogSpec(n_events=4000, n_convs=60, seed=11)
    raw, st, table = _run(spark, tmp_path, spec)
    expected = oracle_apply(raw)
    actual = table.read().toPandas()
    assert_pdf_equal(actual, expected, ["conv_id", "turn_idx"])
    assert st.applied and st.rows_in > 0
    assert st.op_counts.get("INSERT", 0) > 0


def test_replay_idempotent_rerun(spark, tmp_path):
    """Re-applying the same batch is a no-op (exactly-once markers)."""
    spec = ChangelogSpec(n_events=2000, n_convs=40, seed=12)
    raw, st, table = _run(spark, tmp_path, spec)
    v_before = table.metadata["version"]
    cfg = PipelineConfig(
        changelog_path=str(tmp_path / "changelog"),
        table_path=str(tmp_path / "table"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        generation=1,
    )
    p2 = Pipeline(spark, cfg)
    st2 = p2.run_batch()  # same writer_id + batch_id
    table2 = LakeTable.load(spark, cfg.table_path)
    assert table2.metadata["version"] == v_before  # no new commit
    assert st2.upserts == 0 and st2.deletes == 0
    assert_pdf_equal(table2.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"])


def test_replay_ddl(spark, tmp_path):
    """Mid-stream add/rename/widen: DDL applied before later-sequenced
    DML; final schema evolved; renamed column realigned."""
    spec = ChangelogSpec(n_events=4000, n_convs=60, seed=13, include_ddl=True)
    raw, st, table = _run(spark, tmp_path, spec)
    assert st.ddls_applied == 3
    assert st.sub_batches == 4
    names = [f["name"] for f in table.fields]
    assert "score" in names and "tool_name" in names and "tool" not in names
    widened = next(f for f in table.fields if f["name"] == "turn_idx")
    assert widened["type"] == "bigint"
    expected = oracle_apply(raw)
    actual = table.read().toPandas()
    # oracle puts columns in a fixed order; align
    actual = actual[list(expected.columns)]
    assert_pdf_equal(actual, expected, ["conv_id", "turn_idx"])


def test_replay_salted_equals_plain(spark, tmp_path):
    spec = ChangelogSpec(n_events=3000, n_convs=30, seed=14, hot_frac=0.4)
    raw, st, table = _run(spark, tmp_path, spec, salt_buckets=8)
    assert_pdf_equal(table.read().toPandas(), oracle_apply(raw), ["conv_id", "turn_idx"])


def test_lineage_written(spark, tmp_path):
    spec = ChangelogSpec(n_events=1000, n_convs=20, seed=15)
    raw, st, table = _run(spark, tmp_path, spec)
    d = os.path.join(table.path, "metadata", "lineage")
    files = os.listdir(d)
    assert len(files) == 1
    rec = json.load(open(os.path.join(d, files[0])))
    assert rec["rows_in"] == st.rows_in
    assert rec["max_seq"] == raw["seq"].max()
    assert rec["buckets"] == st.buckets and len(rec["buckets"]) > 0
    assert rec["op_counts"]["INSERT"] > 0 and rec["bytes_in"] > 0


def test_late_events_surfaced_in_lineage(spark, tmp_path):
    """The seq-guarded merge resolves replayed / cross-batch-reordered
    events silently; lineage now counts them (late_events) so a retry
    storm is visible — the per-batch analog of stateful.stale_event_audit."""
    import datetime

    from delta_spark.apply import apply_batch
    from delta_spark.lake import LakeTable
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    ts = datetime.datetime(2026, 1, 1)
    ddl = (
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long"
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        "conv_id", 4,
    )
    b0 = [(f"c{i}", 0, "user", f"v{i}", "", ts, "INSERT", i + 1) for i in range(10)]
    st0 = apply_batch(t, spark.createDataFrame(b0, ddl), "w", "b0")
    assert st0.late_events == 0 and st0.max_seq == 10
    # redelivery storm: two stale events (seq 2, 3 — at/below the
    # committed high-water mark 10) mixed with one genuinely new one
    b1 = [
        ("c1", 0, "user", "stale", "", ts, "UPDATE", 2),
        ("c2", 0, "user", "stale", "", ts, "UPDATE", 3),
        ("c3", 0, "user", "fresh", "", ts, "UPDATE", 11),
    ]
    st1 = apply_batch(
        t, spark.createDataFrame(b1, ddl), "w", "b1", assume_ordered=False
    )
    assert st1.late_events == 2 and st1.max_seq == 11
    rec = json.load(
        open(os.path.join(t.path, "metadata", "lineage", "w-b1.json"))
    )
    assert rec["late_events"] == 2
    # and the guard held: stale updates did not regress the rows
    got = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert got["c1"] == "v1" and got["c2"] == "v2" and got["c3"] == "fresh"


def test_op_blacklist(spark, tmp_path):
    """F1: blacklisted DELETE ops are dropped before apply (reference:
    QueueingEventEmitter.shouldIgnore)."""
    spec = ChangelogSpec(n_events=2000, n_convs=40, seed=16)
    raw, st, table = _run(spark, tmp_path, spec, op_blacklist=("DELETE",))
    raw_no_del = raw[raw["op"] != "DELETE"]
    expected = oracle_apply(raw_no_del)
    assert_pdf_equal(table.read().toPandas(), expected, ["conv_id", "turn_idx"])
    assert "DELETE" not in st.op_counts


def test_bucket_pruning_incremental(spark, tmp_path):
    """A second small batch touching few convs rewrites only the
    buckets those convs hash to."""
    import pandas as pd
    from delta_spark.apply import apply_batch
    from delta_spark.changelog import write_changelog

    spec = ChangelogSpec(n_events=3000, n_convs=200, seed=17)
    raw, st, table = _run(spark, tmp_path, spec, num_buckets=16)
    full_buckets = set(st.buckets)
    # incremental batch: update 2 conversations only
    inc = raw[raw["conv_id"].isin(["c1", "c2"]) & (raw["op"] == "INSERT")].head(5).copy()
    inc["seq"] = raw["seq"].max() + 1 + pd.RangeIndex(len(inc))
    inc["op"] = "UPDATE"
    inc["text"] = "patched"
    inc_dir = str(tmp_path / "inc")
    write_changelog(inc, inc_dir, n_files=1)
    from delta_spark.schema import CHANGELOG_SCHEMA

    inc_df = spark.read.schema(CHANGELOG_SCHEMA).parquet(inc_dir)
    st2 = apply_batch(table, inc_df, writer_id="transcripts-g1-i0", batch_id="inc-1")
    assert 0 < len(st2.buckets) <= 2 < len(full_buckets)
    patched = (
        table.read().filter("text = 'patched'").count()
    )
    assert patched == len(inc.drop_duplicates(["conv_id", "turn_idx"]))


def test_rename_key_column_remaps(spark, tmp_path):
    """RENAME of a KEY column: later events still address the original
    name; the id-based rewrite remaps them and the merge key follows
    (FIXTURES replay_ddl: 'renamed key remapped'; reference analog:
    TransformationUtil.transformDDLEvent PK remap)."""
    import pandas as pd

    from delta_spark.apply import apply_batch
    from delta_spark.changelog import ChangelogSpec, generate_changelog, write_changelog

    spec = ChangelogSpec(
        n_events=800,
        n_convs=15,
        seed=44,
        include_ddl=True,
        ddls=[{"op": "RENAME_COLUMN", "column": "conv_id", "new_name": "conversation_id"}],
    )
    raw = generate_changelog(spec)
    log_dir = str(tmp_path / "log")
    write_changelog(raw, log_dir, 2)
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
    )
    p = Pipeline(spark, cfg)
    st = p.run_batch()
    assert st.ddls_applied == 1
    table = LakeTable.load(spark, cfg.table_path)
    assert table.key_cols == ["conversation_id", "turn_idx"]
    assert table.bucket_col == "conversation_id"
    expected = oracle_apply(raw).rename(columns={"conv_id": "conversation_id"})
    actual = table.read().toPandas()[list(expected.columns)]
    assert_pdf_equal(actual, expected, ["conversation_id", "turn_idx"])
    # a post-rename incremental batch (still original names) lands on
    # the SAME keys, not new ones
    inc = raw[(raw["op"] == "INSERT")].drop_duplicates(["conv_id", "turn_idx"]).head(3).copy()
    inc["seq"] = raw["seq"].max() + 1 + pd.RangeIndex(len(inc))
    inc["op"] = "UPDATE"
    inc["text"] = "renamed-key-patch"
    write_changelog(inc, str(tmp_path / "inc"), 1)
    from delta_spark.schema import CHANGELOG_SCHEMA

    inc_df = spark.read.schema(CHANGELOG_SCHEMA).parquet(str(tmp_path / "inc"))
    before = table.read().count()
    apply_batch(table, inc_df, writer_id=cfg.writer_id, batch_id="inc")
    after = table.read()
    assert after.count() == before  # updates, no inserts
    assert after.filter("text = 'renamed-key-patch'").count() == 3


def test_apply_generic_table_without_text_columns(spark, tmp_path):
    """The engine API is table-shape generic: a batch/table without the
    transcript's `text`/`ingest_ts` columns applies cleanly and the
    byte/latency metrics are simply omitted (not AnalysisException)."""
    from pyspark.sql import types as T

    from delta_spark.apply import apply_batch

    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("val", T.IntegerType(), True),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, ["id"], "id", 4)
    batch = spark.createDataFrame(
        [(1, 10, "INSERT", 1), (2, 20, "INSERT", 2), (1, 11, "UPDATE", 3)],
        "id int, val int, op string, seq long",
    )
    st = apply_batch(t, batch, writer_id="w1", batch_id="b0")
    assert st.applied and st.rows_in == 3
    assert st.bytes_in == 0 and st.latency_s is None
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got == {1: 11, 2: 20}


def test_sortkey_tiebreak_unordered_source(spark, tmp_path):
    """UN_ORDERED source: equal-seq competing revisions resolve by the
    source timestamp (reference: SortKey.java:26-41 — the target orders
    by sortKeys when seq ties). Batch AND streaming replays match the
    tie-aware oracle; without ties the path is inert."""
    spec = ChangelogSpec(n_events=2500, n_convs=40, seed=31, tie_frac=0.05, n_files=6)
    log_dir = str(tmp_path / "log")
    from delta_spark.changelog import generate_changelog, write_changelog

    raw = generate_changelog(spec)
    assert raw["seq"].duplicated().any()  # fixtures really contain ties
    # competing revisions: same seq, different text
    per_seq = raw.groupby("seq")["text"].nunique(dropna=False)
    assert (per_seq > 1).any()
    write_changelog(raw, log_dir, spec.n_files)

    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        sort_key_col="ingest_ts",
        max_files_per_trigger=2,
    )
    p = Pipeline(spark, cfg)
    p.run_stream_to_completion()  # streaming: ties may split across batches
    table = LakeTable.load(spark, cfg.table_path)
    from delta_spark.changelog import oracle_apply as oa

    expected = oa(raw, sort_col="ingest_ts")
    assert_pdf_equal(table.read().toPandas(), expected, ["conv_id", "turn_idx"])
    # sanity: winners include ties resolved AGAINST file order
    assert expected["text"].astype(str).str.endswith("rev-tie").any()


def test_column_whitelist_enforced_in_apply(spark, tmp_path):
    """F3: unselected payload columns never reach the target — they
    land NULL (reference: SourceTable.getColumns, SourceTable.java:
    66-72); key columns always pass."""
    spec = ChangelogSpec(n_events=1000, n_convs=20, seed=33)
    raw, st, table = _run(
        spark, tmp_path, spec, column_whitelist=("text", "role")
    )
    exp = oracle_apply(raw)
    got = table.read().toPandas()
    assert got["tool"].isna().all() and got["ts"].isna().all()
    assert_pdf_equal(
        got[["conv_id", "turn_idx", "role", "text"]],
        exp[["conv_id", "turn_idx", "role", "text"]],
        ["conv_id", "turn_idx"],
    )


def test_post_rename_events_use_new_name(spark, tmp_path):
    """A real CDC source emits the NEW column name after RENAME_COLUMN
    DDL; such events must land in the renamed column, not NULL out
    (reference: DefaultMutableRowSchema handles renames in both
    directions, delta-app/.../transformation/DefaultMutableRowSchema.java:85-130)."""
    from delta_spark.apply import apply_batch
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], "conv_id", 8,
    )
    base = spark.createDataFrame(
        [("c1", 1, "user", "hello", "grep", None, "INSERT", 1)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    apply_batch(t, base, "w1", "b0")
    t.apply_ddl({"op": "RENAME_COLUMN", "column": "tool", "new_name": "tool_name"})
    # source honors the DDL: post-rename events address tool_name
    post = spark.createDataFrame(
        [("c1", 2, "assistant", "hi", "bash", None, "INSERT", 2)],
        "conv_id string, turn_idx int, role string, text string, tool_name string, "
        "ts timestamp, op string, seq long",
    )
    apply_batch(t, post, "w1", "b1")
    rows = {r["turn_idx"]: r["tool_name"] for r in t.read().collect()}
    assert rows[2] == "bash"  # landed under the new name
    assert rows[1] == "grep"  # pre-rename data realigned by column id
    # a fixture that still addresses the ORIGINAL name also lands
    legacy = spark.createDataFrame(
        [("c1", 3, "user", "again", "curl", None, "INSERT", 3)],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, op string, seq long",
    )
    apply_batch(t, legacy, "w1", "b2")
    rows = {r["turn_idx"]: r["tool_name"] for r in t.read().collect()}
    assert rows[3] == "curl"


def test_mixed_epoch_batch_lands_each_segment_by_its_own_names(spark, tmp_path):
    """One micro-batch whose rows PHYSICALLY carry both a column's
    pre-rename and post-rename names, values split by the in-batch
    RENAME boundary: pre-rename rows populate 'tool' (tool_name NULL),
    post-rename rows populate 'tool_name' (tool NULL). A global sniff
    must pick one map and lose one side; the DDL-segment split knows
    each segment's wire epoch and pins the exact by-id map, so BOTH
    sides land (reference: DefaultMutableRowSchema.java:85-130 is
    exact, never heuristic)."""
    import json as _json

    from delta_spark.apply import apply_batch
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"], "conv_id", 8,
    )
    ddl = _json.dumps(
        {"op": "RENAME_COLUMN", "column": "tool", "new_name": "tool_name"}
    )
    wire = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, tool_name string, ts timestamp, op string, seq long, "
        "ddl string"
    )
    rows = [
        # epoch 0: source addresses 'tool'
        ("c1", 0, "user", "t0", "grep", None, None, "INSERT", 1, None),
        ("c2", 0, "user", "t1", "curl", None, None, "INSERT", 2, None),
        # the rename boundary
        (None, None, None, None, None, None, None, "RENAME_COLUMN", 3, ddl),
        # epoch 1: source addresses 'tool_name'
        ("c1", 1, "user", "t2", None, "bash", None, "INSERT", 4, None),
        ("c2", 0, "user", "t1-upd", None, "sed", None, "UPDATE", 5, None),
    ]
    st = apply_batch(t, spark.createDataFrame(rows, wire), "w1", "b0")
    assert st.ddls_applied == 1 and st.sub_batches == 2
    t = t.refresh()
    got = {
        (r["conv_id"], r["turn_idx"]): r["tool_name"] for r in t.read().collect()
    }
    assert got[("c1", 0)] == "grep"  # pre-rename value, old name
    assert got[("c1", 1)] == "bash"  # post-rename value, new name
    assert got[("c2", 0)] == "sed"  # updated across the boundary
    # replaying the same batch stays a no-op (exactly-once across the
    # segmented path)
    st2 = apply_batch(t, spark.createDataFrame(rows, wire), "w1", "b0")
    assert st2.upserts == 0 and st2.deletes == 0


def test_rewrite_chained_rename_name_collision(spark, tmp_path):
    """Chained renames where one field's CURRENT name equals another
    field's ORIGINAL name (v0 (text, tool); tool->aux then text->tool):
    a batch addressing pure current names {tool, aux} must map each
    column to itself — the coverage sniff must not fall back to the v0
    map just because 'tool' also hits it."""
    from delta_spark.apply import _rewrite_to_current
    from delta_spark.lake import LakeTable
    from delta_spark.schema import TRANSCRIPT_SCHEMA

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        "conv_id", 4,
    )
    t.apply_ddl({"op": "RENAME_COLUMN", "column": "tool", "new_name": "aux"})
    t.apply_ddl({"op": "RENAME_COLUMN", "column": "text", "new_name": "tool"})
    batch = spark.createDataFrame(
        [("c1", 0, "user", "TEXTVAL", "AUXVAL", None, "INSERT", 1)],
        "conv_id string, turn_idx int, role string, tool string, aux string, "
        "ts timestamp, op string, seq long",
    )
    row = _rewrite_to_current(batch, t).collect()[0]
    assert row["tool"] == "TEXTVAL"  # current 'tool' (was text) from batch col tool
    assert row["aux"] == "AUXVAL"    # current 'aux' (was tool) from batch col aux
