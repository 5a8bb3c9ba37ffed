"""Multi-table pipelines + table-level DDL.

Reference analogs:
  * testMultipleInstances — tables round-robined over instances, each
    instance applies only its tables
    (/root/reference/delta-app/src/test/java/io/cdap/delta/app/
    DeltaPipelineStateStoreBaseTest.java:399-474)
  * DDLOperation.Type CREATE/DROP/TRUNCATE/RENAME TABLE
    (delta-api/.../DDLOperation.java:30-38)
  * CREATE_TABLE never blacklisted (DeltaWorker.java:219,231)
"""

import json

import numpy as np
import pandas as pd
import pytest

from delta_spark.catalog import Catalog
from delta_spark.changelog import (
    ChangelogSpec,
    generate_multi_changelog,
    oracle_apply,
    write_changelog,
)
from delta_spark.multi import (
    MultiPipelineConfig,
    MultiTablePipeline,
    expand_blacklist,
)

from conftest import assert_pdf_equal

TABLES = ("alpha", "beta", "gamma")


def _specs(n=800):
    return {
        t: ChangelogSpec(n_events=n, n_convs=12, seed=50 + i, n_files=1)
        for i, t in enumerate(TABLES)
    }


def _mk_catalog_with_tables(spark, root, tables=TABLES):
    from delta_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA

    cat = Catalog.load_or_create(spark, str(root))
    for t in tables:
        cat.create_table(t, TRANSCRIPT_SCHEMA, KEY_COLS, "conv_id", 8)
    return cat


def test_expand_blacklist_create_table_immune():
    bl = expand_blacklist(("DELETE", "CREATE_TABLE"), {"a": ("DROP_TABLE",)}, "a")
    assert "CREATE_TABLE" not in bl
    assert "DELETE" in bl and "DROP_TABLE" in bl


def test_multi_table_two_instances_golden(spark, tmp_path):
    """3 tables, 2 instances: each instance applies only its routed
    tables; the union of both instances' work yields every table's
    exact oracle state, and no table was touched by both writers."""
    raw = generate_multi_changelog(_specs())
    log = str(tmp_path / "log")
    write_changelog(raw, log, 4)
    _mk_catalog_with_tables(spark, tmp_path / "cat")

    pipes = []
    for inst in range(2):
        cfg = MultiPipelineConfig(
            changelog_path=log,
            catalog_root=str(tmp_path / "cat"),
            checkpoint_dir=str(tmp_path / "ck"),
            tables=TABLES,
            generation=1,
            instance_id=inst,
            num_instances=2,
        )
        p = MultiTablePipeline(spark, cfg)
        p.run_batch()
        pipes.append(p)
    # routing: disjoint, covering
    t0, t1 = set(pipes[0].my_tables), set(pipes[1].my_tables)
    assert t0 | t1 == set(TABLES) and not (t0 & t1)

    cat = Catalog.load_or_create(spark, str(tmp_path / "cat"))
    for t in TABLES:
        expected = oracle_apply(raw[raw["tbl"] == t])
        actual = cat.table(t).read().toPandas()
        assert_pdf_equal(actual, expected, ["conv_id", "turn_idx"])
        # single writer per table (per-instance writer ids)
        writers = {
            s["writer-id"]
            for s in cat.table(t).snapshot_summaries()
            if "writer-id" in s
        }
        assert len(writers) == 1


def test_multi_table_streaming_matches_batch(spark, tmp_path):
    raw = generate_multi_changelog(_specs(500))
    log = str(tmp_path / "log")
    write_changelog(raw, log, 6)
    _mk_catalog_with_tables(spark, tmp_path / "cat")
    cfg = MultiPipelineConfig(
        changelog_path=log,
        catalog_root=str(tmp_path / "cat"),
        checkpoint_dir=str(tmp_path / "ck"),
        tables=TABLES,
        generation=1,
        max_files_per_trigger=2,
    )
    p = MultiTablePipeline(spark, cfg)
    p.run_stream_to_completion()
    assert len(p.stats) >= 2  # several micro-batches
    cat = p.catalog
    for t in TABLES:
        assert_pdf_equal(
            cat.table(t).read().toPandas(),
            oracle_apply(raw[raw["tbl"] == t]),
            ["conv_id", "turn_idx"],
        )


def _ddl_row(tbl, seq, ddl):
    return {
        "tbl": tbl, "seq": seq, "op": ddl["op"], "conv_id": None,
        "turn_idx": None, "is_snapshot": False, "role": None, "text": None,
        "tool": None, "ts": pd.NaT, "prev_text": None, "ingest_ts": pd.NaT,
        "ddl": json.dumps(ddl),
    }


def _transcript_columns_ddl(tbl):
    return {
        "op": "CREATE_TABLE",
        "table": tbl,
        "columns": [
            {"name": "conv_id", "type": "string", "nullable": False},
            {"name": "turn_idx", "type": "int", "nullable": False},
            {"name": "role", "type": "string"},
            {"name": "text", "type": "string"},
            {"name": "tool", "type": "string"},
            {"name": "ts", "type": "timestamp"},
        ],
        "primary_key": ["conv_id", "turn_idx"],
        "bucket_col": "conv_id",
        "num_buckets": 8,
    }


def test_drop_and_recreate_mid_stream_exactly_once(spark, tmp_path):
    """A table is DROPped and reCREATEd mid-stream: pre-drop events
    never leak into the new incarnation (create_seq fencing), post-
    create events land exactly once, and a full replay under the same
    writer changes nothing."""
    raw = generate_multi_changelog({"alpha": ChangelogSpec(n_events=600, n_convs=10, seed=61, n_files=1)})
    raw["seq"] = raw["seq"] * 10  # leave gaps for injected DDL seqs
    cut = int(len(raw) * 0.6)
    drop_seq = int(raw["seq"].iloc[cut]) + 1
    create_seq = drop_seq + 2
    ddls = pd.DataFrame(
        [
            _ddl_row("alpha", drop_seq, {"op": "DROP_TABLE", "table": "alpha"}),
            _ddl_row("alpha", create_seq, _transcript_columns_ddl("alpha")),
        ]
    )
    full = pd.concat(
        [raw.iloc[: cut + 1], ddls, raw.iloc[cut + 1 :]], ignore_index=True
    )
    full["turn_idx"] = full["turn_idx"].astype("Int32")
    log = str(tmp_path / "log")
    write_changelog(full, log, 3)
    _mk_catalog_with_tables(spark, tmp_path / "cat", ["alpha"])

    cfg = MultiPipelineConfig(
        changelog_path=log,
        catalog_root=str(tmp_path / "cat"),
        checkpoint_dir=str(tmp_path / "ck"),
        tables=("alpha",),
        generation=1,
        max_files_per_trigger=1,
    )
    p = MultiTablePipeline(spark, cfg)
    p.run_stream_to_completion()
    cat = p.catalog.refresh()
    # only post-create events shape the final state
    expected = oracle_apply(full[(full["seq"] > create_seq) & full["ddl"].isna()])
    actual = cat.table("alpha").read().toPandas()
    assert_pdf_equal(actual, expected, ["conv_id", "turn_idx"])
    # replay everything again (new pipeline object, same writer):
    # markers + catalog ddl marks keep it a no-op
    v_before = cat.table("alpha").metadata["version"]
    p2 = MultiTablePipeline(spark, cfg)
    p2.run_batch(batch_id="replay-everything")
    cat2 = p2.catalog.refresh()
    assert_pdf_equal(
        cat2.table("alpha").read().toPandas(), expected, ["conv_id", "turn_idx"]
    )


def test_truncate_table_mid_batch(spark, tmp_path):
    """TRUNCATE wipes prior state; later events rebuild it; replayed
    pre-truncate sub-batches stay skipped."""
    raw = generate_multi_changelog({"alpha": ChangelogSpec(n_events=400, n_convs=8, seed=62, n_files=1)})
    raw["seq"] = raw["seq"] * 10
    cut = int(len(raw) * 0.5)
    tseq = int(raw["seq"].iloc[cut]) + 1
    ddls = pd.DataFrame([_ddl_row("alpha", tseq, {"op": "TRUNCATE_TABLE", "table": "alpha"})])
    full = pd.concat([raw.iloc[: cut + 1], ddls, raw.iloc[cut + 1 :]], ignore_index=True)
    full["turn_idx"] = full["turn_idx"].astype("Int32")
    log = str(tmp_path / "log")
    write_changelog(full, log, 2)
    _mk_catalog_with_tables(spark, tmp_path / "cat", ["alpha"])
    cfg = MultiPipelineConfig(
        changelog_path=log,
        catalog_root=str(tmp_path / "cat"),
        checkpoint_dir=str(tmp_path / "ck"),
        tables=("alpha",),
        generation=1,
    )
    p = MultiTablePipeline(spark, cfg)
    p.run_batch()
    expected = oracle_apply(full[(full["seq"] > tseq) & full["ddl"].isna()])
    assert_pdf_equal(
        p.catalog.table("alpha").read().toPandas(), expected, ["conv_id", "turn_idx"]
    )


def test_rename_table_catalog_level(spark, tmp_path):
    cat = _mk_catalog_with_tables(spark, tmp_path / "cat", ["alpha"])
    path_before = cat.table_path("alpha")
    assert cat.rename_table("alpha", "omega")
    assert cat.list_tables() == ["omega"]
    assert cat.table_path("omega") == path_before  # pure metadata move
    # replayed rename is a no-op; conflicting rename raises
    assert cat.rename_table("alpha", "omega") is False
    with pytest.raises(ValueError):
        cat.rename_table("missing", "other")


def test_events_for_unknown_table_dropped(spark, tmp_path):
    """DML addressed to a table that does not exist (never created or
    already dropped) is ignored, not an error (reference: events for
    unconfigured tables are dropped)."""
    raw = generate_multi_changelog(
        {
            "alpha": ChangelogSpec(n_events=200, n_convs=5, seed=63, n_files=1),
            "ghost": ChangelogSpec(n_events=200, n_convs=5, seed=64, n_files=1),
        }
    )
    log = str(tmp_path / "log")
    write_changelog(raw, log, 2)
    _mk_catalog_with_tables(spark, tmp_path / "cat", ["alpha"])  # no ghost
    cfg = MultiPipelineConfig(
        changelog_path=log,
        catalog_root=str(tmp_path / "cat"),
        checkpoint_dir=str(tmp_path / "ck"),
        tables=("alpha", "ghost"),
        generation=1,
    )
    p = MultiTablePipeline(spark, cfg)
    p.run_batch()
    assert_pdf_equal(
        p.catalog.table("alpha").read().toPandas(),
        oracle_apply(raw[raw["tbl"] == "alpha"]),
        ["conv_id", "turn_idx"],
    )
    assert not p.catalog.has_table("ghost")


def test_per_table_transforms_applied(spark, tmp_path):
    """F4 in the multi-table path: each table gets its own transform
    chain (reference: per-column Transformation directives)."""
    from pyspark.sql import functions as F

    raw = generate_multi_changelog(
        {t: ChangelogSpec(n_events=200, n_convs=5, seed=70 + i, n_files=1)
         for i, t in enumerate(["alpha", "beta"])}
    )
    log = str(tmp_path / "log")
    write_changelog(raw, log, 1)
    _mk_catalog_with_tables(spark, tmp_path / "cat", ["alpha", "beta"])
    cfg = MultiPipelineConfig(
        changelog_path=log,
        catalog_root=str(tmp_path / "cat"),
        checkpoint_dir=str(tmp_path / "ck"),
        tables=("alpha", "beta"),
        generation=1,
        per_table_transforms={
            "alpha": lambda df: df.withColumn("text", F.upper("text"))
        },
    )
    p = MultiTablePipeline(spark, cfg)
    p.run_batch()
    a = p.catalog.table("alpha").read().toPandas()
    b = p.catalog.table("beta").read().toPandas()
    assert (a["text"].dropna() == a["text"].dropna().str.upper()).all()
    assert not (b["text"].dropna() == b["text"].dropna().str.upper()).all()


def test_database_ddl_catalog_level(spark, tmp_path):
    cat = _mk_catalog_with_tables(spark, tmp_path / "cat", ["db1.alpha", "gamma"])
    assert cat.list_databases() == ["db1", "default"]
    assert cat.create_database("db2")
    assert not cat.create_database("db2")  # replay no-op
    assert "db2" in cat.list_databases()
    assert cat.drop_database("db1")        # cascades over db1.alpha
    assert cat.list_tables() == ["gamma"]
    assert not cat.drop_database("db1")    # replay no-op
    assert cat.list_databases() == ["db2", "default"]


def test_drop_database_cascades_mid_stream(spark, tmp_path):
    """DROP_DATABASE fires after every affected table applied its
    pre-drop segment (global seq order), cascades over the whole
    namespace, and a recreated table is create_seq-fenced. Tables
    outside the database are untouched; full replay is a no-op."""
    raw = generate_multi_changelog(
        {
            "db1.alpha": ChangelogSpec(n_events=300, n_convs=6, seed=71, n_files=1),
            "db1.beta": ChangelogSpec(n_events=300, n_convs=6, seed=72, n_files=1),
            "gamma": ChangelogSpec(n_events=300, n_convs=6, seed=73, n_files=1),
        }
    )
    raw["seq"] = raw["seq"] * 10
    cut = int(len(raw) * 0.6)
    drop_seq = int(raw["seq"].iloc[cut]) + 1
    create_db_seq, create_tbl_seq = drop_seq + 2, drop_seq + 4
    ddls = pd.DataFrame(
        [
            _ddl_row("db1.alpha", drop_seq, {"op": "DROP_DATABASE", "database": "db1"}),
            _ddl_row("db1.alpha", create_db_seq, {"op": "CREATE_DATABASE", "database": "db1"}),
            _ddl_row("db1.alpha", create_tbl_seq, _transcript_columns_ddl("db1.alpha")),
        ]
    )
    full = pd.concat([raw.iloc[: cut + 1], ddls, raw.iloc[cut + 1 :]], ignore_index=True)
    full["turn_idx"] = full["turn_idx"].astype("Int32")
    log = str(tmp_path / "log")
    write_changelog(full, log, 2)
    _mk_catalog_with_tables(
        spark, tmp_path / "cat", ["db1.alpha", "db1.beta", "gamma"]
    )
    cfg = MultiPipelineConfig(
        changelog_path=log,
        catalog_root=str(tmp_path / "cat"),
        checkpoint_dir=str(tmp_path / "ck"),
        tables=("db1.alpha", "db1.beta", "gamma"),
        generation=1,
    )
    p = MultiTablePipeline(spark, cfg)
    p.run_batch()
    cat = p.catalog.refresh()
    # beta died with the database; alpha was recreated and fenced
    assert cat.list_tables() == ["db1.alpha", "gamma"]
    dml = full[full["ddl"].isna()]
    exp_alpha = oracle_apply(
        dml[(dml["tbl"] == "db1.alpha") & (dml["seq"] > create_tbl_seq)]
    )
    exp_gamma = oracle_apply(dml[dml["tbl"] == "gamma"])
    assert_pdf_equal(
        cat.table("db1.alpha").read().toPandas(), exp_alpha, ["conv_id", "turn_idx"]
    )
    assert_pdf_equal(
        cat.table("gamma").read().toPandas(), exp_gamma, ["conv_id", "turn_idx"]
    )
    # full replay under the same writer: markers + ddl marks keep it a no-op
    p2 = MultiTablePipeline(spark, cfg)
    p2.run_batch(batch_id="batch-0")
    cat2 = p2.catalog.refresh()
    assert cat2.list_tables() == ["db1.alpha", "gamma"]
    assert_pdf_equal(
        cat2.table("db1.alpha").read().toPandas(), exp_alpha, ["conv_id", "turn_idx"]
    )


def test_fused_demux_jobs_independent_of_table_count(spark, tmp_path):
    """Steady-state epochs use the fused single-pass demux: ONE write
    job + ONE metrics job (+ the DDL-probe collect) per micro-batch,
    regardless of table count — the per-table loop would be O(tables)
    driver-sequenced jobs (reference runs hundreds of tables per
    instance, DeltaWorker.java:594-620). Every table carries its OWN
    python transform chain (20 distinct transforms): transforms fuse
    into the same single write job, they must not force the loop."""
    from pyspark.sql import functions as F

    from delta_spark.multi import apply_multi_batch

    tables = tuple(f"t{i:02d}" for i in range(20))

    def _tfm(i, t):
        if i % 2 == 0:
            return lambda df: df.withColumn("text", F.upper("text"))
        return lambda df: df.withColumn(
            "text", F.concat(F.lit(f"[{t}] "), F.col("text"))
        )

    transforms = {t: _tfm(i, t) for i, t in enumerate(tables)}

    def _tfm_oracle(pdf, i, t):
        out = pdf.copy()
        if i % 2 == 0:
            out["text"] = out["text"].str.upper()
        else:
            out["text"] = out["text"].map(
                lambda x: f"[{t}] {x}" if x is not None else None
            )
        return out

    cat = _mk_catalog_with_tables(spark, tmp_path / "cat", tables)
    raw = generate_multi_changelog(
        {
            t: ChangelogSpec(n_events=60, n_convs=4, seed=100 + i, n_files=1)
            for i, t in enumerate(tables)
        }
    )
    cut = raw["seq"].median()
    for i, part in enumerate([raw[raw["seq"] <= cut], raw[raw["seq"] > cut]]):
        write_changelog(part.reset_index(drop=True), str(tmp_path / f"log{i}"), 1)
    from delta_spark.schema import CHANGELOG_SCHEMA
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("tbl", T.StringType(), True), *CHANGELOG_SCHEMA.fields]
    )
    df0 = spark.read.schema(schema).parquet(str(tmp_path / "log0"))
    # epoch 0: snapshot load (CoW loop path seeds every table)
    apply_multi_batch(
        cat, df0, "w-f", "e0", list(tables), merge_mode="auto",
        per_table_transforms=transforms,
    )
    for t in tables:
        assert cat.table(t).current_snapshot is not None

    # epoch 1: steady state → fused path; count Spark jobs
    df1 = spark.read.schema(schema).parquet(str(tmp_path / "log1"))
    sc = spark.sparkContext
    sc.setJobGroup("fused-epoch", "jobs-per-epoch probe")
    try:
        apply_multi_batch(
            cat, df1, "w-f", "e1", list(tables), merge_mode="auto",
            per_table_transforms=transforms,
        )
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup("fused-epoch")
        sc.setJobGroup(None, None)
    assert len(jobs) <= 5, f"expected O(1) jobs per epoch, got {len(jobs)}"
    assert len(jobs) < len(tables)

    # and the fused epoch is byte-equal to the (transformed) oracle per
    # table — the transform is per-row idempotent, so transforming the
    # oracle's final state equals transforming every event pre-merge
    for i, t in enumerate(tables):
        assert_pdf_equal(
            cat.table(t).read().toPandas(),
            _tfm_oracle(oracle_apply(raw[raw["tbl"] == t]), i, t),
            ["conv_id", "turn_idx"],
        )


def test_fused_demux_falls_back_on_column_ddl(spark, tmp_path):
    """The fused fast path guards column-level DDL via observe inside
    the write job (the observed frame feeds every union branch — the
    guard only needs zero/nonzero): a batch carrying ADD_COLUMN rows
    must fall back to the segmented loop and still match the oracle."""
    from delta_spark.multi import apply_multi_batch
    from delta_spark.schema import CHANGELOG_SCHEMA
    from pyspark.sql import types as T

    tables = ("fa", "fb", "fc")
    cat = _mk_catalog_with_tables(spark, tmp_path / "cat", tables)
    raw = generate_multi_changelog(
        {
            t: ChangelogSpec(n_events=300, n_convs=6, seed=200 + i, n_files=1)
            for i, t in enumerate(tables)
        }
    )
    cut = raw["seq"].median()
    first, second = raw[raw["seq"] <= cut], raw[raw["seq"] > cut]
    # inject a column-level DDL row for one table into the second epoch
    ddl = {"op": "ADD_COLUMN", "column": "extra", "new_type": "string"}
    drow = second.iloc[[0]].copy()
    drow["tbl"] = "fb"
    drow["op"] = "ADD_COLUMN"
    drow["ddl"] = json.dumps(ddl)
    # a fresh seq of its own — DDL events are sequenced like any other
    # (a reused seq would be indistinguishable from a replay duplicate)
    drow["seq"] = int(second["seq"].max()) + 1
    second = pd.concat([second, drow], ignore_index=True)
    for i, part in enumerate([first, second]):
        write_changelog(part.reset_index(drop=True), str(tmp_path / f"log{i}"), 1)
    schema = T.StructType(
        [T.StructField("tbl", T.StringType(), True), *CHANGELOG_SCHEMA.fields]
    )
    for i in range(2):
        df = spark.read.schema(schema).parquet(str(tmp_path / f"log{i}"))
        apply_multi_batch(cat, df, "w-fb", f"e{i}", list(tables), merge_mode="auto")
    # DDL landed (fallback path ran it)
    assert "extra" in [f["name"] for f in cat.table("fb").fields]
    # every table still exact vs oracle
    for t in tables:
        assert_pdf_equal(
            cat.table(t).read().toPandas()[
                ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            ],
            oracle_apply(raw[raw["tbl"] == t]),
            ["conv_id", "turn_idx"],
        )


def test_multi_table_wap_stage_and_publish_fleet(spark, tmp_path):
    """Fleet-wide write-audit-publish: every table's epochs stage on
    MultiPipelineConfig.branch (exercising BOTH the fused steady-state
    path and the CoW bootstrap), mains stay empty until
    Catalog.fast_forward_all publishes, after which each table equals
    its oracle. Re-running the publish is a no-op (idempotent resume
    after a crash mid-fleet)."""
    raw = generate_multi_changelog(_specs())
    # two chunks: chunk 1 bootstraps (CoW, per-table), chunk 2 lands
    # via the fused MoR demux — both must stage on the branch
    cut = raw["seq"].median()
    log1, log2 = str(tmp_path / "log1"), str(tmp_path / "log2")
    write_changelog(raw[raw["seq"] <= cut], log1, 2)
    write_changelog(raw[raw["seq"] > cut], log2, 2)
    _mk_catalog_with_tables(spark, tmp_path / "cat")

    for i, log in enumerate((log1, log2)):
        cfg = MultiPipelineConfig(
            changelog_path=log,
            catalog_root=str(tmp_path / "cat"),
            checkpoint_dir=str(tmp_path / f"ck{i}"),
            tables=TABLES,
            generation=1 + i,
            merge_mode="auto",
            branch="staged",
        )
        MultiTablePipeline(spark, cfg).run_batch()

    cat = Catalog.load_or_create(spark, str(tmp_path / "cat"))
    for t in TABLES:
        assert cat.table(t).read().count() == 0, f"{t}: main moved pre-publish"
        assert cat.table(t).read(branch="staged").count() > 0

    pub = cat.fast_forward_all("staged")
    assert set(pub) == set(TABLES) and all(v is not None for v in pub.values())
    for t in TABLES:
        expected = oracle_apply(raw[raw["tbl"] == t])
        assert_pdf_equal(
            cat.table(t).read().toPandas(), expected, ["conv_id", "turn_idx"]
        )
    # idempotent resume: publishing again changes nothing
    assert cat.fast_forward_all("staged", drop=True) == pub
    assert all("staged" not in cat.table(t).branches for t in TABLES)
