"""Fleet-wide downstream maintenance (round-5 roadmap items #3/#4):
per-table Iceberg publishing and materialized views in the multi-table
pipeline, plus advance_all — N views over one base sharing a single
pre-image change-feed scan.

Reference analog: every replicated target is independently consumable
downstream (delta-api/.../EventConsumer.java:39-76); here "downstream"
is the Iceberg ecosystem and incrementally-maintained summary tables,
and the fleet path gets the same hooks the single-table pipeline has.
"""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from delta_spark.catalog import Catalog
from delta_spark.changelog import (
    ChangelogSpec,
    generate_and_write,
    generate_multi_changelog,
    write_changelog,
)
from delta_spark.lake import LakeTable, MaterializedAggregate, advance_all
from delta_spark.multi import MultiPipelineConfig, MultiTablePipeline
from delta_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)
TABLES = ("alpha", "beta")


def _mk_base(spark, path, n=12):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", 8
    )
    rows = [
        (f"c{i}", 0, "user" if i % 2 else "assistant", "x" * (i + 1), "", TS,
         "INSERT", i + 1)
        for i in range(n)
    ]
    t.merge(spark.createDataFrame(rows, DDL), "w", "b0")
    return t


def _views(spark, t, root, k=3):
    """k distinct views over one base: group col alternates, measures
    differ — shared-scan fusion must not blur their definitions."""
    specs = [
        (["role"], {"sum_chars": "length(text)"}),
        (["role"], {}),
        (["tool"], {"sum_turns": "turn_idx + 1"}),
    ]
    return [
        MaterializedAggregate(spark, t, os.path.join(root, f"v{i}"), g, s)
        for i, (g, s) in enumerate(specs[:k])
    ]


def _check_view(mv, t):
    got = sorted(
        tuple(r) for r in mv.read().select(*mv.group_cols, "n_rows", *mv.sums)
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in t.read()
        .groupBy(*mv.group_cols)
        .agg(
            F.count("*").alias("n_rows"),
            *[
                F.sum(F.coalesce(F.expr(e), F.lit(0))).alias(n)
                for n, e in mv.sums.items()
            ],
        )
        .collect()
    )
    assert got == want


def _ice_current(dest: str) -> str:
    with open(os.path.join(dest, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    return os.path.join(dest, "metadata", f"v{v}.metadata.json")


def _spy_read_changes(monkeypatch):
    calls = []
    orig = LakeTable.read_changes

    def spy(self, *a, **k):
        calls.append((self.path, a, k))
        return orig(self, *a, **k)

    monkeypatch.setattr(LakeTable, "read_changes", spy)
    return calls


# ------------------------------------------------------- advance_all


def test_advance_all_shares_one_scan(spark, tmp_path, monkeypatch):
    """3 views, cursors in lockstep: each advance_all round costs ONE
    read_changes scan (not 3), and every view still equals its own
    batch GROUP BY."""
    t = _mk_base(spark, str(tmp_path / "t"))
    views = _views(spark, t, str(tmp_path / "mv"))
    calls = _spy_read_changes(monkeypatch)

    advance_all(views)
    assert len(calls) == 1, "bootstrap round: one shared scan"
    for v in views:
        _check_view(v, t)

    t.merge(
        spark.createDataFrame(
            [
                ("c1", 0, "assistant", "migrated", "tool-a", TS, "UPDATE", 500),
                ("c2", 0, None, None, None, None, "DELETE", 501),
                ("n1", 0, "system", "new", "tool-b", TS, "INSERT", 502),
            ],
            DDL,
        ),
        "w",
        "b1",
    )
    advance_all(views)
    assert len(calls) == 2, "steady state: still one scan per round"
    for v in views:
        _check_view(v, t)

    # nothing new → no scan at all
    advance_all(views)
    assert len(calls) == 2


def test_advance_all_mixed_cursors_and_wrong_base(spark, tmp_path, monkeypatch):
    """Divergent cursors group correctly: a view that missed a round
    folds its own wider range from its own scan; views on different
    base tables are refused up front."""
    t = _mk_base(spark, str(tmp_path / "t"))
    views = _views(spark, t, str(tmp_path / "mv"), k=2)
    views[0].advance()  # v0 ahead, v1 never advanced

    t.merge(
        spark.createDataFrame(
            [("c3", 0, "user", "longer now", "", TS, "UPDATE", 600)], DDL
        ),
        "w",
        "b1",
    )
    calls = _spy_read_changes(monkeypatch)
    epochs = advance_all(views)
    assert len(calls) == 2, "two distinct cursors → two scans"
    assert epochs[0] == epochs[1] == t.metadata["current_snapshot_id"]
    for v in views:
        _check_view(v, t)

    other = _mk_base(spark, str(tmp_path / "other"), n=4)
    with pytest.raises(ValueError, match="same base table"):
        advance_all([views[0], MaterializedAggregate(
            spark, other, str(tmp_path / "mv-x"), ["role"], {}
        )])


def test_pipeline_matview_specs_multiple_views(spark, tmp_path):
    """The single-table sink maintains matview_dest AND every
    matview_specs view per micro-batch, all in lockstep with the
    table head."""
    from delta_spark.pipeline import Pipeline, PipelineConfig

    spec = ChangelogSpec(n_events=1200, n_convs=20, seed=77, n_files=4)
    generate_and_write(str(tmp_path / "log"), spec)
    cfg = PipelineConfig(
        changelog_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        max_files_per_trigger=2,
        matview_dest=str(tmp_path / "mv0"),
        matview_group_cols=("role",),
        matview_sums={"sum_chars": "length(text)"},
        matview_specs=(
            {"dest": str(tmp_path / "mv1"), "group_cols": ("tool",),
             "sums": {"sum_turns": "turn_idx + 1"}},
        ),
    )
    Pipeline(spark, cfg).run_stream_to_completion()
    t = LakeTable.load(spark, cfg.table_path)
    for root, g, s in [
        (str(tmp_path / "mv0"), ["role"], {"sum_chars": "length(text)"}),
        (str(tmp_path / "mv1"), ["tool"], {"sum_turns": "turn_idx + 1"}),
    ]:
        mv = MaterializedAggregate(spark, t, root, g, s)
        assert mv._cursor() == t.metadata["current_snapshot_id"]
        _check_view(mv, t)


def test_pipeline_matview_spec_with_extrema(spark, tmp_path):
    """A matview_specs view carrying mins/maxs maintains MIN/MAX in
    lockstep with the streaming sink — deletes in the changelog
    exercise the extremal-retraction recompute path mid-stream, and
    the view still equals the batch GROUP BY over the final state."""
    from pyspark.sql import functions as F

    from delta_spark.pipeline import Pipeline, PipelineConfig

    spec = ChangelogSpec(
        n_events=1200, n_convs=20, seed=79, n_files=4, delete_frac=0.05
    )
    generate_and_write(str(tmp_path / "log"), spec)
    cfg = PipelineConfig(
        changelog_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        max_files_per_trigger=2,
        matview_specs=(
            {"dest": str(tmp_path / "mvx"), "group_cols": ("role",),
             "sums": {"sum_chars": "length(text)"},
             "mins": {"min_chars": "length(text)"},
             "maxs": {"max_chars": "length(text)"}},
        ),
    )
    Pipeline(spark, cfg).run_stream_to_completion()
    t = LakeTable.load(spark, cfg.table_path)
    mv = MaterializedAggregate(
        spark, t, str(tmp_path / "mvx"), ["role"],
        {"sum_chars": "length(text)"},
        mins={"min_chars": "length(text)"},
        maxs={"max_chars": "length(text)"},
    )
    assert mv._cursor() == t.metadata["current_snapshot_id"]
    import pandas as pd

    got = mv.read().toPandas().sort_values("role").reset_index(drop=True)
    want = (
        t.read()
        .groupBy("role")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("sum_chars"),
            F.min(F.length("text")).alias("min_chars"),
            F.max(F.length("text")).alias("max_chars"),
        )
        .toPandas()
        .sort_values("role")
        .reset_index(drop=True)
    )
    cols = ["role", "n_rows", "sum_chars", "min_chars", "max_chars"]
    pd.testing.assert_frame_equal(
        got[cols].astype({c: "Int64" for c in cols[1:]}),
        want[cols].astype({c: "Int64" for c in cols[1:]}),
    )


# ------------------------------------------------ fleet downstream hooks


def _fleet_cfg(tmp_path, log, **kw):
    return MultiPipelineConfig(
        changelog_path=log,
        catalog_root=str(tmp_path / "cat"),
        checkpoint_dir=str(tmp_path / "ck"),
        tables=TABLES,
        generation=1,
        **kw,
    )


def _mk_fleet(spark, tmp_path, n=600, n_files=3):
    raw = generate_multi_changelog({
        t: ChangelogSpec(n_events=n, n_convs=10, seed=60 + i, n_files=1)
        for i, t in enumerate(TABLES)
    })
    log = str(tmp_path / "log")
    write_changelog(raw, log, n_files)
    cat = Catalog.load_or_create(spark, str(tmp_path / "cat"))
    for t in TABLES:
        cat.create_table(t, TRANSCRIPT_SCHEMA, KEY_COLS, "conv_id", 8)
    return log, cat


def test_multi_table_publish_and_matviews(spark, tmp_path):
    """Per-table Iceberg publishing + per-table matviews in the fleet
    path: after a multi-epoch streaming run, every table's Iceberg copy
    reads row-equal to the lake table and every view equals its batch
    GROUP BY — parity with the single-table pipeline's hooks."""
    from delta_spark.lake.iceberg import read_iceberg_spark

    log, cat = _mk_fleet(spark, tmp_path)
    ice = {t: str(tmp_path / f"ice-{t}") for t in TABLES}
    cfg = _fleet_cfg(
        tmp_path,
        log,
        max_files_per_trigger=1,
        publish_iceberg_dests=ice,
        matview_specs={
            "alpha": {"dest": str(tmp_path / "mv-alpha"),
                      "group_cols": ("role",),
                      "sums": {"sum_chars": "length(text)"}},
            # beta exercises the list form: two views, one shared scan
            "beta": [
                {"dest": str(tmp_path / "mv-beta0"),
                 "group_cols": ("role",), "sums": {}},
                {"dest": str(tmp_path / "mv-beta1"),
                 "group_cols": ("tool",),
                 "sums": {"sum_turns": "turn_idx + 1"}},
            ],
        },
    )
    p = MultiTablePipeline(spark, cfg)
    p.run_stream_to_completion()
    assert len(p.stats) >= 2, "several epochs, several downstream rounds"

    cat = cat.refresh()
    for t in TABLES:
        h = cat.table(t)
        got = sorted(
            tuple(r)
            for r in read_iceberg_spark(_ice_current(ice[t]), spark).collect()
        )
        assert got == sorted(tuple(r) for r in h.read().collect()), t

    alpha = cat.table("alpha")
    _check_view(
        MaterializedAggregate(
            spark, alpha, str(tmp_path / "mv-alpha"), ["role"],
            {"sum_chars": "length(text)"},
        ),
        alpha,
    )
    beta = cat.table("beta")
    _check_view(
        MaterializedAggregate(spark, beta, str(tmp_path / "mv-beta0"),
                              ["role"], {}),
        beta,
    )
    _check_view(
        MaterializedAggregate(
            spark, beta, str(tmp_path / "mv-beta1"), ["tool"],
            {"sum_turns": "turn_idx + 1"},
        ),
        beta,
    )


def test_multi_wap_downstream_reads_main_only(spark, tmp_path):
    """Under fleet WAP staging, unaudited staged rows must NOT leak
    into Iceberg publishes or matviews: while staging, downstream sees
    the frozen (empty) main; after fast_forward_all the next downstream
    round catches both up to the published state."""
    from delta_spark.lake.iceberg import read_iceberg_spark

    log, cat = _mk_fleet(spark, tmp_path, n=300, n_files=1)
    ice = {t: str(tmp_path / f"ice-{t}") for t in TABLES}
    cfg = _fleet_cfg(
        tmp_path,
        log,
        branch="stage",
        publish_iceberg_dests=ice,
        matview_specs={
            "alpha": {"dest": str(tmp_path / "mv-alpha"),
                      "group_cols": ("role",),
                      "sums": {"sum_chars": "length(text)"}},
        },
    )
    p = MultiTablePipeline(spark, cfg)
    p.run_batch()

    cat = cat.refresh()
    for t in TABLES:
        assert cat.table(t).read(branch="stage").count() > 0, "staged"
        assert cat.table(t).read().count() == 0, "main frozen"
        # the Iceberg copy tracked MAIN: published but empty
        assert read_iceberg_spark(_ice_current(ice[t]), spark).count() == 0
    mv = MaterializedAggregate(
        spark, cat.table("alpha"), str(tmp_path / "mv-alpha"), ["role"],
        {"sum_chars": "length(text)"},
    )
    assert mv.read().count() == 0, "no staged rows in the view"

    # auditor publishes the fleet; the next downstream round catches up
    cat.fast_forward_all("stage")
    p._downstream(0)
    cat = cat.refresh()
    for t in TABLES:
        h = cat.table(t)
        assert h.read().count() > 0
        got = sorted(
            tuple(r)
            for r in read_iceberg_spark(_ice_current(ice[t]), spark).collect()
        )
        assert got == sorted(tuple(r) for r in h.read().collect()), t
    alpha = cat.table("alpha")
    _check_view(
        MaterializedAggregate(
            spark, alpha, str(tmp_path / "mv-alpha"), ["role"],
            {"sum_chars": "length(text)"},
        ),
        alpha,
    )


def test_downstream_skips_unmoved_tables(spark, tmp_path, monkeypatch):
    """Epochs that leave a table's MAIN untouched (no routed events,
    WAP staging) must not re-run its publish/matview machinery: the
    per-table head cache makes the downstream hook O(moved tables),
    not O(configured tables) — at fleet scale an idle table costs
    nothing. First publish of a never-committed table still happens
    (an empty head is not "already published")."""
    import delta_spark.lake.iceberg as ice_mod
    from delta_spark.lake import materialized as mat_mod

    log, cat = _mk_fleet(spark, tmp_path, n=200, n_files=1)
    pub_calls, adv_calls = [], []
    orig_pub = ice_mod.publish_iceberg
    orig_adv = mat_mod.advance_all
    monkeypatch.setattr(
        "delta_spark.lake.iceberg.publish_iceberg",
        lambda tbl, dest, **k: (pub_calls.append(tbl.path),
                                orig_pub(tbl, dest, **k))[1],
    )
    monkeypatch.setattr(
        "delta_spark.lake.materialized.advance_all",
        lambda views, **k: (adv_calls.append(len(views)),
                            orig_adv(views, **k))[1],
    )

    ice = {t: str(tmp_path / f"ice-{t}") for t in TABLES}
    cfg = _fleet_cfg(
        tmp_path,
        log,
        publish_iceberg_dests=ice,
        matview_specs={
            "alpha": {"dest": str(tmp_path / "mv-alpha"),
                      "group_cols": ("role",),
                      "sums": {"sum_chars": "length(text)"}},
        },
    )
    p = MultiTablePipeline(spark, cfg)

    # never-committed tables (head None): the FIRST downstream round
    # must still publish their (empty) Iceberg copies
    p._downstream(0)
    assert sorted(pub_calls) == sorted(
        p.catalog.refresh().table(t).path for t in TABLES
    )
    assert adv_calls == [1]
    for t in TABLES:
        assert os.path.exists(
            os.path.join(ice[t], "metadata", "version-hint.text")
        ), "empty table still published"

    # heads unmoved since → the next round is a pure cache hit
    pub_calls.clear(); adv_calls.clear()
    p._downstream(1)
    assert pub_calls == [] and adv_calls == []

    # events land on main → both hooks re-run, then go quiet again
    p.run_batch()
    assert sorted(set(pub_calls)) == sorted(
        p.catalog.refresh().table(t).path for t in TABLES
    )
    assert adv_calls and all(n == 1 for n in adv_calls)
    pub_calls.clear(); adv_calls.clear()
    p._downstream(2)
    assert pub_calls == [] and adv_calls == []


def test_fleet_publish_audit_covers_all_instances(spark, tmp_path,
                                                  monkeypatch, capsys):
    """--publish-on-clean-audit's gate must cover EVERYTHING
    fast_forward_all will publish — all branch-carrying catalog
    tables, not just the auditing instance's routed subset. A dirty
    table staged by ANOTHER instance (here: a null-keyed row on beta,
    routed to instance 1) holds the whole fleet back: exit 3, no
    publish, all mains untouched."""
    import json
    import sys as _sys

    import jobs.run_fleet as rf

    log, cat = _mk_fleet(spark, tmp_path, n=150, n_files=1)
    # instance 1's table gets a dirty staged row the auditor
    # (instance 0, which routes only alpha) did not stage itself
    beta = cat.table("beta").ensure_branch("stage")
    beta.merge(
        spark.createDataFrame(
            [(None, 0, "user", "poison", "", TS, "INSERT", 900_000)], DDL
        ),
        "w-dirty",
        "d0",
    )
    monkeypatch.setattr(_sys, "argv", [
        "run_fleet.py",
        "--changelog", log,
        "--catalog", str(tmp_path / "cat"),
        "--checkpoint", str(tmp_path / "ck"),
        "--tables", "alpha,beta",
        "--instance-id", "0", "--num-instances", "2",
        "--mode", "batch", "--generation", "1",
        "--branch", "stage",
        "--publish-on-clean-audit",
    ])
    with pytest.raises(SystemExit) as e:
        rf.main()
    assert e.value.code == 3
    out = [json.loads(line) for line in capsys.readouterr().out.splitlines()
           if line.startswith("{")]
    run = next(d for d in out if "my_tables" in d)
    assert run["my_tables"] == ["alpha"], "instance 0 routes alpha only"
    audit = next(d for d in out if "audit" in d)
    assert audit["published"] is False
    assert audit["audit"]["beta"]["null_keys"] >= 1, (
        "the publish gate must have audited the OTHER instance's table"
    )
    cat = cat.refresh()
    for t in TABLES:
        # staging epochs commit METADATA on main (seq markers), but a
        # dirty audit must leave every main free of staged DATA
        assert cat.table(t).read().count() == 0, (
            f"{t}: staged rows published despite a dirty fleet audit"
        )
        assert cat.table(t).read(branch="stage").count() > 0, "staged"
