"""Incrementally-maintained aggregates (lake.materialized) and the
pre-image change feed that powers them.

The invariant under test everywhere: after any sequence of base-table
commits and ``advance()`` calls, the view table equals the batch
``GROUP BY`` over the base table's current state — the definition of a
correct materialized view. Crash/restart safety is exercised through
the exactly-once marker cursor (no side state exists to desync)."""

import datetime

import pandas as pd
from pyspark.sql import functions as F

from delta_spark.lake import LakeTable, MaterializedAggregate
from delta_spark.schema import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)
DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)


def _mk(spark, path, n=20, buckets=8):
    t = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], "conv_id", buckets
    )
    rows = [
        (f"c{i}", 0, "user" if i % 2 else "assistant", "x" * (i + 1), "", TS,
         "INSERT", i + 1)
        for i in range(n)
    ]
    t.merge(spark.createDataFrame(rows, DDL), "w", "b0")
    return t


def _mv(spark, t, root):
    return MaterializedAggregate(
        spark, t, root, ["role"], {"sum_chars": "length(text)"}
    )


def _check(mv, t):
    """view table == batch GROUP BY over the base's current state."""
    got = (
        mv.read().toPandas().sort_values("role").reset_index(drop=True)
    )
    want = (
        t.read()
        .groupBy("role")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("sum_chars"),
        )
        .toPandas()
        .sort_values("role")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["role", "n_rows", "sum_chars"]].astype(
            {"n_rows": "int64", "sum_chars": "int64"}
        ),
        want.astype({"n_rows": "int64", "sum_chars": "int64"}),
    )


# ------------------------------------------------------ pre-image feed


def test_changes_pre_images_shape(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=6)
    sid = t.metadata["current_snapshot_id"]
    t.merge(
        spark.createDataFrame(
            [
                ("c1", 0, "user", "v2", "", TS, "UPDATE", 100),
                ("c2", 0, None, None, None, None, "DELETE", 101),
                ("c99", 0, "user", "new", "", TS, "INSERT", 102),
            ],
            DDL,
        ),
        "w",
        "b1",
    )
    ch = t.read_changes(sid, include_pre_images=True).collect()
    by = {}
    for r in ch:
        by.setdefault(r["conv_id"], {})[r["_change_type"]] = r
    # the update splits into pre (old payload + old seq) and post
    assert set(by["c1"]) == {"update_pre", "update_post"}
    assert by["c1"]["update_pre"]["text"] == "x" * 2  # c1 inserted as "xx"
    assert by["c1"]["update_pre"]["_seq"] == 2
    assert by["c1"]["update_post"]["text"] == "v2"
    assert by["c1"]["update_post"]["_seq"] == 100
    # inserts and deletes are one row, exactly as in plain mode
    assert set(by["c2"]) == {"delete"} and by["c2"]["delete"]["text"] == "x" * 3
    assert set(by["c99"]) == {"insert"}
    # plain mode is untouched: one compact row per changed key
    plain = t.read_changes(sid).collect()
    assert sorted(r["_change_type"] for r in plain) == [
        "delete", "insert", "update",
    ]


def test_changes_pre_images_from_beginning_all_inserts(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=5)
    ch = t.read_changes(None, include_pre_images=True)
    assert ch.filter(F.col("_change_type") != "insert").count() == 0
    assert ch.count() == 5


# ------------------------------------------------------ view maintenance


def test_matview_tracks_commits(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    mv = _mv(spark, t, str(tmp_path / "mv"))
    mv.advance()
    _check(mv, t)

    # update that MIGRATES a key between groups: retraction from
    # 'user', addition to 'assistant' — the case a non-pre-image feed
    # cannot maintain
    t.merge(
        spark.createDataFrame(
            [("c1", 0, "assistant", "migrated", "", TS, "UPDATE", 500)], DDL
        ),
        "w",
        "b1",
    )
    mv.advance()
    _check(mv, t)

    # in-group update changing only the measure
    t.merge(
        spark.createDataFrame(
            [("c3", 0, "user", "much longer text", "", TS, "UPDATE", 501)], DDL
        ),
        "w",
        "b2",
    )
    # plus deletes and inserts in the same range
    t.merge(
        spark.createDataFrame(
            [
                ("c2", 0, None, None, None, None, "DELETE", 502),
                ("n1", 0, "system", "brand new", "", TS, "INSERT", 503),
            ],
            DDL,
        ),
        "w",
        "b3",
    )
    mv.advance()  # two base commits folded in one advance
    _check(mv, t)


def test_matview_group_vanishes_at_zero(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=4)  # 2 user, 2 assistant
    mv = _mv(spark, t, str(tmp_path / "mv"))
    mv.advance()
    t.merge(
        spark.createDataFrame(
            [
                ("c1", 0, None, None, None, None, "DELETE", 600),
                ("c3", 0, None, None, None, None, "DELETE", 601),
            ],
            DDL,
        ),
        "w",
        "b1",
    )
    mv.advance()
    roles = {r["role"] for r in mv.read().collect()}
    assert roles == {"assistant"}, "emptied group must leave the view"
    _check(mv, t)


def test_matview_advance_idempotent_and_restart(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    mv = _mv(spark, t, str(tmp_path / "mv"))
    to1 = mv.advance()
    assert mv.advance() == to1, "nothing new → cursor unchanged"
    _check(mv, t)

    # crash/restart: a FRESH instance recovers the cursor from the
    # view's own markers; more base commits since the last fold must
    # produce exactly one application of the missing range
    t.merge(
        spark.createDataFrame(
            [("c1", 0, "user", "after restart", "", TS, "UPDATE", 700)], DDL
        ),
        "w",
        "b1",
    )
    mv2 = _mv(spark, t, str(tmp_path / "mv"))
    assert mv2._cursor() == to1
    mv2.advance()
    _check(mv2, t)
    # replaying the same advance on yet another instance is a no-op
    mv3 = _mv(spark, t, str(tmp_path / "mv"))
    assert mv3.advance() == mv2._cursor()
    _check(mv3, t)


def test_matview_cursor_survives_view_expiry(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=6)
    mv = _mv(spark, t, str(tmp_path / "mv"))
    for i in range(7):  # many advances → many view snapshots
        t.merge(
            spark.createDataFrame(
                [(f"c{i}", 0, "user", f"v{i}!", "", TS, "UPDATE", 800 + i)], DDL
            ),
            "w",
            f"u{i}",
        )
        mv.advance()
    cur = mv._cursor()
    mv.view.expire_snapshots(keep_last=1)
    mv2 = _mv(spark, t, str(tmp_path / "mv"))
    assert mv2._cursor() == cur, "markers fold forward through expiry"
    _check(mv2, t)


def test_matview_expired_base_cursor_rebootstraps(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=6)
    mv = _mv(spark, t, str(tmp_path / "mv"))
    mv.advance()
    # the base races ahead and expires the cursor snapshot; one group
    # ('system') both appears and one key migrates out of 'user'
    for i, (role, seq) in enumerate([("system", 900), ("assistant", 901)]):
        t.merge(
            spark.createDataFrame(
                [(f"c{i}", 0, role, "rebooted", "", TS, "UPDATE", seq)], DDL
            ),
            "w",
            f"r{i}",
        )
    t.expire_snapshots(keep_last=1)
    assert mv.advance() == t.metadata["current_snapshot_id"]
    _check(mv, t)


def test_matview_streaming_sink(spark, tmp_path):
    """The pipeline's matview hook keeps the aggregate view in
    lockstep with the streaming sink: after a multi-epoch run the view
    equals the batch GROUP BY over the final table — each epoch folded
    its own change feed, none rescanned the base."""
    from delta_spark.changelog import ChangelogSpec, generate_and_write
    from delta_spark.pipeline import Pipeline, PipelineConfig

    spec = ChangelogSpec(n_events=2000, n_convs=30, seed=33, n_files=6)
    generate_and_write(str(tmp_path / "log"), spec)
    cfg = PipelineConfig(
        changelog_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "tbl"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        max_files_per_trigger=2,
        matview_dest=str(tmp_path / "mv"),
        matview_group_cols=("role",),
        matview_sums={"sum_chars": "length(text)"},
    )
    p = Pipeline(spark, cfg)
    p.run_stream_to_completion()
    assert len(p.stats) >= 2  # several micro-batches, several advances
    t = LakeTable.load(spark, cfg.table_path)
    mv = _mv(spark, t, str(tmp_path / "mv"))
    assert mv._cursor() == t.metadata["current_snapshot_id"]
    _check(mv, t)


def test_matview_count_only_no_sums(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=8)
    mv = MaterializedAggregate(spark, t, str(tmp_path / "mv"), ["role"], {})
    mv.advance()
    t.merge(
        spark.createDataFrame(
            [("c1", 0, None, None, None, None, "DELETE", 950)], DDL
        ),
        "w",
        "b1",
    )
    mv.advance()
    got = {r["role"]: r["n_rows"] for r in mv.read().collect()}
    want = {
        r["role"]: r["n"]
        for r in t.read().groupBy("role").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_matview_sidecar_tracks_live_definition(spark, tmp_path):
    """matview.json is observability metadata, not authority: when the
    handle's definition differs from the sidecar (view re-created
    against a new base, directory copied elsewhere), instantiating the
    handle rewrites it — /v1/matview must never inspect the wrong
    base. An up-to-date sidecar is left untouched (no churn)."""
    import json
    import os

    t = _mk(spark, str(tmp_path / "t"), n=6)
    root = str(tmp_path / "mv")
    _mv(spark, t, root)
    p = os.path.join(root, "matview.json")
    with open(p) as f:
        body = json.load(f)
    assert body["base_path"] == os.path.abspath(t.path)

    # same spec → early return, file untouched (pin via mtime)
    os.utime(p, ns=(1, 1))
    _mv(spark, t, root)
    assert os.stat(p).st_mtime_ns == 1

    # stale sidecar (points at a foreign base) → rewritten to match
    # the handle doing the advancing
    with open(p, "w") as f:
        json.dump({**body, "base_path": "/nowhere/else"}, f)
    _mv(spark, t, root)
    with open(p) as f:
        assert json.load(f) == body

    # unreadable sidecar → rewritten, not crashed on
    with open(p, "w") as f:
        f.write("{not json")
    _mv(spark, t, root)
    with open(p) as f:
        assert json.load(f) == body


# ------------------------------------------------ MIN/MAX maintenance


def _mv_ext(spark, t, root):
    return MaterializedAggregate(
        spark, t, root, ["role"], {"sum_chars": "length(text)"},
        mins={"min_chars": "length(text)"},
        maxs={"max_chars": "length(text)"},
    )


def _check_ext(mv, t):
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


def test_extrema_insert_only_fold_no_recompute(spark, tmp_path, caplog):
    """Inserts fold extrema in O(1) (least/greatest) — no base-state
    recompute is ever planned for an insert-only epoch."""
    t = _mk(spark, str(tmp_path / "t"), n=10)
    mv = _mv_ext(spark, t, str(tmp_path / "mv"))
    mv.advance()
    _check_ext(mv, t)
    t.merge(
        spark.createDataFrame(
            [("c100", 0, "user", "y" * 99, "", TS, "INSERT", 200),
             ("c101", 0, "newrole", "z", "", TS, "INSERT", 201)],
            DDL,
        ),
        "w", "b-ins",
    )
    import logging
    with caplog.at_level(logging.WARNING, logger="delta_spark.materialized"):
        mv.advance()
    assert not any("extremal retraction" in r.message for r in caplog.records)
    _check_ext(mv, t)


def test_extrema_nonextremal_retraction_skips_recompute(spark, tmp_path, caplog):
    """Deleting a row that holds no extremum must not trigger the
    group recompute — counts and sums fold, extrema stand."""
    t = _mk(spark, str(tmp_path / "t"), n=10)
    mv = _mv_ext(spark, t, str(tmp_path / "mv"))
    mv.advance()
    # c5 ('user', len 6) is neither min (len 2: c1) nor max (len 10: c9)
    t.merge(
        spark.createDataFrame(
            [("c5", 0, None, None, None, None, "DELETE", 300)], DDL
        ),
        "w", "b-del-mid",
    )
    import logging
    with caplog.at_level(logging.WARNING, logger="delta_spark.materialized"):
        mv.advance()
    assert not any("extremal retraction" in r.message for r in caplog.records)
    _check_ext(mv, t)


def test_extrema_extremal_retraction_absorbed_by_reservoir(
    spark, tmp_path, caplog
):
    """Deleting the current max is ABSORBED by the per-group top-K
    reservoir — second place is already in the view row, no base-state
    recompute runs, and the answer lands exactly on the batch one.
    (Pre-reservoir behavior: every extremal retraction forced a
    recompute of the group — the round-4 perf-weak finding.)"""
    t = _mk(spark, str(tmp_path / "t"), n=10)
    mv = _mv_ext(spark, t, str(tmp_path / "mv"))
    mv.advance()
    # c9 holds the 'user' max (len 10); delete it
    t.merge(
        spark.createDataFrame(
            [("c9", 0, None, None, None, None, "DELETE", 301)], DDL
        ),
        "w", "b-del-max",
    )
    import logging
    with caplog.at_level(logging.WARNING, logger="delta_spark.materialized"):
        mv.advance()
    assert not any(
        "extremal retraction" in r.message for r in caplog.records
    )
    _check_ext(mv, t)


def test_extrema_update_moves_extremum(spark, tmp_path):
    """An update whose pre-image held the min retracts it (recompute)
    while its post-image may set a new max elsewhere — both epochs must
    land on the batch answer."""
    t = _mk(spark, str(tmp_path / "t"), n=10)
    mv = _mv_ext(spark, t, str(tmp_path / "mv"))
    mv.advance()
    # c1 is the 'user' min (len 2) → becomes the new max (len 50)
    t.merge(
        spark.createDataFrame(
            [("c1", 0, "user", "w" * 50, "", TS, "UPDATE", 400)], DDL
        ),
        "w", "b-upd",
    )
    mv.advance()
    _check_ext(mv, t)
    # and a tie: two rows share the max; deleting one keeps it
    t.merge(
        spark.createDataFrame(
            [("c200", 0, "user", "q" * 50, "", TS, "INSERT", 401)], DDL
        ),
        "w", "b-tie",
    )
    mv.advance()
    t.merge(
        spark.createDataFrame(
            [("c200", 0, None, None, None, None, "DELETE", 402)], DDL
        ),
        "w", "b-del-tie",
    )
    mv.advance()
    _check_ext(mv, t)


def test_extrema_group_vanishes(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=3)  # assistant: c0, c2; user: c1
    mv = _mv_ext(spark, t, str(tmp_path / "mv"))
    mv.advance()
    t.merge(
        spark.createDataFrame(
            [("c1", 0, None, None, None, None, "DELETE", 500)], DDL
        ),
        "w", "b-gone",
    )
    mv.advance()
    assert {r["role"] for r in mv.read().collect()} == {"assistant"}
    _check_ext(mv, t)


def test_extrema_rebootstrap_after_expiry(spark, tmp_path):
    """Expired cursor → the absolute rebootstrap path carries the
    extrema too."""
    t = _mk(spark, str(tmp_path / "t"), n=8)
    mv = _mv_ext(spark, t, str(tmp_path / "mv"))
    mv.advance()
    t.merge(
        spark.createDataFrame(
            [("c0", 0, None, None, None, None, "DELETE", 600),
             ("c50", 0, "user", "long" * 30, "", TS, "INSERT", 601)],
            DDL,
        ),
        "w", "b-x",
    )
    t.expire_snapshots(keep_last=1)
    t2 = LakeTable.load(mv.spark, t.path)
    mv2 = _mv_ext(spark, t2, str(tmp_path / "mv"))
    mv2.advance()
    _check_ext(mv2, t2)


def test_extrema_measure_name_collisions_refused(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), n=3)
    import pytest
    with pytest.raises(ValueError, match="distinct"):
        MaterializedAggregate(
            spark, t, str(tmp_path / "mv"), ["role"],
            {"m": "length(text)"}, mins={"m": "length(text)"},
        )


def test_reservoir_absorbs_k_retractions_then_drains(
    spark, tmp_path, caplog, monkeypatch
):
    """The reservoir contract end-to-end on a group BIGGER than K
    (incomplete reservoir): K-1 extremal retractions are absorbed with
    ZERO base-state scans (spied), the K-th drains the reservoir and
    triggers exactly one logged recompute that refills it, after which
    absorption resumes — and every epoch lands on the batch answer."""
    import logging

    K = 4
    t = _mk(spark, str(tmp_path / "t"), n=30)  # 'user': 15 rows, lens 2..30
    mv = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["role"], {},
        maxs={"max_chars": "length(text)"}, reservoir_k=K,
    )
    mv.advance()

    # _with_res is the refill path: it runs ONLY on recompute (and
    # rebootstrap) — an absorbed retraction must never reach it
    base_reads = []
    orig_res = MaterializedAggregate._with_res

    def spy(self, state):
        base_reads.append(1)
        return orig_res(self, state)

    monkeypatch.setattr(MaterializedAggregate, "_with_res", spy)

    # delete the top K-1 'user' rows one epoch each: absorbed, no scan
    seq = 800
    tops = [29, 27, 25]  # lens 30, 28, 26 — the current top-3
    with caplog.at_level(logging.WARNING, logger="delta_spark.materialized"):
        for i, c in enumerate(tops):
            t.merge(
                spark.createDataFrame(
                    [(f"c{c}", 0, None, None, None, None, "DELETE", seq + i)],
                    DDL,
                ),
                "w", f"b-abs-{i}",
            )
            mv.advance()
            _check_reservoir_max(mv, t)
    assert not any("extremal retraction" in r.message for r in caplog.records)
    assert base_reads == []  # K-1 extremal retractions, zero base scans

    # the K-th extremal retraction drains the reservoir → ONE recompute
    t.merge(
        spark.createDataFrame(
            [("c23", 0, None, None, None, None, "DELETE", 810)], DDL
        ),
        "w", "b-drain",
    )
    with caplog.at_level(logging.WARNING, logger="delta_spark.materialized"):
        mv.advance()
    msgs = [r.message for r in caplog.records if "extremal retraction" in r.message]
    assert msgs and "1 group(s)" in msgs[-1]
    assert len(base_reads) == 1  # exactly the one refill scan
    _check_reservoir_max(mv, t)

    # refilled: the next extremal retraction is absorbed again
    caplog.clear()
    t.merge(
        spark.createDataFrame(
            [("c21", 0, None, None, None, None, "DELETE", 811)], DDL
        ),
        "w", "b-post",
    )
    with caplog.at_level(logging.WARNING, logger="delta_spark.materialized"):
        mv.advance()
    assert not any("extremal retraction" in r.message for r in caplog.records)
    assert len(base_reads) == 1
    _check_reservoir_max(mv, t)


def _check_reservoir_max(mv, t):
    got = {
        r["role"]: (r["n_rows"], r["max_chars"])
        for r in mv.read().collect()
    }
    want = {
        r["role"]: (r["n_rows"], r["max_chars"])
        for r in t.read()
        .groupBy("role")
        .agg(
            F.count("*").alias("n_rows"),
            F.max(F.length("text")).alias("max_chars"),
        )
        .collect()
    }
    assert got == want


def test_reservoir_complete_group_never_recomputes(spark, tmp_path, caplog):
    """A group with at most K live values carries a COMPLETE reservoir:
    deleting every row one by one — always the current extremum — never
    scans base state, and the group vanishes cleanly at zero."""
    import logging

    t = _mk(spark, str(tmp_path / "t"), n=6)  # 'user': c1,c3,c5 (3 rows)
    mv = MaterializedAggregate(
        spark, t, str(tmp_path / "mv"), ["role"], {},
        mins={"min_chars": "length(text)"}, reservoir_k=8,
    )
    mv.advance()
    with caplog.at_level(logging.WARNING, logger="delta_spark.materialized"):
        for i, c in enumerate([1, 3, 5]):  # always the current 'user' min
            t.merge(
                spark.createDataFrame(
                    [(f"c{c}", 0, None, None, None, None, "DELETE", 900 + i)],
                    DDL,
                ),
                "w", f"b-{i}",
            )
            mv.advance()
    assert not any("extremal retraction" in r.message for r in caplog.records)
    assert {r["role"] for r in mv.read().collect()} == {"assistant"}


def test_reservoir_update_churn_stays_exact(spark, tmp_path):
    """Update churn (retract pre-image + insert post-image in one
    epoch) across the extremes keeps the view on the batch answer."""
    t = _mk(spark, str(tmp_path / "t"), n=12)
    mv = _mv_ext(spark, t, str(tmp_path / "mv"))
    mv.advance()
    # shrink the max, grow the min, twice over
    for i, (c, ln) in enumerate([(11, 3), (1, 40), (9, 1), (3, 2)]):
        t.merge(
            spark.createDataFrame(
                [(f"c{c}", 0, "user", "y" * ln, "", TS, "UPDATE", 950 + i)],
                DDL,
            ),
            "w", f"b-u{i}",
        )
        mv.advance()
        _check_ext(mv, t)


def test_legacy_view_without_reservoirs_upgrades_in_place(spark, tmp_path):
    """A pre-reservoir extrema view (no _res_ columns) must not brick
    on reopen: the maintenance columns are schema-patched in place
    (metadata-only ADD_COLUMN), legacy rows read as NULL reservoirs,
    and the first epoch touching such a group refills it through the
    recompute path — landing on the batch answer."""
    t = _mk(spark, str(tmp_path / "t"), n=10)
    mv = _mv_ext(spark, t, str(tmp_path / "mv"))
    mv.advance()
    # simulate the legacy layout: drop the maintenance columns
    for n in ("min_chars", "max_chars"):
        mv.view.apply_ddl({"op": "DROP_COLUMN", "column": f"_res_{n}"})
    # reopen: patches the schema back instead of refusing
    mv2 = _mv_ext(spark, t, str(tmp_path / "mv"))
    assert {f"_res_min_chars", f"_res_max_chars"} <= {
        f.name for f in mv2.view.schema.fields
    }
    # an extremal retraction on the NULL-reservoir rows → lazy refill
    t.merge(
        spark.createDataFrame(
            [("c9", 0, None, None, None, None, "DELETE", 990)], DDL
        ),
        "w", "b-legacy",
    )
    mv2.advance()
    _check_ext(mv2, t)


def test_reservoir_fold_soundness_randomized(spark):
    """The reservoir fold's SOUNDNESS property against a brute-force
    model, 300 seeded random epochs in one evaluation: starting from a
    refilled reservoir state over multiset S0, after folding random
    retracts (a sub-multiset of S0) and inserts, either the fold flags
    a recompute (bad / drained — always safe) or its array is EXACTLY
    the j-best prefix of the true final multiset: the scalar head is
    the true extremum, and a complete reservoir is the whole multiset.
    Both polarities (min and max)."""
    import random

    from pyspark.sql import types as TT

    from delta_spark.lake.materialized import MaterializedAggregate

    K = 4
    rng = random.Random(20260820)
    cases = []
    for i in range(300):
        is_min = i % 2 == 0
        s0 = sorted(rng.randint(0, 5) for _ in range(rng.randint(0, 10)))
        retr = sorted(rng.sample(s0, rng.randint(0, len(s0))))
        ins = sorted(rng.randint(0, 5) for _ in range(rng.randint(0, 6)))
        # refilled reservoir over s0: the K best, complete iff all fit
        key = (lambda x: x) if is_min else (lambda x: -x)
        s0_sorted = sorted(s0, key=key)
        res_v = s0_sorted[:K]
        res_c = len(s0) <= K
        fin = list(s0)
        for r in retr:
            fin.remove(r)
        fin += ins
        cases.append(
            {
                "case_id": i,
                "is_min": is_min,
                "_o_n": len(s0) if s0 else None,  # empty s0 → new group
                "_o_res": {"v": res_v, "c": res_c} if s0 else None,
                "_ia": sorted(ins, key=key)[:K],
                "_ic": len(ins),
                "_ra": sorted(retr, key=key)[: K + 1],
                "final": sorted(fin, key=key),
            }
        )

    schema = TT.StructType(
        [
            TT.StructField("case_id", TT.IntegerType()),
            TT.StructField("is_min", TT.BooleanType()),
            TT.StructField("_o_n", TT.LongType(), True),
            TT.StructField(
                "_o_res",
                TT.StructType(
                    [
                        TT.StructField("v", TT.ArrayType(TT.LongType())),
                        TT.StructField("c", TT.BooleanType()),
                    ]
                ),
                True,
            ),
            TT.StructField("_ia", TT.ArrayType(TT.LongType())),
            TT.StructField("_ic", TT.LongType()),
            TT.StructField("_ra", TT.ArrayType(TT.LongType())),
        ]
    )
    rows = [
        (
            c["case_id"], c["is_min"], c["_o_n"], c["_o_res"],
            c["_ia"], c["_ic"], c["_ra"],
        )
        for c in cases
    ]
    df = spark.createDataFrame(rows, schema)

    class _Stub:
        reservoir_k = K

    out = {}
    for is_min in (True, False):
        part = df.filter(F.col("is_min") == is_min).select(
            "case_id",
            *[F.col(n).alias(f"{n}_x") for n in ("_ia", "_ic", "_ra")],
            "_o_n",
            "_o_res",
        )
        # the fold reads unsuffixed measure-named columns
        part = part.select(
            "case_id", "_o_n",
            F.col("_o_res").alias("_o_res_m"),
            F.col("_ia_x").alias("_ia_m"),
            F.col("_ic_x").alias("_ic_m"),
            F.col("_ra_x").alias("_ra_m"),
        )
        fin = MaterializedAggregate._reservoir_fold(_Stub(), "m", is_min)
        for r in part.withColumn("_fin", fin).collect():
            out[r["case_id"]] = r["_fin"]

    for c in cases:
        fin = out[c["case_id"]]
        v, comp, bad = list(fin["v"] or []), fin["c"], fin["bad"]
        final = c["final"]
        drained = len(v) == 0 and not comp
        if bad or drained:
            continue  # recompute path — always safe
        # prefix property: v is exactly the j best of the final multiset
        assert v == final[: len(v)], (c, v, final)
        if comp:
            # complete ⇒ the reservoir IS the whole live multiset
            assert v == final and len(final) <= K, (c, v, final)
        if v:
            assert v[0] == final[0], (c, v, final)  # true extremum
        else:
            # empty and not drained ⇒ complete with no live values
            assert comp and final == [], (c, v, final)
