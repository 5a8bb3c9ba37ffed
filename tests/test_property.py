"""Property-based (hypothesis) engine-vs-oracle equivalence.

The fixed-seed golden replays pin known-tricky fixtures; this test
lets hypothesis explore the generator's parameter space — event
volume, conversation skew, duplicate/out-of-order/delete mixes, batch
split points, CoW vs MoR apply — and shrink any failure to a minimal
counterexample. The property is the engine's core contract: after
merging an arbitrary changelog in arbitrary batch splits, the table
state equals the pandas reference replay (``oracle_apply``).

(The reference ships no property tests — SURVEY §5 — this goes beyond
its test strategy on purpose: the merge path has enough algebra in it
— seq guards, tombstones, argmax collapse, bucket pruning — that
randomized coverage earns its keep.)
"""

import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from conftest import assert_pdf_equal
from delta_spark.changelog import ChangelogSpec, generate_changelog, oracle_apply
from delta_spark.lake import LakeTable
from delta_spark.schema import TRANSCRIPT_SCHEMA

DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string, seq long"
)
COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "seq"]


@given(
    seed=st.integers(0, 2**20),
    n_events=st.integers(60, 500),
    n_convs=st.integers(2, 40),
    n_batches=st.integers(1, 4),
    mode=st.sampled_from(["cow", "mor", "auto"]),
)
@settings(max_examples=8, deadline=None)
def test_merge_equals_oracle_property(
    spark, seed, n_events, n_convs, n_batches, mode
):
    log = generate_changelog(
        ChangelogSpec(
            n_events=n_events, n_convs=n_convs, seed=seed, include_ddl=False
        )
    )
    d = tempfile.mkdtemp(prefix="prop_")
    try:
        t = LakeTable.create(
            spark, f"{d}/t", TRANSCRIPT_SCHEMA,
            ["conv_id", "turn_idx"], "conv_id", 8,
        )
        bounds = [round(i * len(log) / n_batches) for i in range(n_batches + 1)]
        for i in range(n_batches):
            chunk = log.iloc[bounds[i]:bounds[i + 1]]
            if chunk.empty:
                continue
            t.merge(
                spark.createDataFrame(chunk[COLS], DDL), "w", f"b{i}", mode=mode
            )
        assert_pdf_equal(
            t.read().toPandas(), oracle_apply(log), ["conv_id", "turn_idx"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(
    seed=st.integers(0, 2**20),
    n_events=st.integers(60, 400),
    n_convs=st.integers(2, 30),
    n_batches=st.integers(2, 5),
    mode=st.sampled_from(["cow", "mor", "auto"]),
    rebucket_to=st.sampled_from([None, 3, 16]),
    data=st.data(),
)
@settings(max_examples=8, deadline=None)
def test_read_changes_equals_state_diff_property(
    spark, seed, n_events, n_convs, n_batches, mode, rebucket_to, data
):
    """Property: for ANY merge history (random batch splits, CoW/MoR,
    optional mid-history rebucket + compact) and ANY retained snapshot
    pair (a, b), read_changes(a, b) equals the brute-force diff of the
    two time-travel reads — same keys, same classification, same
    payloads, and applying the feed to state(a) reproduces state(b)."""
    import pandas as pd

    log = generate_changelog(
        ChangelogSpec(
            n_events=n_events, n_convs=n_convs, seed=seed, include_ddl=False
        )
    )
    d = tempfile.mkdtemp(prefix="prop_ch_")
    try:
        t = LakeTable.create(
            spark, f"{d}/t", TRANSCRIPT_SCHEMA,
            ["conv_id", "turn_idx"], "conv_id", 4,
        )
        bounds = [round(i * len(log) / n_batches) for i in range(n_batches + 1)]
        for i in range(n_batches):
            chunk = log.iloc[bounds[i]:bounds[i + 1]]
            if not chunk.empty:
                t.merge(
                    spark.createDataFrame(chunk[COLS], DDL), "w", f"b{i}", mode=mode
                )
            if rebucket_to and i == n_batches // 2:
                t.rebucket(rebucket_to)
                t.compact(max_files_per_bucket=1)
        sids = [s["id"] for s in t.metadata["snapshots"]]
        if len(sids) < 2:
            return
        a = data.draw(st.sampled_from(sids[:-1]), label="from_sid")
        b = data.draw(st.sampled_from([s for s in sids if s > a]), label="to_sid")

        key = ["conv_id", "turn_idx"]
        sa = t.read(snapshot_id=a, include_system=True).toPandas()
        sb = t.read(snapshot_id=b, include_system=True).toPandas()
        sa_live = sa[~sa._deleted].set_index(key)
        sb_live = sb[~sb._deleted].set_index(key)
        feed = t.read_changes(a, b).toPandas().set_index(key)

        ins = set(sb_live.index) - set(sa_live.index)
        dels = set(sa_live.index) - set(sb_live.index)
        both = set(sa_live.index) & set(sb_live.index)
        upd = {
            k for k in both
            if sa_live.loc[k, "_seq"] != sb_live.loc[k, "_seq"]
            or (sa_live.loc[k, "_sort"] != sb_live.loc[k, "_sort"])
        }
        assert set(feed.index[feed._change_type == "insert"]) == ins
        assert set(feed.index[feed._change_type == "delete"]) == dels
        assert set(feed.index[feed._change_type == "update"]) == upd
        # payloads: inserts/updates carry state(b); deletes carry state(a)
        for k in ins | upd:
            assert feed.loc[k, "text"] == sb_live.loc[k, "text"], k
        for k in dels:
            assert feed.loc[k, "text"] == sa_live.loc[k, "text"], k
        # applying the feed onto state(a) reproduces state(b)
        applied = sa_live.drop(
            index=[k for k in feed.index if k in sa_live.index]
        )
        live_feed = feed[feed._change_type != "delete"]
        applied = pd.concat(
            [applied[["text"]], live_feed[["text"]]]
        ).sort_index()
        pd.testing.assert_frame_equal(
            applied, sb_live[["text"]].sort_index(), check_dtype=False
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(
    seed=st.integers(0, 2**20),
    n_events=st.integers(60, 400),
    n_convs=st.integers(2, 30),
    n_batches=st.integers(1, 4),
    mode=st.sampled_from(["cow", "mor", "auto"]),
    rebucket_to=st.sampled_from([None, 3, 16]),
    data=st.data(),
)
@settings(max_examples=8, deadline=None)
def test_read_ranges_equals_filter_property(
    spark, seed, n_events, n_convs, n_batches, mode, rebucket_to, data
):
    """Property: for ANY merge history (optionally spanning a mid-run
    rebucket — stats are value-based so spec evolution must not affect
    them) and ANY combination of range predicates (key and non-key,
    open/closed/inverted bounds), ``read(ranges=...)`` —
    manifest-stats file skipping included — equals the brute-force
    pandas filter of the full read, and the DuckDB interop reader
    returns the same rows. File skipping must never lose a row,
    whatever the MoR/CoW layout."""
    from delta_spark.lake.interop import read_duckdb

    log = generate_changelog(
        ChangelogSpec(
            n_events=n_events, n_convs=n_convs, seed=seed, include_ddl=False
        )
    )
    d = tempfile.mkdtemp(prefix="prop_rng_")
    try:
        t = LakeTable.create(
            spark, f"{d}/t", TRANSCRIPT_SCHEMA,
            ["conv_id", "turn_idx"], "conv_id", 4, stats_cols=["ts"],
        )
        bounds = [round(i * len(log) / n_batches) for i in range(n_batches + 1)]
        for i in range(n_batches):
            chunk = log.iloc[bounds[i]:bounds[i + 1]]
            if not chunk.empty:
                t.merge(
                    spark.createDataFrame(chunk[COLS], DDL), "w", f"b{i}", mode=mode
                )
            if rebucket_to and i == n_batches // 2:
                t.rebucket(rebucket_to)
                t.compact(max_files_per_bucket=1)
        full = t.read().toPandas()
        if full.empty:
            return
        convs = sorted(full.conv_id.unique())
        opt = lambda s: st.one_of(st.none(), s)  # noqa: E731
        c_lo = data.draw(opt(st.sampled_from(convs)), label="conv_lo")
        c_hi = data.draw(opt(st.sampled_from(convs)), label="conv_hi")
        t_lo = data.draw(
            opt(st.integers(0, int(full.turn_idx.max()))), label="turn_lo"
        )
        ts_vals = sorted(full.ts.dropna().unique())
        ts_lo = (
            data.draw(opt(st.sampled_from(ts_vals)), label="ts_lo")
            if ts_vals
            else None
        )
        ranges, mask = {}, full.conv_id.notna()
        if c_lo is not None or c_hi is not None:
            ranges["conv_id"] = (c_lo, c_hi)
            if c_lo is not None:
                mask &= full.conv_id >= c_lo
            if c_hi is not None:
                mask &= full.conv_id <= c_hi
        if t_lo is not None:
            ranges["turn_idx"] = (t_lo, None)
            mask &= full.turn_idx >= t_lo
        if ts_lo is not None:
            import pandas as pd

            ranges["ts"] = (pd.Timestamp(ts_lo).to_pydatetime(), None)
            mask &= full.ts >= ts_lo
        if not ranges:
            return
        want = full[mask].reset_index(drop=True)
        got = t.read(ranges=ranges).toPandas()
        assert_pdf_equal(got, want, ["conv_id", "turn_idx"])
        duck = read_duckdb(t.path, ranges=ranges).df()
        assert_pdf_equal(duck, want, ["conv_id", "turn_idx"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(
    seed=st.integers(0, 2**20),
    n_events=st.integers(80, 400),
    n_convs=st.integers(2, 30),
    n_batches=st.integers(1, 4),
    mode=st.sampled_from(["cow", "mor", "auto"]),
)
@settings(max_examples=6, deadline=None)
def test_apply_batch_with_ddl_equals_oracle_property(
    spark, seed, n_events, n_convs, n_batches, mode
):
    """Property: the FULL apply path (DDL-boundary sub-batches, schema
    evolution mid-stream, rename rewrite, lineage) over an arbitrary
    DDL-bearing changelog in arbitrary micro-batch splits equals the
    pandas oracle — the apply machinery, not just the merge algebra."""
    from delta_spark.apply import apply_batch

    log = generate_changelog(
        ChangelogSpec(
            n_events=n_events, n_convs=n_convs, seed=seed, include_ddl=True
        )
    )
    d = tempfile.mkdtemp(prefix="prop_ddl_")
    try:
        t = LakeTable.create(
            spark, f"{d}/t", TRANSCRIPT_SCHEMA,
            ["conv_id", "turn_idx"], "conv_id", 8,
        )
        cols = [c for c in log.columns]
        bounds = [round(i * len(log) / n_batches) for i in range(n_batches + 1)]
        for i in range(n_batches):
            chunk = log.iloc[bounds[i]:bounds[i + 1]]
            if chunk.empty:
                continue
            apply_batch(
                t,
                spark.createDataFrame(chunk[cols]),
                writer_id="w",
                batch_id=f"b{i}",
                merge_mode=mode,
            )
        got = t.refresh().read().toPandas()
        want = oracle_apply(log)
        assert sorted(got.columns) == sorted(want.columns)
        assert_pdf_equal(
            got.sort_index(axis=1),
            want.sort_index(axis=1),
            ["conv_id", "turn_idx"],
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(
    seed=st.integers(0, 2**20),
    n_events=st.integers(60, 400),
    n_convs=st.integers(2, 30),
    n_segs=st.integers(1, 4),
    wap_mask=st.integers(0, 15),
    aggressive_expiry=st.booleans(),
)
@settings(max_examples=8, deadline=None)
def test_wap_interleaved_equals_oracle_property(
    spark, seed, n_events, n_convs, n_segs, wap_mask, aggressive_expiry
):
    """Random log, random segmentation, each segment randomly applied
    straight to main or staged on a branch and published (WAP), with
    optional aggressive expiry between segments: the final main state
    must equal the plain LWW oracle — staging, fast-forward, branch
    GC, and expiry are all invisible to the replayed result."""
    log = generate_changelog(
        ChangelogSpec(
            n_events=n_events, n_convs=n_convs, seed=seed, include_ddl=False
        )
    )
    d = tempfile.mkdtemp(prefix="prop_wap_")
    try:
        t = LakeTable.create(
            spark, f"{d}/t", TRANSCRIPT_SCHEMA,
            ["conv_id", "turn_idx"], "conv_id", 4,
        )
        bounds = [round(i * len(log) / n_segs) for i in range(n_segs + 1)]
        for i in range(n_segs):
            chunk = log.iloc[bounds[i]:bounds[i + 1]]
            if chunk.empty:
                continue
            df = spark.createDataFrame(chunk[COLS], DDL)
            if wap_mask >> i & 1:
                if t.metadata["current_snapshot_id"] is None:
                    t._commit_snapshot(added=[], summary={"operation": "seed"})
                t.create_branch(f"s{i}")
                t.for_branch(f"s{i}").merge(df, "w", f"b{i}", mode="auto")
                t.refresh().fast_forward(f"s{i}")
                t.drop_branch(f"s{i}")
            else:
                t.merge(df, "w", f"b{i}", mode="auto")
            if aggressive_expiry:
                t.expire_snapshots(keep_last=1)
        assert_pdf_equal(
            t.read().toPandas(), oracle_apply(log), ["conv_id", "turn_idx"]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
