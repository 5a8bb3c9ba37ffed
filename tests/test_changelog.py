"""Generator invariants (FIXTURES.md §2 properties)."""

import numpy as np
import pandas as pd

from delta_spark.changelog import ChangelogSpec, generate_changelog, oracle_apply
from delta_spark.schema import DML_DELETE, DML_INSERT, DML_UPDATE


def _gen(**kw):
    return generate_changelog(ChangelogSpec(n_events=3000, n_convs=50, seed=7, **kw))


def test_deterministic():
    a, b = _gen(), _gen()
    pd.testing.assert_frame_equal(a, b)


def test_seq_contiguous_and_dups():
    df = _gen()
    seqs = df["seq"].to_numpy()
    uniq = np.unique(seqs)
    assert uniq[0] == 1 and uniq[-1] == len(uniq)  # contiguous after dedup
    assert len(seqs) > len(uniq)  # duplicate injections present
    dup_rows = df[df.duplicated("seq", keep=False)].groupby("seq").nunique()
    assert (dup_rows <= 1).all().all()  # duplicates are exact replays


def test_out_of_order_but_bounded():
    df = _gen()
    first = df.drop_duplicates("seq", keep="first")
    pos = np.arange(len(first))
    disp = np.abs(first["seq"].to_numpy() - 1 - pos)
    assert disp.max() > 0  # genuinely out of order
    spec = ChangelogSpec(n_events=3000, n_convs=50, seed=7)
    assert disp.max() <= 4 * spec.shuffle_window


def test_per_key_lifecycle():
    """INSERT first, DELETE (if any) strictly last per key, in seq order."""
    df = _gen().drop_duplicates("seq").sort_values("seq")
    dml = df[df["ddl"].isna()]
    g = dml.groupby(["conv_id", "turn_idx"])
    first_op = g["op"].first()
    assert (first_op == DML_INSERT).all()
    for (_, _), grp in list(g)[:200]:
        ops = grp["op"].tolist()
        if DML_DELETE in ops:
            assert ops[-1] == DML_DELETE
            assert ops.count(DML_DELETE) == 1


def test_hot_key_skew():
    df = _gen()
    stream = df[~df["is_snapshot"] & df["ddl"].isna()]
    share = (stream["conv_id"] == "c0").mean()
    assert share > 0.10  # hot conv holds a large share


def test_op_mix():
    df = _gen().drop_duplicates("seq")
    frac_upd = (df["op"] == DML_UPDATE).mean()
    frac_del = (df["op"] == DML_DELETE).mean()
    assert 0.05 < frac_upd < 0.5
    assert 0 < frac_del < 0.05


def test_ddl_rows_present_and_midstream():
    df = generate_changelog(ChangelogSpec(n_events=3000, n_convs=50, seed=7, include_ddl=True))
    ddl = df[df["ddl"].notna()].drop_duplicates("seq")
    assert len(ddl) == 3
    n = df["seq"].max()
    assert (ddl["seq"] > 1).all() and (ddl["seq"] < n).all()


def test_oracle_apply_basic():
    df = _gen()
    final = oracle_apply(df)
    # every surviving key appears once
    assert not final.duplicated(["conv_id", "turn_idx"]).any()
    # deleted keys are gone
    dedup = df.drop_duplicates("seq").sort_values("seq")
    dml = dedup[dedup["ddl"].isna()]
    last = dml.groupby(["conv_id", "turn_idx"]).tail(1)
    deleted = last[last["op"] == DML_DELETE]
    merged = final.merge(
        deleted[["conv_id", "turn_idx"]], on=["conv_id", "turn_idx"], how="inner"
    )
    assert merged.empty
    assert len(final) == len(last) - len(deleted)


def test_spark_generate_bench_source(spark, tmp_path):
    """Scale-free Spark-native bench generator: row count, op mix,
    hot-key share, dense unique seq."""
    from delta_spark.changelog import spark_generate
    from pyspark.sql import functions as F

    path = str(tmp_path / "slog")
    n = spark_generate(spark, 50_000, path, n_files=4, seed=42)
    df = spark.read.parquet(path)
    assert df.count() == n == 50_000
    assert df.select("seq").distinct().count() == n
    mix = {r["op"]: r["count"] for r in df.groupBy("op").count().collect()}
    assert 0.25 < mix["UPDATE"] / n < 0.35
    assert 0.005 < mix["DELETE"] / n < 0.02
    hot = df.filter(F.col("conv_id") == "c0").count() / n
    assert 0.15 < hot < 0.25
    # DELETE rows carry no image; others do
    assert df.filter("op='DELETE' and text is not null").count() == 0
    assert df.filter("op<>'DELETE' and text is null").count() == 0


def test_tie_fixture_invariants():
    """tie_frac emits equal-seq COMPETING revisions: same key+seq,
    different payload and ingest_ts; winners and losers both present."""
    from delta_spark.changelog import ChangelogSpec, generate_changelog

    raw = generate_changelog(ChangelogSpec(n_events=2000, n_convs=30, seed=91, tie_frac=0.05))
    per_seq = raw.groupby("seq").agg(n_text=("text", lambda s: s.dropna().nunique()))
    tied = per_seq[per_seq["n_text"] > 1]
    assert len(tied) > 10
    # each tie pair shares (conv_id, turn_idx) and differs in ingest_ts
    sample = raw[raw["seq"].isin(tied.index[:20])]
    for seq, grp in sample.groupby("seq"):
        assert grp["conv_id"].nunique() == 1 and grp["turn_idx"].nunique() == 1
        assert grp["ingest_ts"].nunique() > 1
    # the revision text marker is present on exactly the injected rows
    assert raw["text"].astype(str).str.endswith("rev-tie").any()


def test_multi_changelog_invariants():
    """generate_multi_changelog: global seq preserves each table's
    event order; replay duplicates share the global seq."""
    from delta_spark.changelog import ChangelogSpec, generate_multi_changelog

    raw = generate_multi_changelog(
        {t: ChangelogSpec(n_events=500, n_convs=10, seed=92 + i, n_files=1)
         for i, t in enumerate(["a", "b", "c"])}
    )
    assert set(raw["tbl"]) == {"a", "b", "c"}
    for t in "abc":
        sub = raw[raw["tbl"] == t].drop_duplicates("seq").sort_values("seq")
        # per-key lifecycle survives the global renumbering: first event
        # of every key is an INSERT, any DELETE is that key's last event
        for (_, _), grp in sub.groupby(["conv_id", "turn_idx"], dropna=True):
            ops = grp["op"].tolist()
            assert ops[0] == "INSERT"
            assert "DELETE" not in ops[:-1]
    # duplicates (replays) share global seq AND payload
    dup = raw[raw.duplicated("seq", keep=False) & raw["text"].notna()]
    grp = dup.groupby("seq").agg(tbl=("tbl", "nunique"))
    # a global seq never spans two tables
    assert (grp["tbl"] == 1).all()
