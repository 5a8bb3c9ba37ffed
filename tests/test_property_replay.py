"""Property sweep: the golden-replay invariant (engine state == pandas
oracle) must hold across generator configurations — heavy updates,
heavy deletes, extreme skew, deep reordering, tiny buckets."""

import pytest

from delta_spark.changelog import ChangelogSpec, generate_and_write, oracle_apply
from delta_spark.lake import LakeTable
from delta_spark.pipeline import Pipeline, PipelineConfig

from conftest import assert_pdf_equal

CASES = {
    "heavy_updates": dict(n_events=2500, n_convs=25, seed=101, update_frac=0.6, delete_frac=0.02),
    "heavy_deletes": dict(n_events=2500, n_convs=40, seed=102, update_frac=0.1, delete_frac=0.04),
    "extreme_skew": dict(n_events=2500, n_convs=100, seed=103, hot_frac=0.6),
    "deep_reorder_dups": dict(n_events=2500, n_convs=30, seed=104, shuffle_window=400, dup_frac=0.15),
    "ddl_with_dups": dict(n_events=2500, n_convs=30, seed=105, include_ddl=True, dup_frac=0.1),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_golden_replay_property(spark, tmp_path, case):
    spec = ChangelogSpec(**CASES[case])
    raw = generate_and_write(str(tmp_path / "log"), spec)
    cfg = PipelineConfig(
        changelog_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        num_buckets=4,  # tiny buckets → every merge collides
        salt_buckets=8 if case == "extreme_skew" else 0,
    )
    Pipeline(spark, cfg).run_batch()
    table = LakeTable.load(spark, cfg.table_path)
    expected = oracle_apply(raw)
    actual = table.read().toPandas()[list(expected.columns)]
    assert_pdf_equal(actual, expected, ["conv_id", "turn_idx"])


@pytest.mark.parametrize("case", ["heavy_deletes", "deep_reorder_dups"])
def test_publish_chain_property(spark, tmp_path, case):
    """Publish-chain invariant across generator stress cases: split the
    changelog into 3 seq-windowed batches, publish after each (squash
    forced mid-chain), and at EVERY published version the Iceberg
    read (Spark-free DuckDB consumer) equals the engine state at that
    publish; the final version equals the pandas replay oracle."""
    from delta_spark.lake.iceberg import publish_iceberg, read_iceberg_duckdb

    spec = ChangelogSpec(**CASES[case])
    raw = generate_and_write(str(tmp_path / "log"), spec)
    cfg = PipelineConfig(
        changelog_path=str(tmp_path / "log"),
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        num_buckets=4,
    )
    from delta_spark.schema import CHANGELOG_SCHEMA

    p = Pipeline(spark, cfg)
    table = p.ensure_table()
    df = spark.read.schema(CHANGELOG_SCHEMA).parquet(cfg.changelog_path)
    ice = str(tmp_path / "ice")
    from delta_spark.apply import apply_batch

    cuts = [800, 1700]
    parts = [
        df.filter(f"seq <= {cuts[0]}"),
        df.filter(f"seq > {cuts[0]} AND seq <= {cuts[1]}"),
        df.filter(f"seq > {cuts[1]}"),
    ]
    snapshots = []
    for i, part in enumerate(parts):
        apply_batch(table, part, writer_id="w", batch_id=f"pb{i}",
                    merge_mode="cow" if i == 0 else "mor")
        table = table.refresh()
        mp = publish_iceberg(
            table, ice, squash=(i == 1)  # force a mid-chain squash
        )
        want = table.read().toPandas()
        got = read_iceberg_duckdb(mp).df()[list(want.columns)]
        assert_pdf_equal(got, want, ["conv_id", "turn_idx"])
        snapshots.append(mp)
    assert len({*snapshots}) == 3
    expected = oracle_apply(raw)
    final = read_iceberg_duckdb(snapshots[-1]).df()[list(expected.columns)]
    assert_pdf_equal(final, expected, ["conv_id", "turn_idx"])
