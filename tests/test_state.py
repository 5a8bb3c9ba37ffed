"""Pipeline/table state tracking (reference: PipelineStateService)."""

import json
import os

import pytest

from delta_spark.changelog import ChangelogSpec, generate_and_write
from delta_spark.pipeline import Pipeline, PipelineConfig
from delta_spark.state import StateStore


def test_state_transitions(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    generate_and_write(log_dir, ChangelogSpec(n_events=600, n_convs=15, seed=31, n_files=4))
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        max_files_per_trigger=2,
    )
    p = Pipeline(spark, cfg)
    p.run_stream_to_completion()
    st = p.state.read()
    assert st["pipeline"] == "OK"
    assert st["tables"]["transcripts"] == "REPLICATING"
    assert st["error"] is None


def test_state_failing_then_recovers(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    generate_and_write(log_dir, ChangelogSpec(n_events=400, n_convs=10, seed=32, n_files=2))
    cfg = PipelineConfig(
        changelog_path=log_dir,
        table_path=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ck"),
        generation=1,
        max_files_per_trigger=1,
    )

    class Chaos(Pipeline):
        def _foreach_batch(self, table):
            inner = super()._foreach_batch(table)

            def _fn(df, eid):
                if eid >= 1 and not os.path.exists(str(tmp_path / "go")):
                    try:
                        raise RuntimeError("boom")
                    except RuntimeError as e:
                        self.state.set_table_failing(self.cfg.pipeline_name)
                        self.state.set_failing(repr(e))
                        raise
                inner(df, eid)

            return _fn

    p1 = Chaos(spark, cfg)
    q = p1.run_stream(available_now=True)
    with pytest.raises(Exception):
        q.awaitTermination(120)
        raise RuntimeError("should have failed")
    st = StateStore(cfg.table_path, "transcripts").read()
    assert st["pipeline"] == "FAILING" and "boom" in st["error"]

    (tmp_path / "go").touch()
    Pipeline(spark, cfg).run_stream_to_completion()
    st = StateStore(cfg.table_path, "transcripts").read()
    assert st["pipeline"] == "OK" and st["error"] is None
    assert st["tables"]["transcripts"] == "REPLICATING"


def test_save_on_change_only(tmp_path):
    s = StateStore(str(tmp_path / "t"), "p")
    s.set_ok()
    m1 = os.path.getmtime(s.path)
    st1 = json.load(open(s.path))
    s.set_ok()  # no change -> no rewrite
    assert json.load(open(s.path))["updated_ms"] == st1["updated_ms"]
    s.set_failing("x")
    assert json.load(open(s.path))["pipeline"] == "FAILING"
