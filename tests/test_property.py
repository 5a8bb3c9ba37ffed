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
