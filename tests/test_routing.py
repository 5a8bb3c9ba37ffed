"""Routing units (reference analog: DeltaWorkerTest.java:86-137 —
round-robin, fewer tables than instances, explicit assignment)."""

import pytest

from delta_spark.routing import assign_tables


def test_round_robin():
    got = assign_tables(["a", "b", "c", "d", "e"], 2)
    assert got == [["a", "c", "e"], ["b", "d"]]


def test_instances_capped_to_tables():
    got = assign_tables(["a", "b"], 5)
    assert got == [["a"], ["b"]]


def test_explicit_assignment_with_leftovers():
    got = assign_tables(["a", "b", "c", "d"], 2, explicit=[["d"], ["a"]])
    assert got == [["d", "b"], ["a", "c"]]


def test_explicit_rejects_dup_and_unknown():
    with pytest.raises(ValueError):
        assign_tables(["a", "b"], 2, explicit=[["a"], ["a"]])
    with pytest.raises(ValueError):
        assign_tables(["a"], 1, explicit=[["zz"]])
