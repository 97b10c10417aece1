"""Bradley-Terry MM fitting: ordering, determinism, degenerate cases."""

from __future__ import annotations

import pytest

from cdf_spark.operators.preference import MICRO, bradley_terry_strengths

# a > b > c in every duel; d never wins
DUELS = [
    ("a", "b", 1), ("a", "b", 1), ("b", "a", 0),
    ("b", "c", 1), ("b", "c", 1),
    ("a", "c", 1),
    ("c", "d", 1), ("a", "d", 1), ("b", "d", 1),
]


def test_bt_strengths_respect_dominance(spark):
    df = spark.createDataFrame(DUELS, ["i", "j", "win"])
    got = {r["id"]: r["strength_unat"] for r in bradley_terry_strengths(df, 5).collect()}
    assert got["a"] > got["b"] > got["c"] > got["d"]
    assert got["d"] == 0  # zero wins -> MM fixed point at zero
    # mass normalized to n_players * MICRO (up to floor loss)
    assert 0 <= 4 * MICRO - sum(got.values()) < 8


def test_bt_partition_independent(spark):
    a = spark.createDataFrame(DUELS, ["i", "j", "win"]).repartition(7)
    b = spark.createDataFrame(DUELS, ["i", "j", "win"]).coalesce(1)
    ra = sorted(map(tuple, bradley_terry_strengths(a, 3).collect()))
    rb = sorted(map(tuple, bradley_terry_strengths(b, 3).collect()))
    assert ra == rb


def test_bt_single_direction_stream_equivalent_to_mirrored(spark):
    # emitting only one direction of each duel must fit the same
    # strengths as the caller mirroring rows itself
    one = spark.createDataFrame([("a", "b", 1), ("b", "c", 1), ("a", "c", 1)], ["i", "j", "win"])
    mirrored = one.unionAll(
        spark.createDataFrame([("b", "a", 0), ("c", "b", 0), ("c", "a", 0)], ["i", "j", "win"])
    )
    r1 = {r["id"]: r["strength_unat"] for r in bradley_terry_strengths(one, 3).collect()}
    r2 = {r["id"]: r["strength_unat"] for r in bradley_terry_strengths(mirrored, 3).collect()}
    # mirrored doubles every count uniformly: same ORDER, near-equal values
    assert sorted(r1, key=r1.get) == sorted(r2, key=r2.get)


def test_bt_refusals(spark):
    df = spark.createDataFrame([("a", "b", 1)], ["i", "j", "win"])
    with pytest.raises(ValueError, match="iteration"):
        bradley_terry_strengths(df, 0)
    empty = spark.createDataFrame([], "i string, j string, win int")
    with pytest.raises(ValueError, match="empty"):
        bradley_terry_strengths(empty, 2)
    # a loss-only stream is NOT degenerate: win=0 rows are wins for j
    loss_only = spark.createDataFrame([("a", "b", 0)], ["i", "j", "win"])
    got = {r["id"]: r["strength_unat"] for r in bradley_terry_strengths(loss_only, 2).collect()}
    assert got["b"] > got["a"] == 0
