"""Keyed-effect (CDC) reduction and merge application.

Re-expresses the reference's effect machinery
(`crates/cdf-kernel/src/effect.rs:1-440`): a stream of keyed
upsert/delete effects is reduced to one winner per key under a
declared input order (`KeyedEffectInputOrder`, `:170-180`) and winner
policy Fail/First/Last (`KeyedEffectWinnerPolicy`, `:162-166`), then
applied to a target — the reference stages + `DELETE ... USING` +
`INSERT` with null-safe key equality
(`crates/cdf-dest-duckdb/src/commit.rs:150-216`, `IS NOT DISTINCT
FROM` at `:185-198`).

Spark shape: window-rank reduction (one shuffle on the merge keys),
then MERGE emulated as null-safe anti-join + union — the same plan
Delta's MERGE INTO produces without a matched-update, expressed on
plain DataFrames. Delivery guarantee: effectively-once-per-key given
a deterministic input order.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class CdcOp(str, Enum):
    INSERT = "insert"
    UPDATE = "update"
    DELETE = "delete"


UPSERT_OPS = (CdcOp.INSERT.value, CdcOp.UPDATE.value)


def reduce_keyed_effects(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    op_col: str = "op",
    winner: str = "last",
) -> DataFrame:
    """Reduce an effect stream to one winning effect per key.

    winner="last" (the CDC norm): the latest effect under ``order_by``
    wins. winner="first": the earliest. The output retains ``op_col``
    so the apply step can distinguish upsert vs delete winners.
    """
    if winner not in ("first", "last"):
        raise ValueError(f"unknown winner policy {winner!r}")
    cols = [F.col(c) for c in order_by]
    ordering = cols if winner == "first" else [c.desc() for c in cols]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_cdf_rn", F.row_number().over(w))
        .filter(F.col("_cdf_rn") == 1)
        .drop("_cdf_rn")
    )


def apply_effects_to_target(
    target: DataFrame,
    effects: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply reduced effects to a target relation (MERGE semantics).

    - delete winners remove the key from the target;
    - upsert winners replace/insert the row.

    Null-safe key equality (`eqNullSafe` == `IS NOT DISTINCT FROM`)
    matches the reference's merge predicate. The effect side is
    typically ≪ target: broadcast it when small so the anti-join is
    shuffle-free on the target side.
    """
    effect_side = effects.select(*keys).distinct()
    cond = None
    for k in keys:
        c = target[k].eqNullSafe(effect_side[k])
        cond = c if cond is None else (cond & c)
    survivors = target.join(F.broadcast(effect_side), on=cond, how="left_anti")

    upserts = effects.filter(F.col(op_col).isin(*UPSERT_OPS)).drop(op_col)
    # align column order with target
    upserts = upserts.select(*[F.col(c) for c in target.columns])
    return survivors.unionByName(upserts)
