"""Bucketing co-location and salted aggregation."""

import pytest
from pyspark.sql import functions as F

from cdf_spark.plans.layout import (
    bucketed_join,
    join_exchange_count,
    salted_groupby_agg,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        num_buckets=8,
        sort_cols=["o_orderkey"],
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, on=["o_orderkey"])
    # co-located buckets: zero hash-partitioning exchanges
    assert join_exchange_count(joined) == 0, "bucketed join must not shuffle"
    # and the result is correct
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == expected


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert join_exchange_count(joined) >= 2  # both sides shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(5000)] + [("cold", 1.0), ("cold", 2.0)],
        "k string, v double",
    )
    salted = salted_groupby_agg(
        df, ["k"], {"n": "count(*)", "total": "sum(v)", "lo": "min(v)", "hi": "max(v)"}, salt=8
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_salted_agg_rejects_nondecomposable(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError):
        salted_groupby_agg(df, ["k"], {"m": "avg(v)"})
