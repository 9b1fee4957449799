"""Skew-salting: result equality with the plain join, and hot-key spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_salted_join_equals_plain_join(spark):
    from cdc_sync_poc_spark.functions.salting import salted_join
    from cdc_sync_poc_spark.sources.loader import load_table

    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")

    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").cast("decimal(18,2)").alias("t"))
    )
    salted = (
        salted_join(
            orders, cust, orders.o_custkey == cust.c_custkey,
            unique_col="o_orderkey", factor=4,
        )
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").cast("decimal(18,2)").alias("t"))
    )
    a = {(r.c_custkey, r.n, r.t) for r in plain.collect()}
    b = {(r.c_custkey, r.n, r.t) for r in salted.collect()}
    assert a == b


def test_salt_spreads_hot_key(spark):
    from cdc_sync_poc_spark.functions.salting import SALT_COL, salt_large_side

    # one pathological key repeated 1000x
    hot = spark.range(1000).select(
        F.lit(42).alias("k"), F.col("id").alias("uid")
    )
    salted = salt_large_side(hot, "uid", factor=8)
    counts = salted.groupBy(SALT_COL).count().collect()
    assert len(counts) == 8  # the hot key now occupies 8 buckets
    assert max(r["count"] for r in counts) < 1000