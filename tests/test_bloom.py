"""Bloom-filter semi-join pruning (arctic_spark.relational)."""

import pytest
from pyspark.sql import functions as F

from arctic_spark.relational import (bloom_filter_expr, bloom_semi_filter,
                                     build_bloom)


def test_no_false_negatives(spark):
    keys = spark.range(0, 300, 3).withColumnRenamed("id", "k")
    df = spark.range(0, 300).withColumnRenamed("id", "k")
    kept = set(r["k"] for r in
               bloom_semi_filter(df, keys, "k", bits=1 << 12).collect())
    member = set(range(0, 300, 3))
    assert member <= kept  # every true member survives


def test_superset_shrinks_with_bits(spark):
    keys = spark.range(0, 100).withColumnRenamed("id", "k")
    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    small = bloom_semi_filter(df, keys, "k", bits=1 << 8).count()
    big = bloom_semi_filter(df, keys, "k", bits=1 << 16).count()
    assert big <= small          # more bits, fewer false positives
    assert 100 <= big <= 200     # near-exact at 64Kbit for 100 keys


def test_probe_is_native(spark):
    keys = spark.range(0, 10).withColumnRenamed("id", "k")
    bloom = build_bloom(keys, "k", bits=1 << 10)
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    out = df.where(bloom_filter_expr("k", bloom))
    assert "Python" not in out._jdf.queryExecution().executedPlan() \
        .toString()


def test_end_to_end_join_exact(spark):
    keys = spark.createDataFrame([(i, i * 2) for i in range(0, 50, 7)],
                                 "k long, v long")
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    pruned = bloom_semi_filter(df, keys, "k", bits=1 << 10)
    got = sorted(map(tuple, pruned.join(keys, "k").collect()))
    want = sorted(map(tuple, df.join(keys, "k").collect()))
    assert got == want  # FPs removed by the real join


def test_string_keys(spark):
    keys = spark.createDataFrame([("a",), ("b",)], "k string")
    df = spark.createDataFrame(
        [("a",), ("b",)] + [("q%d" % i,) for i in range(100)],
        "k string")
    kept = set(r["k"] for r in
               bloom_semi_filter(df, keys, "k", bits=1 << 14).collect())
    assert {"a", "b"} <= kept
    assert len(kept) < 20
