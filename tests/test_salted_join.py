"""Salted skew join (arctic_spark.relational)."""

import pytest
from pyspark.sql import functions as F

from arctic_spark.relational import salted_join, skewed_keys


def _tables(spark):
    rows = [(0, i) for i in range(500)] + [(k, k * 10) for k in range(1, 40)]
    left = spark.createDataFrame(rows, "k long, v long")
    right = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 30)], "k long, name string")
    return left, right


def test_inner_matches_plain_join(spark):
    left, right = _tables(spark)
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", salt=7)
                        .collect()))
    assert salted == plain
    assert len(salted) == 500 + 29  # k=0 hot + k 1..29


def test_left_keeps_unmatched(spark):
    left, right = _tables(spark)
    plain = sorted(map(tuple, left.join(right, "k", "left").collect()),
                   key=str)
    salted = sorted(map(tuple,
                        salted_join(left, right, "k", salt=5, how="left")
                        .collect()), key=str)
    assert salted == plain


def test_right_join_rejected(spark):
    left, right = _tables(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")


def test_salt_actually_scatters(spark):
    left, right = _tables(spark)
    lef = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                         F.lit(8)).cast("int"))
    n_sub = lef.where(F.col("k") == 0).select("__salt").distinct().count()
    assert n_sub >= 6  # the hot key spreads over nearly all 8 sub-keys


def test_skewed_keys_diagnostic(spark):
    left, _ = _tables(spark)
    hot = skewed_keys(left, "k", min_share=0.5).collect()
    assert len(hot) == 1 and hot[0]["k"] == 0
    assert hot[0]["share"] > 0.9
