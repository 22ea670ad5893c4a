"""Mergeable sketches: HLL / KMV / CMS.

The load-bearing properties:
  * accuracy — estimates land inside the published error bounds for
    the chosen parameters (with deterministic md5 hashing the "random"
    hash draw is fixed, so these are exact regression assertions, not
    flaky statistical ones);
  * EXACT mergeability — sketch(A ∪ B) == merge(sketch(A), sketch(B))
    row for row, the property that makes per-shard sketches composable;
  * partitioning invariance — same result at 1 and 8 partitions.
"""

import pytest
from pyspark.sql import functions as F

from arctic_spark import sketches as sk


@pytest.fixture(scope="module")
def values(spark):
    # 5000 distinct string keys, each repeated a deterministic 1-5 times
    rows = [(f"key-{i}",) for i in range(5000) for _ in range(i % 5 + 1)]
    return spark.createDataFrame(rows, ["v"]).repartition(8).cache()


def test_hll_accuracy(values):
    p = 10
    regs = sk.hll_sketch(values, "v", p=p)
    est = sk.hll_estimate(regs, p=p)
    # std error ~ 1.04/sqrt(1024) = 3.25%; allow 3 sigma
    assert abs(est - 5000) / 5000 < 0.10
    # registers are bounded and well-formed
    rows = regs.collect()
    assert all(1 <= r["rho"] <= 51 for r in rows)
    assert all(0 <= r["bucket"] < 1024 for r in rows)


def test_hll_merge_exact(spark, values):
    a = values.where(F.col("v") < "key-3")      # lexicographic split
    b = values.where(F.col("v") >= "key-3")
    merged = sk.hll_merge(sk.hll_sketch(a, "v", p=8),
                          sk.hll_sketch(b, "v", p=8))
    whole = sk.hll_sketch(values, "v", p=8)
    assert (merged.orderBy("bucket").collect()
            == whole.orderBy("bucket").collect())


def test_hll_components_match_float_path(values):
    p = 8
    regs = sk.hll_sketch(values, "v", p=p).cache()
    comp = sk.hll_estimate_components(regs, p=p).collect()[0]
    m = 1 << p
    k = 60 - p + 1
    # reconstruct the harmonic sum from the integer component
    s = comp["sum_scaled"] / float(1 << k)
    est_from_comp = sk._hll_alpha(m) * m * m / s
    zeros = comp["n_zero"]
    if est_from_comp <= 2.5 * m and zeros > 0:
        import math
        est_from_comp = m * math.log(m / zeros)
    assert est_from_comp == pytest.approx(sk.hll_estimate(regs, p=p), rel=1e-12)


def test_hll_partitioning_invariant(values):
    one = sk.hll_sketch(values.coalesce(1), "v", p=8).orderBy("bucket").collect()
    eight = sk.hll_sketch(values.repartition(8), "v", p=8).orderBy("bucket").collect()
    assert one == eight


def test_kmv_accuracy_and_exact_small(spark, values):
    est = sk.kmv_estimate(sk.kmv_sketch(values, "v", k=256), k=256)
    # std error ~ 1/sqrt(k-1) = 6.3%; allow 3 sigma
    assert abs(est - 5000) / 5000 < 0.19
    small = spark.createDataFrame([(f"x{i}",) for i in range(37)], ["v"])
    assert sk.kmv_estimate(sk.kmv_sketch(small, "v", k=256), k=256) == 37.0


def test_kmv_merge_exact(values):
    a = values.where(F.col("v") < "key-3")
    b = values.where(F.col("v") >= "key-3")
    merged = sk.kmv_merge(sk.kmv_sketch(a, "v", k=64),
                          sk.kmv_sketch(b, "v", k=64), k=64)
    whole = sk.kmv_sketch(values, "v", k=64)
    assert merged.orderBy("h").collect() == whole.orderBy("h").collect()


def test_kmv_jaccard(spark):
    a = spark.createDataFrame([(f"k{i}",) for i in range(1000)], ["v"])
    b = spark.createDataFrame([(f"k{i}",) for i in range(500, 1500)], ["v"])
    j = sk.kmv_jaccard(sk.kmv_sketch(a, "v", k=256),
                       sk.kmv_sketch(b, "v", k=256), k=256)
    # true J = 500/1500 = 1/3
    assert abs(j - 1 / 3) < 0.12


def test_cms_upper_bound_and_accuracy(spark, values):
    cms = sk.cms_sketch(values, "v", depth=4, width=1024).cache()
    exact = values.groupBy("v").agg(F.count("*").alias("cnt"))
    probes = exact.orderBy(F.desc("cnt"), "v").limit(50)
    got = sk.cms_query(cms, probes, "v", depth=4, width=1024).collect()
    n_total = values.count()
    for r in got:
        assert r["cms_est"] >= r["cnt"]          # CMS never undercounts
        # (eps=2e/width) guarantee: overshoot < eps * N with prob 1-delta
        assert r["cms_est"] - r["cnt"] <= 2 * 2.718281828 / 1024 * n_total


def test_cms_merge_exact(values):
    a = values.where(F.col("v") < "key-3")
    b = values.where(F.col("v") >= "key-3")
    merged = sk.cms_merge(sk.cms_sketch(a, "v", depth=4, width=256),
                          sk.cms_sketch(b, "v", depth=4, width=256))
    whole = sk.cms_sketch(values, "v", depth=4, width=256)
    assert (merged.orderBy("d", "c").collect()
            == whole.orderBy("d", "c").collect())


def test_cms_weighted(spark):
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 7)], ["v", "w"])
    cms = sk.cms_sketch(df, "v", depth=3, width=64, weight="w")
    probes = spark.createDataFrame([("a",), ("b",)], ["v"])
    got = {r["v"]: r["cms_est"]
           for r in sk.cms_query(cms, probes, "v", depth=3, width=64).collect()}
    assert got["a"] >= 15 and got["b"] >= 7
    # width 64 over 2 keys: collisions possible but min-over-3 should be tight
    assert got["a"] <= 22 and got["b"] <= 22


def test_sample_sketch_deterministic_and_merge(spark, values):
    sk_all = sk.sample_sketch(values.dropDuplicates(["v"]), "v", k=128)
    rows = sk_all.collect()
    assert len(rows) == 128
    # deterministic: same input -> same sample
    again = sk.sample_sketch(values.dropDuplicates(["v"]), "v", k=128)
    assert rows == again.collect()
    # exact mergeability over a disjoint split
    a = values.dropDuplicates(["v"]).where(F.col("v") < "key-3")
    b = values.dropDuplicates(["v"]).where(F.col("v") >= "key-3")
    merged = sk.sample_merge(sk.sample_sketch(a, "v", k=128),
                             sk.sample_sketch(b, "v", k=128), k=128)
    assert merged.orderBy("__h").collect() == rows


def test_sample_quantiles(spark):
    df = spark.createDataFrame([(f"k{i}", float(i)) for i in range(2000)],
                               ["k", "x"])
    s = sk.sample_sketch(df, "k", k=512)
    q25, q50, q75 = sk.sample_quantiles(s, "x", (0.25, 0.5, 0.75))
    # uniform sample of a uniform 0..1999 grid: quantiles within ~10%
    assert abs(q50 - 1000) < 200
    assert abs(q25 - 500) < 200 and abs(q75 - 1500) < 200
    assert sk.sample_quantiles(s.where("x < -1"), "x") == [None] * 3


def test_kmv_set_operations(spark):
    a = spark.createDataFrame([(f"k{i}",) for i in range(1000)], ["v"])
    b = spark.createDataFrame([(f"k{i}",) for i in range(500, 1500)], ["v"])
    ska = sk.kmv_sketch(a, "v", k=256)
    skb = sk.kmv_sketch(b, "v", k=256)
    u = sk.kmv_union_estimate(ska, skb, k=256)
    i = sk.kmv_intersect_estimate(ska, skb, k=256)
    assert abs(u - 1500) / 1500 < 0.2
    assert abs(i - 500) / 500 < 0.45   # intersect compounds two errors


def test_sample_sketch_duplicate_keys_deterministic(spark):
    # same key with DIFFERENT companion tuples: one slot per key, the
    # lexicographically-least companion survives, merge stays exact
    rows = [("a", 2), ("a", 1), ("b", 9), ("c", 5), ("c", 4)]
    df = spark.createDataFrame(rows, ["k", "x"])
    s = sk.sample_sketch(df, "k", k=10, cols=["k", "x"])
    got = {r.k: r.x for r in s.collect()}
    assert got == {"a": 1, "b": 9, "c": 4}
    # merge of overlapping shards == sketch of the union
    a = spark.createDataFrame(rows[:3], ["k", "x"])
    b = spark.createDataFrame(rows[2:], ["k", "x"])
    merged = sk.sample_merge(sk.sample_sketch(a, "k", k=10, cols=["k", "x"]),
                             sk.sample_sketch(b, "k", k=10, cols=["k", "x"]),
                             k=10)
    assert (merged.orderBy("__h").collect()
            == s.orderBy("__h").collect())
