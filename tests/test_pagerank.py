"""Fixed-point distributed PageRank (llm.graph.pagerank)."""

import pytest
from pyspark.sql import functions as F

from arctic_spark.cache import release
from arctic_spark.llm.graph import pagerank


def _ref_pagerank(edges, iterations, damping=0.85, scale=10 ** 12):
    """Driver-side replica of the documented fixed-point recurrence."""
    dnum = int(round(damping * 1000))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r0 = scale // n
    r = {v: r0 for v in nodes}
    base = (1000 - dnum) * r0
    for _ in range(iterations):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        dmass = sum(r[u] for u in nodes if u not in outdeg)
        r = {v: (base + dnum * (s[v] + dmass // n)) // 1000
             for v in nodes}
    return r


EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (3, 4),
         (6, 1), (6, 2)]  # node 5 has an out-edge; add a dangling node
EDGES_D = EDGES + [(2, 7)]  # 7 is dangling


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, iterations=5, **kw)
    got = {r["id"]: r["rank_fp"] for r in out.collect()}
    release(out)
    return got


def test_matches_reference(spark):
    got = _run(spark, EDGES)
    want = _ref_pagerank(EDGES, 5)
    assert got == want


def test_dangling_node(spark):
    got = _run(spark, EDGES_D)
    want = _ref_pagerank(EDGES_D, 5)
    assert got == want
    assert got[7] > 0  # dangling node still holds rank


def test_mass_approximately_one(spark):
    got = _run(spark, EDGES_D)
    total = sum(got.values()) / 1e12
    assert 0.999 <= total <= 1.0 + 1e-9  # truncation only loses mass


def test_partition_invariance(spark):
    df = spark.createDataFrame(EDGES_D, "src long, dst long")
    a = pagerank(df, iterations=4)
    av = {r["id"]: r["rank_fp"] for r in a.collect()}
    release(a)
    b = pagerank(df.repartition(13), iterations=4)
    bv = {r["id"]: r["rank_fp"] for r in b.collect()}
    release(b)
    assert av == bv  # integer arithmetic: bit-identical


def test_hub_ranks_highest(spark):
    # everyone points at 3; 3 points back at 1 only
    edges = [(1, 3), (2, 3), (4, 3), (5, 3), (3, 1)]
    got = _run(spark, edges)
    assert got[3] == max(got.values())
    assert got[1] > got[2] == got[4] == got[5]


def test_parallel_edges_weighting(spark):
    # u->v twice beats u->w once from the same source
    edges = [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)]
    got = _run(spark, edges)
    assert got[2] > got[3]
