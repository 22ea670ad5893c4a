"""Connected-components / duplicate-group clustering (llm/graph.py)."""

from pyspark.sql import functions as F

from arctic_spark.llm import graph


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = graph.connected_components(edges, **kw).collect()
    return {r.id: r.component for r in rows}


def test_cc_single_edge(spark):
    assert _cc(spark, [(1, 2)]) == {1: 1, 2: 1}


def test_cc_chain(spark):
    # a 10-edge chain: pure propagation needs 10 rounds; pointer jumping
    # collapses it well inside the default max_iterations bound
    pairs = [(i, i + 1) for i in range(10)]
    comp = _cc(spark, pairs)
    assert set(comp.values()) == {0}
    assert len(comp) == 11


def test_cc_star_and_cycle(spark):
    # star centered at 100 + a 4-cycle; edge direction is irrelevant
    pairs = [(101, 100), (100, 102), (103, 100),
             (1, 2), (2, 3), (3, 4), (4, 1)]
    comp = _cc(spark, pairs)
    assert {k: v for k, v in comp.items() if k >= 100} == {
        100: 100, 101: 100, 102: 100, 103: 100}
    assert {k: v for k, v in comp.items() if k < 100} == {
        1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_merging_bridge(spark):
    # two chains joined by a bridge edge — min id must win globally
    pairs = [(10, 11), (11, 12), (20, 21), (21, 22), (12, 20)]
    comp = _cc(spark, pairs)
    assert set(comp.values()) == {10}


def test_cc_self_loops_and_isolated_vertices(spark):
    edges = spark.createDataFrame([(5, 5), (6, 7)], "id_a long, id_b long")
    verts = spark.createDataFrame([(5,), (6,), (7,), (9,)], "id long")
    rows = graph.connected_components(edges, vertices=verts).collect()
    comp = {r.id: r.component for r in rows}
    # 5 has only a self-loop -> isolated via the vertex list; 9 isolated
    assert comp == {5: 5, 6: 6, 7: 6, 9: 9}


def test_dedup_by_pairs(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string")
    # {0,1,2} one cluster, {5,6} another, rest untouched
    pairs = spark.createDataFrame([(0, 1), (1, 2), (5, 6)],
                                  "id_a long, id_b long")
    kept = sorted(r.doc_id for r in
                  graph.dedup_by_pairs(docs, pairs).collect())
    assert kept == [0, 3, 4, 5, 7]


def test_duplicate_groups_matches_bruteforce(spark):
    import random
    rnd = random.Random(7)
    n = 60
    pairs = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(50)]
    pairs = [(a, b) for a, b in pairs if a != b]
    comp = _cc(spark, pairs)

    # brute-force union-find reference
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for a, b in pairs:
        for v in (a, b):
            want[v] = find(v)
    # normalize union-find roots to min-of-component
    groups = {}
    for v, r in want.items():
        groups.setdefault(find(r), set()).add(v)
    expect = {}
    for root, members in groups.items():
        m = min(members)
        for v in members:
            expect[v] = m
    assert comp == expect


def test_pagerank_empty_graph_raises(spark):
    import pytest
    from arctic_spark.llm.graph import pagerank
    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="at least one vertex"):
        pagerank(empty)


def test_pagerank_scale_bound_raises(spark):
    import pytest
    from arctic_spark.llm.graph import pagerank
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="2\\*\\*53"):
        pagerank(e, scale=2 ** 53)


def _brute_triangles(edge_set):
    """Per-vertex triangle counts by brute enumeration."""
    import itertools
    verts = sorted({x for e in edge_set for x in e})
    has = lambda a, b: (min(a, b), max(a, b)) in edge_set
    out = {}
    for a, b, c in itertools.combinations(verts, 3):
        if has(a, b) and has(b, c) and has(a, c):
            for v in (a, b, c):
                out[v] = out.get(v, 0) + 1
    return out


def test_triangle_count_matches_brute(spark):
    import random
    from arctic_spark.llm.graph import triangle_count
    rng = random.Random(42)
    edges = {(min(a, b), max(a, b))
             for a, b in ((rng.randrange(30), rng.randrange(30))
                          for _ in range(120)) if a != b}
    # feed them unsorted, duplicated, and with self-loops to prove
    # canonicalization
    rows = [(b, a) for a, b in edges] + list(edges)[:10] + [(5, 5)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {r.id: r.n_triangles
           for r in triangle_count(df).collect()}
    assert got == _brute_triangles(edges)


def test_common_neighbors_matches_brute(spark):
    from arctic_spark.llm.graph import common_neighbors
    # square 1-2-3-4-1 plus diagonal 1-3
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "src long, dst long")
    got = {(r.u, r.v): r.n_common
           for r in common_neighbors(df).collect()}
    # neighbors: 1:{2,3,4} 2:{1,3} 3:{1,2,4} 4:{1,3}
    assert got[(2, 4)] == 2          # share 1 and 3
    assert got[(1, 3)] == 2          # share 2 and 4
    assert got[(2, 3)] == 1          # share 1
    assert got[(1, 2)] == 1          # share 3
    assert (5, 6) not in got
    strict = {(r.u, r.v) for r in
              common_neighbors(df, min_common=2).collect()}
    assert strict == {(2, 4), (1, 3)}


def test_triangle_orientations_agree(spark):
    """Degree orientation (r10 default) and the r9 id orientation count
    the same triangles — including under a skewed hub with a SMALL id
    (the case id-orientation handles worst)."""
    import random
    from arctic_spark.llm.graph import triangle_count
    rnd = random.Random(23)
    edges = {(0, k) for k in range(1, 40)}          # hub at id 0
    edges |= {(rnd.randrange(1, 40), rnd.randrange(1, 40))
              for _ in range(120)}
    rows = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(rows, "src long, dst long")
    deg = sorted((r.id, r.n_triangles) for r in
                 triangle_count(df, orient="degree").collect())
    idd = sorted((r.id, r.n_triangles) for r in
                 triangle_count(df, orient="id").collect())
    assert deg == idd and len(deg) > 0


def test_common_neighbors_max_degree_cap(spark):
    """max_degree drops super-hub MIDDLE vertices from wedge
    generation; uncapped semantics are unchanged (None default)."""
    from arctic_spark.llm.graph import common_neighbors
    # star: hub 0 connects 1..10; plus a 1-2-3 path
    rows = [(0, k) for k in range(1, 11)] + [(1, 2), (2, 3)]
    df = spark.createDataFrame(rows, "src long, dst long")
    full = {(r.u, r.v): r.n_common
            for r in common_neighbors(df).collect()}
    # all 45 pairs of hub neighbors share the hub
    assert len([1 for (u, v) in full if u >= 1 and v <= 10]) >= 45
    capped = {(r.u, r.v): r.n_common
              for r in common_neighbors(df, max_degree=5).collect()}
    # hub (degree 10) contributes nothing; only low-degree middles
    # survive: (0,2) via middles 1 AND 3 (both adjacent to 0 and 2)
    assert (4, 5) not in capped          # was hub-only
    assert capped.get((0, 2)) == 2       # via middle vertices 1 and 3
    assert capped.get((1, 3)) == 1       # via middle vertex 2
