"""Duplicate-group clustering: distributed connected components.

Near-duplicate detection (MinHash-LSH / SimHash / embedding ANN — see
:mod:`arctic_spark.llm.dedup` and :mod:`arctic_spark.llm.similarity`)
emits PAIRS.  Deduplicating a corpus needs the transitive closure of
those pairs — if A~B and B~C, then {A,B,C} is ONE duplicate cluster and
exactly one canonical document should survive.  The reference engine has
no analogue (it is single-node and stops at pairwise predicates); this is
the standard missing piece between "pairs" and "a deduplicated corpus"
in any web-scale pipeline.

Algorithm — min-label propagation with pointer jumping:

  label[v] starts as v's own id; each round
    (1) neighbor-min:  label[v] <- min(label[v], min over neighbors' labels)
        — one equi-join of the edge list against the label table plus a
        groupBy(id).min shuffle;
    (2) pointer-jump:  label[v] <- min(label[v], label[label[v]])
        — one self-join of the label table (path compression).

  The jump step is what makes long chains cheap: propagation alone needs
  O(diameter) rounds, the combination converges in O(log diameter).
  Duplicate clusters in practice have tiny diameters, so 3-4 rounds is
  typical; ``max_iterations`` is a safety bound, not the expected cost.

Scale design (100 TB): every round is two equi-joins + one groupBy keyed
on a single long — shuffle payload is two longs per row, independent of
document size.  Each round's label table is ``localCheckpoint``-ed (and
the previous round's storage released): checkpointing — unlike a bare
``persist`` — truncates the logical plan, which otherwise grows ~4× per
round (each round references the prior table several times and Catalyst
re-analyzes the whole nested tree) and OOMs the DRIVER long before the
data is large.  On a cluster with an HDFS checkpoint dir, ``checkpoint()``
additionally survives executor loss; local checkpointing is the right
default for iteration counts this small.  The convergence check rides the
SAME action that materializes each round's checkpoint (r12): labels are
monotonically non-increasing under min-propagation, so the exact integer
sum of labels (decimal — overflow-proof) is unchanged iff NO label
changed — one ``agg(sum)`` over the lazily-checkpointed table both
materializes it and reports convergence, replacing the r6
two-actions-per-round shape (eager checkpoint + changed-labels
join/limit/count).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", vertices: DataFrame = None,
                         vertex_col: str = "id",
                         max_iterations: int = 25) -> DataFrame:
    """(id, component) for every vertex, component = min id in its
    connected component.

    ``edges`` is an undirected pair list (direction ignored, self-loops
    dropped).  ``vertices`` optionally adds isolated vertices (rows whose
    id appears in no edge get component = their own id).
    """
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .where(F.col("src") != F.col("dst")))
    sym = (e.union(e.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
           .distinct()
           .persist(StorageLevel.MEMORY_AND_DISK))
    nodes = sym.select(F.col("src").alias("id")).distinct()
    if vertices is not None:
        nodes = (nodes.union(
            vertices.select(F.col(vertex_col).cast("long").alias("id")))
            .distinct())

    # convergence stat: labels only ever DECREASE (min-propagation +
    # least() in the jump), so sum(comp) is strictly smaller after any
    # change and exactly equal iff the round was a fixed point. Decimal
    # sum keeps the comparison exact at any vertex count (a BIGINT sum
    # of n ids can overflow; decimal(38,0) holds sums of up to ~1e19
    # max-long ids). The agg is the ONLY action per round: it
    # materializes the lazy localCheckpoint and returns the stat in the
    # same job (r12 — one action/round instead of eager-checkpoint +
    # changed-join/limit/count).
    def _label_sum(df):
        return df.agg(F.sum(F.col("comp").cast("decimal(38,0)"))
                      .alias("s")).collect()[0]["s"]

    labels = nodes.select("id", F.col("id").alias("comp")) \
                  .localCheckpoint(eager=False)
    prev_sum = _label_sum(labels)

    for _ in range(max_iterations):
        # (1) neighbor-min: own label vs every neighbor's label
        nbr = (sym.join(labels.withColumnRenamed("id", "src"), "src")
               .select(F.col("dst").alias("id"), "comp"))
        stepped = (labels.unionByName(nbr)
                   .groupBy("id").agg(F.min("comp").alias("comp")))
        # (2) pointer-jump: label[label[v]] (labels are node ids, and
        # `stepped` covers every node, so the lookup always resolves —
        # coalesce is belt-and-braces for vertices-only ids)
        parent = stepped.select(F.col("id").alias("comp"),
                                F.col("comp").alias("jump"))
        new = (stepped.join(parent, "comp", "left")
               .select("id", F.least(
                   F.col("comp"), F.coalesce("jump", "comp")).alias("comp"))
               .localCheckpoint(eager=False))
        cur_sum = _label_sum(new)
        labels.unpersist()
        labels = new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    return labels.select("id", F.col("comp").alias("component"))


def duplicate_groups(pairs: DataFrame, src: str = "id_a",
                     dst: str = "id_b",
                     max_iterations: int = 25) -> DataFrame:
    """Cluster near-duplicate PAIRS into duplicate groups.

    Returns (id, component) for every id that appears in at least one
    pair; component = min id of the group (the canonical survivor)."""
    return connected_components(pairs, src, dst,
                                max_iterations=max_iterations)


def dedup_by_pairs(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   src: str = "id_a", dst: str = "id_b",
                   max_iterations: int = 25) -> DataFrame:
    """Drop every non-canonical member of each duplicate cluster.

    The full dedup pipeline is::

        pairs = minhash_lsh_pairs(df)          # candidate generation
        clean = dedup_by_pairs(df, pairs)      # transitive closure + filter

    A row survives iff it appears in no pair (left anti semantics via the
    null branch) or it is the min-id member of its component.  One
    broadcast-or-shuffle left join against the (tiny relative to the
    corpus) component table."""
    comp = duplicate_groups(pairs, src, dst, max_iterations=max_iterations)
    return (df.join(comp.withColumnRenamed("id", id_col), id_col, "left")
            .where(F.col("component").isNull()
                   | (F.col("component") == F.col(id_col)))
            .drop("component"))


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iterations: int = 10,
             vertices: DataFrame = None, vertex_col: str = "id",
             scale: int = 10 ** 12,
             checkpoint_every: int = 4) -> DataFrame:
    """(id, rank_fp, rank) after ``iterations`` rounds of
    power-iteration PageRank with damping ``d`` and the random-surfer
    dangling completion (nodes without out-edges spread their rank
    uniformly).

    FIXED-POINT ARITHMETIC, the design decision that makes this
    bit-reproducible: ranks are BIGINT multiples of 1/``scale``
    (default 1e-12), and every step is integer math::

        dnum    = round(damping * 1000)          # damping as /1000
        r0      = scale // N
        contrib = r(u) // outdeg(u)              # per out-edge
        r'(v)   = ((1000 - dnum) * (scale // N)
                   + dnum * (S(v) + D // N)) // 1000

    with S(v) the BIGINT sum of inbound contribs and D the BIGINT
    dangling mass. Integer sums are associative-commutative, so the
    result is IDENTICAL under any partitioning, engine, or aggregation
    order — a float PageRank differs in the last ulps run-to-run,
    which would poison hash-level reproducibility gates and any
    downstream exact dedup on rank. Truncation costs at most a few
    units of 1/scale per node per iteration (1e-12 — far below any
    ranking decision); total mass decays by the truncated remainders
    instead of holding exactly 1, documented here. ``rank`` is the
    double view ``rank_fp / scale``.

    Scale design (100 TB edge lists): per iteration, ONE equi-join of
    the rank table against the edge list on ``src`` (hash-partitioned
    the same way every round) and ONE groupBy(dst) with map-side
    partial BIGINT sums; the dangling mass is a single-row broadcast
    aggregate INSIDE the same plan (no per-round driver collect —
    round 7, VERDICT r6 #6), so the only actions are the
    ``localCheckpoint`` materializations every ``checkpoint_every``
    rounds (driver-plan growth, same reasoning as
    connected_components). Shuffle payload: (long, long) pairs.
    Parallel edges are honored (each instance carries a contribution,
    and outdeg counts multiplicity).

    All divisions are true BIGINT floor divisions (SQL ``DIV``) — a
    double division + cast would lose bit-exactness once operands pass
    2**53 (ADVICE r6), so ``scale`` is validated against that bound."""
    dnum = int(round(float(damping) * 1000))
    if not (0 < scale < 2 ** 53):
        raise ValueError(
            f"scale must be in (0, 2**53) for exact BIGINT arithmetic "
            f"(the damping product dnum*rank_fp must stay inside int64); "
            f"got {scale}")
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id"))).distinct())
    if vertices is not None:
        nodes = nodes.union(
            vertices.select(F.col(vertex_col).cast("long").alias("id"))) \
            .distinct()
    nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank needs at least one vertex: the edge "
                         "list (plus any explicit vertices) is empty")
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))

    r0 = scale // n_nodes
    base = (1000 - dnum) * r0
    ranks = nodes.select("id", F.lit(r0).cast("long").alias("rank_fp"))
    ranks = ranks.localCheckpoint(eager=True)
    pinned = ranks

    rd_cached: list = []
    for it in range(iterations):
        rd = ranks.join(outdeg, ranks["id"] == outdeg["src"], "left") \
            .select(ranks["id"].alias("u"), "rank_fp", "outdeg")
        # rd feeds BOTH the dangling-mass branch and the inbound
        # branch; without a materialization point the uncheckpointed
        # lineage would double per round (up to 2^checkpoint_every
        # subtree copies for the optimizer to walk — ADVICE r7). A
        # lazy persist makes CacheManager swap every occurrence of
        # the rd subtree for one InMemoryRelation leaf at execution,
        # keeping per-iteration plans linear; no extra action is
        # spent (the checkpoint cadence still owns the only actions).
        rd = rd.persist(StorageLevel.MEMORY_AND_DISK)
        rd_cached.append(rd)
        # dangling mass as a single-row broadcast aggregate in the same
        # plan: its per-node share is D DIV N, integer floor division
        dshare = (rd.where(F.col("outdeg").isNull())
                  .agg(F.coalesce(F.sum("rank_fp"), F.lit(0).cast("long"))
                       .alias("dm"))
                  .select(F.expr(f"dm DIV {n_nodes}").alias("dshare")))
        inbound = (rd.where(F.col("outdeg").isNotNull())
                   .join(e, rd["u"] == e["src"])
                   .select(F.col("dst").alias("id"),
                           F.expr("rank_fp DIV outdeg").alias("c"))
                   .groupBy("id").agg(F.sum("c").alias("s")))
        new = (nodes.join(inbound, "id", "left")
               .crossJoin(F.broadcast(dshare))
               .select("id",
                       (F.lit(base)
                        + F.lit(dnum) * (F.coalesce(F.col("s"),
                                                    F.lit(0).cast("long"))
                                         + F.col("dshare"))).alias("num"))
               .select("id", F.expr("num DIV 1000").alias("rank_fp")))
        if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
            nxt = new.localCheckpoint(eager=True)
            pinned.unpersist()
            pinned, ranks = nxt, nxt
            # the eager checkpoint materialized this window's chain;
            # its intermediate rd caches are dead weight now
            for c in rd_cached:
                c.unpersist()
            rd_cached.clear()
        else:
            ranks = new
    e.unpersist()
    nodes.unpersist()
    # the final checkpoint stays pinned on the result: a localCheckpoint
    # cannot be recomputed once freed, so the caller releases it via
    # cache.release(result) after materializing (cache.py convention)
    from ..cache import pin
    return pin(ranks.select(
        "id", "rank_fp",
        (F.col("rank_fp") / F.lit(float(scale))).alias("rank")), ranks)


def canonical_edges(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Undirected edge list in canonical form: (u, v) with u < v,
    self-loops dropped, duplicates collapsed. The required input shape
    for :func:`triangle_count` / :func:`common_neighbors`."""
    e = edges.select(F.col(src).cast("long").alias("a"),
                     F.col(dst).cast("long").alias("b")) \
        .where(F.col("a") != F.col("b"))
    return (e.select(F.least("a", "b").alias("u"),
                     F.greatest("a", "b").alias("v"))
            .distinct())


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst", orient: str = "degree") -> DataFrame:
    """Per-vertex triangle counts: (id, n_triangles).

    The classic two-join formulation: wedges come from one self-join
    of the ORIENTED edge table on its tail vertex, and each wedge
    closes into a triangle iff its far pair is itself an edge — a
    second equi-join. Every triangle is generated exactly once (at its
    orientation-minimal vertex), then fans out to its three corners
    for the per-vertex aggregate. Output is identical under any
    orientation — only the wedge-table size changes.

    ``orient='degree'`` (default, r10): edges orient from the
    lower-(degree, id) endpoint to the higher — the standard
    degree-ordering of compact-forward / Latapy 2008, which bounds
    every vertex's out-degree (and so its wedge count C(out_deg, 2))
    by O(√m) on ANY graph. ``orient='id'`` keeps the r9 plain u<v
    orientation (no degree join — fine for graphs whose ids are
    uncorrelated with degree, but a small-id hub in a power-law graph
    makes C(deg, 2) wedges: the r10 Zipf stress measured the id form
    OOM-class at 10M edges where the degree form finishes in seconds).

    Scale: two (three with the degree attach) equi-joins + one
    groupBy, all keyed on vertex ids — never an all-pairs product.
    Fully SQL-replayable (deterministic, no floats)."""
    e = canonical_edges(edges, src, dst)
    if orient == "id":
        w1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        w2 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
        oriented_bc = e.select(F.col("u").alias("b"),
                               F.col("v").alias("c"))
        wedges = w1.join(w2, "a").where(F.col("b") < F.col("c"))
    elif orient == "degree":
        deg = (e.select(F.col("u").alias("id"))
               .unionByName(e.select(F.col("v").alias("id")))
               .groupBy("id").agg(F.count("*").alias("d")))
        ed = (e.join(deg.select(F.col("id").alias("u"),
                                F.col("d").alias("du")), "u")
              .join(deg.select(F.col("id").alias("v"),
                               F.col("d").alias("dv")), "v"))
        fwd = (F.col("du") < F.col("dv")) \
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        # oriented tail → head, carrying the head's rank for the
        # in-wedge ordering
        o = ed.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("x"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("y"),
            F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("dy"))
        w1 = o.select(F.col("x").alias("a"), F.col("y").alias("b"),
                      F.col("dy").alias("db"))
        w2 = o.select(F.col("x").alias("a"), F.col("y").alias("c"),
                      F.col("dy").alias("dc"))
        wedges = (w1.join(w2, "a")
                  .where((F.col("db") < F.col("dc"))
                         | ((F.col("db") == F.col("dc"))
                            & (F.col("b") < F.col("c")))))
        oriented_bc = o.select(F.col("x").alias("b"),
                               F.col("y").alias("c"))
    else:
        raise ValueError(f"orient must be 'degree' or 'id', "
                         f"got {orient!r}")
    tri = wedges.join(oriented_bc, ["b", "c"])
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
    return (corners.groupBy("id")
            .agg(F.count("*").alias("n_triangles")))


def common_neighbors(edges: DataFrame, src: str = "src",
                     dst: str = "dst", min_common: int = 1,
                     max_degree: int = None) -> DataFrame:
    """Link-prediction candidates: unordered vertex pairs (u, v) with
    their number of shared neighbors (the common-neighbors score; its
    normalized form is Adamic-Adar / Jaccard). One self-join of the
    adjacency list on the shared neighbor. Pairs already connected by
    an edge are NOT excluded (callers anti-join against the edge list
    when predicting new links).

    Unlike triangle counting, this op's OUTPUT is per-wedge, so no
    orientation trick can bound a super-hub's C(deg, 2) candidate
    pairs — they are genuinely part of the answer. ``max_degree``
    (r10) applies the standard scale mitigation: middle vertices with
    degree above the cap contribute no wedges (a vertex shared by
    100k others scores every pair of them — rarely useful signal and
    quadratic cost; papers routinely drop super-hubs). None (default)
    keeps exact semantics."""
    e = canonical_edges(edges, src, dst)
    # full adjacency (both directions) keyed on the shared middle
    adj = (e.select(F.col("u").alias("n"), F.col("v").alias("x"))
           .unionByName(
               e.select(F.col("v").alias("n"), F.col("u").alias("x"))))
    if max_degree is not None:
        deg = (adj.groupBy("n").agg(F.count("*").alias("__d"))
               .where(F.col("__d") <= int(max_degree)).select("n"))
        adj = adj.join(deg, "n", "left_semi")
    a = adj.select("n", F.col("x").alias("u"))
    b = adj.select("n", F.col("x").alias("v"))
    pairs = a.join(b, "n").where(F.col("u") < F.col("v"))
    return (pairs.groupBy("u", "v")
            .agg(F.count("*").alias("n_common"))
            .where(F.col("n_common") >= int(min_common)))
