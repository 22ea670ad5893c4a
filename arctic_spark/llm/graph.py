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
default for iteration counts this small.  The convergence check is a
``limit(1).count()`` over changed labels — one cheap action per round
that short-circuits on the first difference.
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

    labels = nodes.select("id", F.col("id").alias("comp")) \
                  .localCheckpoint(eager=True)

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
               .localCheckpoint(eager=True))
        changed = (new.alias("n")
                   .join(labels.alias("o"), "id")
                   .where(F.col("n.comp") != F.col("o.comp"))
                   .limit(1).count())
        labels.unpersist()
        labels = new
        if changed == 0:
            break
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
