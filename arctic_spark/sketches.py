"""Mergeable distributed sketches: HyperLogLog, KMV, Count-Min.

At 100 TB the questions "how many distinct users", "how big is the
overlap between two corpora", and "how often does this token appear"
cannot afford exact shuffles of the raw keys.  This module provides the
three classic mergeable summaries, built so that

* every hash is the repo's portable md5 primitive
  (``conv(substr(md5(x),1,15),16,10)`` — a 60-bit uniform that DuckDB
  reproduces as ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``),
  making each sketch bit-exactly replayable in an oracle-SQL gate; and
* merge is an exact algebraic operation (register-wise ``max`` for HLL,
  min-k for KMV, counter-wise ``+`` for CMS), so
  ``sketch(A ∪ B) == merge(sketch(A), sketch(B))`` holds EXACTLY — the
  property that makes per-partition / per-day / per-shard sketches
  composable without re-reading the data.

Scale shape: each sketch is ONE narrow aggregation.  HLL shuffles at
most ``m = 2**p`` register rows; KMV is a Spark ``TakeOrderedAndProject``
(per-partition top-k, k rows to the driver); CMS shuffles at most
``depth × width`` counter rows.  None of them ever moves the raw keys.

The reference engine delegates aggregation to its host query engine
(SURVEY §2.1/§2.6); approximate-distinct sketches are part of this
repo's training-data-pipeline surface, not reference parity.

References: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog" (AofA
2007); Bar-Yossef et al., "Counting distinct elements in a data stream"
(RANDOM 2002, the KMV estimator); Cormode & Muthukrishnan, "An improved
data stream summary: the count-min sketch" (J. Algorithms 2005).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "h60", "hll_bucket_rho",
    "hll_sketch", "hll_merge", "hll_estimate", "hll_estimate_by",
    "hll_estimate_components",
    "kmv_sketch", "kmv_merge", "kmv_estimate", "kmv_jaccard",
    "kmv_union_estimate", "kmv_intersect_estimate",
    "sample_sketch", "sample_merge", "sample_quantiles",
    "cms_sketch", "cms_merge", "cms_query",
]

#: Size of the hash universe: 60 bits (15 hex digits) keeps the value
#: positive in a signed 64-bit BIGINT on both engines.
H60 = 1 << 60
_H60_BITS = 60


def h60(col, salt: int | None = None) -> Column:
    """The portable 60-bit md5 hash used by every sketch.

    ``salt`` prefixes the value with ``"<salt>|"`` so independent hash
    rows (CMS depths, minhash permutations) stay uncorrelated while
    remaining replayable in SQL.
    """
    s = F.col(col) if isinstance(col, str) else col
    s = s.cast("string")
    if salt is not None:
        s = F.concat(F.lit(f"{salt}|"), s)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_bucket_rho(col, p: int):
    """The (bucket, rho) register-update columns shared by the batch
    sketch and the streaming windowed aggregation — ONE definition so
    the two can never desynchronize (streaming registers must equal
    hll_sketch on the window slice and merge via hll_merge)."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    rem_bits = _H60_BITS - p
    h = h60(col)
    bucket = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin(w)))
    return bucket, rho.cast("long")


def hll_sketch(df: DataFrame, col, p: int = 10) -> DataFrame:
    """Build an HLL register table: ``(bucket long, rho long)``.

    ``m = 2**p`` registers; only non-empty registers are materialized
    (an absent bucket means register value 0).  The ONE shuffle is the
    ``groupBy(bucket).max(rho)`` over at most ``m`` groups — map-side
    partial aggregation means each task emits ≤ m rows regardless of
    input size.

    rho = position of the leftmost 1-bit in the remaining
    ``60 - p`` bits, counted from 1; an all-zero remainder scores
    ``60 - p + 1``.  Computed exactly via ``length(bin(w))`` (no
    floating log2, whose power-of-two edge cases differ by ULPs).
    """
    bucket, rho = hll_bucket_rho(col, p)
    c = F.col(col) if isinstance(col, str) else col
    return (df.where(c.isNotNull())
              .select(bucket.alias("bucket"), rho.alias("rho"))
              .groupBy("bucket").agg(F.max("rho").alias("rho")))


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Exact merge: register-wise max.  ``hll_sketch(A ∪ B)`` equals
    ``hll_merge(hll_sketch(A), hll_sketch(B))`` row for row."""
    return (a.unionByName(b)
             .groupBy("bucket").agg(F.max("rho").alias("rho")))


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate_components(registers: DataFrame, p: int) -> DataFrame:
    """One-row DataFrame of the integer estimate inputs.

    ``sum_scaled = Σ_j 2**(K - M_j)`` with ``K = 60 - p + 1`` (the max
    possible rho) is the harmonic denominator as an EXACT BIGINT: the
    smallest term is 2**0 = 1 and the total is bounded by
    ``m · 2**K = 2**61``, inside BIGINT for every legal p.  ``n_zero``
    counts empty registers.  The float estimate is a pure function of
    these two integers — checking them checks the estimate, with zero
    doubles in the gate.
    """
    m = 1 << p
    k_scale = _H60_BITS - p + 1  # max rho → smallest term is 2**0 = 1
    return registers.agg(
        (F.coalesce(F.sum(F.expr(
            f"shiftleft(cast(1 as bigint), cast({k_scale} - rho as int))")),
            F.lit(0).cast("long"))
         + (F.lit(m).cast("long") - F.count("*"))
         * F.lit(1 << k_scale).cast("long")).alias("sum_scaled"),
        (F.lit(m).cast("long") - F.count("*")).alias("n_zero"),
    )


def hll_estimate_by(registers: DataFrame, p: int, *by) -> DataFrame:
    """Grouped HLL estimates from a register table carrying extra key
    columns (e.g. the window column of a streaming aggregation, a
    day/domain partition of stored per-shard registers): one row per
    key group with the integer components plus the standard estimate
    (``alpha_m·m²/Σ2^-M`` with linear-counting small-range correction)
    as a double. Stays fully distributed — one aggregation over
    register rows, never the raw data."""
    m = 1 << p
    k_scale = _H60_BITS - p + 1
    comps = registers.groupBy(*by).agg(
        (F.coalesce(F.sum(F.expr(
            f"shiftleft(cast(1 as bigint), cast({k_scale} - rho as int))")),
            F.lit(0).cast("long"))
         + (F.lit(m).cast("long") - F.count("*"))
         * F.lit(1 << k_scale).cast("long")).alias("sum_scaled"),
        (F.lit(m).cast("long") - F.count("*")).alias("n_zero"),
    )
    alpha = _hll_alpha(m)
    raw = (F.lit(alpha * m * m * float(1 << k_scale))
           / F.col("sum_scaled").cast("double"))
    linear = F.lit(float(m)) * F.log(F.lit(float(m))
                                     / F.col("n_zero").cast("double"))
    est = F.when((raw <= 2.5 * m) & (F.col("n_zero") > 0), linear) \
           .otherwise(raw)
    return comps.withColumn("n_distinct_est", est)


def hll_estimate(registers: DataFrame, p: int) -> float:
    """Driver-side estimate from the register table (collects ≤ m rows).

    Standard HLL: ``alpha_m · m² / Σ 2^-M_j`` with the small-range
    linear-counting correction when E ≤ 2.5m and empty registers exist.
    """
    m = 1 << p
    vals = {r["bucket"]: r["rho"] for r in registers.collect()}
    s = sum(2.0 ** -vals.get(j, 0) for j in range(m))
    e = _hll_alpha(m) * m * m / s
    zeros = m - sum(1 for v in vals.values() if v > 0)
    if e <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return e


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct sketch
# ---------------------------------------------------------------------------

def kmv_sketch(df: DataFrame, col, k: int = 256,
               method: str = "partition") -> DataFrame:
    """The k smallest distinct 60-bit hashes: ``(h long)`` ascending.

    ``method='partition'`` (default, the 100 TB shape): each partition
    keeps its own DISTINCT k minima in one Arrow pass (a bounded
    merge-fold — state never exceeds k + one batch), so the only
    exchange carries ≤ k·partitions candidate rows instead of the FULL
    distinct-hash set (≈ n_distinct 8-byte rows) that a global
    ``distinct()`` would shuffle (VERDICT r9 nit #1).  The global
    distinct-top-k over per-partition distinct-top-k candidates is
    exact, so the sketch — and every estimator on it — is unchanged.

    ``method='global'`` keeps the pure-SQL distinct → orderBy → limit
    plan (a ``TakeOrderedAndProject`` after a full distinct exchange).
    At 100 TB only hashes move, never the keys, under either method.
    """
    c = F.col(col) if isinstance(col, str) else col
    hashed = df.where(c.isNotNull()).select(h60(col).alias("h"))
    if method == "global":
        return hashed.distinct().orderBy("h").limit(k)
    if method != "partition":
        raise ValueError(f"method must be 'partition' or 'global', "
                         f"got {method!r}")

    def _topk(batches):
        import numpy as np
        import pandas as pd
        cur = None
        for pdf in batches:
            h = pdf["h"].to_numpy()
            cur = h if cur is None else np.concatenate([cur, h])
            cur = np.unique(cur)          # sorted distinct, ascending
            if cur.size > k:
                cur = cur[:k]
        yield pd.DataFrame(
            {"h": cur if cur is not None
             else np.array([], dtype="int64")})

    cand = hashed.mapInPandas(_topk, "h long")
    return cand.distinct().orderBy("h").limit(k)


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Exact merge: k smallest of the union of both hash sets."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 256) -> float:
    """(k-1) / h_k in hash-space units; exact count when fewer than k
    distinct values exist (the sketch IS the distinct set then)."""
    hs = [r["h"] for r in sketch.collect()]
    if len(hs) < k:
        return float(len(hs))
    return (k - 1) * H60 / float(max(hs))


def kmv_jaccard(a: DataFrame, b: DataFrame, k: int = 256) -> float:
    """Jaccard similarity estimate from two KMV sketches: the fraction
    of the union's k minima present in both (Beyer et al. 2007).
    Driver-side over ≤ 3k hash values."""
    sa = {r["h"] for r in a.collect()}
    sb = {r["h"] for r in b.collect()}
    union_k = sorted(sa | sb)[:k]
    if not union_k:
        return 0.0
    both = sum(1 for h in union_k if h in sa and h in sb)
    return both / len(union_k)


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def cms_sketch(df: DataFrame, col, depth: int = 4, width: int = 1024,
               weight=None) -> DataFrame:
    """Counter table ``(d long, c long, cnt long)`` — at most
    ``depth × width`` rows after the ONE groupBy; absent (d, c) means 0.

    Each input row increments ``depth`` counters, one per salted hash
    row; the fan-out is a ``posexplode`` of a depth-length array, so no
    join and no per-depth extra pass.  ``weight`` (optional column)
    turns it into a weighted CMS.
    """
    c = F.col(col) if isinstance(col, str) else col
    hashes = F.array(*[h60(col, salt=d).bitwiseAND(F.lit(width - 1))
                       for d in range(depth)])
    wexpr = (F.lit(1).cast("long") if weight is None
             else (F.col(weight) if isinstance(weight, str) else weight))
    return (df.where(c.isNotNull())
              .select(F.posexplode(hashes).alias("d", "c"), wexpr.alias("w"))
              .groupBy("d", "c").agg(F.sum("w").alias("cnt")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Exact merge: counter-wise sum."""
    return (a.unionByName(b)
             .groupBy("d", "c").agg(F.sum("cnt").alias("cnt")))


def cms_query(sketch: DataFrame, probes: DataFrame, col,
              depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-query a set of probe values: adds ``cms_est`` (the min over
    the depth counters — an upper bound on the true count with the
    usual (ε, δ) guarantee) to the probe rows.

    The sketch side is tiny (≤ depth·width rows) and broadcast; the
    probe side never shuffles.
    """
    c = F.col(col) if isinstance(col, str) else col
    hashes = F.array(*[h60(col, salt=d).bitwiseAND(F.lit(width - 1))
                       for d in range(depth)])
    exploded = probes.select("*", F.posexplode(hashes).alias("d", "c"))
    counters = sketch.select("d", "c", F.col("cnt").alias("__cms_cnt"))
    joined = exploded.join(F.broadcast(counters), ["d", "c"], "left")
    probe_cols = [f for f in probes.columns]
    return (joined.groupBy(*probe_cols)
                  .agg(F.min(F.coalesce(F.col("__cms_cnt"),
                                        F.lit(0).cast("long")))
                        .alias("cms_est")))


# ---------------------------------------------------------------------------
# Deterministic mergeable uniform sample (bottom-k by hash) + quantiles
# ---------------------------------------------------------------------------

def sample_sketch(df: DataFrame, key, k: int = 1024, cols=None) -> DataFrame:
    """Bottom-k DISTINCT KEYS by the 60-bit md5 hash of ``key``: a
    deterministic uniform sample that merges exactly (bottom-k of a
    union = bottom-k over the merged sketches), unlike reservoir
    sampling whose result depends on encounter order.

    Duplicate keys collapse to ONE row before the bottom-k — the
    lexicographically-least companion tuple (min over the struct of
    ``cols``) — so the result is deterministic and slot usage is one
    per key even when the same key appears in both shards of a merge.

    Output: ``__h`` (the hash, ascending) plus ``cols`` (default: all
    input columns except the hash). One bounded groupBy (map-side
    combined) then a TakeOrderedAndProject — only k rows reach the
    driver side of the sort. Because the hash is the portable md5
    primitive, the sample is bit-reproducible in SQL, so estimates
    computed from it (quantiles, means) gate exactly.
    """
    keep = list(df.columns) if cols is None else list(cols)
    return (df.select(h60(key).alias("__h"),
                      F.struct(*keep).alias("__s"))
            .groupBy("__h").agg(F.min("__s").alias("__s"))
            .orderBy("__h").limit(k)
            .select("__h", "__s.*"))


def sample_merge(a: DataFrame, b: DataFrame, k: int = 1024) -> DataFrame:
    """Exact merge: bottom-k of the union, duplicate hashes collapsed
    by the same deterministic min-struct rule as :func:`sample_sketch`
    (the same key may appear in both shards)."""
    cols = [c for c in a.columns if c != "__h"]
    return (a.unionByName(b)
            .select("__h", F.struct(*cols).alias("__s"))
            .groupBy("__h").agg(F.min("__s").alias("__s"))
            .orderBy("__h").limit(k)
            .select("__h", "__s.*"))


def sample_quantiles(sketch: DataFrame, col, qs=(0.25, 0.5, 0.75)):
    """Empirical quantiles of the sampled rows (driver-side over ≤ k
    rows): the value at rank ``ceil(q·n)`` (1-based) of the sorted
    sample — the classic type-1 estimator, integer rank arithmetic so
    both engines agree exactly on the same sample."""
    import math
    vals = sorted(r[0] for r in sketch.select(col).collect()
                  if r[0] is not None)
    n = len(vals)
    if n == 0:
        return [None for _ in qs]
    return [vals[min(max(math.ceil(q * n), 1), n) - 1] for q in qs]


def kmv_union_estimate(a: DataFrame, b: DataFrame, k: int = 256) -> float:
    """|A ∪ B| estimate: the KMV estimator on the exact merge."""
    return kmv_estimate(kmv_merge(a, b, k), k)


def kmv_intersect_estimate(a: DataFrame, b: DataFrame,
                           k: int = 256) -> float:
    """|A ∩ B| estimate: Jaccard(a, b) · |A ∪ B| (Beyer et al. 2007) —
    the standard theta-sketch-style set operation from two mergeable
    distinct sketches, no re-scan of either input."""
    return kmv_jaccard(a, b, k) * kmv_union_estimate(a, b, k)
