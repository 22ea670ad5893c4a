"""Deduplication operators for web-scale corpora.

Five families here (plus SemDeDup in llm/similarity.py and paragraph
dedup in llm/pipeline.py), all built on the same scale pattern —
partition-local columnar kernels + one equi-join/groupBy shuffle on a
compact key:

- exact: hash-groupBy on a normalized fingerprint (one shuffle on a
  16-byte key; at 100 TB this is the cheapest possible dedup).
- MinHash + LSH: shingle → K minhashes → B bands → groupBy band value.
  Candidate pairs only materialize within same-band buckets, so the
  shuffle volume is O(docs × B), not O(docs²).
- SimHash: 64-bit weighted-projection signature; near-dups share bucket
  on bit-band prefixes.
- n-gram Jaccard: exact verification kernel for candidate pairs.
- exact substring (Lee et al. 2021): stride-1 k-token window hashes,
  canonical-min owner, span-mask removal — suffix-array semantics at
  O(total tokens) shuffle volume.

MinHash permutations use the classic (a·x + b) mod p universal family
over a 32-bit base hash derived from md5 (portable, engine-independent,
deterministic — no dependence on Spark's private hash functions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.native import _let
from .text import fingerprint, word_tokens

_MERSENNE_P = (1 << 61) - 1


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def shingles(text, k: int = 3) -> Column:
    """array<string> of k-word shingles (distinct).

    Built from flat zip_with chains over shifted slices rather than a
    per-index slice+concat (higher-order functions are interpreted, not
    codegen'd — the flat form is ~10× cheaper per row)."""
    toks = word_tokens(text)

    def build(ws):
        n = F.size(ws)
        m = F.greatest(n - (k - 1), F.lit(0))
        out = F.slice(ws, 1, m)
        for j in range(1, k):
            out = F.zip_with(out, F.slice(ws, 1 + j, m),
                             lambda a, b: F.concat(a, F.lit(" "), b))
        small = F.array(F.concat_ws(" ", ws))
        return F.array_distinct(
            F.when(n >= k, out)
             .when(n > 0, small)
             .otherwise(F.array().cast("array<string>")))

    return _let(toks, build)


def _base_hash(s) -> Column:
    """Deterministic 32-bit hash of a string via md5 (portable across
    engines — ``conv(substr(md5(x),1,8),16,10)``)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _rand_coeffs(num: int, seed: int):
    """Deterministic (a, b) pairs for the universal hash family.

    Coefficients are bounded to 2^30 so a*h (h is a 32-bit base hash)
    stays below 2^62 — Spark runs ANSI mode by default and a long
    overflow is a hard error, not a wrap."""
    import random
    rnd = random.Random(seed)
    return [(rnd.randrange(1, 1 << 30), rnd.randrange(0, 1 << 30))
            for _ in range(num)]


def minhash_signature_from_shingles(sh, num_hashes: int = 64,
                                    seed: int = 42) -> Column:
    """array<long>[num_hashes] MinHash signature from an existing shingle
    array column — fully native: the per-permutation min runs as an
    `aggregate` over the shingle hashes inside codegen.

    Callers that already project the shingle array (e.g. the LSH
    pipeline) MUST use this form so the shingle expression is evaluated
    once, not re-inlined per permutation (see _let's docstring)."""
    sh = _c(sh)
    coeffs = _rand_coeffs(num_hashes, seed)

    def perm_min(a, b):
        # closure factory: pyspark introspects lambda arity, so defaults
        # like `lambda acc, h, a=a` are rejected as 4-arg lambdas
        return lambda acc, h: F.least(
            acc, (F.lit(a) * h + F.lit(b)) % F.lit(_MERSENNE_P))

    def build(base):
        return F.array(*[
            F.aggregate(base, F.lit(_MERSENNE_P).cast("long"), perm_min(a, b))
            for a, b in coeffs])

    # bind the base-hash array once — it is referenced num_hashes times
    return _let(F.transform(sh, _base_hash), build)


def minhash_signature(text, num_hashes: int = 64, shingle_k: int = 3,
                      seed: int = 42) -> Column:
    """array<long>[num_hashes] MinHash signature computed from raw text.

    Convenience single-expression form. In multi-reference plans compute
    ``shingles(...)`` in its own projection and use
    :func:`minhash_signature_from_shingles` — Catalyst has no
    construction-time CSE, so passing this whole expression somewhere it
    is referenced N times inlines the shingle pipeline N times (the
    round-2 14x regression)."""
    return minhash_signature_from_shingles(
        shingles(text, shingle_k), num_hashes, seed)


def minhash_bands(sig, num_bands: int = 16) -> Column:
    """array<string> of band keys: band id + md5 of the band's slice."""
    n = F.size(sig)
    rows_per = (n / F.lit(num_bands)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.concat(b.cast("string"), F.lit(":"), F.md5(
            F.concat_ws(",", F.transform(
                F.slice(sig, b * rows_per + 1, rows_per),
                lambda v: v.cast("string"))))))


def minhash_lsh_pairs(df: DataFrame, id_col="doc_id", text_col="text",
                      num_hashes: int = 64, num_bands: int = 16,
                      shingle_k: int = 3, jaccard_threshold: float = 0.7,
                      seed: int = 42) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) with their exact
    n-gram Jaccard, LSH-banded:

    doc → signature → explode bands → self-equi-join on band key (the one
    shuffle) → distinct pair → exact Jaccard verify ≥ threshold.

    The band self-join ships ONLY (id, band) — at 100 TB the dominant
    shuffle payload would otherwise be every document's full shingle set
    × num_bands. Shingle arrays are re-attached to the (deduplicated)
    candidate pairs afterwards, one copy per side.

    Expression staging (the round-2 lesson): shingles, signature and
    bands each live in their OWN projection, referencing the previous
    stage as a plain attribute. Catalyst's CollapseProject declines to
    merge projections when it would duplicate non-cheap expressions, so
    the shingle pipeline and the 32-permutation signature are each
    evaluated exactly once per row instead of once per reference.
    ``sh_df`` is persisted (MEMORY_AND_DISK) because it feeds three
    plan branches — banding plus both re-attach joins.
    """
    from pyspark import StorageLevel
    sh_df = df.select(_c(id_col).alias("id"),
                      shingles(text_col, shingle_k).alias("sh"))
    sh_df = sh_df.persist(StorageLevel.MEMORY_AND_DISK)
    banded = (sh_df
              .select("id", minhash_signature_from_shingles(
                  F.col("sh"), num_hashes, seed).alias("sig"))
              .select("id", F.explode(minhash_bands(
                  F.col("sig"), num_bands)).alias("band")))
    # both sides of the self-join read `banded`; persisting it means the
    # 32-permutation signature is evaluated once per document, not twice
    # (payload is just id + 16-byte band key — tiny even at 100 TB).
    # Materialize EAGERLY: the self-join's two scan stages run
    # concurrently, and a lazy persist lets both compute the signature
    # before the cache fills (the r8 overlay lesson).
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    banded.count()
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    pairs = (cand
             .join(sh_df.select(F.col("id").alias("id_a"),
                                F.col("sh").alias("sh_a")), "id_a")
             .join(sh_df.select(F.col("id").alias("id_b"),
                                F.col("sh").alias("sh_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(0.0)
    out = (pairs.withColumn("jaccard", jac)
           .where(F.col("jaccard") >= jaccard_threshold)
           .select("id_a", "id_b", "jaccard"))
    # hand the persisted stage handles to the caller for release once
    # the pairs have been materialized (arctic_spark.cache.release)
    from ..cache import pin
    return pin(out, sh_df, banded)


def exact_duplicates(df: DataFrame, id_col="doc_id", text_col="text",
                     normalize=True) -> DataFrame:
    """Exact dedup: (fingerprint, n_dups, keep_id) per duplicate class.
    ``keep_id`` = min id — the canonical survivor."""
    key = fingerprint(text_col) if normalize else F.md5(_c(text_col))
    return (df.groupBy(key.alias("fp"))
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("keep_id"))
            .where(F.col("n_dups") > 1))


def dedup_exact(df: DataFrame, id_col="doc_id", text_col="text",
                normalize=True) -> DataFrame:
    """Keep one row (min id) per identical-text class. Plan: ONE shuffle
    on the 16-byte fingerprint key, then a per-partition row_number
    window picks the survivor — no second pass over the data (a
    groupBy-min + semi-join formulation would shuffle twice). The window
    sort is per duplicate-class, so skew is bounded by the largest
    duplicate class, not the partition."""
    key = fingerprint(text_col) if normalize else F.md5(_c(text_col))
    w = Window.partitionBy(key).orderBy(_c(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def ngram_jaccard(text_a, text_b, k: int = 3) -> Column:
    """Exact k-shingle Jaccard between two text columns (row-aligned)."""
    sa, sb = shingles(text_a, k), shingles(text_b, k)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.when(union > 0, inter.cast("double") / union).otherwise(0.0)


def simhash64(text) -> Column:
    """60-bit SimHash of word tokens: per-token md5-derived hash;
    signature bit i = majority vote of token bit i. Near-duplicate docs
    differ in few bits (compare via hamming distance / band prefixes).
    Returns a bigint."""
    toks = word_tokens(text)

    def build(h):
        n = F.size(h)
        sig = F.lit(0).cast("long")
        for i in range(60):  # literal bit positions (shiftleft needs ints)
            mask = 1 << i
            bit_set = F.size(F.filter(
                h, lambda v: v.bitwiseAND(F.lit(mask)) != 0)) * 2 > n
            sig = sig.bitwiseOR(
                F.when(bit_set, F.lit(mask).cast("long"))
                 .otherwise(F.lit(0).cast("long")))
        return sig

    # bind the token-hash array once — referenced 60 times
    return _let(F.transform(toks, lambda t: F.conv(
        F.substring(F.md5(t), 1, 15), 16, 10).cast("long")), build)


def hamming64(a, b) -> Column:
    """Hamming distance between two 64-bit signatures."""
    x = _c(a).bitwiseXOR(_c(b))
    return F.bit_count(x)


def simhash_near_dup_pairs(df: DataFrame, id_col="doc_id", text_col="text",
                           max_hamming: int = 3,
                           prefix_bits: int = 15) -> DataFrame:
    """SimHash near-dup candidates: band the 60-bit signature into 4
    prefix blocks (pigeonhole: ≤3 differing bits ⇒ at least one block
    equal), equi-join per block, verify hamming ≤ max_hamming."""
    sig = df.select(_c(id_col).alias("id"),
                    simhash64(text_col).alias("sig"))
    blocks = F.array(*[
        F.concat(F.lit(f"{i}:"),
                 F.shiftright(F.col("sig"), i * prefix_bits)
                  .bitwiseAND(F.lit((1 << prefix_bits) - 1)).cast("string"))
        for i in range(4)])
    # the signature is a single bigint — cheap enough to carry through
    # the band shuffle (unlike minhash shingle arrays)
    banded = sig.select("id", "sig", F.explode(blocks).alias("blk"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
            .dropDuplicates(["id_a", "id_b"]))
    return (cand.withColumn("hamming", hamming64("sig_a", "sig_b"))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# exact substring (token-window) dedup — the window-hash formulation of
# Lee et al. 2021, "Deduplicating Training Data Makes Language Models
# Better" (arXiv:2107.06499, public paper): remove every duplicated
# span of >= k consecutive tokens, keeping one canonical occurrence
# ---------------------------------------------------------------------------

def _ws_tokens(text) -> Column:
    """Whitespace tokens preserving case/punctuation (reassembly joins
    with single spaces, so formatting inside runs of whitespace is
    normalized — the token stream itself is lossless)."""
    # \S+ runs == split-on-whitespace with empties dropped (trim
    # included); regexp_extract_all stays in codegen (r9)
    return F.regexp_extract_all(_c(text), F.lit(r"\S+"), 0)


def duplicate_windows(df: DataFrame, id_col="doc_id", text_col="text",
                      k: int = 50, method: str = "arrow") -> DataFrame:
    """All NON-CANONICAL duplicated k-token windows: (id, start, wh)
    where the same window hash occurs at more than one (doc, start)
    corpus-wide and (id, start) is not the lexicographically-least
    occurrence (the canonical copy that survives).

    Scale shape: one row per token position (stride-1 windows), each
    shipping only (id, int, 16-char hash prefix); ONE shuffle on the
    window hash with a window-min to pick the owner. This is the
    suffix-array-free Spark formulation of exact substring dedup —
    volume O(total tokens), the same as tokenizing the corpus.

    ``method='arrow'`` (default) computes the window hashes in one
    vectorized pandas pass over the SPARK-tokenized arrays —
    hashlib.md5 of the identical "\\x1f"-joined utf-8 window bytes, so
    the hashes are byte-for-byte the native expression's (asserted in
    tests) while replacing an interpreted O(tokens × k)
    slice+concat+md5 HOF per position. ``method='native'`` keeps the
    pure-expression SQL-replayable shape."""
    toks = _ws_tokens(text_col)

    if method == "arrow":
        import hashlib
        import pandas as pd

        def win_iter(batches):
            for pdf in batches:
                ids, starts, whs = [], [], []
                for i, ws in zip(pdf["id"], pdf["__ws"]):
                    # NULL text tokenizes to a NULL array, delivered
                    # here as None — skip like the native path, whose
                    # size(NULL) >= k guard is false (ADVICE r9)
                    if ws is None:
                        continue
                    n = len(ws)
                    if n < k:
                        continue
                    joined = list(ws)
                    for s in range(n - k + 1):
                        h = hashlib.md5(
                            "\x1f".join(joined[s:s + k]).encode("utf-8")
                        ).hexdigest()[:16]
                        ids.append(i)
                        starts.append(s)
                        whs.append(h)
                yield pd.DataFrame({"id": ids, "start": starts,
                                    "wh": whs})

        tokd = df.select(_c(id_col).alias("id"), toks.alias("__ws"))
        id_t = tokd.schema["id"].dataType.simpleString()
        ex = tokd.mapInPandas(win_iter,
                              f"id {id_t}, start int, wh string")
    elif method == "native":
        def windows(ws):
            n = F.size(ws)
            return F.when(n >= k, F.transform(
                F.sequence(F.lit(0), n - k),
                lambda s: F.struct(s.alias("start"), F.substring(F.md5(
                    F.concat_ws("\x1f", F.slice(ws, s + 1, k))), 1, 16)
                    .alias("wh")))).otherwise(
                F.array().cast("array<struct<start:int,wh:string>>"))

        ex = (df.select(_c(id_col).alias("id"),
                        F.explode(_let(toks, windows)).alias("w"))
              .select("id", F.col("w.start").alias("start"),
                      F.col("w.wh").alias("wh")))
    else:
        raise ValueError(f"method must be 'arrow' or 'native', "
                         f"got {method!r}")
    w = Window.partitionBy("wh")
    ranked = (ex.withColumn("__n", F.count("*").over(w))
              .withColumn("__min", F.min(F.struct("id", "start")).over(w)))
    return (ranked.where((F.col("__n") > 1)
                         & ~((F.col("id") == F.col("__min.id"))
                             & (F.col("start") == F.col("__min.start"))))
            .select("id", "start", "wh"))


def dedup_substrings(df: DataFrame, id_col="doc_id", text_col="text",
                     k: int = 50) -> DataFrame:
    """Exact substring dedup (Lee et al. 2021 semantics, canonical-copy
    variant): every token covered by a non-canonical duplicated k-window
    is dropped; the lexicographically-least occurrence of each duplicated
    window survives intact. Returns (id, text) with the surviving tokens
    rejoined by single spaces; docs shorter than k tokens pass through
    modulo whitespace normalization.

    The per-doc mask is computed natively: the duplicated window starts
    arrive as one array per doc (a single groupBy), and token i drops
    iff some start s satisfies s <= i < s+k (nested HOF exists —
    interval-merge would reduce the O(tokens × spans) scan if span
    lists ever get long)."""
    toks = _ws_tokens(text_col)
    dups = duplicate_windows(df, id_col, text_col, k)
    spans = (dups.groupBy("id")
             .agg(F.collect_list("start").alias("__starts")))
    base = df.select(_c(id_col).alias("id"), _let(toks, lambda ws: ws)
                     .alias("__toks"))
    j = base.join(spans, "id", "left").withColumn(
        "__starts", F.coalesce("__starts", F.array().cast("array<int>")))
    kept = F.filter(
        F.transform(F.col("__toks"),
                    lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda p: ~F.exists(F.col("__starts"),
                            lambda s: (s <= p["i"]) & (p["i"] < s + k)))
    return j.select("id", F.concat_ws(
        " ", F.transform(kept, lambda p: p["t"])).alias("text"))
