"""Distributed WordPiece tokenizer training + encoding (Schuster &
Nakajima 2012, "Japanese and Korean voice search"; the BERT tokenizer
family — Devlin et al. 2019 appendix, and the scoring rule the public
HuggingFace `tokenizers` WordPiece trainer documents).

Completes the engine's tokenizer-family triangle: BPE
(:mod:`tokenize`, frequency-argmax merges), Unigram-LM
(:mod:`unigram`, EM + Viterbi), and WordPiece here — BPE's merge
mechanics with a LIKELIHOOD-GAIN objective::

    score(a, b) = count(ab) / (count(a) * count(b))

i.e. merge the pair whose fusion most increases corpus likelihood
under a unigram model, not the most frequent pair. Continuation
pieces carry the standard ``##`` prefix (initial symbols are bare
characters, every non-initial symbol/merge keeps ``##``).

Scale design mirrors the BPE trainer (both build on
:func:`tokenize.word_symbol_table`'s sentinel-string representation):
training runs on the DISTINCT-WORD table (one corpus shuffle,
vocabulary-sized working set); each round is one pair-count groupBy +
one symbol-count groupBy + a single-row argmax collect, and the merge
rewrite is a literal codegen ``replace``. Encoding is the BERT greedy
longest-match-first walk: one Arrow ``mapInPandas`` pass with the
vocabulary broadcast (vocab-bounded memory per executor), zero
shuffles — the same plan shape as :func:`unigram.viterbi_encode`.

The reference engine has no tokenizer surface at all; this is part of
the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tokenize import _E, _S, _sym_array, _wrap

CONT = "##"


def _wp_symbol_table(df: DataFrame, text_col: str,
                     min_count: int = 1) -> DataFrame:
    """(word, n, syms): like tokenize.word_symbol_table but with the
    WordPiece continuation convention — the first character is bare,
    every later character is ``##``-prefixed — and no end-of-word
    symbol (WordPiece marks continuations, not endings)."""
    clean = F.translate(F.col(text_col), _S + _E, "")
    words = (df.select(F.explode(F.split(clean, r"\s+")).alias("word"))
             .where(F.col("word") != ""))
    first = F.concat(F.lit(_S), F.substring("word", 1, 1), F.lit(_E))
    rest = F.regexp_replace(F.substring("word", 2, 1_000_000),
                            "(.)", _S + CONT + "$1" + _E)
    out = (words.groupBy("word").agg(F.count("*").alias("n"))
           .withColumn("syms", F.concat(first, rest)))
    if min_count > 1:
        out = out.where(F.col("n") >= min_count)
    return out


def _merged(a: str, b: str) -> str:
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def train_wordpiece(df: DataFrame, text_col: str = "text",
                    num_merges: int = 50, min_pair_count: int = 2,
                    min_count: int = 1,
                    checkpoint_every: int = 8) -> list[str]:
    """Learn a WordPiece vocabulary; returns the LEARNED pieces in
    merge order (single characters are implicitly in the vocabulary —
    callers wanting the full piece list use :func:`wordpiece_vocab`).
    Deterministic under any partitioning: the argmax orders on the
    likelihood ratio with (cnt desc, left asc, right asc) as explicit
    tie-breakers, so equal-score pairs resolve identically on every
    run."""
    vocab = _wp_symbol_table(df, text_col, min_count=min_count) \
        .localCheckpoint(eager=True)
    # small-vocab fast path — same reasoning as tokenize.train_bpe
    # (r9): tiny distinct-word tables otherwise pay a full reduce-task
    # fan per training round
    small = vocab.count() <= 100_000
    if small:
        vocab = vocab.coalesce(1).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    pinned = vocab
    for i in range(num_merges):
        syms = _sym_array(F.col("syms"))
        a = F.slice(syms, 1, F.size(syms) - 1)
        b = F.slice(syms, 2, F.size(syms) - 1)
        pairs = F.zip_with(a, b, lambda x, y: F.concat(x, F.lit(_S), y))
        pc = (vocab.select(F.explode(pairs).alias("pair"), "n")
              .groupBy("pair").agg(F.sum("n").alias("cnt")))
        sc = (vocab.select(F.explode(syms).alias("sym"), "n")
              .groupBy("sym").agg(F.sum("n").alias("scnt")))
        sp = F.split(F.col("pair"), _S)
        scored = (pc.select(F.element_at(sp, 1).alias("left"),
                            F.element_at(sp, 2).alias("right"), "cnt")
                  .join(sc.withColumnRenamed("sym", "left")
                          .withColumnRenamed("scnt", "cl"), "left")
                  .join(sc.withColumnRenamed("sym", "right")
                          .withColumnRenamed("scnt", "cr"), "right")
                  .withColumn("score",
                              F.col("cnt").cast("double")
                              / (F.col("cl") * F.col("cr"))))
        if small:
            scored = scored.coalesce(1)
        top = (scored.where(F.col("cnt") >= min_pair_count)
               .orderBy(F.col("score").desc(), F.col("cnt").desc(),
                        F.col("left").asc(), F.col("right").asc())
               .limit(1).collect())
        if not top:
            break
        pa, pb = top[0]["left"], top[0]["right"]
        merges.append((pa, pb))
        vocab = vocab.withColumn(
            "syms", F.replace(F.col("syms"),
                              F.lit(_wrap(pa) + _wrap(pb)),
                              F.lit(_wrap(_merged(pa, pb)))))
        if (i + 1) % checkpoint_every == 0:
            nxt = vocab.localCheckpoint(eager=True)
            pinned.unpersist()
            pinned, vocab = nxt, nxt
    pinned.unpersist()
    return [_merged(a, b) for a, b in merges]


def wordpiece_vocab(df: DataFrame, text_col: str,
                    learned: list[str]) -> list[str]:
    """Full piece list: every base symbol observed in the corpus
    (bare first characters + ##-prefixed continuations) plus the
    learned pieces, deduplicated in that order."""
    base = _wp_symbol_table(df, text_col) \
        .select(F.explode(_sym_array(F.col("syms"))).alias("s")) \
        .distinct().orderBy("s").collect()
    out, seen = [], set()
    for s in [r["s"] for r in base] + list(learned):
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def greedy_encode_word(word: str, vocab: set, max_piece_len: int,
                       unk: str = "[UNK]") -> list[str]:
    """BERT WordpieceTokenizer greedy longest-match-first walk for one
    word (driver/test helper; the distributed path is
    :func:`wordpiece_encode`)."""
    out = []
    pos = 0
    n = len(word)
    while pos < n:
        end = min(n, pos + max_piece_len)
        piece = None
        while end > pos:
            cand = word[pos:end]
            if pos > 0:
                cand = CONT + cand
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        pos = end
    return out


def wordpiece_encode(df: DataFrame, text_col: str, vocab,
                     tokens_col: str = "tokens",
                     unk: str = "[UNK]") -> DataFrame:
    """Add ``tokens_col`` (array<string> of WordPiece tokens for the
    whole document, words independently encoded in order). ONE Arrow
    mapInPandas pass; the vocabulary rides the closure (broadcast to
    executors once), so the plan has zero shuffles and scales with
    partitions — the same shape as unigram.viterbi_encode."""
    vset = set(vocab)
    max_len = max((len(p) - len(CONT) if p.startswith(CONT) else len(p))
                  for p in vset) if vset else 1
    def enc(batches):
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                doc = []
                for w in str(text or "").split():
                    doc.extend(greedy_encode_word(w, vset, max_len,
                                                  unk))
                toks.append(doc)
            out = pdf.copy()
            out[tokens_col] = toks
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields) + f", `{tokens_col}` array<string>"
    return df.mapInPandas(enc, schema=schema)


__all__ = ["train_wordpiece", "wordpiece_vocab", "wordpiece_encode",
           "greedy_encode_word", "CONT"]
