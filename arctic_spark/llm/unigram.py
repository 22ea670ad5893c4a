"""Distributed Unigram-LM tokenizer (Kudo 2018, "Subword
Regularization", arXiv:1804.10959 — the SentencePiece `unigram`
algorithm; public paper/implementation semantics, no code reuse).

The other major subword algorithm besides BPE (``llm/tokenize.py``):
pieces carry probabilities, training is EM over the segmentation
lattice, encoding is Viterbi. Pipeline roles: vocabulary induction
for training corpora, segmentation-aware token counting, and the
sampling-based regularization the paper introduces.

Scale design (100 TB):

* Everything runs over the DISTINCT-WORD table (word, count) — one
  shuffle builds it, and every later stage is bounded by corpus
  vocabulary, not corpus size (the same trick as the BPE trainer).
* Seed candidates: every substring (≤ ``max_piece_len``) of every
  distinct word, counted with word weights — one mapInPandas + one
  groupBy shuffle; only the top ``seed_size`` rows reach the driver.
* Each EM round is ONE distributed pass: the current piece table
  broadcasts as a plain dict, each partition runs forward-backward
  over its words (pure Python DP — words are short; the lattice per
  word is O(len × max_piece_len)) and emits per-partition partial
  expected counts; one groupBy sums them; the M-step
  (digamma-normalized, as SentencePiece's Bayesian EM) is
  vocab-sized driver work.
* Pruning is driver-side over the vocab (bounded): a piece's loss is
  its expected count times the likelihood drop when it must be
  re-segmented with the remaining pieces (Viterbi alt-score), single
  characters are never pruned; prune → re-run EM → repeat until the
  target vocabulary size.
* Viterbi encoding broadcasts the final piece table and segments in
  one Arrow-batched pass, zero shuffles.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEG_INF = float("-inf")


def digamma(x: float) -> float:
    """ψ(x) by the standard asymptotic series with upward recurrence
    (Abramowitz & Stegun 6.3.18) — what SentencePiece's Bayesian
    M-step uses; accurate to ~1e-12 for x > 0."""
    r = 0.0
    while x < 10.0:
        r -= 1.0 / x
        x += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    return (r + math.log(x) - 0.5 * inv
            - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0
                                           - inv2 / 252.0)))


# ---------------------------------------------------------------------------
# lattice DP (pure python — per short word, inside Arrow batches)
# ---------------------------------------------------------------------------

def _logsumexp2(a, b):
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))

def forward_backward(word: str, logp: dict, max_len: int):
    """Expected piece counts over all segmentations of ``word`` under
    the unigram LM, via the standard lattice forward-backward.
    Returns (counts: dict piece -> expected count, logZ); an
    unsegmentable word returns ({}, -inf)."""
    n = len(word)
    alpha = [NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            if alpha[i] == NEG_INF:
                continue
            lp = logp.get(word[i:j])
            if lp is not None:
                alpha[j] = _logsumexp2(alpha[j], alpha[i] + lp)
    z = alpha[n]
    if z == NEG_INF:
        return {}, NEG_INF
    beta = [NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, min(n, i + max_len) + 1):
            if beta[j] == NEG_INF:
                continue
            lp = logp.get(word[i:j])
            if lp is not None:
                beta[i] = _logsumexp2(beta[i], lp + beta[j])
    counts: dict = {}
    for i in range(n):
        if alpha[i] == NEG_INF:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or beta[j] == NEG_INF:
                continue
            w = math.exp(alpha[i] + lp + beta[j] - z)
            counts[piece] = counts.get(piece, 0.0) + w
    return counts, z


def viterbi_segment(word: str, logp: dict, max_len: int):
    """Best segmentation (pieces, score) of ``word``; ties break
    toward FEWER pieces, then toward the longer first piece —
    deterministic under any float/int scores. Unsegmentable →
    ([], -inf)."""
    n = len(word)
    best = [(NEG_INF, 0, -1)] * (n + 1)   # (score, -npieces, start)
    best[0] = (0.0, 0, -1)
    for j in range(1, n + 1):
        cand = (NEG_INF, 0, -1)
        for i in range(max(0, j - max_len), j):
            if best[i][0] == NEG_INF:
                continue
            lp = logp.get(word[i:j])
            if lp is None:
                continue
            sc = best[i][0] + lp
            np_ = best[i][1] - 1
            # larger score; then fewer pieces; then smaller start
            # (= longer final piece)
            key = (sc, np_, -i)
            if cand[2] == -1 or key > (cand[0], cand[1], -cand[2]):
                cand = (sc, np_, i)
        best[j] = cand
    if best[n][2] == -1 and n > 0:
        return [], NEG_INF
    pieces = []
    j = n
    while j > 0:
        i = best[j][2]
        pieces.append(word[i:j])
        j = i
    return pieces[::-1], best[n][0]


def sample_segment(word: str, logp: dict, max_len: int,
                   alpha: float = 0.5, seed: str = "0"):
    """Sample ONE segmentation from the unigram posterior sharpened by
    ``alpha`` (P(seg) ∝ P_model(seg)^alpha) — the paper's subword
    regularization (Kudo 2018 §3: training-time stochastic
    segmentations act as data augmentation). Forward-filtering /
    backward-sampling over the lattice; DETERMINISTIC given ``seed``
    (md5-derived uniforms, reproducible across any partitioning).
    Returns (pieces, logp_model_score); unsegmentable → ([], -inf)."""
    import hashlib
    n = len(word)
    alpha_lp = {p: v * alpha for p, v in logp.items()}
    fwd = [NEG_INF] * (n + 1)
    fwd[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            if fwd[i] == NEG_INF:
                continue
            lp = alpha_lp.get(word[i:j])
            if lp is not None:
                fwd[j] = _logsumexp2(fwd[j], fwd[i] + lp)
    if fwd[n] == NEG_INF:
        return [], NEG_INF
    pieces = []
    j = n
    k = 0
    while j > 0:
        # categorical over predecessors i with weight fwd[i] + lp(i, j)
        cands = []
        for i in range(max(0, j - max_len), j):
            lp = alpha_lp.get(word[i:j])
            if lp is not None and fwd[i] != NEG_INF:
                cands.append((i, fwd[i] + lp))
        mx = max(w for _, w in cands)
        ws = [(i, math.exp(w - mx)) for i, w in cands]
        tot = sum(w for _, w in ws)
        h = hashlib.md5(f"{seed}|{word}|{k}".encode()).digest()
        u = int.from_bytes(h[:8], "big") / 2.0 ** 64 * tot
        acc = 0.0
        pick = ws[-1][0]
        for i, w in ws:
            acc += w
            if u < acc:
                pick = i
                break
        pieces.append(word[pick:j])
        j = pick
        k += 1
    pieces = pieces[::-1]
    return pieces, sum(logp[p] for p in pieces)


# ---------------------------------------------------------------------------
# distributed trainer
# ---------------------------------------------------------------------------

def _word_table(df: DataFrame, col: str) -> DataFrame:
    """(word, count) over lowercased alphabetic words — one shuffle."""
    w = F.explode(F.split(F.lower(F.col(col)), "[^a-z]+")).alias("word")
    return (df.select(w).where(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _expected_counts(words: DataFrame, logp: dict,
                     max_len: int) -> dict:
    """One distributed E-step: per-partition partial expected counts,
    then one groupBy sum; returns the vocab-sized dict plus the
    corpus log-likelihood under '__LL__'."""

    def estep(batches):
        acc: dict = {}
        ll = 0.0
        for pdf in batches:
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                c, z = forward_backward(str(word), logp, max_len)
                if z == NEG_INF:
                    continue
                ll += float(cnt) * z
                for piece, e in c.items():
                    acc[piece] = acc.get(piece, 0.0) + float(cnt) * e
        acc["__LL__"] = ll
        yield pd.DataFrame({"piece": list(acc.keys()),
                            "e": list(acc.values())})

    rows = (words.mapInPandas(estep, schema="piece string, e double")
            .groupBy("piece").agg(F.sum("e").alias("e")).collect())
    return {r["piece"]: r["e"] for r in rows}


def train_unigram(df: DataFrame, col: str = "text",
                  vocab_size: int = 200, max_piece_len: int = 6,
                  em_rounds: int = 2, prune_frac: float = 0.25,
                  seed_size: int = 2000):
    """Train a unigram-LM vocabulary; returns (logp dict, history)
    where history records (n_pieces, log-likelihood) per EM fit.
    Module docstring covers the distribution strategy."""
    from pyspark import StorageLevel
    words = _word_table(df, col).persist(StorageLevel.MEMORY_AND_DISK)
    words.count()

    # ---- seed: substring counts, top seed_size + all single chars
    def subs(batches):
        acc: dict = {}
        for pdf in batches:
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                word = str(word)
                c = float(cnt)
                n = len(word)
                for i in range(n):
                    for j in range(i + 1, min(n, i + max_piece_len) + 1):
                        p = word[i:j]
                        acc[p] = acc.get(p, 0.0) + c
        yield pd.DataFrame({"piece": list(acc.keys()),
                            "c": list(acc.values())})

    seed_rows = (words.mapInPandas(subs, schema="piece string, c double")
                 .groupBy("piece").agg(F.sum("c").alias("c"))
                 .orderBy(F.desc("c"), "piece").limit(seed_size)
                 .collect())
    counts = {r["piece"]: r["c"] for r in seed_rows}
    singles = {r["piece"] for r in seed_rows if len(r["piece"]) == 1}
    # make sure every character is representable
    char_rows = (words.select(F.explode(F.split("word", "")).alias("ch"))
                 .where(F.col("ch") != "")
                 .groupBy("ch").agg(F.count("*").alias("c")).collect())
    for r in char_rows:
        if r["ch"] not in counts:
            counts[r["ch"]] = float(r["c"])
        singles.add(r["ch"])

    def mstep(cnts):
        tot = sum(cnts.values())
        dtot = digamma(tot)
        return {p: digamma(c) - dtot for p, c in cnts.items() if c > 0}

    logp = mstep(counts)
    history = []
    while True:
        for _ in range(em_rounds):
            e = _expected_counts(words, logp, max_piece_len)
            ll = e.pop("__LL__", 0.0)
            # pieces with zero expectation keep a floor so singles
            # never vanish
            cnts = {p: e.get(p, 0.0) for p in logp}
            for s in singles:
                cnts[s] = max(cnts.get(s, 0.0), 1e-6)
            cnts = {p: c for p, c in cnts.items() if c > 0}
            logp = mstep(cnts)
            history.append((len(logp), ll))
        multi = [p for p in logp if len(p) > 1]
        if len(logp) <= vocab_size or not multi:
            break
        # ---- prune: loss of removing piece = its expected count x
        # (own logp - best alt segmentation without it)
        losses = []
        for p in multi:
            alt_logp = dict(logp)
            del alt_logp[p]
            _, alt = viterbi_segment(p, alt_logp, max_piece_len)
            loss = cnts.get(p, 0.0) * (logp[p] - (alt if alt != NEG_INF
                                                  else -1e9))
            losses.append((loss, p))
        losses.sort()
        n_drop = min(max(1, int(len(multi) * prune_frac)),
                     max(1, len(logp) - vocab_size))
        dropped = {p for _, p in losses[:n_drop]}
        cnts = {p: c for p, c in cnts.items() if p not in dropped}
        logp = mstep(cnts)
    words.unpersist()
    return logp, history


# ---------------------------------------------------------------------------
# distributed encoder
# ---------------------------------------------------------------------------

def viterbi_encode(df: DataFrame, col: str, logp: dict,
                   max_piece_len: int = 8,
                   words_col: str = None) -> DataFrame:
    """Append ``pieces`` (array<string>, Viterbi segmentation over the
    lowercased alphabetic words of ``col``, concatenated in order),
    ``n_pieces`` and ``score`` (sum of piece log-probs; integer
    log-prob tables therefore give integer-exact scores). Rows whose
    words cannot all be segmented get score -inf semantics: the
    unsegmentable words contribute no pieces and ``score`` is null.

    One Arrow-batched pass, vocab broadcast in the closure, zero
    shuffles. ``words_col`` skips the built-in tokenization and reads
    an array<string> column instead."""
    from pyspark.sql import types as T
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("pieces", T.ArrayType(T.StringType())),
        T.StructField("n_pieces", T.IntegerType()),
        T.StructField("score", T.DoubleType())])
    cols = [f.name for f in df.schema.fields]
    import re
    tok = re.compile(r"[a-z]+")

    def run(batches):
        for pdf in batches:
            pieces_out, np_out, sc_out = [], [], []
            for row_i in range(len(pdf)):
                if words_col is not None:
                    ws = [str(w) for w in pdf[words_col].iloc[row_i]]
                else:
                    ws = tok.findall(str(pdf[col].iloc[row_i]).lower())
                all_pieces = []
                total = 0.0
                ok = True
                for w in ws:
                    ps, sc = viterbi_segment(w, logp, max_piece_len)
                    if sc == NEG_INF:
                        ok = False
                        continue
                    all_pieces.extend(ps)
                    total += sc
                pieces_out.append(all_pieces)
                np_out.append(len(all_pieces))
                sc_out.append(total if ok else None)
            out = pdf[cols].copy()
            out["pieces"] = pieces_out
            out["n_pieces"] = pd.array(np_out, dtype="Int32")
            out["score"] = pd.array(sc_out, dtype="float64")
            yield out

    return df.mapInPandas(run, schema=out_schema)
