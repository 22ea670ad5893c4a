"""Unigram-LM tokenizer (llm/unigram.py; Kudo 2018 arXiv:1804.10959).
The lattice DP is verified against brute-force enumeration of ALL
segmentations; the trainer against planted-vocabulary recovery; the
encoder end-to-end through Spark."""

import itertools
import math

import numpy as np
import pytest

from arctic_spark.llm import unigram as U


def brute_segmentations(word, logp, max_len):
    """All (pieces, score) via boundary bitmasks."""
    n = len(word)
    out = []
    for mask in range(1 << max(0, n - 1)):
        bounds = [0] + [i for i in range(1, n)
                        if mask & (1 << (i - 1))] + [n]
        pieces = [word[a:b] for a, b in zip(bounds, bounds[1:])]
        if any(len(p) > max_len or p not in logp for p in pieces):
            continue
        out.append((pieces, sum(logp[p] for p in pieces)))
    return out


LOGP = {"a": -2.0, "b": -3.0, "ab": -2.5, "ba": -4.0, "aba": -5.0,
        "bb": -3.5, "c": -1.5}


@pytest.mark.parametrize("word", ["a", "ab", "aba", "abab", "bbaa",
                                  "ababab", "cc", "cab"])
def test_forward_backward_matches_brute(word):
    segs = brute_segmentations(word, LOGP, 3)
    z_brute = math.log(sum(math.exp(s) for _, s in segs))
    want = {}
    for pieces, s in segs:
        w = math.exp(s - z_brute)
        for p in pieces:
            want[p] = want.get(p, 0.0) + w
    got, z = U.forward_backward(word, LOGP, 3)
    assert z == pytest.approx(z_brute, abs=1e-10)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], abs=1e-10)


@pytest.mark.parametrize("word", ["a", "ab", "aba", "abab", "bbaa",
                                  "ababab", "cab", "abba"])
def test_viterbi_matches_brute(word):
    segs = brute_segmentations(word, LOGP, 3)
    best = max(s for _, s in segs)
    pieces, score = U.viterbi_segment(word, LOGP, 3)
    assert score == pytest.approx(best, abs=1e-12)
    assert "".join(pieces) == word
    assert sum(LOGP[p] for p in pieces) == pytest.approx(best)


def test_viterbi_unsegmentable_and_ties():
    assert U.viterbi_segment("xyz", LOGP, 3) == ([], U.NEG_INF)
    # tie: "aa" as a+a only; "ab" both as ab (-2.5) vs a+b (-5) -> ab
    assert U.viterbi_segment("ab", LOGP, 3)[0] == ["ab"]
    # exact tie engineered: p(xy) == p(x)+p(y) -> prefer FEWER pieces
    lp = {"x": -1.0, "y": -1.0, "xy": -2.0}
    assert U.viterbi_segment("xy", lp, 2)[0] == ["xy"]


def test_digamma():
    # reference values (Abramowitz & Stegun): psi(1) = -gamma
    assert U.digamma(1.0) == pytest.approx(-0.5772156649015329, abs=1e-10)
    assert U.digamma(0.5) == pytest.approx(-1.9635100260214235, abs=1e-9)
    # recurrence psi(x+1) = psi(x) + 1/x
    for x in (0.3, 2.7, 11.0):
        assert U.digamma(x + 1) == pytest.approx(U.digamma(x) + 1 / x,
                                                 abs=1e-10)


def test_sample_segment_distribution():
    # alpha=1: empirical segmentation frequencies track the exact
    # posterior P(seg | word) over many seeds
    word = "abab"
    segs = brute_segmentations(word, LOGP, 3)
    z = math.log(sum(math.exp(s) for _, s in segs))
    want = {tuple(p): math.exp(s - z) for p, s in segs}
    counts = {}
    n = 4000
    for t in range(n):
        ps, sc = U.sample_segment(word, LOGP, 3, alpha=1.0, seed=str(t))
        assert "".join(ps) == word
        assert sc == pytest.approx(sum(LOGP[p] for p in ps))
        counts[tuple(ps)] = counts.get(tuple(ps), 0) + 1
    assert set(counts) == set(want)
    for seg, p in want.items():
        assert counts[seg] / n == pytest.approx(p, abs=0.03)
    # determinism: same seed, same draw
    a = U.sample_segment(word, LOGP, 3, seed="fixed")
    b = U.sample_segment(word, LOGP, 3, seed="fixed")
    assert a == b
    # alpha -> large concentrates on the Viterbi best
    best = U.viterbi_segment(word, LOGP, 3)[0]
    hits = sum(U.sample_segment(word, LOGP, 3, alpha=60.0,
                                seed=str(t))[0] == best
               for t in range(50))
    assert hits == 50
    assert U.sample_segment("qqq", {"a": -1.0}, 3) == ([], U.NEG_INF)


def test_train_recovers_planted_pieces(spark):
    # corpus dominated by two multi-char units: "ab" and "cde"
    rows = [(i, "abab abcde cdecde ab cde abab cde") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, text string")
    logp, hist = U.train_unigram(df, "text", vocab_size=12,
                                 max_piece_len=3, em_rounds=2,
                                 seed_size=50)
    assert len(logp) <= 12
    # all single chars survive; the planted units survive pruning
    for ch in "abcde":
        assert ch in logp
    assert "ab" in logp and "cde" in logp
    # probabilities behave: frequent piece beats rare single char
    assert logp["ab"] > logp["e"] - 5  # sanity: finite, comparable
    # log-likelihood is non-decreasing within an EM fit
    lls = [ll for _, ll in hist]
    assert lls[1] >= lls[0] - 1e-6


def test_viterbi_encode_spark(spark):
    lp = {"a": -2.0, "b": -3.0, "ab": -2.5, "c": -1.5}
    df = spark.createDataFrame(
        [(1, "ab abc"), (2, "Aba  b!"), (3, "zzz")],
        "id long, text string")
    out = {r.id: r for r in U.viterbi_encode(df, "text", lp, 3).collect()}
    assert out[1].pieces == ["ab", "ab", "c"]
    assert out[1].score == pytest.approx(-2.5 - 2.5 - 1.5)
    assert out[2].pieces == ["ab", "a", "b"]          # 'aba' + 'b'
    assert out[3].pieces == [] and out[3].score is None


def test_expected_counts_partitioning_invariant(spark):
    rows = [(i, "abab bba ab") for i in range(30)]
    lp = dict(LOGP)
    a = U._expected_counts(
        U._word_table(spark.createDataFrame(rows, "id long, text string")
                      .repartition(1), "text"), lp, 3)
    b = U._expected_counts(
        U._word_table(spark.createDataFrame(rows, "id long, text string")
                      .repartition(7), "text"), lp, 3)
    a_ll, b_ll = a.pop("__LL__"), b.pop("__LL__")
    assert a_ll == pytest.approx(b_ll, rel=1e-12)
    assert set(a) == set(b)
    for p in a:
        assert a[p] == pytest.approx(b[p], rel=1e-12)
