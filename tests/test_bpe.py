"""Distributed BPE (llm.tokenize) vs a pure-Python Sennrich reference."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from arctic_spark.llm import tokenize as tk


# ---- reference implementation (paper pseudocode, driver-side) ----------

def _ref_word_vocab(texts):
    c = Counter()
    for t in texts:
        for w in t.split():
            c[tuple(w) + (tk.END,)] += 1
    return dict(c)


def _ref_stats(vocab):
    s = Counter()
    for word, n in vocab.items():
        for i in range(len(word) - 1):
            s[(word[i], word[i + 1])] += n
    return s


def _ref_merge_word(word, a, b):
    out, i = [], 0
    while i < len(word):
        if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def _ref_train(texts, num_merges, min_pair_count=2):
    vocab = _ref_word_vocab(texts)
    merges = []
    for _ in range(num_merges):
        stats = _ref_stats(vocab)
        if not stats:
            break
        pair = min(stats, key=lambda p: (-stats[p], p[0], p[1]))
        if stats[pair] < min_pair_count:
            break
        merges.append(pair)
        vocab = {_ref_merge_word(w, *pair): n for w, n in vocab.items()}
    return merges


def _ref_encode(text, merges):
    toks = []
    for w in text.split():
        word = tuple(w) + (tk.END,)
        for a, b in merges:
            word = _ref_merge_word(word, a, b)
        toks.extend(word)
    return toks


TEXTS = [
    "low lower lowest low low",
    "new newer newest new wider wide wide",
    "aaaa aaa aa a aaaaa",
    "the quick brown fox the lazy dog the end",
    "mississippi missive misfit",
]


def test_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = tk.train_bpe(df, "text", num_merges=20, checkpoint_every=4)
    want = _ref_train(TEXTS, 20)
    assert got == want
    assert len(got) == 20  # corpus is rich enough to yield all 20


def test_encode_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = _ref_train(TEXTS, 15)
    out = tk.apply_bpe(df.withColumn("id", F.monotonically_increasing_id()),
                       "text", merges)
    rows = out.select("text", "tokens").collect()
    for r in rows:
        assert list(r["tokens"]) == _ref_encode(r["text"], merges)


def test_self_adjacent_runs_canonical(spark):
    # "aaaaa" with merge (a,a) must give [aa, aa, a] — canonical L2R,
    # not [aa, a, aa]
    df = spark.createDataFrame([("aaaaa",)], "text string")
    out = tk.apply_bpe(df, "text", [("a", "a")]).collect()[0]["tokens"]
    assert list(out) == ["aa", "aa", "a", tk.END]


def test_cascaded_merges_and_word_end_fusion(spark):
    df = spark.createDataFrame([("ababab abab",)], "text string")
    merges = [("a", "b"), ("ab", "ab"), ("ab", tk.END)]
    out = tk.apply_bpe(df, "text", merges).collect()[0]["tokens"]
    # word1: ab ab ab -> abab + ab</w> ; word2: ab ab -> abab + </w>
    assert list(out) == ["abab", "ab" + tk.END, "abab", tk.END]


def test_no_cross_word_merge(spark):
    # rule (b, c): "ab cd" must NOT merge across the word boundary
    df = spark.createDataFrame([("ab cd",)], "text string")
    out = tk.apply_bpe(df, "text", [("b", "c")]).collect()[0]["tokens"]
    assert list(out) == ["a", "b", tk.END, "c", "d", tk.END]


def test_alignment_no_substring_false_match(spark):
    # symbols ("aa","b") must not be hit by rule ("a","b")
    df = spark.createDataFrame([("aab",)], "text string")
    merges = [("a", "a"), ("a", "b")]  # after (a,a): [aa, b]
    out = tk.apply_bpe(df, "text", merges).collect()[0]["tokens"]
    assert list(out) == ["aa", "b", tk.END]


def test_empty_and_whitespace_text(spark):
    df = spark.createDataFrame([("",), ("   ",), ("x",)], "text string")
    rows = tk.apply_bpe(df, "text", [("x", tk.END)]) \
        .select("tokens").collect()
    assert [list(r["tokens"]) for r in rows] == [[], [], ["x" + tk.END]]


def test_encode_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("hello world",)], "text string")
    plan = tk.apply_bpe(df, "text", [("l", "l"), ("o", tk.END)]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_vocab_list():
    assert tk.bpe_vocab([("a", "b"), ("ab", "c")], ["a", "b", "c"]) == \
        ["a", "b", "c", "ab", "abc"]


def test_sentinel_bytes_in_input_are_stripped(spark):
    # U+001F/U+001E are the internal symbol sentinels; raw occurrences
    # in the input must not corrupt alignment (ADVICE r6)
    dirty = "a\x1fb \x1ecd"
    df = spark.createDataFrame([(dirty,), ("ab cd",)], "text string")
    rows = tk.apply_bpe(df, "text", [("a", "b")]) \
        .select("tokens").collect()
    assert [list(r["tokens"]) for r in rows] == [
        ["ab", tk.END, "c", "d", tk.END]] * 2
    vocab = tk.word_symbol_table(df, "text").collect()
    assert sorted(r["word"] for r in vocab) == ["ab", "cd"]
    assert all("\x1f\x1f" not in r["syms"].replace("\x1e\x1f", "")
               for r in vocab)


def test_batched_merges_identical_to_sequential(spark):
    # r13: multi-merge rounds must produce EXACTLY the sequential
    # merge list (the batch takes only provably non-interacting
    # prefixes — see tokenize._batch_select)
    import random
    rng = random.Random(13)
    alpha = "abcdefg"
    texts = TEXTS + [
        " ".join("".join(rng.choice(alpha)
                         for _ in range(rng.randint(1, 6)))
                 for _ in range(rng.randint(3, 30)))
        for _ in range(40)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    # driver_vocab_limit=0 forces the DISTRIBUTED path on this tiny
    # vocab so the batched rounds are what's being exercised
    seq = tk.train_bpe(df, "text", num_merges=30, batch_merges=1,
                       driver_vocab_limit=0)
    for k in (2, 8, 16, 64):
        assert tk.train_bpe(df, "text", num_merges=30, batch_merges=k,
                            driver_vocab_limit=0) == seq, f"k={k}"
    # the r13 driver-side fast path (default limit) must agree too
    assert tk.train_bpe(df, "text", num_merges=30) == seq
    # reference parity too (ties + created-pair edge cases)
    assert seq == [tuple(p) for p in _ref_train(texts, 30)]


def test_batch_select_barrier_edge_cases():
    # created-pair tie danger: (x,a) interacts with taken (a,b) at the
    # SAME count as a later disjoint pair -> the later pair must drop
    rows = [{"left": "a", "right": "b", "cnt": 10},
            {"left": "x", "right": "a", "cnt": 9},
            {"left": "c", "right": "d", "cnt": 9}]
    assert tk._batch_select(rows, 10, 2, complete=True) == [("a", "b")]
    # disjoint pairs above the barrier all batch
    rows = [{"left": "a", "right": "b", "cnt": 10},
            {"left": "c", "right": "d", "cnt": 8},
            {"left": "e", "right": "f", "cnt": 6},
            {"left": "a", "right": "c", "cnt": 5}]
    assert tk._batch_select(rows, 10, 2, complete=True) == [
        ("a", "b"), ("c", "d"), ("e", "f")]
    # output-symbol interaction: ("ab","x") gains created adjacencies
    rows = [{"left": "a", "right": "b", "cnt": 10},
            {"left": "ab", "right": "x", "cnt": 9},
            {"left": "c", "right": "d", "cnt": 8}]
    assert tk._batch_select(rows, 10, 2, complete=True) == [("a", "b")]
    # truncated list: the last taken row ties the unseen tail -> drop
    rows = [{"left": "a", "right": "b", "cnt": 10},
            {"left": "c", "right": "d", "cnt": 8}]
    assert tk._batch_select(rows, 10, 2, complete=False) == [("a", "b")]
    # complete list without interaction keeps everything taken
    assert tk._batch_select(rows, 10, 2, complete=True) == [
        ("a", "b"), ("c", "d")]
    # min_pair_count stops the walk and bars equal counts
    rows = [{"left": "a", "right": "b", "cnt": 10},
            {"left": "c", "right": "d", "cnt": 1}]
    assert tk._batch_select(rows, 10, 2, complete=True) == [("a", "b")]
