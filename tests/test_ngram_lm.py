"""Interpolated Kneser-Ney LM (llm/ngram_lm.py; Chen & Goodman 1998).
Verified against an independent pure-Python reference implementation
built straight from the paper's formulas over brute-force counts."""

import math
import re
from collections import Counter

import pytest

from arctic_spark.llm import ngram_lm as L


def ref_counts(texts, order=3):
    c = {n: Counter() for n in range(1, order + 1)}
    docs = []
    for t in texts:
        ws = [w for w in re.split("[^a-z]+", t.lower()) if w]
        toks = [L.BOS] * (order - 1) + ws + [L.EOS]
        docs.append(toks)
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                g = tuple(toks[i:i + n])
                if all(x == L.BOS for x in g):
                    continue
                c[n][g] += 1
    return c, docs


def ref_model(c, D=0.75):
    """Reference interpolated KN directly from the formulas."""
    n1_w = Counter(w for (_, w) in c[2])
    n1_tot = len(c[2])
    n1_vw = Counter((v, w) for (_, v, w) in c[3])
    n1_vd = Counter()                      # N1+(·v·) = sum_w N1+(·vw)
    for (v, _), k in n1_vw.items():
        n1_vd[v] += k
    nrv = Counter(v for (v, _) in c[2])
    ch = Counter()
    n1h = Counter()
    for (u, v, w), k in c[3].items():
        ch[(u, v)] += k
        n1h[(u, v)] += 1

    def p1(w):
        return n1_w.get(w, 0) / n1_tot

    def p2(w, v):
        if v not in n1_vd:
            return p1(w)
        head = max(n1_vw.get((v, w), 0) - D, 0.0) / n1_vd[v]
        bo = D * nrv[v] / n1_vd[v]
        return head + bo * p1(w)

    def p3(w, u, v):
        if (u, v) not in ch:
            return p2(w, v)
        head = max(c[3].get((u, v, w), 0) - D, 0.0) / ch[(u, v)]
        bo = D * n1h[(u, v)] / ch[(u, v)]
        return head + bo * p2(w, v)

    return p1, p2, p3


CORPUS = ["the cat sat on the mat",
          "the dog sat on the log",
          "a cat and a dog",
          "the cat and the cat again",
          "dogs do not sit on logs"]


def test_reference_model_normalizes():
    c, _ = ref_counts(CORPUS)
    p1, p2, p3 = ref_model(c)
    vocab = {w for (w,) in c[1]} | {L.EOS}
    vocab.discard(L.BOS)
    assert sum(p1(w) for w in vocab) == pytest.approx(1.0, abs=1e-9)
    for v in ["the", "cat", "on"]:
        assert sum(p2(w, v) for w in vocab) == pytest.approx(1.0,
                                                             abs=1e-9)
    for (u, v) in [("the", "cat"), ("sat", "on"), (L.BOS, L.BOS)]:
        assert sum(p3(w, u, v) for w in vocab) == pytest.approx(
            1.0, abs=1e-9)


def test_counts_match_reference(spark):
    df = spark.createDataFrame(list(enumerate(CORPUS)),
                               "doc_id long, text string")
    counts = L.ngram_counts(df, "text", 3)
    c, _ = ref_counts(CORPUS)
    for n in (1, 2, 3):
        got = {tuple(r["gram"].split(" ")): r["cnt"]
               for r in counts[n].collect()}
        assert got == dict(c[n])


def test_kn_score_matches_reference(spark):
    df = spark.createDataFrame(list(enumerate(CORPUS)),
                               "doc_id long, text string")
    model = L.kn_model(L.ngram_counts(df, "text", 3), discount=0.75)
    got = {r["id"]: r for r in
           L.kn_score(df, "text", model, "doc_id").collect()}
    c, docs = ref_counts(CORPUS)
    p1, p2, p3 = ref_model(c, 0.75)
    for i, toks in enumerate(docs):
        want = 0.0
        npos = 0
        for k in range(2, len(toks)):
            want += p3(toks[k], toks[k - 2], toks[k - 1])
            npos += 1
        assert got[i]["n_pos"] == npos
        assert got[i]["sum_p"] == pytest.approx(want, abs=1e-10)


def ref_model_modified(c, bds, tds):
    """Reference modified KN with given (D1,D2,D3) per level."""
    n1_w = Counter(w for (_, w) in c[2])
    n1_tot = len(c[2])
    n1_vw = Counter((v, w) for (_, v, w) in c[3])
    n1_vd = Counter()
    for (v, _), k in n1_vw.items():
        n1_vd[v] += k
    ch = Counter()
    for (u, v, w), k in c[3].items():
        ch[(u, v)] += k

    def disc(cnt, ds):
        return ds[0] if cnt == 1 else ds[1] if cnt == 2 else ds[2]

    def p1(w):
        return n1_w.get(w, 0) / n1_tot

    def p2(w, v):
        if v not in n1_vd:
            return p1(w)
        ks = Counter(min(k, 3) for (vv, _), k in n1_vw.items()
                     if vv == v)
        bo = (bds[0] * ks[1] + bds[1] * ks[2] + bds[2] * ks[3]) \
            / n1_vd[v]
        k = n1_vw.get((v, w), 0)
        head = max(k - disc(k, bds), 0.0) / n1_vd[v] if k else 0.0
        return head + bo * p1(w)

    def p3(w, u, v):
        if (u, v) not in ch:
            return p2(w, v)
        ks = Counter(min(k, 3) for (uu, vv, _), k in c[3].items()
                     if (uu, vv) == (u, v))
        bo = (tds[0] * ks[1] + tds[1] * ks[2] + tds[2] * ks[3]) \
            / ch[(u, v)]
        k = c[3].get((u, v, w), 0)
        head = max(k - disc(k, tds), 0.0) / ch[(u, v)] if k else 0.0
        return head + bo * p2(w, v)

    return p1, p2, p3


def test_modified_kn_matches_reference_and_normalizes(spark):
    df = spark.createDataFrame(list(enumerate(CORPUS)),
                               "doc_id long, text string")
    counts = L.ngram_counts(df, "text", 3)
    bds = L.estimate_discounts(
        counts[3].select(L.F.split("gram", " ").alias("p"), "cnt")
        .select(L.F.element_at("p", 2).alias("v"),
                L.F.element_at("p", 3).alias("w"))
        .groupBy("v", "w").agg(L.F.count("*").alias("cnt")))
    tds = L.estimate_discounts(counts[3])
    model = L.kn_model_modified(counts)
    got = {r["id"]: r for r in
           L.kn_score(df, "text", model, "doc_id").collect()}
    c, docs = ref_counts(CORPUS)
    p1, p2, p3 = ref_model_modified(c, bds, tds)
    # normalization at every level (the three-discount backoff weight
    # must exactly rebate the discounted head mass)
    vocab = {w for (w,) in c[1]} | {L.EOS}
    vocab.discard(L.BOS)
    for v in ["the", "cat", "on"]:
        assert sum(p2(w, v) for w in vocab) == pytest.approx(1.0,
                                                             abs=1e-9)
    for (u, v) in [("the", "cat"), ("sat", "on")]:
        assert sum(p3(w, u, v) for w in vocab) == pytest.approx(
            1.0, abs=1e-9)
    for i, toks in enumerate(docs):
        want = sum(p3(toks[k], toks[k - 2], toks[k - 1])
                   for k in range(2, len(toks)))
        assert got[i]["sum_p"] == pytest.approx(want, abs=1e-10)


def test_kn_perplexity(spark):
    train = spark.createDataFrame(list(enumerate(CORPUS)),
                                  "doc_id long, text string")
    model = L.kn_model(L.ngram_counts(train, "text", 3))
    # an in-corpus doc scores far lower perplexity than word salad
    test = spark.createDataFrame(
        [(0, "the cat sat on the mat"),
         (1, "log mat dogs a not cat do")],
        "doc_id long, text string")
    ppl = {r.id: r.ppl for r in
           L.kn_perplexity(test, "text", model, "doc_id").collect()}
    assert ppl[0] < ppl[1]
    assert ppl[0] > 1.0


def test_kn_score_unseen_words_and_truncation(spark):
    train = spark.createDataFrame(list(enumerate(CORPUS)),
                                  "doc_id long, text string")
    model = L.kn_model(L.ngram_counts(train, "text", 3))
    test = spark.createDataFrame(
        [(0, "the zebra sat on the xylophone and more and more and more")],
        "doc_id long, text string")
    rows = L.kn_score(test, "text", model, "doc_id",
                      max_positions=5).collect()
    assert rows[0]["n_pos"] == 5
    # unseen words get the continuation-unigram floor of 0, but seen
    # positions contribute: sum is strictly between 0 and n_pos
    assert 0.0 < rows[0]["sum_p"] < 5.0


def test_kn_models_shared_counts_match_separate(spark):
    """kn_models trains both variants from ONE persisted count set
    (VERDICT r10 #3); every output table must be row-identical to the
    separately-trained models."""
    df = spark.createDataFrame(
        [(i, CORPUS[i % len(CORPUS)]) for i in range(24)],
        "doc_id long, text string")
    counts = L.ngram_counts(df, "text", 3)
    both = L.kn_models(counts)
    sep_i = L.kn_model(L.ngram_counts(df, "text", 3), discount=0.75)
    sep_m = L.kn_model_modified(L.ngram_counts(df, "text", 3))

    def snap(model, key, cols):
        return sorted(tuple(round(float(v), 12) if isinstance(v, float)
                            else v for v in r)
                      for r in model[key].select(*cols).collect())

    for key, cols in [("uni", ["w", "p1"]), ("bi", ["v", "w", "p2"]),
                      ("bi_bo", ["v", "bo2"]),
                      ("tri", ["u", "v", "w", "p3_head"])]:
        assert snap(both["interpolated"], key, cols) == \
            snap(sep_i, key, cols), key
        assert snap(both["modified"], key, cols) == \
            snap(sep_m, key, cols), key
    # scoring works off the shared-trained models
    s1 = L.kn_score(df.limit(5), "text", both["interpolated"])
    s2 = L.kn_score(df.limit(5), "text", both["modified"])
    assert s1.count() == 5 and s2.count() == 5
    # one shared pin list; repeated unpersist is harmless
    assert both["interpolated"]["_pinned"] is both["modified"]["_pinned"]
    for m in (both["interpolated"], sep_i, sep_m):
        for d in m["_pinned"]:
            d.unpersist()


def test_kn_models_unknown_variant():
    with pytest.raises(ValueError, match="variant"):
        L.kn_models({}, variants=("interpolated", "bogus"))


def test_kn_score_sliced_broadcast_matches_default(spark):
    # r13 (VERDICT r12 #5): above broadcast_types_limit the p-table
    # joins via hash-sliced broadcasts against the cached position
    # stream — per-position probabilities must match the broadcast
    # path exactly (union of disjoint hash slices == the inner join)
    import pytest
    df = spark.createDataFrame(list(enumerate(CORPUS)),
                               "doc_id long, text string")
    model = L.kn_model(L.ngram_counts(df, "text", 3), discount=0.75)
    base = {r["id"]: r for r in
            L.kn_score(df, "text", model, "doc_id").collect()}
    sliced = {r["id"]: r for r in
              L.kn_score(df, "text", model, "doc_id",
                         broadcast_types_limit=4).collect()}
    assert set(sliced) == set(base)
    for i in base:
        assert sliced[i]["n_pos"] == base[i]["n_pos"]
        assert sliced[i]["sum_p"] == pytest.approx(
            base[i]["sum_p"], abs=1e-12)
        assert sliced[i]["sum_log2_p"] == pytest.approx(
            base[i]["sum_log2_p"], abs=1e-9)
    # a type count needing more slices than max_broadcast_slices
    # keeps the plain shuffle join (same numbers again)
    shuffled = {r["id"]: r for r in
                L.kn_score(df, "text", model, "doc_id",
                           broadcast_types_limit=1,
                           max_broadcast_slices=2).collect()}
    for i in base:
        assert shuffled[i]["n_pos"] == base[i]["n_pos"]
        assert shuffled[i]["sum_p"] == pytest.approx(
            base[i]["sum_p"], abs=1e-12)
