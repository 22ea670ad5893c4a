"""Hashed-feature linear text classifier — the model-based quality
filter of a training-data pipeline (fastText-style bag of words,
Joulin et al. 2016, "Bag of Tricks for Efficient Text Classification",
arXiv:1607.01759; feature hashing per Weinberger et al. 2009,
arXiv:0902.2206). The reference engine has none of this; it belongs to
the LLM-pipeline surface next to the heuristic quality scores
(llm/text.py) — heuristics bootstrap labels, this learns from them.

Two halves, both one-scan-per-pass:

* **Scoring is a single native expression** (zero Python): tokens hash
  to one of ``dims`` buckets via the engine's portable md5-based
  32-bit hash (the same ``conv(substr(md5(x),1,8),16,10)`` primitive
  the dedup pipeline uses, so DuckDB replays it bit-for-bit), the
  document logit is ``bias + mean(bucket weights)``, the quality score
  its sigmoid. Weights ride the plan as ONE array literal.

* **Training is distributed batch logistic regression**: every
  partition computes a dense ``(dims+1)`` gradient partial in numpy
  over Arrow batches (``mapInPandas`` — NO shuffle, the
  embedding-moments pattern of llm/embed.py), the driver sums the
  partials and takes a step. Python-side hashing is
  ``int(hashlib.md5(tok).hexdigest()[:8], 16) % dims`` — identical to
  the native expression, so a trained model scores consistently
  through the zero-Python path. At 100 TB each epoch is one
  embarrassingly-parallel corpus scan shipping ``dims+1`` doubles per
  partition to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col) -> Column:
    """Whitespace tokens, empties dropped (the portable tokenizer both
    engines and the python trainer reproduce exactly)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # non-whitespace runs == split-on-\s+ with empties dropped; the
    # regexp form is codegen, the filter() HOF is interpreted (r9)
    return F.regexp_extract_all(c, F.lit(r"\S+"), 0)


def token_bucket(tok, dims: int) -> Column:
    """md5-based feature bucket in [0, dims) — portable across Spark,
    DuckDB (``CAST('0x'||substr(md5(t),1,8) AS BIGINT) % dims``) and
    python hashlib."""
    return (F.conv(F.substring(F.md5(tok), 1, 8), 16, 10)
            .cast("long") % F.lit(int(dims)))


def score_text(text_col, weights, bias: float, dims: int = None) -> Column:
    """Quality score column: sigmoid(bias + mean of hashed-bucket
    weights); empty/whitespace documents score sigmoid(bias). Fully
    native — the weights are one array literal probed per token."""
    dims = int(dims or len(weights))
    if len(weights) != dims:
        raise ValueError(f"weights has {len(weights)} entries, dims={dims}")
    warr = F.lit([float(w) for w in weights])
    toks = _tokens(text_col)
    wsum = F.aggregate(
        toks, F.lit(0.0),
        lambda acc, t: acc + F.element_at(warr,
                                          token_bucket(t, dims)
                                          .cast("int") + 1))
    n = F.size(toks)
    z = F.lit(float(bias)) + F.when(n > 0, wsum / n).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_text_classifier(df: DataFrame, text_col: str, label_col: str,
                          dims: int = 1024, iters: int = 20,
                          lr: float = 2.0, l2: float = 0.0):
    """Distributed batch logistic regression on hashed mean-of-bucket
    features; returns ``(weights, bias)`` ready for :func:`score_text`.

    Per epoch: ONE ``mapInPandas`` pass emits a (dims+1) gradient
    partial per partition (numpy sparse accumulation — no shuffle, no
    per-row Python beyond the Arrow batch), the driver sums and steps
    full-batch gradient descent. Deterministic: float accumulation
    happens in a fixed per-partition order and the driver sum is over
    a sorted, bounded list of partials."""
    import numpy as np

    dims = int(dims)
    src = df.select(F.col(text_col).cast("string").alias("t"),
                    F.col(label_col).cast("double").alias("y"))
    # tokenless pre-pass not needed: hashing happens inside the epoch
    w = np.zeros(dims)
    b = 0.0

    def epoch(w_now, b_now):
        wb = w_now.copy()
        bb = float(b_now)

        def partials(batches):
            import hashlib
            import re
            import pandas as pd
            from pyspark import TaskContext
            # mirror score_text's Java-regex \s+ split (ASCII-only
            # whitespace) exactly — Python str.split() is
            # Unicode-aware and would bucket U+00A0/U+2028-bearing
            # tokens differently in training vs native scoring
            # (ADVICE r7)
            ws = re.compile(r"[ \t\n\x0b\f\r]+")
            pid = TaskContext.get().partitionId()
            gw = np.zeros(dims)
            gb = 0.0
            n = 0
            for pdf in batches:
                for t, y in zip(pdf["t"], pdf["y"]):
                    toks = [w for w in ws.split("" if t is None else t)
                            if w]
                    if toks:
                        idx = np.array([
                            int(hashlib.md5(tok.encode("utf-8"))
                                .hexdigest()[:8], 16) % dims
                            for tok in toks])
                        x = 1.0 / len(idx)
                        z = bb + wb[idx].sum() * x
                    else:
                        idx = None
                        z = bb
                    p = 1.0 / (1.0 + np.exp(-z))
                    err = p - float(y)
                    if idx is not None:
                        np.add.at(gw, idx, err * x)
                    gb += err
                    n += 1
            # partition id leads the partial: sorting on it gives a
            # TOTAL, stable order for the driver sum — value-prefix
            # sorting could tie and leave collect order visible
            # (ADVICE r7)
            yield pd.DataFrame(
                {"g": [np.append([float(pid)],
                                 np.append(gw, [gb, n])).tolist()]})

        parts = [np.asarray(r["g"]) for r in
                 src.mapInPandas(partials, "g array<double>").collect()]
        parts.sort(key=lambda a: a[0])               # deterministic sum
        tot = np.sum(parts, axis=0)[1:]
        return tot[:dims], tot[dims], tot[dims + 1]

    for _ in range(int(iters)):
        gw, gb, n = epoch(w, b)
        if n == 0:
            raise ValueError("cannot train on an empty corpus")
        w -= lr * (gw / n + l2 * w)
        b -= lr * gb / n
    return w.tolist(), float(b)
