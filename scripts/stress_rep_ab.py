"""Stress A/B: native HOF repetition metrics vs fused Arrow battery.

Same-session, identical persisted corpus (default 1M structured docs),
both sides forced end-to-end with the noop sink; equality asserted on
exact micro-unit (x1e6 BIGINT) sums of all four rounded fractions.

Usage: python scripts/stress_rep_ab.py [n_docs] [passes]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from arctic_spark.llm import text  # noqa: E402
from arctic_spark.session import get_spark  # noqa: E402

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("stress-rep-ab")

    # structured docs: ~12 lines of 2 words from a tiny vocab (real
    # birthday-effect line collisions), blank-line paragraph breaks
    ids = spark.range(n_docs)
    word = lambda seed: F.concat(  # noqa: E731
        F.lit("w"), ((F.col("id") * seed + F.spark_partition_id())
                     % 13).cast("string"))
    line = F.concat_ws(" ", word(7), word(11))
    lines = F.array_repeat(line, 12)
    para = F.array_join(lines, "\n")
    doc = F.concat_ws("\n\n", para,
                      F.array_join(F.array_repeat(
                          F.concat_ws(" ", word(17), word(19)), 16), "\n"),
                      para)
    corpus = ids.select("id", doc.alias("t2")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    print(f"corpus: {corpus.count()} docs")

    def native(df):
        return df.select(
            "id",
            F.round(text.duplicate_line_fraction("t2"), 6).alias("a"),
            F.round(text.duplicate_line_char_fraction("t2"), 6)
            .alias("b"),
            F.round(text.duplicate_paragraph_fraction("t2"), 6)
            .alias("c"),
            F.round(text.duplicate_paragraph_char_fraction("t2"), 6)
            .alias("d"))

    def fused(df):
        m = df.select("id", text.repetition_stats("t2").alias("m"))
        return m.select(
            "id",
            F.round(F.col("m.dup_line_frac"), 6).alias("a"),
            F.round(F.col("m.dup_line_char_frac"), 6).alias("b"),
            F.round(F.col("m.dup_para_frac"), 6).alias("c"),
            F.round(F.col("m.dup_para_char_frac"), 6).alias("d"))

    def sig(df):
        r = df.agg(*[F.sum((F.col(c) * 1e6).cast("long")).alias(c)
                     for c in "abcd"]).collect()[0]
        return tuple(r)

    sigs = {}
    for name, fn in (("native_hof", native), ("fused_kernel", fused)):
        sigs[name] = sig(fn(corpus))
        times = []
        for _ in range(passes):
            t0 = time.perf_counter()
            fn(corpus).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 1))
        rate = n_docs / min(times) / 1e6
        print(f"{name:13s}: min {min(times)}s of {times}  "
              f"({rate:.2f}M docs/s)  sig={sigs[name]}")
    assert sigs["native_hof"] == sigs["fused_kernel"], sigs
    print("signatures EQUAL")
    spark.stop()


if __name__ == "__main__":
    main()
