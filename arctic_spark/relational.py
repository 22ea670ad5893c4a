"""Skew-aware relational helpers: key-skew diagnostics and salted
joins.

The engine's default stance on skew is Spark's own machinery — AQE
skew-join splitting is ON session-wide (``session.py``), map-side
partial aggregation already collapses skewed ``count/sum/min/max``
before the shuffle, and broadcast joins sidestep skew entirely when one
side is small. Salting is for the remaining case: a SHUFFLE join where
a handful of hot keys concentrate a large share of the probe side and
the build side is too big to broadcast, or an engine (structured
streaming state, older Spark) where AQE cannot re-split at runtime.

``salted_join`` is semantics-preserving by construction: the skewed
side's rows scatter across ``salt`` sub-keys deterministically, the
other side replicates once per sub-key, and the join key becomes
(key, salt) — every original match pair still meets exactly once, so
the output multiset is IDENTICAL to the plain join (the oracle gate
checks exactly that). Cost model: the replicated side grows ``salt``×,
so pick ``salt`` ≈ (hot-key share × cores), and only salt when the hot
keys actually dominate — ``skewed_keys`` measures that with one
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skewed_keys(df: DataFrame, key_cols, min_share: float = 0.01,
                top: int = 20) -> DataFrame:
    """Heavy-hitter diagnostic: keys carrying at least ``min_share`` of
    the rows, with their counts and shares, heaviest first. One
    groupBy shuffle (map-side partials make it skew-safe itself)."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    total = df.count()
    return (df.groupBy(*key_cols).agg(F.count("*").alias("n"))
            .withColumn("share", F.col("n") / F.lit(float(total)))
            .where(F.col("share") >= min_share)
            .orderBy(F.col("n").desc(), *key_cols)
            .limit(top))


def salted_join(skewed: DataFrame, other: DataFrame, on,
                salt: int = 16, how: str = "inner",
                salt_on=None) -> DataFrame:
    """Equi-join where ``skewed`` carries hot keys: scatter its rows
    over ``salt`` deterministic sub-keys (xxhash64 of ``salt_on`` —
    default all of the skewed side's columns — mod ``salt``), replicate
    ``other`` once per sub-key via a literal-array explode (no extra
    shuffle: the explode rides the existing exchange), and join on
    (key..., __salt). Output columns and multiset are identical to
    ``skewed.join(other, on, how)``.

    Supported ``how``: inner and left/left_outer (the skewed side must
    be the preserved side — a right/full join would multiply unmatched
    ``other`` rows across salts).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    salt_src = ([F.col(c) for c in skewed.columns]
                if salt_on is None
                else [F.col(c) if isinstance(c, str) else c
                      for c in ([salt_on] if isinstance(salt_on, str)
                                else list(salt_on))])
    lef = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src), F.lit(salt)).cast("int"))
    rig = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = lef.join(rig, on + ["__salt"], how)
    return out.drop("__salt")
