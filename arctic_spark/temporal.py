"""Temporal operators: as-of join.

The reference has no temporal operators; this is part of the
beyond-reference analytics surface. The as-of join is implemented the
scale-correct way for Spark: union the two sides tagged by origin, one
shuffle on the join key, then a running `last(..., ignorenulls=True)`
window carries the most recent right-side row forward onto each left
row — no per-row lookups, no broadcast requirement, skew handled by AQE
on the single shuffle. The right side is carried as ONE struct so a
null value inside a right row can never be back-filled from an older
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_on: str | None = None, right_by: str | None = None,
              tolerance=None, direction: str = "backward",
              rsuffix: str = "_right") -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts (direction='backward'; 'forward' gives the
    earliest right row with right.ts >= left.ts), matched within `by`
    groups. ``tolerance`` (seconds) nulls out matches farther away.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_on = right_on or on
    right_by = right_by or by

    lcols = left.columns
    rcols = [c for c in right.columns if c not in (right_on, right_by)]
    rstruct_type = ("struct<" + ",".join(
        f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in rcols)
        + f",__rts:{right.schema[right_on].dataType.simpleString()}>")

    lt = left.select(
        F.col(by).alias("__key"), F.col(on).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_type).alias("__r"))
    rt = right.select(
        F.col(right_by).alias("__key"), F.col(right_on).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in rcols],
                 F.col(right_on).alias("__rts")).alias("__r"))

    u = lt.unionByName(rt)
    asc = direction == "backward"
    w = Window.partitionBy("__key").orderBy(
        F.col("__ts").asc() if asc else F.col("__ts").desc(),
        F.col("__is_left").asc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    carried = F.last("__r", ignorenulls=True).over(w).alias("__rc")

    out = u.select("__is_left", "__ts", *lcols, carried) \
           .where(F.col("__is_left") == 1)

    rc = F.col("__rc")
    if tolerance is not None:
        from pyspark.sql import types as T
        ts_type = left.schema[on].dataType
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
            # exact integer microseconds: epoch doubles carry ~2e-7 s FP
            # rounding, enough to flip gap == tolerance boundary cases
            lval = F.unix_micros(F.col("__ts").cast("timestamp"))
            rval = F.unix_micros(rc["__rts"].cast("timestamp"))
            tol = F.lit(int(round(float(tolerance) * 1_000_000)))
        elif isinstance(ts_type, (T.LongType, T.IntegerType,
                                  T.ShortType, T.ByteType)):
            # integral ts (e.g. nanos-as-long events): stay in longs —
            # a cast to double is lossy past 2^53 (epoch nanos is ~2^60).
            # tolerance must be integral too: a float literal would
            # promote the whole comparison back to double.
            if float(tolerance) != int(tolerance):
                raise ValueError(
                    "asof_join: fractional tolerance %r is ambiguous for "
                    "an integral timestamp column %r — pass an int in the "
                    "column's own unit" % (tolerance, on))
            lval, rval = F.col("__ts"), rc["__rts"]
            tol = F.lit(int(tolerance))
        else:
            lval = F.col("__ts").cast("double")
            rval = rc["__rts"].cast("double")
            tol = F.lit(float(tolerance))
        gap = (lval - rval) if asc else (rval - lval)
        rc = F.when(gap <= tol, F.col("__rc"))
    return out.select(*lcols,
                      *[rc[c].alias(c + rsuffix) for c in rcols])


def range_join(left: DataFrame, right: DataFrame, point_col: str,
               lo_col: str, hi_col: str, bucket_size: float | None = None,
               how: str = "inner", rsuffix: str = "_right") -> DataFrame:
    """Interval join: left rows with numeric `point_col` matched to right
    rows where lo_col <= point <= hi_col.

    Spark's own planner turns inequality joins into broadcast
    nested-loop (O(n·m)); this instead buckets the number line: each
    right interval explodes to the buckets it spans, each left point
    lives in exactly one bucket, and the match is a plain equi-join on
    bucket id + a final interval check — one shuffle, AQE-skew-safe,
    the 1-D analogue of the spatial grid join.
    """
    if how not in ("inner", "left"):
        raise ValueError("range_join supports how='inner'|'left'")
    if bucket_size is None:
        row = right.agg(
            F.avg(F.col(hi_col) - F.col(lo_col)).alias("w")).collect()[0]
        bucket_size = max(float(row.w or 1.0), 1e-9)
    bs = F.lit(float(bucket_size))

    rcols = right.columns
    r = right.select(
        *[F.col(c).alias(c + rsuffix) for c in rcols],
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / bs).cast("long"),
            F.floor(F.col(hi_col) / bs).cast("long"))).alias("__rbucket"))
    lt = left.withColumn("__bucket",
                         F.floor(F.col(point_col) / bs).cast("long"))
    cond = ((F.col("__bucket") == F.col("__rbucket"))
            & (F.col(point_col) >= F.col(lo_col + rsuffix))
            & (F.col(point_col) <= F.col(hi_col + rsuffix)))
    matched = lt.join(r, cond, how="inner").drop("__bucket", "__rbucket")
    if how == "inner":
        return matched
    # Left join without a synthetic row id (monotonically_increasing_id
    # is non-deterministic across plan-branch recomputation): unmatched
    # rows come from an anti-join on the SAME condition, then union.
    unmatched = lt.join(r, cond, how="left_anti").drop("__bucket")
    for c in rcols:
        unmatched = unmatched.withColumn(
            c + rsuffix, F.lit(None).cast(right.schema[c].dataType))
    return matched.unionByName(unmatched)
