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
    earliest right row with right.ts >= left.ts; 'nearest' picks
    whichever of the two is closer, backward winning ties — pandas
    merge_asof semantics), matched within `by` groups. ``tolerance``
    (seconds) nulls out matches farther away.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'")
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

    def _carried(asc):
        w = Window.partitionBy("__key").orderBy(
            F.col("__ts").asc() if asc else F.col("__ts").desc(),
            F.col("__is_left").asc()) \
            .rowsBetween(Window.unboundedPreceding, 0)
        return F.last("__r", ignorenulls=True).over(w)

    from pyspark.sql import types as T
    ts_type = left.schema[on].dataType

    def _vals(rc_col):
        """(left value, right value, tolerance literal|None) in exact
        arithmetic for the column's type (see the per-type notes)."""
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
            # exact integer microseconds: epoch doubles carry ~2e-7 s FP
            # rounding, enough to flip gap == tolerance boundary cases
            lval = F.unix_micros(F.col("__ts").cast("timestamp"))
            rval = F.unix_micros(rc_col["__rts"].cast("timestamp"))
            tol = None if tolerance is None else \
                F.lit(int(round(float(tolerance) * 1_000_000)))
        elif isinstance(ts_type, (T.LongType, T.IntegerType,
                                  T.ShortType, T.ByteType)):
            # integral ts (e.g. nanos-as-long events): stay in longs —
            # a cast to double is lossy past 2^53 (epoch nanos is ~2^60).
            # tolerance must be integral too: a float literal would
            # promote the whole comparison back to double.
            if tolerance is not None and float(tolerance) != int(tolerance):
                raise ValueError(
                    "asof_join: fractional tolerance %r is ambiguous for "
                    "an integral timestamp column %r — pass an int in the "
                    "column's own unit" % (tolerance, on))
            lval, rval = F.col("__ts"), rc_col["__rts"]
            tol = None if tolerance is None else F.lit(int(tolerance))
        else:
            lval = F.col("__ts").cast("double")
            rval = rc_col["__rts"].cast("double")
            tol = None if tolerance is None else F.lit(float(tolerance))
        return lval, rval, tol

    if direction == "nearest":
        # both directions in one pass over the same shuffled partition
        # (two window sorts, no extra shuffle), then pick the closer
        # side; equal gaps choose backward (pandas merge_asof)
        out = u.select("__is_left", "__ts", *lcols,
                       _carried(True).alias("__rb"),
                       _carried(False).alias("__rf")) \
               .where(F.col("__is_left") == 1)
        lb, rb_v, tol = _vals(F.col("__rb"))
        lf, rf_v, _ = _vals(F.col("__rf"))
        gap_b, gap_f = lb - rb_v, rf_v - lf
        rb, rf = F.col("__rb"), F.col("__rf")
        if tol is not None:
            rb = F.when(gap_b <= tol, rb)
            rf = F.when(gap_f <= tol, rf)
        pick_b = rb.isNotNull() & (rf.isNull() | (gap_b <= gap_f))
        rc = F.when(pick_b, rb).otherwise(rf)
        return out.select(*lcols,
                          *[rc[c].alias(c + rsuffix) for c in rcols])

    asc = direction == "backward"
    out = u.select("__is_left", "__ts", *lcols,
                   _carried(asc).alias("__rc")) \
           .where(F.col("__is_left") == 1)
    rc = F.col("__rc")
    if tolerance is not None:
        lval, rval, tol = _vals(rc)
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


def make_trajectories(df: DataFrame, id_col: str, ts_col: str, x, y):
    """Per-entity trajectory assembly: points ordered by (timestamp, x,
    y) collapse into one LineString per entity — the PostGIS
    ``ST_MakeLine(geom ORDER BY ts)`` aggregate, the standard first step
    of any movement/telemetry pipeline (the reference engine has no
    temporal surface at all).

    Plan shape: ONE groupBy(id) shuffle carrying (ts, x, y) structs;
    ``array_sort`` orders each entity's points executor-side (struct
    ordering is lexicographic, so equal timestamps tie-break on x then
    y — deterministic under any partitioning); the coordinate arrays
    and the LineString build natively from the sorted array. Entities
    with a single point get a POINT geometry instead of a degenerate
    one-vertex line.

    Returns (id_col, geometry, n_points, duration) where duration is in
    ``ts_col``'s units (last minus first observation).
    """
    from .functions import native as st_native

    p = F.struct(F.col(ts_col).alias("ts"),
                 x.alias("x"), y.alias("y"))
    agg = (df.select(F.col(id_col), p.alias("p"))
           .groupBy(id_col)
           .agg(F.array_sort(F.collect_list("p")).alias("ps")))
    xs = F.transform(F.col("ps"), lambda q: q["x"])
    ys = F.transform(F.col("ps"), lambda q: q["y"])
    line = F.when(F.size("ps") >= 2, st_native.make_line(xs, ys)) \
        .otherwise(st_native.point(F.element_at(xs, 1),
                                   F.element_at(ys, 1)))
    return agg.select(
        F.col(id_col),
        line.alias("geometry"),
        F.size("ps").cast("long").alias("n_points"),
        (F.element_at(F.col("ps"), -1)["ts"]
         - F.element_at(F.col("ps"), 1)["ts"]).alias("duration"))


def sessionize(df: DataFrame, ts_col: str, by, gap_seconds: float,
               order_cols=()) -> DataFrame:
    """Batch gap-based sessionization (the batch twin of
    ``streaming.ops.sessionize_by_gap``): a new session starts whenever
    the time since the entity's previous event EXCEEDS ``gap_seconds``
    (a gap exactly equal to the threshold stays in the same session,
    matching the streaming operator).

    Adds two columns: ``session_seq`` (1-based per-entity session
    ordinal) and ``session_id`` (entity key + '#' + seq — globally
    unique, stable under any partitioning).

    Plan shape: ONE shuffle on ``by``; the new-session flag is a
    ``lag`` comparison and the ordinal a running sum over the same
    window — both stay in the single sort the shuffle already pays for.
    No Python anywhere. Determinism: equal-timestamp neighbours have
    gap 0, so their flags (and every later row's running sum) are
    identical under either tie order; pass ``order_cols`` to pin a
    total order anyway when exact row order matters downstream.

    100 TB: the shuffle is keyed on the entity id — the same key any
    per-entity analysis already shuffles on — and carries only the
    input row; skewed entities are bounded by per-entity event counts,
    not corpus size (AQE skew-split applies).
    """
    by = [by] if isinstance(by, str) else list(by)
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(*by).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    # integer microseconds via timestamp_diff: exact, engine-portable
    # (no float seconds), and accepts TIMESTAMP and TIMESTAMP_NTZ alike
    gap_us = int(round(gap_seconds * 1_000_000))
    new_flag = F.when(
        prev.isNull()
        | (F.timestamp_diff("MICROSECOND", prev, F.col(ts_col)) > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    run = Window.partitionBy(*by).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = F.sum(new_flag).over(run).cast("long")
    key = F.concat_ws("#", *[F.col(c).cast("string") for c in by],
                      seq.cast("string"))
    return df.withColumn("session_seq", seq).withColumn("session_id", key)


def session_stats(df: DataFrame, ts_col: str, by, gap_seconds: float,
                  order_cols=()) -> DataFrame:
    """Per-session aggregates over :func:`sessionize`: event count,
    start/end timestamps and duration in seconds. Two shuffles total
    (the sessionize window + the groupBy — the second reuses the first's
    hash partitioning on the leading ``by`` key, so AQE can plan it as a
    local aggregation)."""
    by = [by] if isinstance(by, str) else list(by)
    s = sessionize(df, ts_col, by, gap_seconds, order_cols)
    return (s.groupBy(*by, "session_seq", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 (F.timestamp_diff("MICROSECOND", F.min(ts_col),
                                   F.max(ts_col)) / 1e6)
                 .alias("duration_s")))
