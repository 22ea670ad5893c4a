"""as-of join tests with hand-computed expectations."""

import pytest
from pyspark.sql import functions as F

from arctic_spark.temporal import asof_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame([
        ("2024-01-01 10:00:05", 1, "T1"),
        ("2024-01-01 10:00:20", 1, "T2"),
        ("2024-01-01 09:00:00", 2, "T3"),   # before any quote
        ("2024-01-01 10:00:10", 2, "T4"),
    ], "ts string, sym long, trade string") \
        .withColumn("ts", F.to_timestamp("ts"))
    quotes = spark.createDataFrame([
        ("2024-01-01 10:00:00", 1, 100.0),
        ("2024-01-01 10:00:10", 1, 101.0),
        ("2024-01-01 10:00:00", 2, 200.0),
    ], "qts string, sym long, px double") \
        .withColumn("qts", F.to_timestamp("qts"))
    return trades, quotes


def test_asof_backward(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym", right_on="qts",
                    right_by="sym")
    by = {r.trade: r.px_right for r in out.collect()}
    assert by["T1"] == 100.0   # 10:00:05 -> quote at 10:00:00
    assert by["T2"] == 101.0   # 10:00:20 -> quote at 10:00:10
    assert by["T3"] is None    # no quote before 09:00
    assert by["T4"] == 200.0


def test_asof_exact_timestamp_match(quotes_trades):
    trades, quotes = quotes_trades
    t = trades.withColumn("ts", F.to_timestamp(F.lit("2024-01-01 10:00:10")))
    out = asof_join(t.where("trade = 'T1'"), quotes, on="ts", by="sym",
                    right_on="qts", right_by="sym")
    assert out.collect()[0].px_right == 101.0  # equal ts matches


def test_asof_forward(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym", right_on="qts",
                    right_by="sym", direction="forward")
    by = {r.trade: r.px_right for r in out.collect()}
    assert by["T1"] == 101.0   # next quote at 10:00:10
    assert by["T2"] is None    # nothing after 10:00:20
    assert by["T3"] == 200.0


def test_asof_tolerance(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym", right_on="qts",
                    right_by="sym", tolerance=6.0)
    by = {r.trade: r.px_right for r in out.collect()}
    assert by["T1"] == 100.0   # 5s gap <= 6s
    assert by["T2"] is None    # 10s gap > 6s


def test_asof_null_right_value_not_backfilled(spark):
    left = spark.createDataFrame([("2024-01-01 10:00:20", 1, "L")],
                                 "ts string, k long, tag string") \
        .withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame([
        ("2024-01-01 10:00:00", 1, 5.0),
        ("2024-01-01 10:00:10", 1, None),   # latest right row has null v
    ], "rts string, k long, v double").withColumn("rts", F.to_timestamp("rts"))
    out = asof_join(left, right, on="ts", by="k", right_on="rts",
                    right_by="k")
    # must take the LATEST row's null, not backfill 5.0 from the older row
    assert out.collect()[0].v_right is None


def test_asof_bad_direction(quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="ts", by="sym", direction="sideways")


def test_range_join(spark):
    from arctic_spark.temporal import range_join
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 99.0)], "id long, v double")
    ivals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 4.0, 16.0)],
        "name string, lo double, hi double")
    out = range_join(pts, ivals, "v", "lo", "hi")
    got = sorted((r.id, r.name_right) for r in out.collect())
    assert got == [(1, "a"), (1, "c"), (2, "b"), (2, "c")]
    # boundary inclusive both ends
    b = range_join(spark.createDataFrame([(9, 10.0)], "id long, v double"),
                   ivals, "v", "lo", "hi").collect()
    assert sorted(r.name_right for r in b) == ["a", "b", "c"]
    # left join keeps unmatched
    lj = range_join(pts, ivals, "v", "lo", "hi", how="left")
    ids = [r.id for r in lj.where("name_right IS NULL").collect()]
    assert sorted(ids) == [3, 4]
    with pytest.raises(ValueError):
        range_join(pts, ivals, "v", "lo", "hi", how="outer")


def test_asof_fractional_tolerance(spark):
    """ADVICE r1: sub-second gaps must use fractional seconds, not
    unix_timestamp whole-second truncation."""
    left = spark.createDataFrame([("2024-01-01 10:00:00.900", 1, "L")],
                                 "ts string, k long, tag string") \
        .withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame([
        ("2024-01-01 10:00:00.100", 1, 1.0),
    ], "rts string, k long, v double").withColumn("rts", F.to_timestamp("rts"))
    # gap is 0.8s: tolerance 0.5 rejects, tolerance 0.9 keeps
    out1 = asof_join(left, right, on="ts", by="k", right_on="rts",
                     right_by="k", tolerance=0.5)
    assert out1.collect()[0].v_right is None
    out2 = asof_join(left, right, on="ts", by="k", right_on="rts",
                     right_by="k", tolerance=0.9)
    assert out2.collect()[0].v_right == 1.0


def test_asof_long_ts_beyond_2pow53(spark):
    """VERDICT r4 #3: integral (nanos-as-long) timestamps past 2^53 must
    stay in long arithmetic — a double promotion would round the gap and
    flip the tolerance boundary."""
    base = 1_700_000_000_000_000_000  # epoch nanos, ~2^60.6
    left = spark.createDataFrame(
        [(base + 1_000_000_003, 1, "L")], "ts long, k long, tag string")
    right = spark.createDataFrame(
        [(base, 1, 1.0), (base + 1_000_000_000, 1, 2.0)],
        "rts long, k long, v double")
    # gap to latest right row is exactly 3 ns; double math rounds it to 0
    keep = asof_join(left, right, on="ts", by="k", right_on="rts",
                     right_by="k", tolerance=3)
    assert keep.collect()[0].v_right == 2.0
    drop = asof_join(left, right, on="ts", by="k", right_on="rts",
                     right_by="k", tolerance=2)
    assert drop.collect()[0].v_right is None
    # fractional tolerance on an integral ts column is ambiguous: reject
    with pytest.raises(ValueError, match="fractional tolerance"):
        asof_join(left, right, on="ts", by="k", right_on="rts",
                  right_by="k", tolerance=2.5)


def test_asof_nearest(quotes_trades):
    """direction='nearest': closer of backward/forward wins, backward
    wins ties; tolerance applies per side (pandas merge_asof)."""
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym", right_on="qts",
                    right_by="sym", direction="nearest")
    by = {r.trade: r.px_right for r in out.collect()}
    # T1 10:00:05: backward 10:00:00 (5s) vs forward 10:00:10 (5s) — tie
    # -> backward
    assert by["T1"] == 100.0
    # T2 10:00:20: only backward exists (10:00:10)
    assert by["T2"] == 101.0
    # T3 09:00:00: only forward exists (10:00:00 sym 2)
    assert by["T3"] == 200.0
    # T4 10:00:10 sym 2: backward 10:00:00 is the only quote
    assert by["T4"] == 200.0
    # tolerance nulls the far-away forward match for T3 (3600s gap)
    tol = asof_join(trades, quotes, on="ts", by="sym", right_on="qts",
                    right_by="sym", direction="nearest", tolerance=60)
    byt = {r.trade: r.px_right for r in tol.collect()}
    assert byt["T3"] is None and byt["T1"] == 100.0
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="ts", by="sym", right_on="qts",
                  right_by="sym", direction="sideways")


# -- trajectory assembly ----------------------------------------------------

def test_make_trajectories(spark):
    from pyspark.sql import functions as F
    from arctic_spark import st
    from arctic_spark.temporal import make_trajectories
    rows = [  # user 1: a 3-4-5 right triangle walked out of order
        (1, 30, 3.0, 4.0),
        (1, 10, 0.0, 0.0),
        (1, 20, 3.0, 0.0),
        (2, 5, 7.0, 7.0),                      # singleton -> POINT
    ]
    df = spark.createDataFrame(rows, "uid long, t long, x double, y double")
    out = make_trajectories(df, "uid", "t", F.col("x"), F.col("y"))
    got = {r["uid"]: r for r in
           out.withColumn("len", st.length("geometry"))
              .withColumn("gt", st.geom_type_id("geometry")).collect()}
    assert got[1]["n_points"] == 3
    assert got[1]["duration"] == 20
    assert abs(got[1]["len"] - 7.0) < 1e-12     # sorted by t: 3 across + 4 up
    assert got[1]["gt"] == 1                    # LineString
    assert got[2]["n_points"] == 1
    assert got[2]["duration"] == 0
    assert got[2]["gt"] == 0                    # Point fallback
    assert got[2]["len"] == 0.0


def test_make_trajectories_tie_breaks_deterministic(spark):
    from pyspark.sql import functions as F
    from arctic_spark import st
    from arctic_spark.temporal import make_trajectories
    # equal timestamps: struct sort falls back to (x, y)
    rows = [(1, 10, 5.0, 0.0), (1, 10, 1.0, 0.0), (1, 10, 3.0, 0.0)]
    df = spark.createDataFrame(rows, "uid long, t long, x double, y double")
    out = make_trajectories(df.repartition(3), "uid", "t",
                            F.col("x"), F.col("y"))
    r = out.withColumn("len", st.length("geometry")).collect()[0]
    assert r["len"] == 4.0                      # 1 -> 3 -> 5
