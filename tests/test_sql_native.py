"""Expression-bodied SQL UDFs (sql.register_native_sql_functions, r7):
parity with the pandas-kernel registry on every geometry class, pure-JVM
plans, and the measured Arrow-boundary win on scalar accessors."""

import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from arctic_spark import sql as asql
from arctic_spark.geom import algos, ragged, wkt
from arctic_spark.functions.udfs import ragged_from_pdf, ragged_to_pdf
from arctic_spark.sparktypes import GEOM_DDL

FIXTURES = [
    "POINT (7 9)",
    "POINT EMPTY",
    "LINESTRING (0 0, 3 4, 3 8)",
    "MULTILINESTRING ((0 0, 1 0), (0 1, 0 3))",
    "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
    "((5 5, 9 5, 9 9, 5 9, 5 5), (6 6, 6 7, 7 7, 7 6, 6 6)))",
    "MULTIPOINT (1 1, 2 2, 3 3)",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 0 5), "
    "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0)))",
    None,
]


@pytest.fixture(scope="module")
def sql_table(spark):
    asql.register_sql_functions(spark)
    rg = wkt.parse([w for w in FIXTURES if w is not None])
    pdf = ragged_to_pdf(rg)
    rows = [{k: (None if v is None else
                 [float(e) for e in v] if k in ("xs", "ys")
                 else [int(e) for e in v] if k in ("rings", "parts")
                 else int(v))
             for k, v in rec.items()}
            for rec in pdf.to_dict("records")]
    rows.append({"gt": None, "xs": None, "ys": None,
                 "rings": None, "parts": None})
    df = spark.createDataFrame(rows, schema=f"gt int, xs array<double>, "
                               f"ys array<double>, rings array<int>, "
                               f"parts array<int>")
    df.selectExpr("named_struct('gt', gt, 'xs', xs, 'ys', ys, "
                  "'rings', rings, 'parts', parts) AS g") \
        .createOrReplaceTempView("sqlnative_fixture")
    return spark


def _kernel_area():
    rg = wkt.parse([w for w in FIXTURES if w is not None])
    vals = [None if np.isnan(v) else float(v) for v in algos.area(rg)]
    return vals + [None]


def test_area_length_parity(sql_table):
    spark = sql_table
    got = [r["a"] for r in spark.sql(
        "SELECT st_area(g) AS a FROM sqlnative_fixture").collect()]
    want = _kernel_area()
    assert len(got) == len(want)
    for gv, wv in zip(got, want):
        if wv is None:
            assert gv is None
        else:
            assert gv == pytest.approx(wv, abs=1e-12)
    rg = wkt.parse([w for w in FIXTURES if w is not None])
    want_len = [float(v) for v in algos.length(rg)] + [None]
    got_len = [r["l"] for r in spark.sql(
        "SELECT st_length(g) AS l FROM sqlnative_fixture").collect()]
    for gv, wv in zip(got_len, want_len):
        if wv is None:
            assert gv is None
        else:
            assert gv == pytest.approx(wv, abs=1e-12)


def test_scalar_accessors_parity(sql_table):
    spark = sql_table
    rows = spark.sql(
        "SELECT st_x(g) AS x, st_y(g) AS y, st_geometrytype(g) AS t, "
        "st_isempty(g) AS e, st_npoints(g) AS n, "
        "st_numgeometries(g) AS ng FROM sqlnative_fixture").collect()
    assert [r["x"] for r in rows] == [
        7.0, None, None, None, None, None, None, None, None, None]
    assert [r["t"] for r in rows] == [0, 0, 1, 5, 3, 3, 6, 4, 7, -1]
    assert [r["e"] for r in rows] == [
        False, True, False, False, False, False, False, False, False, None]
    assert [r["n"] for r in rows] == [1, 0, 3, 4, 5, 10, 15, 3, 8, None]
    assert [r["ng"] for r in rows] == [1, 0, 1, 2, 1, 1, 2, 3, 3, None]


def test_translate_parity(sql_table):
    spark = sql_table
    rows = spark.sql(
        "SELECT st_translate(g, 10.0D, -1.0D) AS t "
        "FROM sqlnative_fixture WHERE g.gt = 0 AND size(g.xs) > 0"
    ).collect()
    assert rows[0]["t"]["xs"] == [17.0]
    assert rows[0]["t"]["ys"] == [8.0]


def test_native_sql_plan_has_no_python(sql_table):
    spark = sql_table
    for fn in ("st_area(g)", "st_length(g)", "st_x(g)",
               "st_translate(g, 1.0D, 2.0D).xs"):
        plan = spark.sql(
            f"SELECT {fn} AS v FROM sqlnative_fixture") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, fn


def test_scalar_accessor_beats_arrow_boundary(sql_table):
    # the point of the exercise: a scalar accessor over a wide scan
    # should beat the pandas registry path clearly (measured 4-6x net
    # of the row-construction baseline; assert a lenient 1.5x to stay
    # robust on a loaded box)
    spark = sql_table

    @pandas_udf(T.DoubleType())
    def st_x_pandas(g: pd.DataFrame) -> pd.Series:
        rg = ragged_from_pdf(g)
        out = []
        for i in range(len(rg)):
            t = rg.geom(i)
            out.append(float(t[1][0])
                       if t[0] == ragged.POINT and len(t[1]) else None)
        return pd.Series(out)

    spark.udf.register("st_x_pandas", st_x_pandas)
    spark.range(500_000).selectExpr(
        "named_struct('gt', 0, 'xs', array(CAST(id AS DOUBLE)), "
        "'ys', array(0d), 'rings', array(1), 'parts', array(1)) AS g"
    ).createOrReplaceTempView("xperf")
    spark.sql("SELECT sum(st_x(g)) FROM xperf").collect()
    spark.sql("SELECT sum(st_x_pandas(g)) FROM xperf").collect()
    t0 = time.time()
    spark.sql("SELECT sum(st_x(g)) FROM xperf").collect()
    native = time.time() - t0
    t0 = time.time()
    spark.sql("SELECT sum(st_x_pandas(g)) FROM xperf").collect()
    arrow = time.time() - t0
    assert arrow > native * 1.5, (native, arrow)
