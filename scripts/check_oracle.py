"""Local replica of the driver's t2 correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at the given SF,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from arctic_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            f = float(v)
            if f == int(f):
                return str(int(f))
            return repr(round(f, 9))
    except Exception:
        pass
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    global_width_warns = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in df.columns]
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(oracles[name])
            duck_cols = [d[0].lower() for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        # Int-width audit (VERDICT r8 task #2): the driver hashes values
        # after stringification, so width alone doesn't fail — but 20
        # audited int/BIGINT/HUGEINT mismatches were free hash risk.
        # Normalize: every integer output column is BIGINT on BOTH
        # sides. This check keeps new gates from reintroducing it.
        _SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
        _DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
        try:
            duck_types = {r[0].lower(): r[1] for r in con.execute(
                f"DESCRIBE ({oracles[name].rstrip().rstrip(';')})"
            ).fetchall()}
            for col, dt in df.dtypes:
                ddt = duck_types.get(col.lower(), "")
                s_int, d_int = dt in _SPARK_INT, ddt in _DUCK_INT
                if (s_int or d_int) and not (dt == "bigint"
                                             and ddt == "BIGINT"):
                    print(f"WIDTH {name}: {col} spark={dt} duck={ddt}")
                    global_width_warns.append((name, col, dt, ddt))
        except Exception as e:  # DESCRIBE quirks shouldn't fail the gate
            print(f"WIDTH {name}: describe error: {str(e)[:120]}")
        ok = True
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL  {name}: columns spark={spark_cols} duck={duck_cols}")
            ok = False
        elif len(spark_rows) != len(duck_rows):
            print(f"FAIL  {name}: rowcount spark={len(spark_rows)} "
                  f"duck={len(duck_rows)}")
            ok = False
        else:
            cs = canon(spark_rows, spark_cols)
            cd = canon(duck_rows, duck_cols)
            if cs != cd:
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                print(f"FAIL  {name}: value mismatch; first diffs: {diffs}")
                ok = False
        if ok:
            print(f"PASS  {name}: {len(spark_rows)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only, "
          f"{len(global_width_warns)} width warnings")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
