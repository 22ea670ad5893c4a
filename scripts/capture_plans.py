"""Capture .explain("formatted") for queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
e.g.   python scripts/capture_plans.py r12 before lm_kn_score geo_pip_join
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from arctic_spark.session import get_spark  # noqa: E402


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("arctic_spark-plans")
    qs = entrymod.queries()
    for name in names or list(qs):
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        print(f"captured {name}_{suffix}")
    spark.stop()


if __name__ == "__main__":
    main()
