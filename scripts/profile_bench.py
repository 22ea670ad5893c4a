"""Per-query profiler for the optimization rounds (guide §1).

Runs the given queries() entries exactly like bench.py (fresh build +
noop sink, warm worker pool) ONCE each, with the Spark event log on and
``setJobDescription(<query>)`` around both build and action, then parses
the event log into a per-query breakdown:

    jobs, stages, tasks, task-time sum, shuffle read/write bytes,
    python-eval stage count (BatchEvalPython/ArrowEvalPython/MapInArrow
    appear in stage names via the RDD scope), and wall seconds.

Usage: python scripts/profile_bench.py [query ...]   (default: all)
Writes PROFILE_local.json next to the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from arctic_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events-profile"


def _warm(spark):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _w(s: pd.Series) -> pd.Series:
        import arctic_spark.geom.algos    # noqa: F401
        import arctic_spark.geom.batch    # noqa: F401
        import arctic_spark.geom.boolean  # noqa: F401
        import arctic_spark.geom.relate   # noqa: F401
        import arctic_spark.llm.dedup     # noqa: F401
        return s

    n = spark.sparkContext.defaultParallelism
    (spark.range(n * 8, numPartitions=n).select(_w("id"))
     .write.format("noop").mode("overwrite").save())


def main():
    os.makedirs(EVDIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("arctic_spark-profile", **{
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
    })
    qs = entrymod.queries()
    only = sys.argv[1:] or list(qs)
    _warm(spark)

    sc = spark.sparkContext
    wall = {}
    for name in only:
        fn = qs[name]
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        sc.setJobDescription(None)
        spark.catalog.clearCache()
        wall[name] = {"build_s": round(t1 - t0, 3),
                      "action_s": round(t2 - t1, 3),
                      "wall_s": round(t2 - t0, 3)}
    app_id = sc.applicationId
    spark.stop()

    # parse the event log (Spark 4 rolling layout: a directory
    # eventlog_v2_<appId>/ holding events_* files)
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        parts = sorted(p for p in os.listdir(d) if p.startswith("events"))
        merged = os.path.join(d, "_merged.jsonl")
        with open(merged, "wb") as out_f:
            for p in parts:
                fp = os.path.join(d, p)
                if p.endswith(".zstd"):
                    import zstandard
                    with open(fp, "rb") as in_f:
                        out_f.write(zstandard.ZstdDecompressor()
                                    .stream_reader(in_f).read())
                else:
                    with open(fp, "rb") as in_f:
                        out_f.write(in_f.read())
        path = merged
    per = {n: {"jobs": 0, "stages": 0, "tasks": 0, "task_time_s": 0.0,
               "shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
               "py_eval_stages": 0, **wall[n]} for n in only}
    job_desc = {}       # jobId -> desc
    stage_desc = {}     # stageId -> desc
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description")
                if desc in per:
                    job_desc[ev["Job ID"]] = desc
                    per[desc]["jobs"] += 1
                    for si in ev.get("Stage Infos", []):
                        stage_desc[si["Stage ID"]] = desc
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                d = stage_desc.get(si["Stage ID"])
                if d in per and si.get("Submission Time"):
                    per[d]["stages"] += 1
                    nm = si.get("Name", "")
                    if ("EvalPython" in nm or "mapInArrow" in nm
                            or "mapInPandas" in nm or "ArrowEval" in nm):
                        per[d]["py_eval_stages"] += 1
            elif e == "SparkListenerTaskEnd":
                d = stage_desc.get(ev["Stage ID"])
                if d in per:
                    per[d]["tasks"] += 1
                    tm = ev.get("Task Metrics") or {}
                    per[d]["task_time_s"] += (
                        tm.get("Executor Run Time", 0) / 1000.0)
                    srm = tm.get("Shuffle Read Metrics") or {}
                    per[d]["shuffle_read_mb"] += (
                        (srm.get("Local Bytes Read", 0)
                         + srm.get("Remote Bytes Read", 0)) / 1e6)
                    swm = tm.get("Shuffle Write Metrics") or {}
                    per[d]["shuffle_write_mb"] += (
                        swm.get("Shuffle Bytes Written", 0) / 1e6)
    for d in per.values():
        d["task_time_s"] = round(d["task_time_s"], 2)
        d["shuffle_read_mb"] = round(d["shuffle_read_mb"], 2)
        d["shuffle_write_mb"] = round(d["shuffle_write_mb"], 2)
    out = {"app_id": app_id, "queries": per}
    with open(os.path.join(REPO, "PROFILE_local.json"), "w") as f:
        json.dump(out, f, indent=1)
    for n in sorted(per, key=lambda n: -per[n]["wall_s"]):
        p = per[n]
        print(f"{p['wall_s']:7.2f}s build={p['build_s']:6.2f} "
              f"act={p['action_s']:6.2f} jobs={p['jobs']:3d} "
              f"stages={p['stages']:3d} tasks={p['tasks']:5d} "
              f"tt={p['task_time_s']:7.1f}s py={p['py_eval_stages']:2d} "
              f"sh={p['shuffle_read_mb']:.1f}MB  {n}")


if __name__ == "__main__":
    main()
