"""Benchmark harness — one JSON line to stdout.

Runs the headline queries (relational + geo + pipeline ops) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is forced end-to-end with the noop
sink (full materialization of every output column, no driver collect
bottleneck).

Methodology v4 (honest steady state):

* Before any query runs, the Python worker pool is warmed with a
  trivial pandas UDF over ``defaultParallelism`` partitions that
  imports the geometry/LLM kernel stack.  Without this, the first wide
  pandas-UDF stage of the session pays a 30-process fork + numpy/
  pandas/pyarrow import storm that measured 6-25 s locally (r6's
  "geo_boolean_intersection 13.2 s" driver number was exactly this).
  A long-running cluster has warm executors, so the spawn cost is a
  one-off the bench removes once, up front, for every query equally.
* Each query then runs TWICE FROM SCRATCH — the DataFrame is rebuilt
  (fresh ``fn(spark, sf_dir)`` call) and the cache cleared between the
  passes — and the MIN of the two full passes is reported.  v3 reran
  the SAME DataFrame, which for queries that persist or
  ``localCheckpoint`` intermediates during build (pagerank, BPE train,
  kmeans/dbscan, minhash bands) measured reads of their own cached
  blocks, not the algorithm (r6 VERDICT: pagerank "warm" 0.017 s).  At
  steady state on a real pipeline every submission recomputes its
  intermediates; plan-compile time is a per-query constant that
  amortizes at scale but is small (<1 s) once the session is warm.

Output: ONE JSON line.  The driver's capture keeps only ~2000 trailing
characters, so the line carries the 25 round-1..5 headline queries
(round-over-round comparable) plus the total over ALL queries; the
full per-query map (both passes) is written to BENCH_local_full.json
next to this file.
"""

import json
import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from arctic_spark.session import get_spark  # noqa: E402

# r13 (VERDICT r12 task #6): the sf0.1 bench is scheduling-bound (8
# cores beat 32 on the full sweep), so wall seconds alone cannot
# attribute <20% deltas to code. The bench therefore ALSO records
# per-query executor task-time (core-seconds) from the Spark event
# log into BENCH_local_full.json — additions-only: the stdout JSON
# line and the wall-time methodology are byte-compatible with v4.
EVDIR = "/tmp/spark-events-bench"


def _parse_task_time(evdir, app_id, names):
    """Sum executor run time (s) per job-description label from the
    event log — the extraction profile_bench.py uses, trimmed to the
    one metric."""
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path) \
            and os.path.exists(path + ".inprogress"):
        path = path + ".inprogress"
    if not os.path.exists(path):
        d = os.path.join(evdir, f"eventlog_v2_{app_id}")
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
    tt = {n: 0.0 for n in names}
    stage_desc = {}
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
                if desc in tt:
                    for si in ev.get("Stage Infos", []):
                        stage_desc[si["Stage ID"]] = desc
            elif e == "SparkListenerTaskEnd":
                d = stage_desc.get(ev["Stage ID"])
                if d in tt:
                    tm = ev.get("Task Metrics") or {}
                    tt[d] += tm.get("Executor Run Time", 0) / 1000.0
    return {n: round(v, 2) for n, v in tt.items()}

BENCH_QUERIES = [
    # rounds 1-5 headline set (reported inline, round-over-round)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_suppliers",
    "q6_forecast_revenue",
    "q_window_latest_event",
    "q_events_daily",
    "q_events_rollup",
    "q_asof_join",
    "geo_triangle_area",
    "geo_haversine_length",
    "geo_webmercator",
    "geo_pip_join",
    "geo_pip_join_large",
    "geo_dwithin_pairs",
    "geo_explode_multipoint",
    "dedup_exact_stats",
    "text_token_stats",
    "text_ngram_jaccard",
    "dedup_minhash_lsh",
    "embed_cosine_topk",
    "geo_poly_join",
    "geo_diamond_join",
    "geo_nearest_supplier",
    "geo_boolean_intersection",
    "geo_buffer_line",
    # round 6: previously-unbenched gates + new operators
    "q_asof_nearest",
    "dedup_simhash",
    "embed_knn_lsh",
    "embed_knn_ivf",
    "geo_boolean_multidiff",
    "geo_line_clip_len",
    "geo_concave_join",
    "geo_relate_classify",
    "geo_hull_simplify",
    "geo_ring_accessors",
    "geo_shape_metrics",
    "geo_zorder_keys",
    "geo_overlay_area",
    "geo_delaunay",
    "geo_voronoi",
    "geo_concave_hull",
    "geo_polygonize",
    "geo_snap_shared_paths",
    "geo_offset_curve",
    "geo_make_valid",
    "geo_line_substring",
    "decontam_overlap",
    "pack_sequences",
    "text_chunking",
    "text_vocab_topk",
    "text_tfidf_keywords",
    "text_pii_scrub",
    "text_html_strip",
    "dedup_paragraph_stats",
    "dedup_semantic",
    "dedup_substring_stats",
    "sample_mixture",
    "text_url_ops",
    "text_perplexity",
    "text_repetition",
    "text_readability",
    "geo_orientation_flags",
    "geo_sample_points",
    "geo_min_clearance",
    "geo_geohash",
    "geo_hex_density",
    "geo_build_area",
    "geo_split",
    "geo_cluster_within",
    "geo_cluster_dbscan",
    "geo_subdivide",
    "text_bm25_topk",
    "geo_trajectory_stats",
    "text_ngram_topk",
    "geo_cluster_kmeans",
    "q_sessionize",
    "q_percentiles",
    "geo_azimuth_project",
    "geo_inscribed_circle",
    "text_bpe_encode",
    "text_bpe_train",
    "geo_segment_ops",
    "embed_dim_stats",
    "embed_pca_norms",
    "graph_pagerank",
    "q_salted_join",
    "q_bloom_semijoin",
    "q18_large_orders",
    "q_anti_join",
    "geo_project_geodesic",
    # round 7
    "embed_pq_adc",
    "text_classify_quality",
    # round 8
    "geo_overlay_union",
    "io_gpkg_roundtrip",
    "dsir_select",
    "io_fgb_roundtrip",
    "mm_jpeg_phash",
    "mm_wav_stats",
    "tok_unigram_encode",
    "lm_kn_score",
    # round 9 additions
    "geo_conus_albers",
    "io_kml_roundtrip",
    "mm_jpeg_progressive",
    "tok_wordpiece_encode",
    # round 7: complete coverage — every queries() entry is benched
    "q4_order_priority",
    "q_range_join",
    "geo_point_accessors",
    "geo_distance",
    "geo_centroid_of_triangle",
    "geo_envelope_metrics",
    "geo_translate_rotate",
    "geo_affine_family",
    "geo_lambert93",
    "geo_utm_roundtrip",
    "geo_karney_meridian",
    "geo_bbox_filter",
    "geo_dissolve_area",
    "geo_collect_centroid",
    "geo_poly_contains_join",
    "geo_diamond_contains_join",
    "geo_equals_dwithin",
    "geo_line_refs",
    "geo_validity_flags",
    "dedup_groups",
    "embed_near_dup",
    "sample_stratified",
    "text_fingerprint_dups",
    "text_lang_id",
    "text_quality_gopher",
]

HEADLINE = BENCH_QUERIES[:25]


def _warm_worker_pool(spark):
    """Spawn and warm one Python worker per core before timing starts.

    A pandas-UDF stage with N concurrent tasks needs N live workers;
    Spark grows the pool lazily, so whichever query first runs a wide
    UDF stage pays N forks, each importing numpy/pandas/pyarrow plus
    this package's kernel stack (~1-2 s per worker, with heavy
    contention when 32 fork at once).  Importing the kernels here means
    every timed query sees the warm pool a real cluster would have.
    """
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("boolean")
    def _pool_warm_pred(s: pd.Series) -> pd.Series:
        import arctic_spark.geom.algos    # noqa: F401
        import arctic_spark.geom.batch    # noqa: F401
        import arctic_spark.geom.boolean  # noqa: F401
        return s >= 0

    @pandas_udf("long")
    def _pool_warm(s: pd.Series) -> pd.Series:
        import arctic_spark.geom.algos    # noqa: F401
        import arctic_spark.geom.batch    # noqa: F401
        import arctic_spark.geom.boolean  # noqa: F401
        import arctic_spark.geom.relate   # noqa: F401
        import arctic_spark.llm.dedup     # noqa: F401
        return s

    # r13: a stage pipelines one Python WORKER per eval node per task,
    # and the deepest stages in the sweep run TWO nodes (a refine
    # filter UDF + a projection kernel — overlay/boolean paths), so a
    # depth-1 warm-up left 32 workers to cold-fork with a full
    # numpy/pandas/kernel import storm inside whichever timed query
    # first hit a two-node stage (measured 300-700 core-s of executor
    # time charged to a 600-row stage, varying run to run with pool
    # state).  The filter UDF below cannot fuse with the projection
    # UDF, so this warms 2n workers — the steady pool a long-running
    # cluster would have.
    n = spark.sparkContext.defaultParallelism
    (spark.range(n * 8, numPartitions=n)
     .where(_pool_warm_pred("id"))
     .select(_pool_warm(col("id")))
     .write.format("noop").mode("overwrite").save())


def _run_once(spark, fn, sf_dir):
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark("arctic_spark-bench", **{
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        # plain JSON events — no optional codec dependency at parse
        "spark.eventLog.compress": "false",
    })
    qs = entrymod.queries()

    _warm_worker_pool(spark)

    sc = spark.sparkContext
    timings, pass1, pass2 = {}, {}, {}
    # safety net (r9): a queries() entry missing from BENCH_QUERIES is
    # appended rather than silently unbenched (r9's first run missed
    # geo_conus_albers this way)
    bench_list = list(BENCH_QUERIES) + sorted(set(qs) - set(BENCH_QUERIES))
    for name in bench_list:
        fn = qs[name]
        sc.setJobDescription(name)
        a = _run_once(spark, fn, sf_dir)
        # drop persisted intermediates (minhash bands, join pins,
        # cluster checkpoints) so the second pass recomputes them —
        # min(two full passes) is the steady-state cost of the
        # ALGORITHM, not of re-reading its own cached blocks
        spark.catalog.clearCache()
        b = _run_once(spark, fn, sf_dir)
        spark.catalog.clearCache()
        sc.setJobDescription(None)
        pass1[name], pass2[name] = a, b
        timings[name] = min(a, b)
    total = round(sum(timings.values()), 3)
    headline_total = round(sum(timings[n] for n in HEADLINE), 3)

    app_id = sc.applicationId
    # stop FIRST so the event log is finalized (while the app runs the
    # file is still <app_id>.inprogress — parsing before stop() was why
    # the first r13 baseline shipped an empty task_time_s map)
    spark.stop()
    try:
        task_time = _parse_task_time(EVDIR, app_id, bench_list)
    except Exception as exc:      # attribution is additive, never fatal
        print(f"task-time extraction failed: {exc!r}", file=sys.stderr)
        task_time = {}

    sf = sf_dir.rstrip("/").split("sf")[-1]
    full = {"metric": "bench_total_wall", "value": total, "unit": "sec",
            "sf": sf, "n_queries": len(bench_list),
            "headline_total": headline_total,
            "queries": timings, "pass1": pass1, "pass2": pass2,
            "task_time_s": task_time,
            "methodology": "rebuild-both-passes, warm worker pool (v4)"}
    with open(os.path.join(REPO, "BENCH_local_full.json"), "w") as f:
        json.dump(full, f, indent=1)

    # stdout line stays under the driver's ~2000-char capture: inline
    # per-query numbers only for the 25 round-1..5 headline queries
    line = {"metric": "bench_total_wall", "value": total, "unit": "sec",
            "sf": sf, "n_queries": len(bench_list),
            "headline_total": headline_total,
            "full_file": "BENCH_local_full.json",
            "methodology": "rebuild-both-passes, warm worker pool (v4)",
            "queries": {n: timings[n] for n in HEADLINE}}
    print(json.dumps(line, separators=(",", ":")))


if __name__ == "__main__":
    main()
