"""Streaming-twins load test (r13, VERDICT r12 #7): drive >=10M events
through the stateful sketch scaffold (`_windowed_fold_scaffold` —
windowed_kmv_minima and windowed_sample_rows) plus the pure
streaming-aggregation twin (windowed_hll_registers), and record:

  * throughput (rows/s end-to-end over the micro-batch run),
  * state-store row count per progress point — the event-time
    eviction (r12) must keep it bounded by the number of
    watermark-open windows, NOT by stream volume or total windows.

Source: rate-micro-batch (deterministic): each batch advances event
time by one window, so the run opens many windows over its life while
only ~(delay + window)/window of them may legally stay in state.

Usage: python scripts/stress_streaming.py [n_rows] [rows_per_batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from arctic_spark.session import get_spark  # noqa: E402
from arctic_spark.streaming import ops  # noqa: E402


def _drive(spark, name, build, n_rows, rows_per_batch):
    n_batches = n_rows // rows_per_batch
    src = (spark.readStream.format("rate-micro-batch")
           .option("rowsPerBatch", rows_per_batch)
           .option("numPartitions", 32)
           .option("advanceMillisPerBatch", 60_000)   # 1 window/batch
           .load()
           .select(F.col("timestamp").alias("ts"),
                   (F.col("value") % 1_000_003).alias("user_id")))
    out = build(src)
    # rate-micro-batch under availableNow stops after ONE batch, so
    # drive an unbounded trigger and stop once n_rows have been
    # processed (progress is polled, never processAllAvailable — see
    # the verify-skill stateful-timeout gotcha)
    q = (out.writeStream.format("noop")
         .option("checkpointLocation",
                 f"/tmp/stress-stream-ckpt-{name}-{os.getpid()}")
         .outputMode("update")
         .start())
    t0 = time.perf_counter()
    rows = 0
    state_rows = []
    seen = set()
    deadline = time.time() + 1800
    while rows < n_rows and time.time() < deadline:
        time.sleep(0.5)
        for p in q.recentProgress:
            if isinstance(p, str):
                p = json.loads(p)
            bid = p.get("batchId")
            if bid in seen:
                continue
            seen.add(bid)
            rows += p.get("numInputRows", 0)
            for so in p.get("stateOperators", []):
                state_rows.append(so.get("numRowsTotal", -1))
    dt = time.perf_counter() - t0
    try:
        q.stop()
        q.awaitTermination()
    except Exception:
        # stop() racing an in-flight micro-batch commit raises a
        # CANNOT_COMMIT StreamingQueryException — benign here: only
        # COMPLETED batches were counted above
        pass
    print(f"{name}: {rows:,} rows in {dt:.1f}s "
          f"({rows / dt / 1e6:.2f}M rows/s, {len(seen)} batches of "
          f"{rows_per_batch:,}, target {n_batches}); "
          f"state rows per progress: max={max(state_rows) if state_rows else 0} "
          f"last={state_rows[-1] if state_rows else 0} "
          f"all={state_rows}", flush=True)
    return rows, state_rows


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    rows_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = get_spark("arctic_spark-stress-streaming")
    try:
        _drive(spark, "kmv_minima",
               lambda s: ops.windowed_kmv_minima(
                   s, window="1 minute", watermark="2 minutes", k=64),
               n_rows, rows_per_batch)
        _drive(spark, "sample_rows",
               lambda s: ops.windowed_sample_rows(
                   s, window="1 minute", watermark="2 minutes", k=64),
               n_rows, rows_per_batch)
        _drive(spark, "hll_registers",
               lambda s: ops.windowed_hll_registers(
                   s, window="1 minute", watermark="2 minutes", p=10),
               n_rows, rows_per_batch)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
