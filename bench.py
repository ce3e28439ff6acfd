"""Benchmark the headline query inventory.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from odsc_agentic_ai_summit_2025_spark.plans.registry import all_queries
    from odsc_agentic_ai_summit_2025_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # JVM/codegen warmup outside any query's timing: one tiny job
    spark.range(1000).selectExpr("sum(id)").collect()

    queries = all_queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name, q in sorted(queries.items()):
        t0 = time.perf_counter()
        try:
            df = q.spark(spark, sf_dir)
            # force EVERY output column to be computed: a bare count()
            # lets Catalyst prune unreferenced projection expressions,
            # so projection-only queries (masking, fingerprints, string
            # batteries) would be timed as bare scan+count. Hashing all
            # columns into one aggregated value defeats pruning while
            # keeping driver transfer at one row.
            from pyspark.sql import functions as F

            df.select(
                F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h")
            ).agg(F.expr("bit_xor(_h)")).collect()
            dt = time.perf_counter() - t0
        except Exception as e:  # keep benching even if one query breaks
            print(f"bench error {name}: {e}", file=sys.stderr)
            dt = float("nan")
        timings[name] = round(dt, 4)
        if dt == dt:
            total += dt
        # release intermediates an operator persisted for its own
        # multi-consumer plan (FTS/IVF indexes, LSH inputs): without
        # this, 60 queries of leftovers accumulate in executor memory
        # and late queries pay GC for early queries' caches
        spark.catalog.clearCache()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "inventory_total_runtime",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
