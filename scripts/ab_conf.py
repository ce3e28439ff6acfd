"""A/B a set of inventory queries under session-conf overrides.

    python scripts/ab_conf.py q63_neardup_lsh q91_pagerank \
        --conf spark.sql.adaptive.coalescePartitions.parallelismFirst=false \
        --conf spark.sql.adaptive.advisoryPartitionSizeInBytes=1m \
        [--sf /root/testdata/sf0.1] [--runs 4]

Same harness/protocol as profile_query.py (fresh session, JVM+Arrow
warmups, hash-collect, per-run walls + min/median JSON lines) so
numbers are comparable run-to-run; only the extra conf differs.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    from odsc_agentic_ai_summit_2025_spark.cache import sweep_blocks
    from odsc_agentic_ai_summit_2025_spark.plans.registry import all_queries
    from odsc_agentic_ai_summit_2025_spark.session import get_spark

    known = all_queries()
    unknown = sorted(set(args.queries) - set(known))
    if unknown:
        sys.exit(f"unknown query names: {unknown}")

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark(app_name="ab_conf", extra_conf=extra)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(lambda it: it, "id long").selectExpr(
        "sum(id)"
    ).collect()

    from pyspark.sql import functions as F

    for name in args.queries:
        q = known[name]
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = q.spark(spark, args.sf)
            df.select(
                F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h")
            ).agg(F.expr("bit_xor(_h)")).collect()
            runs.append(round(time.perf_counter() - t0, 3))
            df = None
            sweep_blocks(spark)
        print(
            json.dumps(
                {
                    "query": name,
                    "runs": runs,
                    "min": min(runs),
                    "median": round(statistics.median(runs), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
