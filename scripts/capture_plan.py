"""Capture .explain("formatted") for inventory queries into files.

    python scripts/capture_plan.py q91_pagerank q90_triangle_counts \
        [--sf /root/testdata/sf0.1] [--out plans/r13] [--suffix before]

Writes ``<out>/<query>_<suffix>.txt`` per query. The plan is captured
from the SAME callable the bench times (registry entry), against the
same SF directory. Queries whose builder runs driver-side jobs
(persists, collects) execute those while building — capture is
therefore slower than a pure explain but faithful to the benched plan.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from odsc_agentic_ai_summit_2025_spark.plans.registry import all_queries
    from odsc_agentic_ai_summit_2025_spark.session import get_spark

    known = all_queries()
    unknown = sorted(set(args.queries) - set(known))
    if unknown:
        sys.exit(f"unknown query names: {unknown}")

    spark = get_spark(app_name="capture_plan")
    os.makedirs(args.out, exist_ok=True)
    from odsc_agentic_ai_summit_2025_spark.cache import sweep_blocks

    for name in args.queries:
        df = known[name].spark(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        df = None
        sweep_blocks(spark)


if __name__ == "__main__":
    main()
