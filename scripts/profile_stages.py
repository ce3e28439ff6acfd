"""Per-job/stage breakdown for single inventory queries (the no-UI
equivalent of the Spark UI's Jobs/Stages tabs — guide §1/§7).

    python scripts/profile_stages.py q112_neardup_index_lifecycle \
        [--sf /root/testdata/sf0.1] [--runs 2]

Runs each query through the same hash-collect harness as bench.py
with the Spark event log enabled, then parses the event log into a
per-job table: job id, description, duration, stage count, task
count, and per-stage (name, tasks, duration, shuffle bytes). The
LAST run's jobs are attributed to the query (earlier runs warm the
JVM); job boundaries between queries come from setJobDescription.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="spark_events_")

    from odsc_agentic_ai_summit_2025_spark.cache import sweep_blocks
    from odsc_agentic_ai_summit_2025_spark.plans.registry import all_queries
    from odsc_agentic_ai_summit_2025_spark.session import get_spark

    known = all_queries()
    unknown = sorted(set(args.queries) - set(known))
    if unknown:
        sys.exit(f"unknown query names: {unknown}")

    spark = get_spark(
        app_name="profile_stages",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(lambda it: it, "id long").selectExpr(
        "sum(id)"
    ).collect()

    from pyspark.sql import functions as F

    sc = spark.sparkContext
    for name in args.queries:
        q = known[name]
        for r in range(args.runs):
            sc.setJobDescription(f"{name}#run{r}")
            t0 = time.perf_counter()
            df = q.spark(spark, args.sf)
            df.select(
                F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h")
            ).agg(F.expr("bit_xor(_h)")).collect()
            dt = time.perf_counter() - t0
            print(f"# {name} run{r}: {dt:.3f}s", flush=True)
            df = None
            sc.setJobDescription(None)
            sweep_blocks(spark)
    app_id = sc.applicationId
    spark.stop()

    # ---- parse the event log (Spark 4 writes a rolling v2 dir) ----
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
        if os.path.isdir(v2):
            parts = sorted(
                p for p in os.listdir(v2) if p.startswith("events_")
            )
            if parts:
                path = os.path.join(v2, parts[0])
            else:
                inner = [p for p in os.listdir(v2) if "appstatus" not in p]
                path = os.path.join(v2, inner[0]) if inner else v2
        else:
            path = v2
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(path) as f:
        for ln in f:
            try:
                ev = json.loads(ln)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "desc": props.get("spark.job.description", ""),
                    "t0": ev.get("Submission Time", 0),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                # merge, don't replace: TaskEnd events for this stage
                # arrive BEFORE StageCompleted, so reassigning here
                # clobbered the accumulated task_ms/py_ms/sh_* fields
                st = stages.setdefault(sid, {})
                st.update(
                    {
                        "name": si.get("Stage Name", "")[:60],
                        "tasks": si.get("Number of Tasks", 0),
                        "t0": si.get("Submission Time", 0),
                        "t1": si.get("Completion Time", 0),
                    }
                )
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + m.get(
                    "Executor Run Time", 0
                )
                st["py_ms"] = st.get("py_ms", 0) + int(
                    m.get("Executor Deserialize Time", 0)
                )
                sr = (m.get("Shuffle Read Metrics") or {})
                st["sh_read"] = st.get("sh_read", 0) + sr.get(
                    "Remote Bytes Read", 0
                ) + sr.get("Local Bytes Read", 0)
                sw = (m.get("Shuffle Write Metrics") or {})
                st["sh_write"] = st.get("sh_write", 0) + sw.get(
                    "Shuffle Bytes Written", 0
                )

    # attribute jobs to (query, run) by description; report the LAST run
    per_run: dict[str, list[int]] = {}
    for jid, j in sorted(jobs.items()):
        per_run.setdefault(j["desc"], []).append(jid)
    for name in args.queries:
        last = args.runs - 1
        key = f"{name}#run{last}"
        jids = per_run.get(key, [])
        total = 0.0
        print(f"\n=== {name} (run {last}: {len(jids)} jobs) ===")
        for jid in jids:
            j = jobs[jid]
            dur = (j.get("t1", 0) - j.get("t0", 0)) / 1000.0
            total += dur
            used = [s for s in j["stages"] if s in stages and stages[s].get("t1")]
            print(f"job {jid}: {dur:7.3f}s  stages={len(j['stages'])} ran={len(used)}")
            for sid in sorted(used):
                st = stages[sid]
                sdur = (st.get("t1", 0) - st.get("t0", 0)) / 1000.0
                print(
                    f"    stage {sid:4d} {sdur:7.3f}s tasks={st.get('tasks', 0):3d} "
                    f"taskms={st.get('task_ms', 0):6d} "
                    f"shR={st.get('sh_read', 0):8d} shW={st.get('sh_write', 0):8d} "
                    f" {st.get('name', '')}"
                )
        print(f"sum of job durations: {total:.3f}s")


if __name__ == "__main__":
    main()
