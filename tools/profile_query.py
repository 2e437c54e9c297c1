"""Per-stage task-parallelism profiler for registered queries (guide §1).

Runs each named query with the noop sink and a SparkListener that records,
per stage: task count, summed task runtime, max task runtime, and input/
shuffle bytes. The point is to make single-task / straggler stages visible
without the (disabled) Spark UI: a stage whose ``sum_ms`` dominates the
query wall time while ``n_tasks`` is 1 is a parallelism bug (single-row-
group scan, AQE-coalesced compute stage, global window); a stage whose
``max_ms`` ≈ ``sum_ms`` with many tasks is a straggler/skew.

Usage: python tools/profile_query.py <query> [<query> ...] [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from talkinghead_datapipeline_spark.session import get_spark
    from talkinghead_datapipeline_spark.queries import all_queries

    spark = get_spark(app_name="profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    reg = all_queries()

    # Stage metrics come from the JVM AppStatusStore after each run — no
    # custom listener needed (a Python-side listener would add a py4j
    # callback server for no benefit here).
    for qname in args.queries:
        q = reg[qname]
        sc.setJobDescription(f"profile:{qname}")
        # warm once (populate shuffle/cache), then measure
        times = []
        for rep in range(args.reps + 1):
            t0 = time.perf_counter()
            df = q.spark(spark, args.sf)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t1
            if rep > 0:
                times.append((t_build, t_exec))
        bt = sorted(t[0] for t in times)[len(times) // 2]
        et = sorted(t[1] for t in times)[len(times) // 2]
        print(f"\n=== {qname}: build {bt:.3f}s exec {et:.3f}s (median of {args.reps}) ===")
        # stage table from the last run via the JVM app status store
        store = sc._jsc.sc().statusStore()
        it = store.stageList(spark._jvm.java.util.ArrayList())
        n = it.size()
        seen = []
        for i in range(n):
            s = it.apply(i)
            sid = s.stageId()
            try:
                nt = s.numCompleteTasks()
                rt = s.executorRunTime()
                ib = s.inputBytes()
                srb = s.shuffleReadBytes()
                swb = s.shuffleWriteBytes()
                name = s.name().split("\n")[0]
                seen.append((sid, nt, rt, ib, srb, swb, name))
            except Exception:
                continue
        seen.sort()
        # print only stages from the final rep (highest stage ids covering
        # roughly the last run's stage count); show the top-cost ones
        seen = [r for r in seen if r[2] > 0]
        seen.sort(key=lambda r: -r[2])
        print(f"{'stage':>6} {'tasks':>6} {'run_ms':>9} {'input':>10} {'shRead':>10} {'shWrite':>10}  name")
        for sid, nt, rt, ib, srb, swb, name in seen[:12]:
            print(f"{sid:>6} {nt:>6} {rt:>9} {ib:>10} {srb:>10} {swb:>10}  {name[:70]}")
    spark.stop()


if __name__ == "__main__":
    main()
