"""Per-stage task-parallelism profiler for registered queries (guide §1).

Runs each named query with the noop sink and a SparkListener that records,
per stage: task count, summed task runtime, max task runtime, and input/
shuffle bytes. The point is to make single-task / straggler stages visible
without the (disabled) Spark UI: a stage whose ``sum_ms`` dominates the
query wall time while ``n_tasks`` is 1 is a parallelism bug (single-row-
group scan, AQE-coalesced compute stage, global window); a stage whose
``max_ms`` ≈ ``sum_ms`` with many tasks is a straggler/skew.

The build/exec split matters because bench.py's timed region includes the
query-builder call: driver-side plan construction (py4j round-trips, literal
marshalling, eager checkpoints) is paid per rep exactly like execution.

Usage: python tools/profile_query.py <query>|ALL [...] [--sf DIR] [--reps N]
       [--json FILE]   # with ALL: dump {name: {build, exec}} and skip stages
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
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from talkinghead_datapipeline_spark.session import get_spark
    from talkinghead_datapipeline_spark.queries import all_queries

    spark = get_spark(app_name="profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    reg = all_queries()

    if args.queries == ["ALL"]:
        # sweep mode: bench.py's HEADLINE order, build/exec split only,
        # clearCache between queries exactly like the bench
        import json

        from bench import HEADLINE

        out: dict[str, dict] = {}
        for qname in [n for n in HEADLINE if n in reg]:
            q = reg[qname]
            sc.setJobDescription(f"profile:{qname}")
            try:
                bts, ets = [], []
                for rep in range(args.reps + 1):
                    t0 = time.perf_counter()
                    df = q.spark(spark, args.sf)
                    t1 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    t2 = time.perf_counter()
                    if rep > 0:
                        bts.append(t1 - t0)
                        ets.append(t2 - t1)
                rec = {
                    "build": round(sorted(bts)[len(bts) // 2], 4),
                    "exec": round(sorted(ets)[len(ets) // 2], 4),
                }
                out[qname] = rec
                print(f"{rec['build']:8.3f} {rec['exec']:8.3f}  {qname}", flush=True)
            except Exception as exc:  # noqa: BLE001
                out[qname] = {"error": str(exc)[:200]}
                print(f"FAILED {qname}: {str(exc)[:120]}", flush=True)
            finally:
                spark.catalog.clearCache()
                # mirror bench.py's untimed-gap hygiene (see its comment)
                import gc

                gc.collect()
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f, indent=1)
        spark.stop()
        return

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
        # py4j cannot use Scala default args: pass all five explicitly
        it = store.stageList(
            spark._jvm.java.util.ArrayList(),
            False,
            False,
            sc._gateway.new_array(sc._jvm.double, 0),
            spark._jvm.java.util.ArrayList(),
        )
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
