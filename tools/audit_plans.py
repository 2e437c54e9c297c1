#!/usr/bin/env python
"""Plan-pathology audits over every registered query (round-7 tooling).

Modes (``python tools/audit_plans.py <mode> [sf_dir]``):

  filters   Optimized-plan Filter conditions carrying heavy array/HOF
            chains — the predicate-pushdown re-evaluation pathology
            (catalog.pushdown_barrier fixes it; the CI net is
            tests/test_plans.py::test_no_pushed_filter_reevaluates_heavy_projection).
  joins     The same sweep over Join conditions (inferred-isnotnull
            duplication, verify-expression weight). Findings here need a
            measured cold A/B before acting: the sim_lsh fence was a wash
            (SCALING.md, round 7).
  scans     Per-table FileScan counts per query (persist/reuse
            candidates). Counts INSIDE InMemoryTableScan-cached subtrees
            too, so persisted queries still print multiple scans — follow
            up with timings, not plan text (SCALING.md round-6 persist
            audit).

Exit code is always 0: these are surveys, not gates — the gates live in
tests/test_plans.py. Run at sf0.001 (default) so the sweep stays fast;
plan SHAPE is SF-independent for every registered query.
"""

from __future__ import annotations

import re
import sys
from collections import Counter

REPO = __file__.rsplit("/tools/", 1)[0]
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from talkinghead_datapipeline_spark.queries import all_queries  # noqa: E402
from talkinghead_datapipeline_spark.session import get_spark  # noqa: E402

HEAVY = re.compile(
    r"array_sort\(|transform\(|aggregate\(|zip_with\(|sort_array\(|filter\(lambda"
)


def _plans(spark, sf_dir, optimized):
    for name, spec in all_queries().items():
        try:
            qe = spec.spark(spark, sf_dir)._jdf.queryExecution()
            plan = (qe.optimizedPlan() if optimized else qe.executedPlan()).toString()
        except Exception as exc:  # noqa: BLE001
            print(f"PLAN ERROR {name}: {type(exc).__name__}", file=sys.stderr)
            continue
        yield name, plan


def audit_filters(spark, sf_dir, min_len=400):
    rows = []
    for name, plan in _plans(spark, sf_dir, optimized=True):
        for line in plan.splitlines():
            s = line.strip()
            if "Filter " in s and len(s) > min_len and HEAVY.search(s):
                rows.append((name, len(s), len(HEAVY.findall(s)), s[:100]))
    return rows


def audit_joins(spark, sf_dir, min_len=400):
    rows = []
    for name, plan in _plans(spark, sf_dir, optimized=True):
        for line in plan.splitlines():
            s = line.strip()
            if "Join " in s and len(s) > min_len and HEAVY.search(s):
                rows.append((name, len(s), len(HEAVY.findall(s)), s[:100]))
    return rows


def audit_scans(spark, sf_dir, min_scans=3):
    rows = []
    for name, plan in _plans(spark, sf_dir, optimized=False):
        tabs = Counter(re.findall(r"/(\w+)\.parquet", plan))
        if tabs and max(tabs.values()) >= min_scans:
            rows.append((name, max(tabs.values()), 0, dict(tabs)))
    return rows


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "filters"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(app_name=f"audit_{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = {"filters": audit_filters, "joins": audit_joins, "scans": audit_scans}[mode]
    rows = sorted(fn(spark, sf_dir), key=lambda r: -r[1])
    for name, size, hits, frag in rows:
        print(f"{size:7d} {hits:3d} {name:40s} {frag}")
    print(f"total flagged: {len(rows)}")
    spark.stop()


if __name__ == "__main__":
    main()
