"""Pre-verify the current driver window before the driver runs it.

Runs the first N entries of ``queries()`` (the driver checks a bounded
prefix of ~50, rotated via ``_DRIVER_PRIORITY``) through the local replica
of the driver's Spark-vs-DuckDB differential check at the driver's SF
(sf0.01 by default).  A clean pass here predicts a green CORRECTNESS_r{N};
a FAIL names the key and the first mismatching rows so it can be fixed
while the window is still open.

Usage:
    python tools/preflight_window.py [--sf-dir /root/testdata/sf0.01]
                                     [--limit 50] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time

sys.path.insert(0, ".")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from talkinghead_datapipeline_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import run_compare  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    qs = queries()
    oracles = oracle_sql()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        missing = [n for n in names if n not in qs]
        if missing:
            print(f"unknown queries: {missing}", file=sys.stderr)
            return 2
    else:
        names = list(itertools.islice(qs, args.limit))

    spark = get_spark()
    failures: list[str] = []
    rows_only: list[str] = []
    t_all = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        if name not in oracles:
            # driver records a weaker rows-only check for these
            n = qs[name](spark, args.sf_dir).count()
            rows_only.append(name)
            print(f"[{i + 1:3d}/{len(names)}] [ROWS] {name}: {n} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        res = run_compare(spark, args.sf_dir, name, qs[name], oracles[name])
        print(f"[{i + 1:3d}/{len(names)}] {res} ({time.time() - t0:.1f}s)")
        if not res.ok:
            failures.append(name)
    summary = {
        "checked": len(names),
        "failed": failures,
        "rows_only": rows_only,
        "sf_dir": args.sf_dir,
        "total_s": round(time.time() - t_all, 1),
    }
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
