"""Compare two BENCH_LOCAL_r{N}.json records per-query.

First-line triage for cross-round perf disputes: prints queries whose
timing moved more than a threshold ratio, plus the whole-suite total and
the fixed-key r1 subtotal. A uniform shift across heterogeneous plan
shapes is the machine-state signature (SCALING.md, round 7) — anything
uniform here is NOT a code regression; a single outlying query is where
to look. Definitive adjudication remains the interleaved two-worktree
A/B documented in SCALING.md; this tool only says where to point it.

Usage: python tools/bench_compare.py BENCH_LOCAL_r07.json BENCH_LOCAL_r08.json [--threshold 1.5]
"""

from __future__ import annotations

import json
import sys


def compare(old: dict, new: dict, threshold: float = 1.5) -> dict:
    """Return {added, removed, regressed, improved, ratio_median} between
    two bench records. regressed/improved are (name, old_s, new_s, ratio)
    with ratio = new/old, filtered by the threshold."""
    oq, nq = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(oq) & set(nq))
    ratios = {n: (nq[n] / oq[n] if oq[n] > 0 else float("inf")) for n in common}
    srt = sorted(ratios.values())
    med = srt[len(srt) // 2] if srt else None
    return {
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
        "regressed": [
            (n, oq[n], nq[n], round(ratios[n], 2))
            for n in common
            if ratios[n] >= threshold
        ],
        "improved": [
            (n, oq[n], nq[n], round(ratios[n], 2))
            for n in common
            if ratios[n] <= 1 / threshold
        ],
        "ratio_median": round(med, 3) if med is not None else None,
        "n_common": len(common),
    }


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    threshold = 1.5
    for a in argv:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
    if len(args) < 2:
        print(__doc__)
        return 2
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    d = compare(old, new, threshold)
    print(f"common queries: {d['n_common']}  median ratio new/old: {d['ratio_median']}")
    if d["ratio_median"] and not (0.8 <= d["ratio_median"] <= 1.25):
        print(
            "NOTE: median ratio far from 1.0 — uniform shift = machine-state "
            "signature, not a code regression (see SCALING.md protocol)."
        )
    for label in ("regressed", "improved"):
        for n, o, v, r in sorted(d[label], key=lambda t: -t[3] if label == "regressed" else t[3]):
            print(f"{label[:-1]:>9}: {n}  {o:.3f}s -> {v:.3f}s  ({r}x)")
    if d["added"]:
        print("added:", ", ".join(d["added"]))
    if d["removed"]:
        print("removed:", ", ".join(d["removed"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
