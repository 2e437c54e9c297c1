"""The in-repo bench record (VERDICT r7 #6): bench.py persists its full
JSON — every per-query timing, not just the 2000-char stdout tail the
driver keeps — to BENCH_LOCAL_r{N}.json so per-query history survives in
git. These tests pin that the record round-trips and that the round
inference tracks the driver's own artifacts."""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def test_digest_is_bounded_and_slowest_first():
    """The final-line per-query digest (VERDICT r14 #2) must stay inside
    its serialized-size budget whatever the registry size, keep 2-decimal
    values, and select the slowest queries first (deterministic name
    tiebreak) — those are the rows a cross-round or cross-core comparison
    can actually resolve."""
    timings = {f"query_{i:03d}": (i % 37) / 10 + 0.01 * i for i in range(400)}
    d = bench._digest(timings)
    assert 0 < len(d) < len(timings)
    assert len(json.dumps(d)) <= bench._DIGEST_BUDGET + 50
    # slowest-first selection: everything excluded is <= everything included
    floor = min(timings[k] for k in d)
    assert all(v <= floor for k, v in timings.items() if k not in d)
    assert all(v == round(timings[k], 2) for k, v in d.items())
    # ties broken by name, deterministically
    assert bench._digest(timings) == d


def test_local_record_round_trips(tmp_path, monkeypatch):
    result = {
        "queries": {"q1_pricing_summary": 0.123, "flagship_segment_leaders": 0.456},
        "errors": {"broken_query": "Boom"},
        "metric": "headline_queries_total_sec",
        "value": None,
        "subtotal_r1_29": None,
        "sf": 0.1,
        "reps": 3,
        "n_queries": 2,
        "n_failed": 1,
    }
    monkeypatch.setattr(bench.os.path, "abspath", lambda _: str(tmp_path / "bench.py"))
    path = bench._write_local_record(result)
    assert Path(path).parent == tmp_path
    assert json.loads(Path(path).read_text()) == result


def test_summary_scalars_serialize_last_even_on_failure():
    """ADVICE r7: the errors dict must ride BEFORE the summary scalars so
    the driver's tail capture keeps the totals in exactly the failure case
    truncation-proofing was built for."""
    timings = {"a": 1.0}
    errors = {"b": "x" * 50}
    summary = {"metric": "headline_queries_total_sec", "value": None, "n_failed": 1}
    result = {"queries": timings, **({"errors": errors} if errors else {}), **summary}
    line = json.dumps(result)
    assert line.index('"errors"') < line.index('"metric"')
    assert line.rstrip("}").endswith('"n_failed": 1')


def test_infer_round_tracks_driver_artifacts(monkeypatch):
    rounds = [
        int(m.group(1))
        for f in REPO.iterdir()
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f.name))
    ]
    assert rounds, "driver artifacts missing"
    assert bench._infer_round() == max(rounds) + 1
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "42")
    assert bench._infer_round() == 42


def test_rotating_sample_covers_all_absentees_every_cycle():
    """VERDICT r13 #4 (option b): the rotating sample must reach EVERY
    HEADLINE absentee within SAMPLE_ROUNDS consecutive rounds, be a pure
    function of the round number, and never overlap HEADLINE (sample
    timings must not contaminate the comparable totals)."""
    all_names = [f"q{i:03d}" for i in range(91)] + list(bench.HEADLINE[:5])
    headline = bench.HEADLINE
    seen: set[str] = set()
    for r in (14, 15, 16):
        s = bench._rotating_sample(all_names, headline, r)
        assert s == bench._rotating_sample(all_names, headline, r)  # pure
        assert not set(s) & set(headline)
        seen |= set(s)
    absent = {n for n in all_names if n not in set(headline)}
    assert seen == absent, f"uncovered after {bench.SAMPLE_ROUNDS} rounds"


def test_rotating_sample_real_registry_size():
    """On the real registry the per-round slice stays a bounded fraction
    (ceil(|absent|/3)) and empty-absentee degenerates to []."""
    from talkinghead_datapipeline_spark.queries import all_queries

    names = list(all_queries())
    s = bench._rotating_sample(names, bench.HEADLINE, 14)
    absent_n = len([n for n in names if n not in set(bench.HEADLINE)])
    assert len(s) == -(-absent_n // bench.SAMPLE_ROUNDS)
    assert bench._rotating_sample(list(bench.HEADLINE), bench.HEADLINE, 14) == []
