"""Pure-Python hypothesis fuzzes of the r15-staged identities that have
no engine in the loop (the commit-323f55d pattern: prove the ALGEBRA the
Spark plan relies on, separately from the cross-engine differential).

- Skyline running-max identity: in 2-D, "not dominated" is equivalent to
  (no strictly-cheaper point has size >= mine) AND (I hold the max size
  at my exact price) — the identity pareto_skyline_parts' two windows
  implement.
- KMV mergeability: the k smallest of the union of two k-minimum
  sketches equal the k smallest of the full union — the property that
  makes kmv_distinct_intersection's union sketch lossless.
(The cusum reflected-prefix, spearman doubled-rank, and stump
Fraction-envelope identities are fuzzed in their own staged test files.)
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_point = st.tuples(
    st.integers(min_value=0, max_value=30),  # price
    st.integers(min_value=0, max_value=30),  # size
)


def _dominates(b, a):
    return (
        b[0] <= a[0] and b[1] >= a[1] and (b[0] < a[0] or b[1] > a[1])
    )


@given(st.lists(_point, min_size=1, max_size=60))
@settings(max_examples=400, deadline=None)
def test_skyline_running_max_identity(pts):
    brute = [
        a for a in pts if not any(_dominates(b, a) for b in pts if b is not a)
    ]
    windowed = []
    for p, s in pts:
        cheaper = [s2 for p2, s2 in pts if p2 < p]
        same = [s2 for p2, s2 in pts if p2 == p]
        if (not cheaper or max(cheaper) < s) and s == max(same):
            windowed.append((p, s))
    assert sorted(map(tuple, brute)) == sorted(windowed)


@given(
    st.sets(st.integers(min_value=0, max_value=10_000), min_size=1,
            max_size=300),
    st.sets(st.integers(min_value=0, max_value=10_000), min_size=1,
            max_size=300),
    st.integers(min_value=1, max_value=32),
)
@settings(max_examples=400, deadline=None)
def test_kmv_union_mergeability(a, b, k):
    ska = sorted(a)[:k]
    skb = sorted(b)[:k]
    merged = sorted(set(ska) | set(skb))[:k]
    truth = sorted(a | b)[:k]
    assert merged == truth
