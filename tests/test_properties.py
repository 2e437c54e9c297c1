"""Property-based tests (hypothesis) for the pure-numpy kernel tier.

These pin MATHEMATICAL identities rather than example outputs, so they
catch whole classes of edge-handling bugs:

- A Savitzky-Golay filter of polyorder p is a least-squares projector onto
  degree-p polynomials, so it must reproduce ANY degree-<=p polynomial
  EXACTLY — interior rows and the 'interp' edge refit alike. A wrong edge
  row (off-by-one window base, transposed hat matrix) breaks this
  instantly while smoke values can still look plausible.
- FLAME LBS at rest pose is affine in the betas (superposition), for ANY
  seeded basis — the oracle's foundation, here fuzzed instead of fixed.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from talkinghead_datapipeline_spark.operators.models import FlameLbsDecoder
from talkinghead_datapipeline_spark.operators.rolling import savgol_filter_numpy

coef = st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=64)


@settings(max_examples=30, deadline=None)
@given(
    coeffs=st.lists(coef, min_size=4, max_size=4),
    n=st.integers(min_value=25, max_value=80),
    window=st.sampled_from([7, 25]),
)
def test_savgol_reproduces_cubics_exactly(coeffs, n, window):
    x = np.arange(n, dtype=np.float64)
    y = np.polynomial.polynomial.polyval(x, np.asarray(coeffs))
    out = savgol_filter_numpy(y, window, 3)
    np.testing.assert_allclose(out, y, rtol=1e-7, atol=1e-7)


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.floats(min_value=-50.0, max_value=50.0, allow_nan=False, width=64),
        min_size=25,
        max_size=40,
    )
)
def test_savgol_constant_preserving_and_shift_equivariant(data):
    y = np.asarray(data)
    # affine invariance: filter(a*y + b) == a*filter(y) + b
    a, b = 3.0, -7.5
    lhs = savgol_filter_numpy(a * y + b, 25, 3)
    rhs = a * savgol_filter_numpy(y, 25, 3) + b
    np.testing.assert_allclose(lhs, rhs, rtol=1e-9, atol=1e-8)


@settings(max_examples=20, deadline=None)
@given(
    s1=st.lists(coef, min_size=8, max_size=8),
    s2=st.lists(coef, min_size=8, max_size=8),
    e1=st.lists(coef, min_size=8, max_size=8),
    e2=st.lists(coef, min_size=8, max_size=8),
    t=st.floats(min_value=0.0, max_value=1.0, allow_nan=False, width=64),
)
def test_flame_rest_decode_is_affine_in_betas(s1, s2, e1, e2, t):
    """decode(t·A + (1−t)·B) == t·decode(A) + (1−t)·decode(B) at rest pose
    — superposition over the whole LBS pipeline, fuzzed over codes."""
    dec = FlameLbsDecoder()
    s1, s2, e1, e2 = (np.asarray(v) for v in (s1, s2, e1, e2))
    va, la = dec.decode(s1, e1)
    vb, lb = dec.decode(s2, e2)
    vm, lm = dec.decode(t * s1 + (1 - t) * s2, t * e1 + (1 - t) * e2)
    np.testing.assert_allclose(vm, t * va + (1 - t) * vb, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(lm, t * la + (1 - t) * lb, rtol=1e-9, atol=1e-9)
