"""Kernel unit tests vs independent numpy reference implementations
(SURVEY §5 item 2): S1-S5 geometry, S6 frame bounds, S7 resample grid,
S8 savgol (coefficients + exact edge mode).

The numpy references below are written from the formulas documented in
SURVEY §2.c — independent re-derivations, not imports of reference code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.functions import geometry as G
from talkinghead_datapipeline_spark.functions.windows import (
    as_windowed_bounds,
    centered_frame_bounds,
    savgol_coefficients,
)
from talkinghead_datapipeline_spark.operators.resample import (
    resample_linear,
    with_frame_index,
)
from talkinghead_datapipeline_spark.operators.rolling import (
    savgol_filter_numpy,
    savgol_smooth,
)

rng = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# S8 — savgol
# ---------------------------------------------------------------------------


def test_savgol_coefficients_w7_o3_closed_form():
    # classic Savitzky-Golay table: w=7 cubic smoothing = (-2,3,6,7,6,3,-2)/21
    got = np.asarray(savgol_coefficients(7, 3))
    want = np.array([-2, 3, 6, 7, 6, 3, -2]) / 21
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_savgol_coefficients_reproduce_polynomials():
    # a degree-<=order polynomial must be reproduced exactly at the center
    for w, o in [(5, 2), (7, 3), (11, 3), (25, 3)]:
        coefs = np.asarray(savgol_coefficients(w, o))
        h = w // 2
        x = np.arange(-h, h + 1, dtype=float)
        for deg in range(o + 1):
            y = x**deg
            np.testing.assert_allclose(coefs @ y, 0.0**deg if deg else 1.0, atol=1e-9)


def test_savgol_filter_numpy_interp_edges():
    # interior equals FIR; edges equal an explicit degree-3 refit
    y = rng.normal(size=40)
    out = savgol_filter_numpy(y, 7, 3)
    coefs = np.asarray(savgol_coefficients(7, 3))
    for i in range(3, 37):
        np.testing.assert_allclose(out[i], coefs @ y[i - 3 : i + 4], atol=1e-12)
    xh = np.arange(7.0)
    p = np.polynomial.polynomial.polyfit(xh, y[:7], 3)
    np.testing.assert_allclose(out[:3], np.polynomial.polynomial.polyval(xh[:3], p))
    p2 = np.polynomial.polynomial.polyfit(xh, y[-7:], 3)
    np.testing.assert_allclose(out[-3:], np.polynomial.polynomial.polyval(xh[4:], p2))


def test_savgol_smooth_spark_matches_numpy(spark):
    pdf = pd.DataFrame(
        {
            "name": np.repeat(["a", "b"], 30),
            "idx": np.tile(np.arange(30), 2),
            "v": rng.normal(size=60),
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        savgol_smooth(df, "name", "idx", ["v"], window=7)
        .toPandas()
        .sort_values(["name", "idx"])
    )
    for name in ["a", "b"]:
        got = out[out["name"] == name]["v"].to_numpy()
        want = savgol_filter_numpy(
            pdf[pdf["name"] == name]["v"].to_numpy(), 7, 3
        )
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_savgol_smooth_short_series_pass_through(spark):
    pdf = pd.DataFrame({"name": ["a"] * 4, "idx": range(4), "v": [1.0, 2.0, 3.0, 4.0]})
    out = savgol_smooth(spark.createDataFrame(pdf), "name", "idx", ["v"], window=7)
    got = out.toPandas().sort_values("idx")["v"].to_numpy()
    np.testing.assert_allclose(got, pdf["v"].to_numpy())


# ---------------------------------------------------------------------------
# S6 — frame bound conventions
# ---------------------------------------------------------------------------


def test_frame_bounds_match_reference_conventions():
    # as_windowed: window i covers [i-(size-size//2), i+size//2)
    assert as_windowed_bounds(16) == (-8, 7)
    assert as_windowed_bounds(5) == (-3, 1)
    # centered neighbors: [i-w//2, i+w-w//2-1]
    assert centered_frame_bounds(5) == (-2, 2)
    assert centered_frame_bounds(4) == (-2, 1)
    for size in (2, 3, 4, 5, 8, 16, 25):
        lo, hi = as_windowed_bounds(size)
        assert hi - lo + 1 == size
        lo, hi = centered_frame_bounds(size)
        assert hi - lo + 1 == size


# ---------------------------------------------------------------------------
# S1-S3 — bbox chain vs numpy reference
# ---------------------------------------------------------------------------


def _np_to_square(b):
    x1, y1, x2, y2 = b
    w, h = x2 - x1, y2 - y1
    side = max(w, h)
    return (
        x1 - (side - w) / 2,
        y1 - (side - h) / 2,
        x2 + (side - w) / 2,
        y2 + (side - h) / 2,
    )


def _np_pad(b, pad):
    x1, y1, x2, y2 = b
    p = round(pad * max(x2 - x1, y2 - y1)) if isinstance(pad, float) else pad
    return (x1 - p, y1 - p, x2 + p, y2 + p)


def test_bbox_chain_matches_numpy(spark):
    pdf = pd.DataFrame(
        {
            "x1": rng.uniform(0, 50, 50),
            "y1": rng.uniform(0, 50, 50),
            "w": rng.uniform(1, 30, 50),
            "h": rng.uniform(1, 30, 50),
        }
    )
    pdf["x2"] = pdf.x1 + pdf.w
    pdf["y2"] = pdf.y1 + pdf.h
    df = spark.createDataFrame(pdf)
    b = G.make_bbox(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"), F.lit(0.9))
    out = G.pad_bbox(G.to_square(b), 0.1)
    got = df.select(
        out["x1"].alias("ox1"),
        out["y1"].alias("oy1"),
        out["x2"].alias("ox2"),
        out["y2"].alias("oy2"),
    ).toPandas()
    for i, row in pdf.iterrows():
        sq = _np_to_square((row.x1, row.y1, row.x2, row.y2))
        # reference parity: pad uses Python round() = half-to-even
        # (dpl/processor/utils.py pad_bbox), mirrored by _np_pad.
        want = _np_pad(sq, 0.1)
        np.testing.assert_allclose(
            got.iloc[i][["ox1", "oy1", "ox2", "oy2"]].to_numpy().astype(float),
            want,
            atol=1e-9,
        )
    # squareness is preserved through integer rounding (preserve_size=True)
    ints = G.to_integer(out)
    w_eq_h = df.select(
        ((ints["x2"] - ints["x1"]) == (ints["y2"] - ints["y1"])).alias("sq")
    ).toPandas()["sq"]
    assert w_eq_h.all()


# ---------------------------------------------------------------------------
# S4/S5 — blink EAR vs numpy
# ---------------------------------------------------------------------------


def test_round_half_even_reference_parity(spark):
    """round_half_even must match np.rint / Python round() exactly,
    including ties and negatives (dpl/processor/utils.py parity)."""
    vals = [12.5, 13.5, -12.5, -13.5, 0.5, 1.5, 2.5, -0.5, -2.5, 2.3, -2.7, 7.0]
    pdf = pd.DataFrame({"x": vals})
    got = (
        spark.createDataFrame(pdf)
        .select(G.round_half_even(F.col("x")).alias("r"))
        .toPandas()["r"]
        .tolist()
    )
    want = [int(np.rint(v)) for v in vals]
    assert got == want
    assert want == [round(v) for v in vals]  # np.rint == Python round here


def test_blink_ear_matches_numpy(spark):
    pts = rng.uniform(0, 10, (20, 12))
    pdf = pd.DataFrame(pts, columns=[f"c{i}" for i in range(12)])
    df = spark.createDataFrame(pdf)
    ear = G.eye_aspect_ratio(
        (F.col("c0"), F.col("c1")),
        (F.col("c2"), F.col("c3")),
        (F.col("c4"), F.col("c5")),
        (F.col("c6"), F.col("c7")),
        (F.col("c8"), F.col("c9")),
        (F.col("c10"), F.col("c11")),
    )
    got = df.select(ear.alias("ear")).toPandas()["ear"].to_numpy()

    def d(a, b):
        return np.hypot(pts[:, a] - pts[:, b], pts[:, a + 1] - pts[:, b + 1])

    want = (d(4, 6) + d(8, 10)) / (2 * d(0, 2))
    np.testing.assert_allclose(got, want, atol=1e-9)


# ---------------------------------------------------------------------------
# S7 — resample vs numpy interp (reference grid semantics)
# ---------------------------------------------------------------------------


def _np_resample(y: np.ndarray, num: int, src_fps: float) -> np.ndarray:
    L = len(y)
    x = np.linspace(1 / (2 * src_fps), L / src_fps, L)
    tgt_fps = num / (L / src_fps)
    xh = np.linspace(1 / (2 * tgt_fps), L / src_fps, num)
    # linear interp with linear extrapolation from the boundary segments
    out = np.empty(num)
    for j, t in enumerate(xh):
        i = int(np.clip(np.floor((t - x[0]) / (x[1] - x[0])), 0, L - 2))
        frac = (t - x[i]) / (x[i + 1] - x[i])
        out[j] = y[i] + frac * (y[i + 1] - y[i])
    return out


@pytest.mark.parametrize("L,num", [(10, 6), (50, 30), (7, 11), (2, 2)])
def test_resample_matches_numpy(spark, L, num):
    y = rng.normal(size=L)
    pdf = pd.DataFrame({"name": ["c"] * L, "ord": range(L), "v": y})
    df = with_frame_index(spark.createDataFrame(pdf), "name", ["ord"])
    out = resample_linear(df, "name", "v", F.lit(num).cast("bigint"), src_fps=50.0)
    got = (
        out.toPandas().sort_values("tgt_idx")["resampled"].to_numpy()
    )
    want = _np_resample(y, num, 50.0)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_resample_interp_values_vs_npinterp():
    # cross-check the reference grid against np.interp inside the hull
    y = rng.normal(size=50)
    got = _np_resample(y, 30, 50.0)
    L = len(y)
    x = np.linspace(1 / 100, L / 50, L)
    tgt_fps = 30 / (L / 50)
    xh = np.linspace(1 / (2 * tgt_fps), L / 50, 30)
    inside = (xh >= x[0]) & (xh <= x[-1])
    np.testing.assert_allclose(got[inside], np.interp(xh[inside], x, y), atol=1e-9)


def test_savgol_exact_w7_query_matches_numpy_exact_tier(spark, sf_dir):
    """The hat-matrix SQL form of savgol(7,3) must agree with the numpy
    exact tier (polyfit edge refit) to float tolerance."""
    import numpy as np

    from talkinghead_datapipeline_spark.catalog import load_table
    from talkinghead_datapipeline_spark.operators.rolling import savgol_filter_numpy
    from talkinghead_datapipeline_spark.queries import all_queries

    out = (
        all_queries()["s8_savgol_exact_w7"]
        .spark(spark, sf_dir)
        .filter("user_id = 1")
        .orderBy("event_id")
        .collect()
    )
    series = (
        load_table(spark, sf_dir, "events")
        .filter("user_id = 1")
        .orderBy("event_id")
        .select("value")
        .collect()
    )
    y = np.array([r.value for r in series])
    expected = np.round(savgol_filter_numpy(y, 7, 3), 6)
    got = np.array([r.smoothed for r in out])
    np.testing.assert_allclose(got, expected, atol=1e-6)
