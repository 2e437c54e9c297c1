"""Bbox / landmark geometry kernels as pure column expressions (SURVEY §2.c).

Re-expresses dpl/processor/utils.py:7-65 (S1 `to_square`, S2 `pad_bbox`,
S3 `to_integer`, S4 `l2_batch`, S5 `get_blinks_data`) as JVM-side Spark SQL
expressions — no Python in the hot path, fully codegen'd.

A bbox is five columns/expressions ``(x1, y1, x2, y2, score)``; the helpers
take and return ``dict[str, Column]`` so chains stay composable:
``to_integer(pad_bbox(to_square(b), 0.1))`` mirrors the reference's
TransformRawBboxesNode chain (dpl/processor/nodes/bboxes.py:12-42).

Rounding note: the reference uses Python ``round`` (banker's); these kernels
use SQL ``round`` (half-away-from-zero), pinned in tests/test_kernels.py as a
documented divergence (SURVEY §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

Bbox = dict[str, Column]


def make_bbox(x1: Column, y1: Column, x2: Column, y2: Column, score: Column) -> Bbox:
    return {"x1": x1, "y1": y1, "x2": x2, "y2": y2, "score": score}


def to_square(b: Bbox) -> Bbox:
    """S1 (utils.py:27-39): expand the shorter side symmetrically so w == h."""
    w = b["x2"] - b["x1"]
    h = b["y2"] - b["y1"]
    side = F.greatest(w, h)
    return make_bbox(
        x1=b["x1"] - (side - w) / 2,
        y1=b["y1"] - (side - h) / 2,
        x2=b["x2"] + (side - w) / 2,
        y2=b["y2"] + (side - h) / 2,
        score=b["score"],
    )


def pad_bbox(b: Bbox, pad: float) -> Bbox:
    """S2 (utils.py:42-50): pad all sides; fractional pad = round(pad·max_side)."""
    if isinstance(pad, float) and not pad.is_integer():
        max_side = F.greatest(b["x2"] - b["x1"], b["y2"] - b["y1"])
        pad_e = F.round(F.lit(pad) * max_side, 0)
    else:
        pad_e = F.lit(pad)
    return make_bbox(
        x1=b["x1"] - pad_e,
        y1=b["y1"] - pad_e,
        x2=b["x2"] + pad_e,
        y2=b["y2"] + pad_e,
        score=b["score"],
    )


def to_integer(b: Bbox, preserve_size: bool = True) -> Bbox:
    """S3 (utils.py:7-24): integer-round corners; preserve w/h exactly when
    asked; score → round(score·100)."""
    x1i = F.round(b["x1"], 0).cast("bigint")
    y1i = F.round(b["y1"], 0).cast("bigint")
    if preserve_size:
        x2i = x1i + F.round(b["x2"] - b["x1"], 0).cast("bigint")
        y2i = y1i + F.round(b["y2"] - b["y1"], 0).cast("bigint")
    else:
        x2i = F.round(b["x2"], 0).cast("bigint")
        y2i = F.round(b["y2"], 0).cast("bigint")
    return make_bbox(
        x1=x1i, y1=y1i, x2=x2i, y2=y2i,
        score=F.round(b["score"] * 100, 0).cast("bigint"),
    )


def l2(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """S4 (utils.py:53-54): Euclidean distance between two 2-D points."""
    return F.sqrt(F.pow(x1 - x2, F.lit(2)) + F.pow(y1 - y2, F.lit(2)))


def eye_aspect_ratio(
    outer_a: tuple[Column, Column],
    outer_b: tuple[Column, Column],
    top_a: tuple[Column, Column],
    bot_a: tuple[Column, Column],
    top_b: tuple[Column, Column],
    bot_b: tuple[Column, Column],
) -> Column:
    """S5 (utils.py:57-65): blink EAR = (d(topA,botA)+d(topB,botB)) / (2·d(outerA,outerB))."""
    v1 = l2(top_a[0], top_a[1], bot_a[0], bot_a[1])
    v2 = l2(top_b[0], top_b[1], bot_b[0], bot_b[1])
    hor = l2(outer_a[0], outer_a[1], outer_b[0], outer_b[1])
    return (v1 + v2) / (2 * hor)
