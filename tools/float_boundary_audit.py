"""Boundary-margin audit for the round(,6) double-accumulation class.

ADVICE r7 flagged ``emb_covariance_upper``: its per-partition partial sums
make double accumulation order layout-dependent, and cross-engine hash
stability rests on every pre-rounded value sitting far from a
round(x, 6) half-way boundary — the same float-at-boundary class that
flipped flagship's cent.  This tool replaces the empirical 4-split probe
with the direct measurement: recompute every covariance cell EXACTLY
(float32 inputs are dyadic rationals → scaled-integer sums → Fraction
division, zero rounding anywhere) and report each cell's distance from
its nearest rounding boundary in units of the double ULP at the
accumulated magnitude.  A margin of k ULPs tolerates any accumulation
re-ordering whose error is < k/2 ULPs — pairwise/BLAS blocked summation
over n rows wanders O(log n) ULPs, so margins in the thousands make the
layout-independence argument arithmetic, not luck.

Usage: python tools/float_boundary_audit.py [sf_dir ...]
Prints one summary line per SF plus the thinnest cells.
"""

from __future__ import annotations

import math
import sys
from fractions import Fraction

import numpy as np
import pyarrow.parquet as pq

SCALE = 149  # float32 subnormals reach 2^-149: x * 2^149 is an exact integer


def exact_cells(sf_dir: str):
    """Yield (i, j, exact_cov: Fraction, double_magnitude) per upper cell."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    x32 = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
    n, d = x32.shape
    # float32 -> exact scaled integers (object dtype holds Python ints)
    xi = np.array(
        [[int(Fraction(float(v)) * (1 << SCALE)) for v in row] for row in x32],
        dtype=object,
    )
    s = xi.sum(axis=0)                      # exact Σx * 2^SCALE
    g = xi.T @ xi                           # exact Σx_i x_j * 2^(2·SCALE)
    # double-precision magnitudes (for ULP scale of the real pipeline)
    xd = x32.astype(np.float64)
    sd = xd.sum(axis=0)
    gd = xd.T @ xd
    one = Fraction(1)
    for i in range(d):
        for j in range(i, d):
            sij = Fraction(int(g[i, j]), 1 << (2 * SCALE))
            si = Fraction(int(s[i]), 1 << SCALE)
            sj = Fraction(int(s[j]), 1 << SCALE)
            v = (sij - si * sj / n) / (n - 1)
            # the magnitude at which double rounding error accumulates is
            # the larger of the two nearly-cancelling terms, not the result
            mag = max(abs(gd[i, j]), abs(sd[i] * sd[j] / n), 1e-300) / (n - 1)
            yield i + 1, j + 1, v * one, mag


def audit(sf_dir: str) -> dict:
    worst = []
    for i, j, v, mag in exact_cells(sf_dir):
        d6 = v * 10**6
        fl = math.floor(d6)
        frac = d6 - fl                       # exact Fraction in [0, 1)
        dist = abs(frac - Fraction(1, 2))    # distance from the .5 boundary
        dist_v = float(dist) / 10**6         # back to value units
        ulp = math.ulp(mag)
        worst.append((dist_v / ulp, i, j, dist_v, ulp))
    worst.sort()
    return {"sf_dir": sf_dir, "cells": len(worst), "worst": worst[:5]}


def main(argv: list[str]) -> int:
    sf_dirs = argv or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    for sf in sf_dirs:
        r = audit(sf)
        m = r["worst"][0]
        print(
            f"{sf}: {r['cells']} cells, min boundary margin "
            f"{m[0]:.3g} ULPs (cell i={m[1]} j={m[2]}, "
            f"dist={m[3]:.3g}, ulp={m[4]:.3g})"
        )
        for w in r["worst"]:
            print(f"  margin={w[0]:.4g} ulps  i={w[1]} j={w[2]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
