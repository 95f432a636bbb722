"""Kendall rank-correlation counts — Knight's O(n log n) algorithm
(W. R. Knight, JASA 1966) in vectorized numpy.

The expensive piece is the discordant-pair count D: sort by (x, y);
pairs tied in x contribute no inversion (y is ascending within an x
group), so D = inversions of the resulting y sequence. Inversions
count by bottom-up mergesort where each level's cross-block counts
come from ONE ``searchsorted`` per adjacent block pair — the Python
loop is over block PAIRS (n−1 iterations TOTAL across all levels),
every comparison inside is a vectorized kernel.

Concordant pairs close via the tie identity
``C = n0 − n1 − n2 + n3 − D`` with n0 = C(n,2), n1/n2 = within-tie
pair counts of x/y, n3 = pairs tied in both — all integer, so the
whole statistic is exact and partition-order-invariant.

Reference analog: none in Feast; SURVEY §2.4 statistics family
(q140 Pearson, q145 Spearman are the siblings).
"""

from __future__ import annotations

import numpy as np


def count_inversions(a: np.ndarray) -> int:
    """Exact inversion count (#pairs i<j with a[i] > a[j]) by
    bottom-up mergesort; each cross-block count is one vectorized
    ``searchsorted`` (strict: left block elements STRICTLY greater)."""
    a = np.asarray(a)
    n = len(a)
    if n < 2:
        return 0
    inv = 0
    width = 1
    a = a.copy()
    while width < n:
        for lo in range(0, n - width, 2 * width):
            mid = lo + width
            hi = min(lo + 2 * width, n)
            left, right = a[lo:mid], a[mid:hi]
            # for each right element: how many left elements exceed it
            inv += int((len(left)
                        - np.searchsorted(left, right, side="right")).sum())
            a[lo:hi] = np.concatenate(
                [left, right])[np.argsort(
                    np.concatenate([left, right]), kind="stable")]
        width *= 2
    return inv


def _tie_pairs(v: np.ndarray) -> int:
    """Σ t·(t−1)/2 over runs of equal values in a SORTED array."""
    if len(v) == 0:
        return 0
    starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
    t = np.diff(np.r_[starts, len(v)])
    return int((t * (t - 1) // 2).sum())


def kendall_counts(x: np.ndarray, y: np.ndarray) -> "dict[str, int]":
    """Exact (C, D, tie) pair counts for Kendall tau-b between two
    int arrays: returns n0 (all pairs), n1 (x-tied), n2 (y-tied),
    n3 (both-tied), n_c, n_d. tau_b = (C−D)/sqrt((n0−n1)(n0−n2))."""
    n = len(x)
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    d = count_inversions(ys)
    n0 = n * (n - 1) // 2
    n1 = _tie_pairs(xs)
    n2 = _tie_pairs(np.sort(y))
    # pairs tied in both: runs of equal (x, y) in the (x, y) sort
    both = np.r_[True, (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])]
    starts = np.flatnonzero(both)
    t = np.diff(np.r_[starts, n])
    n3 = int((t * (t - 1) // 2).sum())
    n_c = n0 - n1 - n2 + n3 - d
    return {"n0": n0, "n1": n1, "n2": n2, "n3": n3,
            "n_c": int(n_c), "n_d": int(d)}
