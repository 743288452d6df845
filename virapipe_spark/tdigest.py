"""Merging t-digest — the mergeable QUANTILE sketch, completing the
sketch family (HLL distinct / KMV distinct / count-min frequency /
t-digest quantiles): percentile-latency dashboards at 100 TB keep a
small digest per (day, shard) and answer any date-range percentile by
MERGING digests instead of re-scanning events.

Implemented from the published algorithm (Dunning & Ertl, "Computing
extremely accurate quantiles using t-digests", arXiv:1902.04023): the
merging variant — buffer points, sort, then one pass that concatenates
adjacent points into centroids while the k-scale budget allows. The k1
scale function k(q) = (δ/2π)·asin(2q−1) concentrates centroid
resolution at the tails, giving rank error O(q(1−q)/δ).

Everything here is DETERMINISTIC by construction: inputs are sorted
(value order) before the merge pass, and multi-digest merges sort
centroids by (mean, weight) — so the same multiset of values always
yields byte-identical centroids regardless of Spark partition order.
That is what lets the catalog entry's output be stable across runs
even though no SQL oracle can replicate the clustering.
"""

from __future__ import annotations

import numpy as np

__all__ = ["build", "merge", "quantile"]


def _k(q: np.ndarray, delta: float) -> np.ndarray:
    """k1 scale function: tail-accurate centroid size budget."""
    return (delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


def _merge_pass(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """One merging pass over (mean-sorted) weighted points: greedily
    absorb the next point into the current centroid while the k-scale
    budget k(q_right) - k(q_left) <= 1 holds.

    The loop evaluates k ONCE PER INPUT POINT, so the k call must be
    scalar-cheap: building a 1-element ndarray and dispatching the
    ufunc per point made this pass ~17 µs/point (measured — the
    dominant cost of the t-digest catalog entries). ``k1`` below does
    the same arithmetic on Python floats, calling ``np.arcsin`` on the
    scalar; numpy's float64 arcsin is bit-identical across its scalar
    and array paths (pinned in tests/test_tdigest.py — note it is NOT
    bit-identical to ``math.asin``, which is why libm is not used), so
    the digests are byte-identical to the array-at-a-time form."""
    total = float(weights.sum())
    c = delta / (2 * np.pi)  # same prefactor value _k computes per call

    def k1(q: float) -> float:
        # scalar twin of _k on one element — bit-identical (see above)
        if q < 0.0:
            q = 0.0
        elif q > 1.0:
            q = 1.0
        return c * float(np.arcsin(2.0 * q - 1.0))

    # exact float round-trip: ndarray.tolist() yields the same doubles
    # as float(arr[i]) without per-access numpy scalar boxing
    ms = means.tolist()
    ws = weights.tolist()
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m = ms[0]
    cur_w = ws[0]
    q_left = 0.0
    k_left = k1(0.0)
    for i in range(1, len(ms)):
        w = ws[i]
        q_right = (q_left * total + cur_w + w) / total
        if k1(q_right) - k_left <= 1.0:
            # weighted-mean update in a fixed (sorted) order: deterministic
            cur_m += (ms[i] - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q_left += cur_w / total
            k_left = k1(q_left)
            cur_m = ms[i]
            cur_w = w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def build(values: np.ndarray, delta: float = 200.0) -> tuple[np.ndarray, np.ndarray]:
    """values -> (means, weights) centroid arrays. Sorts internally, so
    any input order yields the identical digest."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    if v.size == 0:
        return np.array([]), np.array([])
    return _merge_pass(v, np.ones_like(v), delta)


def build_weighted(
    values: np.ndarray, weights: np.ndarray, delta: float = 200.0
) -> tuple[np.ndarray, np.ndarray]:
    """(values, weights) -> centroid arrays — the PRE-AGGREGATED entry
    point: callers that count duplicate values upstream (a Spark
    ``groupBy(value).count()`` with map-side combine) hand (distinct
    value, multiplicity) pairs instead of raw rows, so only the value
    DOMAIN crosses the Python boundary. Deterministic like
    :func:`build` (sorted by (value, weight) — a total order).

    Centroid layout may differ from ``build`` on the expanded multiset
    (a weighted point is absorbed atomically where unit points can
    split across a k-budget boundary mid-run); both layouts carry the
    same t-digest rank-error guarantee, and the equivalence of ESTIMATES
    is pinned in tests/test_tdigest.py."""
    v = np.asarray(values, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if v.size == 0:
        return np.array([]), np.array([])
    order = np.lexsort((w, v))
    return _merge_pass(v[order], w[order], delta)


def merge(
    digests: list[tuple[np.ndarray, np.ndarray]], delta: float = 200.0
) -> tuple[np.ndarray, np.ndarray]:
    """Merge child digests: concatenate centroids, sort by (mean,
    weight) — a total order, so merge output is independent of child
    order — and re-run the merging pass."""
    parts = [(m, w) for m, w in digests if len(m)]
    if not parts:
        return np.array([]), np.array([])
    means = np.concatenate([m for m, _ in parts])
    weights = np.concatenate([w for _, w in parts])
    order = np.lexsort((weights, means))
    return _merge_pass(means[order], weights[order], delta)


def quantile(
    means: np.ndarray, weights: np.ndarray, q: float
) -> float:
    """Estimate the q-quantile from a digest: centroids are treated as
    mass centered at their mean; linear interpolation between adjacent
    centroid midpoints (the standard t-digest query)."""
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = float(weights.sum())
    target = q * total
    # cumulative mass at each centroid's CENTER
    centers = np.cumsum(weights) - weights / 2.0
    if target <= centers[0]:
        return float(means[0])
    if target >= centers[-1]:
        return float(means[-1])
    i = int(np.searchsorted(centers, target) - 1)
    span = centers[i + 1] - centers[i]
    frac = (target - centers[i]) / span if span > 0 else 0.0
    return float(means[i] + frac * (means[i + 1] - means[i]))
