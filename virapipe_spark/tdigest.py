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
    budget k(q_right) - k(q_left) <= 1 holds."""
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m = float(means[0])
    cur_w = float(weights[0])
    q_left = 0.0
    k_left = float(_k(np.array([0.0]), delta)[0])
    for i in range(1, len(means)):
        w = float(weights[i])
        q_right = (q_left * total + cur_w + w) / total
        if _k(np.array([q_right]), delta)[0] - k_left <= 1.0:
            # weighted-mean update in a fixed (sorted) order: deterministic
            cur_m += (means[i] - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q_left += cur_w / total
            k_left = float(_k(np.array([q_left]), delta)[0])
            cur_m = float(means[i])
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
