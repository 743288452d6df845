"""t-digest (virapipe_spark.tdigest): INDEPENDENT verification per the
honest-claims rule — the catalog entry's within_tol column certifies
rank error against the exact branch, and these tests check the digest
itself against numpy sorted truth, across distributions, plus the
determinism and merge properties the entry's docstring claims."""

from __future__ import annotations

import numpy as np
import pytest

from virapipe_spark import tdigest as td


def _rank_err(x_sorted: np.ndarray, est: float, q: float) -> float:
    """Distance from q to the INTERVAL of ranks occupied by est — 0
    whenever est is a value whose rank range covers q (with heavy
    ties, any estimator returning the exactly-correct tied value still
    spans a wide rank interval; midpoint rank would wrongly penalize
    it)."""
    lo = np.searchsorted(x_sorted, est, side="left") / len(x_sorted)
    hi = np.searchsorted(x_sorted, est, side="right") / len(x_sorted)
    return max(lo - q, q - hi, 0.0)


DISTS = {
    "uniform": lambda rng, n: rng.uniform(0, 1000, n),
    "lognormal": lambda rng, n: rng.lognormal(0, 2, n),
    "bimodal": lambda rng, n: np.concatenate(
        [rng.normal(10, 1, n // 2), rng.normal(1000, 5, n - n // 2)]
    ),
    "heavy_ties": lambda rng, n: rng.integers(0, 20, n).astype(float),
}


class TestAccuracy:
    @pytest.mark.parametrize("dist", sorted(DISTS))
    def test_rank_error_bounded_all_quantiles(self, dist):
        rng = np.random.default_rng(42)
        x = DISTS[dist](rng, 20000)
        m, w = td.build(x)
        assert w.sum() == len(x)  # no mass lost
        xs = np.sort(x)
        for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
            err = _rank_err(xs, td.quantile(m, w, q), q)
            # entry pins 0.02; digest itself is ~100x tighter — keep
            # slack for the tie-heavy case where rank is ambiguous
            assert err <= 0.01, (dist, q, err)

    def test_tails_tighter_than_middle(self):
        # the k1 scale function's whole point: centroid resolution
        # concentrates at the tails
        rng = np.random.default_rng(7)
        x = rng.lognormal(0, 1.5, 50000)
        m, w = td.build(x)
        # extreme centroids carry less weight than central ones
        assert w[0] < w[len(w) // 2]
        assert w[-1] < w[len(w) // 2]

    def test_compression_bounded(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, 200000)
        m, _ = td.build(x, delta=200.0)
        # digest size ~ delta/2 centroids, never grows with n
        assert len(m) < 200


class TestDeterminismAndMerge:
    def test_build_is_input_order_independent(self):
        rng = np.random.default_rng(5)
        x = rng.lognormal(0, 1, 5000)
        m1, w1 = td.build(x)
        m2, w2 = td.build(rng.permutation(x))
        assert np.array_equal(m1, m2) and np.array_equal(w1, w2)

    def test_merge_is_child_order_independent(self):
        rng = np.random.default_rng(6)
        x = rng.uniform(0, 100, 9000)
        digs = [td.build(s) for s in np.array_split(x, 13)]
        m1, w1 = td.merge(digs)
        m2, w2 = td.merge(digs[::-1])
        m3, w3 = td.merge(sorted(digs, key=lambda d: len(d[0])))
        assert np.array_equal(m1, m2) and np.array_equal(w1, w2)
        assert np.array_equal(m1, m3) and np.array_equal(w1, w3)

    def test_merged_shards_as_accurate_as_whole(self):
        rng = np.random.default_rng(8)
        x = rng.lognormal(0, 2, 40000)
        xs = np.sort(x)
        digs = [td.build(s) for s in np.array_split(x, 56)]  # 8 shards x 7 days
        m, w = td.merge(digs)
        assert w.sum() == len(x)
        for q in (0.5, 0.9, 0.99):
            assert _rank_err(xs, td.quantile(m, w, q), q) <= 0.01

    def test_hierarchical_merge_matches_flat_merge_error(self):
        # day digests -> week digests -> month digest: the rollup tree
        rng = np.random.default_rng(9)
        x = rng.uniform(0, 1, 28000)
        xs = np.sort(x)
        days = [td.build(s) for s in np.array_split(x, 28)]
        weeks = [td.merge(days[i : i + 7]) for i in range(0, 28, 7)]
        month = td.merge(weeks)
        for q in (0.1, 0.5, 0.9):
            assert _rank_err(xs, td.quantile(*month, q), q) <= 0.01


class TestEdgeCases:
    def test_empty_and_singleton(self):
        m, w = td.build(np.array([]))
        assert len(m) == 0
        assert np.isnan(td.quantile(m, w, 0.5))
        m, w = td.build(np.array([42.0]))
        assert td.quantile(m, w, 0.0) == 42.0
        assert td.quantile(m, w, 1.0) == 42.0

    def test_all_equal_values(self):
        m, w = td.build(np.full(1000, 7.5))
        assert td.quantile(m, w, 0.5) == 7.5
        assert w.sum() == 1000

    def test_two_values(self):
        m, w = td.build(np.array([1.0, 3.0]))
        assert td.quantile(m, w, 0.0) == 1.0
        assert td.quantile(m, w, 1.0) == 3.0
        assert 1.0 <= td.quantile(m, w, 0.5) <= 3.0

    def test_merge_with_empty_children(self):
        m, w = td.merge([td.build(np.array([])), td.build(np.array([1.0, 2.0]))])
        assert w.sum() == 2


class TestWeightedBuild:
    """build_weighted: the pre-aggregated entry point (round 12 — the
    tdigest entry counts duplicate values JVM-side so only the value
    domain crosses the Python boundary). The centroid LAYOUT may differ
    from build() on the expanded multiset (atomic weighted absorption
    vs unit points splitting at a k-budget boundary), but mass,
    determinism and the rank-error guarantee must hold, and estimates
    must track the exact-build estimates."""

    def test_mass_conserved_and_deterministic(self):
        rng = np.random.default_rng(5)
        vals = np.round(rng.normal(100, 15, 400), 1)
        uniq, cnt = np.unique(vals, return_counts=True)
        m1, w1 = td.build_weighted(uniq, cnt.astype(float))
        # shuffled input -> identical digest (sorted internally)
        perm = rng.permutation(len(uniq))
        m2, w2 = td.build_weighted(uniq[perm], cnt[perm].astype(float))
        assert np.array_equal(m1, m2) and np.array_equal(w1, w2)
        assert w1.sum() == len(vals)

    def test_rank_error_matches_guarantee(self):
        rng = np.random.default_rng(11)
        vals = np.round(rng.exponential(50, 20000), 0)  # heavy duplication
        uniq, cnt = np.unique(vals, return_counts=True)
        m, w = td.build_weighted(uniq, cnt.astype(float))
        xs = np.sort(vals)
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            est = td.quantile(m, w, q)
            rank = (np.searchsorted(xs, est, "left")
                    + np.searchsorted(xs, est, "right")) / (2 * len(xs))
            assert abs(rank - q) <= 0.02, (q, est, rank)

    def test_estimates_track_unit_build(self):
        rng = np.random.default_rng(23)
        vals = np.round(rng.normal(0, 1, 5000), 2)
        uniq, cnt = np.unique(vals, return_counts=True)
        mw_w = td.build_weighted(uniq, cnt.astype(float))
        mw_u = td.build(vals)
        spread = vals.max() - vals.min()
        for q in (0.05, 0.5, 0.95):
            assert abs(td.quantile(*mw_w, q) - td.quantile(*mw_u, q)) <= 0.02 * spread

    def test_empty_and_single_point(self):
        m, w = td.build_weighted(np.array([]), np.array([]))
        assert len(m) == 0
        m, w = td.build_weighted(np.array([3.0]), np.array([250.0]))
        assert td.quantile(m, w, 0.5) == 3.0
        assert w.sum() == 250.0


class TestScalarKPathBitIdentity:
    """r12 optimization: _merge_pass evaluates k once per input point,
    so it uses a scalar fast path (np.arcsin on a Python float) instead
    of building a 1-element ndarray per point. These tests pin the two
    invariants that make that a pure speedup: numpy's float64 arcsin is
    bit-identical across its scalar and array code paths, and the whole
    pass is byte-identical to the array-at-a-time reference form."""

    def test_numpy_arcsin_scalar_equals_array_path(self):
        xs = np.linspace(-1.0, 1.0, 40001)
        batch = np.arcsin(xs)  # array (SIMD) path
        scalar = np.array([float(np.arcsin(float(x))) for x in xs])
        assert np.array_equal(batch, scalar)

    def test_merge_pass_matches_array_reference(self):
        def reference(means, weights, delta):
            # the pre-r12 array-at-a-time form, verbatim
            total = float(weights.sum())
            out_m, out_w = [], []
            cur_m = float(means[0])
            cur_w = float(weights[0])
            q_left = 0.0
            k_left = float(td._k(np.array([0.0]), delta)[0])
            for i in range(1, len(means)):
                w = float(weights[i])
                q_right = (q_left * total + cur_w + w) / total
                if td._k(np.array([q_right]), delta)[0] - k_left <= 1.0:
                    cur_m += (means[i] - cur_m) * (w / (cur_w + w))
                    cur_w += w
                else:
                    out_m.append(cur_m)
                    out_w.append(cur_w)
                    q_left += cur_w / total
                    k_left = float(td._k(np.array([q_left]), delta)[0])
                    cur_m = float(means[i])
                    cur_w = w
            out_m.append(cur_m)
            out_w.append(cur_w)
            return np.array(out_m), np.array(out_w)

        rng = np.random.default_rng(77)
        for _ in range(10):
            n = int(rng.integers(2, 3000))
            v = np.sort(rng.normal(0, 100, n))
            w = rng.integers(1, 40, n).astype(np.float64)
            for delta in (50.0, 200.0):
                rm, rw = reference(v, w, delta)
                nm, nw = td._merge_pass(v, w, delta)
                assert np.array_equal(rm, nm)
                assert np.array_equal(rw, nw)
