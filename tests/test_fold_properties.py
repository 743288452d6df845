"""Adversarial-input tests for the round-9 column-space DP folds.

The catalog entries drive these folds only with md5-derived fixtures,
which can never produce the worst-case shapes the folds' correctness
arguments lean on (the region fold's 71-sweep convergence bound, tie
handling in the DTW/SW/Viterbi/Huffman recurrences). Each test here
feeds the module-level fold expression literal adversarial inputs and
compares against an independent pure-python reference — brute force
where feasible (Viterbi enumerates all 2^n state paths).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from virapipe_spark.queries.extensions import _huffman_fold_expr
from virapipe_spark.queries.genomics import (
    _SW_GAP,
    _SW_MATCH,
    _SW_MISMATCH,
    _sw_best_expr,
)
from virapipe_spark.queries.multimodal import (
    _dtw_dp_expr,
    _region_label_expr,
)
from virapipe_spark.queries.streaming import _VIT_BWD_EXPR, _VIT_FWD_EXPR


# ---------------------------------------------------------------------------
# Region labeling: the 71-sweep bound on adversarial grids
# ---------------------------------------------------------------------------


def _flood_labels(p: str) -> list[int]:
    """Min-pid 4-connected component labels by BFS flood fill."""
    fg = [ord(c) >= 97 for c in p]
    lab = [-1] * 72
    for start in range(72):
        if not fg[start] or lab[start] != -1:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            i = stack.pop()
            comp.append(i)
            r, c = divmod(i, 9)
            for j, ok in (
                (i - 1, c > 0),
                (i + 1, c < 8),
                (i - 9, r > 0),
                (i + 9, r < 7),
            ):
                if ok and fg[j] and j not in seen:
                    seen.add(j)
                    stack.append(j)
        m = min(comp)
        for i in comp:
            lab[i] = m
    return lab


def _serpentine() -> str:
    """A single snake-shaped region of 40 cells with graph diameter 39
    — the propagation worst case the fixture's sub-percolation density
    never produces (a min label must travel one cell per sweep)."""
    cells = set()
    for r in (0, 2, 4, 6):
        cells.update(r * 9 + c for c in range(9))
    cells.add(1 * 9 + 8)  # connector row0 -> row2 at the right edge
    cells.add(3 * 9 + 0)  # row2 -> row4 at the left edge
    cells.add(5 * 9 + 8)  # row4 -> row6 at the right edge
    return "".join("a" if i in cells else "0" for i in range(72))


_GRIDS = {
    "serpentine": _serpentine(),
    "full": "a" * 72,
    "empty": "0" * 72,
    "checkerboard": "".join(
        "a" if (i // 9 + i % 9) % 2 == 0 else "0" for i in range(72)
    ),
    # two blobs touching only diagonally: 4-connectivity must NOT merge
    "diag_blobs": "".join(
        "a" if i in {0, 1, 9, 10, 20, 21, 29, 30} else "0" for i in range(72)
    ),
    "single_row": "a" * 9 + "0" * 63,
}


def test_region_label_fold_matches_flood_fill_on_adversarial_grids(spark):
    rows = [(name, p) for name, p in sorted(_GRIDS.items())]
    got = {
        r["name"]: list(r["lab"])
        for r in spark.createDataFrame(rows, "name string, p string")
        .select("name", F.expr(_region_label_expr()).alias("lab"))
        .collect()
    }
    for name, p in _GRIDS.items():
        assert got[name] == _flood_labels(p), name


# ---------------------------------------------------------------------------
# DTW: tie-heavy series vs the sequential DP
# ---------------------------------------------------------------------------


def _dtw_ref(a: list[int], b: list[int]) -> int:
    n, m = len(a), len(b)
    INF = 1 << 60
    dp = [[INF] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                dp[i][j] = c
                continue
            best = INF
            if i > 0:
                best = min(best, dp[i - 1][j])
            if j > 0:
                best = min(best, dp[i][j - 1])
            if i > 0 and j > 0:
                best = min(best, dp[i - 1][j - 1])
            dp[i][j] = c + best
    return dp[n - 1][m - 1]


def test_dtw_fold_matches_sequential_dp_on_ties(spark):
    cases = [
        ([5] * 10, [5] * 10),  # every cost 0: ties everywhere
        (list(range(10)), list(range(9, -1, -1))),  # reversed ramps
        ([0, 9] * 5, [9, 0] * 5),  # alternating extremes
        ([1, 1, 2, 2, 3, 3, 4, 4, 5, 5], [1, 2, 3, 4, 5, 5, 4, 3, 2, 1]),
        ([0] * 5 + [100] * 5, [100] * 5 + [0] * 5),  # step functions
    ]
    rows = [(i, a, b) for i, (a, b) in enumerate(cases)]
    got = dict(
        spark.createDataFrame(
            rows, "id int, va array<bigint>, vb array<bigint>"
        )
        .select("id", F.expr(_dtw_dp_expr(10)).alias("dtw"))
        .collect()
    )
    for i, (a, b) in enumerate(cases):
        assert got[i] == _dtw_ref(a, b), (i, a, b)


# ---------------------------------------------------------------------------
# Smith-Waterman: tie-heavy sequences vs the sequential DP + argmax
# ---------------------------------------------------------------------------


def _sw_ref(a: str, b: str) -> tuple[int, int, int]:
    n, m = len(a), len(b)
    h = [[0] * (m + 1) for _ in range(n + 1)]
    best = None  # (-score, i, j) minimized = the entry's tie order
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = _SW_MATCH if a[i - 1] == b[j - 1] else _SW_MISMATCH
            h[i][j] = max(
                0,
                h[i - 1][j - 1] + s,
                h[i - 1][j] - _SW_GAP,
                h[i][j - 1] - _SW_GAP,
            )
            key = (-h[i][j], i - 1, j - 1)
            if best is None or key < best:
                best = key
    return (-best[0], best[1], best[2])


def test_sw_fold_matches_sequential_dp_on_ties(spark):
    cases = [
        ("AAAAAAAAAAAA", "AAAAAAAAAAAA"),  # all match: global ramp
        ("AAAAAAAAAAAA", "CCCCCCCCCCCC"),  # all mismatch: H stays 0
        ("ACACACACACAC", "CACACACACACA"),  # off-by-one repeats: many ties
        ("ACGTACGTACGT", "TGCATGCATGCA"),
        ("AAAACCCCGGGG", "GGGGCCCCAAAA"),
    ]
    rows = [(i, a, b) for i, (a, b) in enumerate(cases)]
    got = {
        r["id"]: (int(-r["b"]["nh"]), int(r["b"]["i"]), int(r["b"]["j"]))
        for r in spark.createDataFrame(
            rows, "id int, ha string, hb string"
        )
        .select("id", F.expr(_sw_best_expr(12)).alias("b"))
        .collect()
    }
    for i, (a, b) in enumerate(cases):
        assert got[i] == _sw_ref(a, b), (i, a, b)


# ---------------------------------------------------------------------------
# Viterbi: forward-backward vs brute-force path enumeration
# ---------------------------------------------------------------------------


def _vit_cases() -> list[list[tuple[int, int, int]]]:
    """(e_lo, e_hi, tau) per day; costs chosen to force exact ties."""
    return [
        [(0, 0, 1)] * 8,  # both states free every day: maximal ties
        [(0, 5, 2), (5, 0, 2)] * 4,  # alternating pull vs switch cost
        [(0, 1, 0)] * 6,  # zero switch cost: per-day argmin
        [(3, 3, 3)] * 5,  # total indifference
        [(0, 10, 1), (0, 10, 1), (10, 0, 1), (10, 0, 1), (0, 10, 1)],
        # NON-CONSTANT tau (r9 ADVICE): the old bwd fold read tau at
        # day d while fwd charged it at day d+1 — exprs that agree only
        # when tau is constant. These series vary tau per day so any
        # convention asymmetry diverges from brute force.
        [(0, 5, 1), (5, 0, 9), (0, 5, 1), (5, 0, 9), (0, 5, 1)],
        [(2, 0, 0), (0, 2, 7), (3, 3, 1), (0, 9, 4), (9, 0, 0), (1, 1, 6)],
        [(0, 1, 3), (1, 0, 0), (0, 1, 5), (1, 0, 2)],
    ]


def _vit_brute(days: list[tuple[int, int, int]]):
    n = len(days)
    best = None
    per_state = [[None, None] for _ in range(n)]  # min cost with day m in s
    for mask in range(1 << n):
        cost = 0
        for m in range(n):
            s = (mask >> m) & 1
            cost += days[m][s]
            if m and ((mask >> (m - 1)) & 1) != s:
                # tau read at day m — the LATER day of the m-1 -> m
                # transition, the convention both folds share
                cost += days[m][2]
        for m in range(n):
            s = (mask >> m) & 1
            if per_state[m][s] is None or cost < per_state[m][s]:
                per_state[m][s] = cost
        if best is None or cost < best:
            best = cost
    return best, per_state


def test_viterbi_folds_match_brute_force_on_ties(spark):
    schema = (
        "id int, a array<struct<d:bigint,day:bigint,x:bigint,"
        "e_lo:bigint,e_hi:bigint,tau:bigint>>"
    )
    cases = _vit_cases()
    rows = [
        (
            i,
            [
                (m, 100 + m, 0, lo, hi, tau)
                for m, (lo, hi, tau) in enumerate(days)
            ],
        )
        for i, days in enumerate(cases)
    ]
    got = {
        r["id"]: (r["f"], r["b"])
        for r in spark.createDataFrame(rows, schema)
        .select(
            "id",
            F.expr(_VIT_FWD_EXPR).alias("f"),
            F.expr(_VIT_BWD_EXPR).alias("b"),
        )
        .collect()
    }
    for i, days in enumerate(cases):
        opt, per_state = _vit_brute(days)
        f, b = got[i]
        for m in range(len(days)):
            c_lo = f[m]["f_lo"] + b[m]["b_lo"]
            c_hi = f[m]["f_hi"] + b[m]["b_hi"]
            # fwd+bwd through (m, s) is the best cost of any path
            # visiting state s at day m — brute force agrees per cell
            assert c_lo == per_state[m][0], (i, m, "lo")
            assert c_hi == per_state[m][1], (i, m, "hi")
            # and the per-day minimum collapses to the global optimum
            assert min(c_lo, c_hi) == opt, (i, m)


# ---------------------------------------------------------------------------
# Huffman: tie-heavy distributions vs the deterministic merge rule
# ---------------------------------------------------------------------------


def _huffman_ref(freqs: dict[str, int]) -> dict[str, int]:
    """The entry's exact rule: merge the two (sum, min-sym) lightest
    clusters, relabel to the smaller cluster id, depth = merges
    survived."""
    clusters = {s: ([s], f) for s, f in freqs.items()}
    lens = {s: 0 for s in freqs}
    while len(clusters) > 1:
        picked = sorted(
            clusters.items(), key=lambda kv: (kv[1][1], min(kv[1][0]))
        )[:2]
        (c1, (m1, f1)), (c2, (m2, f2)) = picked
        keep = min(c1, c2)
        drop = c2 if keep == c1 else c1
        for s in m1 + m2:
            lens[s] += 1
        clusters[keep] = (m1 + m2, f1 + f2)
        del clusters[drop]
    return lens


def _heapq_optimal_cost(freqs: dict[str, int]) -> int:
    import heapq

    h = sorted(freqs.values())
    heapq.heapify(h)
    cost = 0
    while len(h) > 1:
        a, b = heapq.heappop(h), heapq.heappop(h)
        cost += a + b
        heapq.heappush(h, a + b)
    return cost


def test_huffman_fold_on_tie_heavy_distributions(spark):
    syms = list("0123456789abcdef")
    cases = [
        {s: 7 for s in syms},  # all equal: every pick is a tie
        {s: 2**i for i, s in enumerate(syms)},  # powers of two: a chain
        {s: (1 if s != "f" else 10**6) for s in syms},  # one dominant
        {s: (i % 3 + 1) for i, s in enumerate(syms)},  # small repeats
    ]
    rows = [
        (i, sorted((s, f) for s, f in d.items())) for i, d in enumerate(cases)
    ]
    got = {
        r["id"]: {z["sym"]: z["len"] for z in r["out"]}
        for r in spark.createDataFrame(
            rows, "id int, s0 array<struct<sym:string,f:bigint>>"
        )
        .select("id", F.expr(_huffman_fold_expr(15)).alias("out"))
        .collect()
    }
    for i, d in enumerate(cases):
        lens = got[i]
        assert lens == _huffman_ref(d), i
        # Kraft equality: a complete prefix code sums 2^-len to exactly 1
        assert sum(2 ** (20 - l) for l in lens.values()) == 2**20, i
        # optimality: weighted length equals the heapq Huffman cost
        assert sum(d[s] * l for s, l in lens.items()) == _heapq_optimal_cost(
            d
        ), i
