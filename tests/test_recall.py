"""Recall measurements for the approximate operators against their exact
baselines — the docstrings promise these relationships; this file holds
them to it. Run at sf0.01 (500 docs / 500 vectors): big enough for
non-trivial pair sets, small enough for test runtime."""

from __future__ import annotations

import pytest

from virapipe_spark import catalog

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module", autouse=True)
def _load():
    catalog.load_all()


def test_minhash_recall_vs_exact_jaccard(spark):
    """Every exact-Jaccard >= 0.5 pair should surface from MinHash-LSH
    with probability 1-(1-j^R)^B (= 0.90 at j=0.5 for 8 bands x 2 rows,
    higher for j > 0.5). Assert recall >= 0.6 — far above chance, with
    slack for the probabilistic misses the band curve allows."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in catalog.QUERIES["docs_ngram_jaccard"](spark, SF_DIR).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"])
        for r in catalog.QUERIES["docs_minhash_lsh"](spark, SF_DIR).collect()
    }
    assert exact, "exact near-dup set is empty — recall test is vacuous"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"MinHash recall {recall:.2f} vs exact pairs"


def test_ann_recall_and_multiprobe_dominance(spark):
    """LSH top-k recall vs brute force, and the multi-probe guarantee:
    probing strictly more buckets can only improve (or tie) recall."""

    def neighbor_sets(name):
        out: dict[int, set[int]] = {}
        for r in catalog.QUERIES[name](spark, SF_DIR).collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = neighbor_sets("embed_knn_bruteforce")
    lsh = neighbor_sets("embed_knn_lsh")
    multi = neighbor_sets("embed_knn_multiprobe")

    def recall(approx):
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        return hits / total

    r_lsh, r_multi = recall(lsh), recall(multi)
    pq = neighbor_sets("embed_knn_pq")
    # IVF-PQ reranks an ADC shortlist drawn from the same probed cells
    # as embed_knn_ivf; with the deterministic 16-codeword codebook it
    # measured 0.54 at sf0.01 (vs IVF's 0.80 — ADC shortlist misses are
    # the expected PQ loss). Pin well below the measurement so data
    # regeneration noise can't flake it, but far above the ~8% random
    # floor; and every query must return a full result.
    r_pq = recall(pq)
    assert r_pq >= 0.3, f"IVF-PQ recall collapsed: {r_pq:.2f}"
    assert set(pq) == set(exact) and all(len(v) > 0 for v in pq.values())
    # single-bucket LSH on 64 buckets sees ~1/64 of the corpus: any
    # overlap with the true top-5 is signal; assert it beats the ~8%
    # random-candidate floor and that multiprobe does not regress it
    assert r_multi >= r_lsh, (r_lsh, r_multi)
    assert r_multi > 0.0
    # every query must still produce a full top-k from its buckets
    assert all(len(v) > 0 for v in multi.values())


class TestPowerIterationDirection:
    def test_faithful_to_float_power_iteration(self, spark):
        """The integer-rescaled iterate must be direction-identical to
        EXACT float power iteration (numpy G²·1) on the real corpus —
        proving the integer rescaling loses nothing — even though this
        near-isotropic corpus (lambda2/lambda1 ~ 0.93 at sf0.001) is
        too flat for 2 rounds to reach the eigenvector (documented on
        the entry)."""
        import numpy as np

        from virapipe_spark.queries.staged import STAGED_R7

        fn, _ = STAGED_R7["embed_power_iteration"]
        rows = sorted(
            fn(spark, "/root/testdata/sf0.001").collect(),
            key=lambda r: r["d"],
        )
        v2 = np.array([r["v2"] for r in rows], float)
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            "'/root/testdata/sf0.001/embeddings.parquet'"
        )
        q = con.execute(
            "SELECT list_transform(embedding, x -> "
            "CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) "
            "FROM embeddings"
        ).fetchall()
        X = np.array([r[0] for r in q], float)
        G = X.T @ X
        u2 = G @ (G @ np.ones(G.shape[0]))
        cos = abs(v2 @ u2) / (np.linalg.norm(v2) * np.linalg.norm(u2))
        assert cos > 0.999999, cos

    def test_converges_on_anisotropic_fixture(self, spark):
        """When a dominant direction EXISTS (the ABTT premise), two
        rounds of the PRODUCTION step code recover it: a random cloud
        plus a strong injected common direction, run through
        _gram/_pi_step, must align with numpy's top eigenvector."""
        import numpy as np
        from pyspark.sql import functions as F

        from virapipe_spark.queries.extensions import _gram, _pi_step

        rng = np.random.RandomState(3)
        d, n = 16, 200
        common = rng.randn(d)
        common /= np.linalg.norm(common)
        X = rng.randint(-2000, 2000, (n, d)).astype(float)
        X += np.outer(rng.uniform(3.0, 5.0, n) * 4000, common)
        X = np.round(X)
        dims = spark.createDataFrame(
            [
                (int(i), int(j + 1), int(X[i, j]))
                for i in range(n)
                for j in range(d)
            ],
            "vec_id LONG, d LONG, qv LONG",
        )
        gram = _gram(dims)
        v0 = (
            gram.select(F.col("d1").alias("vd"))
            .distinct()
            .withColumn("v", F.lit(1).cast("long"))
        )
        v2_rows = _pi_step(gram, _pi_step(gram, v0, 10000), 1000).collect()
        v2 = np.array(
            [r["v"] for r in sorted(v2_rows, key=lambda r: r["vd"])], float
        )
        G = X.T @ X
        w, V = np.linalg.eigh(G)
        top = V[:, np.argmax(w)]
        cos = abs(v2 @ top) / (np.linalg.norm(v2) * np.linalg.norm(top))
        assert cos > 0.99, cos

    def test_driver_direction_matches_distributed_chain(self, spark):
        """r12 optimization twin: _power_direction (driver-side PI on
        the collected Gram — what embed_knn_abtt / embed_abtt_residual
        now run) must be BIT-IDENTICAL to chaining _pi_step, including
        the trunc-toward-zero rescale on negative components and the
        double-division scale derivation."""
        import numpy as np
        from pyspark.sql import functions as F

        from virapipe_spark.queries.extensions import (
            _gram,
            _pi_step,
            _power_direction,
        )

        rng = np.random.RandomState(7)
        d, n = 16, 120
        X = rng.randint(-5000, 5000, (n, d))
        dims = spark.createDataFrame(
            [
                (int(i), int(j + 1), int(X[i, j]))
                for i in range(n)
                for j in range(d)
            ],
            "vec_id LONG, d LONG, qv LONG",
        )
        gram = _gram(dims)
        v0 = (
            gram.select(F.col("d1").alias("vd"))
            .distinct()
            .withColumn("v", F.lit(1).cast("long"))
        )
        v2_rows = _pi_step(gram, _pi_step(gram, v0, 10000), 1000).collect()
        want = {int(r["vd"]): int(r["v"]) for r in v2_rows}
        want_n2 = sum(v * v for v in want.values())
        got, got_n2 = _power_direction(
            _gram(dims, materialize=False), (10000, 1000)
        )
        assert got == want
        assert got_n2 == want_n2

    def test_arrow_gram_bit_equals_join_gram(self, spark):
        """r12 optimization twin: _gram_arrow (zero-join — each task
        matmuls its own Arrow batches, X.T @ X in exact int64, one
        dims^2 partial per task) must reproduce the join-form Gram over
        the REAL quantized table bit-for-bit — integer matmul and sums
        reassociate, so any difference is a bug, not tolerance."""
        from pyspark.sql import functions as F

        from virapipe_spark.queries.extensions import (
            _gram,
            _gram_arrow,
            _quantized,
        )

        sf = "/root/testdata/sf0.001"
        dims = (
            _quantized(spark, sf)
            .select("vec_id", F.posexplode("q").alias("pos", "qv"))
            .select("vec_id", (F.col("pos") + 1).alias("d"), "qv")
        )
        want = {
            (r["d1"], r["d2"]): r["g"]
            for r in _gram(dims, materialize=False).collect()
        }
        got = {
            (r["d1"], r["d2"]): r["g"]
            for r in _gram_arrow(spark, sf, materialize=False).collect()
        }
        assert got == want

    def test_arrow_pair_dot_bit_equals_hof(self, spark):
        """r13 optimization twin (VERDICT_r12 #5): _arrow_pair_dot's
        vectorized numpy dot must reproduce the interpreted-HOF
        zip_with+aggregate dot over ALL pairs of the REAL quantized
        table bit-for-bit — int64 sums of int64 products reassociate,
        so any difference is a layout bug, not tolerance."""
        from pyspark.sql import functions as F

        from virapipe_spark.queries.extensions import (
            _arrow_pair_dot,
            _quantized,
        )

        sf = "/root/testdata/sf0.001"
        qdf = _quantized(spark, sf)
        a, b = qdf.alias("a"), qdf.alias("b")
        pairs = a.join(
            b, F.col("a.vec_id") < F.col("b.vec_id")
        ).select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.q").alias("qa"),
            F.col("b.q").alias("qb"),
            F.col("a.qnorm").alias("na"),
            F.col("b.qnorm").alias("nb"),
        )
        hof = F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        want = {
            (r["vec_a"], r["vec_b"]): r["dot"]
            for r in pairs.select(
                "vec_a", "vec_b", hof.alias("dot")
            ).collect()
        }
        got = {
            (r["vec_a"], r["vec_b"]): r["dot"]
            for r in _arrow_pair_dot(pairs).collect()
        }
        assert got == want and got

    def test_arrow_lloyd_assign_bit_equals_hof(self, spark):
        """r12 optimization twin: the Lloyd assignment's mapInArrow
        numpy argmin (exact int64 squared-L2, first-minimum over
        cid-ascending centroids) must reproduce the old interpreted-HOF
        array_min(struct(dist, cid)) assignment row-for-row on the REAL
        quantized table, INCLUDING the trained (not just seed)
        centroids — integer arithmetic both sides, so any difference is
        a tie-break or layout bug, not tolerance."""
        from pyspark.sql import functions as F

        from virapipe_spark.queries.extensions import (
            _lloyd_train_assign,
            _quantized,
        )

        sf = "/root/testdata/sf0.001"
        final, c2_tbl = _lloyd_train_assign(spark, sf)
        got = {r["vec_id"]: r["cid"] for r in final.collect()}

        # the pre-r12 HOF form, verbatim, over the same trained c2
        qdf = _quantized(spark, sf).select("vec_id", "q")
        cents_row = c2_tbl.groupBy().agg(
            F.collect_list(F.struct("cid", "c")).alias("cents")
        )
        scored = F.transform(
            F.col("cents"),
            lambda s: F.struct(
                F.aggregate(
                    F.zip_with("q", s["c"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ).alias("dist"),
                s["cid"].alias("cid"),
            ),
        )
        want = {
            r["vec_id"]: r["cid"]
            for r in qdf.crossJoin(F.broadcast(cents_row))
            .select("vec_id", F.array_min(scored)["cid"].alias("cid"))
            .collect()
        }
        assert got == want and len(got) > 0


class TestRandomProjectionJL:
    def test_distortion_bounded_on_real_pairs(self, spark):
        """Independent JL check (honest-claims rule): the catalog entry
        hash-checks the exact projection arithmetic; THIS test checks
        the claim that the +-1 projection preserves pairwise geometry —
        numpy recomputes the projection from the same md5 signs and
        measures squared-distance distortion over real embedding pairs
        against the 1/sqrt(k) JL scaling."""
        import hashlib

        import numpy as np

        from virapipe_spark import catalog
        from virapipe_spark.catalog import table
        from virapipe_spark.queries.extensions import _QUANT, _RP_K

        catalog.load_all()
        sf = "/root/testdata/sf0.001"
        rows = (
            table(spark, sf, "embeddings")
            .orderBy("vec_id")
            .limit(40)
            .collect()
        )
        X = np.array(
            [np.round(np.array(r["embedding"], float) * _QUANT) for r in rows]
        )
        d = X.shape[1]
        S = np.array(
            [
                [
                    1
                    if hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0] < "8"
                    else -1
                    for j in range(_RP_K)
                ]
                for i in range(1, d + 1)
            ],
            dtype=np.int64,
        )
        # spark's projection matches numpy exactly (same signs, ints)
        got = {
            (r["vec_id"], r["dim"]): r["y"]
            for r in catalog.QUERIES["embed_random_projection"](spark, sf)
            .filter("vec_id < 40")
            .collect()
        }
        Y = X @ S
        for vi, r in enumerate(rows):
            for j in range(_RP_K):
                assert got[(r["vec_id"], j)] == int(Y[vi, j])
        # JL geometry: median distortion of scaled pairwise sq-dists
        rng = np.random.default_rng(0)
        ratios = []
        for _ in range(200):
            a, b = rng.integers(0, len(X), 2)
            if a == b:
                continue
            dx = np.sum((X[a] - X[b]) ** 2)
            dy = np.sum((Y[a] - Y[b]) ** 2) / _RP_K
            if dx > 0:
                ratios.append(dy / dx)
        med = float(np.median(ratios))
        # E[ratio]=1; k=16 gives wide variance per pair but the median
        # over 200 pairs concentrates
        assert 0.6 < med < 1.6, med


class TestKcoreIndependent:
    def test_hand_graph_and_python_peel_agree(self, spark):
        """Honest-claims check for graph.kcore: a hand graph with a
        known 3-core, plus a pure-python peel on the catalog fixture
        (sf0.001) must produce the identical member set and degrees."""
        from collections import defaultdict

        from virapipe_spark import catalog
        from virapipe_spark.graph import kcore

        # triangle+tail: 3-core = the K4; tail nodes peel away
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        tail = [(3, 4), (4, 5)]
        und = k4 + tail
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], ["src", "dst"]
        )
        got = {r["node"]: r["d"] for r in kcore(edges, k=3).collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

        # catalog fixture: python peel to TRUE fixpoint == spark result
        catalog.load_all()
        sf = "/root/testdata/sf0.001"
        from virapipe_spark.catalog import table
        import pyspark.sql.functions as F

        li = (
            table(spark, sf, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        pairs = (
            li.alias("a")
            .join(
                li.alias("b"),
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("pa"),
                F.col("b.l_partkey").alias("pb"),
            )
        )
        und_rows = [
            (r["pa"], r["pb"])
            for r in pairs.groupBy("pa", "pb")
            .count()
            .filter("count >= 2")
            .collect()
        ]
        adj = defaultdict(set)
        for a, b in und_rows:
            adj[a].add(b)
            adj[b].add(a)
        nodes = set(adj)
        while True:
            drop = {
                n for n in nodes if sum(1 for m in adj[n] if m in nodes) < 2
            }
            if not drop:
                break
            nodes -= drop
        want = {
            n: sum(1 for m in adj[n] if m in nodes) for n in nodes
        }
        sym = spark.createDataFrame(
            und_rows + [(b, a) for a, b in und_rows], ["src", "dst"]
        )
        got = {r["node"]: r["d"] for r in kcore(sym, k=2).collect()}
        assert got == want


class TestAlsIndependent:
    def test_half_step_solves_match_numpy_and_decrease(self, spark):
        """Honest-claims check for embed_als_factorize: (1) the entry's
        objective-decrease flags hold and the output is reproducible
        across runs; (2) one user's closed-form solve recomputed in
        numpy from the same ratings and deterministic init matches the
        distributed solve's objective behavior (the guarantee is the
        solve is EXACT per subproblem)."""
        from virapipe_spark import catalog
        from virapipe_spark.queries import staged as st

        catalog.load_all()
        st.promote_r8()
        try:
            sf = "/root/testdata/sf0.001"
            row = catalog.QUERIES["embed_als_factorize"](spark, sf).collect()[0]
            assert row["u_step_ok"] and row["v_step_ok"]
            assert row["obj_after_v"] <= row["obj_after_u"] <= row["obj_init"]
            assert row["rmse"] > 0
            row2 = catalog.QUERIES["embed_als_factorize"](spark, sf).collect()[0]
            assert row.asDict() == row2.asDict()
        finally:
            from virapipe_spark.queries.staged import STAGED_R8

            for n in STAGED_R8:
                catalog.QUERIES.pop(n, None)
                catalog.ORACLES.pop(n, None)
            st.R8_PROMOTED = False

    def test_closed_form_solve_is_exact_for_its_subproblem(self):
        """The per-key ridge solve minimizes ||A x - r||^2 +
        lambda*n*||x||^2 exactly: perturbing the numpy solution in any
        coordinate direction cannot improve the subproblem objective."""
        import numpy as np

        rng = np.random.default_rng(3)
        A = rng.normal(size=(9, 4))
        r = rng.normal(size=9)
        lam = 0.1
        G = A.T @ A + lam * len(r) * np.eye(4)
        x = np.linalg.solve(G, A.T @ r)

        def obj(y):
            return float(((A @ y - r) ** 2).sum() + lam * len(r) * (y**2).sum())

        base = obj(x)
        for d in range(4):
            for eps in (1e-3, -1e-3):
                y = x.copy()
                y[d] += eps
                assert obj(y) >= base


class TestLabelPropagationIndependent:
    def test_hand_graph_and_python_lpa_agree(self, spark):
        """Honest-claims check for graph.label_propagation: a hand
        graph of two triangles joined by one bridge edge (the textbook
        two-community fixture), plus a pure-python synchronous LPA
        with the identical argmax rule must reproduce the Spark labels
        round-for-round on a random-ish fixture."""
        from collections import Counter, defaultdict

        from virapipe_spark.graph import label_propagation

        tri1 = [(0, 1), (1, 2), (0, 2)]
        tri2 = [(3, 4), (4, 5), (3, 5)]
        und = tri1 + tri2 + [(2, 3)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], ["src", "dst"]
        )
        got = {
            r["node"]: r["lbl"]
            for r in label_propagation(edges, rounds=4).collect()
        }
        # two communities, each labeled by its min member
        assert got[0] == got[1] == got[2]
        assert got[3] == got[4] == got[5]

        # python twin with the same deterministic rule, same rounds
        def py_lpa(und_edges, rounds):
            adj = defaultdict(list)
            for a, b in und_edges:
                adj[a].append(b)
                adj[b].append(a)
            lbl = {n: n for n in adj}
            for _ in range(rounds):
                new = {}
                for n in adj:
                    c = Counter(lbl[m] for m in adj[n])
                    best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
                    new[n] = best[0]
                lbl = new
            return lbl

        import random

        rng = random.Random(7)
        rand_und = list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(30), rng.randrange(30)) for _ in range(60)
                )
                if a != b
            }
        )
        redges = spark.createDataFrame(
            rand_und + [(b, a) for a, b in rand_und], ["src", "dst"]
        )
        got = {
            r["node"]: r["lbl"]
            for r in label_propagation(redges, rounds=4).collect()
        }
        assert got == py_lpa(rand_und, 4)


class TestR8EntryIndependent:
    """Pure-python / numpy twins for the continuation-batch entries
    whose oracles mirror the same construction (honest-claims rule)."""

    def test_dhash_band_pigeonhole_guarantee(self):
        """Any pair at Hamming distance <= 3 MUST share at least one of
        the four 16-bit bands (pigeonhole: 3 flipped bits cannot touch
        4 bands) — the recall guarantee the banding join relies on.
        Checked exhaustively-ish over random 64-bit pairs."""
        import random

        rng = random.Random(11)
        for _ in range(500):
            h = rng.getrandbits(64)
            flip = rng.sample(range(64), rng.randint(0, 3))
            g = h
            for b in flip:
                g ^= 1 << b
            bands_h = [(h >> (16 * i)) & 0xFFFF for i in range(4)]
            bands_g = [(g >> (16 * i)) & 0xFFFF for i in range(4)]
            assert any(a == b for a, b in zip(bands_h, bands_g))

    def test_dhash_udf_matches_python(self, spark):
        """The mapInPandas dhash on a hand-built BMP equals a pure
        python dHash of the same pixel grid."""
        import numpy as np

        from virapipe_spark import multimodal as mm

        rng = np.random.default_rng(3)
        g = rng.integers(0, 255, (8, 9), dtype=np.uint8)
        bmp = mm.encode_bmp(np.stack([g, g, g], axis=-1))
        media = spark.createDataFrame([(1, bytearray(bmp))], "media_id long, data binary")
        row = mm.dhash_images(media).collect()[0]
        bits = [
            1 if g[r][c] < g[r][c + 1] else 0
            for r in range(8)
            for c in range(8)
        ]
        lo = sum(b << i for i, b in enumerate(bits[:32]))
        hi = sum(b << i for i, b in enumerate(bits[32:]))
        assert (row["dhash_hi"], row["dhash_lo"]) == (hi, lo)

    def test_attribution_hamilton_credit_sums(self):
        """U-shape credit closes to exactly 1e6 ppm for every touch
        count — the pure arithmetic the entry's conv_total_ok column
        certifies distributedly."""
        for n in range(1, 50):
            if n == 1:
                credits = [1000000]
            elif n == 2:
                credits = [500000, 500000]
            else:
                base, rem = divmod(200000, n - 2)
                credits = (
                    [400000]
                    + [base + (1 if i <= rem else 0) for i in range(1, n - 1)]
                    + [400000]
                )
            assert sum(credits) == 1000000, n

    def test_twap_matches_python(self, spark):
        """events_twap_user on sf0.001 equals a pure-python step
        integration over the same (ts, event_id)-ordered points."""
        from collections import defaultdict

        from virapipe_spark.catalog import table
        from virapipe_spark.queries.streaming import events_twap_user
        import pyspark.sql.functions as F

        sf = "/root/testdata/sf0.001"
        pts = defaultdict(list)
        for r in (
            table(spark, sf, "events")
            .select(
                "user_id",
                F.unix_micros("ts").alias("us"),
                "event_id",
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
            .collect()
        ):
            pts[r["user_id"]].append((r["us"], r["event_id"], r["cents"]))
        want = {}
        for u, rows in pts.items():
            rows.sort()
            num = den = 0
            for (us, _, c), (us2, _, _) in zip(rows, rows[1:]):
                num += c * (us2 - us)
                den += us2 - us
            if den:
                want[u] = (num, den)
        got = {
            r["user_id"]: (r["weighted_sum"], r["held_total_us"])
            for r in events_twap_user(spark, sf).collect()
        }
        assert got == want

    def test_histogram_median_matches_numpy(self, spark):
        """The bucketed two-pass median equals numpy's lower median of
        the raw per-flag values."""
        import numpy as np

        from virapipe_spark.catalog import table
        from virapipe_spark.queries.relational import (
            lineitem_histogram_median,
        )
        import pyspark.sql.functions as F

        sf = "/root/testdata/sf0.001"
        rows = (
            table(spark, sf, "lineitem")
            .select(
                F.col("l_returnflag").alias("flag"),
                F.round(F.col("l_extendedprice") * 100)
                .cast("long")
                .alias("cents"),
            )
            .collect()
        )
        by = {}
        for r in rows:
            by.setdefault(r["flag"], []).append(r["cents"])
        want = {}
        for fl, vs in by.items():
            vs.sort()
            want[fl] = vs[(len(vs) + 1) // 2 - 1]  # lower median
        got = {
            r["flag"]: r["median_cents"]
            for r in lineitem_histogram_median(spark, sf).collect()
        }
        assert got == want

    def test_kaplan_meier_matches_python(self, spark):
        """events_kaplan_meier vs a pure-python KM estimator over the
        same censored durations (sf0.001) — risk sets, hazards, and
        the survival curve to 4dp."""
        from collections import Counter

        from virapipe_spark.catalog import table
        from virapipe_spark.queries.streaming import (
            _DAY_US,
            _KM_HORIZON_D,
            events_kaplan_meier,
        )
        import pyspark.sql.functions as F

        sf = "/root/testdata/sf0.001"
        ev = table(spark, sf, "events").select(
            "user_id", "event_type", F.unix_micros("ts").alias("us")
        ).collect()
        s, p = {}, {}
        for r in ev:
            if r["event_type"] == "signup":
                s[r["user_id"]] = min(s.get(r["user_id"], r["us"]), r["us"])
        for r in ev:
            if (
                r["event_type"] == "purchase"
                and r["user_id"] in s
                and r["us"] > s[r["user_id"]]
            ):
                p[r["user_id"]] = min(p.get(r["user_id"], r["us"]), r["us"])
        durs = []
        for u, su in s.items():
            if u in p and (p[u] - su) // _DAY_US < _KM_HORIZON_D:
                durs.append(((p[u] - su) // _DAY_US, True))
            else:
                durs.append((_KM_HORIZON_D, False))
        d = Counter(t for t, e in durs if e)
        c = Counter(t for t, e in durs if not e)
        times = sorted(set(d) | set(c))
        want = {}
        surv = 1.0
        for t in times:
            n = sum(1 for tu, _ in durs if tu >= t)
            surv *= 1.0 - d[t] / n
            want[t] = (n, d[t], c[t], round(surv, 4))
        got = {
            r["t_days"]: (
                r["n_at_risk"],
                r["n_events"],
                r["n_censored"],
                r["survival"],
            )
            for r in events_kaplan_meier(spark, sf).collect()
        }
        assert got == want


class TestSsspIndependent:
    def test_hand_graph_and_python_dijkstra_agree(self, spark):
        """Honest-claims check for graph.sssp: a hand graph with known
        distances, plus a pure-python Dijkstra on a derived fixture
        must produce the identical distance map (the Bellman-Ford loop
        and Dijkstra agree at the fixpoint for non-negative
        weights)."""
        import heapq

        from virapipe_spark.graph import sssp

        # hand graph: shortcut via 2 beats the direct heavy edge
        wedges = [(0, 1, 10), (0, 2, 1), (2, 1, 2), (1, 3, 1), (2, 3, 9)]
        edges = spark.createDataFrame(wedges, ["src", "dst", "w"])
        seeds = spark.createDataFrame([(0,)], ["node"])
        got = {
            r["node"]: r["dist"]
            for r in sssp(edges, seeds, max_rounds=10).collect()
        }
        assert got == {0: 0, 1: 3, 2: 1, 3: 4}

        # deterministic pseudo-random sparse graph, multi-source
        rows = [
            (a, (a * 7 + i * 13) % 50, (a + i) % 9 + 1)
            for a in range(50)
            for i in range(3)
            if a != (a * 7 + i * 13) % 50
        ]
        seeds_py = [n for n in range(50) if n % 17 == 0]
        adj: dict[int, list[tuple[int, int]]] = {}
        for s, d, w in rows:
            adj.setdefault(s, []).append((d, w))
        dist_py: dict[int, int] = {s: 0 for s in seeds_py}
        heap = [(0, s) for s in seeds_py]
        heapq.heapify(heap)
        while heap:
            du, u = heapq.heappop(heap)
            if du > dist_py.get(u, 1 << 62):
                continue
            for v, w in adj.get(u, []):
                nd = du + w
                if nd < dist_py.get(v, 1 << 62):
                    dist_py[v] = nd
                    heapq.heappush(heap, (nd, v))
        edges2 = spark.createDataFrame(rows, ["src", "dst", "w"])
        seeds2 = spark.createDataFrame([(s,) for s in seeds_py], ["node"])
        got2 = {
            r["node"]: r["dist"]
            for r in sssp(edges2, seeds2, max_rounds=30).collect()
        }
        assert got2 == dist_py


class TestBipartiteFinishIndependent:
    def test_driver_closure_equals_distributed_composition(self, spark):
        """r12 optimization twin: graph_bipartite_check's driver-side
        closure (_bipartite_finish on the collected domain-bounded edge
        list) must equal the pre-r12 distributed composition (doubling
        CC + capped frontier BFS + the conflict aggregate, graph.py)
        row-for-row on REAL data — all-integer output, so any
        difference is a semantics bug, not tolerance."""
        from pyspark.sql import functions as F

        from virapipe_spark import catalog
        from virapipe_spark.graph import (
            bfs_hops,
            connected_components_doubling,
        )
        from virapipe_spark.queries import staged as st
        from virapipe_spark.queries.relational import _order_pair_counts

        catalog.load_all()
        # suite-order robustness: promote the staged-r9 generation on
        # demand and restore prior state (the ALS-twin cleanup idiom)
        promoted_here = not st.R9_PROMOTED
        if promoted_here:
            st.promote_r9()
        try:
            sf = "/root/testdata/sf0.001"
            got = sorted(
                tuple(r)
                for r in catalog.QUERIES["graph_bipartite_check"](
                    spark, sf
                ).collect()
            )
        finally:
            if promoted_here:
                from virapipe_spark.queries.staged import STAGED_R9

                for n in STAGED_R9:
                    catalog.QUERIES.pop(n, None)
                    catalog.ORACLES.pop(n, None)
                st.R9_PROMOTED = False

        # the pre-r12 distributed form, verbatim
        li = (
            catalog.table(spark, sf, "lineitem")
            .select("l_orderkey", "l_partkey")
            .filter(F.col("l_partkey") < 600)
        )
        e = (
            _order_pair_counts(li)
            .filter(F.col("support") >= 2)
            .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
        )
        nodes = (
            e.select(F.col("a").alias("node"))
            .union(e.select(F.col("b").alias("node")))
            .distinct()
        )
        comp = connected_components_doubling(
            e, nodes, node_col="node", label_col="comp"
        ).select("node", F.col("comp").cast("long").alias("comp"))
        roots = comp.filter(F.col("node") == F.col("comp")).select("node")
        sym = e.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionAll(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        dist = bfs_hops(sym, roots, max_hops=24).select(
            "node", F.col("dist").cast("long").alias("d")
        )
        marked = (
            e.join(comp.withColumnRenamed("node", "a"), "a")
            .join(
                dist.select(F.col("node").alias("a"), F.col("d").alias("da")),
                "a",
            )
            .join(
                dist.select(F.col("node").alias("b"), F.col("d").alias("db")),
                "b",
            )
            .select(
                "comp",
                "a",
                "b",
                F.when(F.col("da") == F.col("db"), F.lit(1))
                .otherwise(F.lit(0))
                .alias("conflict"),
            )
        )
        nstat = (
            comp.join(dist, "node")
            .groupBy("comp")
            .agg(
                F.count("*").cast("long").alias("n_nodes"),
                F.max("d").cast("long").alias("max_dist"),
            )
        )
        want = sorted(
            tuple(r)
            for r in nstat.join(marked, "comp")
            .groupBy("comp", "n_nodes", "max_dist")
            .agg(
                F.count("a").cast("long").alias("n_edges"),
                F.sum("conflict").cast("long").alias("n_conflicts"),
                F.when(F.sum("conflict") == 0, F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("is_bipartite"),
            )
            .collect()
        )
        assert got == want and len(got) > 0

    def test_finish_semantics_on_constructed_graphs(self):
        """The three semantics the hop-capped oracle pins: odd cycle
        (conflict), even cycle (bipartite), and the >24-hop tail —
        nodes beyond the cap vanish from dist, edges touching them
        vanish from the audit, and a component whose every edge is
        dropped vanishes entirely."""
        from virapipe_spark.queries.relational import _bipartite_finish

        # triangle (odd cycle): 1 conflict edge, not bipartite
        assert _bipartite_finish([(1, 2), (1, 3), (2, 3)]) == [
            (1, 3, 1, 3, 1, 0)
        ]
        # square (even cycle): bipartite
        assert _bipartite_finish([(1, 2), (1, 4), (2, 3), (3, 4)]) == [
            (1, 4, 2, 4, 0, 1)
        ]
        # path of 30 edges from the root: nodes at d>24 are absent, so
        # n_nodes=25 (d 0..24), and the 5 edges fully/partially beyond
        # the horizon drop (edge (24,25) survives? no: node 25 has
        # d=25 -> absent -> edge dropped), leaving 24 edges
        chain = [(i, i + 1) for i in range(31)]
        assert _bipartite_finish(chain) == [(0, 25, 24, 24, 0, 1)]
        # two components, one entirely beyond nothing (both small):
        # output is per-component and sorted by comp id
        two = [(1, 2), (10, 11), (10, 12), (11, 12)]
        assert _bipartite_finish(two) == [
            (1, 2, 1, 1, 0, 1),
            (10, 3, 1, 3, 1, 0),
        ]


class TestSsspFinishIndependent:
    def test_driver_closure_equals_distributed_composition(self, spark):
        """r12 optimization twin: graph_sssp_weighted's driver-side
        closure (_sssp_finish on the collected domain-bounded pair
        list) must equal the pre-r12 distributed composition
        (frontier-limited graph.sssp + the min_ok certification)
        row-for-row on REAL data."""
        from pyspark.sql import functions as F

        from virapipe_spark import catalog
        from virapipe_spark.graph import sssp
        from virapipe_spark.queries import staged as st

        catalog.load_all()
        # suite-order robustness: an earlier test may have de-promoted
        # the staged-r8 generation (the ALS twin's cleanup idiom) —
        # promote on demand and restore the prior state afterwards
        promoted_here = not st.R8_PROMOTED
        if promoted_here:
            st.promote_r8()
        try:
            sf = "/root/testdata/sf0.001"
            got = sorted(
                tuple(r)
                for r in catalog.QUERIES["graph_sssp_weighted"](
                    spark, sf
                ).collect()
            )
        finally:
            if promoted_here:
                from virapipe_spark.queries.staged import STAGED_R8

                for n in STAGED_R8:
                    catalog.QUERIES.pop(n, None)
                    catalog.ORACLES.pop(n, None)
                st.R8_PROMOTED = False

        # the pre-r12 distributed form, verbatim
        li = (
            catalog.table(spark, sf, "lineitem")
            .filter(F.col("l_partkey") < 2000)
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        und = (
            li.alias("a")
            .join(
                li.alias("b"),
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("pa"),
                F.col("b.l_partkey").alias("pb"),
            )
            .distinct()
        )
        w = (F.col("pa") + F.col("pb")) % 9 + 1
        edges = und.select(
            F.col("pa").alias("src"), F.col("pb").alias("dst"), w.alias("w")
        ).unionAll(
            und.select(
                F.col("pb").alias("src"), F.col("pa").alias("dst"), w.alias("w")
            )
        )
        seeds = edges.filter(F.col("src") % 97 == 0).select(
            F.col("src").alias("node")
        )
        dist = sssp(edges, seeds, max_rounds=10, checkpoint_every=3)
        best = (
            dist.alias("d")
            .join(edges.alias("e"), F.col("d.node") == F.col("e.src"))
            .groupBy(F.col("e.dst").alias("node"))
            .agg(F.min(F.col("d.dist") + F.col("e.w")).alias("best_in"))
        )
        want = sorted(
            tuple(r)
            for r in dist.join(best, "node", "left")
            .select(
                "node",
                F.col("dist").cast("long").alias("dist"),
                (
                    F.col("best_in").isNull()
                    | (F.col("best_in") >= F.col("dist"))
                ).alias("min_ok"),
            )
            .collect()
        )
        assert got == want and len(got) > 0

    def test_finish_round_cap_and_reference_bf(self):
        """_sssp_finish vs an independent dict-based synchronous
        Bellman-Ford on a deep chain (fixpoint depth > the 10-round
        cap: nodes beyond 10 edge-hops must stay ABSENT — the exact
        place a Dijkstra shortcut would silently diverge) and on a
        dense pseudo-random pair list."""
        from virapipe_spark.queries.relational import _sssp_finish

        def reference(und, rounds=10):
            sym = []
            for a, b in und:
                wt = (a + b) % 9 + 1
                sym.append((a, b, wt))
                sym.append((b, a, wt))
            dist = {n: 0 for n in {s for s, _, _ in sym} if n % 97 == 0}
            for _ in range(rounds):
                prev = dict(dist)
                for s, d, wt in sym:
                    if s in prev and prev[s] + wt < dist.get(d, 1 << 62):
                        dist[d] = min(
                            dist.get(d, 1 << 62), prev[s] + wt
                        )
                if dist == prev:
                    break
            best = {}
            for s, d, wt in sym:
                if s in dist:
                    best[d] = min(best.get(d, 1 << 62), dist[s] + wt)
            return sorted(
                (n, dv, best.get(n, 1 << 62) >= dv)
                for n, dv in dist.items()
            )

        chain = [(i, i + 1) for i in range(15)]  # seed 0 only; depth 15
        got = _sssp_finish(chain, n_bound=2000, rounds=10)
        want = reference(chain)
        assert got == want
        assert max(n for n, _, _ in got) == 10  # the cap bites

        dense = sorted(
            {
                (min(a, b), max(a, b))
                for i in range(400)
                for a, b in [((i * 37) % 150, (i * 91 + 13) % 150)]
                if a != b
            }
        )
        assert _sssp_finish(dense, n_bound=2000, rounds=10) == reference(
            dense
        )


class TestGreedyCoverageIndependent:
    def test_matches_python_greedy(self, spark):
        """Honest-claims check for docs_greedy_coverage: a pure-python
        greedy max-coverage over the same shingle sets must produce
        the identical pick transcript (both oracles greedy-select; this
        pins the semantics against a third, loop-free-of-SQL
        implementation)."""
        from virapipe_spark.queries.extensions import (
            _GC_ROUNDS,
            docs_greedy_coverage,
        )

        sf = "/root/testdata/sf0.001"
        import duckdb

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
        shingles = {}
        for doc_id, text in rows:
            t = text.split(" ")
            if len(t) >= 3:
                shingles[doc_id] = {
                    " ".join(t[g : g + 3]) for g in range(len(t) - 2)
                }
        covered: set = set()
        picked: set = set()
        want = []
        total = 0
        for rnd in range(1, _GC_ROUNDS + 1):
            best = max(
                (
                    (len(s - covered), -doc_id)
                    for doc_id, s in shingles.items()
                    if doc_id not in picked
                ),
            )
            marginal, doc_id = best[0], -best[1]
            covered |= shingles[doc_id]
            picked.add(doc_id)
            total += marginal
            want.append((rnd, doc_id, marginal, total))
        got = [
            (r["round"], r["doc_id"], r["marginal"], r["covered_total"])
            for r in docs_greedy_coverage(spark, sf)
            .orderBy("round")
            .collect()
        ]
        assert got == want
        assert total == len(covered)


class TestFingerprintSensitivity:
    def test_single_edit_flips_exactly_one_bucket(self, spark):
        """Claims check for lineitem_bucket_fingerprint: editing ONE
        row's value changes exactly one bucket's digest (and no
        counts); duplicating a row changes exactly one bucket's count
        even when XOR cancels (the companion-column rationale)."""
        from pyspark.sql import functions as F

        def fp(df):
            row_str = F.concat_ws("|", "k", "v")
            h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast(
                "long"
            )
            rows = (
                df.select(h.alias("h"))
                .groupBy((F.col("h") % 256).alias("bucket"))
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.expr("bit_xor(h)").cast("long").alias("x"),
                )
                .collect()
            )
            return {r["bucket"]: (r["n"], r["x"]) for r in rows}

        base = spark.createDataFrame(
            [(i, i * 7 % 100) for i in range(500)], ["k", "v"]
        )
        edited = spark.createDataFrame(
            [(i, i * 7 % 100 if i != 123 else -1) for i in range(500)],
            ["k", "v"],
        )
        a, b = fp(base), fp(edited)
        diff = {k for k in set(a) | set(b) if a.get(k) != b.get(k)}
        # the old and new row hash may land in 1 or 2 distinct buckets
        assert 1 <= len(diff) <= 2 and diff
        # duplicate one row twice (even multiplicity): XOR cancels,
        # count catches it
        dup = base.unionAll(
            spark.createDataFrame([(123, 123 * 7 % 100)] * 2, ["k", "v"])
        )
        c = fp(dup)
        diff2 = {k for k in set(a) | set(c) if a.get(k) != c.get(k)}
        assert len(diff2) == 1
        (k2,) = diff2
        assert c[k2][1] == a[k2][1] and c[k2][0] == a[k2][0] + 2


class TestAutocorrIndependent:
    def test_matches_numpy_acf(self, spark):
        """Honest-claims check for events_autocorr_daily: numpy's
        float ACF on the same daily series must agree to 6 dp with the
        integer-exact num/den construction."""
        import duckdb
        import numpy as np

        from virapipe_spark.queries.streaming import events_autocorr_daily

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
        )
        rows = con.execute(
            """SELECT CAST(floor(epoch_us(ts)/86400000000) AS BIGINT) d,
                      count(*) FROM events GROUP BY d ORDER BY d"""
        ).fetchall()
        days = {d: n for d, n in rows}
        ds = sorted(days)
        assert ds == list(range(ds[0], ds[0] + len(ds))), "gap in days"
        x = np.array([days[d] for d in ds], dtype=float)
        c = x - x.mean()
        den = float((c * c).sum())
        got = {
            r["k"]: (r["acf"], r["n_pairs"])
            for r in events_autocorr_daily(spark, sf).collect()
        }
        for k in range(1, 8):
            want = float((c[:-k] * c[k:]).sum()) / den
            assert abs(got[k][0] - round(want, 6)) <= 1e-6, (k, got[k], want)
            assert got[k][1] == len(x) - k


class TestBootstrapIndependent:
    def test_matches_python_hashlib_bootstrap(self, spark):
        """Honest-claims check for events_bootstrap_ci: a pure-python
        bootstrap using hashlib.md5 for the same (b, i) draws must
        reproduce the identical percentile bracket."""
        import hashlib

        import duckdb

        from virapipe_spark.queries.streaming import (
            _BOOT_B,
            events_bootstrap_ci,
        )

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
        )
        xs = [
            n
            for _, n in con.execute(
                """SELECT CAST(floor(epoch_us(ts)/86400000000) AS BIGINT) d,
                          count(*) FROM events GROUP BY d ORDER BY d"""
            ).fetchall()
        ]
        n = len(xs)
        sums = []
        for b in range(1, _BOOT_B + 1):
            s = 0
            for i in range(n):
                h = hashlib.md5(f"{b}_{i}".encode()).hexdigest()
                s += xs[int(h[:8], 16) % n]
            sums.append((s, b))
        sums.sort()
        lo = sums[_BOOT_B * 25 // 1000 - 1][0]
        hi = sums[_BOOT_B * 975 // 1000 - 1][0]
        row = events_bootstrap_ci(spark, sf).collect()[0]
        assert (row["lo_sum"], row["hi_sum"]) == (lo, hi)
        assert row["observed_sum"] == sum(xs) and row["n_days"] == n


class TestBoruvkaMSF:
    """Independent verification of the Borůvka forest (honest-claims
    rule for iterative operators): the SAME fixture's unique MSF
    recomputed by pure-python KRUSKAL with union-find — a third
    construction, sharing nothing with either the Spark Borůvka or the
    DuckDB cycle-property oracle."""

    def test_matches_kruskal_exactly(self, spark):
        import duckdb

        from virapipe_spark import catalog

        catalog.load_all()
        from virapipe_spark.queries.relational import graph_mst_boruvka

        sf = "/root/testdata/sf0.001"
        got = {
            (r.pa, r.pb, r.cost)
            for r in graph_mst_boruvka(spark, sf).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
        )
        edges = con.execute(
            """
            WITH pairs AS (
              SELECT a.l_partkey pa, b.l_partkey pb
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            und AS (SELECT pa, pb, count(*) s FROM pairs
                    GROUP BY pa, pb HAVING count(*) >= 2)
            SELECT pa, pb,
                   (1000000 // s) * 17179869184 + pa * 131072 + pb
            FROM und
            """
        ).fetchall()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        want = set()
        for pa, pb, cost in sorted(edges, key=lambda r: r[2]):
            ra, rb = find(pa), find(pb)
            if ra != rb:
                parent[ra] = rb
                want.add((pa, pb, cost))
        assert got == want
        # forest invariant: |MSF| = |V| - #components
        nodes = {v for e in edges for v in e[:2]}
        roots = {find(v) for v in nodes}
        assert len(got) == len(nodes) - len(roots)


class TestSoundexClassicVectors:
    """The Soundex rendering must reproduce the canonical NARA coding
    examples — pinning the ALGORITHM itself (the oracle gate only
    proves the two engines agree with each other)."""

    VECTORS = {
        "robert": "R163",
        "rupert": "R163",
        "ashcraft": "A261",
        "ashcroft": "A261",
        "tymczak": "T522",
        "pfister": "P236",
        "jackson": "J250",
        "washington": "W252",
        "lee": "L000",
        "gutierrez": "G362",
    }

    def test_duckdb_rendering_matches_nara(self):
        import duckdb

        from virapipe_spark.queries.relational import _soundex_sql

        con = duckdb.connect()
        vals = ", ".join(f"('{w}')" for w in self.VECTORS)
        rows = con.execute(
            f"SELECT word, {_soundex_sql('word')} FROM (VALUES {vals})"
            " t(word)"
        ).fetchall()
        got = dict(rows)
        assert got == self.VECTORS


class TestQueueWaitingIndependent:
    """Third construction for orders_queue_waiting: the literal
    SEQUENTIAL Lindley recurrence W(i) = max(0, W(i-1) + S(i-1) -
    (A(i) - A(i-1))) in pure python — proves the reflection-principle
    closed form the distributed version uses is the same function."""

    def test_matches_sequential_lindley(self, spark):
        import duckdb

        from virapipe_spark.queries.relational import orders_queue_waiting

        sf = "/root/testdata/sf0.001"
        got = {
            r.worker: (r.n_orders, r.max_wait, r.total_wait, r.wait_checksum)
            for r in orders_queue_waiting(spark, sf).collect()
        }
        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT o_orderkey % 8,
                   CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                        AS BIGINT) * 86400 + o_orderkey % 86400,
                   CAST(round(o_totalprice * 100) AS BIGINT) % 540 + 60,
                   o_orderkey
            FROM '{sf}/orders.parquet'
            """
        ).fetchall()
        per: dict[int, list] = {}
        for w, t, s, k in rows:
            per.setdefault(w, []).append((t, k, s))
        want = {}
        for w, lst in per.items():
            lst.sort()
            wait = 0
            prev_t = prev_s = None
            mx = tot = chk = 0
            for i, (t, _k, s) in enumerate(lst, start=1):
                if prev_t is not None:
                    wait = max(0, wait + prev_s - (t - prev_t))
                mx = max(mx, wait)
                tot += wait
                chk += wait * i
                prev_t, prev_s = t, s
            want[w] = (len(lst), mx, tot, chk)
        assert got == want


class TestIntervalSchedulingIndependent:
    """Third construction: the textbook sequential earliest-end-first
    greedy loop per user, vs the as-of + pointer-doubling entry."""

    def test_matches_sequential_greedy(self, spark):
        import duckdb

        from virapipe_spark.queries.streaming import (
            events_interval_scheduling,
        )

        sf = "/root/testdata/sf0.001"
        got = {
            r.user_id: (r.n_intervals, r.greedy_count)
            for r in events_interval_scheduling(spark, sf).collect()
        }
        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT user_id, event_id,
                   epoch_us(ts) // 1000000,
                   epoch_us(ts) // 1000000 + (event_id % 7 + 1) * 60
            FROM '{sf}/events.parquet'
            """
        ).fetchall()
        per: dict[int, list] = {}
        for u, _i, s, e in rows:
            per.setdefault(u, []).append((e, s))
        want = {}
        for u, lst in per.items():
            lst.sort()
            cnt = 0
            cur_end = None
            for e, s in lst:
                if cur_end is None or s >= cur_end:
                    cnt += 1
                    cur_end = e
            want[u] = (len(lst), cnt)
        assert got == want


class TestDtwIndependent:
    """Third construction: the row-by-row O(N^2) DP loop in pure
    python (hashlib envelopes), vs the wavefront entry."""

    def test_matches_sequential_dp(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.multimodal import (
            _DTW_N,
            multimodal_dtw_distance,
        )

        sf = "/root/testdata/sf0.001"
        got = {
            r.pair_id: r.dtw
            for r in multimodal_dtw_distance(spark, sf).collect()
        }
        con = duckdb.connect()
        docs = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
                " WHERE doc_id < 401"
            ).fetchall()
        )

        def env(txt: str) -> list[int]:
            h = hashlib.md5(txt.encode()).hexdigest()
            return [ord(ch) for ch in h[:_DTW_N]]

        want = {}
        for a in sorted(docs):
            if a % 2 or a >= 400 or a + 1 not in docs:
                continue
            ea, eb = env(docs[a]), env(docs[a + 1])
            n = len(ea)
            INF = 1 << 60
            dp = [[INF] * n for _ in range(n)]
            for i in range(n):
                for j in range(n):
                    c = abs(ea[i] - eb[j])
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
            want[a] = dp[n - 1][n - 1]
        assert got == want


class TestRegionLabelIndependent:
    """Third construction: stack-based flood fill in pure python over
    hashlib-recomputed fixtures, vs the pointer-doubling CC entry."""

    def test_matches_flood_fill(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.multimodal import multimodal_region_label

        sf = "/root/testdata/sf0.001"
        got = {
            (r.media_id, r.label): (
                r.area,
                r.min_r,
                r.max_r,
                r.min_c,
                r.max_c,
                r.pid_checksum,
            )
            for r in multimodal_region_label(spark, sf).collect()
        }
        con = duckdb.connect()
        docs = con.execute(
            f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
        ).fetchall()
        want = {}
        for did, txt in docs:
            h = (
                hashlib.md5(txt.encode()).hexdigest()
                + hashlib.md5((txt + "x").encode()).hexdigest()
                + hashlib.md5((txt + "y").encode()).hexdigest()
            )[:72]
            fgset = {
                (g // 9, g % 9)
                for g in range(72)
                if ord(h[g]) >= 97
            }
            seen = set()
            for start in sorted(fgset):
                if start in seen:
                    continue
                comp = []
                stack = [start]
                seen.add(start)
                while stack:
                    r, c = stack.pop()
                    comp.append((r, c))
                    for nr, nc in (
                        (r - 1, c),
                        (r + 1, c),
                        (r, c - 1),
                        (r, c + 1),
                    ):
                        if (nr, nc) in fgset and (nr, nc) not in seen:
                            seen.add((nr, nc))
                            stack.append((nr, nc))
                pids = [r * 9 + c for r, c in comp]
                want[(did, min(pids))] = (
                    len(comp),
                    min(r for r, _ in comp),
                    max(r for r, _ in comp),
                    min(c for _, c in comp),
                    max(c for _, c in comp),
                    sum(pids),
                )
        assert got == want


class TestHilbertIndependent:
    """Third construction: the validated pure-python xy2d staircase
    recomputes the occupied-cell step histogram; plus the curve
    invariants (bijectivity; Hilbert full-grid steps are all
    distance 1)."""

    @staticmethod
    def _xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx, ry = x // s, y // s
            d += s * s * ((3 * rx) ^ ry)
            x -= rx * s
            y -= ry * s
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    def test_curve_invariants(self):
        pos = {}
        for x in range(16):
            for y in range(16):
                pos[self._xy2d(16, x, y)] = (x, y)
        assert len(pos) == 256
        assert all(
            abs(pos[d][0] - pos[d + 1][0]) + abs(pos[d][1] - pos[d + 1][1])
            == 1
            for d in range(255)
        )

    def test_matches_python_histogram(self, spark):
        import duckdb
        from collections import Counter

        from virapipe_spark.queries.streaming import events_hilbert_layout

        sf = "/root/testdata/sf0.001"
        got = {
            (r.curve, r.step_dist): r.n_steps
            for r in events_hilbert_layout(spark, sf).collect()
        }
        con = duckdb.connect()
        cells = con.execute(
            f"""
            SELECT DISTINCT user_id % 16,
                   CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) % 16
            FROM '{sf}/events.parquet'
            """
        ).fetchall()

        def zorder(x, y):
            z = 0
            for i in range(4):
                z += ((x >> i) & 1) * 2 * 4**i + ((y >> i) & 1) * 4**i
            return z

        want: dict = {}
        for name, fn in (
            ("hilbert", lambda x, y: self._xy2d(16, x, y)),
            ("zorder", zorder),
        ):
            ordered = sorted(cells, key=lambda c: fn(*c))
            hist = Counter(
                abs(a[0] - b[0]) + abs(a[1] - b[1])
                for a, b in zip(ordered, ordered[1:])
            )
            for sd, n in hist.items():
                want[(name, sd)] = n
        assert got == want


class TestLubyMisIndependent:
    """Third construction for graph_mis_luby: with priorities fixed
    once, synchronous Luby computes the lexicographically-first MIS —
    recomputed here by the sequential greedy-by-priority loop."""

    def test_matches_sequential_greedy(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.relational import graph_mis_luby

        sf = "/root/testdata/sf0.001"
        rows = graph_mis_luby(spark, sf).collect()
        assert all(r.status != "undecided" for r in rows), (
            "round budget must converge on the tiny fixture"
        )
        got_mis = {r.node for r in rows if r.status == "mis"}
        # the verified-as-data columns, re-asserted
        assert all(
            (r.status == "mis") == (r.mis_neighbors == 0) for r in rows
        )
        con = duckdb.connect()
        edges = con.execute(
            f"""
            WITH pairs AS (
              SELECT a.l_partkey pa, b.l_partkey pb
              FROM '{sf}/lineitem.parquet' a
              JOIN '{sf}/lineitem.parquet' b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            )
            SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING count(*) >= 2
            """
        ).fetchall()
        adj: dict[int, set] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)

        def pri(v: int) -> int:
            h = hashlib.md5(str(v).encode()).hexdigest()
            return int(h[:10], 16) * 1048576 + v

        want = set()
        for v in sorted(adj, key=pri):
            if not (adj[v] & want):
                want.add(v)
        assert got_mis == want


class TestMisraGriesIndependent:
    """Third construction for events_misra_gries: the per-item
    guarantee columns re-derived in python from exact counts, plus
    the superset property (every item above N/(k+1) must survive)."""

    def test_guarantee_and_superset(self, spark):
        import duckdb

        from virapipe_spark.queries.streaming import (
            _MG_K,
            events_misra_gries,
        )

        sf = "/root/testdata/sf0.001"
        rows = events_misra_gries(spark, sf).collect()
        assert rows
        assert all(r.guarantee_ok == 1 for r in rows)
        con = duckdb.connect()
        exact = dict(
            con.execute(
                f"SELECT user_id, count(*) FROM '{sf}/events.parquet'"
                " GROUP BY user_id"
            ).fetchall()
        )
        n = sum(exact.values())
        survivors = {r.user_id for r in rows}
        must_survive = {
            u for u, c in exact.items() if c * (_MG_K + 1) > n
        }
        assert must_survive <= survivors
        for r in rows:
            assert r.exact_cnt == exact[r.user_id]
            assert 0 <= r.undercount


class TestStableMatchingIndependent:
    """Third construction for supplier_stable_matching: with
    preferences fixed, sequential one-proposal-at-a-time deferred
    acceptance (the McVitie-Wilson schedule) must produce the SAME
    proposer-optimal matching as the batch-synchronous Spark rounds —
    run to completion here in plain python, plus the stability
    theorem (zero blocking pairs) re-derived from exact ranks."""

    @staticmethod
    def _pri(p: int, s: int) -> int:
        import hashlib

        h = hashlib.md5(f"pr|{p}|{s}".encode()).hexdigest()
        return int(h[:10], 16) * 1048576 + s

    def test_matches_sequential_gale_shapley(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.relational import (
            _GS_K,
            supplier_stable_matching,
        )

        sf = "/root/testdata/sf0.001"
        rows = supplier_stable_matching(spark, sf).collect()
        assert rows
        assert all(r.status != "undecided" for r in rows), (
            "round budget must converge on the tiny fixture"
        )
        # the stability theorem, emitted as data, re-asserted: deferred
        # acceptance admits no blocking pair over the truncated lists
        assert all(r.blocking_pairs == 0 for r in rows)

        con = duckdb.connect()
        sups = [
            r[0]
            for r in con.execute(
                f"SELECT s_suppkey FROM '{sf}/supplier.parquet'"
                " ORDER BY s_suppkey"
            ).fetchall()
        ]
        parts = [
            r[0]
            for r in con.execute(
                f"SELECT p_partkey FROM '{sf}/part.parquet'"
                " ORDER BY p_partkey"
            ).fetchall()
        ]
        m = max(len(sups) // 2, 3)
        parts = parts[:m]

        def home(s_idx: int) -> int:
            h = hashlib.md5(f"gs|{s_idx}".encode()).hexdigest()
            return int(h[:10], 16) % m

        # sequential deferred acceptance: one free proposer at a time,
        # any order (we take lowest index first); pos advances on every
        # proposal, matching the batch rounds' accounting
        pos = {i: 1 for i in range(len(sups))}
        held: dict[int, tuple[int, int]] = {}  # p_idx -> (rank, s_idx)
        matched: dict[int, int] = {}
        free = sorted(pos, reverse=True)
        while free:
            s = free.pop()
            while pos[s] <= _GS_K and s not in matched:
                target = (home(s) + pos[s] - 1) % m
                rnk = self._pri(target, s)
                pos[s] += 1
                cur = held.get(target)
                if cur is None or rnk < cur[0]:
                    if cur is not None:
                        loser = cur[1]
                        del matched[loser]
                        free.append(loser)
                    held[target] = (rnk, s)
                    matched[s] = target
        want = {
            sups[s]: (
                ("matched", parts[p], (p - home(s)) % m + 1)
                if (p := matched.get(s)) is not None
                else ("exhausted", -1, 0)
            )
            for s in range(len(sups))
        }
        got = {
            r.s_suppkey: (r.status, r.matched_partkey, r.pref_rank)
            for r in rows
        }
        assert got == want

    def test_fixpoint_break_equals_full_budget(self, spark, monkeypatch):
        """r13 (ADVICE_r12): the r12 early-break at the free-supplier
        fixpoint is equivalent to running all _GS_ROUNDS by a comment-
        proof only — pin it ON THE REAL ENTRY: flip the production
        knob off, run the full budget, and require bit-identical
        output to the break path. (The oracle always runs the full
        budget, so this is exactly the equivalence the gate leans on.)"""
        import virapipe_spark.queries.relational as rel

        sf = "/root/testdata/sf0.001"
        broke = sorted(
            map(tuple, rel.supplier_stable_matching(spark, sf).collect())
        )
        monkeypatch.setattr(rel, "_GS_EARLY_STOP", False)
        full = sorted(
            map(tuple, rel.supplier_stable_matching(spark, sf).collect())
        )
        assert broke == full and broke


class TestGridNnIndependent:
    """Third construction for events_grid_nn_join: brute force over
    ALL click x view pairs (no grid) — proves the 3x3 ring pruning
    loses nothing, per the cell-width >= radius argument."""

    def test_matches_bruteforce(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.streaming import (
            _GRID_R,
            _GRID_SIDE,
            events_grid_nn_join,
        )

        sf = "/root/testdata/sf0.001"
        rows = events_grid_nn_join(spark, sf).collect()
        assert rows

        def coord(tag: str, eid: int) -> int:
            h = hashlib.md5(f"{tag}|{eid}".encode()).hexdigest()
            return int(h[:10], 16) % _GRID_SIDE

        con = duckdb.connect()
        ids = {
            t: [
                r[0]
                for r in con.execute(
                    f"SELECT event_id FROM '{sf}/events.parquet'"
                    f" WHERE event_type = '{t}'"
                ).fetchall()
            ]
            for t in ("click", "view")
        }
        pts = {
            t: [(e, coord("gx", e), coord("gy", e)) for e in ids[t]]
            for t in ("click", "view")
        }
        r2 = _GRID_R * _GRID_R
        want = {}
        for aid, ax, ay in pts["click"]:
            inr = sorted(
                ((ax - bx) ** 2 + (ay - by) ** 2, bid)
                for bid, bx, by in pts["view"]
                if (ax - bx) ** 2 + (ay - by) ** 2 <= r2
            )
            want[aid] = (
                (inr[0][1], inr[0][0], len(inr)) if inr else (-1, -1, 0)
            )
        got = {
            r.event_id: (r.matched_id, r.sq_dist, r.n_radius) for r in rows
        }
        assert got == want
        # the honesty pair: examined >= in-radius, strictly more
        # somewhere (the ring is a superset of the disk)
        assert all(r.n_ring >= r.n_radius for r in rows)
        assert len(want) == len(got)


class TestOlsCramerIndependent:
    """Third construction for events_ols_cramer: solve the same normal
    equations with Fraction-exact Gaussian elimination (no Cramer, no
    floats) and check the determinant ratios agree exactly; then
    verify the defining property — residual orthogonality X'(y-Xb)=0 —
    holds as exact rationals."""

    def test_matches_fraction_solve(self, spark):
        import duckdb
        from fractions import Fraction

        from virapipe_spark.queries.streaming import events_ols_cramer

        sf = "/root/testdata/sf0.001"
        rows = {r.coef: r for r in events_ols_cramer(spark, sf).collect()}
        assert set(rows) == {"intercept", "trend", "weekend"}
        det = {r.det_den for r in rows.values()}
        assert len(det) == 1 and 0 not in det

        con = duckdb.connect()
        data = con.execute(
            f"""
            WITH d AS (
              SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
                     CAST(round(value) AS BIGINT) AS v
              FROM '{sf}/events.parquet'
            ), byday AS (SELECT day, sum(v) AS y FROM d GROUP BY day)
            SELECT day - (SELECT min(day) FROM byday) AS x,
                   CASE WHEN day % 7 IN (2,3) THEN 1 ELSE 0 END AS w,
                   y
            FROM byday
            """
        ).fetchall()
        X = [(1, x, w) for x, w, _ in data]
        y = [v for _, _, v in data]
        A = [
            [
                Fraction(sum(r[i] * r[j] for r in X))
                for j in range(3)
            ]
            for i in range(3)
        ]
        b = [Fraction(sum(r[i] * v for r, v in zip(X, y)))
             for i in range(3)]
        # exact Gaussian elimination with partial pivoting
        M = [A[i] + [b[i]] for i in range(3)]
        for col in range(3):
            piv = max(range(col, 3), key=lambda r: abs(M[r][col]))
            M[col], M[piv] = M[piv], M[col]
            for r in range(3):
                if r != col and M[r][col]:
                    f = M[r][col] / M[col][col]
                    M[r] = [a - f * c for a, c in zip(M[r], M[col])]
        beta = [M[i][3] / M[i][i] for i in range(3)]
        for name, i in (("intercept", 0), ("trend", 1), ("weekend", 2)):
            got = Fraction(rows[name].det_num, rows[name].det_den)
            assert got == beta[i], name
        # residual orthogonality, exactly
        resid = [
            Fraction(v) - sum(beta[i] * r[i] for i in range(3))
            for r, v in zip(X, y)
        ]
        for i in range(3):
            assert sum(r[i] * e for r, e in zip(X, resid)) == 0


class TestDebruijnUnitigsIndependent:
    """Third construction for reads_debruijn_unitigs: sequential chain
    walking (the textbook unitig algorithm — start at every
    branch-adjacent node and walk the unique successor) instead of
    pointer-doubling CC."""

    def test_matches_chain_walk(self, spark):
        import duckdb
        import hashlib
        from collections import Counter, defaultdict

        from virapipe_spark.queries.genomics import (
            _DB_K,
            reads_debruijn_unitigs,
        )

        sf = "/root/testdata/sf0.001"
        rows = reads_debruijn_unitigs(spark, sf).collect()
        assert rows

        hexmap = str.maketrans("0123456789abcdef", "ACGTACGTACGTACGT")
        con = duckdb.connect()
        texts = [
            r[0]
            for r in con.execute(
                f"SELECT text FROM '{sf}/documents.parquet'"
            ).fetchall()
        ]
        k = _DB_K
        ecnt: Counter = Counter()
        for t in texts:
            s = (
                hashlib.md5(t.encode()).hexdigest()
                + hashlib.md5((t + "2").encode()).hexdigest()
            ).translate(hexmap)
            for i in range(64 - k):
                ecnt[(s[i : i + k], s[i + 1 : i + 1 + k])] += 1
        outd: Counter = Counter()
        ind: Counter = Counter()
        for u, v in ecnt:
            outd[u] += 1
            ind[v] += 1
        lin = {
            (u, v): m
            for (u, v), m in ecnt.items()
            if outd[u] == 1 and ind[v] == 1
        }
        nodes = {u for u, _ in ecnt} | {v for _, v in ecnt}
        succ = {u: v for u, v in lin}
        pred = {v: u for u, v in lin}
        seen: set = set()
        want = {}
        for n in sorted(nodes):
            if n in seen:
                continue
            # walk back to the chain start (or around the cycle)
            start, guard = n, 0
            while start in pred and pred[start] not in (n,) and guard <= len(
                nodes
            ):
                start = pred[start]
                guard += 1
                if start == n:  # pure cycle
                    break
            chain = [start]
            seen.add(start)
            cur = start
            while cur in succ and succ[cur] not in seen:
                cur = succ[cur]
                chain.append(cur)
                seen.add(cur)
            edges = [
                (a, b) for a, b in zip(chain, chain[1:])
            ] + ([(chain[-1], chain[0])] if succ.get(chain[-1]) == chain[0]
                 else [])
            uid = min(chain)
            want[uid] = (
                len(chain),
                len(edges),
                sum(lin[e] for e in edges),
                1 if len(edges) == len(chain) else 0,
            )
        got = {
            r.unitig_id: (r.n_kmers, r.n_edges, r.mult_total, r.is_cycle)
            for r in rows
        }
        assert got == want
        # the sparse regime must actually produce compacted chains
        assert max(r.n_kmers for r in rows) > 1


class TestSmithWatermanIndependent:
    """Third construction for reads_smith_waterman: the textbook
    row-by-row sequential DP matrix, argmax with the same (h DESC,
    i, j) tie-break."""

    def test_matches_sequential_dp(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.genomics import (
            _SW_GAP,
            _SW_MATCH,
            _SW_MISMATCH,
            _SW_N,
            reads_smith_waterman,
        )

        sf = "/root/testdata/sf0.001"
        rows = reads_smith_waterman(spark, sf).collect()
        assert rows
        hexmap = str.maketrans("0123456789abcdef", "ACGTACGTACGTACGT")
        con = duckdb.connect()
        docs = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
                " WHERE doc_id < 401"
            ).fetchall()
        )
        n = _SW_N

        def seq(doc_id: int) -> str:
            return hashlib.md5(docs[doc_id].encode()).hexdigest().translate(
                hexmap
            )[:n]

        want = {}
        for pair in range(0, 400, 2):
            a, b = seq(pair), seq(pair + 1)
            H = [[0] * n for _ in range(n)]
            best_h, best_i, best_j = -1, -1, -1
            for i in range(n):
                for j in range(n):
                    s = _SW_MATCH if a[i] == b[j] else _SW_MISMATCH
                    diag = H[i - 1][j - 1] if i and j else 0
                    up = H[i - 1][j] if i else 0
                    left = H[i][j - 1] if j else 0
                    h = max(0, diag + s, up - _SW_GAP, left - _SW_GAP)
                    H[i][j] = h
                    if h > best_h:
                        best_h, best_i, best_j = h, i, j
            want[pair] = (best_h, best_i, best_j)
        got = {r.pair_id: (r.sw_score, r.best_i, r.best_j) for r in rows}
        assert got == want
        assert max(h for h, _, _ in want.values()) >= 2  # non-trivial


class TestIsotonicIndependent:
    """Third construction for events_isotonic_daily: actual
    pool-adjacent-violators with Fraction-exact block averages must
    reproduce the minimax fit."""

    def test_matches_pava(self, spark):
        import duckdb
        from fractions import Fraction

        from virapipe_spark.queries.streaming import events_isotonic_daily

        sf = "/root/testdata/sf0.001"
        rows = sorted(
            events_isotonic_daily(spark, sf).collect(), key=lambda r: r.x
        )
        assert rows
        con = duckdb.connect()
        ys = [
            r[0]
            for r in con.execute(
                f"""
                WITH d AS (
                  SELECT CAST(floor(epoch_us(ts)/86400000000) AS BIGINT)
                           AS day,
                         CAST(round(value) AS BIGINT) AS v
                  FROM '{sf}/events.parquet'
                )
                SELECT sum(v) FROM d GROUP BY day ORDER BY day
                """
            ).fetchall()
        ]
        assert [r.y for r in rows] == ys
        # PAVA: pool blocks while a violator exists
        blocks = [[Fraction(y), 1] for y in ys]  # [sum, count]
        i = 0
        while i < len(blocks) - 1:
            if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[
                i + 1
            ][1]:
                blocks[i][0] += blocks[i + 1][0]
                blocks[i][1] += blocks[i + 1][1]
                del blocks[i + 1]
                if i:
                    i -= 1
            else:
                i += 1
        want = []
        for s, c in blocks:
            want.extend([s / c] * c)
        # fits are single-division doubles of exact rationals: compare
        # against the exact PAVA value through the same one rounding
        for g, w, rf in zip(
            [r.fit for r in rows], want, range(len(want))
        ):
            assert g == float(w), rf
        # monotone by construction
        assert all(a.fit <= b.fit for a, b in zip(rows, rows[1:]))


class TestBwtIndependent:
    """Third construction for reads_bwt_runs: INVERT every BWT via
    LF-mapping and recover the original sequence — the invertibility
    theorem exercised per row (strictly stronger than re-deriving the
    forward transform)."""

    def test_lf_inversion_recovers_sequences(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.genomics import _BWT_N, reads_bwt_runs

        sf = "/root/testdata/sf0.001"
        rows = reads_bwt_runs(spark, sf).collect()
        assert rows
        hexmap = str.maketrans("0123456789abcdef", "ACGTACGTACGTACGT")
        con = duckdb.connect()
        docs = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
            ).fetchall()
        )
        assert len(rows) == len(docs)
        for r in rows:
            orig = (
                hashlib.md5(docs[r.doc_id].encode())
                .hexdigest()
                .translate(hexmap)[:_BWT_N]
                + "$"
            )
            bwt = r.bwt
            assert sorted(bwt) == sorted(orig)  # permutation property
            # textbook iterated-sort inversion: prepend the L column
            # and re-sort, n times — the matrix of sorted rotations
            # reassembles and the row ending in '$' is the original
            mat = [""] * len(bwt)
            for _ in range(len(bwt)):
                mat = sorted(c + row for c, row in zip(bwt, mat))
            rec = next(row for row in mat if row.endswith("$"))
            assert rec == orig, r.doc_id
            # run accounting re-derived
            runs = 1 + sum(1 for a, b in zip(bwt, bwt[1:]) if a != b)
            oruns = 1 + sum(
                1 for a, b in zip(orig, orig[1:]) if a != b
            )
            assert (r.bwt_runs, r.orig_runs, r.run_gain) == (
                runs,
                oruns,
                oruns - runs,
            )


class TestHoughLinesIndependent:
    """Third construction for multimodal_hough_lines: recompute the
    point cloud + full accumulator in python AND assert the detector
    actually finds each planted line."""

    def test_detects_planted_lines(self, spark):
        import duckdb
        import hashlib
        from collections import Counter

        from virapipe_spark.queries.multimodal import (
            _HOUGH_DIRS,
            _HOUGH_PTS,
            multimodal_hough_lines,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r for r in multimodal_hough_lines(
            spark, sf).collect()}
        assert rows

        def h(tag: str) -> int:
            return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)

        con = duckdb.connect()
        ids = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM '{sf}/documents.parquet'"
            ).fetchall()
        ]
        assert set(ids) == set(rows)
        n = _HOUGH_PTS
        n_exact = 0
        for doc in ids:
            hd = h(f"hd|{doc}") % 8
            a, b = _HOUGH_DIRS[hd]
            x0, y0 = h(f"hx|{doc}") % 16, h(f"hy|{doc}") % 16
            pts = [(x0 + k * a, y0 + k * b) for k in range(n)] + [
                (h(f"nx|{doc}|{k}") % 64, h(f"ny|{doc}|{k}") % 64)
                for k in range(n, 2 * n)
            ]
            acc: Counter = Counter()
            for da, db in _HOUGH_DIRS:
                for x, y in pts:
                    acc[(da, db, da * y - db * x)] += 1
            best = min(
                acc.items(), key=lambda kv: (-kv[1], kv[0])
            )
            r = rows[doc]
            assert (r.dir_a, r.dir_b, r.c, r.votes) == (
                best[0][0],
                best[0][1],
                best[0][2],
                best[1],
            ), doc
            # detection quality: the winner must carry at least the
            # planted line's mass
            assert r.votes >= n, doc
            if (r.dir_a, r.dir_b) == (a, b) and r.c == a * y0 - b * x0:
                n_exact += 1
        # noise can occasionally out-vote via overlap ties, but the
        # planted line must be recovered in the overwhelming majority
        assert n_exact >= int(0.9 * len(ids)), n_exact


class TestHuffmanIndependent:
    """Third construction for docs_huffman_lengths: python heapq
    Huffman on the same frequencies — code-length multisets per
    frequency class can differ between valid optimal trees, so the
    invariants checked are the ones every optimal prefix code shares:
    equal total weighted length (minimality), Kraft equality, and
    sibling-pairing consistency; plus our deterministic tie-break
    makes the length assignment itself reproducible, which the mirror
    merge loop re-derives exactly."""

    def test_optimal_and_kraft(self, spark):
        import duckdb
        import hashlib
        import heapq
        from collections import Counter

        from virapipe_spark.queries.extensions import docs_huffman_lengths

        sf = "/root/testdata/sf0.001"
        rows = {r.sym: r for r in docs_huffman_lengths(spark, sf).collect()}
        assert len(rows) == 16
        assert all(r.kraft_ok == 1 for r in rows.values())
        assert sum(2 ** (20 - r.code_len) for r in rows.values()) == 2**20
        con = duckdb.connect()
        texts = [
            t[0]
            for t in con.execute(
                f"SELECT text FROM '{sf}/documents.parquet'"
            ).fetchall()
        ]
        freq: Counter = Counter()
        for t in texts:
            freq.update(hashlib.md5(t.encode()).hexdigest())
        assert {s: r.freq for s, r in rows.items()} == {
            s: freq.get(s, 0) for s in "0123456789abcdef"
        }
        # heapq Huffman (any valid tie-breaking): minimal weighted length
        heap = [(freq.get(s, 0), s, 0) for s in "0123456789abcdef"]
        # element: (weight, min_sym, ...) with member lists tracked aside
        lens: Counter = Counter()
        h = [(w, s, [s]) for w, s, _ in heap]
        heapq.heapify(h)
        while len(h) > 1:
            w1, s1, m1 = heapq.heappop(h)
            w2, s2, m2 = heapq.heappop(h)
            for s in m1 + m2:
                lens[s] += 1
            heapq.heappush(h, (w1 + w2, min(s1, s2), m1 + m2))
        got_cost = sum(r.freq * r.code_len for r in rows.values())
        opt_cost = sum(freq.get(s, 0) * lens[s] for s in lens)
        assert got_cost == opt_cost
        # the deterministic (freq, min-symbol) tie-break IS the heapq
        # order here, so lengths must match symbol-for-symbol too
        assert {s: r.code_len for s, r in rows.items()} == dict(lens)


class TestRcPalindromesIndependent:
    """Third construction for reads_rc_palindromes: direct
    center-expansion in python, plus a substring-level re-check that
    every reported best site really is its own reverse complement."""

    COMP = str.maketrans("ACGT", "TGCA")

    def test_matches_center_expansion(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.genomics import (
            _RCP_N,
            reads_rc_palindromes,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r for r in reads_rc_palindromes(
            spark, sf).collect()}
        assert rows
        hexmap = str.maketrans("0123456789abcdef", "ACGTACGTACGTACGT")
        con = duckdb.connect()
        docs = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
            ).fetchall()
        )
        n = _RCP_N
        for doc_id, text in docs.items():
            sq = hashlib.md5(text.encode()).hexdigest().translate(hexmap)
            best = []
            sites4 = 0
            for c in range(1, n):  # 1-based gap position c|c+1
                limit = min(c, n - c)
                r = 0
                while r < limit and sq[c - r - 1] == sq[c + r].translate(
                    self.COMP
                ):
                    r += 1
                best.append((r, c))
                if 2 * r >= 4:
                    sites4 += 1
            r, c = max(best, key=lambda t: (t[0], -t[1]))
            got = rows[doc_id]
            assert (got.best_center, got.best_len, got.n_sites4) == (
                c,
                2 * r,
                sites4,
            ), doc_id
            # substring-level: the winning site IS its own revcomp
            if r:
                seg = sq[c - r : c + r]
                assert seg == seg.translate(self.COMP)[::-1], doc_id


class TestPerCycleQualityIndependent:
    """Third construction for reads_percycle_quality: numpy-free exact
    quartiles from sorted python lists per cycle."""

    def test_matches_sorted_quartiles(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.genomics import (
            _PCQ_CYCLES,
            reads_percycle_quality,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.cycle: r for r in reads_percycle_quality(
            spark, sf).collect()}
        assert len(rows) == _PCQ_CYCLES
        con = duckdb.connect()
        texts = [
            t[0]
            for t in con.execute(
                f"SELECT text FROM '{sf}/documents.parquet'"
            ).fetchall()
        ]
        for p in range(1, _PCQ_CYCLES + 1):
            qvs = sorted(
                (
                    int(
                        hashlib.md5((t + "q").encode()).hexdigest()[
                            2 * p - 2 : 2 * p
                        ],
                        16,
                    )
                )
                % 41
                for t in texts
            )
            n = len(qvs)

            def pick(kn, kd):  # min qv with kd*cum >= kn*n
                cum = 0
                last = None
                from collections import Counter

                for v, c in sorted(Counter(qvs).items()):
                    cum += c
                    if kd * cum >= kn * n:
                        return v
                return last

            r = rows[p]
            assert (r.n, r.qsum) == (n, sum(qvs))
            assert r.q1 == pick(1, 4)
            assert r.median == pick(1, 2)
            assert r.q3 == pick(3, 4)
            assert r.n_below20 == sum(1 for v in qvs if v < 20)
            assert r.q1 <= r.median <= r.q3


class TestFmCountIndependent:
    """Third construction for reads_fm_count: run the textbook
    backward search in python (suffix-array ranks instead of BWT
    joins) and check counts, plus re-assert the theorem column."""

    def test_matches_python_backward_search(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.genomics import _FM_N, reads_fm_count

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r for r in reads_fm_count(spark, sf).collect()}
        assert rows
        assert all(r.theorem_ok == 1 for r in rows.values())
        hexmap = str.maketrans("0123456789abcdef", "ACGTACGTACGTACGT")
        con = duckdb.connect()
        docs = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
            ).fetchall()
        )
        n = _FM_N
        for doc_id, text in docs.items():
            sq = (
                hashlib.md5(text.encode()).hexdigest().translate(hexmap)[:n]
                + "$"
            )
            pp = (
                int(
                    hashlib.md5(f"fm|{doc_id}".encode()).hexdigest()[:8], 16
                )
                % (n - 2)
            )
            p = sq[pp : pp + 3]
            rots = sorted(sq[i:] + sq[:i] for i in range(len(sq)))
            bwt = "".join(r[-1] for r in rots)

            def C(ch):
                return sum(1 for c in sq if c < ch)

            def occ(ch, i):
                return bwt[:i].count(ch)

            lo, hi = C(p[2]) + 1, C(p[2]) + sq.count(p[2])
            for ch in (p[1], p[0]):
                if hi < lo:
                    break
                lo, hi = (
                    C(ch) + occ(ch, lo - 1) + 1,
                    C(ch) + occ(ch, hi),
                )
            fm = max(0, hi - lo + 1)
            naive = sum(
                1 for i in range(n - 2) if sq[i : i + 3] == p
            )
            r = rows[doc_id]
            assert (r.pattern, r.fm_count, r.naive_count) == (
                p,
                fm,
                naive,
            ), doc_id
            assert fm == naive  # the FM theorem, independently
            assert naive >= 1  # pattern drawn from the read itself


class TestDistanceTransformIndependent:
    """Third construction for multimodal_distance_transform:
    multi-source BFS on the grid graph re-derives the full field."""

    def test_matches_bfs(self, spark):
        import duckdb
        import hashlib
        from collections import deque

        from virapipe_spark.queries.multimodal import (
            _DT_SEEDS,
            _DT_W,
            multimodal_distance_transform,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r for r in multimodal_distance_transform(
            spark, sf).collect()}
        assert rows
        con = duckdb.connect()
        ids = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM '{sf}/documents.parquet'"
            ).fetchall()
        ]
        w = _DT_W

        def h(tag: str) -> int:
            return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) % w

        for doc in ids:
            seeds = {
                (h(f"sx|{doc}|{k}"), h(f"sy|{doc}|{k}"))
                for k in range(_DT_SEEDS)
            }
            dist = {s: 0 for s in seeds}
            dq = deque(seeds)
            while dq:
                x, y = dq.popleft()
                for nx, ny in ((x+1, y), (x-1, y), (x, y+1), (x, y-1)):
                    if 0 <= nx < w and 0 <= ny < w and (nx, ny) not in dist:
                        dist[(nx, ny)] = dist[(x, y)] + 1
                        dq.append((nx, ny))
            r = rows[doc]
            assert r.n_seeds == len(seeds), doc
            assert r.dt_sum == sum(dist.values()), doc
            assert r.dt_max == max(dist.values()), doc
            assert r.dt_checksum == sum(
                d * (x * w + y + 1) for (x, y), d in dist.items()
            ), doc


class TestCrc32Independent:
    """Third AND fourth constructions for docs_crc32_relational: the
    standardized zlib.crc32, and Spark's built-in crc32() — three
    implementations must produce the same 32-bit value."""

    def test_matches_zlib_and_builtin(self, spark):
        import duckdb
        import hashlib
        import zlib

        from pyspark.sql import functions as F

        from virapipe_spark.queries.extensions import docs_crc32_relational

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r.crc32 for r in docs_crc32_relational(
            spark, sf).collect()}
        assert rows
        con = duckdb.connect()
        docs = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
            ).fetchall()
        )
        assert len(rows) == len(docs)
        for doc_id, text in docs.items():
            payload = hashlib.md5(text.encode()).hexdigest().encode()
            assert rows[doc_id] == zlib.crc32(payload), doc_id
        # Spark's built-in crc32 over the same payloads
        builtin = {
            r.doc_id: r.b
            for r in spark.read.parquet(f"{sf}/documents.parquet")
            .select("doc_id", F.crc32(F.md5("text").cast("binary")).alias("b"))
            .collect()
        }
        assert builtin == rows


class TestMmrIndependent:
    """Third construction for embed_mmr_rerank: the sequential greedy
    MMR loop in python over the same rounded-6 cosines."""

    def test_matches_sequential_greedy(self, spark):
        import duckdb

        from virapipe_spark.queries.extensions import (
            _MMR_K,
            _MMR_LAMBDA,
            _MMR_POOL,
            _QUANT,
            embed_mmr_rerank,
        )

        sf = "/root/testdata/sf0.001"
        rows = embed_mmr_rerank(spark, sf).collect()
        assert len(rows) == 4 * _MMR_K
        con = duckdb.connect()
        vecs = {
            r[0]: r[1]
            for r in con.execute(
                f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'"
            ).fetchall()
        }
        q = {
            vid: [round(float(x) * _QUANT) for x in v]
            for vid, v in vecs.items()
        }
        import math

        def cos(a, b):
            d = sum(x * y for x, y in zip(q[a], q[b]))
            na = math.sqrt(sum(x * x for x in q[a]))
            nb = math.sqrt(sum(x * x for x in q[b]))
            return round(d / (na * nb), 6)

        want = []
        for query in range(4):
            pool = sorted(
                ((cos(query, v), v) for v in q if v != query),
                key=lambda t: (-t[0], t[1]),
            )[:_MMR_POOL]
            cand = {v: rel for rel, v in pool}
            ms = {v: 0.0 for v in cand}
            for rank in range(1, _MMR_K + 1):
                score = {
                    v: _MMR_LAMBDA * rel
                    - round(1 - _MMR_LAMBDA, 1)
                    * (0.0 if rank == 1 else ms[v])
                    for v, rel in cand.items()
                }
                pick = min(score, key=lambda v: (-score[v], v))
                want.append(
                    (query, rank, pick, cand[pick], score[pick])
                )
                del cand[pick]
                for v in cand:
                    ms[v] = max(ms[v], cos(v, pick))
        got = sorted(
            (r.query_id, r.rank, r.vec_id, r.rel, r.mmr_score)
            for r in rows
        )
        assert got == sorted(want)
        # diversity must actually bite: some query's rank-2..K pick is
        # not the relevance-order pick (otherwise MMR degenerates)
        rel_order = {}
        for query in range(4):
            pool = sorted(
                ((cos(query, v), v) for v in q if v != query),
                key=lambda t: (-t[0], t[1]),
            )[:_MMR_K]
            rel_order[query] = [v for _, v in pool]
        mmr_order = {
            query: [
                r.vec_id
                for r in sorted(rows, key=lambda r: r.rank)
                if r.query_id == query
            ]
            for query in range(4)
        }
        assert any(mmr_order[u] != rel_order[u] for u in range(4))


class TestTextTilingIndependent:
    """Third construction for docs_texttiling_segments: python
    dict-based block vectors and the integer-cleared mean test."""

    def test_matches_python_blocks(self, spark):
        import duckdb
        import hashlib
        from collections import Counter

        from virapipe_spark.queries.extensions import (
            _TT_BLOCK,
            _TT_BUCKETS,
            docs_texttiling_segments,
        )

        sf = "/root/testdata/sf0.001"
        rows = docs_texttiling_segments(spark, sf).collect()
        assert rows
        got = {
            (r.doc_id, r.gap): (r.sim, r.n_gaps, r.is_boundary)
            for r in rows
        }
        con = duckdb.connect()
        docs = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
            ).fetchall()
        )
        want = {}
        n_bound = 0
        for doc_id, text in docs.items():
            toks = [t for t in text.split(" ") if t]
            blocks: dict = {}
            for i, t in enumerate(toks):
                b = (
                    int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                    % _TT_BUCKETS
                )
                blocks.setdefault(i // _TT_BLOCK, Counter())[b] += 1
            nblk = len(blocks)
            sims = {
                g: sum(
                    blocks[g][k] * blocks[g + 1][k] for k in blocks[g]
                )
                for g in range(nblk - 1)
            }
            if len(sims) < 2:
                continue
            total = sum(sims.values())
            for g, s in sims.items():
                bd = 1 if s * len(sims) < total else 0
                want[(doc_id, g)] = (s, len(sims), bd)
                n_bound += bd
        assert got == want
        assert n_bound > 0  # dips exist — the detector actually fires


class TestViterbiBurstIndependent:
    """Third construction for events_viterbi_burst: classic
    backtracking Viterbi in python; our per-day forward-backward
    states must form a path achieving exactly the optimal cost."""

    def test_achieves_optimal_cost(self, spark):
        import duckdb

        from virapipe_spark.queries.streaming import events_viterbi_burst

        sf = "/root/testdata/sf0.001"
        rows = sorted(
            events_viterbi_burst(spark, sf).collect(), key=lambda r: r.day
        )
        assert rows
        assert len({r.path_cost for r in rows}) == 1  # the invariant
        con = duckdb.connect()
        xs = [
            r[0]
            for r in con.execute(
                f"""
                SELECT count(*) FROM '{sf}/events.parquet'
                GROUP BY CAST(floor(epoch_us(ts)/86400000000) AS BIGINT)
                ORDER BY 1
                """
            ).fetchall()
        ]
        # exact P25/P75 by the same crossing rule
        n = len(xs)
        cum = 0
        lo = hi = None
        from collections import Counter

        for v, c in sorted(Counter(xs).items()):
            cum += c
            if lo is None and 4 * cum >= n:
                lo = v
            if hi is None and 4 * cum >= 3 * n:
                hi = v
        tau = (hi - lo + 1) // 2
        days = [
            r[0]
            for r in con.execute(
                f"""
                SELECT count(*) AS x FROM '{sf}/events.parquet'
                GROUP BY CAST(floor(epoch_us(ts)/86400000000) AS BIGINT)
                ORDER BY CAST(floor(epoch_us(ts)/86400000000) AS BIGINT)
                """
            ).fetchall()
        ]
        emis = [(abs(x - lo), abs(x - hi)) for x in days]
        # backtracking Viterbi
        dp = [emis[0]]
        bk = []
        for e in emis[1:]:
            plo, phi = dp[-1]
            cand_lo = (plo, phi + tau)
            cand_hi = (phi, plo + tau)
            bk.append(
                (0 if cand_lo[0] <= cand_lo[1] else 1,
                 1 if cand_hi[0] <= cand_hi[1] else 0)
            )
            dp.append((e[0] + min(cand_lo), e[1] + min(cand_hi)))
        opt = min(dp[-1])
        # our emitted sequence must cost exactly opt
        seq = [0 if r.map_state == "lo" else 1 for r in rows]
        cost = emis[0][seq[0]]
        for d in range(1, len(seq)):
            cost += emis[d][seq[d]] + (tau if seq[d] != seq[d - 1] else 0)
        assert rows[0].path_cost == opt
        assert cost == opt, (cost, opt)
        assert len(set(seq)) == 2  # both states visited: bursts exist


class TestConvexHullIndependent:
    """Third construction for multimodal_convex_hull: Andrew's
    monotone chain with exact integer arithmetic; hull corners (strict
    turns only) must equal the is_vertex set."""

    def test_matches_monotone_chain(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.multimodal import (
            _CH_PTS,
            _CH_SIDE,
            multimodal_convex_hull,
        )

        sf = "/root/testdata/sf0.001"
        rows = multimodal_convex_hull(spark, sf).collect()
        assert rows
        got: dict = {}
        for r in rows:
            got.setdefault(r.doc_id, {})[(r.x, r.y)] = r.is_vertex
        con = duckdb.connect()
        ids = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM '{sf}/documents.parquet'"
            ).fetchall()
        ]

        def h(tag: str) -> int:
            return (
                int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)
                % _CH_SIDE
            )

        def cross(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (
                b[0] - o[0]
            )

        for doc in ids:
            pts = sorted(
                {
                    (h(f"cx|{doc}|{k}"), h(f"cy|{doc}|{k}"))
                    for k in range(_CH_PTS)
                }
            )
            assert set(got[doc]) == set(pts), doc
            if len(pts) <= 2:
                want = set(pts)
            else:
                lower: list = []
                for p in pts:
                    while (
                        len(lower) >= 2
                        and cross(lower[-2], lower[-1], p) <= 0
                    ):
                        lower.pop()
                    lower.append(p)
                upper: list = []
                for p in reversed(pts):
                    while (
                        len(upper) >= 2
                        and cross(upper[-2], upper[-1], p) <= 0
                    ):
                        upper.pop()
                    upper.append(p)
                want = set(lower[:-1] + upper[:-1])
            for p in pts:
                assert got[doc][p] == (1 if p in want else 0), (doc, p)


class TestIntervalJaccardIndependent:
    """Third construction for interval_jaccard: python sweep-line
    merge + bp-level set arithmetic over explicit base sets."""

    def test_matches_base_sets(self, spark):
        from virapipe_spark.queries.staged import interval_jaccard

        sf = "/root/testdata/sf0.001"
        rows = {r.seqid: r for r in interval_jaccard(spark, sf).collect()}
        assert rows
        import duckdb

        con = duckdb.connect()
        genes = con.execute(
            f"""
            SELECT concat('c', p_partkey % 3),
                   (p_partkey * 37) % 9000,
                   (p_partkey * 37) % 9000 + 400
            FROM '{sf}/part.parquet'
            """
        ).fetchall()
        readsv = con.execute(
            f"""
            SELECT concat('c', o_orderkey % 3),
                   (o_orderkey * 91) % 9400,
                   (o_orderkey * 91) % 9400 + 80
            FROM '{sf}/orders.parquet' WHERE o_orderkey < 3000
            """
        ).fetchall()
        # brute force: explicit base-position sets (small coordinates)
        from collections import defaultdict

        basea: dict = defaultdict(set)
        baseb: dict = defaultdict(set)
        for seq, s, e in genes:
            basea[seq].update(range(s, e + 1))
        for seq, s, e in readsv:
            baseb[seq].update(range(s, e + 1))

        def islands(posset):
            ps = sorted(posset)
            n = 0
            prev = None
            for x in ps:
                if prev is None or x > prev + 1:
                    n += 1
                prev = x
            return n

        for seq in rows:
            a, b = basea[seq], baseb[seq]
            r = rows[seq]
            assert r.len_a == len(a), seq
            assert r.len_b == len(b), seq
            assert r.inter_bp == len(a & b), seq
            assert r.union_bp == len(a | b), seq
            assert r.jaccard == len(a & b) / len(a | b), seq
            assert r.n_a == islands(a), seq
            assert r.n_b == islands(b), seq


class TestMutationSpectrumIndependent:
    """Third construction for reads_mutation_spectrum: python
    per-variant classification plus the design-expectation check
    (uniform alt => ts share ~1/3, ratio ~0.5)."""

    def test_matches_python_classification(self, spark):
        import duckdb
        import hashlib
        from collections import Counter

        from virapipe_spark.queries.genomics import reads_mutation_spectrum

        sf = "/root/testdata/sf0.001"
        rows = reads_mutation_spectrum(spark, sf).collect()
        assert rows
        con = duckdb.connect()
        ids = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM '{sf}/documents.parquet'"
            ).fetchall()
        ]
        bases = "ACGT"
        spec: Counter = Counter()
        for doc in ids:
            chrom = f"chr{doc % 3}"
            ri = int(hashlib.md5(f"ref|{doc}".encode()).hexdigest()[:8],
                     16) % 4
            ao = int(hashlib.md5(f"alt|{doc}".encode()).hexdigest()[:8],
                     16) % 3
            ref = bases[ri]
            alt = bases[(ri + 1 + ao) % 4]
            spec[(chrom, ref, alt)] += 1
        ts_pairs = {("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")}
        got = {(r.chrom, r.ref, r.alt): r for r in rows}
        assert set(got) == set(spec)
        for key, n in spec.items():
            r = got[key]
            assert r.n == n, key
            assert r.is_transition == (
                1 if (key[1], key[2]) in ts_pairs else 0
            ), key
        for chrom in ("chr0", "chr1", "chr2"):
            ts = sum(
                n for (c, rf, al), n in spec.items()
                if c == chrom and (rf, al) in ts_pairs
            )
            tv = sum(
                n for (c, rf, al), n in spec.items()
                if c == chrom and (rf, al) not in ts_pairs
            )
            any_row = next(r for k, r in got.items() if k[0] == chrom)
            assert (any_row.chrom_ts, any_row.chrom_tv) == (ts, tv)
            assert any_row.tstv == ts / tv
            # uniform-alt design: ratio must hover near 0.5
            assert 0.3 < ts / tv < 0.8, chrom


class TestCigarWalkIndependent:
    """Third construction for reads_cigar_walk: a hand-rolled python
    CIGAR parser applying the SAM spec consume table."""

    def test_matches_python_parser(self, spark):
        import duckdb
        import hashlib
        import re

        from virapipe_spark.queries.genomics import (
            _CIG_OPS,
            _CIG_SEGS,
            reads_cigar_walk,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r for r in reads_cigar_walk(spark, sf).collect()}
        assert rows
        con = duckdb.connect()
        ids = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM '{sf}/documents.parquet'"
            ).fetchall()
        ]

        def h(tag: str, width: int) -> int:
            return int(
                hashlib.md5(tag.encode()).hexdigest()[:width], 16
            )

        for doc in ids:
            cigar = "".join(
                str(1 + h(f"cl|{doc}|{k}", 4) % 30)
                + _CIG_OPS[h(f"co|{doc}|{k}", 4) % 5]
                for k in range(_CIG_SEGS)
            )
            pos = 1 + h(f"cp|{doc}", 8) % 100000
            ref = q = clip = nops = 0
            for ln, op in re.findall(r"(\d+)([A-Z])", cigar):
                ln = int(ln)
                nops += 1
                if op in "MXD":
                    ref += ln
                if op in "MXIS":
                    q += ln
                if op == "S":
                    clip += ln
            r = rows[doc]
            assert (
                r.cigar,
                r.pos,
                r.ref_len,
                r.query_len,
                r.align_end,
                r.n_ops,
                r.clipped,
            ) == (cigar, pos, ref, q, pos + ref - 1, nops, clip), doc


class TestDensestSubgraphIndependent:
    """Third construction for graph_densest_subgraph: python batch
    peel mirror plus TRUE sequential Charikar, with the theory
    inequality best_batch >= best_charikar / 3."""

    def test_matches_peel_and_charikar_bound(self, spark):
        import duckdb
        from collections import defaultdict

        from virapipe_spark.queries.relational import graph_densest_subgraph

        sf = "/root/testdata/sf0.001"
        rows = sorted(
            graph_densest_subgraph(spark, sf).collect(),
            key=lambda r: r.round,
        )
        assert rows
        con = duckdb.connect()
        E = {
            tuple(r)
            for r in con.execute(
                f"""
                WITH pairs AS (
                  SELECT a.l_partkey pa, b.l_partkey pb
                  FROM '{sf}/lineitem.parquet' a
                  JOIN '{sf}/lineitem.parquet' b
                    ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
                )
                SELECT pa, pb FROM pairs GROUP BY pa, pb
                HAVING count(*) >= 2
                """
            ).fetchall()
        }
        # batch peel mirror
        cur = set(E)
        want = []
        while cur:
            deg: dict = defaultdict(int)
            for a, b in cur:
                deg[a] += 1
                deg[b] += 1
            v, ne = len(deg), len(cur)
            want.append((len(want), v, ne, ne / v))
            keep = {n for n in deg if deg[n] * v >= 3 * ne}
            cur = {(a, b) for a, b in cur if a in keep and b in keep}
        got = [(r.round, r.n_nodes, r.n_edges, r.density) for r in rows]
        assert got == want
        besti = max(range(len(want)), key=lambda i: (want[i][3], -i))
        assert [r.is_best for r in rows] == [
            1 if i == besti else 0 for i in range(len(rows))
        ]
        # sequential Charikar: peel the single min-degree vertex
        cur = set(E)
        best_char = 0.0
        while cur:
            deg = defaultdict(int)
            for a, b in cur:
                deg[a] += 1
                deg[b] += 1
            best_char = max(best_char, len(cur) / len(deg))
            victim = min(deg, key=lambda n: (deg[n], n))
            cur = {(a, b) for a, b in cur if victim not in (a, b)}
        best_batch = max(r.density for r in rows)
        assert best_batch >= best_char / 3  # the (2+2eps) vs 2 theory


class TestImageRegistrationIndependent:
    """Third construction for multimodal_image_registration: python
    correlation sweep, plus the detector claim — the planted shift is
    recovered for (nearly) every image."""

    def test_recovers_planted_shifts(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.multimodal import (
            _REG_S,
            _REG_W,
            multimodal_image_registration,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r for r in multimodal_image_registration(
            spark, sf).collect()}
        assert rows

        def h4(tag: str) -> int:
            return int(hashlib.md5(tag.encode()).hexdigest()[:4], 16)

        con = duckdb.connect()
        ids = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM '{sf}/documents.parquet'"
                " WHERE doc_id < 1000"
            ).fetchall()
        ]
        assert set(ids) == set(rows)
        w, s = _REG_W, _REG_S
        n_rec = 0
        for doc in ids:
            img = {
                (x, y): h4(f"px|{doc}|{x},{y}") % 256
                for x in range(w)
                for y in range(w)
            }
            dx = h4(f"dx|{doc}") % (2 * s + 1) - s
            dy = h4(f"dy|{doc}") % (2 * s + 1) - s
            best = None
            for ox in range(-s, s + 1):
                for oy in range(-s, s + 1):
                    sc = nov = 0
                    for (x, y), v in img.items():
                        # B[x+dx, y+dy] = A[x, y]; probe B at (x+ox, y+oy)
                        bx, by = x + ox - dx, y + oy - dy
                        if (bx, by) in img:
                            sc += v * img[(bx, by)]
                            nov += 1
                    key = (-sc, ox, oy)
                    if best is None or key < best[0]:
                        best = (key, sc, nov, ox, oy)
            r = rows[doc]
            assert (r.est_dx, r.est_dy, r.score, r.n_overlap) == (
                best[3],
                best[4],
                best[1],
                best[2],
            ), doc
            assert (r.true_dx, r.true_dy) == (dx, dy)
            assert r.recovered == (
                1 if (best[3], best[4]) == (dx, dy) else 0
            )
            n_rec += r.recovered
        assert n_rec >= int(0.95 * len(ids)), n_rec


class TestPriceIndexIndependent:
    """Third construction for lineitem_price_index: python matched-
    basket index arithmetic plus the Fisher time-reversal identity."""

    def test_matches_python_and_time_reversal(self, spark):
        import duckdb
        import math
        from collections import defaultdict

        from virapipe_spark.queries.relational import lineitem_price_index

        sf = "/root/testdata/sf0.001"
        rows = {r.brand: r for r in lineitem_price_index(
            spark, sf).collect()}
        assert rows
        con = duckdb.connect()
        data = con.execute(
            f"""
            SELECT p.p_brand, l.l_partkey,
                   CASE WHEN o.o_orderdate < DATE '1998-01-01'
                        THEN 0 ELSE 1 END,
                   CAST(round(l.l_quantity) AS BIGINT), l.l_extendedprice
            FROM '{sf}/lineitem.parquet' l
            JOIN '{sf}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
            JOIN '{sf}/part.parquet' p ON p.p_partkey = l.l_partkey
            """
        ).fetchall()
        acc: dict = defaultdict(lambda: [0, 0.0])
        for brand, part, per, q, r in data:
            a = acc[(brand, part, per)]
            a[0] += q
            a[1] += r
        pp = {
            k: (v[0], round(100 * v[1] / v[0]))
            for k, v in acc.items()
        }
        agg: dict = defaultdict(lambda: [0, 0, 0, 0, 0])
        for (brand, part, per), (q, p) in pp.items():
            if per == 0 and (brand, part, 1) in pp:
                q1, p1 = pp[(brand, part, 1)]
                a = agg[brand]
                a[0] += 1
                a[1] += p1 * q
                a[2] += p * q
                a[3] += p1 * q1
                a[4] += p * q1
        assert set(agg) == set(rows)
        for brand, (n, ln, ld, pn, pd) in agg.items():
            r = rows[brand]
            assert (r.n_parts, r.l_num, r.l_den, r.p_num, r.p_den) == (
                n, ln, ld, pn, pd
            ), brand
            assert r.laspeyres == ln / ld
            assert r.paasche == pn / pd
            assert r.fisher == math.sqrt((ln / ld) * (pn / pd))
            # Fisher time-reversal: F(0->1) * F(1->0) = 1 (exact in the
            # rational squares: (ln/ld)*(pn/pd) * (pd/pn)*(ld/ln) = 1)
            rev = math.sqrt((pd / pn) * (ld / ln))
            assert abs(r.fisher * rev - 1.0) < 1e-12


class TestLedgerReconcileIndependent:
    """Third construction for orders_ledger_reconcile: re-derive the
    planted break list from the generative rule and assert the
    reconciler recovered it set-for-set."""

    def test_recovers_planted_breaks(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.relational import (
            orders_ledger_reconcile,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.o_orderkey: r for r in orders_ledger_reconcile(
            spark, sf).collect()}
        assert rows
        con = duckdb.connect()
        orders = con.execute(
            f"SELECT o_orderkey, o_totalprice FROM '{sf}/orders.parquet'"
        ).fetchall()

        def h(tag: str, mod: int) -> int:
            return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16) % mod

        want = {}
        for k, tp in orders:
            cents = round(100 * tp)
            err = h(f"err|{k}", 97) == 0
            gap = h(f"gap|{k}", 101) == 0
            if gap:
                want[k] = ("missing_credit", cents + (1 if err else 0), 0)
            elif err:
                want[k] = ("amount_mismatch", cents + 1, cents)
        assert set(rows) == set(want)
        for k, (anom, d, c) in want.items():
            r = rows[k]
            assert (r.anomaly, r.debit_cents, r.credit_cents) == (
                anom, d, c
            ), k
            assert r.diff_cents == d - c
        # both anomaly classes must actually occur
        assert {r.anomaly for r in rows.values()} == {
            "missing_credit",
            "amount_mismatch",
        }


class TestTextRankIndependent:
    """Third construction for docs_textrank_keywords: python weighted
    integer PageRank over the same per-doc co-occurrence graphs."""

    def test_matches_python_textrank(self, spark):
        import duckdb
        from collections import Counter, defaultdict

        from virapipe_spark.queries.extensions import (
            _TR_TOPK,
            docs_textrank_keywords,
        )

        sf = "/root/testdata/sf0.001"
        rows = docs_textrank_keywords(spark, sf).collect()
        assert rows
        got: dict = defaultdict(list)
        for r in sorted(rows, key=lambda r: (r.doc_id, r.rn)):
            got[r.doc_id].append((r.token, r.rank, r.rn))
        con = duckdb.connect()
        docs = dict(
            con.execute(
                f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
            ).fetchall()
        )
        for doc_id, text in docs.items():
            toks = [t for t in text.split(" ") if t]
            w: Counter = Counter()
            for i, a in enumerate(toks):
                for j in (i + 1, i + 2):
                    if j < len(toks) and toks[j] != a:
                        w[(a, toks[j])] += 1
            edges: Counter = Counter()
            for (a, b2), c in w.items():
                edges[(a, b2)] += c
                edges[(b2, a)] += c
            wdeg: Counter = Counter()
            for (a, _), c in edges.items():
                wdeg[a] += c
            rank = {n: 1_000_000 for n in wdeg}
            for _ in range(2):
                s: Counter = Counter()
                for (a, b2), c in edges.items():
                    s[b2] += (rank[a] * c) // wdeg[a]
                rank = {
                    n: 150_000 + (85 * s.get(n, 0)) // 100 for n in wdeg
                }
            want = sorted(
                rank.items(), key=lambda kv: (-kv[1], kv[0])
            )[:_TR_TOPK]
            assert got[doc_id] == [
                (t, rk, i + 1) for i, (t, rk) in enumerate(want)
            ], doc_id


class TestMedianFilterIndependent:
    """Third construction for multimodal_median_filter: python sorted
    neighborhood medians with the same lower-median convention."""

    def test_matches_python_medians(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.multimodal import (
            _MF_W,
            multimodal_median_filter,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r for r in multimodal_median_filter(
            spark, sf).collect()}
        assert rows
        con = duckdb.connect()
        ids = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM '{sf}/documents.parquet'"
            ).fetchall()
        ]
        w = _MF_W
        for doc in ids:
            img = {
                (x, y): int(
                    hashlib.md5(f"mf|{doc}|{x},{y}".encode()).hexdigest()[
                        :4
                    ],
                    16,
                )
                % 256
                for x in range(w)
                for y in range(w)
            }
            msum = chk = chg = 0
            for (x, y), v in img.items():
                vals = sorted(
                    img[(x + dx, y + dy)]
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                    if (x + dx, y + dy) in img
                )
                # lower median: min v with 2*cum >= n
                m = vals[(len(vals) - 1) // 2]
                msum += m
                chk += m * (x * w + y + 1)
                chg += 1 if m != v else 0
            r = rows[doc]
            assert (r.med_sum, r.checksum, r.n_changed) == (
                msum, chk, chg
            ), doc
            assert r.n_changed > 0  # smoothing actually does something


class TestEulerCheckIndependent:
    """Third construction for graph_euler_check: python union-find
    components + degree parity."""

    def test_matches_union_find(self, spark):
        import duckdb
        from collections import defaultdict

        from virapipe_spark.queries.relational import graph_euler_check

        sf = "/root/testdata/sf0.001"
        rows = {r.component: r for r in graph_euler_check(
            spark, sf).collect()}
        assert rows
        con = duckdb.connect()
        E = con.execute(
            f"""
            WITH pairs AS (
              SELECT a.l_partkey pa, b.l_partkey pb
              FROM '{sf}/lineitem.parquet' a
              JOIN '{sf}/lineitem.parquet' b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            )
            SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING count(*) >= 2
            """
        ).fetchall()
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        deg: dict = defaultdict(int)
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
            parent[find(a)] = find(b)
        comps: dict = defaultdict(list)
        for n in deg:
            comps[find(n)].append(n)
        want = {}
        for ns in comps.values():
            cid = min(ns)
            odd = sum(1 for n in ns if deg[n] % 2 == 1)
            edges = sum(deg[n] for n in ns) // 2
            want[cid] = (
                len(ns),
                edges,
                odd,
                1 if odd == 0 else 0,
                1 if odd in (0, 2) else 0,
            )
        got = {
            c: (r.n_nodes, r.n_edges, r.n_odd, r.has_circuit, r.has_path)
            for c, r in rows.items()
        }
        assert got == want
        # parity sanity: odd-degree counts are even (handshake lemma)
        assert all(r.n_odd % 2 == 0 for r in rows.values())


class TestAdapterTrimIndependent:
    """Third construction for reads_adapter_trim: python mirror of the
    cutadapt overlap spec, plus recovery accounting on detectable
    plants."""

    def test_matches_spec_and_recovers(self, spark):
        import duckdb
        import hashlib

        from virapipe_spark.queries.genomics import (
            _AD_MAXPLANT,
            _AD_MINOV,
            _AD_READLEN,
            _AD_SEQ,
            reads_adapter_trim,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r for r in reads_adapter_trim(
            spark, sf).collect()}
        assert rows
        hexmap = str.maketrans("0123456789abcdef", "ACGTACGTACGTACGT")
        con = duckdb.connect()
        ids = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM '{sf}/documents.parquet'"
            ).fetchall()
        ]
        n = _AD_READLEN
        n_detectable = n_hit = 0
        for doc in ids:
            planted = (
                int(hashlib.md5(f"ad|{doc}".encode()).hexdigest()[:8], 16)
                % (_AD_MAXPLANT + 1)
            )
            ins = (
                hashlib.md5(f"ins|{doc}".encode())
                .hexdigest()
                .translate(hexmap)
            )
            read = ins[: n - planted] + _AD_SEQ[:planted]
            assert len(read) == n
            detected = 0
            for o in range(_AD_MINOV, len(_AD_SEQ) + 1):
                if read[n - o :] == _AD_SEQ[:o]:
                    detected = o
            r = rows[doc]
            assert (r.detected, r.trim_len, r.planted) == (
                detected, n - detected, planted
            ), doc
            assert r.exact_match == (1 if detected == planted else 0)
            if planted >= _AD_MINOV:
                n_detectable += 1
                n_hit += 1 if detected == planted else 0
        # detectable plants are recovered except rare random suffix
        # extensions (~1/64 per extra base)
        assert n_hit >= int(0.9 * n_detectable), (n_hit, n_detectable)


class TestAirportShapleyIndependent:
    """Third construction for supplier_airport_shapley: brute-force
    the Shapley DEFINITION — marginal contributions over all
    coalitions via the subset-weight formula — with Fractions, and
    compare to the closed form exactly."""

    def test_matches_bruteforce_definition(self, spark):
        import duckdb
        from fractions import Fraction
        from itertools import combinations
        from math import factorial

        from virapipe_spark.queries.relational import (
            _SHAP_LCM,
            _SHAP_N,
            supplier_airport_shapley,
        )

        sf = "/root/testdata/sf0.001"
        rows = sorted(
            supplier_airport_shapley(spark, sf).collect(),
            key=lambda r: r.j,
        )
        assert len(rows) == _SHAP_N
        assert all(r.efficiency_ok == 1 for r in rows)
        assert sum(r.phi_scaled for r in rows) == _SHAP_LCM * max(
            r.cost_cents for r in rows
        )
        con = duckdb.connect()
        top = con.execute(
            f"""
            SELECT s_suppkey, CAST(round(100 * s_acctbal) AS BIGINT)
            FROM '{sf}/supplier.parquet'
            ORDER BY s_acctbal DESC, s_suppkey LIMIT {_SHAP_N}
            """
        ).fetchall()
        costs = {k: c for k, c in top}
        players = sorted(costs)
        n = len(players)

        def v(coal):  # airport game: coalition pays its max cost
            return max((costs[p] for p in coal), default=0)

        for r in rows:
            i = r.s_suppkey
            others = [p for p in players if p != i]
            phi = Fraction(0)
            for size in range(n):
                w = Fraction(
                    factorial(size) * factorial(n - size - 1),
                    factorial(n),
                )
                for coal in combinations(others, size):
                    phi += w * (v(coal + (i,)) - v(coal))
            assert Fraction(r.phi_scaled, _SHAP_LCM) == phi, i


class TestNewsvendorIndependent:
    """Third construction for lineitem_newsvendor: python exhaustive
    cost sweep — q* must be a GLOBAL minimizer over all stock levels,
    stronger than the emitted local certificate."""

    def test_global_optimality(self, spark):
        import duckdb
        from collections import defaultdict

        from virapipe_spark.queries.relational import (
            _NV_CO,
            _NV_CU,
            lineitem_newsvendor,
        )

        sf = "/root/testdata/sf0.001"
        rows = {r.brand: r for r in lineitem_newsvendor(
            spark, sf).collect()}
        assert rows
        assert all(r.is_optimal == 1 for r in rows.values())
        con = duckdb.connect()
        data = con.execute(
            f"""
            SELECT p.p_brand,
                   CAST(floor(epoch_us(l.l_shipdate)/86400000000)
                     AS BIGINT),
                   CAST(sum(round(l.l_quantity)) AS BIGINT)
            FROM '{sf}/lineitem.parquet' l
            JOIN '{sf}/part.parquet' p ON p.p_partkey = l.l_partkey
            GROUP BY 1, 2
            """
        ).fetchall()
        dem: dict = defaultdict(list)
        for brand, _, q in data:
            dem[brand].append(q)
        cu, co = _NV_CU, _NV_CO
        for brand, ds in dem.items():
            r = rows[brand]
            assert r.n_days == len(ds)

            def cost(q):
                return sum(
                    co * max(0, q - x) + cu * max(0, x - q) for x in ds
                )

            assert r.cost_at == cost(r.q_star)
            assert r.cost_minus == cost(r.q_star - 1)
            assert r.cost_plus == cost(r.q_star + 1)
            # global sweep over the demand support
            best = min(cost(q) for q in range(0, max(ds) + 2))
            assert r.cost_at == best, brand
            # the critical-fractile quantile definition
            n = len(ds)
            srt = sorted(ds)
            cum = 0
            qf = None
            from collections import Counter

            for v, c in sorted(Counter(srt).items()):
                cum += c
                if (cu + co) * cum >= cu * n:
                    qf = v
                    break
            assert r.q_star == qf, brand


class TestAssortativityIndependent:
    """Third construction for graph_assortativity: python moments
    plus the textbook two-marginal Pearson formula — on a symmetric
    edge list the marginals coincide, so the collapsed identity must
    equal the full formula."""

    def test_matches_textbook_formula(self, spark):
        import duckdb
        import math
        from collections import defaultdict
        from fractions import Fraction

        from virapipe_spark.queries.relational import graph_assortativity

        sf = "/root/testdata/sf0.001"
        r = graph_assortativity(spark, sf).collect()
        assert len(r) == 1
        r = r[0]
        con = duckdb.connect()
        E = con.execute(
            f"""
            WITH pairs AS (
              SELECT a.l_partkey pa, b.l_partkey pb
              FROM '{sf}/lineitem.parquet' a
              JOIN '{sf}/lineitem.parquet' b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            )
            SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING count(*) >= 2
            """
        ).fetchall()
        deg: dict = defaultdict(int)
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
        ed = [(deg[a], deg[b]) for a, b in E] + [
            (deg[b], deg[a]) for a, b in E
        ]
        M = len(ed)
        sj = sum(j for j, _ in ed)
        sjj = sum(j * j for j, _ in ed)
        sjk = sum(j * k for j, k in ed)
        assert (r.m, r.sj, r.sjj, r.sjk) == (M, sj, sjj, sjk)
        assert r.r_num == M * sjk - sj * sj
        assert r.r_den == M * sjj - sj * sj
        assert r.assortativity == (M * sjk - sj * sj) / (
            M * sjj - sj * sj
        )
        # textbook two-marginal Pearson over the directed edge list
        sk = sum(k for _, k in ed)
        skk = sum(k * k for _, k in ed)
        num = Fraction(M * sjk - sj * sk)
        den = Fraction(
            math.isqrt((M * sjj - sj * sj) * (M * skk - sk * sk))
        )
        # symmetric list: the two variance factors are equal, so the
        # sqrt is exact and the formulas coincide
        assert (M * sjj - sj * sj) == (M * skk - sk * sk)
        assert Fraction(r.r_num, r.r_den) == num / den
        assert -1 <= r.assortativity <= 1
