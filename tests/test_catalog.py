"""Catalog invariants: the driver-window budget and the semantic
guarantees of the round-4 text operators.

The window test is the structural lesson of round 3: the driver
hash-checks only the FIRST 50 entries of ``__spark_entry__.queries()``,
so every never-proven entry must sort inside that window or it
accumulates zero evidence. ``ordered_queries`` now derives the ordering
from the ``CORRECTNESS_r*.json`` files; this test fails the build the
moment the catalog grows more unproven entries than the window holds —
the failure mode that silently cost 27 queries their evidence in
rounds 1-3.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from virapipe_spark import catalog

DRIVER_WINDOW = 50


class TestDriverWindow:
    def test_every_unproven_entry_fits_the_window(self):
        catalog.load_all()
        proven = catalog._verified_rounds()
        ordered = list(catalog.ordered_queries())
        unproven = [n for n in ordered if proven.get(n, 0) == 0]
        assert len(unproven) <= DRIVER_WINDOW, (
            f"{len(unproven)} never-driver-proven entries > {DRIVER_WINDOW}-entry "
            f"window; some would accumulate zero correctness evidence: "
            f"{unproven[DRIVER_WINDOW:]}"
        )
        head = set(ordered[:DRIVER_WINDOW])
        missing = [n for n in unproven if n not in head]
        assert not missing, f"unproven entries sorted outside the window: {missing}"

    def test_regression_demotes_to_never_verified(self, tmp_path):
        """An entry whose MOST RECENT driver check failed must sort as
        never-verified (rotate back into the window immediately), even
        if older rounds proved it — the window_lag_gap r1-pass/r2-crash
        precedent."""
        import json

        ok = {"rows_match": True, "schema_match": True, "hash_match": True,
              "spark_rows": 1, "oracle_rows": 1, "err": None}
        fail = dict(ok, hash_match=False)
        crash = dict(ok, rows_match=None, err="boom")
        rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                     "spark_rows": 7, "oracle_rows": None, "err": "no_oracle"}
        (tmp_path / "CORRECTNESS_r01.json").write_text(
            json.dumps({"a": ok, "b": ok, "c": ok, "d": rows_only})
        )
        (tmp_path / "CORRECTNESS_r02.json").write_text(
            json.dumps({"a": ok, "b": fail, "c": crash})
        )
        proven = catalog._verified_rounds(str(tmp_path))
        assert proven.get("a") == 2
        assert "b" not in proven  # latest check failed -> demoted
        assert "c" not in proven  # latest check crashed -> demoted
        assert proven.get("d") == 1  # rows-only pass counts

    def test_window_rotation_simulated_rounds_8_to_11(self, tmp_path):
        """Prove the window math stays exact through the r9/r10 staged
        flips, four promotion generations deep (r8 VERDICT item 7).

        Simulates the driver loop against the REAL rank/sort
        (catalog._ranked), the REAL artifact parser
        (catalog._verified_rounds), the REAL history (r1-r7 artifacts
        copied verbatim), and the REAL staged generations' registration
        order — only the driver's per-round artifact WRITES are
        synthetic (optimistic all-green path). Asserts, per round:
        every never-proven live entry sits inside the first-50 window,
        the flip rounds' windows are exactly the newly-promoted sets
        (r9: all 50 staged-r9 names), and once the backlog clears
        (r11), the window rotates to the 50 least-recently-proven by
        (round, registration order)."""
        import glob
        import json
        import shutil

        catalog.load_all()
        from virapipe_spark.queries import staged

        if staged.R9_PROMOTED or staged.R10_PROMOTED:
            import pytest

            pytest.skip("staged r9/r10 already live; simulation obsolete")

        for p in glob.glob("CORRECTNESS_r0[1-7].json"):
            shutil.copy(p, tmp_path / p)
        root = str(tmp_path)

        live = list(catalog.QUERIES)  # r8 live set, registration order
        gen9 = list(staged.STAGED_R9)  # promote_r9 appends in dict order
        gen10 = list(staged.STAGED_R10)
        ok = {"rows_match": True, "schema_match": True, "hash_match": True,
              "spark_rows": 1, "oracle_rows": 1, "err": None}

        def window(names):
            return catalog._ranked(names, catalog._verified_rounds(root))[
                :DRIVER_WINDOW
            ]

        def drive(rnd, names):
            w = window(names)
            proven = catalog._verified_rounds(root)
            unproven = [n for n in names if proven.get(n, 0) == 0]
            assert set(unproven) <= set(w), (
                f"round {rnd}: never-proven entries outside the window: "
                f"{sorted(set(unproven) - set(w))}"
            )
            (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
                json.dumps({n: ok for n in w})
            )
            return w

        # round 8: no flip; the window must be exactly the current
        # never-proven live set (50 of them as of the r7 artifacts).
        proven7 = catalog._verified_rounds(root)
        unproven8 = [n for n in live if proven7.get(n, 0) == 0]
        w8 = drive(8, live)
        assert len(unproven8) == DRIVER_WINDOW
        assert set(w8) == set(unproven8)

        # round 9: gen9 flips live (CORRECTNESS_r08 exists). All 50
        # promoted entries are never-proven -> they ARE the window.
        w9 = drive(9, live + gen9)
        assert set(w9) == set(gen9)

        # round 10: gen10 flips live (38 entries). Window = gen10 plus
        # the least-recently-proven filler, ranked by (round,
        # registration order) — computed here independently of _ranked.
        names10 = live + gen9 + gen10
        proven9 = catalog._verified_rounds(root)
        filler = sorted(
            (n for n in names10 if n not in gen10),
            key=lambda n: (proven9[n], names10.index(n)),
        )[: DRIVER_WINDOW - len(gen10)]
        w10 = drive(10, names10)
        assert set(w10) == set(gen10) | set(filler)

        # round 11: no flip, nothing unproven anywhere — pure rotation
        # to the 50 least-recently-proven.
        proven10 = catalog._verified_rounds(root)
        assert all(proven10.get(n, 0) > 0 for n in names10)
        expect11 = sorted(
            names10, key=lambda n: (proven10[n], names10.index(n))
        )[:DRIVER_WINDOW]
        w11 = drive(11, names10)
        assert w11 == expect11

    def test_rewritten_after_proof_ranks_after_never_proven(self):
        """An entry rewritten after its latest driver proof must rank
        0.5 — behind every never-proven entry (flip rounds own the full
        window) but ahead of every valid proof — and self-heal once a
        proof at-or-after the rewrite round exists (r8 VERDICT item 2)."""
        proven = {"a": 7, "b": 3, "c": 9, "e": 7}
        rewritten = {"a": 8, "d": 8, "e": 7}
        # d: never proven -> 0; a: proof 7 < rewrite 8 -> 0.5;
        # e: proof 7 >= rewrite 7 -> healed, ranks 7; b,c: plain proofs.
        order = catalog._ranked(["a", "b", "c", "d", "e"], proven, rewritten)
        assert order == ["d", "a", "b", "e", "c"]

    def test_live_rewritten_entries_queue_directly_behind_the_window(self):
        """The five r8-rewritten entries (REWRITTEN_IN) must exist in
        the live catalog and — while their proofs predate the rewrite —
        sort immediately after the never-proven block, so they re-prove
        the first round with spare window slots."""
        catalog.load_all()
        assert set(catalog.REWRITTEN_IN) <= set(catalog.QUERIES)
        proven = catalog._verified_rounds()
        ordered = list(catalog.ordered_queries())
        pending = sorted(
            n
            for n in catalog.REWRITTEN_IN
            if 0 < proven.get(n, 0) < catalog.REWRITTEN_IN[n]
        )
        if not pending:
            return  # all re-proven; nothing to queue
        # the rank-0 block is never-proven PLUS any STALE_SUSPECT entry
        # whose proof predates the drift round — count it the way
        # _ranked does, or a future stale re-proof would shift the
        # slice and fail this test spuriously (r9 review)
        n_zero = sum(
            1
            for n in ordered
            if proven.get(n, 0) == 0
            or (
                n in catalog.STALE_SUSPECT
                and proven.get(n, 0) <= catalog._DRIFT_ROUND
            )
        )
        block = ordered[n_zero : n_zero + len(pending)]
        assert sorted(block) == pending, (
            f"rewritten-after-proof entries not queued directly behind "
            f"the never-proven block: expected {pending}, got {block}"
        )

    def test_ordering_is_a_permutation_of_the_registry(self):
        catalog.load_all()
        assert list(catalog.ordered_queries().keys()) != []
        assert set(catalog.ordered_queries()) == set(catalog.QUERIES)
        assert set(catalog.ORACLES) <= set(catalog.QUERIES)


class TestOracleDtypeFidelity:
    """Round-5 lesson (sessionize_events): DuckDB HUGEINT/DECIMAL output
    columns are materialized by pandas as float64/object, so the
    driver's exact hash compares ``3.0`` against Spark's bigint ``3``
    and fails even when every value matches. These tests make that
    divergence class impossible to ship."""

    #: DuckDB logical types pandas renders lossily vs Spark's output.
    LOSSY = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT", "UINTEGER")

    def test_no_oracle_emits_a_lossy_duckdb_type(self, sf_dir):
        """DESCRIBE every oracle against the sf0.001 views — no output
        column may be HUGEINT/DECIMAL/unsigned (cast to BIGINT/DOUBLE in
        the oracle SQL instead)."""
        import duckdb

        catalog.load_all()
        con = duckdb.connect()
        for t in catalog.TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if __import__("os").path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        from virapipe_spark.queries.staged import STAGED_R7, STAGED_R8

        audited = dict(catalog.ORACLES)
        for gen in (STAGED_R7, STAGED_R8):
            for n, (_fn, o) in gen.items():
                if o is not None:
                    audited.setdefault(n, o)
        offenders = []
        for name, sql in audited.items():
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
            for col, ctype, *_ in cols:
                if any(l in ctype.upper() for l in self.LOSSY):
                    offenders.append(f"{name}.{col}: {ctype}")
        assert not offenders, (
            "oracle output columns with pandas-lossy DuckDB types "
            f"(driver hash would diverge from local): {offenders}"
        )

    def test_strict_mode_catches_int_float_divergence(self):
        """strict_problems must flag the exact sessionize_events shape:
        identical values, int64 on one side, float64 on the other."""
        import pandas as pd

        from virapipe_spark.oracle_compare import compare_frames, strict_problems

        s = pd.DataFrame({"sid": pd.array([1, 2, 3], dtype="int64")})
        d = pd.DataFrame({"sid": pd.array([1.0, 2.0, 3.0], dtype="float64")})
        assert compare_frames(s, d) == []  # normalized compare masks it
        assert strict_problems(s, d) != []  # strict mode refuses it
        assert compare_frames(s, d, strict=True) != []

    def test_strict_mode_passes_identical_kinds(self):
        import decimal

        import pandas as pd

        from virapipe_spark.oracle_compare import strict_problems

        s = pd.DataFrame({"a": [1, 2], "b": [1.5, float("nan")], "c": ["x", None]})
        d = pd.DataFrame({"a": [1, 2], "b": [1.5, float("nan")], "c": ["x", None]})
        assert strict_problems(s, d) == []
        dec = pd.DataFrame({"a": [decimal.Decimal("1"), decimal.Decimal("2")]})
        assert strict_problems(s[["a"]], dec) != []  # decimal vs int flagged


class TestRowsOnlyInvariants:
    """The 4 no-oracle entries prove only rows>0 to the driver, so each
    now carries self-validating output: an invariant column that must
    hold by construction, plus determinism across runs (VERDICT r5 #5).
    """

    def test_orf_six_frame_summary(self, spark, sf_dir):
        catalog.load_all()
        rows = {
            (r["strand"], r["frame"]): r
            for r in catalog.QUERIES["orf_six_frame"](spark, sf_dir).collect()
        }
        # all six frames present, counts/checksums positive
        assert set(rows) == {(s, f) for s in ("forw", "rev") for f in (1, 2, 3)}
        for r in rows.values():
            assert r["n_orfs"] > 0 and r["total_aa"] > 0 and r["protein_crc"] > 0
        again = {
            (r["strand"], r["frame"]): (r["n_orfs"], r["total_aa"], r["protein_crc"])
            for r in catalog.QUERIES["orf_six_frame"](spark, sf_dir).collect()
        }
        assert again == {
            k: (r["n_orfs"], r["total_aa"], r["protein_crc"]) for k, r in rows.items()
        }

    def test_frame_sample_matches_declared_duration(self, spark, sf_dir):
        catalog.load_all()
        out = catalog.QUERIES["multimodal_frame_sample"](spark, sf_dir).collect()
        assert out and all(r["frames_ok"] for r in out)
        crc = {r["media_id"]: r["frame_crc"] for r in out}
        out2 = catalog.QUERIES["multimodal_frame_sample"](spark, sf_dir).collect()
        assert {r["media_id"]: r["frame_crc"] for r in out2} == crc

    def test_files_listing_counts_are_complete(self, spark, sf_dir):
        catalog.load_all()
        out = catalog.QUERIES["files_listing"](spark, sf_dir).collect()
        assert out and all(r["rows_complete"] for r in out)
        exact = catalog.table(spark, sf_dir, "lineitem").count()
        assert sum(r["n_rows"] for r in out) == exact


class TestTextOperators:
    def test_pii_scrub_leaves_no_matches(self, spark, sf_dir):
        """The scrub must be total: re-applying the extraction patterns
        to the scrubbed text (recovered from the entry's own pipeline,
        pre-md5) finds nothing."""
        from virapipe_spark.queries.extensions import _PII_EMAIL, _PII_PHONE

        d = catalog.table(spark, sf_dir, "documents")
        injected = F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        )
        scrubbed = F.regexp_replace(
            F.regexp_replace(injected, _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
        )
        leftovers = d.select(
            (
                F.size(F.regexp_extract_all(scrubbed, F.lit(_PII_EMAIL), F.lit(0)))
                + F.size(F.regexp_extract_all(scrubbed, F.lit(_PII_PHONE), F.lit(0)))
            ).alias("n")
        ).agg(F.sum("n").alias("total"))
        assert leftovers.collect()[0]["total"] == 0

    def test_repetition_ratio_bounds(self, spark, sf_dir):
        """top-gram count never exceeds total grams; ratio in (0, 1]."""
        catalog.load_all()
        df = catalog.QUERIES["docs_repetition_topgram"](spark, sf_dir)
        bad = df.filter(
            (F.col("top_cnt") > F.col("n_grams"))
            | (F.col("top_2gram_ratio") <= 0)
            | (F.col("top_2gram_ratio") > 1)
        ).count()
        assert bad == 0

    def test_kmeans_partitions_the_corpus(self, spark, sf_dir):
        """Cluster sizes must sum to the corpus size (every vector
        assigned exactly once) with at most _KM_C clusters."""
        from virapipe_spark.queries.extensions import _KM_C

        catalog.load_all()
        out = catalog.QUERIES["embed_kmeans_lloyd"](spark, sf_dir).collect()
        n_vecs = catalog.table(spark, sf_dir, "embeddings").count()
        assert sum(r["n_members"] for r in out) == n_vecs
        assert 0 < len(out) <= _KM_C

    def test_stale_suspect_entries_sort_first_until_reproven(self):
        """The two entries whose r03 proofs predate the r04 TIMESTAMP_NTZ
        testdata drift must sort inside the window as if unproven — and
        stop doing so once a post-drift round proves them."""
        catalog.load_all()
        ordered = list(catalog.ordered_queries())
        proven = catalog._verified_rounds()
        for name in catalog.STALE_SUSPECT:
            assert name in catalog.QUERIES
            if proven.get(name, 0) <= catalog._DRIFT_ROUND:
                assert ordered.index(name) < DRIVER_WINDOW, (
                    f"{name} has only a pre-drift proof but sorts outside "
                    "the driver window"
                )
