"""A/B harness for the two docs_minhash_lsh physical shapes (VERDICT r03).

Shape A (round-3, current): the full 16-component signature array rides
every band row through the band-bucket self-join; pairs are scored
inline after a pair-dedup groupBy that carries the signatures. 3
shuffles, but each shuffled band row is ~128 B wider ×2 sides.

Shape B (round-2): band rows are narrow (doc_id, band, bk); the distinct
candidate pairs join back to the signature table twice (doc_a, doc_b).
One extra shuffle per join-back, but the band self-join moves minimal
bytes. The signature table is lazily localCheckpoint-ed so the join-backs
reuse one materialization instead of recomputing the shingle pipeline.

Shape C (round-2 naive): as B but no materialization — the signature
pipeline recomputes per consumer.

Usage: python tools/ab_minhash.py [sf_dir] [reps]
Prints per-shape medians; the catalog keeps whichever wins at sf0.1
(recorded in SCALE.md §MinHash).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from virapipe_spark.queries.extensions import _B, _EST_THRESHOLD, _H, _R
from virapipe_spark.catalog import table
from virapipe_spark.session import session


def _mh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("__toks")
    )
    t = F.col("__toks")
    grams = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda g: F.concat_ws(
                " ", F.element_at(t, g), F.element_at(t, g + 1), F.element_at(t, g + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", F.explode(grams).alias("s"))

    def h(j: int):
        i, k = (j - 1) // 4, (j - 1) % 4
        return F.min(
            F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col("s"))), k * 8 + 1, 8)
        )

    return sh.groupBy("doc_id").agg(*[h(j).alias(f"h{j}") for j in range(1, _H + 1)])


def shape_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 shape preserved for re-measurement: full signature array
    rides every band row; pairs scored inline after a signature-carrying
    pair-dedup groupBy."""
    mh = _mh(spark, sf_dir)
    sig = F.array(*[F.col(f"h{j}") for j in range(1, _H + 1)])
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(*[F.col(f"h{b * _R + r}") for r in range(1, _R + 1)])
                ).alias("bk"),
            )
            for b in range(_B)
        ]
    )
    bands = mh.select(
        "doc_id", sig.alias("sig"), F.explode(band_structs).alias("bb")
    ).select(
        "doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bk").alias("bk")
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.first("sig_a").alias("sig_a"), F.first("sig_b").alias("sig_b"))
    )
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = matches / F.lit(float(_H))
    return pairs.filter(est >= _EST_THRESHOLD).select(
        "doc_a", "doc_b", F.round(est, 4).alias("est_jaccard")
    )


def shape_b(spark: SparkSession, sf_dir: str, materialize: bool) -> DataFrame:
    """Shapes B (materialize=True) and C (False) ARE the production
    pipeline — call it rather than copy it, so a future re-run measures
    whatever ships, not a frozen snapshot. Only shape A stays a frozen
    copy (it exists purely as the rejected-round-3 historical
    comparator)."""
    from virapipe_spark.queries.extensions import _minhash_pairs

    return _minhash_pairs(spark, sf_dir, materialize=materialize)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = session(app_name="ab_minhash")
    shapes = {
        "A_sig_rides_bands": lambda: shape_a(spark, sf_dir),
        "B_joinback_ckpt": lambda: shape_b(spark, sf_dir, materialize=True),
        "C_joinback_recompute": lambda: shape_b(spark, sf_dir, materialize=False),
    }
    # warm-up: JVM/codegen/parquet-footer caches
    for fn in shapes.values():
        fn().count()
    results = {}
    for name, fn in shapes.items():
        times, rows = [], None
        for _ in range(reps):
            t0 = time.time()
            rows = fn().count()
            times.append(time.time() - t0)
        results[name] = (statistics.median(times), rows, times)
    for name, (med, rows, times) in results.items():
        print(
            f"{name}: median {med:.3f}s rows={rows} "
            f"[{', '.join(f'{t:.3f}' for t in times)}]"
        )
    spark.stop()


if __name__ == "__main__":
    main()
