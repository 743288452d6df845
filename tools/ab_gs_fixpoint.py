"""Interleaved A/B: supplier_stable_matching's fixpoint early-stop.

A (old): all _GS_ROUNDS (16) batch Gale-Shapley rounds run
unconditionally, with an EAGER reliable checkpoint every 2 rounds.

B (new, r12): the per-2-round checkpoint goes LAZY and a fused count()
both materializes it (full action) and probes the fixpoint — no free
supplier with a proposal left (part NULL and pos <= k) means every
remaining round is the identity (claims come only from holders, each
part's winner is its current holder, pos never advances), so breaking
is bit-identical to running the full budget the oracle still runs.

The tool copies the entry's round loop verbatim with the early flag
switchable, asserts full-output equality, reports the observed
fixpoint round, then interleaves timed reps.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W, functions as F

from virapipe_spark import catalog
from virapipe_spark.queries.relational import _GS_K, _GS_ROUNDS, _rank_gs
from virapipe_spark.scale import truncate_lineage, two_phase_rank
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def build_state(spark):
    sup = catalog.table(spark, SF, "supplier").select("s_suppkey")
    s_ranked, _ns = two_phase_rank(sup, ["s_suppkey"], rank_col="__rn")
    s_idx = s_ranked.select(
        "s_suppkey", (F.col("__rn") - 1).cast("long").alias("s_idx")
    )
    msc = sup.agg(
        F.greatest(F.expr("count(*) div 2"), F.lit(3)).cast("long").alias("m")
    )
    st = (
        s_idx.crossJoin(F.broadcast(msc))
        .select(
            "s_idx",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("gs|"), F.col("s_idx").cast("string")
                            )
                        ),
                        1,
                        10,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("m")
            ).alias("h"),
            "m",
            F.lit(1).cast("long").alias("pos"),
            F.lit(None).cast("long").alias("part"),
            F.lit(None).cast("long").alias("prank"),
        )
    )
    return truncate_lineage(st, reliable=True)


def gs_rounds(st, early: bool):
    k = _GS_K
    stopped_at = _GS_ROUNDS
    for r in range(1, _GS_ROUNDS + 1):
        claims = (
            st.select(
                "s_idx",
                "prank",
                F.when(F.col("part").isNotNull(), F.col("part"))
                .when(
                    F.col("pos") <= k,
                    (F.col("h") + F.col("pos") - 1) % F.col("m"),
                )
                .alias("target"),
                F.col("part").isNotNull().alias("held"),
            )
            .filter(F.col("target").isNotNull())
            .select(
                "s_idx",
                "target",
                F.when(F.col("held"), F.col("prank"))
                .otherwise(_rank_gs(F.col("target"), F.col("s_idx")))
                .alias("rnk"),
            )
        )
        winners = (
            claims.withColumn(
                "rn",
                F.row_number().over(W.partitionBy("target").orderBy("rnk")),
            )
            .filter(F.col("rn") == 1)
            .select(
                "s_idx",
                F.col("target").alias("wpart"),
                F.col("rnk").alias("wrank"),
            )
        )
        st = (
            st.select(
                "s_idx",
                "h",
                "m",
                (
                    F.col("pos")
                    + F.when(
                        F.col("part").isNull() & (F.col("pos") <= k), 1
                    ).otherwise(0)
                ).alias("pos"),
            )
            .join(
                winners.select(
                    "s_idx",
                    F.col("wpart").alias("part"),
                    F.col("wrank").alias("prank"),
                ),
                "s_idx",
                "left",
            )
        )
        if r % 2 == 0:
            if early:
                st = truncate_lineage(st, eager=False, reliable=True)
                if (
                    st.filter(
                        F.col("part").isNull() & (F.col("pos") <= k)
                    ).count()
                    == 0
                ):
                    stopped_at = r
                    break
            else:
                st = truncate_lineage(st, reliable=True)
    return st, stopped_at


def main():
    catalog.load_all()
    spark = session(app_name="ab_gs_fixpoint")
    st0 = build_state(spark).persist()
    st0.count()
    a, _ = gs_rounds(st0, early=False)
    b, rnd = gs_rounds(st0, early=True)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb and ra, "states differ!"
    print(f"state rows: {len(ra)} (identical); fixpoint at round {rnd} "
          f"of {_GS_ROUNDS}")
    times = {"old(16-rounds)": False, "new(fixpoint-stop)": True}
    res = {k: [] for k in times}
    for _ in range(5):
        for k, early in times.items():
            t0 = time.perf_counter()
            gs_rounds(st0, early=early)[0].write.format("noop").mode(
                "overwrite"
            ).save()
            res[k].append(time.perf_counter() - t0)
    for k, xs in res.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"gs {k}: {xs} -> median {statistics.median(xs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
