"""Interleaved A/B: docs_greedy_coverage's per-round plan truncation.

A (old): sel and covered only persist()ed. persist caches DATA but the
LOGICAL plan still embeds every prior round's full tree via the
covered/picked chains — by round 6 the composed plan reached 8.4k
explain lines / 920 Exchanges, and the cost was Catalyst re-analysis,
not execution.

B (new, r12): the ONE-ROW sel takes an eager reliable checkpoint each
round (control-plane-sized by construction), cutting every downstream
chain at the round boundary; covered keeps a persist only — its plan
is then a linear union of flat LogicalRDD leaves.

Equality asserted on the full pick transcript first; interleaved
same-session reps, median + order statistics decide.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W, functions as F

from virapipe_spark import catalog
from virapipe_spark.queries.extensions import _GC_ROUNDS
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def greedy(spark, toks, truncate: bool):
    covered = None
    picked = None
    sels = []
    for rnd in range(1, _GC_ROUNDS + 1):
        cand = toks
        if picked is not None:
            cand = cand.join(F.broadcast(picked), "doc_id", "left_anti")
        if covered is not None:
            cand = cand.join(F.broadcast(covered), "tok", "left_anti")
        scores = cand.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("marginal")
        )
        sel = (
            scores.orderBy(F.col("marginal").desc(), "doc_id")
            .limit(1)
            .select(
                F.lit(rnd).cast("long").alias("round"), "doc_id", "marginal"
            )
        )
        sel = truncate_lineage(sel, reliable=True) if truncate else sel.persist()
        sels.append(sel)
        new_cov = toks.join(sel.select("doc_id"), "doc_id").select("tok")
        covered = (
            new_cov
            if covered is None
            else covered.unionByName(new_cov).distinct()
        )
        covered = covered.persist()
        pick_ids = sel.select("doc_id")
        picked = (
            pick_ids if picked is None else picked.unionByName(pick_ids)
        )
    out = sels[0]
    for s in sels[1:]:
        out = out.unionByName(s)
    return out.select(
        "round",
        "doc_id",
        "marginal",
        F.sum("marginal")
        .over(
            W.orderBy("round").rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .cast("long")
        .alias("covered_total"),
    )


def build_toks(spark):
    d = catalog.table(spark, SF, "documents").select("doc_id", "text")
    t = F.split("text", " ")
    toks = (
        d.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size(t) >= 3, F.sequence(F.lit(0), F.size(t) - 3)
                ).otherwise(F.array().cast("array<int>"))
            ).alias("g"),
            t.alias("t"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.col("t")[F.col("g")],
                F.col("t")[F.col("g") + 1],
                F.col("t")[F.col("g") + 2],
            ).alias("tok"),
        )
        .distinct()
    )
    return truncate_lineage(toks, eager=False)


def main():
    catalog.load_all()
    spark = session(app_name="ab_greedy_truncate")
    toks = build_toks(spark).persist()
    toks.count()
    variants = {
        "old(persist-only)": lambda: greedy(spark, toks, truncate=False),
        "new(sel-checkpoint)": lambda: greedy(spark, toks, truncate=True),
    }
    a = sorted(tuple(r) for r in variants["old(persist-only)"]().collect())
    b = sorted(tuple(r) for r in variants["new(sel-checkpoint)"]().collect())
    assert a == b and a, "pick transcripts differ!"
    print(f"picks: {len(a)} (identical)")
    times = {k: [] for k in variants}
    for _ in range(5):
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"greedy {k}: {xs} -> median {statistics.median(xs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
