"""Interleaved A/B: docs_setsim_prefix with the PPJoin POSITIONAL
filter on candidate generation (Xiao et al., VLDB'08 §3.2) vs the
committed plain prefix+length filter.

Hypothesis (VERDICT_r12 next-round #3, guide §2.3 — prune before the
expensive join): each prefix-join match row carries the matched
shingle's rank (rn) inside both docs' rarest-first orders; the overlap
of the full sets is bounded by 1 + min(na - rn_a, nb - rn_b) AT THE
FIRST COMMON SHINGLE, so rows where that bound is below the pair's
minimum qualifying overlap ceil((na+nb)/3) (Jaccard t=0.5) can be
dropped BEFORE the pair-distinct and the verification explode-join.

No false negatives: for a qualifying pair (J >= t, i.e. common c >=
ceil((na+nb)/3)), the FIRST common shingle w1 (global rarest-first
order) must sit inside both prefixes — if w1 were outside a's prefix,
every common shingle would be (they all rank >= w1 and a is sorted by
that order), putting all c in a suffix of length ceil(t*na) - 1 < c.
At w1's row, all c common shingles occupy distinct ranks >= rn_a in a
and >= rn_b in b, so c <= 1 + min(na - rn_a, nb - rn_b): the bound
holds and the row SURVIVES, so the pair reaches verification via at
least that row. Rows for later common shingles may be pruned freely —
the pair-distinct needs any one surviving row.

Protocol: same-session alternating reps (box-noise methodology),
equality assert first, candidate-pair counts printed (the measured
reduction the verdict asks for), medians + order statistics.
"""
import statistics
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F, Window as W

from virapipe_spark.queries.extensions import _shingles
from virapipe_spark.session import session

SF = "/root/testdata/sf0.1"
T = 0.5


def build(spark, positional: bool, cand_only: bool = False):
    sets = _shingles(spark, SF).select("doc_id", "s").distinct()
    sets = sets.localCheckpoint(eager=False)
    sizes = sets.groupBy("doc_id").agg(F.count("*").alias("n"))
    freq = sets.groupBy("s").agg(F.count("*").alias("cnt"))
    w_doc = W.partitionBy("doc_id").orderBy("cnt", "s")
    prefix = (
        sets.join(freq, "s")
        .withColumn("rn", F.row_number().over(w_doc))
        .join(sizes, "doc_id")
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.col("n") * T) + 1)
        .select("doc_id", "s", "n", "rn")
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            (F.col("b.n") >= F.col("a.n") * T)
            & (F.col("a.n") >= F.col("b.n") * T)
        )
    )
    if positional:
        # minimum qualifying overlap: c >= t/(1+t)*(na+nb); t=1/2 ->
        # c >= (na+nb)/3, integer-exact ceil = (na+nb+2) div 3
        minov = (F.col("a.n") + F.col("b.n") + F.lit(2)) / F.lit(3)
        minov = F.floor(minov).cast("long")
        ub = F.lit(1) + F.least(
            F.col("a.n") - F.col("a.rn"), F.col("b.n") - F.col("b.rn")
        )
        cand = cand.filter(ub >= minov)
    cand = cand.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    ).distinct()
    if cand_only:
        return cand
    common = (
        cand.join(sets.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(
            sets.alias("tb"),
            (F.col("doc_b") == F.col("tb.doc_id"))
            & (F.col("ta.s") == F.col("tb.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "union_n", F.col("sa.n") + F.col("sb.n") - F.col("common")
        )
        .filter(F.col("common") * 1.0 / F.col("union_n") >= T)
        .select("doc_a", "doc_b", "common", "union_n")
    )


def main():
    spark = session(app_name="ab_setsim_positional", shuffle_partitions=32)
    # equality first
    a = sorted(map(tuple, build(spark, False).collect()))
    b = sorted(map(tuple, build(spark, True).collect()))
    assert a == b, f"variants diverge: old={len(a)} new={len(b)}"
    n_old = build(spark, False, cand_only=True).count()
    n_new = build(spark, True, cand_only=True).count()
    print(
        f"result rows {len(a)} identical; candidate pairs: "
        f"plain={n_old} positional={n_new} "
        f"({100.0 * (n_old - n_new) / max(n_old, 1):.1f}% pruned)"
    )
    times = {False: [], True: []}
    for _ in range(7):
        for pos in (False, True):
            t0 = time.perf_counter()
            build(spark, pos).write.format("noop").mode("overwrite").save()
            times[pos].append(time.perf_counter() - t0)
    for pos, ts in times.items():
        lbl = "positional" if pos else "plain     "
        print(
            lbl,
            [round(t, 3) for t in sorted(ts)],
            "median",
            round(statistics.median(ts), 3),
        )
    spark.stop()


if __name__ == "__main__":
    main()
