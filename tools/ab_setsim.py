"""Interleaved A/B: docs_setsim_prefix with vs without localCheckpoint
on the shared shingle-set subtree (consumed 5x: sizes, freq, prefix,
and both sides of the verification join). Protocol: same-session
alternating reps, medians compared (SCALE.md noise rules)."""
import statistics
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F, Window as W
from virapipe_spark.session import session
from virapipe_spark.queries.extensions import _shingles

SF = "/root/testdata/sf0.1"
T = 0.5


def build(spark, checkpoint: bool):
    sets = _shingles(spark, SF).select("doc_id", "s").distinct()
    if checkpoint:
        sets = sets.localCheckpoint(eager=False)
    sizes = sets.groupBy("doc_id").agg(F.count("*").alias("n"))
    freq = sets.groupBy("s").agg(F.count("*").alias("cnt"))
    w_doc = W.partitionBy("doc_id").orderBy("cnt", "s")
    prefix = (
        sets.join(freq, "s")
        .withColumn("rn", F.row_number().over(w_doc))
        .join(sizes, "doc_id")
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.col("n") * T) + 1)
        .select("doc_id", "s", "n")
    )
    cand = (
        prefix.alias("a").join(prefix.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter((F.col("b.n") >= F.col("a.n") * T) & (F.col("a.n") >= F.col("b.n") * T))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    common = (
        cand.join(sets.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(sets.alias("tb"), (F.col("doc_b") == F.col("tb.doc_id")) & (F.col("ta.s") == F.col("tb.s")))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn("union_n", F.col("sa.n") + F.col("sb.n") - F.col("common"))
        .filter(F.col("common") * 1.0 / F.col("union_n") >= T)
        .select("doc_a", "doc_b", "common", "union_n")
    )


def main():
    spark = session(app_name="ab_setsim", shuffle_partitions=32)
    # verify identical results first
    a = sorted(map(tuple, build(spark, False).collect()))
    b = sorted(map(tuple, build(spark, True).collect()))
    assert a == b, "variants diverge"
    times = {False: [], True: []}
    for rep in range(7):
        for ck in (False, True):
            t0 = time.time()
            build(spark, ck).write.format("noop").mode("overwrite").save()
            times[ck].append(time.time() - t0)
    for ck, ts in times.items():
        print(("checkpoint" if ck else "recompute "), [round(t, 2) for t in ts],
              "median", round(statistics.median(ts), 2))
    spark.stop()


if __name__ == "__main__":
    main()
